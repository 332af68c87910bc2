"""Gale-Shapley distributed implementation vs a direct sequential
transcription of the algorithm (alignment.py:174-227 semantics), plus a
stability property check."""

from __future__ import annotations

import random

import pytest

from tests.conftest import REPO  # noqa: F401

from ontoea_spark.operators.stable_match import gale_shapley


def _ref_gs(pairs):
    prefs: dict[int, list[tuple[int, float]]] = {}
    for lid, rid, sim in pairs:
        prefs.setdefault(lid, []).append((rid, sim))
    for lid in prefs:
        prefs[lid].sort(key=lambda x: (-x[1], x[0]))
    nxt = {l: 0 for l in prefs}
    hold: dict[int, tuple[int, float]] = {}
    free = sorted(prefs)
    while free:
        l = free.pop(0)
        if nxt[l] >= len(prefs[l]):
            continue
        r, s = prefs[l][nxt[l]]
        nxt[l] += 1
        cur = hold.get(r)
        if cur is None or (s, -l) > (cur[1], -cur[0]):
            if cur is not None:
                free.append(cur[0])
            hold[r] = (l, s)
        else:
            free.append(l)
    return {(l, r) for r, (l, _s) in hold.items()}


def _stability_violations(pairs, matching):
    score = {(l, r): s for l, r, s in pairs}
    l_match = {l: r for l, r in matching}
    r_match = {r: l for l, r in matching}
    bad = []
    for l, r, s in pairs:
        if l_match.get(l) == r:
            continue
        # l prefers r over its current match?
        cur_r = l_match.get(l)
        l_prefers = cur_r is None or (s, -r) > (score[(l, cur_r)], -cur_r)
        cur_l = r_match.get(r)
        r_prefers = cur_l is None or (s, -l) > (score[(cur_l, r)], -cur_l)
        if l_prefers and r_prefers:
            bad.append((l, r))
    return bad


@pytest.mark.parametrize("seed", [1, 2])
def test_gale_shapley_matches_reference(spark, seed):
    rng = random.Random(seed)
    pairs = []
    for l in range(12):
        for r in rng.sample(range(10), 6):
            pairs.append((l, r, round(rng.random(), 6)))
    df = spark.createDataFrame(pairs, "lid long, rid long, sim double")
    got = {(r.lid, r.rid) for r in gale_shapley(df, max_rounds=100).collect()}
    want = _ref_gs(pairs)
    assert got == want
    assert _stability_violations(pairs, got) == []
