"""Golden parity: compat_pairs v1-v6 vs a direct transcription of the
reference algorithms (check.py:103-343) on a hand-built class tree.

The transcription below re-implements the *published semantics* (parent
chain walk + branch logic) in plain Python, independently of both the
Spark expressions and the DuckDB oracle SQL — a third opinion.
"""

from __future__ import annotations

import math

import pytest

from tests.conftest import REPO  # noqa: F401  (sys.path side effect)

from ontoea_spark.ontology.compat import compat_pairs
from ontoea_spark.ontology.tree import (
    THING_URI,
    class_paths,
    disjoint_targets,
)

SUB = [
    ("leaf:a", "mid:x"),
    ("leaf:b", "mid:x"),
    ("leaf:c", "mid:y"),
    ("leaf:d", "kind:q"),  # skips a level: depth variation
    ("mid:x", "kind:p"),
    ("mid:y", "kind:q"),
    ("kind:p", THING_URI),
    ("kind:q", THING_URI),
]
DIS = [("mid:x", "mid:y"), ("kind:p", "kind:q")]


def _path(c, sub):
    p = [c]
    while c in sub:
        p.append(sub[c])
        c = sub[c]
    return p


def _disjoint(dis, pa, pb):
    return any(a in dis and dis[a] in pb for a in pa) or any(
        b in dis and dis[b] in pa for b in pb
    )


def _ref_v1(pa, pb):
    al, bl = len(pa), len(pb)
    if al == bl == 1 and pa[0] == THING_URI:
        return 0.5
    if al == bl:
        return 1.0 if pa[0] == pb[0] and THING_URI not in pa[0] else 0.0
    if al > bl:
        return 1.0 if pa[al - bl] == pb[0] and THING_URI not in pb[0] else 0.0
    return 1.0 if pb[bl - al] == pa[0] and THING_URI not in pa[0] else 0.0


def _ref_v2(pa, pb, dis, unsure_w=0.5):
    if _disjoint(dis, pa, pb):
        return -1.0
    al, bl = len(pa), len(pb)
    if al == bl == 1 and pa[0] == THING_URI:
        return unsure_w
    s1, s2 = al - 1, bl - 1
    while s1 >= 0 and s2 >= 0 and pa[s1] == pb[s2]:
        s1 -= 1
        s2 -= 1
    if s1 < 0 or s2 < 0:
        if s1 < 0 and pa[s1 + 1] == THING_URI:
            return unsure_w
        if s2 < 0 and pb[s2 + 1] == THING_URI:
            return unsure_w
        return 1.0
    return -1.0 if pa[s1 + 1] == THING_URI else 1.0


def _ref_v3(pa, pb):
    al, bl = len(pa), len(pb)
    if al == bl:
        if pa[0] == pb[0]:
            return 1.0
        if al > 1 and pa[1] == pb[1] and THING_URI not in pa[1]:
            return 1.0
        return 0.0
    if al > bl:
        return 1.0 if pa[al - bl] == pb[0] and THING_URI not in pb[0] else 0.0
    return 1.0 if pb[bl - al] == pa[0] and THING_URI not in pa[0] else 0.0


def _ref_v4(pa, pb):
    return 1.0 if len(pa) == len(pb) and pa[0] == pb[0] else 0.0


def _ref_v5(pa, pb, dis, k):
    if _disjoint(dis, pa, pb):
        return 0.0
    if len(pa) == len(pb) and pa[0] == pb[0]:
        return 1.0
    inter = len(set(pa) & set(pb))
    return (2 * inter + k) / (len(pa) + len(pb) + k)


def _ref_v6(pa, pb, dis, k):
    if _disjoint(dis, pa, pb):
        return 0.0
    if len(pa) == len(pb) and pa[0] == pb[0]:
        return 1.0
    inter = len(set(pa) & set(pb))
    return (inter + k) / (max(len(pa), len(pb)) + k)


@pytest.fixture(scope="module")
def cpd(spark):
    sub = spark.createDataFrame(SUB, "child string, parent string")
    dis = spark.createDataFrame(DIS, "child string, target string")
    paths = class_paths(sub)
    return disjoint_targets(paths, dis).cache()


@pytest.mark.parametrize("version,k", [(1, 0), (2, 0), (3, 0), (4, 0), (5, 1.0), (6, 1.0)])
def test_compat_golden(spark, cpd, version, k):
    sub = dict((c, p) for c, p in SUB)
    dis = dict(DIS)
    got = {
        (r.c1, r.c2): r.score
        for r in compat_pairs(cpd, version=version, k=k).collect()
    }
    ref_fns = {
        1: lambda pa, pb: _ref_v1(pa, pb),
        2: lambda pa, pb: _ref_v2(pa, pb, dis),
        3: lambda pa, pb: _ref_v3(pa, pb),
        4: lambda pa, pb: _ref_v4(pa, pb),
        5: lambda pa, pb: _ref_v5(pa, pb, dis, k),
        6: lambda pa, pb: _ref_v6(pa, pb, dis, k),
    }
    classes = sorted({c for e in SUB for c in e})
    assert set(got) == {(a, b) for a in classes for b in classes}
    for a in classes:
        for b in classes:
            want = ref_fns[version](_path(a, sub), _path(b, sub))
            assert math.isclose(got[(a, b)], want, abs_tol=1e-6), (
                f"v{version} ({a}, {b}): spark={got[(a, b)]} ref={want}"
            )


def test_paths_and_truncation(spark, cpd):
    from ontoea_spark.ontology.tree import truncate_paths

    sub = dict(SUB)
    got = {r.cls: list(r.path) for r in cpd.select("cls", "path").collect()}
    for c, p in got.items():
        assert p == _path(c, sub)
    tr = {
        r.cls: list(r.path)
        for r in truncate_paths(cpd.select("cls", "path"), 2).collect()
    }
    for c, p in tr.items():
        assert p == _path(c, sub)[-2:] or (len(_path(c, sub)) <= 2 and p == _path(c, sub))


def test_ontology_structure_lines(spark):
    """G10 golden: BFS layers of a 3-level tree, sorted children."""
    from ontoea_spark.ontology.tree import THING_URI, ontology_structure_lines

    sub = spark.createDataFrame(
        [
            ("ns/B", THING_URI),
            ("ns/A", THING_URI),
            ("ns/C", "ns/A"),
            ("ns/D", "ns/A"),
            ("ns/E", "ns/B"),
        ],
        "child string, parent string",
    )
    lines = ontology_structure_lines(sub)
    assert lines == [
        "(Thing)\t",
        "(A B)\t",
        "(C D)\t(E)\t",
    ]
