"""Full G8 class completion vs a sequential transcription of
find_class_by_relation (inference.py:193-282) + the T5 min-entropy
argmax — on a hand-built KG with mixed-depth classes."""

from __future__ import annotations

import math

import pytest

from tests.conftest import REPO  # noqa: F401

from ontoea_spark.ontology.completion import complete_classes
from ontoea_spark.ontology.tree import THING_URI, class_paths

SUB = [
    ("leaf:a", "mid:x"),
    ("leaf:b", "mid:x"),
    ("leaf:c", "mid:y"),
    ("leaf:d", "kind:q"),
    ("mid:x", "kind:p"),
    ("mid:y", "kind:q"),
    ("kind:p", THING_URI),
    ("kind:q", THING_URI),
]

# typed entities: h1..h6; untyped: u1, u2, u3
CV = {
    "h1": "leaf:a", "h2": "leaf:a", "h3": "leaf:b",
    "h4": "leaf:c", "h5": "leaf:d", "h6": "mid:x",
    "t1": "leaf:c", "t2": "leaf:d", "t3": "leaf:a",
}
TRIPLES = [
    # u1's tails are class leaf:c under r1 -> heads of r1 with leaf:c
    # tails: h1, h2 (class leaf:a), h3 (leaf:b)
    ("u1", "r1", "t1"),
    ("h1", "r1", "t1"), ("h2", "r1", "t1"), ("h3", "r1", "t1"),
    # u2 under r2 with leaf:d tails; heads h4 (leaf:c), h5 (leaf:d)
    ("u2", "r2", "t2"),
    ("h4", "r2", "t2"), ("h5", "r2", "t2"),
    # u3 has an untyped tail only -> no evidence -> no prediction
    ("u3", "r3", "zz"),
    # noise: r1 triples with tails of a class u1 never points to
    ("h5", "r1", "t3"),
]


def _paths(sub):
    d = dict(sub)

    def p(c):
        out = [c]
        while c in d:
            out.append(d[c])
            c = d[c]
        return out

    return p


def _entropy(children, freq):
    if len(children) == 1:
        return 0.0
    fl = sorted(((c, freq[c]) for c in children), key=lambda x: (-x[1], x[0]))
    f1, f2 = fl[0][1], fl[1][1]
    p1, p2 = f1 / (f1 + f2), f2 / (f1 + f2)
    return -(p1 * math.log2(p1)) - (p2 * math.log2(p2))


def _ref_complete(triples, cv, sub, thr=0.7):
    pathf = _paths(sub)
    heads = {s for s, _p, _o in triples}
    untyped = sorted(h for h in heads if h not in cv)
    out = {}
    for e in untyped:
        evidence = {}
        for s, p, o in triples:
            if s == e and o in cv:
                evidence.setdefault(p, set()).add(cv[o])
        per_rel = {}
        for p, tclss in evidence.items():
            cand = {
                s
                for s, p2, o in triples
                if p2 == p and o in cv and cv[o] in tclss and s in cv
            }
            freq, tree = {}, {}
            for h in sorted(cand):
                cp = pathf(cv[h])
                for c in cp:
                    freq[c] = freq.get(c, 0) + 1
                for i in range(len(cp) - 1):
                    tree.setdefault(cp[i + 1], set()).add(cp[i])
            node, entropy = THING_URI, 0.0
            while node in tree:
                children = tree[node]
                entropy = _entropy(children, freq)
                if entropy > thr:
                    break
                node = sorted(children, key=lambda c: (-freq[c], c))[0]
            if node != THING_URI:
                per_rel[node] = min(per_rel.get(node, entropy), entropy)
        if per_rel:
            cls, ent = sorted(per_rel.items(), key=lambda kv: (kv[1], kv[0]))[0]
            out[e] = (cls, round(ent, 6))
    return out


def test_complete_classes_golden(spark):
    sub = spark.createDataFrame(SUB, "child string, parent string")
    paths = class_paths(sub)
    triples = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    cv = spark.createDataFrame(
        sorted(CV.items()), "entity string, cls string"
    )
    got = {
        r.entity: (r.cls, r.entropy)
        for r in complete_classes(triples, cv, paths).collect()
    }
    want = _ref_complete(TRIPLES, CV, SUB)
    assert got == want
    assert "u1" in want and "u3" not in want
