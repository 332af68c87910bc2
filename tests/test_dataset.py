"""load_dataset_folder over a synthetic OpenEA-layout directory — the
one-call entry point a reference user migrates through."""

from __future__ import annotations

import os


def _write(p, lines):
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_load_dataset_folder(spark, tmp_path):
    from ontoea_spark.sources.dataset import load_dataset_folder

    d = str(tmp_path / "D_W_TINY")
    _write(f"{d}/rel_triples_1", ["a1\tp1\tb1", "b1\tp2\tc1", "a1\tp1\tb1"])
    _write(f"{d}/rel_triples_2", ["a2\tp1\tb2"])
    _write(
        f"{d}/attr_triples_1",
        ["<a1> <name> \"Alpha One\" .", "<b1> <name> \"Beta\" ."],
    )
    _write(f"{d}/attr_triples_2", ["<a2> <name> \"Alpha Two\" ."])
    _write(f"{d}/721_5fold/1/train_links", ["a1\ta2"])
    _write(f"{d}/721_5fold/1/valid_links", ["b1\tb2"])
    _write(f"{d}/721_5fold/1/test_links", ["c1\tc2"])
    _write(
        f"{d}/onto_subClassOf_triples",
        ["<ns/A>\t<subClassOf>\t<http://www.w3.org/2002/07/owl#Thing>"],
    )
    _write(f"{d}/crossview_link_1", ["a1\tns/A"])
    _write(f"{d}/crossview_link_2", ["a2\tns/A"])

    b = load_dataset_folder(spark, d)
    assert {tuple(r) for r in b.rel1.collect()} == {
        ("a1", "p1", "b1"),
        ("b1", "p2", "c1"),
    }
    assert b.rel2.count() == 1
    assert {tuple(r) for r in b.attr1.collect()} == {
        ("a1", "name", '"Alpha One"'),
        ("b1", "name", '"Beta"'),
    }
    assert [tuple(r) for r in b.train_links.collect()] == [("a1", "a2")]
    assert b.valid_links.count() == 1 and b.test_links.count() == 1
    assert [tuple(r) for r in b.onto_sub.collect()] == [
        ("ns/A", "subClassOf", "http://www.w3.org/2002/07/owl#Thing")
    ]
    assert [tuple(r) for r in b.cv1.collect()] == [("a1", "ns/A")]


def test_load_dataset_folder_missing_onto(spark, tmp_path):
    from ontoea_spark.sources.dataset import load_dataset_folder

    d = str(tmp_path / "NO_ONTO")
    _write(f"{d}/rel_triples_1", ["a1\tp1\tb1"])
    _write(f"{d}/rel_triples_2", ["a2\tp1\tb2"])
    _write(f"{d}/attr_triples_1", ["<a1> <n> \"x\" ."])
    _write(f"{d}/attr_triples_2", ["<a2> <n> \"y\" ."])
    for name in ("train_links", "valid_links", "test_links"):
        _write(f"{d}/721_5fold/1/{name}", ["a1\ta2"])
    b = load_dataset_folder(spark, d)
    assert b.onto_sub is None and b.cv1 is None and b.cv2 is None
    assert b.rel1.count() == 1
