"""One-call loader for an OpenEA/OntoEA dataset FOLDER — the layout the
reference's ``read_kgs_from_folder`` consumes (kgs.py:342-409):

    <folder>/rel_triples_1          tab/space-separated (s, p, o)
    <folder>/rel_triples_2
    <folder>/attr_triples_1         (e, a, literal...)
    <folder>/attr_triples_2
    <folder>/<division>/train_links two-column tab links
    <folder>/<division>/valid_links
    <folder>/<division>/test_links
    <folder>/onto_subClassOf_triples   (optional, bracket-wrapped URIs)
    <folder>/crossview_link_1          (optional, entity<TAB>class)
    <folder>/crossview_link_2

A reference user points this at their existing D-W-15K / EN-FR-15K
checkout and gets DataFrames wired to the same parsers the oracle gate
verifies (sources/readers.py). Files load via ``spark.read.text`` so the
folder can live on any Hadoop-visible filesystem.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ontoea_spark.sources.readers import (
    read_attribute_triples,
    read_links,
    read_relation_triples,
)


@dataclass
class DatasetBundle:
    rel1: DataFrame           # (s, p, o)
    rel2: DataFrame
    attr1: DataFrame          # (e, a, v)
    attr2: DataFrame
    train_links: DataFrame    # (e1, e2)
    valid_links: DataFrame
    test_links: DataFrame
    onto_sub: DataFrame | None   # (s, p, o) subClassOf triples
    cv1: DataFrame | None        # (e1=entity, e2=class)
    cv2: DataFrame | None


def _text(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path)


def _optional_text(spark: SparkSession, path: str) -> DataFrame | None:
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.text(path)
        df.schema  # force resolution so a missing path raises here
        return df
    except AnalysisException:
        return None


def load_dataset_folder(
    spark: SparkSession,
    folder: str,
    division: str = "721_5fold/1",
    onto: bool = True,
) -> DatasetBundle:
    """Compose the S1-S5 readers over the reference folder layout."""
    j = lambda *p: posixpath.join(folder, *p)  # noqa: E731
    rel1 = read_relation_triples(_text(spark, j("rel_triples_1")))
    rel2 = read_relation_triples(_text(spark, j("rel_triples_2")))
    attr1 = read_attribute_triples(_text(spark, j("attr_triples_1")))
    attr2 = read_attribute_triples(_text(spark, j("attr_triples_2")))
    train = read_links(_text(spark, j(division, "train_links")))
    valid = read_links(_text(spark, j(division, "valid_links")))
    test = read_links(_text(spark, j(division, "test_links")))
    onto_sub = cv1 = cv2 = None
    if onto:
        t = _optional_text(spark, j("onto_subClassOf_triples"))
        onto_sub = read_relation_triples(t, bracket=True) if t is not None else None
        c1 = _optional_text(spark, j("crossview_link_1"))
        c2 = _optional_text(spark, j("crossview_link_2"))
        cv1 = read_links(c1) if c1 is not None else None
        cv2 = read_links(c2) if c2 is not None else None
    return DatasetBundle(
        rel1=rel1,
        rel2=rel2,
        attr1=attr1,
        attr2=attr2,
        train_links=train,
        valid_links=valid,
        test_links=test,
        onto_sub=onto_sub,
        cv1=cv1,
        cv2=cv2,
    )
