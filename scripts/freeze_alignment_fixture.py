"""Freeze the trained alignment model's EVAL-STAGE inputs as parquet
fixtures, so the fused scoring + rank + Hits/MR/MRR half of the
`alignment_hits` pipeline becomes a hash-checked driver row
(`alignment_eval`) instead of a rows-only record (VERDICT r4
'missing' #4: training is iterative and non-SQL-expressible, but
everything AFTER the weights are frozen is plain SQL).

Deterministic: same benchmark (generate_two_kg n_ent=150 seed=42) and
training config (dim 32, epochs 60, seed 42) as driver query
`alignment_hits` — re-running this script reproduces byte-identical
fixtures (hash-negative training, no RNG in the spark path).

Writes single-file parquet (pyarrow, ZSTD-free defaults) under
ontoea_spark/data/alignment_fixture/:
  left.parquet    (id, vec)   l2(ent[test_id1] @ mapping) — mapped left
  right.parquet   (id, vec)   l2(ent[test_id2])
  lcls.parquet    (lid, c1)   left entity -> class name
  rcls.parquet    (rid, c2)   right entity -> class name
  compat.parquet  (c1, c2, score)  v5 class-compatibility (J11)
  gold.parquet    (lid, gold_rid)  test gold links

Usage:  python scripts/freeze_alignment_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    from ontoea_spark.session import get_spark
    from ontoea_spark.training.align_pipeline import (
        _compat_table,
        prepare_from_parts,
        train,
    )
    from ontoea_spark.training.benchgen import generate_two_kg
    from ontoea_spark.training.trainer import TrainConfig
    from pyspark.sql import functions as F

    spark = get_spark("freeze_alignment_fixture", master="local[8]")
    bench = generate_two_kg(spark, n_ent=150, seed=42)
    data = prepare_from_parts(
        spark, bench.triples1, bench.triples2, bench.links, bench.cv
    )
    model = train(data, TrainConfig(dim=32, epochs=60, seed=42))

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "ontoea_spark",
        "data",
        "alignment_fixture",
    )
    os.makedirs(out, exist_ok=True)

    test = data.links_split.filter(F.col("split") == "test")
    ids1 = np.array([r.id1 for r in test.select("id1").collect()], dtype=np.int64)
    ids2 = np.array([r.id2 for r in test.select("id2").collect()], dtype=np.int64)
    norm2 = model.ent[ids2] / np.linalg.norm(
        model.ent[ids2], axis=1, keepdims=True
    )

    import pandas as pd

    def write(name: str, pdf: pd.DataFrame) -> None:
        path = os.path.join(out, f"{name}.parquet")
        pdf.to_parquet(path, index=False)
        print(f"wrote {path} ({len(pdf)} rows)")

    write(
        "left",
        pd.DataFrame(
            {"id": ids1, "vec": [list(map(float, v)) for v in model.mapped_embeds(ids1)]}
        ),
    )
    write(
        "right",
        pd.DataFrame({"id": ids2, "vec": [list(map(float, v)) for v in norm2]}),
    )
    lcls = (
        data.cv_ids.withColumnRenamed("ent_id", "lid")
        .join(data.cls_ids, "cls_id")
        .select("lid", F.col("cls").alias("c1"))
    )
    rcls = (
        data.cv_ids.withColumnRenamed("ent_id", "rid")
        .join(data.cls_ids, "cls_id")
        .select("rid", F.col("cls").alias("c2"))
    )
    write("lcls", lcls.toPandas())
    write("rcls", rcls.toPandas())
    compat = _compat_table(spark, data, model, "compat", 1.0)
    write("compat", compat.toPandas())
    gold = test.select(F.col("id1").alias("lid"), F.col("id2").alias("gold_rid"))
    write("gold", gold.toPandas())


if __name__ == "__main__":
    main()
