"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.13 rebuild surface): cumulative per-relation mention
counts across micro-batches.

Spark's built-in streaming aggregation covers this exact case; the
point here is the *custom-state* plumbing — state schema, timeout
handling signature, Arrow-batched update function — which is what a
bespoke operator (e.g. incremental MinHash union, per-entity embedding
deltas) would reuse.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def cumulative_counts(mentions: DataFrame) -> DataFrame:
    """mentions: streaming DataFrame with a ``p`` column. Emits one row
    per (relation, micro-batch-with-updates): the running total so far.
    Output: (p: string, total: long)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (p,) = key
        n = sum(len(pdf) for pdf in pdfs)
        total = (state.get[0] if state.exists else 0) + n
        state.update((total,))
        yield pd.DataFrame({"p": [p], "total": [total]})

    return mentions.groupBy("p").applyInPandasWithState(
        update,
        outputStructType="p string, total long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
