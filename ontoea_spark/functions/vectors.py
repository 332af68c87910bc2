"""Vector expression builders over array<float|double> columns.

JVM-side (codegen'd) dot/cosine/L2 for correctness paths and small inputs;
the scale path for all-pairs scoring is the blocked pandas-UDF matmul in
operators/simjoin.py. Reference semantics: inner product on L2-normalized
embeddings (/root/reference/code/src/openea/modules/finding/similarity.py:30-36).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Inner product, computed in double left-to-right."""
    return F.aggregate(
        F.zip_with(as_double(a), as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize(a: Column) -> Column:
    """Row L2 normalization (preprocessing.normalize semantics; zero vectors
    pass through unchanged)."""
    n = l2_norm(a)
    return F.when(n == 0.0, as_double(a)).otherwise(
        F.transform(as_double(a), lambda x: x / n)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double; 0.0 when either norm is zero."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0.0) | (nb == 0.0), F.lit(0.0)).otherwise(
        dot(a, b) / (na * nb)
    )
