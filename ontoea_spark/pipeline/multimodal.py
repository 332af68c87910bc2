"""Multimodal (image/audio/video) column plumbing (rebuild surface; no
reference counterpart — SURVEY.md §2.8 'rebuild adds').

Media are opaque ``binary`` columns + typed metadata. The Spark-side
plumbing is real — schema, Arrow batching, mapInPandas signature,
partition behaviour — while the actual codec work is stubbed because the
sandbox ships no image/audio libraries:

* :func:`decode_image` / :func:`resize_image` / :func:`sample_frames`
  raise ``NotImplementedError`` with the production signature documented
  (a real deployment drops PIL/ffmpeg behind the same functions);
* :func:`blob_features` runs the full distributed path with a
  *deterministic fake extractor* (md5-derived pseudo-embedding), so
  batching/schema/partitioning are exercised end-to-end and the output
  is oracle-checkable cross-engine.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def decode_image(blob: bytes) -> "object":
    """STUB: decode an image blob to an array. Production: PIL.Image.open
    (not available in this container)."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not in this environment; "
        "blob_features provides the deterministic fake path"
    )


def resize_image(blob: bytes, w: int, h: int) -> bytes:
    """STUB: re-encode resized image."""
    raise NotImplementedError("image resize requires PIL — see decode_image")


def sample_frames(blob: bytes, every_n: int) -> list[bytes]:
    """STUB: sample video frames. Production: pyav/ffmpeg."""
    raise NotImplementedError("frame sampling requires ffmpeg bindings")


def _fake_embedding(blob: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: dim floats in [0, 1) derived from
    md5(blob || ':' || i) — the stand-in for a real vision encoder, chosen
    so a SQL oracle can recompute it exactly."""
    out = []
    for i in range(dim):
        h = hashlib.md5(blob + b":" + str(i).encode()).hexdigest()
        out.append(int(h[:15], 16) % 1_000_000 / 1_000_000.0)
    return out


def blob_features(
    df: DataFrame,
    id_col: str = "url",
    blob_col: str = "html",
    dim: int = 4,
) -> DataFrame:
    """Distributed feature extraction over a binary column via
    ``mapInPandas`` (Arrow-batched; one Python worker pass per partition;
    never shuffles the blobs). Output schema:

        (id: string, n_bytes: long, blob_hash: long, emb: array<double>)
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_col]
            ids = pdf[id_col]
            n_bytes = blobs.map(len)
            hashes = blobs.map(
                lambda b: int(hashlib.md5(b).hexdigest()[:15], 16)
            )
            embs = blobs.map(lambda b: _fake_embedding(b, dim))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "n_bytes": n_bytes.astype("int64"),
                    "blob_hash": hashes.astype("int64"),
                    "emb": embs,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        extract,
        schema="id string, n_bytes long, blob_hash long, emb array<double>",
    )
