"""Similarity search over embedding columns (array<float>).

Two execution tiers:

- **blockwise brute force** (the exact baseline): ``mapInPandas``
  computes cosine against the query for each Arrow batch with one
  numpy matmul, keeps a per-batch top-k, and a final tiny
  ``orderBy().limit(k)`` merges partials. At 100 TB this is a single
  scan + a k-row-per-partition reduction — no shuffle of the vectors
  themselves.
- **random-hyperplane LSH** (the approximate scale path): a seeded
  hyperplane matrix assigns every vector a bucket id; the query probes
  its own bucket plus all Hamming-1 neighbors and reranks candidates
  exactly. Candidate generation is a bucket equi-join — the classic
  sublinear ANN layout.

Expression-based cosine (functions/vectors.py) stays available for
oracle-checkable plans; the numpy paths here are the throughput tier.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)


def _as_unit(vec: Sequence[float]) -> np.ndarray:
    q = np.asarray(vec, dtype=np.float64)
    n = np.linalg.norm(q)
    if n == 0:
        raise ValueError("query vector has zero norm")
    return q / n


def cosine_topk_blockwise(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity, vectorized per Arrow batch."""
    q = _as_unit(query)
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("cosine_sim", DoubleType(), False),
        ]
    )

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sims = (mat @ q) / norms
            top = np.argsort(-sims, kind="stable")[:k]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[top], "cosine_sim": sims[top]}
            )

    partials = emb.select(id_col, vec_col).mapInPandas(scan, out_schema)
    return partials.orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    ).limit(k)


def hyperplane_planes(dim: int, n_planes: int = 12, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes (unit rows)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    return planes / np.linalg.norm(planes, axis=1, keepdims=True)


def lsh_bucket_ids(
    emb: DataFrame,
    planes: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector its hyperplane-sign bucket id."""
    p = planes.astype(np.float64)
    out_schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("bucket", LongType(), False),
        ]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(p.shape[0], dtype=np.int64)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (mat @ p.T) > 0
            buckets = (bits.astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": buckets})

    return emb.select(id_col, vec_col).mapInPandas(assign, out_schema)


def query_probe_buckets(query: Sequence[float], planes: np.ndarray) -> list[int]:
    """Query bucket + all Hamming-1 neighbors (multi-probe)."""
    q = np.asarray(query, dtype=np.float64)
    bits = (planes.astype(np.float64) @ q) > 0
    weights = 1 << np.arange(planes.shape[0], dtype=np.int64)
    base = int((bits.astype(np.int64) * weights).sum())
    return [base] + [base ^ (1 << i) for i in range(planes.shape[0])]


def cosine_topk_lsh(
    emb: DataFrame,
    query: Sequence[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: LSH bucket prefilter + exact rerank.

    The filter keeps only vectors in the query's probe buckets, so the
    exact cosine runs over a small candidate set; recall grows with
    multi-probing and shrinks with n_planes.
    """
    first = emb.select(vec_col).first()
    if first is None:
        return cosine_topk_blockwise(emb, query, k, id_col=id_col, vec_col=vec_col)
    dim = len(first[0])
    planes = hyperplane_planes(dim, n_planes=n_planes, seed=seed)
    buckets = lsh_bucket_ids(emb, planes, id_col=id_col, vec_col=vec_col)
    probes = query_probe_buckets(query, planes)
    candidate_ids = buckets.filter(F.col("bucket").isin(probes)).select(id_col)
    candidates = emb.join(candidate_ids, on=id_col, how="left_semi")
    return cosine_topk_blockwise(
        candidates, query, k, id_col=id_col, vec_col=vec_col
    )
