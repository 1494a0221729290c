"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — exact brute-force top-k per query: broadcast the
  (small) query set, one scan of the corpus, native ``zip_with`` /
  ``aggregate`` dot products inside codegen, per-query top-k via
  window. The correctness baseline.
- ``lsh_topk`` — random-hyperplane LSH bucketed approximate top-k:
  queries only join their own (multi-probe) buckets; at 100 TB this
  replaces the full scan with bucket-pruned scans. Same output schema.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_topk", "lsh_topk"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    max_queries: int | None = 10_000,
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank).

    O(|corpus| x |queries|) by construction — the right tool for a
    small, broadcastable query set only. ``max_queries`` is the guard
    rail: query sets above it raise with a pointer to ``lsh_topk`` (the
    bucket-pruned scale path) instead of silently planning a crossJoin
    that would never finish at corpus ≈ query-set scale. Pass
    ``max_queries=None`` to opt out explicitly.
    """
    if max_queries is not None:
        n_q = queries.limit(max_queries + 1).count()
        if n_q > max_queries:
            raise ValueError(
                f"cosine_topk is exact brute force (O(corpus x queries)); "
                f"query set exceeds max_queries={max_queries}. Use lsh_topk "
                f"for large query sets, or pass max_queries=None to force."
            )
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__cv__"),
    ).withColumn("__cn__", _norm(F.col("__cv__")))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("__qv__"),
    ).withColumn("__qn__", _norm(F.col("__qv__")))

    joined = c.crossJoin(F.broadcast(q))
    cos = _dot(F.col("__cv__"), F.col("__qv__")) / (F.col("__cn__") * F.col("__qn__"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_sig(v: Column, planes: np.ndarray) -> Column:
    sig = None
    for i in range(len(planes)):
        arr = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(v, arr) > 0).cast("long")
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    n_planes: int = 8,
    n_probes: int = 3,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane buckets.

    Multi-probe: each query also probes the ``n_probes-1`` buckets at
    hamming distance 1 (single-bit flips of its own signature) — recall
    knob without re-hashing the corpus.
    """
    if dim is None:
        from openmldb_spark.operators.dedup import _infer_dim

        dim = _infer_dim(corpus, vec_col)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("__cv__"),
    )
    c = c.withColumn("__cn__", _norm(F.col("__cv__"))).withColumn(
        "__b__", _plane_sig(F.col("__cv__"), planes)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("__qv__"),
    ).withColumn("__qn__", _norm(F.col("__qv__")))
    qsig = _plane_sig(F.col("__qv__"), planes)
    probe_exprs = [qsig] + [
        qsig.bitwiseXOR(F.lit(1 << i)) for i in range(min(n_probes - 1, n_planes))
    ]
    q = q.withColumn("__b__", F.explode(F.array(*probe_exprs)))

    joined = c.join(F.broadcast(q), "__b__")
    cos = _dot(F.col("__cv__"), F.col("__qv__")) / (F.col("__cn__") * F.col("__qn__"))
    scored = joined.select("query_id", "vec_id", cos.alias("cosine")).dropDuplicates(
        ["query_id", "vec_id"]
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
