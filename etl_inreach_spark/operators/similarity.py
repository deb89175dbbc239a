"""Similarity search over embedding columns: brute-force top-k cosine
(the exactness baseline) and random-hyperplane LSH bucketing (the
scale path).

Scale design:
  * brute-force — broadcast the (small) query set against the corpus:
    shuffle-free, one pass over the corpus per batch of queries, then
    a per-query top-k window on a tiny intermediate. Right answer for
    "score 100 TB of corpus against K queries".
  * LSH — constant-size bit signature per vector computed by a
    vectorized Arrow pandas UDF (numpy matmul against fixed seeded
    hyperplanes); candidates = bucket collisions (multi-probe over
    1-bit flips); exact cosine re-rank within candidates. Turns
    all-pairs O(n*m) into per-bucket work.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_inreach_spark.functions.vectors import cosine
from etl_inreach_spark.operators.dedup import topk_by_key

LSH_SEED = 42


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (q_id, vec_id, rank, cos). Self-matches (same id) are
    excluded. Deterministic: ties broken by neighbor id.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.join(F.broadcast(q), F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        cosine(F.col("_qvec"), F.col(vec_col)).alias("cos"),
    )
    top = topk_by_key(
        scored, [query_id_col], [F.col("cos").desc(), F.col(id_col).asc()], k, rank_col="rank"
    )
    return top.select(query_id_col, id_col, "rank", "cos")


def lsh_signatures(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = LSH_SEED,
) -> DataFrame:
    """Random-hyperplane signature per vector (int bucket id).

    Arrow-vectorized mapInPandas: one numpy matmul per batch against
    planes generated from a fixed seed on each executor (deterministic,
    no broadcast needed — planes are derived, not shipped).
    """
    out_schema = f"{id_col} bigint, {vec_col} array<float>, bucket int"

    def sign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = np.random.RandomState(seed).randn(dim, num_planes)
        weights = 1 << np.arange(num_planes)
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())
            bits = (mat @ planes) > 0
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "bucket": (bits @ weights).astype("int32"),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(sign_batches, out_schema)


def _probe_buckets(bucket, num_planes: int):
    """bucket plus all 1-bit-flip neighbors (multi-probe)."""
    return F.array(bucket, *[bucket.bitwiseXOR(F.lit(1 << i)) for i in range(num_planes)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    num_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "q_id",
) -> DataFrame:
    """Approximate top-k: bucket join on LSH signature (multi-probe
    radius 1), exact cosine re-rank inside candidate buckets.

    Same output contract as brute_force_topk; recall < 1 by design —
    pytest pins the achieved recall on the fixed testdata.

    Honest scaling note: hyperplane LSH recall rides on angular
    cluster structure. The driver's synthetic embeddings are
    near-orthogonal random vectors (max query cosine ~0.4), so recall
    here ~= scan fraction (planes=4 + 1-bit probes => ~31% scan, ~35%
    recall); on real clustered embedding corpora the same operator
    concentrates true neighbors into probed buckets and recall >>
    scan fraction. The operator is the scale PATTERN: signature once
    per vector (Arrow-vectorized), candidates via equi-join, exact
    math only inside buckets.
    """
    c_sig = lsh_signatures(corpus, dim, num_planes, id_col, vec_col)
    q_sig = lsh_signatures(queries, dim, num_planes, id_col, vec_col).select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(_probe_buckets(F.col("bucket"), num_planes)).alias("bucket"),
    )
    cand = c_sig.join(F.broadcast(q_sig), on="bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    scored = cand.select(
        query_id_col, id_col, cosine(F.col("_qvec"), F.col(vec_col)).alias("cos")
    ).dropDuplicates([query_id_col, id_col])
    top = topk_by_key(
        scored, [query_id_col], [F.col("cos").desc(), F.col(id_col).asc()], k, rank_col="rank"
    )
    return top.select(query_id_col, id_col, "rank", "cos")
