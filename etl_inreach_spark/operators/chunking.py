"""Document chunking for retrieval / training-context assembly: split
each document's token sequence into fixed-capacity windows with a
configurable stride (overlap = capacity - stride), the standard RAG /
long-context preprocessing step.

Distinct from sequence PACKING (operators/packing.py): packing
concatenates many docs into fixed bins; chunking splits one doc into
overlapping windows. Complements it on the corpus -> training-batches
path.

Scale design: one narrow pass — tokenize (codegen split+filter), emit
chunk-start offsets with ``sequence``/``posexplode`` (array bounded by
ceil(n_tokens/stride), never materialized corpus-wide), then per-chunk
``slice`` + ``array_join``. No shuffle at all: every row's chunks
derive from that row alone, so the operator scales embarrassingly —
at 100 TB it is exactly as partitionable as the parquet scan itself.
``slice``/``array_join`` are HOF-free array builtins (codegen-able),
and the token array is built ONCE per document inside a single
projection (the explode carries it along, not recomputed per chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_inreach_spark.functions.text import tokens


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 128,
    stride: int = 96,
) -> DataFrame:
    """(id, chunk_idx, start_tok, n_tokens, chunk_text): whitespace
    tokens split into windows of ``capacity`` tokens starting every
    ``stride`` tokens (trailing windows may be short; zero-token docs
    emit no chunks). chunk_idx is 0-based; start_tok = chunk_idx *
    stride. Deterministic pure function of (id, text)."""
    if stride <= 0 or capacity <= 0:
        raise ValueError("capacity and stride must be positive")
    ts = df.select(
        F.col(id_col),
        tokens(F.col(text_col)).alias("_ts"),
    ).withColumn("_n", F.size("_ts"))
    chunks = ts.filter(F.col("_n") > 0).select(
        F.col(id_col),
        "_ts",
        F.posexplode(
            F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
        ).alias("chunk_idx", "_start"),
    )
    return chunks.select(
        F.col(id_col),
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("_start").cast("bigint").alias("start_tok"),
        F.least(F.lit(capacity), F.size("_ts") - F.col("_start"))
        .cast("bigint")
        .alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_ts"), F.col("_start") + 1, F.lit(capacity)), " "
        ).alias("chunk_text"),
    )
