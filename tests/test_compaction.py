"""Small-file compaction (operators/compaction.py): fewer files, same
data, no shuffle, idempotent no-op once sized."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_inreach_spark.catalog import load_table


def _content_fingerprint(df):
    # order-insensitive: count + xor of row hashes
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(o_orderkey, o_custkey))").alias("h"),
    ).first()


def test_compact_parquet_reduces_files_preserving_data(spark, sf_dir, tmp_path):
    from etl_inreach_spark.operators.compaction import compact_parquet, parquet_file_stats

    p = str(tmp_path / "frag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    o.repartition(32).write.parquet(p)
    assert len(parquet_file_stats(spark, p)) == 32
    fp_before = _content_fingerprint(spark.read.parquet(p))

    total = sum(b for _, b in parquet_file_stats(spark, p))
    stats = compact_parquet(spark, p, target_file_bytes=max(1, total // 3))
    assert stats["compacted"] and stats["files_before"] == 32
    assert stats["files_after"] <= 4
    assert _content_fingerprint(spark.read.parquet(p)) == fp_before

    # converges: tiny files are metadata-dominated, so the rewrite
    # shrinks bytes and a follow-up pass may legitimately compact
    # further — but a fixed point (metadata-only no-op) is reached
    # within a couple of passes and the data never changes
    for _ in range(3):
        again = compact_parquet(spark, p, target_file_bytes=max(1, total // 3))
        if not again["compacted"]:
            break
    assert not again["compacted"]
    assert _content_fingerprint(spark.read.parquet(p)) == fp_before


def test_compact_plan_is_shuffle_free(spark, sf_dir, tmp_path):
    from etl_inreach_spark.operators.compaction import compact_parquet

    p = str(tmp_path / "frag2")
    load_table(spark, sf_dir, "orders").select("o_orderkey").repartition(16).write.parquet(p)
    # the rewrite plan is coalesce-over-scan: pin that directly
    df = spark.read.parquet(p).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    stats = compact_parquet(spark, p, target_file_bytes=1 << 40)
    assert stats["files_after"] == 1 and stats["compacted"]
