"""AQE skew-join handling: the runtime scale feature where adaptive
execution splits an oversized shuffle partition across multiple tasks
at JOIN time — at 100 TB this is what keeps one hot key (a null-ish
default id, a celebrity user) from serializing a whole stage onto one
executor. The registry also ships the MANUAL mitigation
(salted_skew_join); this pins that the AUTOMATIC one actually fires
under our session confs, so a regression (disabled conf, threshold
drift across Spark upgrades) is caught."""

from __future__ import annotations

from pyspark.sql import functions as F


def _skewed_frames(spark):
    # fact: 200k rows, 95% on key 0, the rest uniform over 1..999
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 20 < 19, F.lit(0))
        .otherwise((F.col("id") % 999) + 1)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("payload"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 97).alias("attr")
    )
    return fact, dim


def test_aqe_splits_skewed_partition(spark):
    fact, dim = _skewed_frames(spark)
    confs = {
        # force the sort-merge path (broadcast would hide the skew) and
        # lower the skew thresholds so the synthetic hot key qualifies
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # AQE re-decides the strategy at runtime with its OWN threshold
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # a GLOBAL aggregate on top: a keyed groupBy right after the
        # join requires hashpartitioning(k), and OptimizeSkewedJoin
        # refuses to break that guarantee unless forceOptimizeSkewedJoin
        # adds a shuffle — the realistic skew-split shape is
        # join -> row-level work, not join -> same-key agg
        j = fact.join(dim, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("attr").alias("s"),
            F.sum("payload").alias("p"),
        )
        got = j.collect()[0]
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the skew-split marker on the executed (adaptive) join
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    # parity: same join under default confs (broadcast path)
    ref = fact.join(F.broadcast(dim), "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("attr").alias("s"),
        F.sum("payload").alias("p"),
    ).collect()[0]
    assert (got.n, got.s, got.p) == (ref.n, ref.s, ref.p)
    # the hot key really is hot (the test would silently weaken if the
    # generator changed)
    assert fact.filter(F.col("k") == 0).count() > 150_000
