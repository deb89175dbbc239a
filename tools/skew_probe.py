"""Skew-stress probe for the round-7 re-rendered event-window queries
(VERDICT r7 item 5): run ``trailing_1h_distinct_users`` and
``session_path_trigrams`` over a 10x events relation under (a) the
natural uniform event_type mix and (b) a skewed mix where ONE type
carries >= 90% of traffic, recording wall-clock AND the max single
task duration per run (straggler detector — the number a bucketing
claim must hold down). The bucketing claims under test:

* trailing_1h windows per (event_type, day): a 90%-type's work still
  splits across ~30 day buckets, so its max task is bounded by one
  (type, day), not the type's full history;
* session_path_trigrams partitions by user — event_type skew must not
  move its max task at all (the skewed column is not the shuffle key).

Max task time comes from Spark's REST status API (the probe session
enables the UI), taking the max over all stages of the query's job
group. Run solo (bench discipline applies).

Usage: python tools/skew_probe.py [sf_dir] [replication]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_inreach_spark.catalog import load_table  # noqa: E402
from etl_inreach_spark.session import RUNTIME_CONF  # noqa: E402


def _get_spark_with_ui():
    from pyspark.sql import SparkSession

    from etl_inreach_spark.session import BUILDER_ONLY_CONF

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew-probe")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4050")
    )
    for k, v in {**RUNTIME_CONF, **BUILDER_ONLY_CONF}.items():
        b = b.config(k, v)
    return b.getOrCreate()


def _rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4050/api/v1{path}") as r:
        return json.load(r)


def _max_task_ms(app_id: str, stage_ids: set[int]) -> float:
    worst = 0.0
    for sid in stage_ids:
        try:
            summ = _rest(
                f"/applications/{app_id}/stages/{sid}/0/taskSummary"
                "?quantiles=1.0"
            )
            worst = max(worst, float(summ["duration"][0]))
        except Exception:
            continue
    return worst


def _run(spark, name, fn, sf_dir, repeats: int = 3):
    """One discarded warm-up pass (codegen/shuffle JIT), then
    min-of-``repeats`` for wall (the bench discipline) and ALL
    per-repeat max-task values for the straggler signal: a straggler
    detector must not hide an intermittent straggler behind a
    min-of-max (ADVICE r8), so the probe reports every repeat's max
    task plus its worst case."""
    sc = spark.sparkContext
    fn(spark, sf_dir).count()  # warm-up, not measured
    best_wall = None
    task_maxes: list[float] = []
    n = 0
    for rep in range(repeats):
        group = f"probe:{name}:{rep}"
        sc.setJobGroup(group, name)
        t0 = time.monotonic()
        n = fn(spark, sf_dir).count()
        wall = time.monotonic() - t0
        app_id = sc.applicationId
        stage_ids: set[int] = set()
        for j in sc.statusTracker().getJobIdsForGroup(group):
            ji = sc.statusTracker().getJobInfo(j)
            if ji is not None:
                stage_ids.update(ji.stageIds)
        sc.setLocalProperty("spark.jobGroup.id", None)
        sc.setLocalProperty("spark.job.description", None)
        task_maxes.append(_max_task_ms(app_id, stage_ids) / 1000.0)
        best_wall = wall if best_wall is None else min(best_wall, wall)
    return {
        "wall_sec": round(best_wall, 2),
        "rows": n,
        "max_task_sec": round(max(task_maxes), 2),
        "max_task_sec_per_repeat": [round(t, 2) for t in task_maxes],
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repl = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = _get_spark_with_ui()
    spark.sparkContext.setLogLevel("ERROR")
    from etl_inreach_spark.queries_analytics import (
        session_path_trigrams,
        trailing_1h_distinct_users,
    )

    ev = load_table(spark, sf_dir, "events")
    root = tempfile.mkdtemp(prefix="spark_graft_skewprobe_")
    variants = {}
    reps = F.explode(
        F.array(*[F.lit(k).cast("bigint") for k in range(repl)])
    ).alias("_k")
    base = ev.select("*", reps).select(
        (F.col("event_id") + F.col("_k") * F.lit(10**12)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("_k") * F.lit(10**9)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    for label, df in (
        ("uniform", base),
        (
            # >= 90% of all traffic remapped onto ONE type
            "skew90",
            base.withColumn(
                "event_type",
                F.when(
                    F.pmod(F.xxhash64("event_id", "user_id"), F.lit(10)) < 9,
                    F.lit("click"),
                ).otherwise(F.col("event_type")),
            ),
        ),
    ):
        d = os.path.join(root, label)
        df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        variants[label] = d

    out = {"sf_dir": sf_dir, "replication": repl}
    for label, d in variants.items():
        n = spark.read.parquet(os.path.join(d, "events.parquet")).count()
        mix = (
            spark.read.parquet(os.path.join(d, "events.parquet"))
            .groupBy("event_type")
            .count()
            .orderBy(F.desc("count"))
            .first()
        )
        out[label] = {
            "n_events": n,
            "top_type_share": round(mix["count"] / n, 3),
            "trailing_1h_distinct_users": _run(
                spark, f"trailing:{label}", trailing_1h_distinct_users, d
            ),
            "session_path_trigrams": _run(
                spark, f"trigrams:{label}", session_path_trigrams, d
            ),
        }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
