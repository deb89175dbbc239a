"""Where does a query's wall-clock go? For each named query, times
three phases separately (min-of-N on the repeatable ones):

  build    qs[name](spark, sf_dir) — DataFrame construction; includes
           any eager localCheckpoint jobs and bounded collects the
           query performs at build time
  plan     first explain() of the built DF — Catalyst optimization +
           physical planning (cost scales with plan size)
  exec     noop write of the SAME DataFrame object — AQE + run, plan
           already optimized from the explain... NOTE Spark replans
           per action, so this still pays planning once per exec;
           the delta (exec - plan) isolates actual execution

Run solo (bench discipline applies).
Usage: python tools/query_breakdown.py [sf_dir] [rounds] name ...
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_inreach_spark.queries import all_queries  # noqa: E402
from etl_inreach_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:]
    qs = all_queries()
    spark = get_spark("query-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    # warm Arrow workers like bench.py
    import pandas as _pd  # noqa: F401

    warm = spark.range(64).repartition(32)
    warm.mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        rec = {"build": [], "plan": [], "exec": []}
        for _ in range(rounds):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            t1 = time.monotonic()
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            )
            t2 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.monotonic()
            rec["build"].append(round(t1 - t0, 3))
            rec["plan"].append(round(t2 - t1, 3))
            rec["exec"].append(round(t3 - t2, 3))
        out[name] = {
            "build_min": min(rec["build"]),
            "plan_min": min(rec["plan"]),
            "exec_min": min(rec["exec"]),
            "all": rec,
        }
        # bench.py's inter-query hygiene
        try:
            for _rid, rdd in spark.sparkContext._jsc.getPersistentRDDs().items():
                rdd.unpersist()
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
