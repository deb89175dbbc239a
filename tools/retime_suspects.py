"""Min-of-N interleaved re-time of a named query list (VERDICT r10
item 3: eight sub-3s queries regressed >1.5x between the r9 and r10
bench draws with IDENTICAL Spark job counts — the signature of this
host's 10-30x between-stage CPU-draw noise, not of a plan change;
this harness settles each one).

Interleaving discipline: rounds iterate over ALL queries before any
repeat (``for round: for query``), so a noisy host window inflates
one ROUND of every query rather than every repeat of one query —
min-of-N then recovers each query's true cost. Execution is the
bench's noop write; the session is the bench session; job counts are
recorded per query so a real plan regression (job count drift) is
distinguishable from draw noise.

Usage: python tools/retime_suspects.py [sf_dir] [rounds] [name ...]
Prints one JSON line: {name: {"min_sec": s, "all_sec": [...],
"n_jobs": j}}. Run solo (bench discipline applies).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_inreach_spark.queries import all_queries  # noqa: E402
from etl_inreach_spark.session import get_spark  # noqa: E402

DEFAULT_SUSPECTS = [
    # VERDICT r10 "What's wrong" item 1, verbatim
    "auc_price_status",
    "bigram_lm_quality",
    "farthest_point_seeds",
    "embedding_standardize",
    "source_centroid_similarity",
    "corr_price_quantity",
    "embedding_project_jl",
    "exact_quantile_rankselect",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    names = sys.argv[3:] or DEFAULT_SUSPECTS
    spark = get_spark("retime-suspects")
    sc = spark.sparkContext
    qs = all_queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown: {missing}", file=sys.stderr)
        return 2

    def _exec(name):
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # one unmeasured warm pass (codegen JIT, shuffle service spin-up)
    for n in names:
        _exec(n)
    out = {n: {"all_sec": [], "n_jobs": None} for n in names}
    for r in range(rounds):
        for n in names:
            group = f"retime:{n}:{r}"
            sc.setJobGroup(group, n)
            t0 = time.monotonic()
            _exec(n)
            out[n]["all_sec"].append(round(time.monotonic() - t0, 3))
            out[n]["n_jobs"] = len(sc.statusTracker().getJobIdsForGroup(group))
            sc.setLocalProperty("spark.jobGroup.id", None)
            sc.setLocalProperty("spark.job.description", None)
    for n in names:
        out[n]["min_sec"] = min(out[n]["all_sec"])
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "queries": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
