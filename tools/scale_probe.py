"""Scale probe: replicate the documents table RxN and measure how each
training-data operator's wall-clock grows — keeping the README's
100 TB claims measured, not asserted.

For each replication factor R the probe builds a temp sf_dir that
symlinks every driver table except ``documents.parquet``, which is
rewritten as R copies with offset doc_ids (text unchanged, so true
duplicate/ngram structure multiplies like a real crawl re-ingest).
Each named query then runs unmodified through the registry, and the
probe reports the fitted exponent log(t_R / t_1) / log(R): ~1.0 is
linear scaling; meaningfully above 1 means a super-linear candidate
structure (or an output that itself grows super-linearly — the probe
prints row counts so the two are distinguishable).

Usage: python tools/scale_probe.py [R] [query ...]
Defaults: R=10; queries = the four round-2 training-data operators.
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_inreach_spark.catalog import TABLES, table_path  # noqa: E402
from etl_inreach_spark.queries import all_queries  # noqa: E402
from etl_inreach_spark.session import get_spark  # noqa: E402

BASE_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = (
    "seq_pack_chunks",
    "seq_pack_bins",
    "contamination_check",
    "repetition_profile",
)


# Per-table replication recipe: which key columns to OFFSET per copy so
# entity populations multiply (a real bigger-world scale-up) instead of
# densifying existing keys into hotspots. Offsetting l_orderkey but not
# l_partkey would densify the co-purchase graph toward a clique, which
# is a different (and unrealistic) asymptotic regime — offset every
# entity key the table carries.
_REPLICA_KEYS = {
    "documents": ("doc_id",),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "orders": ("o_orderkey", "o_custkey"),
    "events": ("event_id", "user_id"),
    "embeddings": ("vec_id",),
}


def make_replica_dir(
    spark, base: str, r: int, root: str, tables: tuple[str, ...] = ("documents",)
) -> str:
    """sf_dir with ``tables`` replicated r times (entity keys offset
    per copy), every other table symlinked."""
    out = os.path.join(root, f"x{r}")
    os.makedirs(out, exist_ok=True)
    from functools import reduce

    from pyspark.sql import functions as F

    for t in TABLES:
        src = table_path(base, t)
        dst = table_path(out, t)
        if t in tables:
            df = spark.read.parquet(src)
            keys = _REPLICA_KEYS[t]
            spans = {
                k: df.selectExpr(f"max({k})").first()[0] + 1 for k in keys
            }
            parts = []
            for i in range(r):
                p = df
                for k in keys:
                    p = p.withColumn(k, F.col(k) + F.lit(i * spans[k]))
                parts.append(p)
            reduce(lambda a, b: a.unionByName(b), parts).write.mode(
                "overwrite"
            ).parquet(dst)
        elif not os.path.exists(dst):
            os.symlink(src, dst)
    return out


def time_query(fn, spark, sf_dir: str, repeats: int = 2) -> tuple[float, int]:
    best, rows = None, 0
    for _ in range(repeats):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        rows = df.count()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, rows


def main() -> int:
    # usage: scale_probe.py [R] [--tables t1,t2] [query ...]
    argv = sys.argv[1:]
    tables = ("documents",)
    if "--tables" in argv:
        i = argv.index("--tables")
        tables = tuple(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    r = int(argv[0]) if argv else 10
    names = argv[1:] or list(DEFAULT_QUERIES)
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("scale-probe")
    results = {}
    with tempfile.TemporaryDirectory(prefix="spark_graft_probe_") as root:
        d1 = make_replica_dir(spark, BASE_SF_DIR, 1, root, tables)
        dr = make_replica_dir(spark, BASE_SF_DIR, r, root, tables)
        for name in names:
            t1, rows1 = time_query(qs[name], spark, d1)
            tr, rowsr = time_query(qs[name], spark, dr)
            exp = math.log(tr / t1) / math.log(r)
            results[name] = {
                "t_1x": round(t1, 2),
                f"t_{r}x": round(tr, 2),
                "exponent": round(exp, 2),
                "rows_1x": rows1,
                f"rows_{r}x": rowsr,
            }
            print(f"{name}: {t1:.2f}s -> {tr:.2f}s at {r}x  "
                  f"(exponent {exp:.2f}; rows {rows1} -> {rowsr})")
    print(
        json.dumps(
            {
                "replication": r,
                "base": BASE_SF_DIR,
                "tables": list(tables),
                "results": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
