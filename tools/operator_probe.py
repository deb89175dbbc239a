"""Timing probe for the round-5 operator-library additions on the
real driver testdata (they are not registry queries yet, so
tools/scale_probe.py cannot reach them). Prints one JSON line per
operator with wall-clock and output size at the given sf dir —
run solo (bench discipline applies).

Usage: python tools/operator_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_inreach_spark.catalog import load_table  # noqa: E402
from etl_inreach_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return round(time.monotonic() - t0, 2), out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("operator-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results = {}

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    n_vec = emb.count()
    n_doc = docs.count()

    # IVF-PQ: build once, search a bounded 32-query set (the repo's
    # ANN-query convention), 64-dim -> 8 subspaces x 16 codes.
    from etl_inreach_spark.operators.pq import ivf_pq_build, ivf_pq_topk

    t_build, (cells, books, index) = timed(
        lambda: ivf_pq_build(emb, nlist=8, num_sub=8, ksub=16, iters=3, dim=64)
    )
    queries = emb.orderBy("vec_id").limit(32).selectExpr(
        "vec_id as q_id", "embedding"
    ).localCheckpoint(eager=True)
    t_search, rows = timed(
        lambda: ivf_pq_topk(
            index, cells, books, queries, k=10, nprobe=2, num_sub=8, dim=64
        ).count()
    )
    results["ivf_pq"] = {
        "n_vectors": n_vec,
        "build_sec": t_build,
        "search32_sec": t_search,
        "result_rows": rows,
    }

    # BPE: 50 merges over the full document corpus.
    from etl_inreach_spark.operators.bpe import bpe_segment, bpe_train

    t_train, (merges, vocab) = timed(lambda: bpe_train(docs, "text", 50))
    n_vocab = vocab.count()
    t_seg, seg_rows = timed(
        lambda: bpe_segment(docs, "text", merges, "doc_id").count()
    )
    results["bpe"] = {
        "n_docs": n_doc,
        "vocab_words": n_vocab,
        "merges_learned": len(merges),
        "train_sec": t_train,
        "segment_sec": t_seg,
        "segment_rows": seg_rows,
    }

    # Priority sample + negative sample + global index over documents.
    from etl_inreach_spark.operators.indexing import negative_sample
    from etl_inreach_spark.operators.sampling import priority_sample

    t_ps, ps_rows = timed(
        lambda: priority_sample(docs, "doc_id", "n_chars", 1000).count()
    )
    results["priority_sample"] = {"n_docs": n_doc, "k": 1000, "sec": t_ps, "rows": ps_rows}

    t_ns, ns_rows = timed(
        lambda: negative_sample(docs, "doc_id", 4, group_cols=["source"]).count()
    )
    results["negative_sample"] = {"n_docs": n_doc, "k": 4, "sec": t_ns, "pairs": ns_rows}

    # KMV overlap estimation between two event-type user populations.
    from pyspark.sql import functions as F

    from etl_inreach_spark.operators.kmv import kmv_set_estimates, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    n_ev = ev.count()

    def _kmv():
        a = kmv_sketch(ev.filter(F.col("event_type") == "click"), F.col("user_id"), 256)
        b = kmv_sketch(ev.filter(F.col("event_type") == "view"), F.col("user_id"), 256)
        return kmv_set_estimates(a, b, 256).first()

    t_kmv, row = timed(_kmv)
    results["kmv_overlap"] = {
        "n_events": n_ev,
        "sec": t_kmv,
        "jaccard_est": round(row["jaccard_est"], 4),
    }

    from etl_inreach_spark.operators.heavyhitters import heavy_hitters

    t_hh, hh_rows = timed(lambda: heavy_hitters(ev, "user_id", k=64).count())
    results["heavy_hitters"] = {"n_events": n_ev, "k": 64, "sec": t_hh, "rows": hh_rows}

    print(json.dumps({"sf_dir": sf_dir, "operators": results}, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
