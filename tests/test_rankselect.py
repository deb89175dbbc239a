"""Round-7 continuation additions: distributed exact quantile
rank-selection, MAD volume-anomaly monitoring, per-dimension
embedding standardization — Python-spec replicas plus the
no-global-sort plan pin for the rank-selection path."""

from __future__ import annotations

import math


def test_exact_quantile_matches_sorted_pick(spark, sf_dir):
    """The two-phase (histogram -> in-bucket) selection must equal the
    naive sort-and-pick-rank spec exactly, rank = ceil(p*n) in exact
    integer arithmetic (percentile_disc semantics)."""
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_relational import (
        _QUANTILE_PCTS,
        exact_quantile_rankselect,
    )

    prices = sorted(
        r["o_totalprice"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(prices)
    got = {
        r["pct"]: (r["rank"], r["value"])
        for r in exact_quantile_rankselect(spark, sf_dir).collect()
    }
    assert set(got) == set(_QUANTILE_PCTS)
    for p in _QUANTILE_PCTS:
        rank = (p * n + 99) // 100
        assert got[p] == (rank, prices[rank - 1]), (p, n)


def test_exact_quantile_no_global_sort(spark, sf_dir):
    """The data-side sort must be partitioned by bucket (a per-bucket
    local window), and every SinglePartition exchange must feed an
    aggregate — the histogram, never a row stream (the
    global_row_index pin of test_indexing / ntile)."""
    from etl_inreach_spark.queries_relational import exact_quantile_rankselect

    plan = (
        exact_quantile_rankselect(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "windowspecdefinition(b" in plan  # row_number partitioned by bucket
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            assert "HashAggregate" in lines[i + 1], lines[i : i + 2]


def test_mad_anomaly_matches_python_spec(spark, sf_dir):
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_analytics import mad_anomaly_daily
    import pyspark.sql.functions as F

    dc = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .count()
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in dc:
        by_type.setdefault(r["event_type"], []).append((r["day"], r["count"]))

    def lower_median(xs):
        s = sorted(xs)
        return s[(len(s) + 1) // 2 - 1]

    expect = {}
    for et, days in by_type.items():
        med = lower_median([c for _, c in days])
        mad = lower_median([abs(c - med) for _, c in days])
        for day, c in days:
            flag = 1 if abs(c - med) * 10 > 35 * max(mad, 1) else 0
            expect[(et, day)] = (c, med, mad, flag)

    rows = mad_anomaly_daily(spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r in rows:
        assert expect[(r["event_type"], r["day"])] == (
            r["cnt"],
            r["med"],
            r["mad"],
            r["is_anomaly"],
        )


def test_embedding_standardize_matches_python_spec(spark, sf_dir):
    """Replay the quantize + integer-stats + IEEE z expression in
    plain Python for one dimension; every fixed-point value must match
    bit-for-bit. Also: z is location-free (mean of q*n - S is 0) and
    unit-scaled on the 2^20 grid."""
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_extended import embedding_standardize

    rows = [
        r
        for r in embedding_standardize(spark, sf_dir).collect()
        if r["dim"] == 7
    ]
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    q = {r["vec_id"]: math.floor(float(r["embedding"][7]) * 4096 + 0.5) for r in emb}
    n = len(q)
    s = sum(q.values())
    ss = sum(v * v for v in q.values())
    var_num = n * ss - s * s
    assert var_num > 0
    for r in rows:
        zq = q[r["vec_id"]]
        assert r["q"] == zq
        assert r["z_fp"] == math.floor((zq * n - s) * 1048576.0 / math.sqrt(var_num))
    zs = [r["z_fp"] for r in rows]
    mean_z = sum(zs) / len(zs)
    std_z = math.sqrt(sum((z - mean_z) ** 2 for z in zs) / len(zs))
    assert abs(mean_z) < 1048576 * 0.01
    assert abs(std_z - 1048576) < 1048576 * 0.01


def test_grouped_quantile_matches_sorted_pick(spark, sf_dir):
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_relational import (
        _GQ_PCTS,
        grouped_quantile_rankselect,
    )

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    by_grp: dict[str, list] = {}
    for r in rows:
        by_grp.setdefault(r["o_orderpriority"], []).append(r["o_totalprice"])
    got = {
        (r["grp"], r["pct"]): (r["rank"], r["value"])
        for r in grouped_quantile_rankselect(spark, sf_dir).collect()
    }
    assert len(got) == len(by_grp) * len(_GQ_PCTS)
    for grp, vals in by_grp.items():
        vals.sort()
        n = len(vals)
        for p in _GQ_PCTS:
            rank = (p * n + 99) // 100
            assert got[(grp, p)] == (rank, vals[rank - 1]), (grp, p, n)


def test_grouped_quantile_no_single_partition_exchange(spark, sf_dir):
    """Every window in the grouped form is partitioned (by grp over
    the histogram, by (grp,b,pct) over the hits): the plan must not
    contain ANY SinglePartition exchange feeding a non-aggregate."""
    from etl_inreach_spark.queries_relational import grouped_quantile_rankselect

    plan = (
        grouped_quantile_rankselect(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            assert "HashAggregate" in lines[i + 1], lines[i : i + 2]


def test_phrase_match_matches_python_spec(spark, sf_dir):
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_extended import (
        _PHRASE,
        phrase_match_positional,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).collect()
    expect = {}
    for r in docs:
        toks = r["text"].split()
        hits = [
            i + 1
            for i in range(len(toks) - 1)
            if toks[i] == _PHRASE[0] and toks[i + 1] == _PHRASE[1]
        ]
        if hits:
            expect[r["doc_id"]] = (len(hits), hits[0])
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match_positional(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0


def test_revenue_weighted_quantile_matches_python_spec(spark, sf_dir):
    """Lorenz crossing: smallest v whose cumulative exact-cent revenue
    reaches p% of total."""
    import math

    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_relational import (
        _WQ_PCTS,
        revenue_weighted_quantile,
    )

    vals = sorted(
        r["o_totalprice"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    )
    cents = [math.floor(v * 100 + 0.5) for v in vals]
    total = sum(cents)
    got = {
        r["pct"]: (r["threshold"], r["value"])
        for r in revenue_weighted_quantile(spark, sf_dir).collect()
    }
    assert set(got) == set(_WQ_PCTS)
    for p in _WQ_PCTS:
        threshold = (p * total + 99) // 100
        running = 0
        for v, c in zip(vals, cents):
            running += c
            if running >= threshold:
                assert got[p] == (threshold, v), (p, threshold)
                break


def test_ks_drift_matches_python_spec(spark, sf_dir):
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_curation import ks_drift_orders

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderstatus")
        .collect()
    )
    f = sorted(r["o_totalprice"] for r in rows if r["o_orderstatus"] == "F")
    o = sorted(r["o_totalprice"] for r in rows if r["o_orderstatus"] == "O")
    n1, n2 = len(f), len(o)
    values = sorted(set(f) | set(o))
    import bisect

    best = (-1, None)
    for v in values:
        f1 = bisect.bisect_right(f, v)
        f2 = bisect.bisect_right(o, v)
        dn = abs(f1 * n2 - f2 * n1)
        if dn > best[0]:
            best = (dn, v)
    got = ks_drift_orders(spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert (got["d_num"], got["v_at_max"]) == best
    assert got["ks_fp"] == best[0] * 1048576 // (n1 * n2)


def test_ohlc_matches_python_spec(spark, sf_dir):
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_analytics import ohlc_user_hourly

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    groups: dict[tuple, list] = {}
    for r in rows:
        k = (r["user_id"], r["ts"].date(), r["ts"].hour)
        groups.setdefault(k, []).append((r["ts"], r["event_id"], r["value"]))
    got = {
        (r["user_id"], r["day"], r["hr"]): (
            r["open"], r["high"], r["low"], r["close"], r["n_events"]
        )
        for r in ohlc_user_hourly(spark, sf_dir).collect()
    }
    assert len(got) == len(groups)
    for k, evs in groups.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        assert got[k] == (evs[0][2], max(vals), min(vals), evs[-1][2], len(evs))


def test_session_trigrams_within_session_only(spark, sf_dir):
    """Python replica: sessionize by 1800s gap, emit within-session
    event-type trigrams, count, top-20 with (cnt desc, path asc)."""
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_analytics import session_path_trigrams

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    counts: dict[str, int] = {}
    for evs in by_user.values():
        evs.sort(key=lambda e: (e[0], e[1]))
        sessions, cur = [], []
        for e in evs:
            if cur and (e[0] - cur[-1][0]).total_seconds() > 1800:
                sessions.append(cur)
                cur = []
            cur.append(e)
        if cur:
            sessions.append(cur)
        for s in sessions:
            for i in range(len(s) - 2):
                p = f"{s[i][2]}>{s[i+1][2]}>{s[i+2][2]}"
                counts[p] = counts.get(p, 0) + 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["path"], r["cnt"])
        for r in session_path_trigrams(spark, sf_dir).collect()
    ]
    assert got == expect


def test_source_centroid_similarity_spec(spark, sf_dir):
    """Exact replica for one source pair + structural checks: all
    C(n,2) pairs present, cos_fp <= 2^20."""
    import math

    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_extended import source_centroid_similarity

    got = {
        (r["src_a"], r["src_b"]): r["cos_fp"]
        for r in source_centroid_similarity(spark, sf_dir).collect()
    }
    docs = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    sums: dict[str, list] = {}
    for r in emb:
        src = docs[r["vec_id"]]
        qs = [math.floor(float(x) * 4096 + 0.5) for x in r["embedding"]]
        acc = sums.setdefault(src, [0] * len(qs))
        for i, v in enumerate(qs):
            acc[i] += v
    srcs = sorted(sums)
    n_pairs = len(srcs) * (len(srcs) - 1) // 2
    assert len(got) == n_pairs
    a, b = srcs[0], srcs[1]
    num = sum(x * y for x, y in zip(sums[a], sums[b]))
    ssa = sum(x * x for x in sums[a])
    ssb = sum(y * y for y in sums[b])
    assert got[(a, b)] == math.floor(
        num * 1048576.0 / (math.sqrt(ssa) * math.sqrt(ssb))
    )
    assert all(v <= 1048576 for v in got.values())


def test_auc_matches_pairwise_count(spark, sf_dir):
    """AUC from the rank formula must equal the brute-force
    P(X>Y) + P(X=Y)/2 pair count (doubled to stay integer)."""
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_curation import auc_price_status

    rows = (
        load_table(spark, sf_dir, "orders")
        .select("o_totalprice", "o_orderstatus")
        .collect()
    )
    f = sorted(r["o_totalprice"] for r in rows if r["o_orderstatus"] == "F")
    o = sorted(r["o_totalprice"] for r in rows if r["o_orderstatus"] == "O")
    import bisect

    # 2*U1 = sum over x in F of 2*#{y<x} + #{y==x}
    u1_x2 = sum(
        2 * bisect.bisect_left(o, x)
        + (bisect.bisect_right(o, x) - bisect.bisect_left(o, x))
        for x in f
    )
    got = auc_price_status(spark, sf_dir).collect()[0]
    assert (got["n1"], got["n2"]) == (len(f), len(o))
    assert got["u1_x2"] == u1_x2
    assert got["auc_fp"] == u1_x2 * 1048576 // (2 * len(f) * len(o))
    # no-signal sanity: status is independent of price in this data,
    # so AUC must sit near 0.5 (within 5% of the 2^20 grid)
    assert abs(got["auc_fp"] - 524288) < 52429


def test_benford_shares_sum_and_spec(spark, sf_dir):
    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_curation import (
        _BENFORD_PPM,
        benford_first_digit_orders,
    )

    prices = [
        r["o_totalprice"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    ]
    import math

    counts: dict[int, int] = {}
    for v in prices:
        d = int(str(math.floor(v * 100 + 0.5))[0])
        counts[d] = counts.get(d, 0) + 1
    total = len(prices)
    got = {
        r["digit"]: (r["cnt"], r["share_ppm"], r["benford_ppm"], r["dev_ppm"])
        for r in benford_first_digit_orders(spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for d, cnt in counts.items():
        share = cnt * 1000000 // total
        assert got[d] == (cnt, share, _BENFORD_PPM[d], share - _BENFORD_PPM[d])
    assert sum(_BENFORD_PPM.values()) == 1000000


def test_farthest_point_seeds_matches_python_spec(spark, sf_dir):
    """Greedy farthest-point traversal replica on the quantized grid:
    same seeds, same max-min distances, same tie-breaks."""
    import math

    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_extended import _FPS_K, farthest_point_seeds

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    q = {
        r["vec_id"]: [math.floor(float(x) * 4096 + 0.5) for x in r["embedding"]]
        for r in emb
    }

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    chosen = [min(q)]
    expect = [(1, chosen[0], 0)]
    mind = {v: d2(q[v], q[chosen[0]]) for v in q}
    for r in range(2, _FPS_K + 1):
        best = max(
            (v for v in q if v not in chosen),
            key=lambda v: (mind[v], -v),
        )
        expect.append((r, best, mind[best]))
        chosen.append(best)
        for v in q:
            mind[v] = min(mind[v], d2(q[v], q[best]))
    got = sorted(
        (r["pick_idx"], r["vec_id"], r["mind"])
        for r in farthest_point_seeds(spark, sf_dir).collect()
    )
    assert got == expect


def test_ks_and_auc_no_single_partition_row_stream(spark, sf_dir):
    """The KS/AUC global CDF cumsums use the two-level bucket
    discipline: the only unpartitioned windows run over the
    range-bounded histogram, so every SinglePartition exchange must
    feed an aggregate (same pin as the quantile family)."""
    from etl_inreach_spark.queries_curation import (
        auc_price_status,
        ks_drift_orders,
    )

    for fn in (ks_drift_orders, auc_price_status):
        plan = (
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange SinglePartition" in line:
                assert "HashAggregate" in lines[i + 1], (
                    fn.__name__,
                    lines[i : i + 2],
                )


def test_hhi_and_gini_match_python_spec(spark, sf_dir):
    import math

    from etl_inreach_spark.catalog import load_table
    from etl_inreach_spark.queries_curation import (
        gini_order_values,
        source_concentration_hhi,
    )

    srcs = [
        r["source"]
        for r in load_table(spark, sf_dir, "documents")
        .select("source")
        .collect()
    ]
    counts: dict[str, int] = {}
    for s in srcs:
        counts[s] = counts.get(s, 0) + 1
    total = len(srcs)
    sq = sum(c * c for c in counts.values())
    got = {
        r["source"]: (r["cnt"], r["share_ppm"], r["hhi_fp"], r["eff_sources_fp"])
        for r in source_concentration_hhi(spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for s, c in counts.items():
        assert got[s] == (
            c,
            c * 1000000 // total,
            sq * 1048576 // (total * total),
            total * total * 1048576 // sq,
        )

    cents = sorted(
        math.floor(r["o_totalprice"] * 100 + 0.5)
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(cents)
    tot = sum(cents)
    wsum = sum((2 * (i + 1) - 1) * x for i, x in enumerate(cents))
    g_num = wsum - n * tot  # exact int in Python; engines carry DECIMAL(38,0)
    row = gini_order_values(spark, sf_dir).collect()[0]
    assert (row["n"], row["tot"]) == (n, tot)
    # g_num is rendered as the correctly-rounded double of the exact
    # decimal (it leaves int64 at n ~ 2.8e5 rows); Python float(int)
    # rounds the same way
    assert row["g_num"] == float(g_num)
    assert row["gini_fp"] == math.floor(
        float(g_num) * 1048576 / (float(n) * float(tot))
    )
    # uniform-ish TPC-H prices: Gini must sit in a plausible (0, 0.5)
    # inequality band, far from both degenerate poles
    assert 0 < row["gini_fp"] < 524288
