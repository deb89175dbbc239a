"""Property-based tests (SURVEY.md §5.2.3): algebraic laws of the
keyed-argmax dedup under arbitrary inputs — idempotence, containment,
one-row-per-key, argmax correctness, union invariance.

Spark round-trips per example are expensive, so examples are few but
adversarial: hypothesis shrinks toward duplicate keys, tied and NULL
timestamps — exactly the §2.3 trap cases.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

BASE = datetime(2024, 1, 1)

row = st.tuples(
    st.integers(0, 4),                       # key (few values => collisions)
    st.one_of(st.none(), st.integers(0, 5)),  # ts offset minutes (None => null)
)
rows = st.lists(row, min_size=1, max_size=12)


def to_df(spark, data):
    return spark.createDataFrame(
        [
            (f"k{k}", BASE + timedelta(minutes=m) if m is not None else None, i)
            for i, (k, m) in enumerate(data)
        ],
        "id string, time timestamp, arrival_idx long",
    )


def run_dedup(df):
    from etl_inreach_spark.operators.dedup import latest_by_key

    return latest_by_key(df, ["id"], "time", arrival_col="arrival_idx")


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=rows)
def test_dedup_laws(spark, data):
    df = to_df(spark, data)
    out = run_dedup(df)
    got = out.collect()
    src = df.collect()

    # one row per key, and exactly the keys of the input
    keys = [r["id"] for r in got]
    assert sorted(keys) == sorted({r["id"] for r in src})

    # containment: every output row is an input row
    src_set = {(r["id"], r["time"], r["arrival_idx"]) for r in src}
    assert all((r["id"], r["time"], r["arrival_idx"]) in src_set for r in got)

    # argmax + reference tie-break: max time per key (NULL == epoch 0),
    # earliest arrival among ties
    for r in got:
        grp = [s for s in src if s["id"] == r["id"]]
        key = lambda s: (s["time"] or datetime(1970, 1, 1), -s["arrival_idx"])
        best = max(grp, key=key)
        assert (r["time"], r["arrival_idx"]) == (best["time"], best["arrival_idx"])

    # idempotence: dedup(dedup(x)) == dedup(x)
    twice = {(r["id"], r["time"], r["arrival_idx"]) for r in run_dedup(out).collect()}
    assert twice == {(r["id"], r["time"], r["arrival_idx"]) for r in got}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=rows, split=st.integers(1, 11))
def test_dedup_union_invariance(spark, data, split):
    """dedup(a UNION b) == dedup(dedup(a) UNION dedup(b)) — the law
    that makes per-feed dedup + merge equal to global dedup."""
    cut = min(split, len(data))
    a, b = to_df(spark, data[:cut]), to_df(spark, data[cut:] or [])
    whole = {
        (r["id"], r["time"], r["arrival_idx"])
        for r in run_dedup(a.unionByName(b)).collect()
    }
    staged = {
        (r["id"], r["time"], r["arrival_idx"])
        for r in run_dedup(run_dedup(a).unionByName(run_dedup(b))).collect()
    }
    assert staged == whole


def _brute_jaccard_pairs(docs: list[tuple[int, str]], k: int, t: float):
    """Pure-Python reference: exact k-gram Jaccard pairs at >= t."""
    sets = {
        i: {s[j : j + k] for j in range(len(s) - k + 1)}
        for i, s in docs
        if len(s) >= k
    }
    out = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= t:
                out.add((ids[x], ids[y]))
    return out


doc_text = st.text(alphabet="abcd ", min_size=0, max_size=40)
doc_corpus = st.lists(doc_text, min_size=2, max_size=10)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=doc_corpus)
def test_ngram_jaccard_matches_python_reference(spark, texts):
    """The PPJoin-filtered exact operator equals a brute-force Python
    reference on arbitrary tiny corpora (tiny alphabet => frequent
    shingle collisions, the prefix filter's hardest regime)."""
    from etl_inreach_spark.operators.text_dedup import ngram_jaccard_pairs

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", 0.6, shingle_k=3).collect()
    }
    want = _brute_jaccard_pairs(docs, 3, 0.6)
    assert got == want


edge_list = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=edge_list)
def test_connected_components_matches_union_find(spark, edges):
    """Min-label propagation equals a union-find reference on arbitrary
    small graphs (cycles, self-merging stars, disjoint islands)."""
    from etl_inreach_spark.operators.dedup import connected_components

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert got == _union_find_components(edges)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=edge_list)
def test_connected_components_star_matches_union_find(spark, edges):
    """Large-star/small-star contraction equals the same union-find
    reference — the log-diameter escalation must be label-identical
    to plain propagation on any graph."""
    from etl_inreach_spark.operators.dedup import connected_components_star

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components_star(df).collect()}
    assert got == _union_find_components(edges)


def test_connected_components_star_long_chain(spark):
    """A 60-hop chain: diameter exceeds the propagation default
    max_iter, the star contraction converges in O(log n) rounds."""
    from etl_inreach_spark.operators.dedup import connected_components_star

    edges = [(i, i + 1) for i in range(100, 160)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["component"] for r in connected_components_star(df).collect()}
    assert got == {i: 100 for i in range(100, 161)}
