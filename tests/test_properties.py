"""Property-based tests (hypothesis): operators vs pure-Python reference
implementations on randomized small inputs — the §5 strategy beyond the
fixed oracles."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)

# (key, ts_offset_seconds) event streams over a handful of keys
events_strategy = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 600)), min_size=1, max_size=25
)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _df(spark, rows, ts_name="ts"):
    data = [(k, BASE + timedelta(seconds=s)) for k, s in rows]
    return spark.createDataFrame(data, f"k long, {ts_name} timestamp")


@given(left=events_strategy, right=events_strategy, lower=st.integers(0, 60), upper=st.integers(0, 60))
@SLOW
def test_interval_join_matches_bruteforce(spark, left, right, lower, upper):
    from flink_uba_spark.operators.interval_join import interval_join

    lt = _df(spark, left, "l_ts").withColumn("l_id", F.monotonically_increasing_id())
    rt = _df(spark, right, "r_ts").withColumn("r_id", F.monotonically_increasing_id())
    got = {
        (r.k, r.l_ts, r.r_ts)
        for r in interval_join(
            lt, rt, on="k", left_ts="l_ts", right_ts="r_ts",
            lower=f"INTERVAL {lower} SECONDS", upper=f"INTERVAL {upper} SECONDS",
        ).collect()
    }
    want = set()
    for lk, ls in left:
        for rk, rs in right:
            if lk == rk and ls - lower <= rs <= ls + upper:
                want.add((lk, BASE + timedelta(seconds=ls), BASE + timedelta(seconds=rs)))
    # got may contain duplicate (k, lts, rts) triples collapsed by the set —
    # compare the distinct triple sets (ids make rows unique in the frame)
    assert got == want


@given(rows=events_strategy, gap=st.integers(1, 120))
@SLOW
def test_sessionize_matches_island_reference(spark, rows, gap):
    from flink_uba_spark.operators.sessions import sessionize

    df = _df(spark, rows)
    got = sorted(
        (r.k, r.session_start, r.session_end_event, r.n_events)
        for r in sessionize(df, key="k", gap=f"{gap} seconds").collect()
    )
    # python reference: inclusive-gap islands per key
    want = []
    by_key: dict = {}
    for k, s in rows:
        by_key.setdefault(k, []).append(s)
    for k, ts in by_key.items():
        ts.sort()
        start, last, n = ts[0], ts[0], 1
        for s in ts[1:]:
            if s - last <= gap:  # inclusive merge (pinned in test_behavior)
                last, n = s, n + 1
            else:
                want.append((k, start, last, n))
                start, last, n = s, s, 1
        want.append((k, start, last, n))
    want = sorted(
        (k, BASE + timedelta(seconds=a), BASE + timedelta(seconds=b), n) for k, a, b, n in want
    )
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=40).filter(lambda t: t.strip(" ")),
        min_size=2,
        max_size=8,
    )
)
@SLOW
def test_jaccard_matches_bruteforce(spark, texts):
    from flink_uba_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string").withColumn(
        "blk", F.lit(1)
    )
    got = {
        (r.a_id, r.b_id): (r.n_inter, r.n_union)
        for r in ngram_jaccard_pairs(docs, block_cols=("blk",), threshold=0.001).collect()
    }

    def shingles(t):
        w = t.split(" ")
        return set(" ".join(w[i : i + 3]) for i in range(len(w) - 2)) if len(w) >= 3 else {" ".join(w)}

    want = {}
    for i, a in enumerate(texts):
        for j, b in enumerate(texts):
            if i < j:
                inter = len(shingles(a) & shingles(b))
                union = len(shingles(a) | shingles(b))
                if inter > 0 and inter / union >= 0.001:
                    want[(i, j)] = (inter, union)
    assert got == want


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation on a known graph: a 5-node chain (diameter 4),
    a triangle, and a disjoint pair — every node must label with its
    component's min id."""
    from flink_uba_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain 1-2-3-4-5
         (10, 11), (11, 12), (10, 12),        # triangle
         (20, 21)],                            # pair
        "a_id long, b_id long",
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
