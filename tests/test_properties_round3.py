"""Hypothesis property tests for the round-3 exact-integer math: the Spark
results must equal a brute-force Python reference on arbitrary inputs —
the cross-engine-determinism claims (integer quotas, integer z-score
flags) hold by construction, so ANY divergence is a real bug."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def sparkm(spark):
    return spark


counts_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(1, 40)),
    min_size=1,
    max_size=4,
    unique_by=lambda t: t[0],
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(strata=counts_strategy, total=st.integers(1, 60))
def test_temperature_quota_matches_bruteforce(sparkm, strata, total):
    """Spark's integer quota arithmetic == the Python reference:
    q_s = min(n_s, (total * floor(sqrt(n_s)*1e6)) // Σw), rows chosen by
    md5 order."""
    from flink_uba_spark.operators.sampling import temperature_mixture_sample

    rows = []
    i = 0
    for s, n in strata:
        for _ in range(n):
            rows.append((i, s))
            i += 1
    df = sparkm.createDataFrame(rows, ["doc_id", "source"])
    got = {
        (r["doc_id"], r["source"])
        for r in temperature_mixture_sample(df, "source", total=total, id_col="doc_id").collect()
    }

    w = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in strata}
    tw = sum(w.values())
    want = set()
    for s, n in strata:
        quota = min(n, (total * w[s]) // tw)
        members = sorted(
            ((_md5(str(d)), d) for d, src in rows if src == s)
        )[:quota]
        want |= {(d, s) for _, d in members}
    assert got == want


values_strategy = st.lists(st.integers(1, 10_000), min_size=1, max_size=12)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(daily=values_strategy)
def test_anomaly_flag_matches_bruteforce(sparkm, daily):
    """The integer 2σ rule (c·n−Σc)² > 4(nΣc²−(Σc)²) must equal the float
    z-score rule everywhere except exactly at the boundary (where the
    integer form is the defined semantics)."""
    import datetime as dt

    rows = [
        ("x", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), int(c))
        for i, c in enumerate(daily)
    ]
    df = sparkm.createDataFrame(rows, ["event_type", "day", "cnt"])
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    c = F.col("cnt").cast("decimal(38,0)")
    n = F.count(F.lit(1)).over(w).cast("decimal(38,0)")
    s1 = F.sum("cnt").over(w).cast("decimal(38,0)")
    s2 = F.sum(c * F.col("cnt")).over(w).cast("decimal(38,0)")
    lhs = (c * n - s1) * (c * n - s1)
    rhs = F.lit(4) * (n * s2 - s1 * s1)
    got = {
        (r["day"], r["is_anomaly"])
        for r in df.select("day", (lhs > rhs).alias("is_anomaly")).collect()
    }

    nn = len(daily)
    s = sum(daily)
    s2v = sum(x * x for x in daily)
    want = {
        (row[1], (row[2] * nn - s) ** 2 > 4 * (nn * s2v - s * s))
        for row in rows
    }
    assert got == want


events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),      # key
        st.integers(0, 8),      # coarse ts (seconds) — forces collisions
        st.booleans(),          # is_follow
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(evs=events_strategy)
def test_order_states_single_pass_matches_bruteforce(sparkm, evs):
    """The round-3 single-pass window form vs a plain-Python reference on
    adversarial tiny inputs — especially equal timestamps across and
    within the anchor/follow sides, where the >=/<= frame semantics live."""
    import datetime as dt

    from flink_uba_spark.operators.order_lifecycle import (
        classify_order_states_single_pass,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, k, base + dt.timedelta(seconds=ts), fol)
        for i, (k, ts, fol) in enumerate(evs)
    ]
    anchors = [(i, k, t) for i, k, t, fol in rows if not fol]
    follows = [(i, k, t) for i, k, t, fol in rows if fol]
    if not anchors and not follows:
        return
    adf = sparkm.createDataFrame(anchors or [], "event_id long, user_id long, ts timestamp")
    fdf = sparkm.createDataFrame(follows or [], "event_id long, user_id long, ts timestamp")
    deadline_s = 2
    got = {
        (r["anchor_id"], r["follow_id"], r["state"])
        for r in classify_order_states_single_pass(
            adf, fdf, "user_id", deadline=f"INTERVAL {deadline_s} SECONDS"
        ).collect()
    }

    want = set()
    for aid, ak, at in anchors:
        cands = [(t, i) for i, k, t in follows if k == ak and t >= at]
        if not cands:
            want.add((aid, None, "timeout"))
        else:
            ft, fid = min(cands)
            state = "payed" if ft <= at + dt.timedelta(seconds=deadline_s) else "payed_late"
            want.add((aid, fid, state))
    for fid, fk, ft in follows:
        if not any(k == fk and t <= ft for _, k, t in anchors):
            want.add((None, fid, "pay_no_create"))
    assert got == want
