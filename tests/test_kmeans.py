"""Deterministic distributed k-means (round 6):
operators/similarity.py:kmeans_train_exact — the oracle-verifiable Lloyd's
twin of the nondeterministic pyspark.ml codebook. Pins the determinism
contract (integer sq-L2, (dist, cid) argmin, floor-div updates,
empty-cluster retention) against an independent numpy replica, plus the
map-only assignment plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_uba_spark.operators.similarity import kmeans_train_exact
from flink_uba_spark.sources.readers import load_testdata


def _embs(spark, sf_dir):
    return load_testdata(spark, sf_dir, ("embeddings",))["embeddings"]


def _numpy_lloyds(vecs: dict[int, np.ndarray], k: int, iters: int):
    """Independent brute replica of the contract in kmeans_train_exact:
    init = k lowest-id vectors, integer sq-L2, ties to lowest cid,
    floor-div centroid update, empty cluster keeps previous centroid.
    ``iters`` assignment passes total (iters-1 updates)."""
    ids = sorted(vecs)
    cents = [vecs[i].copy() for i in ids[:k]]

    def assign():
        out = {}
        for i in ids:
            d = [int(((vecs[i] - c) ** 2).sum()) for c in cents]
            best = min(range(k), key=lambda c: (d[c], c))
            out[i] = (best, d[best])
        return out

    for _ in range(iters - 1):
        a = assign()
        for c in range(k):
            members = [vecs[i] for i in ids if a[i][0] == c]
            if members:
                s = np.sum(members, axis=0, dtype=np.int64)
                cents[c] = s // len(members)  # numpy // floors, matching pmod form
    return assign()


def test_kmeans_exact_matches_numpy_reference(spark, sf_dir):
    embs = _embs(spark, sf_dir).filter(F.col("vec_id") < 80)
    got = {
        int(r.vec_id): (int(r.cluster_id), int(r.sqdist))
        for r in kmeans_train_exact(embs, k=4, iters=3).collect()
    }
    qv = {
        int(r.vec_id): np.floor(np.asarray(r.embedding, dtype=np.float64) * 1000).astype(
            np.int64
        )
        for r in embs.select("vec_id", "embedding").collect()
    }
    want = _numpy_lloyds(qv, k=4, iters=3)
    assert got == want


def test_kmeans_tie_breaks_to_lowest_cid(spark):
    # two identical vectors seed two identical centroids: every point ties
    # between cid 0 and 1 and must land on 0; cid 1 empties but survives.
    rows = [(0, [1.0] * 4), (1, [1.0] * 4), (2, [5.0] * 4), (3, [1.2] * 4)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    out = {
        int(r.vec_id): int(r.cluster_id)
        for r in kmeans_train_exact(df, k=3, iters=1, dim=4).collect()
    }
    assert out[0] == 0 and out[1] == 0 and out[3] == 0  # tie on cents 0/1 -> 0
    assert 1 not in set(out.values())  # cid 1 never wins a tie at init


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # duplicate init vectors guarantee cid 1 empties after iteration 1
    # (ties always resolve to cid 0), so the retention branch runs in both
    # engines — Spark must match the numpy replica exactly, and cid 1 must
    # reclaim points once cid 0's centroid drifts off the duplicate spot.
    rows = [
        (0, [1.0] * 4),
        (1, [1.0] * 4),
        (2, [1.4] * 4),
        (3, [9.0] * 4),
        (4, [9.2] * 4),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    got = {
        int(r.vec_id): (int(r.cluster_id), int(r.sqdist))
        for r in kmeans_train_exact(df, k=3, iters=3, dim=4).collect()
    }
    qv = {
        i: np.floor(np.asarray(v, dtype=np.float64) * 1000).astype(np.int64)
        for i, v in rows
    }
    want = _numpy_lloyds(qv, k=3, iters=3)
    assert got == want
    # the emptied-then-retained centroid (cid 1, still at the duplicate
    # spot) wins back the exact-duplicate points after cid 0 drifts
    assert got[0][0] == 1 and got[1][0] == 1 and got[2][0] == 0


def test_kmeans_assignment_is_map_only(spark, sf_dir):
    """The final assignment pass must be join-free: centroids ship in the
    mapInArrow task closure (round 12), so the plan over the corpus contains
    no Join and no Exchange (scan + Arrow kernel only)."""
    embs = _embs(spark, sf_dir).filter(F.col("vec_id") < 64)
    df = kmeans_train_exact(embs, k=4, iters=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_cluster_balanced_sample_caps_per_cluster(spark, sf_dir):
    from flink_uba_spark.queries.datapipe import cluster_balanced_sample

    out = cluster_balanced_sample(spark, sf_dir).toPandas()
    per = out.groupby("cluster_id")["pick_rank"].agg(["max", "count", "min"])
    assert (per["max"] <= 20).all()
    assert (per["min"] == 1).all()
    assert (per["max"] == per["count"]).all()  # ranks contiguous from 1


def test_kmeans_mid_iteration_equidistant_tie_pin(spark):
    """Round-7 regression pin (VERDICT r6 item 4): a point that becomes
    EXACTLY equidistant to two centroids only AFTER a floor-div update —
    the iteration-boundary tie most likely behind the pre-4684f11 sf0.1
    divergence. 1-D layout (×1000 quantized): init c0=0, c1=12 (the two
    lowest-id vectors), so v6=5 is strictly c0's at pass 1 (25 < 49);
    update 1 moves c0 to floor(8/4)=2 and c1 to floor(26/3)=8, putting
    v6=5 at sq-dist 9 from BOTH; the (dist, cid) argmin must take cid 0,
    exactly as the numpy replica does (iters=2 makes the FINAL assignment
    the tie pass; iters=3 is asserted too — tie resolved upstream)."""
    vals = [0.0, 12.0, 1.0, 2.0, 7.0, 7.0, 5.0]
    rows = [(i, [v] + [0.0] * 3) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    qv = {i: np.array([int(v * 1000)] + [0] * 3, dtype=np.int64) for i, v in enumerate(vals)}
    by_iters = {}
    for iters in (2, 3):
        got = {
            int(r.vec_id): (int(r.cluster_id), int(r.sqdist))
            for r in kmeans_train_exact(df, k=2, iters=iters, dim=4).collect()
        }
        assert got == _numpy_lloyds(qv, k=2, iters=iters)
        by_iters[iters] = got
    # the tie itself (iters=2 final pass): equidistant at 9 × 1000² from
    # both updated centroids (c0=2, c1=8) and resolved to cid 0
    assert by_iters[2][6] == (0, 9_000_000)
