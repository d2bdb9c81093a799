"""Isolated per-query timing: cold (first build+run in this JVM) plus N
warm repeats (median reported), noop sink, same session defaults as
bench.py. For before/after evidence on a handful of queries without the
full 242-query protocol.

Usage: python tools/time_queries.py <query> [...]   (env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, SPARK_GRAFT_TIME_REPS default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_TIME_REPS", "3"))

    import __spark_entry__ as entrymod
    from flink_uba_spark.session import get_spark

    spark = get_spark("time_queries")
    qs = entrymod.queries()
    # same warmup as bench.py so the first cold number is comparable
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    if "hot_items" in qs:
        qs["hot_items"](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    if any(n.startswith("stream_") for n in names) and "stream_user_sessions" in qs:
        qs["stream_user_sessions"](spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()

    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold = round(time.time() - t0, 3)
        warms = []
        for _ in range(reps):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            warms.append(round(time.time() - t0, 3))
        warms.sort()
        out[name] = {"cold": cold, "warm_median": warms[len(warms) // 2], "warm_all": warms}
        print(f"# {name}: cold {cold}s warm {warms}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
