"""Keyed-changelog materialization — CDC / upsert-stream → table.

Flink's table↔stream duality gives every keyed changelog (CDC feed,
upsert-kafka topic, retract stream) a CURRENT-TABLE view: per key the
LATEST record's values, with a DELETE tombstone removing the key
(Flink ``toChangelogStream``/``fromChangelogStream``, upsert-kafka's
null-value tombstones; the reference's retract conversions are the
aggregate-side twin of the same duality). The reference repo surfaces
this as its retract-stream conversions (SURVEY §2 S6); this module is
the KEYED-upsert form a CDC consumer needs.

Spark-first shape: ONE hash aggregate — ``max_by(struct(values...),
struct(order, id))`` picks the latest record per key with a partial
(map-side) aggregate, so the only exchange is the groupBy's key
shuffle; no window function, no self-join, no per-key sort. At 100 TB
the state per key is one struct, and AQE coalesces the post-shuffle
partitions. The streaming twin is the same aggregate run in COMPLETE
mode (Spark keeps exactly the per-key latest struct in the state store
— the same bound Flink's upsert materialization keeps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def changelog_latest(
    df: DataFrame,
    keys: list[str],
    values: dict[str, Column],
    delete_when: Column,
    order_by: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """Materialize a keyed changelog to its current table state.

    ``values`` maps output column name → Column evaluated on the
    changelog row; the row winning per key is the max of
    ``(order_by, event_id)`` — the total order every engine in this
    repo uses, so late/out-of-order arrivals never flap the result.
    ``delete_when`` marks tombstones: a key whose LATEST record is a
    tombstone is absent from the output (earlier tombstones are
    overwritten by later upserts, per upsert semantics).

    Output: ``keys..., values..., op_ts, op_id`` (the winning record's
    position — the CDC "last modified" metadata).
    """
    if not values:
        raise ValueError("changelog_latest needs at least one value column")
    reserved = set(values) & {*keys, "op_ts", "op_id"}
    if reserved:
        raise ValueError(f"value names collide with output columns: {sorted(reserved)}")
    picked = F.max_by(
        F.struct(
            *[c.alias(nm) for nm, c in values.items()],
            # a NULL tombstone flag is NOT a delete — without the
            # coalesce the ~filter below would silently drop the key
            F.coalesce(delete_when.cast("boolean"), F.lit(False)).alias("__del"),
            F.col(order_by).alias("op_ts"),
            F.col(event_id).alias("op_id"),
        ),
        F.struct(F.col(order_by), F.col(event_id)),
    )
    out = df.groupBy(*keys).agg(picked.alias("__r"))
    # the latest record decides visibility: tombstone → key absent
    out = out.filter(~F.col("__r.__del"))
    return out.select(
        *keys,
        *[F.col(f"__r.{nm}").alias(nm) for nm in values],
        F.col("__r.op_ts").alias("op_ts"),
        F.col("__r.op_id").alias("op_id"),
    )
