"""StructType registry — the complete data model (SURVEY.md §1.2).

Every entity the reference processes, as an explicit Spark schema. Timestamps
are normalized to TimestampType at ingest (the reference carries raw epoch
longs and multiplies by 1000 at watermark assignment, e.g. HotItem.java:51);
we make event time a first-class typed column instead.

Reference entity definitions:
- UserBehavior   : hotitem/entity/UserBehavior.java:10-17
- ApacheLogEvent : hotitem/entity/hotpage/ApacheLogEvent.java:10-17
- OrderEvent     : orderdetect/entity/OrderEvent.java:8-13
- ReceiptEvent   : orderdetect/entity/ReceiptEvent.java:9-13
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw CSV schemas (as the bytes appear on disk / on the wire)
# ---------------------------------------------------------------------------

USER_BEHAVIOR_RAW = T.StructType(
    [
        T.StructField("userId", T.LongType()),
        T.StructField("itemId", T.LongType()),
        T.StructField("categoryId", T.IntegerType()),
        T.StructField("behavior", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch seconds
    ]
)

APACHE_LOG_RAW = T.StructType(
    [
        T.StructField("ip", T.StringType()),
        T.StructField("userId", T.StringType()),
        T.StructField("skip", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # dd/MM/yyyy:HH:mm:ss
        T.StructField("tz", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

ORDER_EVENT_RAW = T.StructType(
    [
        T.StructField("orderId", T.LongType()),
        T.StructField("eventType", T.StringType()),  # create | pay
        T.StructField("txId", T.StringType()),  # empty on create rows
        T.StructField("timestamp", T.LongType()),  # epoch seconds
    ]
)

RECEIPT_EVENT_RAW = T.StructType(
    [
        T.StructField("txId", T.StringType()),
        T.StructField("payChannel", T.StringType()),
        T.StructField("timestamp", T.LongType()),  # epoch seconds
    ]
)

# ---------------------------------------------------------------------------
# Normalized (typed event-time) schemas used by the operator library
# ---------------------------------------------------------------------------

USER_BEHAVIOR = T.StructType(
    [
        T.StructField("userId", T.LongType()),
        T.StructField("itemId", T.LongType()),
        T.StructField("categoryId", T.IntegerType()),
        T.StructField("behavior", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

APACHE_LOG = T.StructType(
    [
        T.StructField("ip", T.StringType()),
        T.StructField("userId", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("method", T.StringType()),
        T.StructField("url", T.StringType()),
    ]
)

ORDER_EVENT = T.StructType(
    [
        T.StructField("orderId", T.LongType()),
        T.StructField("eventType", T.StringType()),
        T.StructField("txId", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

RECEIPT_EVENT = T.StructType(
    [
        T.StructField("txId", T.StringType()),
        T.StructField("payChannel", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# Driver-generated synthetic tables (TESTDATA.md). Parquet carries the schema;
# listed here so code can reference canonical table names.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
