"""S2 end-to-end: the socket source against a real local TCP server (the
reference's ``nc -lk 7777`` dev loop, HotPages.java:41)."""

from __future__ import annotations

import socket
import threading
import time

import pytest

from pyspark.sql import functions as F

from flink_uba_spark.sources.readers import stream_socket

LINES = ["543462,1715,pv", "662867,2244,pv", "561558,3611,buy"]


@pytest.fixture()
def line_server():
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        srv.settimeout(30)
        try:
            conn, _ = srv.accept()
            conn.sendall(("\n".join(LINES) + "\n").encode())
            while not stop.is_set():  # keep the connection open until told
                time.sleep(0.2)
            conn.close()
        except OSError:
            pass

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    yield port
    stop.set()
    srv.close()
    t.join(timeout=5)


def test_socket_source_end_to_end(spark, line_server):
    raw = stream_socket(spark, "127.0.0.1", line_server)
    parsed = raw.select(
        F.split("value", ",").getItem(0).cast("long").alias("userId"),
        F.split("value", ",").getItem(1).cast("long").alias("itemId"),
        F.split("value", ",").getItem(2).alias("behavior"),
    )
    q = (
        parsed.writeStream.format("memory")
        .queryName("sock")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("sock").count() < len(LINES):
            time.sleep(0.5)
        rows = {(r.userId, r.itemId, r.behavior) for r in spark.table("sock").collect()}
        assert rows == {(543462, 1715, "pv"), (662867, 2244, "pv"), (561558, 3611, "buy")}
    finally:
        q.stop()
