"""Socket streaming source (streaming.read_socket_stream): loopback
routing parity with the batch path on the fixture corpus — the
in-sandbox witness for the reference's TCP listen mode
(Communication/TCP.hs:43-64)."""

from __future__ import annotations

import socket
import threading
import time

from pyspark.sql import functions as F

from hnormalise_spark import pipeline as P, streaming
from hnormalise_spark.fixtures import CORPUS


class _LineServer(threading.Thread):
    """One-shot loopback TCP server: accepts a single client and
    writes newline-framed lines, then holds the connection open until
    stopped (closing it would end Spark's socket source mid-test)."""

    def __init__(self, lines: list[str]):
        super().__init__(daemon=True)
        self.lines = lines
        self.srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(1)
        self.port = self.srv.getsockname()[1]
        self._stop = threading.Event()
        self.conn = None

    def run(self):
        self.conn, _ = self.srv.accept()
        payload = "".join(line + "\n" for line in self.lines).encode()
        self.conn.sendall(payload)
        self._stop.wait(timeout=120)

    def close(self):
        self._stop.set()
        for s in (self.conn, self.srv):
            try:
                if s is not None:
                    s.close()
            except OSError:
                pass


def test_socket_stream_routing_parity_with_batch(spark, tmp_path):
    # one newline per message on the wire: a fixture that transcribes
    # its frame terminator (e2e-torque-abort ends in "\n") would
    # otherwise frame as message + empty junk record
    raw_lines = [raw.rstrip("\n") for (_i, _s, _p, raw) in CORPUS]
    server = _LineServer(raw_lines)
    server.start()

    stream = streaming.read_socket_stream(spark, "127.0.0.1", server.port)
    assert stream.isStreaming
    parsed = P.normalise(stream)
    q = (
        parsed.writeStream.format("memory")
        .queryName("sock_parsed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.table("sock_parsed").count() >= len(raw_lines):
                break
            time.sleep(0.5)
        got = (
            spark.table("sock_parsed")
            .groupBy("parser", "parse_ok")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    finally:
        q.stop()
        server.close()

    # batch path over the identical lines (source is constant on the
    # socket stream, so parity is on (parser, parse_ok))
    batch = spark.createDataFrame(
        [(str(i), "syslog", raw) for i, raw in enumerate(raw_lines)],
        "doc_id string, source string, raw string",
    )
    want = {
        (r["parser"], r["parse_ok"]): r["n"]
        for r in P.normalise(batch)
        .groupBy("parser", "parse_ok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {(r["parser"], r["parse_ok"]): r["n"] for r in got} == want
    # and every fixture line did arrive
    assert sum(n for n in want.values()) == len(raw_lines)
