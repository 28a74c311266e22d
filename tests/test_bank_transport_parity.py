"""ExampleBank FULL transport parity (r13 verdict #6): the entire golden
workload of ``ExampleBankSpec.scala:75-178`` driven through the WIRE with
no direct DataFrame access anywhere — the 6 transactions arrive as gateway
writes (5 over HTTP POST, 1 over the binary Avro-WS channel), every read
is a GET (account = prefix+TimeRange, branch = scatter, the three
time-bounded batch views), and a per-key subscription observes the writes
as they land. Goldens are identical to the engine-level
``tests/test_bank_end_to_end.py`` — the transport adds nothing and loses
nothing."""

from __future__ import annotations

import base64
import http.client
import json
import os
import socket
import time
import urllib.request

import pytest

from affinity_spark.serving import ServingGateway
from affinity_spark.serving_http import HttpGateway
from affinity_spark.sources.keyed_table import KeyedTable
from tests.test_bank_end_to_end import BATCH_1, BATCH_2, SCHEMA

AVRO_SCHEMA = json.dumps({
    "type": "record", "name": "Transaction", "fields": [
        {"name": "sortcode", "type": "string"},
        {"name": "account", "type": "int"},
        {"name": "txn", "type": "long"},
        {"name": "amount", "type": "double"},
        {"name": "ts", "type": "long"},
    ],
})


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=30
    ) as r:
        return r.status, json.loads(r.read())


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _avro_ws_write(port, sid, row):
    """One transaction over the reference's binary Avro-WS channel
    (GatewayHttp.scala:300-330): enveloped Avro-binary record as a masked
    binary frame on an upgraded socket."""
    from affinity_spark.functions.avro_binary import encode_datum, parse_schema
    from affinity_spark.functions.avro_envelope import python_wrap

    key = base64.b64encode(os.urandom(16)).decode()
    sock = socket.create_connection(("127.0.0.1", port), timeout=60)
    try:
        sock.sendall((
            f"GET /subscribe/bank?sortcode={row['sortcode']} HTTP/1.1\r\n"
            "Host: 127.0.0.1\r\nUpgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Protocol: avro\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n").encode())
        f = sock.makefile("rb")
        assert "101" in f.readline().decode()
        while f.readline().decode().strip():
            pass
        payload = python_wrap(sid, encode_datum(parse_schema(AVRO_SCHEMA), row))
        mask = os.urandom(4)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        head = bytes([0x80 | 0x2])
        if len(payload) < 126:
            head += bytes([0x80 | len(payload)])
        else:
            head += bytes([0x80 | 126]) + len(payload).to_bytes(2, "big")
        sock.sendall(head + mask + masked)
        # wait for the write to commit before tearing the socket down
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            _, rows = _get(
                port,
                f"/kv/bank?sortcode={row['sortcode']}&account={row['account']}"
                f"&txn={row['txn']}",
            )
            if rows:
                return
            time.sleep(0.3)
        raise AssertionError("avro-ws write did not commit")
    finally:
        sock.close()


def test_bank_golden_workload_through_the_wire(spark, tmp_path):
    from affinity_spark.functions.avro_envelope import SchemaRegistry

    tbl = KeyedTable(
        spark, str(tmp_path / "bank"), ["sortcode", "account", "txn"], "ts",
        num_buckets=2,
    )
    hg = HttpGateway()
    # schema= lets the FIRST wire write define the physical table — the
    # gateway starts over an EMPTY keyspace, as the reference spec does
    hg.register("bank", ServingGateway(table=tbl, schema=SCHEMA), SCHEMA)
    hg.register_table_stream("bank", poll_s=0.2)
    sid = hg.register_avro("bank", SchemaRegistry(), AVRO_SCHEMA)
    port = hg.start()
    conn = None
    try:
        # --- day 1: BATCH_1 lands over HTTP POST, one txn per request ---
        for row in BATCH_1:
            status, res = _post(port, "/kv/bank", row)
            assert status == 200 and res == {"upserted": 1}

        # --- subscribe to the account key BEFORE the later writes ---
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request(
            "GET", "/subscribe/bank?sortcode=11-10-30&account=10233321"
        )
        resp = conn.getresponse()
        assert resp.status == 200

        def next_event():
            lines = []
            while True:
                line = resp.fp.readline().decode().rstrip("\n")
                if line.startswith(":"):
                    continue  # heartbeat
                if line == "" and lines:
                    break
                if line:
                    lines.append(line)
            assert lines[0].startswith("data: ")
            return json.loads(lines[0][len("data: "):])

        assert sorted(next_event()["txn"] for _ in range(2)) == [1001, 1003]

        # --- later days: txn 1005 over the BINARY Avro-WS channel, the
        # rest over HTTP (both write transports feed one keyspace —
        # the reference's topic-interchangeability invariant) ---
        for row in BATCH_2:
            if row["txn"] == 1005:
                _avro_ws_write(port, sid, row)
            else:
                _post(port, "/kv/bank", row)

        # the subscription observed OUR key's write (and only ours: txns
        # 1004/1006 are another account)
        assert next_event()["txn"] == 1005

        # --- account reads: prefix + count goldens (spec :127-140) ---
        def account(sortcode, number):
            _, rows = _get(port, f"/scan/bank?sortcode={sortcode}&account={number}")
            return sorted(r["txn"] for r in rows)

        assert account("11-10-30", 10233321) == [1001, 1003, 1005]
        assert account("11-10-30", 88885454) == [1004, 1006]
        assert account("33-55-10", 49772300) == [1002]

        # --- branch scatter reads (spec :141-150) ---
        for sortcode, want in (("11-10-30", 5), ("33-55-10", 1), ("xx-xx-xx", 0)):
            _, rows = _get(port, f"/scan/bank?sortcode={sortcode}")
            assert len(rows) == want, sortcode

        # --- branch before cutoff (spec :151-160) ---
        _, rows = _get(port, "/scan/bank?sortcode=11-10-30&until=1530144000000")
        assert sorted(r["txn"] for r in rows) == [1001, 1003, 1004]

        # --- the three time-bounded batch views (spec :161-178) ---
        views = [
            (1530090000000, 1530172800000, [1004, 1005, 1006]),
            (1530086400000, 1530090000000, [1003, 1004]),
            (1530000000000, 1530090000000, [1001, 1002, 1003, 1004]),
        ]
        for frm, until, want in views:
            # inclusive golden bounds; the route's until is exclusive
            _, rows = _get(port, f"/scan/bank?from={frm}&until={until + 1}")
            assert sorted(r["txn"] for r in rows) == want, (frm, until)

        # --- replay over the wire is idempotent (at-least-once ingest) ---
        _post(port, "/kv/bank", BATCH_1[0])
        assert account("11-10-30", 10233321) == [1001, 1003, 1005]
    finally:
        if conn is not None:
            conn.close()
        hg.stop()
