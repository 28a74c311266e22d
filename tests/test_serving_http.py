"""HTTP transport over the serving gateway (serving_http.py — closes the
reference's GatewayHttp entry point): ExampleBankSpec's reads answered
over REAL sockets, plus route rejection and the SSE per-key push
(ws-client semantics: initial state, then that key's updates)."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from affinity_spark.serving import ServingGateway
from affinity_spark.serving_http import HttpGateway
from tests.test_bank_end_to_end import BATCH_1, BATCH_2, SCHEMA


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def http_bank(spark):
    df = spark.createDataFrame([*BATCH_1, *BATCH_2], SCHEMA)
    hg = HttpGateway()
    hg.register("bank", ServingGateway(df=df, ts_col="ts"), df.schema)
    port = hg.start()
    yield port, hg
    hg.stop()


def test_point_get_over_http(http_bank):
    """GatewayHttp.scala:220-330 — the account read as a GET."""
    port, _ = http_bank
    status, rows = _get(
        port, "/kv/bank?sortcode=11-10-30&account=10233321&txn=1003"
    )
    assert status == 200 and len(rows) == 1 and rows[0]["amount"] == 99.9
    # query params are coerced to the table's own column types (account
    # is a long; the string form must still match)
    assert rows[0]["account"] == 10233321


def test_prefix_and_timebounded_scan_over_http(http_bank):
    port, _ = http_bank
    status, rows = _get(port, "/scan/bank?sortcode=11-10-30")
    assert status == 200 and len(rows) == 5
    status, rows = _get(port, "/scan/bank?sortcode=11-10-30&until=1530144000000")
    assert sorted(r["txn"] for r in rows) == [1001, 1003, 1004]
    status, rows = _get(port, "/scan/bank?sortcode=xx-xx-xx")
    assert status == 200 and rows == []


def test_route_rejections(http_bank):
    port, _ = http_bank
    for path, want in [
        ("/kv/nosuch?x=1", 404),
        ("/nosuchop/bank", 404),
        ("/kv/bank?nonsense_col=1", 400),
        ("/kv/bank?account=not_a_number", 400),
        ("/subscribe/bank?account=1", 400),  # no changelog bound
    ]:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(port, path)
        assert e.value.code == want, path


def test_sse_per_key_subscription(spark, tmp_path):
    """The ws-client key subscription over the SSE channel: initial state
    events first, then only this key's subsequent changes, pushed as
    they arrive."""
    import http.client

    src = str(tmp_path / "in")
    os.makedirs(src)

    def feed(name, rows):
        tmp = os.path.join(src, f".{name}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(src, name))

    snapshot = spark.createDataFrame(BATCH_1, SCHEMA)
    hg = HttpGateway()
    hg.register("bank", ServingGateway(df=snapshot, ts_col="ts"), snapshot.schema)
    hg.register_stream(
        "bank",
        spark.readStream.schema(SCHEMA).json(src),
        str(tmp_path / "ckpt"),
    )
    port = hg.start()
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    try:
        conn.request(
            "GET", "/subscribe/bank?sortcode=11-10-30&account=10233321"
        )
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/event-stream"

        def next_event():
            lines = []
            while True:
                line = resp.fp.readline().decode().rstrip("\n")
                if line == "" and lines:
                    break
                if line:
                    lines.append(line)
            assert lines[0].startswith("data: ")
            return json.loads(lines[0][len("data: "):])

        initial = sorted(next_event()["txn"] for _ in range(2))
        assert initial == [1001, 1003]
        feed("b2.json", BATCH_2)  # holds txn 1005 for our key + other keys
        assert next_event()["txn"] == 1005
    finally:
        conn.close()
        hg.stop()


def test_crypto_proof_guard(spark):
    """F8: a route registered with a TimeCryptoProof requires
    auth=<sign(path)>; proofs from the previous minute window still
    verify (the reference's ±1 tolerance), stale ones don't."""
    from affinity_spark.functions.crypto import (
        TimeCryptoProofSHA256,
        generate_salt,
    )

    salt = generate_salt()
    proof = TimeCryptoProofSHA256(salt)
    df = spark.createDataFrame(BATCH_1, SCHEMA)
    hg = HttpGateway()
    hg.register("bank", ServingGateway(df=df, ts_col="ts"), df.schema, proof=proof)
    port = hg.start()
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(port, "/kv/bank?sortcode=11-10-30&account=10233321&txn=1003")
        assert e.value.code == 401
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(port, "/kv/bank?sortcode=11-10-30&auth=DEADBEEF")
        assert e.value.code == 401
        sig = proof.sign("/kv/bank")
        status, rows = _get(
            port,
            f"/kv/bank?sortcode=11-10-30&account=10233321&txn=1003&auth={sig}",
        )
        assert status == 200 and len(rows) == 1
        # adjacent-window proof verifies (±1 tolerance); NEXT window is
        # the tick-proof choice — it stays within tolerance even if a
        # minute boundary crosses between sign and verify (a previous-
        # window proof would flake exactly then). Three-windows-stale
        # fails under any tick.
        import time as _t

        status, _ = _get(
            port,
            "/kv/bank?sortcode=11-10-30&account=10233321&txn=1003"
            f"&auth={proof.sign('/kv/bank', 1)}",
        )
        assert status == 200
        stale = TimeCryptoProofSHA256(salt, clock=lambda: _t.time() - 180)
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(
                port,
                "/kv/bank?sortcode=11-10-30&auth=" + stale.sign("/kv/bank"),
            )
        assert e.value.code == 401
    finally:
        hg.stop()


def test_crypto_proof_unit():
    """The proof primitive itself: deterministic hash, window-offset
    signing, case-insensitive hex verify, ±1 acceptance at a fixed
    clock (no sleeping across minute boundaries)."""
    from affinity_spark.functions.crypto import TimeCryptoProofSHA256

    fixed = 1_700_000_123.4
    p = TimeCryptoProofSHA256(b"\x01" * 16, clock=lambda: fixed)
    assert p.hash("x") == p.hash("x") and p.hash("x") != p.hash("y")
    sig = p.sign("/route")
    assert p.verify(sig, "/route") and p.verify(sig.lower(), "/route")
    assert not p.verify(sig, "/other")
    assert p.sign("/route", -1) != sig and p.verify(p.sign("/route", -1), "/route")
    assert p.verify(p.sign("/route", 1), "/route")
    assert not p.verify(p.sign("/route", 2), "/route")
    other = TimeCryptoProofSHA256(b"\x02" * 16, clock=lambda: fixed)
    assert not other.verify(sig, "/route")  # different salt


def test_gzip_response_encoding(http_bank):
    """F9: a client sending Accept-Encoding: gzip gets a gzip body with
    Content-Encoding set; the decoded payload equals the plain one."""
    import gzip

    port, _ = http_bank
    path = "/scan/bank?sortcode=11-10-30"
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        headers={"Accept-Encoding": "gzip"},
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers.get("Content-Encoding") == "gzip"
        rows = json.loads(gzip.decompress(r.read()))
    _, plain = _get(port, path)
    assert rows == plain and len(rows) == 5


def test_websocket_per_key_subscription(spark, tmp_path):
    """The reference's actual push channel: a client upgrading with
    Sec-WebSocket-Key gets an RFC 6455 handshake (accept =
    b64(sha1(key+GUID))) and one unmasked text frame per event — initial
    state, then this key's changes as they arrive."""
    import base64
    import hashlib
    import socket

    src = str(tmp_path / "in")
    os.makedirs(src)

    def feed(name, rows):
        tmp = os.path.join(src, f".{name}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(src, name))

    snapshot = spark.createDataFrame(BATCH_1, SCHEMA)
    hg = HttpGateway()
    hg.register("bank", ServingGateway(df=snapshot, ts_col="ts"), snapshot.schema)
    hg.register_stream(
        "bank",
        spark.readStream.schema(SCHEMA).json(src),
        str(tmp_path / "ckpt"),
    )
    port = hg.start()
    key = base64.b64encode(os.urandom(16)).decode()
    sock = socket.create_connection(("127.0.0.1", port), timeout=60)
    try:
        sock.sendall(
            (
                "GET /subscribe/bank?sortcode=11-10-30&account=10233321"
                " HTTP/1.1\r\n"
                "Host: 127.0.0.1\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        f = sock.makefile("rb")
        status = f.readline().decode()
        assert "101" in status, status
        headers = {}
        while True:
            line = f.readline().decode().strip()
            if not line:
                break
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        want = base64.b64encode(
            hashlib.sha1(
                (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11").encode()
            ).digest()
        ).decode()
        assert headers["sec-websocket-accept"] == want
        assert headers["upgrade"].lower() == "websocket"

        def next_frame():
            b0, b1 = f.read(1)[0], f.read(1)[0]
            assert b0 == 0x81  # FIN text frame
            n = b1 & 0x7F
            assert not (b1 & 0x80)  # server frames are unmasked
            if n == 126:
                n = int.from_bytes(f.read(2), "big")
            elif n == 127:
                n = int.from_bytes(f.read(8), "big")
            return json.loads(f.read(n))

        initial = sorted(next_frame()["txn"] for _ in range(2))
        assert initial == [1001, 1003]
        feed("b2.json", BATCH_2)
        assert next_frame()["txn"] == 1005
    finally:
        sock.close()
        hg.stop()
