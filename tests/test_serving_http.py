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
