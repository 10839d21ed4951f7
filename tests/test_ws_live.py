"""Live websocket sources driven end-to-end (S1-S6, S11).

A scripted miniws server in this process speaks each venue's wire protocol
(reference: binance_adapter.py:96-129 text ping→pong + array frames,
okx_adapter.py:30-41 subscribe/ack, bybit_adapter.py:124-143 chunked
subscribe with acks); the pump connects through
``spark.readStream.format("liqws").option("url", ...)`` and rows flow
through the SAME normalizers as batch replay — asserted equal to the batch
replay goldens over the same fixtures. Includes a kill-and-reconnect
backoff assertion (S11)."""

import asyncio
import json
import threading
import time
from pathlib import Path

import pytest

from liq_stream_spark.sources import miniws
from liq_stream_spark.sources.replay import read_jsonl_frames
from liq_stream_spark.streaming.pipeline import stream_venue

FIXTURES = Path(__file__).parent / "fixtures"


class VenueServer:
    """miniws server on a background thread; handler(ws, conn_idx) is the
    venue script. Records per-connection received messages and times."""

    def __init__(self, handler):
        self.handler = handler
        self.received: list[tuple[int, str]] = []
        self.connect_times: list[float] = []
        self.port = None
        self._loop = None
        self._ready = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.run(self._main())

    async def _main(self):
        self._loop = asyncio.get_event_loop()
        self._stop = asyncio.Event()
        conn_counter = [0]

        async def on_conn(ws):
            idx = conn_counter[0]
            conn_counter[0] += 1
            self.connect_times.append(time.monotonic())
            await self.handler(self, ws, idx)

        async with miniws.serve(on_conn) as srv:
            self.port = srv.port
            self._ready.set()
            await self._stop.wait()

    def start(self):
        self._thread.start()
        assert self._ready.wait(10), "server failed to start"
        return self

    def stop(self):
        if self._loop:
            self._loop.call_soon_threadsafe(self._stop.set)
        self._thread.join(timeout=10)

    @property
    def connections(self) -> int:
        return len(self.connect_times)


def drive(spark, venue, market, server, name, expected_rows, ws_options=None,
          timeout=90):
    """Start the live stream into a memory sink and wait for rows."""
    opts = {"url": f"ws://127.0.0.1:{server.port}/"}
    opts.update(ws_options or {})
    df = stream_venue(spark, venue, market, live=True, ws_options=opts)
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="1 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if spark.sql(f"select * from {name}").count() >= expected_rows:
                break
            time.sleep(0.5)
        rows = [r.asDict() for r in spark.sql(f"select * from {name}").collect()]
    finally:
        q.stop()
    return rows


def normalized_key(r):
    return (r["symbol"], r["ts_exch_ms"] or 0, r["qty"] or 0.0, r["price"] or 0.0,
            r["side"], r["notional"])


def batch_golden(spark, normalize, fixture, market="usdt"):
    """The replay-path rows for the same fixture (ingest ts differs live)."""
    df = read_jsonl_frames(spark, str(FIXTURES / fixture), 1_800_000_000_000)
    return sorted(normalized_key(r.asDict()) for r in normalize(df, market=market).collect())


@pytest.mark.slow
def test_binance_live_text_ping_and_frames(spark):
    from liq_stream_spark.operators import normalize_binance

    frames = (FIXTURES / "binance_force_order.jsonl").read_text().splitlines()
    pong_seen = threading.Event()

    async def handler(sv, ws, idx):
        await ws.send("ping")  # venue text keepalive (binance_adapter.py:114-116)
        msg = await asyncio.wait_for(ws.recv(), 15)
        sv.received.append((idx, msg))
        if msg == "pong":
            pong_seen.set()
        for line in frames:
            await ws.send(line)
        await asyncio.sleep(3600)  # hold open until query stops

    server = VenueServer(handler).start()
    try:
        rows = drive(spark, "binance", "usdt", server, "ws_binance", 5)
    finally:
        server.stop()
    assert pong_seen.is_set(), "client must answer venue text ping with pong"
    got = sorted(normalized_key(r) for r in rows)
    assert got == batch_golden(spark, normalize_binance, "binance_force_order.jsonl")
    assert all(r["exchange"] == "binance" and r["market"] == "usdt" for r in rows)


@pytest.mark.slow
def test_aster_live_shared_binance_protocol(spark):
    """S6: Aster speaks the Binance wire protocol (aster_adapter.py shares
    the decoder); drive the aster venue end-to-end against the mock server
    and assert the ASTER-normalized rows (exchange constant, usdt-only
    market guard) match the replay golden for the same frames."""
    from liq_stream_spark.operators import normalize_aster

    frames = (FIXTURES / "binance_force_order.jsonl").read_text().splitlines()

    async def handler(sv, ws, idx):
        for line in frames:
            await ws.send(line)
        await asyncio.sleep(3600)

    server = VenueServer(handler).start()
    try:
        rows = drive(spark, "aster", "usdt", server, "ws_aster", 5)
    finally:
        server.stop()
    got = sorted(normalized_key(r) for r in rows)
    assert got == batch_golden(spark, normalize_aster, "binance_force_order.jsonl")
    assert all(r["exchange"] == "aster" and r["market"] == "usdt" for r in rows)


@pytest.mark.slow
def test_okx_live_subscribe_ack_frames(spark):
    from liq_stream_spark.operators import normalize_okx

    frames = (FIXTURES / "okx_liquidation_orders.jsonl").read_text().splitlines()

    async def handler(sv, ws, idx):
        sub = json.loads(await asyncio.wait_for(ws.recv(), 15))
        sv.received.append((idx, json.dumps(sub)))
        # ack (okx_adapter.py:36-41) then data
        await ws.send(json.dumps({"event": "subscribe", "arg": sub["args"][0]}))
        for line in frames:
            await ws.send(line)
        await asyncio.sleep(3600)

    server = VenueServer(handler).start()
    try:
        rows = drive(spark, "okx", "usdt", server, "ws_okx", 4)
    finally:
        server.stop()
    sub = json.loads(server.received[0][1])
    assert sub == {
        "op": "subscribe",
        "args": [{"channel": "liquidation-orders", "instType": "SWAP"}],
    }
    got = sorted(normalized_key(r) for r in rows)
    assert got == batch_golden(spark, normalize_okx, "okx_liquidation_orders.jsonl")


@pytest.mark.slow
def test_bybit_live_chunked_subscribe(spark):
    from liq_stream_spark.operators import normalize_bybit

    frames = (FIXTURES / "bybit_liquidation.jsonl").read_text().splitlines()
    all_subscribed = threading.Event()

    async def handler(sv, ws, idx):
        # 5 symbols / chunk 2 -> 3 subscribe messages, each acked (S4)
        for _ in range(3):
            sub = json.loads(await asyncio.wait_for(ws.recv(), 15))
            sv.received.append((idx, json.dumps(sub)))
            await ws.send(json.dumps({"success": True, "op": "subscribe"}))
        all_subscribed.set()
        for line in frames:
            await ws.send(line)
        await asyncio.sleep(3600)

    server = VenueServer(handler).start()
    try:
        rows = drive(
            spark, "bybit", "usdt", server, "ws_bybit", 8,
            ws_options={
                "symbols": "BTCUSDT,ETHUSDT,ROSEUSDT,ZEROUSDT,BADUSDT",
                "subscribe_chunk": "2",
            },
        )
    finally:
        server.stop()
    assert all_subscribed.is_set()
    subs = [json.loads(m) for _, m in server.received]
    assert [len(s["args"]) for s in subs] == [2, 2, 1]
    assert all(a.startswith("allLiquidation.") for s in subs for a in s["args"])
    flat = [a.split(".", 1)[1] for s in subs for a in s["args"]]
    assert flat == ["BTCUSDT", "ETHUSDT", "ROSEUSDT", "ZEROUSDT", "BADUSDT"]
    got = sorted(normalized_key(r) for r in rows)
    assert got == batch_golden(spark, normalize_bybit, "bybit_liquidation.jsonl")


class InstrumentsInfoServer:
    """Stdlib http.server speaking Bybit's v5 instruments-info shape
    (reference bybit_adapter.py:108-122): GET
    /v5/market/instruments-info?category=linear -> {"result": {"list":
    [{"symbol": ...}, ...]}}. Records request paths for assertions."""

    def __init__(self, symbols_by_category):
        import http.server

        outer = self

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                from urllib.parse import parse_qs, urlparse

                outer.paths.append(self.path)
                u = urlparse(self.path)
                if u.path != "/v5/market/instruments-info":
                    self.send_error(404)
                    return
                cat = parse_qs(u.query).get("category", [""])[0]
                body = json.dumps(
                    {
                        "retCode": 0,
                        "retMsg": "OK",
                        "result": {
                            "category": cat,
                            "list": [
                                {"symbol": s, "status": "Trading"}
                                for s in outer.symbols_by_category.get(cat, [])
                            ]
                            # a list entry without a symbol key must be
                            # skipped (reference: `if it.get("symbol")`)
                            + [{"status": "PreLaunch"}],
                        },
                    }
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # keep pytest output clean
                pass

        self.symbols_by_category = symbols_by_category
        self.paths: list[str] = []
        self._httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._httpd.shutdown()
        self._thread.join(timeout=10)


def test_bybit_rest_symbol_discovery_unit():
    """S3 executes: fetch_bybit_symbols parses the instruments-info page
    served by a local HTTP mock, skipping symbol-less entries."""
    from liq_stream_spark.sources.ws_datasource import fetch_bybit_symbols

    http_srv = InstrumentsInfoServer(
        {"linear": ["BTCUSDT", "ETHUSDT", "XRPUSDT"], "inverse": ["BTCUSD"]}
    ).start()
    try:
        base = f"http://127.0.0.1:{http_srv.port}"
        assert fetch_bybit_symbols("linear", base_url=base) == [
            "BTCUSDT", "ETHUSDT", "XRPUSDT",
        ]
        assert fetch_bybit_symbols("inverse", base_url=base) == ["BTCUSD"]
        assert http_srv.paths == [
            "/v5/market/instruments-info?category=linear",
            "/v5/market/instruments-info?category=inverse",
        ]
    finally:
        http_srv.stop()


@pytest.mark.slow
def test_bybit_discovery_wires_into_subscribe(spark):
    """S3 end-to-end: with no explicit symbols option, the reader fetches
    the symbol list from the (mock) REST endpoint at stream start and the
    pump subscribes exactly those symbols, chunked (S4); frames then flow
    through the normalizer."""
    from liq_stream_spark.operators import normalize_bybit

    frames = (FIXTURES / "bybit_liquidation.jsonl").read_text().splitlines()
    discovered = ["BTCUSDT", "ETHUSDT", "ROSEUSDT"]
    http_srv = InstrumentsInfoServer({"linear": discovered}).start()

    async def handler(sv, ws, idx):
        for _ in range(2):  # 3 symbols / chunk 2 -> 2 subscribe messages
            sub = json.loads(await asyncio.wait_for(ws.recv(), 15))
            sv.received.append((idx, json.dumps(sub)))
            await ws.send(json.dumps({"success": True, "op": "subscribe"}))
        for line in frames:
            await ws.send(line)
        await asyncio.sleep(3600)

    server = VenueServer(handler).start()
    try:
        rows = drive(
            spark, "bybit", "usdt", server, "ws_bybit_disc", 8,
            ws_options={
                "discovery_url": f"http://127.0.0.1:{http_srv.port}",
                "subscribe_chunk": "2",
            },
        )
    finally:
        server.stop()
        http_srv.stop()
    assert any("category=linear" in p for p in http_srv.paths)
    subs = [json.loads(m) for _, m in server.received]
    flat = [a.split(".", 1)[1] for s in subs for a in s["args"]]
    assert flat == discovered
    assert [len(s["args"]) for s in subs] == [2, 1]
    got = sorted(normalized_key(r) for r in rows)
    assert got == batch_golden(spark, normalize_bybit, "bybit_liquidation.jsonl")


@pytest.mark.slow
def test_bybit_legacy_channel_prefix(spark):
    """use_all=false subscribes the legacy liquidation.<SYM> channel
    (bybit_adapter.py:177-181) and legacy frames normalize end-to-end."""
    legacy_frame = json.dumps(
        {
            "topic": "liquidation.BTCUSDT",
            "ts": 1739502302929,
            "data": {
                "updatedTimeE6": "1739502302929000",
                "symbol": "BTCUSDT",
                "side": "Buy",
                "size": "0.01",
                "price": "30000",
            },
        }
    )

    async def handler(sv, ws, idx):
        sub = json.loads(await asyncio.wait_for(ws.recv(), 15))
        sv.received.append((idx, json.dumps(sub)))
        await ws.send(json.dumps({"success": True, "op": "subscribe"}))
        await ws.send(legacy_frame)
        await asyncio.sleep(3600)

    server = VenueServer(handler).start()
    try:
        rows = drive(
            spark, "bybit", "usdt", server, "ws_bybit_legacy", 1,
            ws_options={"symbols": "BTCUSDT", "use_all": "false"},
        )
    finally:
        server.stop()
    sub = json.loads(server.received[0][1])
    assert sub["args"] == ["liquidation.BTCUSDT"]
    assert len(rows) == 1
    r = rows[0]
    assert r["symbol"] == "BTCUSDT" and r["side"] == "short"
    assert r["ts_exch_ms"] == 1739502302929  # µs→ms
    assert r["qty"] == 0.01 and r["price"] == 30000.0


@pytest.mark.slow
def test_reconnect_with_backoff(spark):
    """S11: server kills the TCP connection after one frame; the pump must
    reconnect (backoff starts at 1.0 s) and deliver frames from both
    connections exactly once each."""
    frame1 = json.dumps(
        {"e": "forceOrder", "E": 1710000000001,
         "o": {"s": "AAAUSDT", "S": "SELL", "q": "1", "p": "10", "ap": "10",
               "l": "1", "z": "1", "T": 1710000000001}}
    )
    frame2 = json.dumps(
        {"e": "forceOrder", "E": 1710000000002,
         "o": {"s": "BBBUSDT", "S": "BUY", "q": "2", "p": "20", "ap": "20",
               "l": "2", "z": "2", "T": 1710000000002}}
    )

    async def handler(sv, ws, idx):
        if idx == 0:
            await ws.send(frame1)
            await asyncio.sleep(0.5)
            ws._abort()  # hard TCP kill, no close handshake
        else:
            await ws.send(frame2)
            await asyncio.sleep(3600)

    server = VenueServer(handler).start()
    try:
        rows = drive(spark, "binance", "usdt", server, "ws_reconnect", 2,
                     timeout=120)
    finally:
        server.stop()
    assert server.connections >= 2, "pump never reconnected"
    # reconnect respects the 1.0 s starting backoff
    assert server.connect_times[1] - server.connect_times[0] >= 0.9
    syms = sorted(r["symbol"] for r in rows)
    assert syms == ["AAAUSDT", "BBBUSDT"]


def test_bybit_rest_discovery_rejects_in_body_error():
    """Bybit v5 reports API errors with HTTP 200 and retCode != 0; the
    discovery must raise instead of resolving to an empty symbol list
    (which would become a silent zero-channel subscription)."""
    import http.server

    class ErrHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(
                {"retCode": 10001, "retMsg": "params error", "result": {}}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), ErrHandler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        from liq_stream_spark.sources.ws_datasource import fetch_bybit_symbols

        with pytest.raises(OSError, match="retCode 10001"):
            fetch_bybit_symbols(
                "linear",
                base_url=f"http://127.0.0.1:{httpd.server_address[1]}",
            )
    finally:
        httpd.shutdown()
        t.join(timeout=10)
