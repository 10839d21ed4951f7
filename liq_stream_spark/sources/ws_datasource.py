"""Websocket streaming sources via the Python Data Source API (Spark 4).

One DataSource ("liqws") covers all four websocket venues; the option
``venue`` selects the wire protocol. The reader emits RAW frames
(value string, ts_ingest_ms long) — normalization happens in the same
DataFrame transforms used for batch replay, keeping the source thin and
the semantics tested.

Per-venue protocol (reference parity):
- binance  : wss://fstream.binance.com/ws/!forceOrder@arr (usdt) or
             dstream (coin); text "ping" -> "pong" (binance_adapter.py:10-11,114-116)
- aster    : wss://fstream.asterdex.com/ws/!forceOrder@arr, usdt-only,
             binance-identical (aster_adapter.py)
- okx      : wss://ws.okx.com:8443/ws/v5/public, subscribe
             {"channel":"liquidation-orders","instType":"SWAP"} and read ack
             (okx_adapter.py:30-41); fixed 3 s reconnect (:126-129)
- bybit    : linear/inverse public v5; per-symbol channels
             allLiquidation.<SYM> (or legacy liquidation.<SYM>), symbols
             discovered via REST instruments-info, subscribed in chunks of
             ``subscribe_chunk`` with ack reads + 0.1 s pacing
             (bybit_adapter.py:108-143)

Shared: ping_interval 20 s / ping_timeout 10 s / max_size 10 MB; reconnect
with exponential backoff 1.0 s x1.8 capped at 30 s, reset on connect
(binance_adapter.py:96-129).

Offset/replay semantics: the feeds are NOT replayable. The reader buffers
frames in-process and acknowledges them by a monotonic counter; frames
arriving while disconnected are lost (same as the reference) and a restart
replays nothing from before the first checkpoint. Document: at-least-once
from connect, at-most-once across reconnect gaps.

``websockets``/``requests`` are not installed in this container — the pump
falls back to the vendored stdlib client (miniws.py) and is driven
end-to-end against a scripted local server in tests/test_ws_live.py; the
``url`` option points a venue at an alternate endpoint. REST symbol
discovery still requires ``requests`` (pass ``symbols`` explicitly where
it is unavailable).
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import LongType, StringType, StructField, StructType

RAW_FRAME_SCHEMA = StructType(
    [
        StructField("value", StringType(), True),
        StructField("ts_ingest_ms", LongType(), True),
    ]
)

VENUE_URLS = {
    ("binance", "usdt"): "wss://fstream.binance.com/ws/!forceOrder@arr",
    ("binance", "coin"): "wss://dstream.binance.com/ws/!forceOrder@arr",
    ("aster", "usdt"): "wss://fstream.asterdex.com/ws/!forceOrder@arr",
    ("okx", "usdt"): "wss://ws.okx.com:8443/ws/v5/public",
    ("okx", "coin"): "wss://ws.okx.com:8443/ws/v5/public",
    ("bybit", "usdt"): "wss://stream.bybit.com/v5/public/linear",
    ("bybit", "coin"): "wss://stream.bybit.com/v5/public/inverse",
}

MAX_WS_MESSAGE = 10_000_000
PING_INTERVAL = 20
PING_TIMEOUT = 10
BACKOFF_START = 1.0
BACKOFF_FACTOR = 1.8
BACKOFF_CAP = 30.0
OKX_RECONNECT = 3.0


def _now_ms() -> int:
    return int(time.time() * 1000)


def fetch_bybit_symbols(
    category: str, base_url: str = "https://api.bybit.com"
) -> list[str]:
    """REST symbol discovery (S3, bybit_adapter.py:108-122). Driver-side,
    once at stream start; the result ships to the reader via options.

    ``base_url`` override lets tests (and ops mirrors) point at a local
    instruments-info server. Prefers ``requests`` like the reference and
    falls back to stdlib urllib when it isn't installed. Deviation from
    the reference: errors propagate instead of logging-and-returning []
    — a silent empty subscription is useless to a batch-planned stream,
    and the caller decides whether to retry."""
    from urllib.parse import urlencode

    url = f"{base_url.rstrip('/')}/v5/market/instruments-info"
    params = {"category": category}
    try:
        import requests  # preferred when installed (reference parity)
    except ImportError:
        from urllib.error import HTTPError
        from urllib.request import urlopen

        # urlopen raises HTTPError for status >= 400 before any body read
        # — re-raise with a descriptive message (requests parity)
        try:
            with urlopen(f"{url}?{urlencode(params)}", timeout=20) as resp:
                data = json.loads(resp.read().decode("utf-8"))
        except HTTPError as e:
            raise OSError(
                f"instruments-info HTTP {e.code} from {url}"
            ) from e
    else:
        r = requests.get(url, params=params, timeout=20)
        r.raise_for_status()
        data = r.json()
    # Bybit v5 reports API errors IN-BODY with HTTP 200 (retCode != 0,
    # e.g. 10001 params error / rate limit): without this check a bad or
    # throttled request would resolve to an empty symbol list and a
    # silent zero-channel subscription — exactly the failure mode the
    # errors-propagate deviation exists to prevent
    ret_code = (data or {}).get("retCode", 0)
    if ret_code not in (0, None):
        raise OSError(
            f"instruments-info retCode {ret_code} from {url}: "
            f"{(data or {}).get('retMsg', '')!r}"
        )
    items = (data or {}).get("result", {}).get("list", []) or []
    return [it["symbol"] for it in items if it.get("symbol")]


class _WSPump:
    """Background thread: connect, subscribe, push raw frames to a queue.

    Runs the venue's wire protocol with reconnect/backoff. The Spark reader
    thread drains the queue inside read()."""

    def __init__(self, venue: str, market: str, options: dict):
        self.venue = venue
        self.market = market
        self.options = options
        self.frames: queue.Queue[str] = queue.Queue(maxsize=100_000)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._loop = None  # the pump's asyncio loop, for threadsafe cancel
        self._task = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def stop(self, timeout: float = 5.0) -> None:
        """Best-effort teardown: the stop event alone is only observed
        between frames, and a quiet venue blocks in recv() forever — so
        also cancel the pump task thread-safely, which raises
        CancelledError out of the await and lets the connect context
        manager close the socket."""
        self._stop.set()
        loop, task = self._loop, self._task
        if loop is not None and task is not None:
            try:
                loop.call_soon_threadsafe(task.cancel)
            except RuntimeError:  # loop already closed
                pass
        if self._thread is not None:
            self._thread.join(timeout=timeout)

    # -- protocol ----------------------------------------------------------

    def _run(self) -> None:
        import asyncio

        try:
            asyncio.run(self._pump())
        except asyncio.CancelledError:  # clean stop() cancellation
            pass

    async def _pump(self) -> None:
        import asyncio

        self._loop = asyncio.get_running_loop()
        self._task = asyncio.current_task()
        try:
            if os.environ.get("LIQ_FORCE_MINIWS") == "1":
                # opt-out for deployments that want the CI-tested client
                # even with the websockets package installed
                raise ImportError("LIQ_FORCE_MINIWS=1")
            import websockets  # preferred when installed

            ws_connect = websockets.connect
        except ImportError:
            # stdlib fallback (miniws.py): same handshake/frames/keepalive,
            # exercised end-to-end by tests/test_ws_live.py
            from liq_stream_spark.sources.miniws import connect as ws_connect

        # ``url`` option overrides the venue endpoint (tests point it at a
        # local mock server; ops can point it at a mirror)
        url = self.options.get("url") or VENUE_URLS[(self.venue, self.market)]
        backoff = BACKOFF_START
        while not self._stop.is_set():
            try:
                async with ws_connect(
                    url,
                    ping_interval=PING_INTERVAL,
                    ping_timeout=PING_TIMEOUT,
                    max_size=MAX_WS_MESSAGE,
                ) as ws:
                    backoff = BACKOFF_START  # reset on successful connect
                    await self._subscribe(ws)
                    async for msg in ws:
                        if self._stop.is_set():
                            return
                        if isinstance(msg, bytes):
                            msg = msg.decode("utf-8", "ignore")
                        if msg == "ping":  # venue text keepalive
                            await ws.send("pong")
                            continue
                        self._offer(msg)
            except Exception:
                if self._stop.is_set():
                    return
                wait = OKX_RECONNECT if self.venue == "okx" else backoff
                await asyncio.sleep(wait)
                backoff = min(BACKOFF_CAP, backoff * BACKOFF_FACTOR)

    async def _subscribe(self, ws) -> None:
        import asyncio

        if self.venue == "okx":
            await ws.send(
                json.dumps(
                    {
                        "op": "subscribe",
                        "args": [
                            {"channel": "liquidation-orders", "instType": "SWAP"}
                        ],
                    }
                )
            )
            try:  # drain the ack (okx_adapter.py:36-41)
                await asyncio.wait_for(ws.recv(), timeout=5)
            except asyncio.TimeoutError:
                pass
        elif self.venue == "bybit":
            symbols = [
                s for s in self.options.get("symbols", "").split(",") if s
            ]
            chunk = max(1, int(self.options.get("subscribe_chunk", "100")))
            prefix = (
                "allLiquidation"
                if self.options.get("use_all", "true") == "true"
                else "liquidation"
            )
            for i in range(0, len(symbols), chunk):  # S4 chunked subscribe
                args = [f"{prefix}.{s}" for s in symbols[i : i + chunk]]
                await ws.send(json.dumps({"op": "subscribe", "args": args}))
                try:
                    await asyncio.wait_for(ws.recv(), timeout=3)
                except asyncio.TimeoutError:
                    pass
                await asyncio.sleep(0.1)  # pacing (bybit_adapter.py:143)
        # binance/aster: the URL itself is the subscription

    def _offer(self, frame: str) -> None:
        try:
            self.frames.put_nowait(frame)
        except queue.Full:
            # drop-oldest backpressure (writer_pg.py:159-166 analogue);
            # Spark's pull-based reader normally keeps the queue shallow
            try:
                self.frames.get_nowait()
            except queue.Empty:
                pass
            try:
                self.frames.put_nowait(frame)
            except queue.Full:
                pass


class LiquidationWSReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.venue = options.get("venue", "binance").lower()
        self.market = options.get("market", "usdt").lower()
        if (self.venue, self.market) not in VENUE_URLS:
            raise ValueError(
                f"Unsupported venue/market: {self.venue}/{self.market}"
            )
        opts = dict(options)
        if self.venue == "bybit" and not opts.get("symbols"):
            category = "linear" if self.market == "usdt" else "inverse"
            discovered = fetch_bybit_symbols(
                category,
                base_url=opts.get("discovery_url", "https://api.bybit.com"),
            )
            opts["symbols"] = ",".join(discovered)
        self._opts = opts
        # the pump (thread + queue) is created lazily in read(): Spark
        # pickles the reader at plan time, and live runtime state must not
        # travel with it
        self._pump: _WSPump | None = None

    def __getstate__(self) -> dict:
        state = dict(self.__dict__)
        state["_pump"] = None
        return state

    def initialOffset(self) -> dict:
        return {"counter": 0}

    def read(self, start: dict):
        if self._pump is None:
            self._pump = _WSPump(self.venue, self.market, self._opts)
            self._pump.start()
        rows = []
        counter = start["counter"]
        now = _now_ms()
        while True:
            try:
                frame = self._pump.frames.get_nowait()
            except queue.Empty:
                break
            rows.append((frame, now))
            counter += 1
        return iter(rows), {"counter": counter}

    def readBetweenOffsets(self, start: dict, end: dict):
        # non-replayable feed: a re-read of a failed batch yields nothing;
        # delivery is at-least-once from connect (documented above)
        return iter([])

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        # Spark calls this (driver-side, where the pump lives) when the
        # query stops: without it the pump thread stays connected and
        # buffering for the life of the driver
        if self._pump is not None:
            self._pump.stop()
            self._pump = None


class LiquidationWSDataSource(DataSource):
    """spark.readStream.format("liqws").option("venue", "binance")…"""

    @classmethod
    def name(cls) -> str:
        return "liqws"

    def schema(self):
        return RAW_FRAME_SCHEMA

    def simpleStreamReader(self, schema):
        return LiquidationWSReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(LiquidationWSDataSource)
