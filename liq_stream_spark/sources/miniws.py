"""Minimal RFC 6455 websocket client + server over asyncio (stdlib only).

The container has no ``websockets`` package, so the live pump
(`ws_datasource._WSPump`) falls back to this client, and the integration
tests run a scripted local server speaking each venue's wire protocol
(tests/test_ws_live.py). The API mirrors the subset of ``websockets`` the
pump uses:

    async with miniws.connect(url, ping_interval=20, ping_timeout=10,
                              max_size=10_000_000) as ws:
        await ws.send("...")
        msg = await ws.recv()
        async for msg in ws: ...

Protocol coverage: HTTP/1.1 upgrade handshake (Sec-WebSocket-Accept
verified), text/binary/continuation frames, 7/16/64-bit lengths, client
masking, auto ping→pong reply, keepalive pings with pong timeout, close
handshake, ``wss://`` via asyncio TLS. Not implemented: extensions
(permessage-deflate), subprotocols — none of the venues require them
(reference connects with the defaults, binance_adapter.py:96-101).
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import os
import ssl as ssl_mod
import struct
from urllib.parse import urlparse

GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
OP_CONT, OP_TEXT, OP_BIN, OP_CLOSE, OP_PING, OP_PONG = 0, 1, 2, 8, 9, 10

_SENTINEL = object()


class ConnectionClosed(Exception):
    pass


class ConnectionClosedOK(ConnectionClosed):
    """Close handshake completed — ``async for`` ends without raising."""


class ConnectionClosedError(ConnectionClosed):
    """Abnormal closure (TCP reset/EOF, oversize frame, keepalive timeout)
    — ``async for`` RAISES, so reconnect loops apply their backoff, same
    contract as the ``websockets`` package."""


def _mask(payload: bytes, key: bytes) -> bytes:
    # XOR with the 4-byte key cycled over the payload; int-math is plenty
    # for the small frames we mask (client subscribes)
    return bytes(b ^ key[i % 4] for i, b in enumerate(payload))


def _encode_frame(opcode: int, payload: bytes, mask: bool) -> bytes:
    b0 = 0x80 | opcode  # FIN always set — we never fragment our own sends
    mbit = 0x80 if mask else 0
    n = len(payload)
    if n < 126:
        hdr = struct.pack("!BB", b0, mbit | n)
    elif n < 1 << 16:
        hdr = struct.pack("!BBH", b0, mbit | 126, n)
    else:
        hdr = struct.pack("!BBQ", b0, mbit | 127, n)
    if mask:
        key = os.urandom(4)
        return hdr + key + _mask(payload, key)
    return hdr + payload


class WSProtocol:
    """One websocket connection. A background task parses frames, answers
    protocol pings, and feeds complete messages to a queue; ``recv`` pops
    from it. Client connections also run a keepalive ping task."""

    def __init__(
        self,
        reader: asyncio.StreamReader,
        writer: asyncio.StreamWriter,
        *,
        client: bool,
        max_size: int = 10_000_000,
        ping_interval: float | None = None,
        ping_timeout: float | None = None,
    ):
        self._reader = reader
        self._writer = writer
        self._client = client
        self.max_size = max_size
        self.ping_interval = ping_interval
        self.ping_timeout = ping_timeout
        self._recv_q: asyncio.Queue = asyncio.Queue()
        self._send_lock = asyncio.Lock()
        self._pong_event = asyncio.Event()
        self._closed = False
        self._clean_close = False
        self._tasks: list[asyncio.Task] = []

    def start(self) -> None:
        self._tasks.append(asyncio.ensure_future(self._reader_loop()))
        if self.ping_interval:
            self._tasks.append(asyncio.ensure_future(self._keepalive()))

    # -- sending -----------------------------------------------------------

    async def _send_frame(self, opcode: int, payload: bytes) -> None:
        if self._closed:
            raise ConnectionClosed("send on closed connection")
        async with self._send_lock:
            self._writer.write(_encode_frame(opcode, payload, mask=self._client))
            try:
                await self._writer.drain()
            except (ConnectionResetError, BrokenPipeError) as e:
                self._abort()
                raise ConnectionClosed(str(e)) from e

    async def send(self, message: str | bytes) -> None:
        if isinstance(message, str):
            await self._send_frame(OP_TEXT, message.encode("utf-8"))
        else:
            await self._send_frame(OP_BIN, bytes(message))

    async def ping(self, payload: bytes = b"") -> None:
        await self._send_frame(OP_PING, payload)

    async def close(self, code: int = 1000) -> None:
        if not self._closed:
            self._clean_close = True
            try:
                await self._send_frame(OP_CLOSE, struct.pack("!H", code))
            except (ConnectionClosed, OSError):
                pass
        self._abort()

    def _abort(self) -> None:
        self._closed = True
        self._recv_q.put_nowait(_SENTINEL)
        for t in self._tasks:
            if t is not asyncio.current_task():
                t.cancel()
        try:
            self._writer.close()
        except Exception:
            pass

    # -- receiving ---------------------------------------------------------

    async def _read_exact(self, n: int) -> bytes:
        try:
            return await self._reader.readexactly(n)
        except (asyncio.IncompleteReadError, ConnectionResetError, OSError) as e:
            raise ConnectionClosed(str(e)) from e

    async def _read_frame(self) -> tuple[int, int, bytes]:
        b = await self._read_exact(2)
        fin, opcode = b[0] & 0x80, b[0] & 0x0F
        masked, n = b[1] & 0x80, b[1] & 0x7F
        if n == 126:
            n = struct.unpack("!H", await self._read_exact(2))[0]
        elif n == 127:
            n = struct.unpack("!Q", await self._read_exact(8))[0]
        if n > self.max_size:
            raise ConnectionClosed(f"frame of {n} bytes exceeds max_size")
        key = await self._read_exact(4) if masked else None
        payload = await self._read_exact(n) if n else b""
        if key:
            payload = _mask(payload, key)
        return fin, opcode, payload

    async def _reader_loop(self) -> None:
        buf, buf_op = b"", OP_TEXT
        try:
            while True:
                fin, op, payload = await self._read_frame()
                if op == OP_PING:
                    await self._send_frame(OP_PONG, payload)
                    continue
                if op == OP_PONG:
                    self._pong_event.set()
                    continue
                if op == OP_CLOSE:
                    self._clean_close = True
                    try:
                        await self._send_frame(OP_CLOSE, payload)
                    except (ConnectionClosed, OSError):
                        pass
                    raise ConnectionClosedOK("close frame received")
                if op in (OP_TEXT, OP_BIN):
                    buf, buf_op = payload, op
                elif op == OP_CONT:
                    buf += payload
                    if len(buf) > self.max_size:
                        raise ConnectionClosed("fragmented message too large")
                if fin:
                    self._recv_q.put_nowait(
                        buf.decode("utf-8", "ignore") if buf_op == OP_TEXT else buf
                    )
                    buf = b""
        except (ConnectionClosed, asyncio.CancelledError):
            pass
        finally:
            self._abort()

    async def _keepalive(self) -> None:
        try:
            while not self._closed:
                await asyncio.sleep(self.ping_interval)
                if self._closed:
                    return
                self._pong_event.clear()
                await self._send_frame(OP_PING, b"")
                try:
                    await asyncio.wait_for(
                        self._pong_event.wait(), self.ping_timeout or 10
                    )
                except asyncio.TimeoutError:
                    self._abort()
                    return
        except (ConnectionClosed, asyncio.CancelledError):
            pass

    def _closed_exc(self) -> ConnectionClosed:
        if self._clean_close:
            return ConnectionClosedOK("connection closed")
        return ConnectionClosedError("connection closed abnormally")

    async def recv(self) -> str | bytes:
        if self._closed and self._recv_q.empty():
            raise self._closed_exc()
        msg = await self._recv_q.get()
        if msg is _SENTINEL:
            self._recv_q.put_nowait(_SENTINEL)  # keep poisoned for next recv
            raise self._closed_exc()
        return msg

    def __aiter__(self):
        return self

    async def __anext__(self):
        try:
            return await self.recv()
        except ConnectionClosedOK:
            raise StopAsyncIteration from None
        # ConnectionClosedError propagates — reconnect loops need to see it


class connect:
    """``async with miniws.connect(url, ...) as ws:`` — websockets-shaped."""

    def __init__(
        self,
        url: str,
        *,
        ping_interval: float | None = 20,
        ping_timeout: float | None = 10,
        max_size: int = 10_000_000,
    ):
        self.url = url
        self.ping_interval = ping_interval
        self.ping_timeout = ping_timeout
        self.max_size = max_size
        self._proto: WSProtocol | None = None

    async def __aenter__(self) -> WSProtocol:
        u = urlparse(self.url)
        tls = u.scheme == "wss"
        port = u.port or (443 if tls else 80)
        reader, writer = await asyncio.open_connection(
            u.hostname, port, ssl=ssl_mod.create_default_context() if tls else None
        )
        key = base64.b64encode(os.urandom(16)).decode()
        path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        writer.write(
            (
                f"GET {path} HTTP/1.1\r\n"
                f"Host: {u.hostname}:{port}\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        status = await reader.readline()
        if b" 101 " not in status and not status.startswith(b"HTTP/1.1 101"):
            writer.close()
            raise ConnectionClosed(f"handshake rejected: {status!r}")
        expect = base64.b64encode(
            hashlib.sha1((key + GUID).encode()).digest()
        ).decode()
        accept_ok = False
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            if line.lower().startswith(b"sec-websocket-accept:"):
                accept_ok = line.split(b":", 1)[1].strip().decode() == expect
        if not accept_ok:
            writer.close()
            raise ConnectionClosed("bad Sec-WebSocket-Accept")
        self._proto = WSProtocol(
            reader,
            writer,
            client=True,
            max_size=self.max_size,
            ping_interval=self.ping_interval,
            ping_timeout=self.ping_timeout,
        )
        self._proto.start()
        return self._proto

    async def __aexit__(self, *exc) -> None:
        if self._proto is not None:
            await self._proto.close()


class serve:
    """``async with miniws.serve(handler, host, 0) as srv:`` — test server.

    ``handler(ws)`` runs per connection; returning closes it. ``srv.port``
    is the bound port (pass 0 to pick a free one)."""

    def __init__(self, handler, host: str = "127.0.0.1", port: int = 0):
        self.handler = handler
        self.host = host
        self.port_arg = port
        self._server: asyncio.AbstractServer | None = None

    @property
    def port(self) -> int:
        return self._server.sockets[0].getsockname()[1]

    async def __aenter__(self) -> serve:
        self._server = await asyncio.start_server(
            self._on_conn, self.host, self.port_arg
        )
        return self

    async def __aexit__(self, *exc) -> None:
        self._server.close()
        await self._server.wait_closed()

    async def _on_conn(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        try:
            request = await reader.readuntil(b"\r\n\r\n")
        except (asyncio.IncompleteReadError, ConnectionResetError):
            writer.close()
            return
        key = None
        for line in request.split(b"\r\n"):
            if line.lower().startswith(b"sec-websocket-key:"):
                key = line.split(b":", 1)[1].strip().decode()
        if not key:
            writer.write(b"HTTP/1.1 400 Bad Request\r\n\r\n")
            writer.close()
            return
        accept = base64.b64encode(
            hashlib.sha1((key + GUID).encode()).digest()
        ).decode()
        writer.write(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        proto = WSProtocol(reader, writer, client=False)
        proto.start()
        try:
            await self.handler(proto)
        except (ConnectionClosed, asyncio.CancelledError):
            pass
        finally:
            proto._abort()
