"""Unit tests for the vendored stdlib websocket client/server (miniws.py):
handshake, frame sizes across all three length encodings, fragmentation,
protocol ping auto-pong, close handshake, keepalive timeout abort."""

import asyncio
import struct

from liq_stream_spark.sources import miniws


def run(coro):
    return asyncio.run(coro)


def test_echo_roundtrip_and_frame_sizes():
    async def handler(ws):
        async for msg in ws:
            await ws.send(msg)

    async def main():
        async with miniws.serve(handler) as srv:
            async with miniws.connect(
                f"ws://127.0.0.1:{srv.port}/", ping_interval=None
            ) as ws:
                for size in (5, 200, 70_000):  # 7-bit, 16-bit, 64-bit lengths
                    await ws.send("x" * size)
                    got = await asyncio.wait_for(ws.recv(), 5)
                    assert got == "x" * size, size
                await ws.send(b"\x00\x01binary")
                got = await asyncio.wait_for(ws.recv(), 5)
                assert got == b"\x00\x01binary"

    run(main())


def test_fragmented_message_reassembled():
    async def handler(ws):
        # hand-built fragmented text: "hel" (FIN=0,TEXT) + "lo" (FIN=1,CONT)
        ws._writer.write(struct.pack("!BB", 0x01, 3) + b"hel")
        ws._writer.write(struct.pack("!BB", 0x80, 2) + b"lo")
        await ws._writer.drain()
        await asyncio.sleep(1)

    async def main():
        async with miniws.serve(handler) as srv:
            async with miniws.connect(
                f"ws://127.0.0.1:{srv.port}/", ping_interval=None
            ) as ws:
                assert await asyncio.wait_for(ws.recv(), 5) == "hello"

    run(main())


def test_protocol_ping_gets_auto_pong():
    got_pong = asyncio.Event()

    async def handler(ws):
        orig = ws._recv_q.put_nowait
        real_set = ws._pong_event.set

        def on_pong():
            real_set()
            got_pong.set()

        ws._pong_event.set = on_pong
        del orig
        await ws.ping(b"hb")
        await asyncio.sleep(0.5)

    async def main():
        async with miniws.serve(handler) as srv:
            async with miniws.connect(
                f"ws://127.0.0.1:{srv.port}/", ping_interval=None
            ) as ws:
                await asyncio.wait_for(got_pong.wait(), 5)
                del ws

    run(main())


def test_server_close_ends_client_iteration():
    async def handler(ws):
        await ws.send("one")
        await ws.close()

    async def main():
        async with miniws.serve(handler) as srv:
            async with miniws.connect(
                f"ws://127.0.0.1:{srv.port}/", ping_interval=None
            ) as ws:
                seen = []
                async for msg in ws:
                    seen.append(msg)
                assert seen == ["one"]

    run(main())


def test_keepalive_timeout_aborts_connection():
    async def handler(ws):
        # swallow everything (never pong): cancel the reader loop so pings
        # go unanswered, keeping the TCP connection open
        for t in ws._tasks:
            t.cancel()
        await asyncio.sleep(3)

    async def main():
        async with miniws.serve(handler) as srv:
            async with miniws.connect(
                f"ws://127.0.0.1:{srv.port}/",
                ping_interval=0.2,
                ping_timeout=0.3,
            ) as ws:
                t0 = asyncio.get_event_loop().time()
                try:
                    await asyncio.wait_for(ws.recv(), 5)
                    raise AssertionError("expected ConnectionClosed")
                except miniws.ConnectionClosed:
                    pass
                assert asyncio.get_event_loop().time() - t0 < 4

    run(main())
