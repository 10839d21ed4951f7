"""HL tail→relay: sub-hour latency for in-place hour-file appends (S8).

The reference tails the newest hour file at 0.15 s polls
(hyperliquid_adapter.py:276-339); Spark's file source alone only sees an
hour file once. These tests drive HLTailRelay end-to-end: backfill, a line
appended mid-hour reaching the sink within a couple of triggers, hour
rollover, and the keyed dedup staying intact across the rollover."""

import json
import time
from pathlib import Path

import pytest

from liq_stream_spark.sources.hl_files import HLTailRelay
from liq_stream_spark.streaming.pipeline import stream_venue


def hl_line(tid, coin="BTC", user="0xabc", block=123456, px="100.0", sz="1.0"):
    return json.dumps(
        {
            "local_time": "2025-09-23T12:34:56.000Z",
            "block_time": 1758630896789 + tid,
            "block_number": block,
            "events": [
                [
                    user,
                    {
                        "coin": coin,
                        "px": px,
                        "sz": sz,
                        "dir": "Close Long",
                        "side": "A",
                        "fee": "0.1",
                        "feeToken": "USDC",
                        "hash": f"0xh{tid}",
                        "tid": tid,
                        "liquidation": {
                            "liquidatedUser": user,
                            "markPx": px,
                            "method": "market",
                        },
                    },
                ]
            ],
        }
    )


def append(path: Path, *lines: str) -> None:
    with open(path, "a", encoding="utf-8") as f:
        for ln in lines:
            f.write(ln + "\n")
        f.flush()


def test_relay_unit_backfill_append_rollover(tmp_path):
    """Relay alone (no Spark): backfill continuity, in-place append pickup,
    rollover drain + new-hour from offset 0, partial-line buffering."""
    root = tmp_path / "hl"
    relay_dir = tmp_path / "relay"
    day = root / "20250923"
    day.mkdir(parents=True)
    append(day / "0", hl_line(1), hl_line(2))

    relay = HLTailRelay(str(root), str(relay_dir), poll_sec=0.05,
                        rollover_check_sec=0.1).start()
    try:
        def relay_lines():
            out = []
            for p in sorted(relay_dir.glob("*.txt")):
                out += [ln for ln in p.read_text().splitlines() if ln]
            return out

        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and len(relay_lines()) < 2:
            time.sleep(0.05)
        assert len(relay_lines()) == 2  # backfill of the existing hour

        # in-place append, including a partial line that must NOT be
        # emitted until its newline arrives
        with open(day / "0", "a", encoding="utf-8") as f:
            f.write(hl_line(3) + "\n")
            half = hl_line(4)
            f.write(half[: len(half) // 2])
            f.flush()
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and len(relay_lines()) < 3:
            time.sleep(0.05)
        assert len(relay_lines()) == 3
        time.sleep(0.3)
        assert len(relay_lines()) == 3  # half line held back

        # complete the partial line, then roll to the next hour
        with open(day / "0", "a", encoding="utf-8") as f:
            f.write(half[len(half) // 2:] + "\n")
        append(day / "1", hl_line(5))
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and len(relay_lines()) < 5:
            time.sleep(0.05)
        got = relay_lines()
        assert got == [hl_line(1), hl_line(2), hl_line(3), hl_line(4),
                       hl_line(5)]
    finally:
        relay.stop()


@pytest.mark.slow
def test_hl_tail_stream_end_to_end(spark, tmp_path):
    """A line appended mid-hour reaches the sink within a trigger or two,
    and a duplicate re-emitted after the hour rollover is dropped by the
    keyed (tid|user|coin) streaming dedup."""
    root = tmp_path / "hl"
    relay_dir = tmp_path / "relay"
    day = root / "20250923"
    day.mkdir(parents=True)
    append(day / "0", hl_line(1))

    df = stream_venue(
        spark, "hyperliquid", "usdc",
        source_dir=str(root),
        hl_tail_relay_dir=str(relay_dir),
    )
    relay = df._hl_relay
    q = (
        df.writeStream.format("memory")
        .queryName("hl_tail")
        .trigger(processingTime="1 seconds")
        .start()
    )

    def wait_rows(n, timeout=60):
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            if spark.sql("select * from hl_tail").count() >= n:
                return time.monotonic()
            time.sleep(0.2)
        raise AssertionError(
            f"expected {n} rows, have "
            f"{spark.sql('select * from hl_tail').count()}"
        )

    try:
        wait_rows(1)  # backfill

        # mid-hour in-place append: the S8 latency gap this closes
        t0 = time.monotonic()
        append(day / "0", hl_line(2, coin="ETH"))
        seen_at = wait_rows(2)
        assert seen_at - t0 < 15, "mid-hour append took too long to arrive"

        # hour rollover: new fill + a re-emit of tid=2 in a fresh wrapper
        # (node logs re-emit fills after rollover; reference dedups by
        # tid|user|coin — hyperliquid_adapter.py:149-164)
        append(day / "1", hl_line(3, coin="SOL"),
               hl_line(2, coin="ETH", block=999999))
        wait_rows(3)
        time.sleep(3)  # would-be duplicate gets every chance to appear
        rows = spark.sql(
            "select symbol, count(*) n from hl_tail group by symbol"
        ).collect()
        counts = {r["symbol"]: r["n"] for r in rows}
        assert counts == {"BTCUSDC": 1, "ETHUSDC": 1, "SOLUSDC": 1}, counts
    finally:
        q.stop()
        relay.stop()


def test_relay_restart_resumes_without_replay_or_collision(tmp_path):
    """A restarted relay with a persisted relay_dir must (a) NOT reuse
    chunk sequence numbers (os.rename over a consumed chunk = silent
    loss) and (b) resume from the persisted offset instead of replaying
    the whole hour-file history as duplicate chunks."""
    root = tmp_path / "hl"
    relay_dir = tmp_path / "relay"
    day = root / "20250923"
    day.mkdir(parents=True)
    append(day / "0", hl_line(1), hl_line(2))

    def relay_lines():
        out = []
        for p in sorted(relay_dir.glob("*.txt")):
            out += [ln for ln in p.read_text().splitlines() if ln]
        return out

    r1 = HLTailRelay(str(root), str(relay_dir), poll_sec=0.05,
                     rollover_check_sec=0.1).start()
    try:
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and len(relay_lines()) < 2:
            time.sleep(0.05)
        assert len(relay_lines()) == 2
    finally:
        r1.stop()
    names_before = {p.name for p in relay_dir.glob("*.txt")}

    # lines appended while the relay is DOWN, then restart
    append(day / "0", hl_line(3))
    r2 = HLTailRelay(str(root), str(relay_dir), poll_sec=0.05,
                     rollover_check_sec=0.1).start()
    try:
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and len(relay_lines()) < 3:
            time.sleep(0.05)
        got = relay_lines()
        # no replay: exactly one new line, not a re-emitted history
        assert got == [hl_line(1), hl_line(2), hl_line(3)]
        # no collision: every pre-restart chunk survives byte-identical
        assert names_before < {p.name for p in relay_dir.glob("*.txt")}
    finally:
        r2.stop()
