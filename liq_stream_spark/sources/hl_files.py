"""Hyperliquid hour-file source.

The reference tails ``root/YYYYMMDD/HH`` hourly node-fill logs: backfill =
full-read all existing files sorted day-then-hour, live = poll-tail the
newest file (hyperliquid_adapter.py:68-101, :259-351).

Spark's file streaming source subsumes both modes: on the first trigger it
reads every existing file (backfill, S7), and each subsequent trigger picks
up newly created files (hour rollover, S8). In-place appends to the *current*
hour file have no Spark built-in — at file granularity the stream sees an
hour file once; a tiny tail→append-only-dir relay restores low latency if
needed (SURVEY.md §2.1 S8). At 100 TB scale the hourly layout is exactly a
date/hour-partitioned table, so the batch reader maps to a partitioned scan
with partition pruning.
"""

from __future__ import annotations

import os
import threading
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from liq_stream_spark.functions import now_ms

# root/YYYYMMDD/HH — day dirs are digits, hour files are digits 0..23
_GLOB = "/[0-9]*/[0-9]*"


def read_hl_hourly(
    spark: SparkSession, root: str, ingest_ms: int | None = None
) -> DataFrame:
    """Batch-read all hour files under root (backfill semantics,
    hyperliquid_adapter.py:341-348). Day-then-hour ordering is irrelevant to
    the set of rows produced; the dedup operator handles cross-file dups."""
    df = spark.read.text(root + _GLOB)
    stamp = F.lit(ingest_ms).cast("long") if ingest_ms is not None else now_ms()
    return df.withColumn("ts_ingest_ms", stamp)


def read_hl_hourly_stream(
    spark: SparkSession, root: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.text(root + _GLOB)
    return df.withColumn("ts_ingest_ms", now_ms())


def _iter_hour_files(root: Path) -> list[Path]:
    """All hour files sorted day-asc then hour-asc (reference
    _iter_all_hour_files, hyperliquid_adapter.py:68-82)."""
    files: list[Path] = []
    if not root.exists():
        return files
    for d in sorted(
        (p for p in root.iterdir() if p.is_dir() and p.name.isdigit()),
        key=lambda p: int(p.name),
    ):
        files.extend(
            sorted(
                (f for f in d.iterdir() if f.is_file() and f.name.isdigit()),
                key=lambda f: int(f.name),
            )
        )
    return files


class HLTailRelay:
    """Sub-hour-latency tail for the Hyperliquid hour files (S8).

    Spark's file source only sees an hour file once, at whole-file
    granularity — up to an hour of lag on in-place appends. This relay
    restores the reference's latency (hyperliquid_adapter.py:276-339): a
    driver-side daemon thread polls the newest hour file every
    ``poll_sec`` (0.15 s), checks for hour rollover every
    ``rollover_check_sec`` (1 s), detects log rotation by inode change or
    size shrink, and appends each batch of COMPLETE lines as a new
    immutable chunk file in ``relay_dir`` (written under a Spark-ignored
    ``_``-prefixed temp name, then atomically renamed) — which
    ``read_hl_relay_stream`` consumes with ordinary file streaming, so a
    line written mid-hour reaches the sink on the next trigger.

    Semantics vs the reference:
    - ``catch_up=True`` replays all existing hour files fully, then keeps
      tailing the newest from the exact offset the backfill reached — no
      gap and no overlap (the reference's separate backfill + seek-to-end
      tail can drop lines appended in between).
    - On hour rollover the old file is drained to EOF and the new file is
      read from offset 0 (the reference reopens at EOF, losing up to
      ``rollover_check_sec`` of the new hour).
    - On rotation/truncation the file is reopened at EOF, matching the
      reference's ``_open_follow`` (content rewritten in place is
      unrecoverable either way).
    The downstream keyed dedup (tid|user|coin) makes replays across
    restarts harmless, exactly as it does for the reference's ring."""

    def __init__(
        self,
        root: str,
        relay_dir: str,
        poll_sec: float = 0.15,
        rollover_check_sec: float = 1.0,
        catch_up: bool = True,
    ):
        self.root = Path(root)
        self.relay_dir = Path(relay_dir)
        self.poll_sec = poll_sec
        self.rollover_check_sec = rollover_check_sec
        self.catch_up = catch_up
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._seq = 0

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "HLTailRelay":
        self.relay_dir.mkdir(parents=True, exist_ok=True)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=timeout)

    # -- relay -------------------------------------------------------------

    def _emit(self, lines: list[str], src: Path) -> None:
        if not lines:
            return
        name = f"{self._seq:08d}_{src.parent.name}_{src.name}.txt"
        # `_` prefix hides it from Spark's file source; `.tmp` suffix keeps
        # it out of any consumer's `*.txt` glob until the atomic rename.
        tmp = self.relay_dir / f"_tmp_{name}.tmp"
        tmp.write_text("\n".join(lines) + "\n", encoding="utf-8")
        os.rename(tmp, self.relay_dir / name)  # atomic publish
        self._seq += 1

    def _run(self) -> None:
        current: Path | None = None
        f = None
        ino = -1
        pos = 0
        buf = ""

        def open_at(path: Path, offset: int):
            nonlocal f, ino, pos, buf, current
            if f is not None:
                try:
                    f.close()
                except OSError:
                    pass
            f = open(path, "r", encoding="utf-8")
            if offset < 0:
                f.seek(0, os.SEEK_END)
            else:
                f.seek(offset)
            ino = os.fstat(f.fileno()).st_ino
            pos = f.tell()
            buf = ""
            current = path

        try:
            # wait for the first hour file (":280-284")
            while not self._stop.is_set():
                latest = _latest_hour_file(self.root)
                if latest:
                    break
                time.sleep(min(1.0, self.poll_sec * 4))
            if self._stop.is_set() or latest is None:
                return

            if self.catch_up:
                for p in _iter_hour_files(self.root):
                    if self._stop.is_set():
                        return
                    if p == latest:
                        # read fully, then CONTINUE from this offset
                        open_at(p, 0)
                    else:
                        text = p.read_text(encoding="utf-8")
                        self._emit(
                            [ln for ln in text.split("\n") if ln.strip()], p
                        )
                if current is None:
                    open_at(latest, 0)
            else:
                open_at(latest, -1)  # reference parity: tail from EOF

            last_roll = time.monotonic()
            while not self._stop.is_set():
                if time.monotonic() - last_roll >= self.rollover_check_sec:
                    latest = _latest_hour_file(self.root)
                    if latest and latest != current:
                        # drain the finished hour, flush its final line
                        tail = f.read()
                        pos = f.tell()
                        buf += tail
                        last = [ln for ln in buf.split("\n") if ln.strip()]
                        self._emit(last, current)
                        open_at(latest, 0)  # new hour read from the top
                    last_roll = time.monotonic()

                if self._rotated(current, ino, pos):
                    open_at(current, -1)  # reference _open_follow parity

                chunk = f.read()
                if not chunk:
                    time.sleep(self.poll_sec)
                    continue
                pos = f.tell()
                buf += chunk
                complete, _, buf = buf.rpartition("\n")
                self._emit(
                    [ln for ln in complete.split("\n") if ln.strip()], current
                )
        finally:
            if f is not None:
                try:
                    f.close()
                except OSError:
                    pass

    @staticmethod
    def _rotated(path: Path, ino: int, pos: int) -> bool:
        try:
            st = os.stat(path)
        except FileNotFoundError:
            return True
        return st.st_ino != ino or st.st_size < pos


def _latest_hour_file(root: Path) -> Path | None:
    files = _iter_hour_files(root)
    return files[-1] if files else None


def read_hl_relay_stream(
    spark: SparkSession, relay_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream the relay's chunk files — pair with HLTailRelay for sub-hour
    Hyperliquid latency; plugs into the same normalizer + keyed dedup."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.text(relay_dir)
    return df.withColumn("ts_ingest_ms", now_ms())
