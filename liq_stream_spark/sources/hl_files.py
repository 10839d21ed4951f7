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

    RESTART SAFETY (a persisted ``relay_dir`` across runs):
    - chunk names are sequence-numbered, and the sequence RESUMES from
      the highest existing chunk on start — a restarted relay can never
      rename over (and silently destroy) a chunk the stream already
      consumed;
    - relay progress (source file + byte offset of the last emitted
      complete line) persists to ``relay_dir/_relay_state.meta`` after
      every emit, and ``catch_up`` resumes FROM that position instead of
      replaying the whole hour-file history — re-emission across a
      restart is bounded to at most the partial line in flight, well
      inside the downstream keyed dedup's (tid|user|coin) horizon.
      (``catch_up=False`` keeps reference tail-from-EOF parity and
      ignores saved state.)"""

    _STATE = "_relay_state.meta"  # no .txt: out of consumer globs too

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
        # resume the chunk sequence past any chunks a previous relay
        # instance published — colliding names would os.rename OVER files
        # the stream's checkpoint already marked processed (silent loss)
        existing = [
            int(p.name[:8])
            for p in self.relay_dir.glob("[0-9]*_*.txt")
            if p.name[:8].isdigit()
        ]
        self._seq = max(existing) + 1 if existing else 0
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=timeout)

    # -- persisted progress -------------------------------------------------

    def _save_state(self, src: Path, emitted_off: int) -> None:
        tmp = self.relay_dir / f"_{self._STATE}.tmp"
        tmp.write_text(
            f"{src.parent.name}\t{src.name}\t{emitted_off}\n",
            encoding="utf-8",
        )
        os.rename(tmp, self.relay_dir / self._STATE)

    def _load_state(self) -> tuple[tuple[int, int], int] | None:
        """((day, hour), byte offset of the last emitted complete line)."""
        try:
            day, hour, off = (
                (self.relay_dir / self._STATE)
                .read_text(encoding="utf-8")
                .split("\t")
            )
            return (int(day), int(hour)), int(off)
        except (OSError, ValueError):
            return None

    @staticmethod
    def _key(p: Path) -> tuple[int, int]:
        return (int(p.parent.name), int(p.name))

    # -- relay -------------------------------------------------------------

    def _emit(self, lines: list[str], src: Path, emitted_off: int) -> None:
        if lines:
            name = f"{self._seq:08d}_{src.parent.name}_{src.name}.txt"
            # `_` prefix hides it from Spark's file source; `.tmp` suffix
            # keeps it out of any `*.txt` glob until the atomic rename.
            tmp = self.relay_dir / f"_tmp_{name}.tmp"
            tmp.write_text("\n".join(lines) + "\n", encoding="utf-8")
            os.rename(tmp, self.relay_dir / name)  # atomic publish
            self._seq += 1
        self._save_state(src, emitted_off)

    def _run(self) -> None:
        current: Path | None = None
        f = None
        ino = -1
        pos = 0
        buf = b""  # binary mode throughout: state offsets are byte-exact

        def open_at(path: Path, offset: int):
            nonlocal f, ino, pos, buf, current
            if f is not None:
                try:
                    f.close()
                except OSError:
                    pass
            f = open(path, "rb")
            if offset < 0:
                f.seek(0, os.SEEK_END)
            else:
                f.seek(offset)
            ino = os.fstat(f.fileno()).st_ino
            pos = f.tell()
            buf = b""
            current = path

        def lines_of(data: bytes) -> list[str]:
            # data always ends at a line boundary, so utf-8 decode is safe
            # (multibyte sequences never span a newline)
            return [
                ln
                for ln in data.decode("utf-8", errors="replace").split("\n")
                if ln.strip()
            ]

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
                state = self._load_state()
                for p in _iter_hour_files(self.root):
                    if self._stop.is_set():
                        return
                    start_off = 0
                    if state is not None:
                        if self._key(p) < state[0]:
                            continue  # fully relayed by a previous run
                        if self._key(p) == state[0]:
                            start_off = state[1]
                    if p == latest:
                        # emit nothing yet: the tail loop reads from
                        # start_off and CONTINUES — no gap, no overlap
                        open_at(p, start_off)
                    else:
                        with open(p, "rb") as g:
                            g.seek(start_off)
                            data = g.read()
                            end_off = g.tell()
                        self._emit(lines_of(data), p, end_off)
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
                        self._emit(lines_of(buf), current, pos)
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
                complete, _, buf = buf.rpartition(b"\n")
                # state records the offset of the last emitted COMPLETE
                # line; the partial tail in `buf` re-reads after a restart
                self._emit(lines_of(complete), current, pos - len(buf))
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
