"""CLI mirroring the reference's argparse surface (stream.py:15-44).

Live mode consumes the websocket Python Data Sources (requires the
``websockets`` package); replay mode (--replay-root) streams JSONL frame
files dropped into per-venue dirs — the dev path that works without
network and exercises the identical normalize/dedup/sink plan.

Replay layout: ``{replay_root}/{exchange}`` for single-market venues, or
``{replay_root}/{exchange}_{market}`` when one venue streams under two
markets (each stream needs its own frame directory — the wire frames
don't carry which endpoint they came from).

  python -m liq_stream_spark.cli --all --sink csv --outdir ./out \\
      --replay-root ./replay
"""

from __future__ import annotations

import argparse
import os

from liq_stream_spark.session import get_spark
from liq_stream_spark.sinks import FanOutConfig
from liq_stream_spark.streaming.pipeline import resolve_streams, run_pipeline


def parse_args(argv=None):
    p = argparse.ArgumentParser("liq-stream-spark")
    # stream selection (S9)
    p.add_argument("--all", action="store_true")
    p.add_argument("--streams", help="ex:mk,ex:mk,…")
    p.add_argument("--exchange")
    p.add_argument("--market", default="usdt")
    # sinks (K1)
    p.add_argument("--sink", choices=["csv", "pg", "both", "parquet"],
                   default="parquet")
    p.add_argument("--no-write", action="store_true")
    p.add_argument("--parquet-exactly-once", action="store_true",
                   help="epoch-partitioned dynamic-overwrite parquet: a "
                   "replayed micro-batch overwrites its own epoch_id= "
                   "partition instead of appending duplicates; fold the "
                   "epoch level away with store.compact_store")
    p.add_argument("--no-color", action="store_true")
    p.add_argument("--dashboard", action="store_true",
                   help="also run the 6-hour windowed dashboard (reference "
                   "CHANGELOG's awk dashboards) as a live console stream; "
                   "in live WS mode this opens a second socket per venue — "
                   "intended for replay/file sources")
    p.add_argument("--outdir", default="./out")
    # Postgres (K4) — env fallbacks as in the reference (stream.py:31-37)
    p.add_argument("--pg-dsn", default=os.environ.get("PG_DSN"))
    p.add_argument("--pg-table", default=os.environ.get("PG_TABLE", "liquidations"))
    p.add_argument("--pg-batch", type=int,
                   default=int(os.environ.get("PG_BATCH", "500")))
    p.add_argument("--pg-interval", type=float,
                   default=float(os.environ.get("PG_INTERVAL", "1.0")))
    p.add_argument("--pg-exactly-once", action="store_true",
                   help="per-epoch staging + ledger-claimed promotion: a "
                   "replayed micro-batch promotes zero rows")
    p.add_argument("--pg-transport", choices=["jdbc", "copy"],
                   default=os.environ.get("PG_TRANSPORT", "jdbc"),
                   help="jdbc: JVM JDBC writer (--pg-dsn is a jdbc: URL; "
                   "needs a PostgreSQL driver jar). copy: per-partition "
                   "COPY via psql (--pg-dsn is a libpq conninfo, e.g. "
                   "'host=/run/postgresql user=postgres dbname=liq'); "
                   "always exactly-once, bootstraps the table at startup")
    # bybit (S3/S4) — live websocket mode only
    p.add_argument("--subscribe-chunk", type=int, default=100)
    p.add_argument("--bybit-legacy", action="store_true",
                   help="subscribe legacy liquidation.<SYM> channels")
    # hyperliquid (S7/S8)
    p.add_argument("--hl-root",
                   default=os.environ.get("HL_HOURLY_ROOT",
                                          "~/hl/data/node_fills_streaming/hourly"))
    p.add_argument("--hl-min-sz", type=float, default=0.0)
    p.add_argument("--hl-tail-relay",
                   help="dir for the sub-hour tail relay: a driver-side "
                   "thread tails the newest hour file (0.15 s polls, "
                   "rollover + rotation checks) into append-only chunks "
                   "the stream reads — reference-latency S8")
    p.add_argument("--hl-no-catchup", action="store_true",
                   help="with --hl-tail-relay: skip backfilling existing "
                   "hour files, tail the newest from EOF only")
    # dev replay
    p.add_argument("--replay-root",
                   help="dir with per-venue JSONL frame subdirs — dev source")
    p.add_argument("--checkpoint", default="./checkpoint")
    p.add_argument("--hl-dedup-watermark", default="10 minutes",
                   help="state bound for the Hyperliquid tid dedup (ST1)")
    p.add_argument("--hl-dedup-ring", type=int, default=0,
                   help="use the reference's COUNT-bounded LRU dedup ring "
                   "of this many keys instead of the watermark (exact "
                   "hyperliquid_adapter ring parity; 50000 = reference)")
    p.add_argument("--hl-dedup-ring-shards", type=int, default=1,
                   help="shard the ring across N state groups (1 = the "
                   "reference's single sequential ring)")
    p.add_argument("--drain", action="store_true",
                   help="availableNow trigger: process the existing "
                   "backlog (only files NEW since the last checkpoint) "
                   "and exit — backfill/catch-up mode")
    p.add_argument("--rocksdb-state", action="store_true",
                   help="keep streaming state (watermark dedup, windowed "
                   "aggs) in the RocksDB state store instead of the "
                   "default in-JVM-heap HDFS-backed store — the config "
                   "for long-lived / high-cardinality state at scale")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    pairs = resolve_streams(args.all, args.streams, args.exchange, args.market)
    spark = get_spark(app_name="liq_stream_spark_cli")
    if args.rocksdb_state:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    sink = FanOutConfig(console=True, console_color=not args.no_color)
    if not args.no_write:
        if args.sink in ("csv", "both"):
            sink.csv_path = os.path.join(args.outdir, "csv")
        if args.sink == "parquet":
            sink.parquet_path = os.path.join(args.outdir, "parquet")
            sink.parquet_exactly_once = args.parquet_exactly_once
        if args.sink in ("pg", "both"):
            if not args.pg_dsn:
                raise SystemExit("--sink pg requires --pg-dsn / PG_DSN")
            if args.pg_transport not in ("jdbc", "copy"):
                # argparse validates flag values against choices but NOT
                # an env-supplied default — a PG_TRANSPORT typo must not
                # silently hand a libpq conninfo to the JDBC writer
                raise SystemExit(
                    f"PG_TRANSPORT={args.pg_transport!r} is not one of "
                    "jdbc|copy"
                )
            sink.jdbc_url = args.pg_dsn
            sink.jdbc_table = args.pg_table
            sink.jdbc_batch_size = args.pg_batch
            sink.jdbc_exactly_once = args.pg_exactly_once
            sink.pg_transport = args.pg_transport
            if args.pg_transport == "copy":
                from liq_stream_spark.sinks import ensure_table_psql

                ensure_table_psql(args.pg_dsn, args.pg_table)

    normalizer_kwargs: dict[str, dict] = {
        "hyperliquid": {"min_abs_sz": args.hl_min_sz},
    }
    if args.hl_tail_relay:
        normalizer_kwargs["hyperliquid"]["hl_tail_relay_dir"] = (
            os.path.expanduser(args.hl_tail_relay)
        )
        normalizer_kwargs["hyperliquid"]["hl_tail_catch_up"] = (
            not args.hl_no_catchup
        )
    if args.hl_dedup_ring:
        normalizer_kwargs["hyperliquid"]["hl_dedup_ring_size"] = (
            args.hl_dedup_ring
        )
        normalizer_kwargs["hyperliquid"]["hl_dedup_ring_shards"] = (
            args.hl_dedup_ring_shards
        )

    live = not args.replay_root
    source_dirs: dict[tuple[str, str], str] = {}
    if live:
        # websocket venues use the `websockets` package when installed,
        # else the vendored stdlib client (sources/miniws.py); Bybit REST
        # symbol discovery still needs `requests` unless --bybit-symbols
        normalizer_kwargs["bybit"] = {
            "ws_options": {
                "subscribe_chunk": str(args.subscribe_chunk),
                "use_all": "false" if args.bybit_legacy else "true",
            }
        }
        # Hyperliquid has no websocket feed — in live mode it tails the
        # node's hour files under --hl-root (use --hl-tail-relay for
        # sub-hour latency)
        for ex, mk in pairs:
            if ex == "hyperliquid":
                source_dirs[(ex, mk)] = os.path.expanduser(args.hl_root)
    else:
        multi_market = {
            ex for ex, _ in pairs
            if sum(1 for e, _ in pairs if e == ex) > 1
        }
        for ex, mk in pairs:
            if ex == "hyperliquid":
                source_dirs[(ex, mk)] = os.path.expanduser(args.hl_root)
            elif ex in multi_market:
                source_dirs[(ex, mk)] = os.path.join(
                    args.replay_root, f"{ex}_{mk}"
                )
            else:
                source_dirs[(ex, mk)] = os.path.join(args.replay_root, ex)

    query = run_pipeline(
        spark,
        pairs,
        source_dirs,
        sink,
        checkpoint_dir=args.checkpoint,
        trigger_seconds=args.pg_interval,
        live=live,
        hl_dedup_watermark=args.hl_dedup_watermark or None,
        normalizer_kwargs=normalizer_kwargs,
        dashboard_console=args.dashboard,
        available_now=args.drain,
    )
    try:
        query.awaitTermination()
    finally:
        # stop any HL tail-relay daemon threads with the query — they
        # poll and write chunk files every 0.15 s until told otherwise
        for relay in getattr(query, "_hl_relays", []):
            relay.stop()


if __name__ == "__main__":
    main()
