"""K4/K5 against a REAL PostgreSQL server (round 10).

The container gained PostgreSQL 15 binaries (initdb/pg_ctl/psql), so the
sink's statement sequences — previously verified only as strings — now
execute against a live server: the DDL bootstrap (table + the two
reference indexes, writer_pg.py:38-57), its idempotence, and the
exactly-once epoch claim+promote (a replayed epoch promotes ZERO rows).

Scope note: the JDBC transport (``df.write.format("jdbc")`` in
sinks.write_jdbc / write_jdbc_idempotent) still cannot run — the
container has no PostgreSQL JDBC driver jar — so its SQL semantics are
verified statement-level here. The COPY transport
(sinks.write_pg_copy) needs no JDBC jar and IS exercised end to end
below: real Spark DataFrames and a real foreachBatch stream land rows
in the live server through per-partition ``COPY FROM STDIN``. The
server must run as a non-root user; we re-use the image's ``postgres``
account for the daemon only (psql connects as root over the trusted
socket).
"""

import os
import shutil
import subprocess
import tempfile

import pytest

from liq_stream_spark.sinks import (
    bootstrap_statements,
    idempotent_statements,
)

COLUMNS = [
    "exchange", "market", "symbol", "side", "qty", "price", "notional",
    "ts_exch_ms", "ts_ingest_ms", "raw",
]


def _as_postgres(cmd: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        ["su", "postgres", "-s", "/bin/bash", "-c", cmd],
        cwd="/tmp",
        capture_output=True,
        text=True,
    )


@pytest.fixture(scope="module")
def pg():
    """Throwaway cluster: initdb + pg_ctl on a unix socket under a short
    mkdtemp (socket paths cap at ~107 bytes — pytest tmp dirs can blow
    it). Yields a run(sql) helper; always stops the daemon on teardown."""
    for tool in ("initdb", "pg_ctl", "psql"):
        if shutil.which(tool) is None:
            pytest.skip(f"{tool} not in PATH — no PostgreSQL in container")
    if _as_postgres("true").returncode != 0:
        pytest.skip("cannot run the PG daemon as a non-root user")
    root = tempfile.mkdtemp(prefix="liqpg_")
    os.chmod(root, 0o777)
    data = f"{root}/data"
    started = False
    try:
        r = _as_postgres(f"initdb -D {data} -A trust -U postgres")
        if r.returncode != 0:
            pytest.skip(f"initdb failed: {r.stderr[-300:]}")
        r = _as_postgres(
            f"pg_ctl -D {data} -w -o \"-k {root} -c listen_addresses=''\" "
            f"-l {root}/log start"
        )
        if r.returncode != 0:
            pytest.skip(f"pg_ctl start failed: {r.stderr[-300:]}")
        started = True

        def run(sql: str) -> str:
            p = subprocess.run(
                [
                    "psql", "-h", root, "-U", "postgres", "-d", "postgres",
                    "-v", "ON_ERROR_STOP=1", "-X", "-A", "-t", "-c", sql,
                ],
                cwd="/tmp",
                capture_output=True,
                text=True,
            )
            assert p.returncode == 0, f"psql failed on {sql!r}: {p.stderr}"
            return p.stdout.strip()

        # libpq conninfo for the COPY-transport tests (socket dir as host)
        run.conninfo = f"host={root} user=postgres dbname=postgres"
        yield run
    finally:
        if started:
            _as_postgres(f"pg_ctl -D {data} -m immediate stop")
        shutil.rmtree(root, ignore_errors=True)


def test_bootstrap_ddl_executes_and_is_idempotent(pg):
    """K5 (writer_pg.py:23-57,124-136): the bootstrap creates the table
    and BOTH reference indexes on a real server, and a re-run is a
    clean no-op (the reference guards the same way)."""
    for _ in range(2):  # idempotence: second pass must not error
        for sql in bootstrap_statements("liquidations"):
            pg(sql)
    assert pg(
        "SELECT count(*) FROM pg_tables WHERE tablename = 'liquidations'"
    ) == "1"
    idx = pg(
        "SELECT indexname FROM pg_indexes WHERE tablename = 'liquidations' "
        "ORDER BY indexname"
    ).splitlines()
    assert idx == ["liquidations_sym_ts_idx", "liquidations_ts_idx"]
    # the DDL's column types accept a real normalized row, values intact
    pg(
        "INSERT INTO liquidations VALUES ('binance', 'usdt', 'BTCUSDT', "
        "'long', 0.014, 42000.5, 588.007, 1716000000123, 1716000000456, "
        "'{\"o\":{\"s\":\"BTCUSDT\"}}')"
    )
    row = pg(
        "SELECT exchange, qty, price, ts_exch_ms, raw FROM liquidations"
    )
    assert row == (
        'binance|0.014|42000.5|1716000000123|{"o":{"s":"BTCUSDT"}}'
    )


def test_bootstrap_handles_schema_qualified_tables(pg):
    """The index-existence probe splits schema-qualified names like the
    reference (writer_pg.py:129-130) — indexes land in the right schema
    and the re-run stays a no-op."""
    pg("CREATE SCHEMA IF NOT EXISTS liq")
    for _ in range(2):
        for sql in bootstrap_statements("liq.liquidations"):
            pg(sql)
    got = pg(
        "SELECT schemaname, indexname FROM pg_indexes "
        "WHERE tablename = 'liquidations' AND schemaname = 'liq' "
        "ORDER BY indexname"
    ).splitlines()
    assert got == ["liq|liquidations_sym_ts_idx", "liq|liquidations_ts_idx"]


def test_epoch_promotion_is_exactly_once(pg):
    """K4's exactly-once ledger on a real server: the claim+promote CTE
    promotes an epoch's staged rows exactly once — a replay (staging
    refilled, statements re-run) inserts ZERO rows; a new epoch appends."""
    for sql in bootstrap_statements("liq_eo"):
        pg(sql)
    cols = ", ".join(COLUMNS)

    def stage(epoch: int, n: int):
        staging = f"liq_eo_stage_{epoch}"
        pg(f"DROP TABLE IF EXISTS {staging}")
        pg(f"CREATE TABLE {staging} (LIKE liq_eo)")
        for i in range(n):
            pg(
                f"INSERT INTO {staging} VALUES ('okx', 'usdt', 'ETH-USDT', "
                f"'short', 1.5, 3000.0, 4500.0, {1716000000000 + i}, "
                f"{1716000001000 + i}, 'r{epoch}-{i}')"
            )
        return staging

    staging = stage(7, 3)
    stmts = idempotent_statements("liq_eo", staging, 7, COLUMNS)
    for sql in stmts:
        pg(sql)
    assert pg("SELECT count(*) FROM liq_eo") == "3"
    # replay: crash between promote and checkpoint commit re-runs the
    # whole epoch — staging refilled, statements re-executed, 0 new rows
    stage(7, 3)
    for sql in idempotent_statements("liq_eo", staging, 7, COLUMNS):
        pg(sql)
    assert pg("SELECT count(*) FROM liq_eo") == "3"
    # a NEW epoch promotes normally
    staging8 = stage(8, 2)
    for sql in idempotent_statements("liq_eo", staging8, 8, COLUMNS):
        pg(sql)
    assert pg("SELECT count(*) FROM liq_eo") == "5"
    assert pg(
        "SELECT epoch_id FROM liq_eo_epochs ORDER BY epoch_id"
    ).splitlines() == ["7", "8"]
    # the ledger records the claim even for an EMPTY epoch (zero staged
    # rows): the claim CTE inserts regardless, so a later replay of the
    # same empty epoch stays a no-op
    staging9 = stage(9, 0)
    for sql in idempotent_statements("liq_eo", staging9, 9, COLUMNS):
        pg(sql)
    assert pg("SELECT count(*) FROM liq_eo") == "5"
    assert pg("SELECT count(*) FROM liq_eo_epochs") == "3"


# --- the Spark-side COPY transport: a REAL Spark -> PostgreSQL data path ---

ROW_SCHEMA = (
    "exchange string, market string, symbol string, side string, "
    "qty double, price double, notional double, ts_exch_ms long, "
    "ts_ingest_ms long, raw string"
)


def _mk_rows(epoch: int, n: int):
    return [
        (
            "binance", "usdt", f"SYM{i}USDT", "long" if i % 2 else "short",
            float(i) + 0.25, 100.0 + i, (float(i) + 0.25) * (100.0 + i),
            1716000000000 + epoch * 1000 + i, 1716000001000 + i,
            f"r{epoch}-{i}",
        )
        for i in range(n)
    ]


def test_write_pg_copy_is_exactly_once_end_to_end(pg, spark):
    """K4 over the COPY transport, end to end from a Spark DataFrame: a
    4-partition parallel COPY lands every row; a replayed epoch promotes
    ZERO new rows; a new epoch appends; the per-epoch staging table is
    dropped after promotion."""
    from liq_stream_spark.sinks import ensure_table_psql, write_pg_copy

    ensure_table_psql(pg.conninfo, "liq_copy")
    df = spark.createDataFrame(_mk_rows(1, 37), ROW_SCHEMA).repartition(4)

    staged = write_pg_copy(df, 1, pg.conninfo, "liq_copy")
    assert staged == 37
    assert pg("SELECT count(*) FROM liq_copy") == "37"
    # replay (crash between promote and checkpoint commit): same epoch,
    # staging refilled, zero rows promoted
    assert write_pg_copy(df, 1, pg.conninfo, "liq_copy") == 37
    assert pg("SELECT count(*) FROM liq_copy") == "37"
    # a new epoch appends
    df2 = spark.createDataFrame(_mk_rows(2, 5), ROW_SCHEMA)
    write_pg_copy(df2, 2, pg.conninfo, "liq_copy")
    assert pg("SELECT count(*) FROM liq_copy") == "42"
    assert pg(
        "SELECT epoch_id FROM liq_copy_epochs ORDER BY epoch_id"
    ).splitlines() == ["1", "2"]
    assert pg(
        "SELECT count(*) FROM pg_tables WHERE tablename LIKE 'liq_copy_stage%'"
    ) == "0"
    # values round-trip: pick one row and compare every column
    got = pg(
        "SELECT exchange, market, symbol, side, qty, price, notional, "
        "ts_exch_ms, ts_ingest_ms, raw FROM liq_copy WHERE raw = 'r1-3'"
    )
    assert got == (
        "binance|usdt|SYM3USDT|long|3.25|103|334.75|1716000001003|"
        "1716000001003|r1-3"
    )


def test_write_pg_copy_null_and_quoting_fidelity(pg, spark):
    """The CSV framing preserves the hard cases distinctly: NULL vs empty
    string vs whitespace, NaN doubles, and delimiter/quote/newline bytes
    inside text values (the raw column carries arbitrary exchange JSON)."""
    from liq_stream_spark.sinks import ensure_table_psql, write_pg_copy

    ensure_table_psql(pg.conninfo, "liq_tricky")
    rows = [
        ("okx", "usdt", "A", None, None, 1.0, None, 1, 1, None),
        ("okx", "usdt", "B", "", float("nan"), 2.0, 0.0, 2, 2, ""),
        ("okx", "usdt", "C", "long", 3.0, 3.0, 9.0, 3, 3,
         '{"a":"x,y","b":"q\\"uote","c":"line\nbreak"}'),
        ("okx", "usdt", "D", "short", 4.0, 4.0, 16.0, 4, 4, "\\."),
    ]
    df = spark.createDataFrame(rows, ROW_SCHEMA)
    assert write_pg_copy(df, 9, pg.conninfo, "liq_tricky") == 4
    assert pg("SELECT count(*) FROM liq_tricky") == "4"
    assert pg("SELECT side IS NULL, raw IS NULL FROM liq_tricky "
              "WHERE symbol = 'A'") == "t|t"
    assert pg("SELECT side = '', raw = '', qty = 'NaN'::float8 "
              "FROM liq_tricky WHERE symbol = 'B'") == "t|t|t"
    assert pg("SELECT raw FROM liq_tricky WHERE symbol = 'C'") == rows[2][9]
    assert pg("SELECT raw FROM liq_tricky WHERE symbol = 'D'") == "\\."


def test_pg_copy_sink_under_real_streaming(pg, spark, tmp_path):
    """The fan-out sink drives the COPY transport from a genuine
    Structured Streaming foreachBatch (file source, availableNow): every
    source row lands in PostgreSQL exactly once and the epoch ledger
    records the stream's real epoch ids."""
    import json

    from liq_stream_spark.sinks import (
        FanOutConfig, ensure_table_psql, fan_out,
    )

    ensure_table_psql(pg.conninfo, "liq_streamed")
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "batch.jsonl", "w") as f:
        for r in _mk_rows(0, 11):
            cols = ("exchange market symbol side qty price notional "
                    "ts_exch_ms ts_ingest_ms raw").split()
            f.write(json.dumps(dict(zip(cols, r))) + "\n")

    sink = FanOutConfig(
        jdbc_url=pg.conninfo, jdbc_table="liq_streamed", pg_transport="copy"
    )
    stream = (
        spark.readStream.schema(ROW_SCHEMA).json(str(src))
        .writeStream.foreachBatch(fan_out(sink))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    stream.awaitTermination(120)
    assert pg("SELECT count(*) FROM liq_streamed") == "11"
    assert int(pg("SELECT count(*) FROM liq_streamed_epochs")) >= 1


def test_pg_column_ddl_rejects_unmapped_types(spark):
    """The COPY transport is for flat scalar sink schemas: a column with
    no PostgreSQL mapping raises a clear pre-write error (never an
    opaque COPY parse failure mid-job)."""
    from liq_stream_spark.sinks import _pg_column_ddl

    df = spark.createDataFrame([(1, [1.0])], "a long, v array<double>")
    with pytest.raises(ValueError, match="no COPY-transport"):
        _pg_column_ddl(df)
    ddl = _pg_column_ddl(df.select("a"))
    assert ddl == "a BIGINT"


def test_cli_rejects_pg_transport_env_typo(monkeypatch):
    """argparse skips choices validation on env-supplied defaults — a
    PG_TRANSPORT typo must die loudly, not hand a libpq conninfo to the
    JDBC writer."""
    from liq_stream_spark.cli import main

    monkeypatch.setenv("PG_TRANSPORT", "COPY")  # case matters: not 'copy'
    with pytest.raises(SystemExit, match="PG_TRANSPORT"):
        main([
            "--streams", "binance:usdt", "--sink", "pg",
            "--pg-dsn", "host=/nowhere user=postgres",
        ])


def test_pg_copy_kill_restart_exactly_once(pg, spark, tmp_path):
    """The worst-case streaming crash window against a REAL database
    (same simulation as tests/test_streaming_volume.py): epochs land in
    PostgreSQL via COPY, then the newest checkpoint commit record is
    lost AFTER the sink write — the classic at-least-once hazard — and
    the restarted stream replays that epoch with the SAME id. The
    ledger must promote zero rows for the replay: every source row
    lands exactly once, and the replayed epoch is claimed exactly once."""
    import json
    import time

    from liq_stream_spark.sinks import (
        FanOutConfig, ensure_table_psql, fan_out,
    )

    ensure_table_psql(pg.conninfo, "liq_eo_stream")
    src = tmp_path / "src"
    src.mkdir()
    n_files, rows = 12, 50
    cols = ("exchange market symbol side qty price notional ts_exch_ms "
            "ts_ingest_ms raw").split()
    n = 0
    for f in range(n_files):
        with open(src / f"b_{f:03d}.jsonl", "w") as fh:
            for _ in range(rows):
                r = ("binance", "usdt", f"S{n}", "long", 1.0, 2.0, 2.0,
                     n, n, f"r{n}")
                fh.write(json.dumps(dict(zip(cols, r))) + "\n")
                n += 1
    total = n_files * rows
    sink = FanOutConfig(
        jdbc_url=pg.conninfo, jdbc_table="liq_eo_stream",
        pg_transport="copy",
    )
    ckpt = tmp_path / "ckpt"

    def start():
        return (
            spark.readStream.schema(ROW_SCHEMA)
            .option("maxFilesPerTrigger", 2)
            .json(str(src))
            .writeStream.foreachBatch(fan_out(sink))
            .option("checkpointLocation", str(ckpt))
            .trigger(processingTime="0.1 seconds")
            .start()
        )

    q = start()
    commits = ckpt / "commits"
    try:
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if commits.exists() and len(list(commits.glob("[0-9]*"))) >= 3:
                break
            time.sleep(0.1)
        else:
            raise AssertionError("no epochs committed within 120 s")
    finally:
        q.stop()
    committed = sorted(
        int(p.name) for p in commits.glob("[0-9]*") if p.name.isdigit()
    )
    assert committed, "expected committed epochs before the kill"
    replayed = committed[-1]
    (commits / str(replayed)).unlink()
    crc = commits / f".{replayed}.crc"
    if crc.exists():
        crc.unlink()
    assert int(pg("SELECT count(*) FROM liq_eo_stream")) > 0, (
        "kill happened before any sink write"
    )

    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert pg("SELECT count(*) FROM liq_eo_stream") == str(total)
    assert pg("SELECT count(DISTINCT raw) FROM liq_eo_stream") == str(total)
    assert pg(
        "SELECT count(*) FROM liq_eo_stream_epochs "
        f"WHERE epoch_id = {replayed}"
    ) == "1"


def test_write_pg_copy_aborts_promote_on_truncated_staging(
    pg, spark, monkeypatch
):
    """ADVICE r10 (medium): the staging table is UNLOGGED, and PostgreSQL
    crash recovery TRUNCATES unlogged tables — a server crash between
    the COPY jobs and the promote would otherwise claim the epoch over
    an emptied staging table and silently lose the batch. The promote
    transaction now verifies the staged count first: simulate the
    truncation right before the promote and the write must FAIL with
    the epoch unclaimed (so the stream replays it); the replay then
    promotes every row exactly once."""
    from liq_stream_spark import sinks

    sinks.ensure_table_psql(pg.conninfo, "liq_crash")
    df = spark.createDataFrame(_mk_rows(5, 9), ROW_SCHEMA).repartition(2)
    real = sinks._psql_script

    def truncating(conninfo, script, single_txn=False):
        if "liq_crash_epochs" in script:  # the promote script only
            pg("TRUNCATE liq_crash_stage_5")
        return real(conninfo, script, single_txn)

    monkeypatch.setattr(sinks, "_psql_script", truncating)
    with pytest.raises(RuntimeError, match="lost rows"):
        sinks.write_pg_copy(df, 5, pg.conninfo, "liq_crash")
    # the guard aborted BEFORE the claim: no promoted rows, no ledger
    # entry (the ledger DDL was in the same aborted transaction)
    assert pg("SELECT count(*) FROM liq_crash") == "0"
    assert pg("SELECT to_regclass('liq_crash_epochs') IS NULL") == "t"
    monkeypatch.setattr(sinks, "_psql_script", real)
    assert sinks.write_pg_copy(df, 5, pg.conninfo, "liq_crash") == 9
    assert pg("SELECT count(*) FROM liq_crash") == "9"
    assert pg("SELECT epoch_id FROM liq_crash_epochs") == "5"


def _psql_major() -> int:
    import re as _re
    import subprocess as _sp

    out = _sp.run(
        ["psql", "--version"], capture_output=True, text=True
    ).stdout
    return int(_re.search(r"(\d+)\.", out).group(1))


def test_write_pg_copy_lone_backslash_dot_line_in_quoted_field(pg, spark):
    """ADVICE r10: psql < 16 scans COPY input for a line consisting
    solely of '\\.' even inside a quoted CSV field. The failure mode is
    what matters: on psql 15 the partition's COPY dies LOUDLY
    ('unterminated CSV quoted field') before any claim — exactly-once
    is preserved, nothing is silently truncated (measured; the
    write_pg_copy docstring documents psql >= 16 as the requirement
    for ingesting such values). On psql >= 16 the value round-trips."""
    from liq_stream_spark.sinks import ensure_table_psql, write_pg_copy

    ensure_table_psql(pg.conninfo, "liq_dotline")
    tricky = "line\n\\.\nmore"
    rows = [("okx", "usdt", "E", "long", 1.0, 1.0, 1.0, 1, 1, tricky)]
    df = spark.createDataFrame(rows, ROW_SCHEMA)
    if _psql_major() >= 16:
        assert write_pg_copy(df, 1, pg.conninfo, "liq_dotline") == 1
        assert pg("SELECT raw FROM liq_dotline") == tricky
        return
    # the executor-side RuntimeError surfaces driver-side wrapped in a
    # PythonException — match the message, not the Python type
    with pytest.raises(Exception, match="unterminated CSV quoted"):
        write_pg_copy(df, 1, pg.conninfo, "liq_dotline")
    # loud, not lossy: nothing promoted, no epoch claimed
    assert pg("SELECT count(*) FROM liq_dotline") == "0"
    assert pg("SELECT to_regclass('liq_dotline_epochs') IS NULL") == "t"


def test_sink_table_names_are_validated(pg, spark):
    """ADVICE r10: table/staging names are interpolated unquoted into
    psql scripts and JDBC statements — every sink entry point refuses
    anything but a plain (optionally schema-qualified) lower-case
    identifier before any SQL is built."""
    from liq_stream_spark.sinks import (
        bootstrap_statements, write_jdbc_idempotent, write_pg_copy,
    )

    df = spark.createDataFrame(_mk_rows(1, 1), ROW_SCHEMA)
    for bad in (
        'liq"; DROP TABLE x; --',
        "Liquidations",          # folds differently once quoted
        "liq table",
        "liq.s.t",
        "1liq",
        "",
    ):
        with pytest.raises(ValueError, match="identifier"):
            bootstrap_statements(bad)
        with pytest.raises(ValueError, match="identifier"):
            write_pg_copy(df, 1, pg.conninfo, bad)
        with pytest.raises(ValueError, match="identifier"):
            write_jdbc_idempotent(df, 1, "jdbc:postgresql:none", bad)
    # schema-qualified lower-case names stay accepted
    assert bootstrap_statements("liq.liquidations")
