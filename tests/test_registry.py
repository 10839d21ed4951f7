"""Registry / verification-priority invariants (plans/priority.py) and
doc-drift gates for the generated artifacts."""

from pathlib import Path

from liq_stream_spark.plans import REGISTRY
from liq_stream_spark.plans.priority import (
    CHANGED_SINCE_GREEN,
    verification_order,
)
from liq_stream_spark.tools import (
    _LEDGER_BEGIN,
    _LEDGER_END,
    green_ledger,
    ledger_md,
    queries_md,
)

ROOT = Path(__file__).resolve().parents[1]


def test_verification_order_is_a_permutation_of_the_registry():
    order = verification_order()
    assert sorted(order) == sorted(REGISTRY)
    assert len(set(order)) == len(order)


def test_changed_since_green_goes_first():
    order = verification_order()
    assert order[: len(CHANGED_SINCE_GREEN)] == CHANGED_SINCE_GREEN
    # every listed query must exist (verification_order raises otherwise,
    # but assert the registry side too so a rename fails in BOTH places)
    assert all(n in REGISTRY for n in CHANGED_SINCE_GREEN)


def test_stalest_signal_orders_before_fresher():
    """After the changed tier: never-sampled entries precede sampled
    ones, and an entry green in r2 precedes one green in r3."""
    ledger = green_ledger()
    order = verification_order()
    rest = order[len(CHANGED_SINCE_GREEN) :]
    rounds = [ledger[n]["round"] if n in ledger else -1 for n in rest]
    assert rounds == sorted(rounds)


def test_registry_iteration_order_is_registration_order():
    """The library registry must NOT be priority-ordered (ADVICE r3):
    the first registered module is relational.py, so q01 leads."""
    assert next(iter(REGISTRY)) == "q01_pricing_summary"


def test_queries_md_in_sync():
    assert (ROOT / "QUERIES.md").read_text() == queries_md(), (
        "QUERIES.md drifted — run python -m liq_stream_spark.tools"
    )


def test_coverage_green_ledger_in_sync():
    text = (ROOT / "COVERAGE.md").read_text()
    assert _LEDGER_BEGIN in text and _LEDGER_END in text
    current = text.split(_LEDGER_BEGIN)[1].split(_LEDGER_END)[0].strip()
    assert current == ledger_md().strip(), (
        "COVERAGE.md green ledger drifted — run "
        "python -m liq_stream_spark.tools ledger"
    )


def test_coverage_ledger_covers_every_correctness_artifact():
    """The r4 failure mode, gated explicitly: a CORRECTNESS_r*.json that
    landed AFTER the last ledger regeneration means the committed ledger
    was built from a strict subset of the artifacts on disk. The ledger
    embeds its source list ('Built from: ...'); every artifact at the
    repo root must appear in it."""
    from liq_stream_spark.tools import correctness_artifacts

    text = (ROOT / "COVERAGE.md").read_text()
    block = text.split(_LEDGER_BEGIN)[1].split(_LEDGER_END)[0]
    missing = [a for a in correctness_artifacts() if f"`{a}`" not in block]
    assert not missing, (
        f"COVERAGE.md ledger predates driver artifacts {missing} — run "
        "python -m liq_stream_spark.tools ledger (and reset "
        "CHANGED_SINCE_GREEN for the new round)"
    )


def test_green_ledger_classification(tmp_path):
    """A FAILED oracle comparison (matches false, err null) must NOT
    register as a verification signal — it would sort the failing query
    LAST in the harness priority order exactly when it most needs
    re-verification. Only full green or the explicit no_oracle marker
    count."""
    import json

    from liq_stream_spark.tools import green_ledger

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "good": {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "spark_rows": 5,
                    "err": None,
                },
                "rowsonly": {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": 5,
                    "err": "no_oracle",
                },
                "mismatch": {
                    "rows_match": False,
                    "schema_match": True,
                    "hash_match": False,
                    "spark_rows": 5,
                    "err": None,
                },
                "errored": {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": None,
                    "err": "boom",
                },
            }
        )
    )
    assert green_ledger(root=str(tmp_path)) == {
        "good": {"round": 1, "kind": "green"},
        "rowsonly": {"round": 1, "kind": "rows-only"},
    }
