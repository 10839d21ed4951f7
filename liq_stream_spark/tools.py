"""Repo tooling: generate QUERIES.md from the query registry.

Run ``python -m liq_stream_spark.tools`` after adding queries so the
reference doc never drifts from the registry (the registry is the source
of truth the driver executes).
"""

from __future__ import annotations


def queries_md() -> str:
    from liq_stream_spark.plans import REGISTRY

    lines = [
        "# Query reference",
        "",
        "Generated from `liq_stream_spark.plans.REGISTRY` by "
        "`python -m liq_stream_spark.tools` — do not edit by hand.",
        "",
        f"{len(REGISTRY)} registered; "
        f"{sum(1 for q in REGISTRY.values() if q.oracle)} DuckDB-oracled "
        "(value-hash gate), the rest rows-only with test-level gates "
        "noted in the description.",
        "",
        "| query | gate | what it does |",
        "|---|---|---|",
    ]
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        gate = "oracle" if q.oracle else "rows-only"
        doc = " ".join((q.doc or "").split())
        lines.append(f"| `{name}` | {gate} | {doc} |")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    from pathlib import Path

    out = Path(__file__).resolve().parents[1] / "QUERIES.md"
    out.write_text(queries_md())
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
