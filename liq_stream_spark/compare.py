"""Order-insensitive result canonicalization shared by the local oracle
gate (tests/test_oracle.py) and the ``tools drive`` subcommand.

Floats are compared to 10 significant digits (``%.9e`` prints one leading
digit plus 9 fractional — ADVICE r5 doc fix): per-row double arithmetic is
IEEE-identical across engines and multi-row sums go through exact decimal
accumulation (plans/tables.dsum), so anything looser than ~1e-9 relative
indicates a real bug, not float noise. Keeping this in ONE place means the
CLI driver and the pytest gate can never silently diverge on what "equal"
means.
"""

from __future__ import annotations

import datetime as dt
import math


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9e}"
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return repr(v)


def frame_repr(cols, rows):
    """Column-name-sorted, row-sorted canonical form of a result set."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    body = sorted(tuple(canon(r[i]) for i in order) for r in rows)
    return names, body
