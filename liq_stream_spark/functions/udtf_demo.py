"""Python UDTF (user-defined table function) — the UDF/UDAF/UDTF framework
surface (SURVEY.md §2.8 lists it as absent from the reference; Spark
provides all three natively, this module demonstrates the table-function
arm, the least common one).

``FrameExplode`` turns one raw websocket frame (which may be a JSON array
of events or a single object) into one row per event — the N1 flatten as a
SQL-callable table function:

    spark.udtf.register("frame_explode", FrameExplode)
    spark.sql("SELECT fe.* FROM frames, LATERAL frame_explode(value) fe")

This is a demonstration of the extension point, not the production path —
the normalizers do this flatten with from_json + explode (JVM-side,
codegen'd), which is strictly faster. A UDTF earns its keep when the
per-row expansion needs real Python (stateful parsers, third-party
libraries)."""

from __future__ import annotations

import json


class FrameExplode:
    """UDTF: (frame: str) -> rows of (event_json: str, idx: int)."""

    def eval(self, frame: str):  # noqa: D401
        if frame is None:
            return
        try:
            payload = json.loads(frame)
        except (ValueError, TypeError):
            return  # malformed frames contribute no rows (F5)
        events = payload if isinstance(payload, list) else [payload]
        for i, ev in enumerate(events):
            if isinstance(ev, dict):
                yield json.dumps(ev, separators=(",", ":")), i


def register_udtfs(spark) -> None:
    from pyspark.sql.functions import udtf

    spark.udtf.register(
        "frame_explode",
        udtf(FrameExplode, returnType="event_json string, idx int"),
    )
