from liq_stream_spark.streaming.pipeline import (
    resolve_streams,
    stream_venue,
    run_pipeline,
    dedup_within_watermark,
    hl_dedup_within_watermark,
)

__all__ = [
    "resolve_streams",
    "stream_venue",
    "run_pipeline",
    "dedup_within_watermark",
    "hl_dedup_within_watermark",
]
