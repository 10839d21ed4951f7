from liq_stream_spark.sources.replay import read_jsonl_frames, read_jsonl_frames_stream
from liq_stream_spark.sources.hl_files import read_hl_hourly, read_hl_hourly_stream

__all__ = [
    "read_jsonl_frames",
    "read_jsonl_frames_stream",
    "read_hl_hourly",
    "read_hl_hourly_stream",
]
