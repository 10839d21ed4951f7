"""LLM-data-pipeline operator queries (dedup / similarity / text analysis)
over the documents and embeddings tables — populated alongside
liq_stream_spark.operators.{dedup,similarity,text}."""

from __future__ import annotations
