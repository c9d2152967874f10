"""Structured Streaming surface (SURVEY.md §2 B47-B54).

The reference IS a streaming pipeline — a 15 s poll loop with a
confirmation-lag watermark and a cursor checkpoint (ref main.py:26, 32,
197-219). These modules are the Spark-native forms: event-time windows,
watermarked dedup, stream-static enrichment, foreachBatch dual sink, and
an arbitrary-stateful cursor operator.
"""

from bigquery_etl_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from bigquery_etl_spark.streaming.dedup import watermarked_dedup
from bigquery_etl_spark.streaming.pipeline_stream import start_stream_pipeline

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "start_stream_pipeline",
    "tumbling_window_agg",
    "watermarked_dedup",
]
