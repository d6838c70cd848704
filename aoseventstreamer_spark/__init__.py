"""aoseventstreamer_spark — a PySpark-native analytics engine with the
capabilities of ArunaStorage/AOSEventStreamer, rebuilt Spark-first.

The reference (read at /root/reference/) is an event-streaming bridge:
a gRPC ingest API fans resource-change events out onto a hierarchical
routing key ("subject") in NATS JetStream, and durable filtered
consumers ("stream groups") deliver matching events in acknowledged
chunks. This package re-expresses that model on Spark:

- the event log is a (streaming or batch) DataFrame / Parquet table,
- subject construction & fan-out are Catalyst column expressions
  (``functions.subjects``, ``operators.routing``),
- a stream group is a filtered streaming query with a checkpoint
  (``streaming.groups``),
- the relational / LLM-pipeline query surface lives in ``queries``.
"""

from aoseventstreamer_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
