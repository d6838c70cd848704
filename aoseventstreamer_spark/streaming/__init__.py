from aoseventstreamer_spark.streaming.groups import StreamGroupManager

__all__ = ["StreamGroupManager"]
