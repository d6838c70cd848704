from aoseventstreamer_spark.functions import subjects

__all__ = ["subjects"]
