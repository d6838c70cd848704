from aoseventstreamer_spark.operators import routing

__all__ = ["routing"]
