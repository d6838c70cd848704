from aoseventstreamer_spark.sources.io import (
    read_batch,
    read_stream,
    write_batch,
    write_stream,
)

__all__ = ["read_batch", "read_stream", "write_batch", "write_stream"]
