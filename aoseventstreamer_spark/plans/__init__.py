from aoseventstreamer_spark.plans.inspect import (
    broadcast_join_count,
    formatted_plan,
    has_pushed_filter,
    shuffle_count,
    strip_cached_children,
)

__all__ = [
    "formatted_plan",
    "has_pushed_filter",
    "shuffle_count",
    "broadcast_join_count",
    "strip_cached_children",
]
