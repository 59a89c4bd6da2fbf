from smatchpp_spark.streaming.events import (  # noqa: F401
    stream_minute_rollup,
    stream_sessionize,
)
