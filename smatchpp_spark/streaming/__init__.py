from smatchpp_spark.streaming.dedup import stream_dedup_exact  # noqa: F401
from smatchpp_spark.streaming.degrees import stream_degrees  # noqa: F401
from smatchpp_spark.streaming.events import (  # noqa: F401
    stream_minute_rollup,
    stream_sessionize,
)
