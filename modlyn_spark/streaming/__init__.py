from modlyn_spark.streaming.sessions import (  # noqa: F401
    stream_session_stats,
    streaming_session_query,
)
