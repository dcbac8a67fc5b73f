from svoe_spark.api.stream_api import StreamingContext  # noqa: F401
