from svoe_spark.operators.asof import asof_join, asof_join_multi, lookahead_shift  # noqa: F401
