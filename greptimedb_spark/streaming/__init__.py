from greptimedb_spark.streaming.flow import FlowEngine, Flow  # noqa: F401
