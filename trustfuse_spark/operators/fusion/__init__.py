from trustfuse_spark.operators.fusion.base import FusionResult  # noqa: F401
