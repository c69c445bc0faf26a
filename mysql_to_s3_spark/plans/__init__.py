from mysql_to_s3_spark.plans.normalize import QueryOp, DEFAULT_LIMIT, MAX_LIMIT

__all__ = ["QueryOp", "DEFAULT_LIMIT", "MAX_LIMIT"]
