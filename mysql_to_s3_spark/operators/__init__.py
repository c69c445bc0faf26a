from mysql_to_s3_spark.operators.executor import run

__all__ = ["run"]
