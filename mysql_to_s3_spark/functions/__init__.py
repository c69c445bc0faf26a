from mysql_to_s3_spark.functions.compiler import compile_expression, Compiled

__all__ = ["compile_expression", "Compiled"]
