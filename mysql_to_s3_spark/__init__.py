"""mysql_to_s3_spark — a PySpark-native rebuild of the capabilities of
klahnakoski/MySQL-to-S3: the JX ("JSON Expressions") query language over
nested documents, plus the snowflake-denormalizing extract pipeline.

Architecture (SURVEY.md §7): everything compiles to declarative DataFrame
plans so Catalyst/Tungsten pick the physical strategy.

  - functions.compiler : JX expression JSON -> pyspark.sql.Column
  - plans.normalize    : QueryOp normalizer (reference jx_base/query.py:208)
  - plans.formats      : format=list|table|cube result shaping
  - operators.executor : QueryOp -> DataFrame plan (filter/select/groupBy/
                         edges+domains/window/sort/limit)
  - operators.dedup / similarity / text / multimodal :
                         beyond-reference large-scale pipeline operators
  - operators.codecs   : pure-numpy/stdlib media codecs (BMP, PPM/PGM,
                         PCM WAV, Y4M) backing the multimodal decode
  - operators.quantiles: exact percentiles at bounded memory (bracketed
                         rank-select, scalar + grouped)
  - operators.index    : hash/unique index + id-batch semi-join utilities
  - sources.warc       : WARC crawl reader + crawl_to_documents front end
  - sources.registry   : container registry (name -> DataFrame)
  - sources.snowflake  : FK-graph walk -> join-DAG -> nested doc frames
  - sources.jdbc       : MySQL scan options, FK discovery, keyset paging
  - sources.extract    : batch-incremental extract orchestrator
  - sources.ingest     : document ingest w/ type-widening, update/delete
  - sinks.json_sink    : scrubbed JSON-lines sink + etl lineage envelope
  - sinks.notify       : per-batch completion queue (SQS payload parity)
  - streaming.counters : incremental batch counters (+ Spark analog)
  - streaming.stream_extract : Structured Streaming extract (watermarked
                         windows, stateful sub-batches, foreachBatch sink)
  - queries            : the oracle-matched query catalog (driver contract)

See SCALE.md for the per-operator 100 TB design audit (partitioning,
shuffles, pushdown, broadcast decisions — explain()-verified).
"""

from mysql_to_s3_spark.session import get_spark
from mysql_to_s3_spark.operators.executor import run

__all__ = ["get_spark", "run"]
__version__ = "0.1.0"
