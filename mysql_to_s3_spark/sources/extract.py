"""Extract orchestrator: incremental, checkpointed fact-table extraction to
JSON batches (reference mysql_to_s3/extract.py:40 Extract).

The reference's thread/queue machinery (extract.py:86-118) dissolves into
Spark's scheduler: the driver loop only decides BATCH BOUNDARIES (counter
chain on the strictly-increasing extract field), and each batch is one
declarative doc_frame -> sink write. Keyset pagination
(extract.py:156-183) becomes a pushed-down range predicate on the sorted
extract field; checkpoint/resume keeps the reference's
[start_point, first_value] contract (extract.py:94-110,254).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_to_s3_spark.sinks.json_sink import etl_envelope, write_json_lines
from mysql_to_s3_spark.sources.snowflake import FactPlan, SnowflakeConfig, doc_frame
from mysql_to_s3_spark.streaming.counters import batch_key_columns


class ExtractError(ValueError):
    pass


@dataclass
class ExtractConfig:
    field: str  # strictly-increasing extract column (id or timestamp)
    type: str = "number"  # "number" | "time"
    start: Any = 0
    batch: Any = 100  # int, or [duration, size] counter chain
    destination: str = "extract_output"
    last: str | None = None  # checkpoint file path
    key_format: str = "a.b"  # dot pattern validating batch-key arity
    source_name: str | None = None  # etl lineage source label


def key_string(batch_key: tuple) -> str:
    return ".".join(str(int(k)) for k in batch_key)


def validate_key_format(key_format: str, batch_key: tuple) -> None:
    """key_format 'a.b.c' declares the batch-key arity (s3.py:385
    key_format validation)."""
    want = len(key_format.split("."))
    if len(batch_key) != want:
        raise ExtractError(
            f"batch key {batch_key} does not match key_format {key_format!r} ({want} parts)"
        )


def read_checkpoint(path: str) -> tuple | None:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        data = json.load(f)
    return tuple(data["start_point"]), data["first_value"]


def write_checkpoint(path: str, start_point: tuple, first_value: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"start_point": list(start_point), "first_value": first_value}, f)


class Extract:
    """Batch-incremental extract over a snowflake plan.

    ``tables``: name -> DataFrame (JDBC reads or parquet).
    """

    def __init__(
        self,
        tables: dict[str, DataFrame],
        plan: FactPlan,
        snowflake: SnowflakeConfig,
        extract: ExtractConfig,
    ):
        self.tables = tables
        self.plan = plan
        self.snowflake = snowflake
        self.extract = extract

    def batches(self) -> list[tuple]:
        """Distinct batch keys present in the fact table, in order —
        computed distributed via the counter-chain column analog."""
        fact = self.tables[self.plan.table]
        keyed = batch_key_columns(
            fact.filter(F.col(self.extract.field) >= F.lit(self.extract.start)),
            self.extract.field,
            self.extract.start,
            self.extract.batch,
            tiebreak_cols=self.plan.id_columns,
        )
        key_cols = ["__batch0__", "__batch1__"]
        rows = keyed.select(*key_cols).distinct().orderBy(*key_cols).collect()
        return [tuple(r) for r in rows]

    def ids_for_batch(self, batch_key: tuple) -> DataFrame:
        fact = self.tables[self.plan.table]
        keyed = batch_key_columns(
            fact.filter(F.col(self.extract.field) >= F.lit(self.extract.start)),
            self.extract.field,
            self.extract.start,
            self.extract.batch,
            tiebreak_cols=self.plan.id_columns,
        )
        cond = (F.col("__batch0__") == batch_key[0]) & (F.col("__batch1__") == batch_key[1])
        return keyed.filter(cond).select(self.plan.id_columns[0])

    def run(
        self,
        notify: Callable[[dict], None] | None = None,
        resume: bool = True,
    ) -> list[str]:
        """Extract every batch after the checkpoint; returns written paths.
        ``notify`` is the SQS-analog hook, called per batch with
        {destination, key, timestamp} (extract.py:244-251)."""
        done_after: tuple | None = None
        if resume and self.extract.last:
            cp = read_checkpoint(self.extract.last)
            if cp:
                done_after = cp[0]

        written = []
        for batch_key in self.batches():
            if done_after is not None and batch_key <= done_after:
                continue
            validate_key_format(self.extract.key_format, batch_key)
            key = key_string(batch_key)
            ids_df = self.ids_for_batch(batch_key)
            docs = doc_frame(self.tables, self.plan, self.snowflake, ids_df=ids_df)
            path = os.path.join(self.extract.destination, key)
            etl = etl_envelope(
                etl_id=key,
                source={"name": self.extract.source_name or self.plan.table},
            )
            write_json_lines(docs, path, self.plan.table, etl=etl)
            written.append(path)
            if self.extract.last:
                first = ids_df.agg(F.min(self.plan.id_columns[0])).collect()[0][0]
                write_checkpoint(self.extract.last, batch_key, first)
            if notify:
                from mysql_to_s3_spark.sinks.notify import notify_payload

                msg = notify_payload(bucket=self.extract.destination, key=key)
                # accept a queue object (FileQueue/CallbackQueue/SQS) or a
                # bare callable
                add = getattr(notify, "add", notify)
                add(msg)
        return written
