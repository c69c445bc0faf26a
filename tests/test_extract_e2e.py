"""End-to-end Extract orchestrator: batch-key assignment, JSON-lines
writes, checkpoint/resume, notify hook."""

import glob
import json
import os

from mysql_to_s3_spark.sources.extract import Extract, ExtractConfig, read_checkpoint
from mysql_to_s3_spark.sources.snowflake import SnowflakeConfig, build_plan
from tests.fixtures_snowflake import RELATIONS, TABLES_META, build_tables


def _setup(spark, tmp_path):
    cfg = SnowflakeConfig(
        fact_table="fact_table",
        show_foreign_keys=False,
        null_values=["-", "unknown", ""],
        reference_only=["inner1.value", "inner2.value"],
    )
    plan = build_plan(TABLES_META, RELATIONS, cfg)
    extract_cfg = ExtractConfig(
        field="id",
        start=0,
        batch=5,  # 5 fact rows per sub-batch
        destination=str(tmp_path / "out"),
        last=str(tmp_path / "extract.last"),
        key_format="a.b",
    )
    return Extract(build_tables(spark), plan, cfg, extract_cfg)


def _read_docs(path):
    docs = []
    for f in sorted(glob.glob(os.path.join(path, "part-*"))):
        with open(f) as fh:
            docs += [json.loads(line) for line in fh if line.strip()]
    return docs


def test_extract_run_writes_batches_and_checkpoint(spark, tmp_path):
    ex = _setup(spark, tmp_path)
    notified = []
    written = ex.run(notify=notified.append)
    # 12 fact rows, batch size 5 -> keys 0.0, 0.1, 0.2
    assert [os.path.basename(p) for p in written] == ["0.0", "0.1", "0.2"]
    assert [n["key"] for n in notified] == ["0.0", "0.1", "0.2"]

    all_docs = []
    for p in written:
        all_docs += _read_docs(p)
    assert len(all_docs) == 12
    ids = sorted(d["fact_table"]["id"] for d in all_docs)
    assert ids == [10, 11, 12, 13, 15, 16, 17, 18, 19, 20, 21, 22]
    # every doc carries the etl lineage envelope
    assert all("etl" in d and d["etl"]["id"] for d in all_docs)

    cp = read_checkpoint(str(tmp_path / "extract.last"))
    assert cp is not None and tuple(cp[0]) == (0, 2)


def test_extract_resume_skips_done_batches(spark, tmp_path):
    ex = _setup(spark, tmp_path)
    ex.run()
    # a fresh run with the checkpoint present writes nothing new
    again = ex.run()
    assert again == []
