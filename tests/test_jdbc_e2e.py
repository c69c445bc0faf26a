"""Live embedded-JDBC round-trip (VERDICT r02 item 8).

The reference's e2e tests run against a live MySQL
(/root/reference/tests/test_extract.py:46-148). No MySQL server exists in
this container, but Spark ships Apache Derby (for the Hive metastore), so
this exercises the SAME code path — ``read_table`` → ``build_plan`` →
``doc_frame`` — over a real JDBC URL with zero mocks:

  - embedded Derby DB created through java.sql.DriverManager (py4j)
  - partitioned JDBC scan (partitionColumn bounds -> one pushed range
    predicate per partition) and explicit id-batch ``predicates``
  - FK relations declared explicitly: Derby has no MySQL
    information_schema, so the discovery SQL itself stays unit-tested
    (tests/test_jdbc.py); everything downstream of discovery runs live.
"""

import pytest

from mysql_to_s3_spark.sources.jdbc import JdbcConfig, id_batch_predicates, read_table
from mysql_to_s3_spark.sources.snowflake import (
    Relation,
    SnowflakeConfig,
    TableMeta,
    build_plan,
    doc_frame,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_cfg(spark, tmp_path_factory):
    db_dir = str(tmp_path_factory.mktemp("derby") / "testdb")
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._sc._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE fact_orders (o_id INT PRIMARY KEY, o_cust INT, o_total DOUBLE)")
    st.execute("CREATE TABLE dim_customer (c_id INT PRIMARY KEY, c_name VARCHAR(32))")
    st.execute(
        "CREATE TABLE child_items (i_id INT PRIMARY KEY, i_order INT, i_qty INT, "
        "CONSTRAINT fk_items FOREIGN KEY (i_order) REFERENCES fact_orders(o_id))"
    )
    for cid, cname in [(1, "alice"), (2, "bob")]:
        st.execute(f"INSERT INTO dim_customer VALUES ({cid}, '{cname}')")
    for oid, cust, total in [(10, 1, 99.5), (11, 2, 10.0), (12, 1, 55.25)]:
        st.execute(f"INSERT INTO fact_orders VALUES ({oid}, {cust}, {total})")
    for iid, order, qty in [(100, 10, 3), (101, 10, 5), (102, 11, 7)]:
        st.execute(f"INSERT INTO child_items VALUES ({iid}, {order}, {qty})")
    st.close()
    conn.close()
    return JdbcConfig(
        host="", schema="APP", driver=DERBY_DRIVER, jdbc_url=f"jdbc:derby:{db_dir}"
    )


def test_read_table_partitioned(spark, derby_cfg):
    df = read_table(
        spark,
        derby_cfg,
        "fact_orders",
        partition_column="o_id",
        lower_bound=10,
        upper_bound=13,
        num_partitions=2,
    )
    assert df.rdd.getNumPartitions() == 2
    rows = {r["O_ID"]: r["O_TOTAL"] for r in df.collect()}
    assert rows == {10: 99.5, 11: 10.0, 12: 55.25}


def test_read_table_id_batch_predicates(spark, derby_cfg):
    preds = id_batch_predicates("o_id", 10, 13, 2)
    df = read_table(spark, derby_cfg, "fact_orders", predicates=preds)
    # one JDBC partition per id batch: a resumed extract skips done batches
    assert df.rdd.getNumPartitions() == len(preds) == 2
    assert df.count() == 3


def test_jdbc_snowflake_doc_frame(spark, derby_cfg):
    tables = [
        TableMeta("fact_orders", ["o_id", "o_cust", "o_total"], ["o_id"]),
        TableMeta("dim_customer", ["c_id", "c_name"], ["c_id"]),
        TableMeta("child_items", ["i_id", "i_order", "i_qty"], ["i_id"]),
    ]
    relations = [
        Relation("fk_cust", "fact_orders", ["o_cust"], "dim_customer", ["c_id"]),
        Relation("fk_items", "child_items", ["i_order"], "fact_orders", ["o_id"]),
    ]
    cfg = SnowflakeConfig(fact_table="fact_orders", show_foreign_keys=False)
    plan = build_plan(tables, relations, cfg)
    frames = {
        t.name: read_table(spark, derby_cfg, t.name).toDF(*t.columns)
        for t in tables
    }
    docs = doc_frame(frames, plan, cfg)
    got = {r["__id__"]: r.asDict(recursive=True)["fact_orders"] for r in docs.collect()}
    assert set(got) == {10, 11, 12}
    assert got[10]["o_cust"]["c_name"] == "alice"
    assert sorted(i["i_qty"] for i in got[10]["child_items"]) == [3, 5]
    assert got[12]["child_items"] in (None, [])
