"""Generate a deterministic sf1 stress corpus (~10x sf0.1) for local
benchmarking, derived from the driver's read-only sf0.1 parquet.

Scaling rules (copy i in 0..9; copy 0 is byte-identical to sf0.1):
- keyed tables get key offsets (max_key+1 stride) so keys stay unique;
- documents: copies i>0 insert a copy-specific character every 23 chars —
  that destroys ~1/5 of the char-5-shingles, pushing cross-copy Jaccard
  far below the 0.9 dedup threshold, so near-dup cluster mass scales
  LINEARLY with the corpus (no artificial 10-copy clusters) while
  within-copy clusters survive (same insertion applied to both docs);
- embeddings: copies i>0 apply a per-copy diagonal +-1 sign flip — an
  ISOMETRY, so every within-copy cosine is preserved exactly, while
  cross-copy cosines are sign-scrambled toward 0 (below the 0.45 dup
  threshold);
- dims region/nation/supplier/part are kept at sf0.1 size (dims stay
  small at scale by definition); customer/orders/lineitem/events scale.

Usage: python tools/gen_sf1.py [out_dir]   (default /root/repo/sf1data)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/sf1data"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT unnest(range({COPIES})) AS i")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def emit(t: str, sql: str) -> None:
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")

    # dims copied verbatim
    for t in ("region", "nation", "supplier", "part"):
        emit(t, f"SELECT * FROM {src(t)}")

    con.execute(f"CREATE VIEW li AS SELECT * FROM {src('lineitem')}")
    con.execute(f"CREATE VIEW od AS SELECT * FROM {src('orders')}")
    con.execute(f"CREATE VIEW cu AS SELECT * FROM {src('customer')}")
    con.execute(f"CREATE VIEW ev AS SELECT * FROM {src('events')}")
    con.execute(f"CREATE VIEW dc AS SELECT * FROM {src('documents')}")
    con.execute(f"CREATE VIEW em AS SELECT * FROM {src('embeddings')}")
    ko = con.execute("SELECT max(o_orderkey)+1 FROM od").fetchone()[0]
    kc = con.execute("SELECT max(c_custkey)+1 FROM cu").fetchone()[0]
    ke = con.execute("SELECT max(event_id)+1 FROM ev").fetchone()[0]
    ku = con.execute("SELECT max(user_id)+1 FROM ev").fetchone()[0]
    kd = con.execute("SELECT max(doc_id)+1 FROM dc").fetchone()[0]
    kv = con.execute("SELECT max(vec_id)+1 FROM em").fetchone()[0]

    emit("customer", f"""
        SELECT c_custkey + i*{kc} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM cu, copies""")
    emit("orders", f"""
        SELECT o_orderkey + i*{ko} AS o_orderkey,
               o_custkey + i*{kc} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM od, copies""")
    emit("lineitem", f"""
        SELECT l_orderkey + i*{ko} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM li, copies""")
    emit("events", f"""
        SELECT event_id + i*{ke} AS event_id, ts,
               user_id + i*{ku} AS user_id, event_type, value, props
        FROM ev, copies""")
    emit("documents", f"""
        SELECT doc_id + i*{kd} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(.{{23}})', '\\1' || chr((97 + i)::INTEGER), 'g')
               END AS text,
               lang, source, length(CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(.{{23}})', '\\1' || chr((97 + i)::INTEGER), 'g')
               END)::BIGINT AS n_chars
        FROM dc, copies""")
    # per-(copy, dim) deterministic sign: +1 iff hash(i*4096+d) is even
    emit("embeddings", f"""
        SELECT vec_id + i*{kv} AS vec_id,
               CASE WHEN i = 0 THEN embedding
                    ELSE list_transform(list_zip(embedding, range(1, len(embedding)+1)),
                         p -> (p[1] * CASE WHEN hash(i*4096 + p[2]) % 2 = 0
                                           THEN 1 ELSE -1 END)::FLOAT)
               END AS embedding,
               label
        FROM em, copies""")


if __name__ == "__main__":
    main()
