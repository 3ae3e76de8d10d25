"""Build a ~sf1.0 (10x sf0.1) parquet dataset for the single-pass scale
study (VERDICT r05 ask #9) WITHOUT touching /root/testdata: each fact
table is 10 key-shifted replicas of the driver's sf0.1 data, so join
fan-outs, group cardinalities, and per-key densities scale the way a
10x corpus would:

- dims (region/nation) stay fixed — broadcast joins stay broadcast;
- customer/supplier/part/orders/lineitem/events/documents/embeddings
  get replica-offset surrogate keys (offset >> max key, so replicas
  never collide) with FK columns shifted consistently;
- document text gets a replica prefix and embeddings a tiny replica
  perturbation on dim 0, so exact-dup and near-dup keys face a 10x
  corpus rather than a degenerate every-row-duplicated-10x one (which
  would turn cluster-bounded quadratic verifies into a 100x blowup by
  CONSTRUCTION, not by scale).

Usage: python scripts/make_sf1.py /tmp/sf1.0 [replicas=10]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# replica key offsets, each far above the sf0.1 max of its key space
OFF = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT * FROM range({reps}) t(i)")

    def build(table: str, select: str) -> None:
        src = f"'{SRC}/{table}.parquet'"
        con.execute(
            f"COPY (SELECT {select} FROM {src}, reps) "
            f"TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    build(
        "customer",
        f"c_custkey + i*{OFF['custkey']} AS c_custkey, c_name, c_nationkey,"
        " c_acctbal, c_mktsegment",
    )
    build(
        "supplier",
        f"s_suppkey + i*{OFF['suppkey']} AS s_suppkey, s_name, s_nationkey, s_acctbal",
    )
    build(
        "part",
        f"p_partkey + i*{OFF['partkey']} AS p_partkey, p_name, p_brand, p_type,"
        " p_size, p_retailprice",
    )
    build(
        "orders",
        f"o_orderkey + i*{OFF['orderkey']} AS o_orderkey,"
        f" o_custkey + i*{OFF['custkey']} AS o_custkey,"
        " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    build(
        "lineitem",
        f"l_orderkey + i*{OFF['orderkey']} AS l_orderkey,"
        f" l_partkey + i*{OFF['partkey']} AS l_partkey,"
        f" l_suppkey + i*{OFF['suppkey']} AS l_suppkey,"
        " l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,"
        " l_returnflag, l_linestatus, l_shipdate",
    )
    build(
        "events",
        f"event_id + i*{OFF['event_id']} AS event_id, ts,"
        f" user_id + i*{OFF['user_id']} AS user_id, event_type, value, props",
    )
    build(
        "documents",
        f"doc_id + i*{OFF['doc_id']} AS doc_id,"
        " CASE WHEN i = 0 THEN text ELSE 'r' || i || ' ' || text END AS text,"
        " lang, source, n_chars",
    )
    build(
        "embeddings",
        f"vec_id + i*{OFF['vec_id']} AS vec_id,"
        " list_prepend(embedding[1] + i * 0.01, embedding[2:]) AS embedding,"
        " label",
    )


if __name__ == "__main__":
    main()
