"""Generate an sf1-scale copy of the driver's sf0.1 tables for
performance benchmarking (NOT correctness — the driver's oracle gate
runs at sf0.01 on its own data).

Method: 10 id-shifted replicas of each sf0.1 table, written to
/tmp/testdata/sf1 (never under /root/testdata, which is read-only).
Referential integrity is preserved by shifting every foreign key by the
same per-copy stride as its dimension's primary key. Distributions,
selectivities, and the planted dedup/near-dup structures are preserved
*within* each replica; cross-replica accidental duplicates are broken
deliberately:

- documents.text: every token gets a per-copy suffix (``_k``), so
  intra-copy planted duplicate pairs survive verbatim while cross-copy
  clones share no shingles/tokens (keeps the dup *rate* constant as the
  corpus scales, which is what a 10x corpus would really look like).
- embeddings.embedding: element rotation by k positions — preserves
  norms and intra-copy cosine structure, decorrelates cross-copy.
- events: user_id shifted per copy, so session/user cardinality scales
  linearly instead of stacking 10 replicas onto the same users.

region/nation are fixed-size dimensions (as in TPC-H) and are copied
once, unscaled.

Usage: python scripts/gen_sf1.py [out_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"SET threads={os.cpu_count() or 8}")

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    def gen(t: str, select_sql: str, row_group: int = 65536) -> None:
        dst = f"{out}/{t}.parquet"
        con.sql(
            # explicit row groups: Spark parallelizes a scan at row-group
            # boundaries, so one giant group = a 1-task scan no matter
            # how many cores — size for ~32-way splits on the big tables
f"COPY ({select_sql}) TO '{dst}' (FORMAT PARQUET, COMPRESSION ZSTD, ROW_GROUP_SIZE {row_group})"
        )
        n = con.sql(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}", flush=True)

    # fixed dimensions — one copy
    for t in ("region", "nation"):
        gen(t, f"SELECT * FROM {src(t)}")

    # strides: one per replicated key space, computed from the source
    def stride(t: str, key: str) -> int:
        return int(con.sql(f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()[0])

    k_cust = stride("customer", "c_custkey")
    k_supp = stride("supplier", "s_suppkey")
    k_part = stride("part", "p_partkey")
    k_ord = stride("orders", "o_orderkey")
    k_evt = stride("events", "event_id")
    k_user = stride("events", "user_id")
    k_doc = stride("documents", "doc_id")
    k_vec = stride("embeddings", "vec_id")

    rng = f"(SELECT unnest(range({copies})) AS k)"

    gen(
        "customer",
        f"""SELECT c_custkey + k * {k_cust} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM {src('customer')} CROSS JOIN {rng}""",
    )
    gen(
        "supplier",
        f"""SELECT s_suppkey + k * {k_supp} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM {src('supplier')} CROSS JOIN {rng}""",
    )
    gen(
        "part",
        f"""SELECT p_partkey + k * {k_part} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM {src('part')} CROSS JOIN {rng}""",
    )
    gen(
        "orders",
        f"""SELECT o_orderkey + k * {k_ord} AS o_orderkey,
                   o_custkey + k * {k_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')} CROSS JOIN {rng}""",
    )
    gen(
        "lineitem",
        f"""SELECT l_orderkey + k * {k_ord} AS l_orderkey,
                   l_partkey + k * {k_part} AS l_partkey,
                   l_suppkey + k * {k_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')} CROSS JOIN {rng}""",
    )
    # events must keep the driver's exact timestamp unit (the engine's
    # read path normalizes ns-as-long vs micros based on the physical
    # type); DuckDB's parquet writer would downcast nanos to micros, so
    # replicate with pyarrow, which preserves the unit bit-for-bit.
    import pyarrow as pa
    import pyarrow.parquet as pq

    evt = pq.read_table(f"{SRC}/events.parquet")
    assert pa.types.is_timestamp(evt.schema.field("ts").type)
    reps = []
    for k in range(copies):
        reps.append(
            pa.table(
                {
                    "event_id": pa.compute.add(evt["event_id"], k * k_evt),
                    "ts": evt["ts"],
                    "user_id": pa.compute.add(evt["user_id"], k * k_user),
                    "event_type": evt["event_type"],
                    "value": evt["value"],
                    "props": evt["props"],
                }
            )
        )
    pq.write_table(
        pa.concat_tables(reps), f"{out}/events.parquet", compression="zstd",
        row_group_size=65536,  # splittable scan (see COPY note above)
    )
    print(f"events: {sum(t.num_rows for t in reps)} rows (pyarrow, ns)", flush=True)
    gen(
        "documents",
        f"""SELECT doc_id + k * {k_doc} AS doc_id,
                   CASE WHEN k = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)', '\\1_' || k, 'g')
                   END AS text,
                   lang, source,
                   CAST(length(CASE WHEN k = 0 THEN text
                        ELSE regexp_replace(text, '(\\S+)', '\\1_' || k, 'g')
                   END) AS BIGINT) AS n_chars
            FROM {src('documents')} CROSS JOIN {rng}""",
        row_group=4096,  # few rows, expensive rows: keep the scan splittable
    )
    gen(
        "embeddings",
        f"""SELECT vec_id + k * {k_vec} AS vec_id,
                   CASE WHEN k = 0 THEN embedding
                        ELSE embedding[(k % len(embedding)) + 1:]
                             || embedding[1:(k % len(embedding))]
                   END AS embedding,
                   label
            FROM {src('embeddings')} CROSS JOIN {rng}""",
        row_group=2048,
    )


if __name__ == "__main__":
    main()
