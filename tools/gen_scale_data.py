#!/usr/bin/env python3
"""Scale-up test data generator: replicates an sf* directory N times with
per-replica key offsets, preserving the exact physical parquet schema
(events.ts stays TIMESTAMP(NANOS) etc).

Key integrity across replicas: every foreign key gets the same offset as the
primary key it references (orders.o_custkey and customer.c_custkey both
shift by r*CUST_STEP, etc), so join cardinalities scale linearly like a true
larger scale factor. Dimension tables (nation, region) are copied once.
Documents/embeddings keep their payloads, so each document gains N-1 exact
replicas — a deliberately duplicate-heavy corpus (web-scale dedup inputs
are) that stresses the dedup/LSH family's bucket joins.

Usage: gen_scale_data.py SRC_DIR DST_DIR N_REPLICAS
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ORD_STEP = 10_000_000
CUST_STEP = 1_000_000
PART_STEP = 1_000_000
SUPP_STEP = 100_000
EVENT_STEP = 10_000_000
USER_STEP = 1_000_000
DOC_STEP = 100_000
VEC_STEP = 100_000

# table -> {column: step}
OFFSETS = {
    "lineitem": {"l_orderkey": ORD_STEP, "l_partkey": PART_STEP, "l_suppkey": SUPP_STEP},
    "orders": {"o_orderkey": ORD_STEP, "o_custkey": CUST_STEP},
    "customer": {"c_custkey": CUST_STEP},
    "supplier": {"s_suppkey": SUPP_STEP},
    "part": {"p_partkey": PART_STEP},
    "events": {"event_id": EVENT_STEP, "user_id": USER_STEP},
    "documents": {"doc_id": DOC_STEP},
    "embeddings": {"vec_id": VEC_STEP},
    "nation": None,  # dimension: copy once
    "region": None,
}


def replicate(src, dst, table, n):
    t = pq.read_table(f"{src}/{table}.parquet")
    offsets = OFFSETS[table]
    writer = pq.ParquetWriter(f"{dst}/{table}.parquet", t.schema)
    try:
        if offsets is None:
            writer.write_table(t)
            return t.num_rows
        for r in range(n):
            cols = []
            for name in t.schema.names:
                col = t.column(name)
                if name in offsets and r > 0:
                    col = pc.add(col, pa.scalar(r * offsets[name], type=col.type))
                cols.append(col)
            writer.write_table(pa.table(cols, schema=t.schema))
        return t.num_rows * n
    finally:
        writer.close()


def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    for table in OFFSETS:
        rows = replicate(src, dst, table, n)
        print(f"{table}: {rows} rows")


if __name__ == "__main__":
    main()
