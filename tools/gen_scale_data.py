#!/usr/bin/env python3
"""Scale-up test data generator: replicates an sf* directory N times with
per-replica key offsets, preserving the exact physical parquet schema
(events.ts stays TIMESTAMP(NANOS) etc).

Key integrity across replicas: every foreign key gets the same offset as the
primary key it references (orders.o_custkey and customer.c_custkey both
shift by r*CUST_STEP, etc), so join cardinalities scale linearly like a true
larger scale factor. Dimension tables (nation, region) are copied once.

Documents/embeddings replicas are DISTINCT by default: replica text gets a
deterministic hash-derived word mutation (~1/3 of words replaced, killing
cross-replica shingle identity while preserving length/stopword/lang
statistics), and replica vectors get deterministic bounded noise (preserving
label-cluster structure). This makes the dedup/LSH family's 10x ratios
measure the ALGORITHM, not an artificial every-doc-is-a-10-clone-cluster
corpus; pass --clone-docs to get the old exact-replica behavior (the
duplicate-heavy stress variant).

Usage: gen_scale_data.py SRC_DIR DST_DIR N_REPLICAS [--clone-docs]
"""
import hashlib
import struct
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


def _h64(*parts):
    """Deterministic 64-bit hash of the parts (no RNG state, reproducible)."""
    d = hashlib.blake2b("|".join(str(p) for p in parts).encode(), digest_size=8)
    return struct.unpack("<Q", d.digest())[0]


def mutate_text(text, doc_id, r):
    """Replace ~1/3 of words with hash-derived tokens: replicas stay
    realistic (length, stopword ratio, 2/3 of the vocabulary intact) but
    lose cross-replica shingle identity, so MinHash/SimHash/span-dedup see
    a distinct document, not a clone."""
    words = text.split(" ")
    out = []
    for i, w in enumerate(words):
        h = _h64(doc_id, r, i)
        if h % 3 == 0 and w:
            out.append("w%x" % (h >> 16 & 0xFFFFFF))
        else:
            out.append(w)
    return " ".join(out)


def mutate_vector(vec, vec_id, r):
    """Bounded deterministic noise (+-15% of the element scale): replicas
    stop being exact/cosine-1 duplicates but keep their label-cluster
    neighborhood."""
    out = []
    for d, v in enumerate(vec):
        h = _h64(vec_id, r, d)
        noise = ((h % 2001) - 1000) / 1000.0 * 0.15  # [-0.15, 0.15]
        out.append(v + noise * (abs(v) if v != 0 else 0.1))
    return out


def replicate(src, dst, table, n, clone_docs=False):
    t = pq.read_table(f"{src}/{table}.parquet")
    offsets = OFFSETS[table]
    writer = pq.ParquetWriter(f"{dst}/{table}.parquet", t.schema)
    try:
        if offsets is None:
            writer.write_table(t)
            return t.num_rows
        for r in range(n):
            # mutate once per replica; text and n_chars both derive from it
            # (the per-word hashing dominates generator cost)
            mutated = None
            if not clone_docs and r > 0 and table == "documents":
                mutated = [
                    mutate_text(s, i, r)
                    for s, i in zip(t.column("text").to_pylist(),
                                    t.column("doc_id").to_pylist())]
            cols = []
            for name in t.schema.names:
                col = t.column(name)
                if name in offsets and r > 0:
                    col = pc.add(col, pa.scalar(r * offsets[name], type=col.type))
                elif mutated is not None and name == "text":
                    col = pa.array(mutated, type=col.type)
                elif mutated is not None and name == "n_chars":
                    # keep the stored length consistent with the mutated text
                    col = pa.array([len(s) for s in mutated], type=col.type)
                elif not clone_docs and r > 0 and table == "embeddings" and name == "embedding":
                    ids = t.column("vec_id").to_pylist()
                    col = pa.array(
                        [mutate_vector(v, i, r) for v, i in zip(col.to_pylist(), ids)],
                        type=col.type)
                cols.append(col)
            writer.write_table(pa.table(cols, schema=t.schema))
        return t.num_rows * n
    finally:
        writer.close()


def main():
    src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    clone_docs = "--clone-docs" in sys.argv[4:]
    import os
    os.makedirs(dst, exist_ok=True)
    for table in OFFSETS:
        rows = replicate(src, dst, table, n, clone_docs)
        print(f"{table}: {rows} rows")


if __name__ == "__main__":
    main()
