"""Deterministic 10x scale-up of /root/testdata/sf0.1 for two-scale
benchmarking (a local stand-in for sf1.0).

Usage: python tools/gen_scale.py [k] [out_dir]
       (defaults: k=10, out_dir=<repo>/testdata_sf1)

Replication strategy — the point is to scale CARDINALITIES the way a
real sf1.0 would, not to duplicate value distributions into degenerate
clusters:

- key columns get a per-copy offset (key + i * (max_key + 1)) so FK
  relationships survive and entity counts scale 10x;
- dimension tables region/nation are shared (as in TPC-H, their size
  is scale-independent);
- document text is word-prefixed per copy (``v{i}<word>``) so copy i
  shares no shingles with copy j: the corpus gets 10x more duplicate
  CLUSTERS of the original sizes, instead of every cluster growing 10x
  (which would quadratically inflate near-dup pair counts beyond any
  real corpus);
- embeddings are cyclically rotated per copy (rotation preserves norms
  and intra-copy cosine structure, decorrelates across copies).

Everything is a pure function of the inputs — no RNG — so the corpus
is reproducible bit-for-bit. Output schemas are byte-identical to the
source (pyarrow passthrough; the events table keeps its TIMESTAMP
NANOS physical type).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# table -> columns that get the per-copy key offset
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# offsets must be consistent across tables: custkey offset in orders
# must equal the one used in customer, etc.
KEY_SPACE = {
    "c_custkey": "customer.c_custkey",
    "o_custkey": "customer.c_custkey",
    "s_suppkey": "supplier.s_suppkey",
    "l_suppkey": "supplier.s_suppkey",
    "p_partkey": "part.p_partkey",
    "l_partkey": "part.p_partkey",
    "o_orderkey": "orders.o_orderkey",
    "l_orderkey": "orders.o_orderkey",
    "event_id": "events.event_id",
    "user_id": "events.user_id",
    "doc_id": "documents.doc_id",
    "vec_id": "embeddings.vec_id",
}
SHARED_DIMS = ("region", "nation")


def _mangle_text(texts: list[str], i: int) -> list[str]:
    if i == 0:
        return texts
    pre = f"v{i}"
    return [" ".join(pre + w for w in t.split(" ")) for t in texts]


def _rotate_embeddings(vecs: list[list[float]], i: int) -> list[list[float]]:
    if i == 0:
        return vecs
    out = []
    for v in vecs:
        r = (i * 7) % len(v)
        out.append(v[r:] + v[:r])
    return out


def scale_table(name: str, table: pa.Table, k: int, extents: dict[str, int]) -> pa.Table:
    copies = []
    for i in range(k):
        cols = {}
        for field in table.schema:
            col = table[field.name]
            if field.name in KEY_COLS.get(name, ()):
                off = i * extents[KEY_SPACE[field.name]]
                cols[field.name] = pc.cast(
                    pc.add(col, pa.scalar(off, type=field.type)), field.type
                )
            elif name == "documents" and field.name == "text":
                cols[field.name] = pa.array(
                    _mangle_text(col.to_pylist(), i), type=field.type
                )
            elif name == "embeddings" and field.name == "embedding":
                cols[field.name] = pa.array(
                    _rotate_embeddings(col.to_pylist(), i), type=field.type
                )
            else:
                cols[field.name] = col
        copies.append(pa.table(cols, schema=table.schema))
    return pa.concat_tables(copies)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "testdata_sf1")
    # optional comma-separated table subset (e.g. "events,documents")
    # for targeted spot-checks at scales where the full corpus would be
    # wasteful. Foreign-key columns (o_custkey, l_orderkey, ...) live in
    # ANOTHER table's key space, so extents for a space whose owning
    # table is outside the subset are read from just that key column of
    # the source parquet — cheap, and it keeps subset offsets identical
    # to a full-corpus run.
    subset = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)

    names = subset if subset else list(KEY_COLS) + list(SHARED_DIMS)
    tables = {t: pq.read_table(f"{SRC}/{t}.parquet") for t in names}

    def space_max(tname: str, cname: str) -> int:
        col = (
            tables[tname][cname]
            if tname in tables
            else pq.read_table(f"{SRC}/{tname}.parquet", columns=[cname])[cname]
        )
        return pc.max(col).as_py()

    extents = {
        space: space_max(*space.split(".")) + 1
        for space in set(
            KEY_SPACE[c]
            for n in names
            for c in KEY_COLS.get(n, ())
        )
    }
    for name, table in tables.items():
        out = table if name in SHARED_DIMS else scale_table(name, table, k, extents)
        # bounded row groups: pyarrow's default writes ONE row group per
        # call, and parquet cannot be parallelized WITHIN a row group —
        # a single-group 30x documents file made every CPU-heavy
        # scan-projection (regex passes, Arrow text stages) effectively
        # single-threaded no matter how many byte splits Spark planned.
        # 64k rows ≈ 2-8 MB groups here, matching what a real multi-file
        # ingest produces. documents gets smaller groups: its rows are
        # thin in bytes but fat in downstream compute (8 regex passes,
        # Arrow text stages), so group count — the scan's parallelism
        # ceiling — must comfortably exceed the core count.
        rg = 4096 if name == "documents" else 65536
        pq.write_table(out, f"{out_dir}/{name}.parquet", row_group_size=rg)
        print(f"{name}: {table.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
