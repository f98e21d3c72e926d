"""Deterministic scale-up of the driver testdata for robustness sweeps.

Produces an sfN-shaped directory by replicating every FACT table of a
source sf dir ``factor`` times with key-offset copies (copy i offsets
each key/FK column by ``i * (orig_max + 1)``, so intra-copy join
cardinalities are preserved and cross-copy keys never collide).
Dimension tables (region, nation) keep their original size — scaling a
5-row dim would change query semantics, not stress.

Copy-specific perturbations keep degenerate blowups out:
- documents.text gets a per-copy suffix token pair so exact/near-dup
  operators see 10 DISTINCT corpora side by side rather than 10 exact
  clones of every doc (which would square the LSH pair count).
- doc n_chars is recomputed from the perturbed text.
Everything else is bit-identical replication — this is NOT correctness
data (the sf0.01 oracle gate is), it exists so `tools/sweep.py` can
prove every queries() plan survives a 10x input (VERDICT r03 #6).

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [factor]
       (defaults: /root/testdata/sf0.1  <repo>/dist/sf1  10)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = {"region.parquet", "nation.parquet"}

# key/FK columns to offset per copy (column absent → ignored)
OFFSET_COLS = {
    "customer.parquet": ["c_custkey"],
    "supplier.parquet": ["s_suppkey"],
    "part.parquet": ["p_partkey"],
    "orders.parquet": ["o_orderkey", "o_custkey"],
    "lineitem.parquet": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events.parquet": ["event_id", "user_id"],
    "documents.parquet": ["doc_id"],
    "embeddings.parquet": ["vec_id"],
}


def scale_table(src: str, dst: str, fname: str, factor: int) -> int:
    t = pq.read_table(os.path.join(src, fname))
    if fname in DIMS:
        pq.write_table(t, os.path.join(dst, fname))
        return t.num_rows
    offs = [c for c in OFFSET_COLS.get(fname, []) if c in t.column_names]
    bases = {
        c: int(pc.max(t.column(c)).as_py()) + 1 for c in offs
    }
    copies = []
    for i in range(factor):
        c = t
        for col in offs:
            idx = c.column_names.index(col)
            shifted = pc.add(c.column(col), i * bases[col])
            c = c.set_column(idx, c.field(idx), shifted.cast(t.field(col).type))
        if fname == "documents.parquet" and i > 0:
            idx = c.column_names.index("text")
            newtext = pc.binary_join_element_wise(
                c.column("text").cast(pa.string()),
                pa.array([f"copyword{i} tail{i}"] * c.num_rows),
                " ",
            )
            c = c.set_column(idx, c.field(idx), newtext)
            nidx = c.column_names.index("n_chars")
            c = c.set_column(
                nidx, c.field(nidx), pc.utf8_length(newtext).cast(pa.int64())
            )
        copies.append(c)
    out = pa.concat_tables(copies)
    pq.write_table(out, os.path.join(dst, fname))
    return out.num_rows


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "dist", "sf1")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        n = scale_table(src, dst, fname, factor)
        print(f"{fname}: {n} rows", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
