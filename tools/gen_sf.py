"""Deterministic scale-up of the driver testdata for robustness sweeps.

Produces an sfN-shaped directory by replicating every FACT table of a
source sf dir ``factor`` times with key-offset copies (copy i offsets
each key/FK column by ``i * (family_max + 1)``, where the base is
shared per KEY FAMILY — e.g. custkey in both customer and orders — so
intra-copy join cardinalities are preserved and cross-copy keys never
collide even when max(child FK) != max(parent PK)).
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

# key/FK columns to offset per copy, tagged with their KEY FAMILY: the
# per-copy offset base is shared across a family (max over every column
# in the family, +1), so copy i's FK values align with copy i's PK
# values even when max(child FK) != max(parent PK) — e.g. not every
# customer has orders (ADVICE r04).
OFFSET_COLS = {
    "customer.parquet": [("c_custkey", "custkey")],
    "supplier.parquet": [("s_suppkey", "suppkey")],
    "part.parquet": [("p_partkey", "partkey")],
    "orders.parquet": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem.parquet": [
        ("l_orderkey", "orderkey"),
        ("l_partkey", "partkey"),
        ("l_suppkey", "suppkey"),
    ],
    "events.parquet": [("event_id", "event_id"), ("user_id", "user_id")],
    "documents.parquet": [("doc_id", "doc_id")],
    "embeddings.parquet": [("vec_id", "vec_id")],
}


def family_bases(src: str) -> dict[str, int]:
    """One offset base per key family: max over every column in the
    family across all tables, +1."""
    maxima: dict[str, int] = {}
    for fname, cols in OFFSET_COLS.items():
        path = os.path.join(src, fname)
        if not os.path.exists(path):
            continue
        # read ONLY the key columns present in the file (skipping e.g.
        # documents' full text payload, which the scale pass reads once
        # anyway) — the schema probe is a footer read
        present = set(pq.read_schema(path).names)
        want = [col for col, _ in cols if col in present]
        if not want:
            continue
        t = pq.read_table(path, columns=want)
        for col, fam in cols:
            if col in want:
                m = int(pc.max(t.column(col)).as_py())
                maxima[fam] = max(maxima.get(fam, -1), m)
    return {fam: m + 1 for fam, m in maxima.items()}


def scale_table(
    src: str, dst: str, fname: str, factor: int, fam_bases: dict[str, int]
) -> int:
    t = pq.read_table(os.path.join(src, fname))
    if fname in DIMS:
        pq.write_table(t, os.path.join(dst, fname))
        return t.num_rows
    fam_of = {c: fam for c, fam in OFFSET_COLS.get(fname, [])}
    offs = [c for c in fam_of if c in t.column_names]
    bases = {c: fam_bases[fam_of[c]] for c in offs}
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
    bases = family_bases(src)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        n = scale_table(src, dst, fname, factor, bases)
        print(f"{fname}: {n} rows", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
