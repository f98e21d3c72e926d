"""tools/gen_sf.py key-family offset correctness (ADVICE r04).

Per-copy FK offsets must use ONE base per key family (the max over
every column in the family, +1), so copy i's child FKs still point at
copy i's parent PKs even when max(child FK) != max(parent PK) — e.g.
not every customer has orders."""

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from gen_sf import family_bases, scale_table  # noqa: E402


def _write(dst, fname, cols):
    pq.write_table(pa.table(cols), os.path.join(dst, fname))


def test_fk_offsets_share_family_base(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    # customers 0..9, but only customers {0, 2, 4} have orders →
    # max(o_custkey)=4 != max(c_custkey)=9
    _write(str(src), "customer.parquet", {"c_custkey": list(range(10))})
    _write(
        str(src),
        "orders.parquet",
        {"o_orderkey": [100, 101, 102], "o_custkey": [0, 2, 4]},
    )
    bases = family_bases(str(src))
    assert bases["custkey"] == 10  # family max (customer side), not 5

    factor = 3
    for f in ("customer.parquet", "orders.parquet"):
        scale_table(str(src), str(dst), f, factor, bases)

    cust = pq.read_table(os.path.join(dst, "customer.parquet")).to_pydict()
    orders = pq.read_table(os.path.join(dst, "orders.parquet")).to_pydict()
    cust_keys = set(cust["c_custkey"])
    # every scaled FK resolves (intra-copy join preserved) ...
    assert all(k in cust_keys for k in orders["o_custkey"])
    # ... to the SAME copy: copy i of the orders rows references keys
    # in [i*10, (i+1)*10)
    for i in range(factor):
        chunk = orders["o_custkey"][i * 3 : (i + 1) * 3]
        assert chunk == [0 + i * 10, 2 + i * 10, 4 + i * 10]
    # PKs never collide across copies
    assert len(cust_keys) == 10 * factor
