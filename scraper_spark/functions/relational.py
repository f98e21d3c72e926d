"""Schema-level relational helpers.

J7 (SURVEY §2.4): the reference inserts only the case-insensitive
intersection of frame and table columns (reference:
handlers/db.py:329-334, set-∩ at :40,112,330-331). Spark-side this is
driver code over schemas, not a data join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def common_columns(a: DataFrame, b: DataFrame) -> list[str]:
    """Case-insensitive column intersection, in a's order, a's casing."""
    b_lower = {c.lower() for c in b.columns}
    return [c for c in a.columns if c.lower() in b_lower]


def union_common(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union on the shared columns only (pd.concat(join='inner') ≈
    reference handlers/db.py:47)."""
    cols = common_columns(a, b)
    b_map = {c.lower(): c for c in b.columns}
    return a.select(*cols).unionByName(
        b.select(*[F.col(b_map[c.lower()]).alias(c) for c in cols])
    )


def align_to(incoming: DataFrame, target: DataFrame) -> DataFrame:
    """Project ``incoming`` onto the target schema: shared columns
    (case-insensitively matched, target casing), missing target columns
    as NULLs — the reference's insert-column alignment (db.py:329-334)
    plus unionByName(allowMissingColumns) semantics."""
    in_map = {c.lower(): c for c in incoming.columns}
    cols = []
    for f in target.schema.fields:
        src = in_map.get(f.name.lower())
        if src is not None:
            cols.append(F.col(src).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return incoming.select(*cols)
