"""Named-query registry — the stored-procedure source analog (S7).

The reference sources rows by invoking SQL-Server stored procedures
(reference: handlers/db.py EXEC call sites; SURVEY §2.1 S7). Spark has
no server-side procedures; the idiomatic equivalent is a registry of
named, parameterized SQL templates executed against registered views —
jobs call them by name, the definitions live in one versioned place,
and Catalyst plans the expanded SQL like any other query (predicate
pushdown and pruning still apply, which an opaque procedure would
forfeit).

Templates are written in the ANSI subset Spark SQL and DuckDB share so
each registry entry can carry a driver-contract oracle twin. Parameter
values are validated against a conservative whitelist before
substitution — a registry is an API surface, not a SQL pass-through.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

# name → SQL template. {table} placeholders are logical table names
# bound at call time; {param} placeholders are scalar parameters.
REGISTRY: dict[str, str] = {
    # reference analog: the "top N per segment" report procs
    "top_customers_by_balance": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS bal
        FROM {customer}
        WHERE c_mktsegment = '{segment}'
        ORDER BY bal DESC, c_custkey
        LIMIT {k}
    """,
    # reference analog: date-ranged order pulls (EXEC with @from/@to)
    "orders_in_priority": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM {orders}
        WHERE o_orderpriority = '{priority}' AND o_totalprice > {min_price}
    """,
    # reference analog: per-key aggregate procs feeding report sinks
    "segment_balance_summary": """
        SELECT c_mktsegment AS segment, count(*) AS n_cust,
               round(sum(c_acctbal), 2) AS sum_bal,
               round(avg(c_acctbal), 2) AS avg_bal
        FROM {customer}
        GROUP BY c_mktsegment
    """,
}

# scalar parameters: plain identifiers-ish strings or numbers only —
# quotes, braces and statement separators are rejected outright
_PARAM_OK = re.compile(r"^[A-Za-z0-9_\- .#]*$")
_TABLE_OK = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")
# String parameters must appear as WHOLE quoted slots '{param}'; a
# param with ANY occurrence outside that form lands in the SQL
# unquoted and must be a real number — the string whitelist admits
# spaces, which an unquoted slot would read as extra SQL tokens
# (k="5 OFFSET 3"). Classification is per OCCURRENCE: a param used
# both quoted and unquoted is numeric-only (numbers are valid inside
# quotes too), so no occurrence ever receives a multi-token string.
_SLOT = re.compile(r"\{(\w+)\}")


def _string_slot_params(template: str) -> set[str]:
    """Params whose every occurrence is a whole quoted slot '{p}'."""
    quoted_ok: dict[str, bool] = {}
    for m in _SLOT.finditer(template):
        is_quoted = (
            m.start() > 0
            and m.end() < len(template)
            and template[m.start() - 1] == "'"
            and template[m.end()] == "'"
        )
        p = m.group(1)
        quoted_ok[p] = quoted_ok.get(p, True) and is_quoted
    return {p for p, ok in quoted_ok.items() if ok}


def expand(name: str, tables: dict[str, str], params: dict[str, object]) -> str:
    """Expand a registry template to executable SQL (engine-agnostic:
    the same text runs on Spark and on DuckDB for the oracle twin)."""
    template = REGISTRY[name]
    string_ok = _string_slot_params(template)
    for t, v in tables.items():
        if not _TABLE_OK.match(str(v)):
            raise ValueError(f"illegal table binding {t}={v!r}")
    for p, v in params.items():
        if p in string_ok:
            if not _PARAM_OK.match(str(v)):
                raise ValueError(f"illegal parameter value {p}={v!r}")
        elif isinstance(v, bool) or not isinstance(v, (int, float)):
            raise ValueError(
                f"parameter {p} has an unquoted slot and must be "
                f"numeric, got {v!r}"
            )
    return template.format(**tables, **params)


def run_named(
    spark: SparkSession,
    name: str,
    tables: dict[str, str],
    **params: object,
) -> DataFrame:
    """Execute registry entry ``name`` with logical→view table bindings
    and scalar parameters; returns the result DataFrame."""
    return spark.sql(expand(name, tables, params))
