"""Conditional notification sink — the email/alert analog (K8).

The reference emails a report when a run finds rows worth flagging
(reference: utils/utility_commons.py mail senders + the isEmpty-style
gates in the job scripts; SURVEY §2.1 K8 — SMTP itself is out of scope
in this sandbox). The engine keeps the reference's SEMANTICS as a
sink operator: evaluate a gate aggregate over a DataFrame, and iff it
trips, render a bounded summary and hand it to a transport callable.
The default transport appends the notification as a row to a TableIO
``notifications`` table (auditable, replayable); a real SMTP/webhook
client drops into the same callable seam.

Shape notes: the gate is ONE bounded aggregate action (count +
optional sample rows via ``limit`` — never a full collect), so the
operator is safe on a 10^10-row frame.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, functions as F

from scraper_spark.sources.tableio import TableIO

# a transport receives PURE DATA (json-serializable scalars) — an
# SMTP/webhook client can render or json.dumps the payload verbatim
Transport = Callable[[dict], None]


def table_transport(table: TableIO, spark=None) -> Transport:
    """Default transport: append one audit row per notification.
    The session (which only this table sink needs — other transports
    are Spark-free) is captured at CONSTRUCTION time when not given:
    getActiveSession() is a JVM thread-local under pinned-thread mode,
    so resolving it here keeps the transport callable from worker
    threads (e.g. a write pool) that never created a session."""
    from pyspark.sql import SparkSession

    captured = spark or SparkSession.getActiveSession()

    def send(payload: dict) -> None:
        import pandas as pd

        from pyspark.sql import SparkSession

        sess = captured or SparkSession.getActiveSession()
        if sess is None:
            raise RuntimeError("table_transport: no active SparkSession")
        table.append(
            sess.createDataFrame(
                pd.DataFrame([payload]),
                "run_id string, gate string, n_rows long, sample string",
            )
        )

    return send


def notify_if(
    df: DataFrame,
    gate: str,
    run_id: str,
    transport: Transport,
    min_rows: int = 1,
    sample_rows: int = 5,
) -> bool:
    """Fire ``transport`` iff ``df`` has ≥ ``min_rows`` rows.

    Returns whether the notification fired. The row count is one
    bounded aggregate; the sample is a ``limit(sample_rows)`` pull
    rendered to a single string (the reference's email body analog).
    """
    n = df.count()
    if n < min_rows:
        return False
    sample = df.limit(sample_rows).toPandas()
    body = "; ".join(
        ",".join(f"{k}={v}" for k, v in row.items())
        for row in sample.to_dict("records")
    )
    transport(
        {
            "run_id": run_id,
            "gate": gate,
            "n_rows": int(n),
            "sample": body,
        }
    )
    return True


def notify_on_threshold(
    df: DataFrame,
    gate: str,
    run_id: str,
    transport: Transport,
    value_col: str,
    threshold: float,
) -> bool:
    """Fire iff any row's ``value_col`` exceeds ``threshold`` — the
    reference's 'alert when a metric crosses a line' gate, pushed down
    as a filter so the scan prunes before counting."""
    return notify_if(
        df.where(F.col(value_col) > threshold), gate, run_id, transport
    )
