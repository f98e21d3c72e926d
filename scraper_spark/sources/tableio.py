"""Snapshot-committed table IO — the Iceberg-shaped storage seam.

The reference gets atomic publish by staging rows in a temp SQL table
and committing with one ``INSERT ... SELECT`` (reference:
handlers/db.py:279-341, SURVEY §2.1 K1). Iceberg gives the same thing
with snapshot commits; its runtime jars are not in this sandbox, so
this module provides an identical *shape*: each ``append``/``overwrite``
writes parquet files into a fresh ``data/s<NNNN>/`` directory and then
atomically commits a ``manifest.json`` (write-temp + ``os.replace``).
Readers only ever see committed snapshots, and ``as_of=<snapshot_id>``
time-travel reads power the byte-identical crawl resume (SURVEY §2.11
T5). Swapping in real Iceberg means replacing this class with
``df.writeTo(...)``/``spark.read.option("snapshot-id", ...)`` — the
engine code above this seam does not change.

At cluster scale the parquet files live on an object store; the manifest
commit maps to a metastore/catalog swap. Partition layout is delegated
to the DataFrame's own ``partitionBy`` columns when given.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_MANIFEST = "manifest.json"


class TableIO:
    """A versioned parquet table rooted at ``root``."""

    def __init__(self, root: str):
        self.root = root

    # -- manifest plumbing -------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _load(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"snapshots": [], "current": None}

    def _commit(self, manifest: dict) -> None:
        os.makedirs(self.root, exist_ok=True)
        tmp = self._manifest_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self._manifest_path())  # atomic on POSIX

    # -- public API --------------------------------------------------------
    def exists(self) -> bool:
        return os.path.exists(self._manifest_path())

    def snapshots(self) -> list[dict]:
        return self._load()["snapshots"]

    def current_snapshot_id(self) -> int | None:
        return self._load()["current"]

    def _write(self, df: DataFrame, op: str, partition_by: list[str] | None) -> int:
        m = self._load()
        sid = (m["snapshots"][-1]["id"] + 1) if m["snapshots"] else 1
        # dir prefix encodes the op (append s / overwrite o / compact c)
        # so an append-only TAILER (streaming file source) can glob
        # data/s* and never re-deliver rows that compaction or a
        # promote-overwrite merely rewrote — readers are prefix-agnostic
        # (they resolve dirs from the manifest)
        rel = f"data/{'o' if op == 'overwrite' else 's'}{sid:06d}"
        out = os.path.join(self.root, rel)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(out)
        m["snapshots"].append(
            {"id": sid, "op": op, "dir": rel, "schema": df.schema.json()}
        )
        m["current"] = sid
        self._commit(m)
        return sid

    def append(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Atomically append ``df`` as a new snapshot; returns snapshot id."""
        return self._write(df, "append", partition_by)

    def overwrite(self, df: DataFrame, partition_by: list[str] | None = None) -> int:
        """Atomically replace table contents as a new snapshot."""
        return self._write(df, "overwrite", partition_by)

    @staticmethod
    def _has_parquet(d: str) -> bool:
        for dirpath, _, files in os.walk(d):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    @staticmethod
    def _is_hive_dir(d: str) -> bool:
        try:
            return any("=" in e and os.path.isdir(os.path.join(d, e))
                       for e in os.listdir(d))
        except FileNotFoundError:
            return False

    @staticmethod
    def _hive_key(d: str) -> str | None:
        """The single hive partition key of ``d``, or None if the dir
        is not single-key hive-partitioned."""
        keys = set()
        try:
            for e in os.listdir(d):
                if os.path.isdir(os.path.join(d, e)):
                    if "=" not in e:
                        return None
                    keys.add(e.split("=", 1)[0])
        except FileNotFoundError:
            return None
        return keys.pop() if len(keys) == 1 else None

    def _entries_as_of(self, as_of: int | None) -> list[dict]:
        """Snapshot entries whose data is live at ``as_of``: honor
        overwrite resets, and skip entries replaced by an op='compact'
        entry that is itself within ``as_of`` (two-phase compaction —
        a compact snapshot newer than ``as_of`` does not hide its
        constituents, which is what makes rollback across a compaction
        boundary lossless)."""
        m = self._load()
        sid = m["current"] if as_of is None else as_of
        replaced: set[int] = set()
        for s in m["snapshots"]:
            if s["id"] > (sid or 0):
                break
            if s["op"] == "compact":
                replaced.update(s.get("replaces", []))
        out: list[dict] = []
        for s in m["snapshots"]:
            if s["id"] > (sid or 0):
                break
            if s["op"] == "overwrite":
                out = []
            if s["id"] in replaced:
                continue
            out.append(s)
        return out

    def _dirs_as_of(self, as_of: int | None) -> list[str]:
        return [
            os.path.join(self.root, s["dir"]) for s in self._entries_as_of(as_of)
        ]

    def read(
        self,
        spark: SparkSession,
        as_of: int | None = None,
        schema: StructType | None = None,
        partitions: dict[str, set] | None = None,
    ) -> DataFrame:
        """Read the table at ``as_of`` (default: current snapshot).

        An empty/absent table returns an empty DataFrame when ``schema``
        (or any committed snapshot schema) is available.

        ``partitions`` — optional {partition_key: allowed int values}:
        manifest-level file pruning, the Iceberg-manifest analog. On
        the multi-root single-scan path below it prunes which leaf
        directories are even listed; elsewhere it degrades to a
        post-scan filter (single hive root: Catalyst partition
        pruning does the skipping from the same predicate).
        """
        # a zero-row dynamic-partition write emits no parquet files at
        # all (just _SUCCESS) — such snapshots carry no schema and must
        # not reach spark.read.parquet, which would fail to infer one
        dirs = [d for d in self._dirs_as_of(as_of) if self._has_parquet(d)]
        if dirs:
            out = self._read_dirs(spark, dirs, partitions)
            if out is not None:
                if partitions:
                    from pyspark.sql import functions as F

                    for key, vals in partitions.items():
                        out = out.where(F.col(key).isin(sorted(vals)))
                return out
            # partitions pruned every file away → empty frame below
        if schema is None:
            m = self._load()
            if m["snapshots"]:
                schema = StructType.fromJson(json.loads(m["snapshots"][-1]["schema"]))
        if schema is None:
            raise ValueError(f"table {self.root} is empty and no schema given")
        return spark.createDataFrame([], schema)

    def _read_dirs(
        self,
        spark: SparkSession,
        dirs: list[str],
        partitions: dict[str, set] | None = None,
    ) -> DataFrame | None:
        """One DataFrame over committed snapshot dirs — as FEW scan
        relations as possible (an append-only partitioned table would
        otherwise accrete one relation per append, growing every
        downstream plan O(snapshots) — ADVICE r03):

        - unpartitioned roots → one ``spark.read.parquet(*dirs)``;
        - MULTIPLE roots all hive-partitioned by the SAME single int
          key → one scan over the LEAF dirs across all roots (Spark
          refuses multiple partitioned roots in one load, but the leaf
          dirs hold plain files), with the partition column rebuilt
          from the file path and ``partitions`` pruning which leaf
          dirs are listed at all — the Iceberg manifest-pruning shape;
        - anything mixed → per-root reads unioned by name (bounded by
          compaction).

        Returns None when ``partitions`` pruned every leaf away.
        """
        if len(dirs) == 1 or not any(self._is_hive_dir(d) for d in dirs):
            return spark.read.parquet(*dirs)
        keys = {self._hive_key(d) for d in dirs}
        key = keys.pop() if len(keys) == 1 else None
        if key is not None:
            allowed = partitions.get(key) if partitions else None
            leaves: list[str] = []
            try:
                for d in dirs:
                    for e in sorted(os.listdir(d)):
                        p = os.path.join(d, e)
                        if not (os.path.isdir(p) and e.startswith(key + "=")):
                            continue
                        v = int(e.split("=", 1)[1])  # int keys only
                        if allowed is not None and v not in allowed:
                            continue
                        leaves.append(p)
            except ValueError:
                key = None  # non-int partition value → per-root fallback
            if key is not None:
                if not leaves:
                    return None
                from pyspark.sql import functions as F

                return spark.read.parquet(*leaves).withColumn(
                    key,
                    F.regexp_extract(
                        F.input_file_name(), key + "=([0-9-]+)/", 1
                    ).cast("int"),
                )
        out = spark.read.parquet(dirs[0])
        for d in dirs[1:]:
            out = out.unionByName(spark.read.parquet(d))
        return out

    @staticmethod
    def rows_in_dirs(dirs: list[str]) -> int:
        """Footer row count over specific snapshot dirs — no Spark job."""
        import pyarrow.parquet as pq

        total = 0
        for d in dirs:
            for dirpath, _, files in os.walk(d):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(os.path.join(dirpath, f)).metadata.num_rows
        return total

    def rows(self, as_of: int | None = None) -> int:
        """Row count from parquet footers — no Spark job (the Iceberg
        analog reads manifest stats)."""
        return self.rows_in_dirs(self._dirs_as_of(as_of))

    # -- row-level DML (SURVEY §2.1 K4/K5, §2.11 T7) ----------------------
    # Iceberg/Delta express these as row-level deletes + snapshot commit;
    # on the parquet seam each is a copy-on-write overwrite of the new
    # table state — same atomicity, same reader semantics, O(table) I/O
    # (exactly what a non-merge-on-read Iceberg DELETE/UPDATE/MERGE costs).
    def delete_where(self, spark: SparkSession, cond) -> int:
        """DELETE FROM t WHERE cond (reference: handlers/db.py:160-169).

        SQL DELETE semantics exactly: only rows where ``cond`` is TRUE
        go — a NULL condition (e.g. ``col < 0`` on a NULL col) KEEPS
        the row, same as the DuckDB twin (``~cond`` alone would drop
        NULL-condition rows, since three-valued NOT NULL is NULL)."""
        from pyspark.sql import functions as F

        cur = self.read(spark)
        return self.overwrite(cur.where(~cond | F.isnull(cond)))

    def update_set(self, spark: SparkSession, cond, assignments: dict) -> int:
        """UPDATE t SET col=expr WHERE cond (handlers/db.py:254-276).

        SQL UPDATE semantics exactly: every assignment expression AND
        the condition evaluate against the PRE-update row (one select
        over the input frame), so ``SET a=b, b=a`` swaps — sequential
        withColumn would feed later assignments post-update values."""
        from pyspark.sql import functions as F

        cur = self.read(spark)
        out = cur.select(
            *[
                F.when(cond, assignments[c]).otherwise(F.col(c)).alias(c)
                if c in assignments
                else F.col(c)
                for c in cur.columns
            ]
        )
        return self.overwrite(out)

    def merge_upsert(self, spark: SparkSession, incoming: DataFrame, key: str) -> int:
        """MERGE INTO t USING incoming ON key WHEN MATCHED UPDATE WHEN NOT
        MATCHED INSERT — new rows replace stored duplicates, the
        reference's sink-dedup semantics (handlers/db.py:38-54, T7)."""
        cur = self.read(spark, schema=incoming.schema)
        kept = cur.join(incoming.select(key), key, "left_anti")
        return self.overwrite(kept.unionByName(incoming))

    # -- physical compaction (Iceberg rewrite_data_files analog) ----------
    def pending_appends(self, upto_id: int | None = None) -> list[dict]:
        """Live delta entries after the last overwrite (appends + any
        earlier compact pile, which re-compacts with the new appends —
        a 2-level LSM: base overwrite + one merged pile), with id ≤
        ``upto_id`` — the candidates for the next
        :meth:`compact_appends`. Manifest-only, no Spark job."""
        return [
            s
            for s in self._entries_as_of(upto_id)
            if s["op"] in ("append", "compact")
        ]

    def compact_appends(
        self,
        spark: SparkSession,
        upto_id: int | None = None,
        partition_by: list[str] | None = None,
    ) -> int | None:
        """Merge the pending append snapshots (id ≤ ``upto_id``) into
        ONE op='compact' snapshot that REPLACES them — bounding the
        physical file/root count of an append-only table (one hive root
        per bulk round otherwise accretes forever; ADVICE r03 / VERDICT
        r04 #2) without rewriting the compacted base.

        Two-phase for crash-safe resume: the replaced entries and their
        data dirs stay in the manifest/on disk — readers at
        ``as_of`` ≥ the compact id see the merged dir instead of them
        (:meth:`_entries_as_of`), while a rollback to an earlier id
        drops the compact entry and the originals resurface. Call
        :meth:`expire_snapshots` once a state commit covers the compact
        id to physically drop the replaced dirs. Returns the new
        snapshot id (None when < 2 pending appends)."""
        pend = self.pending_appends(upto_id)
        if len(pend) < 2:
            return None
        dirs = [os.path.join(self.root, s["dir"]) for s in pend]
        df = self._read_dirs(spark, dirs)
        if df is None:
            return None
        m = self._load()
        sid = (m["snapshots"][-1]["id"] + 1) if m["snapshots"] else 1
        rel = f"data/c{sid:06d}"  # 'c' prefix: invisible to the s*-glob tailer
        out = os.path.join(self.root, rel)
        w = df.write.mode("overwrite")
        if partition_by:
            # one file per partition value: the whole point is fewer
            # files, and a compact pile is written at most once per
            # compaction window
            df = df.repartition(*[df[c] for c in partition_by])
            w = df.write.mode("overwrite").partitionBy(*partition_by)
        w.parquet(out)
        m["snapshots"].append(
            {
                "id": sid,
                "op": "compact",
                "dir": rel,
                "schema": df.schema.json(),
                "replaces": [s["id"] for s in pend],
            }
        )
        m["current"] = sid
        self._commit(m)
        return sid

    def expire_snapshots(self, keep_from_id: int) -> int:
        """Physically drop snapshot entries (and their data dirs) that
        no read with ``as_of`` ≥ ``keep_from_id`` can reference: entries
        before the newest overwrite at/under ``keep_from_id``, and
        entries replaced by a compact entry at/under it. The Iceberg
        expire_snapshots analog — call with the newest STATE-COMMITTED
        id so crash rollback (always to that id) stays lossless.
        Returns how many entries were dropped."""
        m = self._load()
        replaced: set[int] = set()
        base_overwrite = None
        for s in m["snapshots"]:
            if s["id"] > keep_from_id:
                break
            if s["op"] == "compact":
                replaced.update(s.get("replaces", []))
            if s["op"] == "overwrite":
                base_overwrite = s["id"]
        drop = [
            s
            for s in m["snapshots"]
            if s["id"] in replaced
            or (base_overwrite is not None and s["id"] < base_overwrite)
        ]
        if not drop:
            return 0
        drop_ids = {s["id"] for s in drop}
        m["snapshots"] = [s for s in m["snapshots"] if s["id"] not in drop_ids]
        self._commit(m)
        for s in drop:
            shutil.rmtree(os.path.join(self.root, s["dir"]), ignore_errors=True)
        return len(drop)

    def rollback(self, snapshot_id: int) -> None:
        """Drop snapshots newer than ``snapshot_id`` (crash-resume path).

        Data directories of dropped snapshots are removed; uncommitted
        (never-manifested) directories are ignored by readers anyway.
        """
        m = self._load()
        keep = [s for s in m["snapshots"] if s["id"] <= snapshot_id]
        drop = [s for s in m["snapshots"] if s["id"] > snapshot_id]
        m["snapshots"], m["current"] = keep, (keep[-1]["id"] if keep else None)
        self._commit(m)
        for s in drop:
            shutil.rmtree(os.path.join(self.root, s["dir"]), ignore_errors=True)
