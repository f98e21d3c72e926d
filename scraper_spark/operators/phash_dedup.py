"""Perceptual-hash near-duplicate detection (the image-dedup operator).

The north rule makes pHash dedup a core operator (SURVEY §2.10 I6,
§2.4). Hamming-distance ≤ k over a 64-bit hash is a quasi-range join
Spark lacks natively; the standard trick is **banding**: split the 64
bits into 4 × 16-bit bands — two hashes within Hamming ≤ 3 must agree
exactly on ≥ 1 band (pigeonhole) — equi-join on (band_idx, band_value),
then verify with an exact popcount filter (``F.bit_count``, JVM-side).

At 10^9 images the band join is the only shuffle, keyed by
(band_idx, band16) — 4 rows per image, uniformly distributed unless
one identical image floods the corpus (degenerate band keys are then
salted or short-circuited through exact-dup grouping first).

The STORED-index trio (:func:`phash_build_index` /
:func:`phash_index_append` / :func:`phash_dedup_table`) is the
incremental shape: dedup each crawl round's fresh images against the
already-ingested corpus with one bucket-pruned equi-join — the image
twin of the text side's ``minhash_build_index`` family, and the same
reasoning as the batched stored-ANN probes (VERDICT r04 #1). Unlike
MinHash, the full 64-bit hash rides on every band row, so no separate
signature table is needed — the verify is one JVM-side ``bit_count``
on the joined row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_BANDS = 4
BAND_BITS = 16
# stored band-index partition count; pb mixes band16's low bits with
# band_idx (a layout-internal key — build and probe share the same
# column expression, nothing downstream observes it)
N_PB_BUCKETS = 64


def _band(col, i: int):
    return F.shiftrightunsigned(col, i * BAND_BITS).bitwiseAND(F.lit(0xFFFF))


def _pb_col():
    return (
        (F.col("band16") * F.lit(N_BANDS) + F.col("band_idx"))
        % F.lit(N_PB_BUCKETS)
    ).cast("int")


def _band_rows(images: DataFrame, id_col: str, phash_col: str) -> DataFrame:
    """(id, ph, band_idx, band16) — N_BANDS rows per distinct image."""
    base = images.select(
        F.col(id_col).alias("id"), F.col(phash_col).alias("ph")
    ).dropDuplicates(["id"])
    return base.select(
        "id",
        "ph",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_idx"), _band(F.col("ph"), i).alias("band16")
                )
                for i in range(N_BANDS)
            ])
        ).alias("b"),
    ).select("id", "ph", "b.band_idx", "b.band16")


def phash_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = N_BANDS - 1,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """Pairs (id_a, id_b, hamming ≤ max_hamming), id_a < id_b.

    Guaranteed complete for max_hamming ≤ N_BANDS - 1 (pigeonhole —
    hence the default); above that it is a high-recall approximation
    (documented LSH trade-off — raise N_BANDS for exactness)."""
    bands = _band_rows(images, id_col, phash_col)
    pairs = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.band16") == F.col("y.band16"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.ph").alias("ph_a"),
            F.col("y.ph").alias("ph_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


# ------------------------------------------------- incremental dedup ----
# Stored-index variant: dedup a batch of NEW images against the
# already-ingested corpus WITHOUT re-running the corpus self-join —
# the crawl-pipeline shape (each round's fresh images vs petabytes of
# corpus). Reference analog being scaled: per-row sink dedup
# (handlers/db.py:38-54) becomes one bucket-pruned equi-join.


def phash_build_index(
    images: DataFrame,
    table,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> int:
    """Materialize the corpus pHash band index: N_BANDS rows per image
    (id, ph, band_idx, band16), written to ``table`` (a TableIO)
    hive-partitioned by ``pb`` so a probe scans only the buckets the
    batch touches. Runs once per corpus (then
    :func:`phash_index_append` per batch); one explode, no shuffle
    beyond the partitioned write."""
    rows = _band_rows(images, id_col, phash_col).withColumn("pb", _pb_col())
    return table.overwrite(rows, partition_by=["pb"])


def phash_index_append(
    images: DataFrame,
    table,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> int:
    """Fold a (deduped) image batch into the stored band index with
    O(batch) work — the corpus is never rewritten. Band keys are
    stateless bit slices (no corpus-derived parameters), so the
    appended index is EXACTLY a full rebuild's (test-pinned); TableIO
    append snapshots keep reads one scan and its compaction bounds
    file count over thousands of batches."""
    rows = _band_rows(images, id_col, phash_col).withColumn("pb", _pb_col())
    return table.append(rows, partition_by=["pb"])


def phash_dedup_table(
    spark,
    table,
    new_images: DataFrame,
    max_hamming: int = N_BANDS - 1,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """Near-duplicate hits of a NEW-image batch against the STORED
    band index: (id_a = corpus image, id_b = batch image, hamming ≤
    max_hamming). Complete for max_hamming ≤ N_BANDS - 1 by the same
    pigeonhole bound as the self-join (a qualifying cross pair agrees
    on ≥ 1 band, and the probe offers all N_BANDS batch bands to the
    equi-join). Batch-internal duplicates are out of scope by contract
    (run :func:`phash_near_dup_pairs` on the batch — O(batch) here).

    A batch id already present in the index matches its stored self at
    hamming 0 and IS reported — the same semantic as the text twin
    (``lsh_dedup_table``), deliberately: a replayed micro-batch then
    drops its rows as dups of their stored selves instead of
    re-appending duplicate index entries (idempotent at-least-once
    ingest).

    Scan pruning: the batch's distinct ``pb`` buckets (≤ N_PB_BUCKETS
    ints — a bounded collect; batch band rows are cheap arithmetic, so
    they are simply recomputed for the join rather than cached) prune
    the index read to touched leaf dirs / partitions on both TableIO
    layouts."""
    nbands = _band_rows(new_images, id_col, phash_col).withColumn("pb", _pb_col())
    touched = {
        int(r["pb"]) for r in nbands.select("pb").distinct().collect()
    }
    corpus = table.read(spark, partitions={"pb": touched})
    pairs = (
        corpus.select(
            F.col("id").alias("id_a"),
            F.col("ph").alias("ph_a"),
            "band_idx",
            "band16",
        )
        .join(
            nbands.select(
                F.col("id").alias("id_b"),
                F.col("ph").alias("ph_b"),
                "band_idx",
                "band16",
            ),
            ["band_idx", "band16"],
        )
        .select("id_a", "id_b", "ph_a", "ph_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)
