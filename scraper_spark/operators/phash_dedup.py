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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

N_BANDS = 4
BAND_BITS = 16


def _band(col, i: int):
    return F.shiftrightunsigned(col, i * BAND_BITS).bitwiseAND(F.lit(0xFFFF))


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
    base = images.select(
        F.col(id_col).alias("id"), F.col(phash_col).alias("ph")
    ).dropDuplicates(["id"])
    bands = base.select(
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
