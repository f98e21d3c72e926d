"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The reference dedups on a single business key at the sink
(reference: handlers/db.py:38-54, jobs/job_haozu.py:33-34 — SURVEY
§2.4 J2/A5). A 100 TB training-data pipeline needs near-duplicate
detection too; these operators implement the standard family over the
``documents`` table, Spark-first:

- exact: hash-groupBy (one shuffle, map-side partial agg),
- MinHash: per-doc signatures from min-of-hash over the word set —
  hashes are md5-based (functions/hashes.py) so the DuckDB oracle
  reproduces them bit-for-bit,
- LSH: band the signatures, equi-join on band key — candidate pairs
  without the O(n²) cross join; at scale the band join is THE shuffle
  and its key space (band_id, band_hash) is uniformly hash-distributed,
- SimHash: 16-bit sign-vote fingerprint, groupable/banded the same way,
- Jaccard estimate: fraction of agreeing minhash components per
  candidate pair (rather than re-tokenizing both docs — linear, not
  quadratic, in corpus size).

All Spark expressions are built-ins (explode → groupBy → agg); the
only wide operations are the groupBys and the self-join on band keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from scraper_spark.functions.hashes import md5_long_sql
from scraper_spark.operators.text import tokens_col, tokens_sql

N_MINHASH = 8
BAND_SIZE = 2  # 8 components → 4 bands of 2
SIMHASH_BITS = 16


# ---------------------------------------------------------------- exact ----
def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) texts with multiplicity."""
    norm = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    return (
        docs.select(norm.alias("content_key"), "doc_id")
        .groupBy("content_key")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
    )


def exact_dup_groups_sql() -> str:
    norm = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    return f"""
        SELECT {norm} AS content_key, count(*) AS n_copies,
               min(doc_id) AS keeper_doc_id
        FROM documents GROUP BY 1
    """


# -------------------------------------------------------------- minhash ----
def _word_rows(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("word")
    ).distinct()


_WORDS_SQL = f"""
    SELECT DISTINCT doc_id, unnest({tokens_sql('lower(text)')}) AS word
    FROM documents
"""


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """8 md5-permutation minhashes per doc: mh_i = min(md5(i||'|'||word)).

    min() over hex strings is a valid minhash (lexicographic order on a
    uniform hash) and is reproducible verbatim in any SQL engine.
    """
    words = _word_rows(docs)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("word")))).alias(f"mh{i}")
        for i in range(N_MINHASH)
    ]
    return words.groupBy("doc_id").agg(*aggs)


def minhash_signatures_sql() -> str:
    aggs = ", ".join(
        f"min(md5('{i}|' || word)) AS mh{i}" for i in range(N_MINHASH)
    )
    return f"WITH w AS ({_WORDS_SQL}) SELECT doc_id, {aggs} FROM w GROUP BY doc_id"


def lsh_candidate_pairs(docs: DataFrame) -> DataFrame:
    """Near-dup candidate pairs via banded minhash: docs sharing any
    band collide; pairs deduped, estimated Jaccard = agreeing
    components / 8. The band self-join replaces the O(n²) cross join —
    at 10^9 docs the join key (band_id, band_hash) hash-distributes
    evenly, so no skew mitigation is needed unless one text dominates
    the corpus (then: salt the degenerate band key)."""
    sig = minhash_signatures(docs)
    bands = sig.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws("|", *[F.col(f"mh{b * BAND_SIZE + j}") for j in range(BAND_SIZE)])
            ).alias(f"band{b}")
            for b in range(N_MINHASH // BAND_SIZE)
        ],
    )
    stacked = bands.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_id"), F.col(f"band{b}").alias("band_hash"))
                for b in range(N_MINHASH // BAND_SIZE)
            ])
        ).alias("bb"),
    ).select("doc_id", "bb.band_id", "bb.band_hash")
    pairs = (
        stacked.alias("a")
        .join(
            stacked.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sig_a = sig.select(
        F.col("doc_id").alias("doc_a"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(N_MINHASH)]
    )
    sig_b = sig.select(
        F.col("doc_id").alias("doc_b"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(N_MINHASH)]
    )
    agree = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    return (
        pairs.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(float(N_MINHASH)), 4).alias("jaccard_est"),
        )
    )


def lsh_candidate_pairs_sql() -> str:
    n_bands = N_MINHASH // BAND_SIZE
    band_exprs = ", ".join(
        "md5("
        + " || '|' || ".join(f"mh{b * BAND_SIZE + j}" for j in range(BAND_SIZE))
        + f") AS band{b}"
        for b in range(n_bands)
    )
    stack = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, band{b} AS band_hash FROM bands"
        for b in range(n_bands)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(N_MINHASH)
    )
    return f"""
        WITH w AS ({_WORDS_SQL}),
        sig AS (SELECT doc_id,
                {', '.join(f"min(md5('{i}|' || word)) AS mh{i}" for i in range(N_MINHASH))}
                FROM w GROUP BY doc_id),
        bands AS (SELECT doc_id, {band_exprs} FROM sig),
        stacked AS ({stack}),
        pairs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM stacked a JOIN stacked b
            ON a.band_id = b.band_id AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
        )
        SELECT p.doc_a, p.doc_b, round(({agree}) / {float(N_MINHASH)}, 4) AS jaccard_est
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b
    """


# --------------------------------------------------------------- simhash ---
def simhash(docs: DataFrame) -> DataFrame:
    """16-bit SimHash: per word-occurrence md5-derived bit votes,
    summed per doc, sign → bit. Entirely built-in expressions: one
    explode + one groupBy."""
    words = docs.select(
        "doc_id", F.explode(tokens_col(F.lower(F.col("text")))).alias("word")
    )
    h = F.conv(F.substring(F.md5(F.col("word")), 1, 15), 16, 10).cast("long")
    votes = [
        F.sum(
            F.when(((F.shiftright(h, i)).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = words.groupBy("doc_id").agg(*votes)
    sim = sum(
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_sql() -> str:
    h = md5_long_sql("word")
    votes = ", ".join(
        f"sum(CASE WHEN (({h} >> {i}) & 1) = 1 THEN 1 ELSE -1 END) AS v{i}"
        for i in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(SIMHASH_BITS)
    )
    return f"""
        WITH w AS (
          SELECT doc_id, unnest({tokens_sql('lower(text)')}) AS word FROM documents
        ),
        v AS (SELECT doc_id, {votes} FROM w GROUP BY doc_id)
        SELECT doc_id, CAST({sim} AS BIGINT) AS simhash FROM v
    """


# --------------------------------------------------- n-gram Jaccard (exact) -
def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.2) -> DataFrame:
    """Exact Jaccard over word n-gram sets for pairs sharing ≥1 n-gram.

    |A∩B| comes from the n-gram equi-join (grouped count), |A∪B| =
    |A|+|B|−|A∩B| — no cross join anywhere; the n-gram join key is the
    md5 of the n-gram, uniformly distributed."""
    toks = tokens_col(F.lower(F.col("text")))
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(0), F.size(toks) - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = docs.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, n))))
        ).alias("gram"),
    ).distinct()
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    inter = (
        grams.alias("a")
        .join(
            grams.alias("b"),
            (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("ga"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("gb"))
    jac = F.col("n_inter") / (F.col("ga") + F.col("gb") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(n: int = 3, threshold: float = 0.2) -> str:
    toks = tokens_sql("lower(text)")
    return f"""
        WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
        ti AS (
          SELECT doc_id, toks, unnest(range(1, len(toks) - {n} + 2)) AS i
          FROM t WHERE len(toks) >= {n}
        ),
        g AS (
          SELECT DISTINCT doc_id,
                 md5(array_to_string(toks[i : i + {n} - 1], ' ')) AS gram
          FROM ti
        ),
        sizes AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               round(CAST(n_inter AS DOUBLE) / (sa.n_grams + sb.n_grams - n_inter), 4)
                 AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n_grams + sb.n_grams - n_inter) >= {threshold}
    """
