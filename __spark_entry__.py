"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the engine's priority-scheduling kernel
(per-bucket budgeted top-k, the frontier scheduler of
scraper_spark/plans/frontier.py) run over sf0.001 testdata.

``queries()`` / ``oracle_sql()`` — one pair per operator family from
SURVEY.md §2 plus the training-data operators (dedup / similarity /
text analysis). Spark implementations live in ``scraper_spark``;
each oracle is ANSI-ish SQL DuckDB runs on the same parquet. Every
computed column is aliased identically on both sides; doubles are
rounded and timestamps formatted to strings so cross-engine
value-hashing is stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from scraper_spark.functions.hashes import bucket_col, bucket_sql
from scraper_spark.operators import dedup as D, similarity as S, text as X
from scraper_spark.sources.named_queries import expand as nq_expand


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# flagship
# =====================================================================
def entry(spark: SparkSession) -> DataFrame:
    """Priority-scheduling kernel over sf0.001: orders = frontier,
    custkey = host, budget 2 per md5-derived bucket (SURVEY §2.6/O3)."""
    sf = "/root/testdata/sf0.001"
    orders = _t(spark, sf, "orders")
    customer = _t(spark, sf, "customer")
    frontier = orders.withColumn(
        "host_bucket", bucket_col(F.col("o_custkey").cast("string"), 64)
    )
    w = W.partitionBy("host_bucket").orderBy("o_orderdate", "o_orderkey")
    sched = frontier.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= 2)
    return (
        sched.join(F.broadcast(customer), sched.o_custkey == customer.c_custkey)
        .select(
            "host_bucket",
            "rnk",
            "o_orderkey",
            "c_name",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("price"),
        )
        .orderBy("host_bucket", "rnk", "o_orderkey")
    )


# =====================================================================
# relational operator inventory (SURVEY §2) — spark side
# =====================================================================
def q_a1_groupby_minmax(spark, sf):
    # A1 (cn_postalcode.py:196-199): group-by min/max/count
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def q_a2_collect_list(spark, sf):
    # A2 (cn_postalcode.py:207-209): group-by collect-list (sorted for
    # determinism; emitted as a joined scalar so the driver's value-hash
    # — which can't hash raw Python lists — sees a plain string)
    return (
        _t(spark, sf, "documents")
        .groupBy("lang")
        .agg(
            F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
            F.count("*").alias("n_docs"),
        )
    )


def q_a3_rollup(spark, sf):
    # A3 (cn_postalcode.py:196-214): 3-level manual rollup → one ROLLUP
    region = _t(spark, sf, "region")
    nation = _t(spark, sf, "nation")
    customer = _t(spark, sf, "customer")
    j = customer.join(nation, customer.c_nationkey == nation.n_nationkey).join(
        region, nation.n_regionkey == region.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
            "n_cust",
            "sum_bal",
        )
    )


def q_a4_distinct(spark, sf):
    # A4 (db.py:189): distinct values
    return _t(spark, sf, "customer").select("c_mktsegment").distinct()


def q_a5_dedup_first_wins(spark, sf):
    # A5/§2.6 (db.py:38-54): windowed keep-one-per-key (latest order/cust)
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("latest_date"),
        )
    )


def q_a6_len_profile(spark, sf):
    # A6 (utility_commons.py:116-120): per-column max-length, floor 50
    c = _t(spark, sf, "customer")
    return c.agg(
        *[
            F.greatest(F.max(F.length(col)), F.lit(50)).alias(f"len_{col}")
            for col in ["c_name", "c_mktsegment"]
        ]
    )


def q_j1_anti(spark, sf):
    # J1 (db.py:191-203): anti join — the url_seen/checkpoint operator
    customer = _t(spark, sf, "customer")
    big_orders = _t(spark, sf, "orders").where(F.col("o_totalprice") > 300000)
    return (
        customer.join(big_orders, customer.c_custkey == big_orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


def q_j2_semi(spark, sf):
    # J2 (db.py:38-54): semi join for dedup-delete
    customer = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_acctbal")
    )


def q_j3_left_agg(spark, sf):
    # J3 (cn_postalcode.py:216): left equi join onto grouped min/max
    nation = _t(spark, sf, "nation")
    cust = (
        _t(spark, sf, "customer")
        .groupBy("c_nationkey")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.count("*").alias("n_cust"),
        )
    )
    return nation.join(
        cust, nation.n_nationkey == cust.c_nationkey, "left"
    ).select("n_name", "min_bal", "max_bal", F.coalesce("n_cust", F.lit(0)).alias("n_cust"))


def q_j4_outer(spark, sf):
    # J4 (cn_postalcode.py:218): full outer join of two aggregates
    cust = (
        _t(spark, sf, "customer")
        .where(F.col("c_acctbal") > 5000)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("rich_cust"))
    )
    supp = (
        _t(spark, sf, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("rich_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("rich_cust", F.lit(0)).alias("rich_cust"),
            F.coalesce("rich_supp", F.lit(0)).alias("rich_supp"),
        )
    )


def q_j5_lateral_explode(spark, sf):
    # J5 (default_api.py:83-103): correlated row → 0..N rows with ref_ carry
    docs = _t(spark, sf, "documents")
    return (
        docs.select(
            F.col("doc_id").alias("ref_doc_id"),
            F.col("lang").alias("ref_lang"),
            F.explode(X.tokens_col(F.lower(F.col("text")))).alias("token"),
        )
        .where(F.length("token") >= 8)
    )


def q_j6_broadcast_lookup(spark, sf):
    # J6 (S8 lookup files): broadcast dim join
    region = _t(spark, sf, "region")
    nation = _t(spark, sf, "nation")
    customer = _t(spark, sf, "customer")
    dim = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        customer.join(F.broadcast(dim), customer.c_nationkey == dim.n_nationkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )


def q_u1_union(spark, sf):
    # U1 (cn_postalcode.py:205,214): column-aligned union then agg
    c = _t(spark, sf, "customer").select(
        F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal")
    )
    s = _t(spark, sf, "supplier").select(
        F.col("s_name").alias("name"), F.col("s_acctbal").alias("bal")
    )
    return (
        c.unionByName(s)
        .groupBy(F.substring("name", 1, 9).alias("prefix"))
        .agg(F.count("*").alias("n"), F.round(F.sum("bal"), 2).alias("sum_bal"))
    )


def q_p5_regex_extract(spark, sf):
    # P5 (haozu.py:48): regex ID extraction + P4 surrogate key
    return _t(spark, sf, "customer").select(
        "c_custkey",
        F.regexp_extract("c_name", r"(\d+)", 1).alias("id_str"),
        F.concat_ws("_", F.lit("cust"), F.regexp_extract("c_name", r"(\d+)", 1)).alias(
            "source_id"
        ),
    )


def q_p6_conditional_scaling(spark, sf):
    # P6 (haozu.py:75-79): unit-suffix conditional rescale with fallback
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").rlike("^1-"), F.round(F.col("o_totalprice") * 10, 2)
        )
        .otherwise(F.round(F.col("o_totalprice"), 2))
        .alias("scaled_price"),
    )


def q_p7_split(spark, sf):
    # P7 (diandianzu.py:77-80): compound-field split → two columns
    s = F.split(F.col("o_orderpriority"), "-")
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        s.getItem(0).alias("prio_num"),
        s.getItem(1).alias("prio_word"),
    )


def q_p8_regex_scrub(spark, sf):
    # P8/P9 (diandianzu.py:118-122, haozu.py:93): regex scrub + ws
    # collapse (explicit ws class — Java/RE2 \s diverge on \x0B)
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.trim(
            F.regexp_replace(
                F.regexp_replace("text", r"[.!?,;:]", ""), X.TOKEN_SPLIT, ","
            )
        ).alias("scrubbed"),
    )


def q_p12_truncate_nullify(spark, sf):
    # P12/P15 (haozu.py:127-136, db.py:101-102): 255-cap + blank→null
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.substring("text", 1, 255).alias("text_capped"),
        F.when(F.trim(F.col("text")) == "", None)
        .otherwise(F.trim(F.col("text")))
        .alias("text_nullified"),
        F.length(F.substring("text", 1, 255)).alias("capped_len"),
    )


def q_p3_json_flatten(spark, sf):
    # P3 (utility_commons.py:59-68): nested-JSON flatten → typed columns
    return _t(spark, sf, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        (F.get_json_object("props", "$.k").cast("int") * 2).alias("k2"),
    )


def q_o3_topk_per_group(spark, sf):
    # O3 (scrapers.py:84-92): budgeted top-k per group — the scheduler kernel
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk", F.round("o_totalprice", 2).alias("price"))
    )


def q_w_running_sum(spark, sf):
    # §2.6: running aggregate (replaces loop-position state)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        _t(spark, sf, "lineitem")
        .where(F.col("l_suppkey") <= 20)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_extendedprice").over(w), 2).alias("running_rev"),
        )
    )


def q_f4_contains(spark, sf):
    # F4 (baidu_api.py:64-69): substring containment OR-chain
    return _t(spark, sf, "documents").select(
        "doc_id",
        (
            F.col("text").contains("the")
            | F.col("text").contains("data")
            | F.col("text").contains("und")
        ).alias("hit"),
    )


def q_k2_content_hash(spark, sf):
    # K2 (db.py:97-99): content-hash surrogate ids (NEWID → md5)
    return _t(spark, sf, "customer").select(
        "c_custkey",
        F.substring(
            F.md5(F.concat_ws("|", F.col("c_name"), F.col("c_mktsegment"))), 1, 16
        ).alias("row_id"),
    )


def q_f9_inequality(spark, sf):
    # F9 (cn_postalcode.py:197): inequality filter on grouped output
    n = _t(spark, sf, "nation")
    return (
        n.alias("a")
        .join(n.alias("b"), F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        .where(F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b")
        )
    )


def q_t1_sessionize(spark, sf):
    # T-family (§2.11): sessionization = gap>600s cumsum (lag window)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # integer-ms epochs on BOTH engines, via INTEGER arithmetic: ts is
    # TIMESTAMP_NTZ; session tz is pinned UTC so ntz→timestamp→
    # unix_micros div 1000 mirrors DuckDB's epoch_ms(ts) exactly.
    # (Going through double seconds would double-round: micros → double
    # → ×1000 → floor can land 1 ms low on exact-ms timestamps and flip
    # a gap == 600001 ms session boundary.)
    ep_ms = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000")
    gap_ms = ep_ms - F.lag(ep_ms).over(w)
    marked = _t(spark, sf, "events").withColumn(
        "new_sess", F.when(gap_ms.isNull() | (gap_ms > 600_000), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "sess_id", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id").agg(
        F.max("sess_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


def q_t2_window_agg(spark, sf):
    # §2.11/streaming: tumbling 5-min aggregate (epoch-bucketed)
    return (
        _t(spark, sf, "events")
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 300) * 300).alias("win_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q_c_schedule_kernel(spark, sf):
    # the frontier scheduler on relational data: md5 host buckets (parity-
    # critical hash), budget-2 window top-k (plans/frontier.py:_schedule)
    orders = _t(spark, sf, "orders").withColumn(
        "host_bucket", bucket_col(F.col("o_custkey").cast("string"), 64)
    )
    w = W.partitionBy("host_bucket").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 2)
        .select(
            "host_bucket",
            "rnk",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


# ---- training-data operators ----------------------------------------
# The driver's correctness gate records at most 50 queries() entries
# (VERDICT r02), so the per-doc text operators ride TWO compound rows —
# each a single row-local projection covering several operators with no
# extra shuffle (operators/text.py token_counts / doc_profile; the
# standalone token_count/token_count_bpe/lang_id/quality_score/
# fingerprint operators remain the public API).
def q_x_token_counts(spark, sf):
    # whitespace token count + BPE-ish pre-tokenizer count, one row each
    return X.token_counts(_t(spark, sf, "documents"))


def q_x_doc_profile(spark, sf):
    # lang-id (stopword argmax) + quality score + md5 fingerprint
    return X.doc_profile(_t(spark, sf, "documents"))


def q_d_exact_dups(spark, sf):
    return D.exact_dup_groups(_t(spark, sf, "documents"))


def q_d_minhash_sig(spark, sf):
    return D.minhash_signatures(_t(spark, sf, "documents"))


BATCH_MOD = 7  # incremental-dedup split: doc_id % 7 == 0 is the "new batch"


def q_d_lsh_pairs(spark, sf):
    # MinHash-LSH near-dup pairs, BOTH execution shapes as one tagged
    # compound row (same 50-row-gate reasoning as the stored-ANN rows):
    # path='corpus' = the corpus-wide band self-join; path='incr'
    # (round 5) = the INCREMENTAL shape — a new-document batch
    # (doc_id % 7 == 0) deduped against the stored band/signature index
    # built from the rest of the corpus (operators/dedup.py
    # minhash_build_index + lsh_dedup_table: bucket-pruned band
    # equi-join + bucket-pruned signature verify, no corpus self-join).
    docs = _t(spark, sf, "documents")
    # ONE signature aggregate (the dominant explode+md5 stage) shared
    # by all three consumers via signatures= — the same reuse the
    # streaming ingest path does; signatures are per-doc, so the two
    # split-side frames are filters of the cached whole. Registered in
    # the dedup thread cache so the standard lifecycle (released on
    # the thread's next materializing dedup call) applies.
    sig = D.register_signature_cache(
        D.minhash_signatures(docs).persist(), rotate=True
    )
    corpus_pairs = D.lsh_candidate_pairs(docs, signatures=sig).select(
        F.lit("corpus").alias("path"), "*"
    )
    is_batch = F.col("doc_id") % BATCH_MOD == 0  # unbound: docs OR sig
    bands_t = _scratch_table("mh_bands")
    sigs_t = _scratch_table("mh_sigs")
    D.minhash_build_index(
        docs.where(~is_batch), bands_t, sigs_t, signatures=sig.where(~is_batch)
    )
    incr = D.lsh_dedup_table(
        spark, bands_t, sigs_t, docs.where(is_batch),
        signatures=sig.where(is_batch),
    ).select(F.lit("incr").alias("path"), "*")
    return corpus_pairs.unionByName(incr)


def q_d_simhash(spark, sf):
    return D.simhash(_t(spark, sf, "documents"))


def q_d_ngram_jaccard(spark, sf):
    return D.ngram_jaccard_pairs(_t(spark, sf, "documents"))


def q_s_cosine_topk(spark, sf):
    return S.cosine_topk(_t(spark, sf, "embeddings"))


# (n_bits pinned to 8 in q_s_lsh_topk below so the static SQL oracle
# mirrors the buckets; production derives B via
# similarity.auto_sign_bits(corpus, dim))
def _both_paths_sql(sql: str) -> str:
    """Oracle for a tagged inline/stored compound ANN row: the two
    Spark branches are result-identical, so the twin is the same
    subquery under both tags."""
    return (
        f"SELECT 'inline' AS path, * FROM ({sql}) "
        f"UNION ALL SELECT 'stored' AS path, * FROM ({sql})"
    )


ANN_TABLE_QIDS = [0, 3, 17]  # query-table vec_ids for the batched branch


_SCRATCH = [None]


def _scratch_table(name: str):
    """Session-scoped scratch TableIO for the stored-ANN driver rows:
    one pid-keyed root under the system temp dir, each table dir wiped
    before rebuild, the whole root removed at interpreter exit — so
    repeated check_oracle / bench / sweep runs leave /tmp clean
    (VERDICT r04 #6). pid-keyed so a concurrent pytest and driver run
    cannot clobber each other's live index mid-query."""
    import atexit
    import shutil
    import tempfile

    from scraper_spark.sources.tableio import TableIO

    if _SCRATCH[0] is None:
        root = os.path.join(
            tempfile.gettempdir(), f"scraper_spark_scratch_{os.getpid()}"
        )
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _SCRATCH[0] = root
    path = os.path.join(_SCRATCH[0], name)
    shutil.rmtree(path, ignore_errors=True)
    return TableIO(path)


def q_s_neardup_pairs(spark, sf):
    return S.neardup_pairs(_t(spark, sf, "embeddings"), n_bits=8)


def q_s_ivf_topk(spark, sf):
    # IVF-flat ANN, BOTH execution paths as one tagged compound row
    # (the registry is capped at the driver's 50-row gate — merge, do
    # not append, per the r2 verdict): path='inline' re-assigns vectors
    # inline (deterministic pinned centroids, nprobe=4 of 16 lists);
    # path='stored' materializes the inverted lists hive-partitioned by
    # cid (VERDICT r03 #3) and queries them with driver-side centroid
    # ranking so the probed cids are literals and the scan
    # partition-prunes to the nprobe lists. The two branches are
    # result-identical by construction, and the oracle mirrors the
    # same SQL under both tags — the row proves the storage layout
    # changes nothing but the plan. path='table:<qid>' (round 5) is
    # the BATCHED query-table probe (S.ivf_topk_table — one dataflow
    # for N queries, no driver loop) against the same stored lists,
    # whose oracle is the per-qid windowed twin.
    emb = _t(spark, sf, "embeddings")
    inline = S.ivf_topk(emb).select(F.lit("inline").alias("path"), "*")
    table = _scratch_table("ivf_lists")
    S.ivf_build_lists(emb, table)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    stored = S.ivf_topk_from_lists(
        spark, table, qvec, exclude_vec_id=0
    ).select(F.lit("stored").alias("path"), "*")
    batched = S.ivf_topk_table(
        spark, table, emb.where(F.col("vec_id").isin(ANN_TABLE_QIDS))
    ).select(
        F.concat(F.lit("table:"), F.col("qid").cast("string")).alias("path"),
        "vec_id",
        "label",
        "cid",
        "cosine",
    )
    return inline.unionByName(stored).unionByName(batched)


def q_s_lsh_topk(spark, sf):
    # sign-LSH ANN, BOTH execution paths as one tagged compound row
    # (same 50-row-gate reasoning as q_s_ivf_topk): path='inline' =
    # hamming-1 multi-probe equi-join over the computed buckets;
    # path='stored' = the bucket-partitioned index table queried with
    # driver-side bit-arithmetic probe keys (static partition pruning,
    # test_lsh_buckets_partition_pruned). Result-identical branches,
    # one oracle SQL under both tags. path='table:<qid>' (round 5) is
    # the BATCHED query-table probe (S.lsh_topk_table — probe keys as
    # exploded columns, one equi-join, touched-bucket scan pruning)
    # with a per-qid windowed oracle twin.
    emb = _t(spark, sf, "embeddings")
    inline = S.lsh_bucketed_topk(emb, n_bits=8).select(
        F.lit("inline").alias("path"), "*"
    )
    table = _scratch_table("lsh_buckets")
    S.lsh_build_buckets(emb, table, n_bits=8)
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    stored = S.lsh_topk_from_buckets(
        spark, table, qvec, n_bits=8, probe_hamming=1, exclude_vec_id=0
    ).select(F.lit("stored").alias("path"), "*")
    batched = S.lsh_topk_table(
        spark,
        table,
        emb.where(F.col("vec_id").isin(ANN_TABLE_QIDS)),
        n_bits=8,
        probe_hamming=1,
    ).select(
        F.concat(F.lit("table:"), F.col("qid").cast("string")).alias("path"),
        "vec_id",
        "label",
        "bucket",
        "cosine",
    )
    return inline.unionByName(stored).unionByName(batched)


# ---- pytest-only families promoted to driver rows (VERDICT r01 §2) ---
def q_g_geo_datum(spark, sf):
    # Sc6 (utility_geocode.py:13-96): WGS-84→GCJ-02→BD-09 + approx
    # inverse, vectorized pandas UDFs; oracle mirrors the trig series
    # operation-for-operation in SQL (functions/geo.py)
    from scraper_spark.functions import geo as G

    src = _t(spark, sf, "customer").select(
        "c_custkey",
        (F.lit(60.0) + (F.col("c_custkey") % 9000) * F.lit(0.01)).alias("lon"),
        (F.lit(-10.0) + (F.col("c_custkey") % 7000) * F.lit(0.01)).alias("lat"),
    )
    g = (
        src.withColumn("g", G.wgs84_to_gcj02_udf("lon", "lat"))
        .withColumn("bd", G.gcj02_to_bd09_udf(F.col("g.lon"), F.col("g.lat")))
        .withColumn("bk", G.gcj02_to_wgs84_udf(F.col("g.lon"), F.col("g.lat")))
    )
    return g.select(
        "c_custkey",
        F.round("g.lon", 4).alias("gcj_lon"),
        F.round("g.lat", 4).alias("gcj_lat"),
        F.round("bd.lon", 4).alias("bd_lon"),
        F.round("bd.lat", 4).alias("bd_lat"),
        F.round("bk.lon", 4).alias("back_lon"),
        F.round("bk.lat", 4).alias("back_lat"),
    )


def q_b_bloom_probe(spark, sf):
    # A+ Bloom aggregate (plans/seen.py): distributed segment build +
    # Arrow-batched probe; the oracle reproduces the md5 bit arithmetic
    # relationally — false positives and all (probe_oracle_sql)
    import pandas as pd

    from scraper_spark.plans import seen as B

    members = _t(spark, sf, "customer").select(
        F.concat(F.lit("url:"), F.col("c_custkey").cast("string")).alias("canon_url")
    )
    segs = B.merge_segment_frames([B.build_segments(members).toPandas()])
    bc = spark.sparkContext.broadcast(segs)
    cands = (
        _t(spark, sf, "orders")
        .select(
            F.concat(F.lit("url:"), (F.col("o_custkey") * 2).cast("string")).alias("s")
        )
        .distinct()
    )

    def mark(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {"candidate": pdf["s"], "maybe": B.probe(pdf["s"], bc.value)}
            )

    return cands.mapInPandas(mark, "candidate string, maybe boolean")


def q_i_phash_band_dedup(spark, sf):
    # I6 banded Hamming join (operators/phash_dedup.py) on 60-bit
    # md5-derived hashes + planted 1-bit variants; the oracle is the
    # brute-force all-pairs ground truth — equality PROVES the banding
    # complete for hamming ≤ 3 (pigeonhole bound). Tagged compound row
    # (round 5): path='corpus' = the corpus-wide band self-join;
    # path='incr' = the INCREMENTAL image-dedup shape — the
    # id % 7 == 0 batch probed against the STORED band index built
    # from the rest (phash_build_index + phash_dedup_table: one
    # bucket-pruned equi-join, no corpus self-join; 1000000 % 7 == 1,
    # so each planted base/variant pair straddles the split for
    # id % 7 in {0, 6} and the incr branch is non-trivial). The
    # brute-force cross-set oracle proves the stored path complete.
    from scraper_spark.functions.hashes import md5_long_col
    from scraper_spark.operators.phash_dedup import (
        phash_build_index,
        phash_dedup_table,
        phash_near_dup_pairs,
    )

    # explicit whitespace class, NOT \s: Java \s includes \x0B, RE2's
    # does not — with \s a vertical tab would hash differently on the
    # two engines (ADVICE r02; same class as operators/text.py)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), X.TOKEN_SPLIT, " "))
    base = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("id"), md5_long_col(norm).alias("ph"), "doc_id"
    )
    variant = base.select(
        (F.col("id") + 1000000).alias("id"),
        F.expr("ph ^ shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 60 AS INT))").alias(
            "ph"
        ),
    )
    corpus = base.select("id", "ph").unionByName(variant)
    pairs = phash_near_dup_pairs(
        corpus, max_hamming=3, id_col="id", phash_col="ph"
    ).select(F.lit("corpus").alias("path"), "*")
    is_batch = F.col("id") % BATCH_MOD == 0
    t = _scratch_table("ph_bands")
    phash_build_index(corpus.where(~is_batch), t, id_col="id", phash_col="ph")
    incr = phash_dedup_table(
        spark, t, corpus.where(is_batch), max_hamming=3, id_col="id", phash_col="ph"
    ).select(F.lit("incr").alias("path"), "*")
    return pairs.unionByName(incr)


def q_k_dml_endstate(spark, sf):
    # K4/K5/T7 (handlers/db.py:160-169, 254-276, 38-54): DELETE →
    # UPDATE → MERGE on the TableIO snapshot seam; output = final table
    # state, oracle = the same DML as plain relational algebra
    base = _t(spark, sf, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    t = _scratch_table("dml_endstate")
    t.append(base)
    t.delete_where(spark, F.col("c_acctbal") < 0)
    t.update_set(
        spark,
        F.col("c_mktsegment") == "BUILDING",
        {"c_acctbal": F.round(F.col("c_acctbal") * 2, 2)},
    )
    incoming = base.where(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.concat(F.lit("upserted_"), F.col("c_custkey").cast("string")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    t.merge_upsert(spark, incoming, "c_custkey")
    return t.read(spark).select(
        "c_custkey",
        "c_name",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


def q_p11_attrs_map(spark, sf):
    # P11 (haozu.py:107-118, diandianzu.py:110-112): open KV bag lifted
    # into a MapType attrs column (map_from_entries) + element_at
    # lookups — the dynamic-attribute operator SURVEY §1.2 promised
    ev = _t(spark, sf, "events")
    entries = F.array(
        F.struct(
            F.lit("k").alias("key"),
            F.get_json_object("props", "$.k").alias("value"),
        ),
        F.struct(F.lit("type").alias("key"), F.col("event_type").alias("value")),
    )
    m = F.map_from_entries(entries)
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k_val"),
        F.element_at(m, "type").alias("type_val"),
        F.size(m).alias("n_attrs"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("attr_keys"),
    )


def q_s3_paginated_enrich(spark, sf):
    # S3 (default_api.py:59-114): page += 1 until short page, ref_*
    # carry-through, explode_outer for empty results — the reusable
    # operator (operators/enrich.py); the "API" is orders paged by 8.
    # counts mode: the client reports per-key result counts, so the
    # whole enrichment is ONE lazy dataflow — no per-page isEmpty
    # actions, no page caches (VERDICT r02 #8)
    from scraper_spark.operators.enrich import enrich_paginated

    orders = _t(spark, sf, "orders")
    requests = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("ref_custkey"),
        F.col("c_mktsegment").alias("ref_segment"),
    )
    ps = 8
    counts = orders.groupBy(
        F.col("o_custkey").alias("ref_custkey")
    ).agg(F.count("*").alias("n_results"))

    def fetch_page(active, page):
        w = W.partitionBy("o_custkey").orderBy("o_orderkey")
        ranked = orders.withColumn("rn", F.row_number().over(w))
        pg = ranked.where(
            (F.col("rn") > page * ps) & (F.col("rn") <= (page + 1) * ps)
        )
        return active.join(pg, active.ref_custkey == pg.o_custkey).select(
            "ref_custkey",
            "ref_segment",
            "o_orderkey",
            (F.col("rn") - page * ps).cast("int").alias("slot"),
        )

    return enrich_paginated(
        requests, fetch_page, "ref_custkey", ps, max_pages=10, counts=counts
    )


def q_i_image_pipeline(spark, sf):
    # I1-I4+I6 (pam_invoice.py:143-153, baidu_api.py:149-154): render a
    # deterministic corpus keyed by doc_id, then crop → grayscale →
    # binarize → re-encode (fused Arrow stages, image_ops) → decode +
    # phash. Bytes can't cross into DuckDB → rows-only driver check;
    # bit-exactness of the codec itself is pytest-gated (test_imagecodec)
    import pandas as pd

    from scraper_spark.functions.image_ops import (
        binarize_images,
        crop_images,
        grayscale_images,
        resize_images,
    )
    from scraper_spark.functions.imagecodec import decode_image, encode_image, phash64
    from scraper_spark.sources.fixtures import _render_image

    docs = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 64)

    def render(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            data = [
                encode_image(_render_image(f"doc{int(d)}", 40, 40), "png")
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "bytes": data})

    imgs = docs.mapInPandas(render, "doc_id long, bytes binary")
    piped = binarize_images(
        grayscale_images(resize_images(crop_images(imgs, (4, 4, 36, 36)), 24, 24))
    )

    def finish(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for d, b in zip(pdf["doc_id"], pdf["bytes"]):
                img = decode_image(bytes(b))
                rows.append(
                    (
                        int(d),
                        int(img.shape[1]),
                        int(img.shape[0]),
                        phash64(img),
                        int((img > 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "w", "h", "phash", "white_px"]
            )

    return piped.mapInPandas(
        finish, "doc_id long, w int, h int, phash long, white_px long"
    )


def q_i_video_frames(spark, sf):
    # multimodal video plumbing (build brief): opaque binary video
    # column → mapInPandas frame sampler with REAL per-frame decode
    # (SGV1 container over the repo's own PNG codec) + phash. Bytes
    # can't cross into DuckDB → rows-only.
    import pandas as pd

    from scraper_spark.functions.video_ops import encode_video, sample_frames
    from scraper_spark.sources.fixtures import _render_image

    docs = _t(spark, sf, "documents").select("doc_id").where(F.col("doc_id") < 16)

    def make(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for d in pdf["doc_id"]:
                frames = [
                    _render_image(f"vid{int(d)}f{i}", 24, 24) for i in range(5)
                ]
                rows.append((f"vid{int(d)}", encode_video(frames)))
            yield pd.DataFrame(rows, columns=["video_id", "vbytes"])

    videos = docs.mapInPandas(make, "video_id string, vbytes binary")
    return sample_frames(videos, every_n=2)


def q_p10_address_fields(spark, sf):
    # P10 (haozu.py:92-106): positional address tokenization — fixed
    # leading fields (district/area) + char-positional prefix + rest
    s = F.split(F.col("p_name"), " ")
    return _t(spark, sf, "part").select(
        "p_partkey",
        s.getItem(0).alias("district"),
        s.getItem(1).alias("area"),
        F.substring("p_name", 1, 6).alias("prefix6"),
        F.array_join(F.slice(s, 3, 100), " ").alias("rest"),
    )


def q_f_compound_gates(spark, sf):
    # F3 + F7 + F8 merged into one driver row (the three trivial filters
    # were individually invisible beyond the driver's 50-row gate cap —
    # VERDICT r02 #1); each branch keeps its reference semantics and is
    # tagged so the oracle mirrors branch-for-branch:
    #   dropna      — F3 (pandas .dropna at load, db.py:101-102):
    #                 blank→null then drop
    #   confidence  — F7 (baidu_api.py:86-90): len(code)==k ∧ prob>t
    #   skip_header — F8 (pam_invoice.py:62-64): drop the first row of
    #                 each source group (positional skip as a window)
    docs = _t(spark, sf, "documents")
    dropna = (
        docs.select(
            "doc_id",
            F.when(F.trim(F.col("text")) == "", None)
            .otherwise(F.col("text"))
            .alias("text"),
            "lang",
        )
        .na.drop(subset=["text", "lang"])
        .select(
            F.lit("dropna").alias("gate"),
            F.col("doc_id").cast("long").alias("rec_id"),
            F.col("lang").alias("attr"),
            F.lit(None).cast("double").alias("metric"),
        )
    )
    confidence = (
        _t(spark, sf, "events")
        .where((F.length("event_type") == 4) & (F.col("value") > 10.0))
        .select(
            F.lit("confidence").alias("gate"),
            F.col("event_id").cast("long").alias("rec_id"),
            F.col("event_type").alias("attr"),
            F.round("value", 2).alias("metric"),
        )
    )
    w = W.partitionBy("source").orderBy("doc_id")
    skip_header = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > 1)
        .select(
            F.lit("skip_header").alias("gate"),
            F.col("doc_id").cast("long").alias("rec_id"),
            F.col("source").alias("attr"),
            F.col("rn").cast("double").alias("metric"),
        )
    )
    return dropna.unionByName(confidence).unionByName(skip_header)


def q_s7_named_query(spark, sf):
    # S7 (stored-proc source — reference EXEC call sites, SURVEY §2.1):
    # the named-query registry (sources/named_queries.py) executes a
    # versioned parameterized SQL template against a bound view; the
    # oracle runs the SAME expanded template text on DuckDB
    from scraper_spark.sources.named_queries import run_named

    _t(spark, sf, "customer").createOrReplaceTempView("s7_customer")
    return run_named(
        spark,
        "top_customers_by_balance",
        {"customer": "s7_customer"},
        segment="BUILDING",
        k=25,
    )


def q_u_set_ops(spark, sf):
    # U2 except + U3 intersect (db.py:200, 40,330-331) merged into one
    # tagged driver row (50-row gate cap, VERDICT r02 #1)
    cust_n = _t(spark, sf, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    supp_n = _t(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    rich_n = (
        _t(spark, sf, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    exc = cust_n.exceptAll(rich_n).select(
        F.lit("except").alias("op"), "nationkey"
    )
    inter = cust_n.intersect(supp_n).select(
        F.lit("intersect").alias("op"), "nationkey"
    )
    return exc.unionByName(inter)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "a1_groupby_minmax": q_a1_groupby_minmax,
        "a2_collect_list": q_a2_collect_list,
        "a3_rollup": q_a3_rollup,
        "a4_distinct": q_a4_distinct,
        "a5_dedup_first_wins": q_a5_dedup_first_wins,
        "a6_len_profile": q_a6_len_profile,
        "j1_anti": q_j1_anti,
        "j2_semi": q_j2_semi,
        "j3_left_agg": q_j3_left_agg,
        "j4_outer": q_j4_outer,
        "j5_lateral_explode": q_j5_lateral_explode,
        "j6_broadcast_lookup": q_j6_broadcast_lookup,
        "u1_union": q_u1_union,
        "u_set_ops": q_u_set_ops,
        "s7_named_query": q_s7_named_query,
        "p5_regex_extract": q_p5_regex_extract,
        "p6_conditional_scaling": q_p6_conditional_scaling,
        "p7_split": q_p7_split,
        "p8_regex_scrub": q_p8_regex_scrub,
        "p12_truncate_nullify": q_p12_truncate_nullify,
        "p3_json_flatten": q_p3_json_flatten,
        "o3_topk_per_group": q_o3_topk_per_group,
        "w_running_sum": q_w_running_sum,
        "f4_contains": q_f4_contains,
        "f9_inequality": q_f9_inequality,
        "k2_content_hash": q_k2_content_hash,
        "t1_sessionize": q_t1_sessionize,
        "t2_window_agg": q_t2_window_agg,
        "c_schedule_kernel": q_c_schedule_kernel,
        "f_compound_gates": q_f_compound_gates,
        "x_token_counts": q_x_token_counts,
        "x_doc_profile": q_x_doc_profile,
        "d_exact_dups": q_d_exact_dups,
        "d_minhash_sig": q_d_minhash_sig,
        "d_lsh_pairs": q_d_lsh_pairs,
        "d_simhash": q_d_simhash,
        "d_ngram_jaccard": q_d_ngram_jaccard,
        "s_cosine_topk": q_s_cosine_topk,
        "s_lsh_topk": q_s_lsh_topk,
        "s_neardup_pairs": q_s_neardup_pairs,
        "s_ivf_topk": q_s_ivf_topk,
        "g_geo_datum": q_g_geo_datum,
        "b_bloom_probe": q_b_bloom_probe,
        "i_phash_band_dedup": q_i_phash_band_dedup,
        "k_dml_endstate": q_k_dml_endstate,
        "p11_attrs_map": q_p11_attrs_map,
        "s3_paginated_enrich": q_s3_paginated_enrich,
        "i_image_pipeline": q_i_image_pipeline,
        "i_video_frames": q_i_video_frames,
        "p10_address_fields": q_p10_address_fields,
    }


# =====================================================================
# oracle SQL (DuckDB) — identical semantics + aliases
# =====================================================================
def oracle_sql() -> dict[str, str]:
    return {
        "a1_groupby_minmax": """
            SELECT l_returnflag, l_linestatus,
                   min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
                   count(*) AS n_rows, round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "a2_collect_list": """
            SELECT lang,
                   array_to_string(list_sort(list(DISTINCT source)), ',') AS sources,
                   count(*) AS n_docs
            FROM documents GROUP BY lang
        """,
        "a3_rollup": """
            SELECT coalesce(r_name, 'ALL') AS r_name,
                   coalesce(n_name, 'ALL') AS n_name,
                   count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "a4_distinct": "SELECT DISTINCT c_mktsegment FROM customer",
        "a5_dedup_first_wins": """
            SELECT o_custkey, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS latest_date
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey
              ) AS rn FROM orders
            ) WHERE rn = 1
        """,
        "a6_len_profile": """
            SELECT greatest(max(length(c_name)), 50) AS len_c_name,
                   greatest(max(length(c_mktsegment)), 50) AS len_c_mktsegment
            FROM customer
        """,
        "j1_anti": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000
            )
        """,
        "j2_semi": """
            SELECT c_custkey, c_acctbal FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
        "j3_left_agg": """
            WITH g AS (
              SELECT c_nationkey, round(min(c_acctbal), 2) AS min_bal,
                     round(max(c_acctbal), 2) AS max_bal, count(*) AS n_cust
              FROM customer GROUP BY c_nationkey
            )
            SELECT n_name, min_bal, max_bal, coalesce(n_cust, 0) AS n_cust
            FROM nation LEFT JOIN g ON n_nationkey = c_nationkey
        """,
        "j4_outer": """
            WITH c AS (
              SELECT c_nationkey, count(*) AS rich_cust FROM customer
              WHERE c_acctbal > 5000 GROUP BY c_nationkey
            ), s AS (
              SELECT s_nationkey, count(*) AS rich_supp FROM supplier
              WHERE s_acctbal > 5000 GROUP BY s_nationkey
            )
            SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
                   coalesce(rich_cust, 0) AS rich_cust,
                   coalesce(rich_supp, 0) AS rich_supp
            FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        """,
        "j5_lateral_explode": f"""
            SELECT * FROM (
              SELECT doc_id AS ref_doc_id, lang AS ref_lang,
                     unnest({X.tokens_sql('lower(text)')}) AS token
              FROM documents
            ) WHERE length(token) >= 8
        """,
        "j6_broadcast_lookup": """
            SELECT r_name, count(*) AS n_cust,
                   round(avg(c_acctbal), 2) AS avg_bal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "u1_union": """
            WITH u AS (
              SELECT c_name AS name, c_acctbal AS bal FROM customer
              UNION ALL
              SELECT s_name AS name, s_acctbal AS bal FROM supplier
            )
            SELECT substr(name, 1, 9) AS prefix, count(*) AS n,
                   round(sum(bal), 2) AS sum_bal
            FROM u GROUP BY 1
        """,
        "u_set_ops": """
            SELECT 'except' AS op, nationkey FROM (
              SELECT DISTINCT c_nationkey AS nationkey FROM customer
              EXCEPT
              SELECT DISTINCT c_nationkey AS nationkey FROM customer
              WHERE c_acctbal > 9000
            )
            UNION ALL
            SELECT 'intersect' AS op, nationkey FROM (
              SELECT DISTINCT c_nationkey AS nationkey FROM customer
              INTERSECT
              SELECT DISTINCT s_nationkey AS nationkey FROM supplier
            )
        """,
        "p5_regex_extract": """
            SELECT c_custkey, regexp_extract(c_name, '(\\d+)', 1) AS id_str,
                   'cust_' || regexp_extract(c_name, '(\\d+)', 1) AS source_id
            FROM customer
        """,
        "p6_conditional_scaling": """
            SELECT o_orderkey,
                   CASE WHEN regexp_matches(o_orderpriority, '^1-')
                        THEN round(o_totalprice * 10, 2)
                        ELSE round(o_totalprice, 2) END AS scaled_price
            FROM orders
        """,
        "p7_split": """
            SELECT o_orderkey,
                   string_split(o_orderpriority, '-')[1] AS prio_num,
                   string_split(o_orderpriority, '-')[2] AS prio_word
            FROM orders
        """,
        "p8_regex_scrub": f"""
            SELECT doc_id,
                   trim(regexp_replace(
                     regexp_replace(text, '[.!?,;:]', '', 'g'),
                     '{X.TOKEN_SPLIT}', ',', 'g'
                   )) AS scrubbed
            FROM documents
        """,
        "p12_truncate_nullify": """
            SELECT doc_id, substr(text, 1, 255) AS text_capped,
                   CASE WHEN trim(text) = '' THEN NULL ELSE trim(text) END
                     AS text_nullified,
                   length(substr(text, 1, 255)) AS capped_len
            FROM documents
        """,
        "p3_json_flatten": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS INT) AS k,
                   CAST(json_extract_string(props, '$.k') AS INT) * 2 AS k2
            FROM events
        """,
        "o3_topk_per_group": """
            SELECT o_custkey, o_orderkey, rnk, round(o_totalprice, 2) AS price
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ) AS rnk FROM orders
            ) WHERE rnk <= 3
        """,
        "w_running_sum": """
            SELECT l_suppkey, l_orderkey, l_linenumber,
                   round(sum(l_extendedprice) OVER (
                     PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ), 2) AS running_rev
            FROM lineitem WHERE l_suppkey <= 20
        """,
        "f4_contains": """
            SELECT doc_id,
                   (text LIKE '%the%' OR text LIKE '%data%' OR text LIKE '%und%')
                     AS hit
            FROM documents
        """,
        "f9_inequality": """
            SELECT a.n_name AS nation_a, b.n_name AS nation_b
            FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey
            WHERE a.n_nationkey < b.n_nationkey
        """,
        "k2_content_hash": """
            SELECT c_custkey,
                   substr(md5(c_name || '|' || c_mktsegment), 1, 16) AS row_id
            FROM customer
        """,
        "t1_sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), m AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN gap_ms IS NULL OR gap_ms > 600000 THEN 1 ELSE 0 END AS new_sess
              FROM g
            ), s AS (
              SELECT user_id,
                     sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS sess_id
              FROM m
            )
            SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM s GROUP BY user_id
        """,
        "t2_window_agg": """
            SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS win_start,
                   event_type, count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "c_schedule_kernel": f"""
            SELECT host_bucket, rnk, o_orderkey,
                   strftime(o_orderdate, '%Y-%m-%d') AS order_date
            FROM (
              SELECT o_orderkey, o_orderdate,
                     {bucket_sql("CAST(o_custkey AS VARCHAR)", 64)} AS host_bucket,
                     row_number() OVER (
                       PARTITION BY {bucket_sql("CAST(o_custkey AS VARCHAR)", 64)}
                       ORDER BY o_orderdate, o_orderkey
                     ) AS rnk
              FROM orders
            ) WHERE rnk <= 2
        """,
        # the oracle is the SAME expanded template the Spark side runs
        "s7_named_query": nq_expand(
            "top_customers_by_balance",
            {"customer": "customer"},
            {"segment": "BUILDING", "k": 25},
        ),
        "f_compound_gates": """
            SELECT 'dropna' AS gate, CAST(doc_id AS BIGINT) AS rec_id,
                   lang AS attr, CAST(NULL AS DOUBLE) AS metric
            FROM (
              SELECT doc_id,
                     CASE WHEN trim(text) = '' THEN NULL ELSE text END AS text,
                     lang
              FROM documents
            ) WHERE text IS NOT NULL AND lang IS NOT NULL
            UNION ALL
            SELECT 'confidence' AS gate, CAST(event_id AS BIGINT) AS rec_id,
                   event_type AS attr, round(value, 2) AS metric
            FROM events
            WHERE length(event_type) = 4 AND value > 10.0
            UNION ALL
            SELECT 'skip_header' AS gate, CAST(doc_id AS BIGINT) AS rec_id,
                   source AS attr, CAST(rn AS DOUBLE) AS metric
            FROM (
              SELECT doc_id, source, row_number() OVER (
                PARTITION BY source ORDER BY doc_id
              ) AS rn FROM documents
            ) WHERE rn > 1
        """,
        "x_token_counts": X.token_counts_sql(),
        "x_doc_profile": X.doc_profile_sql(),
        "d_exact_dups": D.exact_dup_groups_sql(),
        "d_minhash_sig": D.minhash_signatures_sql(),
        # d_lsh_pairs is a tagged compound row (round 5): path='corpus'
        # is the corpus-wide band self-join; path='incr' is the
        # INCREMENTAL shape — the doc_id % 7 == 0 batch deduped against
        # the stored band/signature index of the rest. The oracle
        # mirrors the split logically (cross-set band join), so the
        # union hash proves the stored-index path reproduces exactly
        # the cross-set subset of the LSH semantics.
        "d_lsh_pairs": (
            "SELECT 'corpus' AS path, * FROM ("
            + D.lsh_candidate_pairs_sql()
            + ") UNION ALL SELECT 'incr' AS path, * FROM ("
            + D.lsh_dedup_table_sql(
                f"doc_id % {BATCH_MOD} <> 0", f"doc_id % {BATCH_MOD} = 0"
            )
            + ")"
        ),
        "d_simhash": D.simhash_sql(),
        "d_ngram_jaccard": D.ngram_jaccard_pairs_sql(),
        "s_cosine_topk": S.cosine_topk_sql(),
        # s_lsh_topk / s_ivf_topk are tagged compound rows: the Spark
        # side runs the INLINE operator and its STORED-index twin
        # (partitioned table + pruned scan) and unions them under a
        # path tag; the branches are result-identical by construction,
        # so the oracle is deliberately the SAME SQL under both tags —
        # what differs Spark-side is only the storage layout + plan.
        # The third tag family 'table:<qid>' (round 5) is the BATCHED
        # query-table probe over the same stored index; its oracle is
        # the per-qid windowed twin, so the union hash covers all
        # three execution paths exactly.
        "s_lsh_topk": (
            _both_paths_sql(S.lsh_bucketed_topk_sql())
            + " UNION ALL "
            + S.lsh_topk_table_sql(ANN_TABLE_QIDS)
        ),
        "s_neardup_pairs": S.neardup_pairs_sql(),
        "s_ivf_topk": (
            _both_paths_sql(S.ivf_topk_sql())
            # the WITH-prefixed twin must be parenthesized to follow a
            # UNION ALL
            + " UNION ALL SELECT * FROM ("
            + S.ivf_topk_table_sql(ANN_TABLE_QIDS)
            + ")"
        ),
        "g_geo_datum": _geo_oracle_sql(),
        "b_bloom_probe": _bloom_oracle_sql(),
        "i_phash_band_dedup": _phash_band_oracle_sql(),
        "k_dml_endstate": """
            WITH base AS (
              SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
            ),
            d AS (SELECT * FROM base WHERE NOT (c_acctbal < 0)),
            u AS (
              SELECT c_custkey, c_name,
                     CASE WHEN c_mktsegment = 'BUILDING'
                          THEN round(c_acctbal * 2, 2) ELSE c_acctbal END
                       AS c_acctbal,
                     c_mktsegment
              FROM d
            ),
            inc AS (
              SELECT c_custkey,
                     'upserted_' || CAST(c_custkey AS VARCHAR) AS c_name,
                     CAST(0.0 AS DOUBLE) AS c_acctbal, c_mktsegment
              FROM base WHERE c_custkey % 10 = 0
            ),
            m AS (
              SELECT * FROM u
              WHERE c_custkey NOT IN (SELECT c_custkey FROM inc)
              UNION ALL SELECT * FROM inc
            )
            SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
                   c_mktsegment
            FROM m
        """,
        "p11_attrs_map": """
            SELECT event_id,
                   json_extract_string(props, '$.k') AS k_val,
                   event_type AS type_val,
                   2 AS n_attrs,
                   'k,type' AS attr_keys
            FROM events
        """,
        "s3_paginated_enrich": """
            WITH ranked AS (
              SELECT o_custkey, o_orderkey,
                     row_number() OVER (
                       PARTITION BY o_custkey ORDER BY o_orderkey
                     ) AS rn
              FROM orders
            ),
            pg AS (
              SELECT o_custkey, o_orderkey,
                     CAST(floor((rn - 1) / 8) AS INT) AS page,
                     CAST(rn - floor((rn - 1) / 8) * 8 AS INT) AS slot
              FROM ranked
              -- mirror the Spark side's max_pages=10 cap: without it
              -- the twin diverges as soon as a key has > 80 results
              WHERE floor((rn - 1) / 8) < 10
            )
            SELECT c.c_custkey AS ref_custkey, c.c_mktsegment AS ref_segment,
                   pg.o_orderkey, pg.slot, pg.page
            FROM customer c LEFT JOIN pg ON pg.o_custkey = c.c_custkey
        """,
        "p10_address_fields": """
            SELECT p_partkey,
                   string_split(p_name, ' ')[1] AS district,
                   string_split(p_name, ' ')[2] AS area,
                   substr(p_name, 1, 6) AS prefix6,
                   coalesce(array_to_string(string_split(p_name, ' ')[3:], ' '), '')
                     AS rest
            FROM part
        """,
        # i_image_pipeline AND i_video_frames: intentionally absent —
        # their outputs derive from binary image/video payloads DuckDB
        # can't decode, so both are deliberate rows-only driver rows
        # (CLAUDE.md driver contract); test_imagecodec/test_image_ops
        # and test_operators' video tests carry the bit-exactness gate
    }


def _geo_oracle_sql() -> str:
    from scraper_spark.functions.geo import datum_chain_oracle_sql

    src = """
        SELECT c_custkey,
               CAST(60.0 AS DOUBLE) + (c_custkey % 9000) * CAST(0.01 AS DOUBLE)
                 AS lon,
               CAST(-10.0 AS DOUBLE) + (c_custkey % 7000) * CAST(0.01 AS DOUBLE)
                 AS lat
        FROM customer
    """
    return datum_chain_oracle_sql(src, "c_custkey")


def _bloom_oracle_sql() -> str:
    from scraper_spark.plans.seen import probe_oracle_sql

    return probe_oracle_sql(
        "SELECT 'url:' || CAST(c_custkey AS VARCHAR) AS s FROM customer",
        "SELECT DISTINCT 'url:' || CAST(o_custkey * 2 AS VARCHAR) AS s FROM orders",
    )


def _phash_band_oracle_sql() -> str:
    # compound mirror of q_i_phash_band_dedup: 'corpus' = brute-force
    # all-pairs (id_a < id_b); 'incr' = the cross-set subset with
    # corpus-side id first — the ground truth the stored band index
    # must reproduce exactly
    from scraper_spark.functions.hashes import md5_long_sql

    norm = X.NORM_SQL  # explicit whitespace class — see q_i_phash_band_dedup
    return f"""
        WITH base AS (
          SELECT doc_id AS id, doc_id, {md5_long_sql(norm)} AS ph FROM documents
        ),
        var AS (
          SELECT id + 1000000 AS id,
                 xor(ph, CAST(1 AS BIGINT) << CAST(doc_id % 60 AS INT)) AS ph
          FROM base
        ),
        corpus AS (
          SELECT id, ph FROM base UNION ALL SELECT id, ph FROM var
        )
        SELECT 'corpus' AS path, a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        FROM corpus a JOIN corpus b ON a.id < b.id
        WHERE bit_count(xor(a.ph, b.ph)) <= 3
        UNION ALL
        SELECT 'incr' AS path, a.id AS id_a, b.id AS id_b,
               CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming
        FROM corpus a JOIN corpus b
          ON a.id % {BATCH_MOD} <> 0 AND b.id % {BATCH_MOD} = 0
         AND a.id <> b.id
        WHERE bit_count(xor(a.ph, b.ph)) <= 3
    """
