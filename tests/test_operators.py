"""Training-data operators: ground-truth recall checks that the SQL
oracle can't express (planted near-duplicates, phash banding)."""

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F

from scraper_spark.functions.imagecodec import hamming64
from scraper_spark.operators.phash_dedup import phash_near_dup_pairs


@pytest.fixture(scope="module")
def image_corpus(spark, fixture_dir):
    path = os.path.join(fixture_dir, "image_captions.parquet")
    return spark.read.parquet(path)


def test_phash_band_join_finds_planted_near_dups(spark, image_corpus):
    """The generator plants ~2% re-encoded copies (Hamming ≤ 4 by
    construction for most); the band join must find every pair the
    pigeonhole bound guarantees (hamming ≤ 3) and report correct
    distances."""
    pairs = phash_near_dup_pairs(image_corpus, max_hamming=4).toPandas()
    pdf = image_corpus.select("image_id", "phash").toPandas()
    ph = dict(zip(pdf.image_id, pdf.phash))
    # brute-force ground truth
    ids = sorted(ph)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if hamming64(ph[a], ph[b]) <= 3:
                truth.add((a, b))
    got3 = {
        (r.id_a, r.id_b) for r in pairs.itertuples() if r.hamming <= 3
    }
    assert truth <= got3, f"missed guaranteed pairs: {truth - got3}"
    for r in pairs.itertuples():
        assert hamming64(ph[r.id_a], ph[r.id_b]) == r.hamming
    assert len(pairs) > 0  # the plant actually produced collisions


def test_exact_dups_keeper_is_min(spark):
    from scraper_spark.operators.dedup import exact_dup_groups

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": ["same  Text", "same text", "other", "SAME TEXT"],
            }
        )
    )
    out = exact_dup_groups(df).toPandas()
    grp = out[out.n_copies == 3]
    assert len(grp) == 1 and grp.iloc[0].keeper_doc_id == 1


def test_minhash_identical_docs_share_signature(spark):
    from scraper_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "alpha beta gamma delta",
                    "alpha  beta gamma delta",  # same shingle set (ws-normalized)
                    "delta gamma beta alpha",   # same WORDS, different shingles
                    "epsilon zeta eta theta",
                ],
            }
        )
    )
    sigs = minhash_signatures(df).toPandas().set_index("doc_id")
    assert (sigs.loc[1] == sigs.loc[2]).all()  # same shingle set → same sig
    # shingling distinguishes reorderings a word-set minhash can't:
    assert not (sigs.loc[1] == sigs.loc[3]).all()
    assert not (sigs.loc[1] == sigs.loc[4]).all()


def test_lsh_materialize_invariant(spark):
    """Materializing the signature frame (default) must not change the
    pair set vs the pure three-subtree expression form, and the
    materialized plan must read the signatures from executor storage
    (one computation, three InMemoryTableScans) instead of recomputing
    the explode+md5 subtree three times (VERDICT r02 #3)."""
    import contextlib
    import io

    from scraper_spark.operators.dedup import (
        lsh_candidate_pairs,
        release_signature_cache,
    )

    base = "one two three four five six seven eight nine ten " * 3
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(8)),
                "text": [base + f" tail{i % 2}" for i in range(4)]
                + [f"unrelated corpus number {i} with different words {i*7}" for i in range(4)],
            }
        )
    )
    mat = lsh_candidate_pairs(df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mat.explain()
    assert "InMemoryTableScan" in buf.getvalue()
    a = mat.toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = (
        lsh_candidate_pairs(df, materialize=False)
        .toPandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0  # the near-dup cluster must actually collide
    release_signature_cache()


def test_lsh_cache_thread_scoped(spark):
    """The signature cache is per-thread (VERDICT r03 #7): a concurrent
    lsh_candidate_pairs call + release from ANOTHER thread must not
    unpersist the signature frame still feeding this thread's
    unmaterialized result."""
    import threading

    from scraper_spark.operators import dedup

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(6)),
                "text": [
                    f"alpha beta gamma delta epsilon zeta eta theta {i}"
                    for i in range(6)
                ],
            }
        )
    )
    pairs_a = dedup.lsh_candidate_pairs(df)
    sig_a = dedup._thread_sig_caches()[-1]
    assert sig_a.is_cached

    def other():
        dedup.lsh_candidate_pairs(df).count()
        dedup.release_signature_cache()

    t = threading.Thread(target=other)
    t.start()
    t.join()
    # the sibling's call + release must not have touched OUR cache
    assert sig_a.is_cached
    pairs_a.count()  # still materializes off the live cache
    dedup.release_signature_cache()
    assert not sig_a.is_cached


def test_simhash_close_for_similar_docs(spark):
    from scraper_spark.operators.dedup import simhash

    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [base, base + " extra", "completely different words here"],
            }
        )
    )
    out = simhash(df).toPandas().set_index("doc_id")["simhash"]
    near = bin(int(out[1]) ^ int(out[2])).count("1")
    far = bin(int(out[1]) ^ int(out[3])).count("1")
    assert near < far


def test_cosine_topk_self_similarity(spark):
    from scraper_spark.operators.similarity import cosine_topk

    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 1),
        (3, [-1.0, 0.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cosine_topk(df, query_vec_id=0, k=3).toPandas()
    assert list(out.vec_id) == [1, 2, 3]  # descending similarity
    assert out.cosine.iloc[0] > 0.99


def test_enrich_paginated_loop_and_outer(spark):
    """Page loop stops at the first short page; zero-result requests
    emit one null-payload row (default_api.py:59-114 semantics)."""
    from pyspark.sql import Window as W

    from scraper_spark.operators.enrich import enrich_paginated

    # req 1 → 0 items, req 2 → 2 items, req 3 → 3 (=page_size), req 4 → 7
    items = [(k, i) for k, n in [(2, 2), (3, 3), (4, 7)] for i in range(n)]
    lookup = spark.createDataFrame(items, "key int, item int")
    requests = spark.createDataFrame([(1,), (2,), (3,), (4,)], "key int")
    ps = 3

    def fetch_page(active, page):
        w = W.partitionBy("key").orderBy("item")
        ranked = lookup.withColumn("rn", F.row_number().over(w))
        pg = ranked.where(
            (F.col("rn") > page * ps) & (F.col("rn") <= (page + 1) * ps)
        )
        return active.join(pg, "key").select("key", "item")

    out = enrich_paginated(requests, fetch_page, "key", ps, max_pages=5).toPandas()
    by_key = out.groupby("key")
    assert len(out[out.key == 1]) == 1 and out[out.key == 1].item.isna().all()
    assert sorted(by_key.get_group(2).item) == [0, 1]
    assert sorted(by_key.get_group(3).item) == [0, 1, 2]
    assert sorted(by_key.get_group(4).item) == list(range(7))
    # page numbers: key 4's items 3..5 on page 1, item 6 on page 2
    k4 = out[out.key == 4].set_index("item")
    assert list(k4.loc[[0, 3, 6]].page) == [0, 1, 2]

    # counts mode (client reports result counts → one lazy dataflow,
    # zero per-page driver actions) must be output-identical, including
    # the exactly-one-full-page boundary (key 3: 3 results = page_size)
    counts = lookup.groupBy("key").agg(F.count("*").alias("n_results"))
    out2 = enrich_paginated(
        requests, fetch_page, "key", ps, max_pages=5, counts=counts
    ).toPandas()
    key_cols = ["key", "item", "page"]
    a = out[key_cols].sort_values(key_cols).reset_index(drop=True)
    b = out2[key_cols].sort_values(key_cols).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)

    # validate=True passes on truthful counts, and catches an
    # UNDER-reporting counts frame whose lie the fetched pages reveal
    # (ADVICE r03: silent page truncation becomes an error)
    out3 = enrich_paginated(
        requests, fetch_page, "key", ps, max_pages=5, counts=counts,
        validate=True,
    ).toPandas()
    assert len(out3) == len(out2)
    lying = counts.withColumn(
        "n_results",
        F.when(F.col("key") == 4, F.lit(2)).otherwise(F.col("n_results")),
    )
    with pytest.raises(ValueError, match="drift"):
        enrich_paginated(
            requests, fetch_page, "key", ps, max_pages=5, counts=lying,
            validate=True,
        ).count()

    # a SUPERSET counts table (keys never requested) is a natural
    # input and must NOT trip validation — those keys are never
    # fetched, so they are outside the expected domain (ADVICE r04)
    superset = counts.unionByName(
        spark.createDataFrame([(99, 5)], "key int, n_results long")
    )
    out4 = enrich_paginated(
        requests, fetch_page, "key", ps, max_pages=5, counts=superset,
        validate=True,
    ).toPandas()
    assert len(out4) == len(out2)

    # ...and an unrequested HOT key must not inflate the page loop
    # either: n_pages derives from the requested keys only, so a
    # superset key reporting 1000 results adds zero fetch rounds
    # (requested max is 7 results → ceil(7/3) = 3 pages, not 5)
    calls = []

    def counting_fetch(active, page):
        calls.append(page)
        return fetch_page(active, page)

    hot_superset = counts.unionByName(
        spark.createDataFrame([(99, 1000)], "key int, n_results long")
    )
    out5 = enrich_paginated(
        requests, counting_fetch, "key", ps, max_pages=5,
        counts=hot_superset, validate=True,
    ).toPandas()
    assert len(out5) == len(out2)
    assert calls == [0, 1, 2]


def test_auto_sign_bits_bounds():
    from scraper_spark.operators.similarity import auto_sign_bits

    assert auto_sign_bits(500, dim=64) == 4          # tiny corpus → floor
    assert auto_sign_bits(10**6, dim=64) == 10       # 1M/1024 buckets
    assert auto_sign_bits(10**9, dim=64) == 20       # 1G → ~1024/bucket
    assert auto_sign_bits(10**9, dim=8) == 8         # clamped to dim
    assert auto_sign_bits(2**40, dim=128) == 24      # hard cap


def test_lsh_recall_clustered(spark):
    """On a corpus WITH cluster structure, multi-probe sign-LSH reaches
    ≥ 0.9 of brute-force top-k recall while scanning a bounded bucket
    neighborhood. (On isotropic random data recall ≈ scanned fraction
    for ANY LSH — measured in probe_key_cols' docstring — so the
    guarantee is stated, and tested, for structured corpora.)"""
    import numpy as np

    from scraper_spark.operators.similarity import (
        auto_sign_bits,
        cosine_topk,
        lsh_bucketed_topk,
    )

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 32, 16, 50
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, rows = [], []
    for i in range(n_clusters * per):
        v = centers[i % n_clusters] + 0.05 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v], i % n_clusters))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    n_bits = auto_sign_bits(n_clusters * per, dim)
    recalls = []
    for q in [0, 3, 11]:
        truth = {r.vec_id for r in cosine_topk(df, query_vec_id=q, k=10).collect()}
        got = {
            r.vec_id
            for r in lsh_bucketed_topk(
                df, query_vec_id=q, k=10, n_bits=n_bits, probe_hamming=1
            ).collect()
        }
        recalls.append(len(truth & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_full_probe_equals_brute_force(spark):
    """nprobe == k_centroids means every inverted list is scanned —
    IVF must then return EXACTLY the brute-force top-k (the recall/
    cost dial has a closed top end)."""
    import numpy as np

    from scraper_spark.operators.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    brute = cosine_topk(df, query_vec_id=0, k=10).toPandas()
    full = ivf_topk(df, query_vec_id=0, k=10, k_centroids=8, nprobe=8).toPandas()
    assert list(full.vec_id) == list(brute.vec_id)
    assert list(full.cosine) == list(brute.cosine)
    # and a partial probe returns a subset of its own full-probe result
    part = ivf_topk(df, query_vec_id=0, k=10, k_centroids=8, nprobe=2).toPandas()
    assert set(part.vec_id) <= set(
        ivf_topk(df, query_vec_id=0, k=200, k_centroids=8, nprobe=8)
        .toPandas()
        .vec_id
    )


def test_ivf_kmeans_recall_clustered(spark):
    """Data-adaptive centroids (Lloyd k-means as DataFrame ops) must
    recover ≥ 0.9 of brute-force top-k recall on a clustered corpus at
    nprobe=4 of 16 lists — the regime where the first-k-ids pinned
    centroids are data-oblivious (VERDICT r02 #6). Also sanity: the
    centroid frame has exactly k rows of the embedding dimension."""
    import numpy as np

    from scraper_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(23)
    dim, n_clusters, per = 32, 16, 40
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(n_clusters * per):
        v = centers[i % n_clusters] + 0.05 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v], i % n_clusters))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    cents = kmeans_centroids(df, k=16, iters=3).persist()
    cpdf = cents.toPandas()
    assert len(cpdf) == 16
    assert all(len(v) == dim for v in cpdf.cvec)
    recalls = []
    for q in [0, 5, 13]:
        truth = {r.vec_id for r in cosine_topk(df, query_vec_id=q, k=10).collect()}
        got = {
            r.vec_id
            for r in ivf_topk(
                df, query_vec_id=q, k=10, nprobe=4, centroids=cents
            ).collect()
        }
        recalls.append(len(truth & got) / 10)
    cents.unpersist()
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_lists_partition_pruned(spark, tmp_path):
    """IVF inverted lists stored hive-partitioned by cid (VERDICT r03
    #3): the from-lists query must (a) show static PartitionFilters on
    cid — the scan opens only the nprobe probed lists — and (b) return
    exactly what the inline re-assigning ivf_topk returns."""
    import contextlib
    import io

    import numpy as np

    from scraper_spark.operators.similarity import (
        ivf_build_lists,
        ivf_topk,
        ivf_topk_from_lists,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    table = TableIO(str(tmp_path / "ivf_lists"))
    ivf_build_lists(df, table, k_centroids=8)
    qvec = df.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = ivf_topk_from_lists(
        spark, table, qvec, k=10, k_centroids=8, nprobe=2, exclude_vec_id=0
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters", 1)[1][:400]
    ref = ivf_topk(df, query_vec_id=0, k=10, k_centroids=8, nprobe=2).toPandas()
    gpdf = got.toPandas()
    assert list(gpdf.vec_id) == list(ref.vec_id)
    assert list(gpdf.cosine) == list(ref.cosine)


def test_lsh_buckets_partition_pruned(spark, tmp_path):
    """Stored sign-LSH buckets: the from-buckets query's probe keys are
    pure driver-side bit arithmetic (no collect), the scan opens ONLY
    the probed bucket partitions, and the result equals the inline
    lsh_bucketed_topk."""
    import numpy as np

    from scraper_spark.operators.similarity import (
        lsh_bucketed_topk,
        lsh_build_buckets,
        lsh_topk_from_buckets,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    table = TableIO(str(tmp_path / "lsh_buckets"))
    lsh_build_buckets(df, table, n_bits=8)
    qvec = df.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = lsh_topk_from_buckets(
        spark, table, qvec, k=10, n_bits=8, probe_hamming=1, exclude_vec_id=0
    )
    # single-root hive table → Catalyst static partition pruning: the
    # probed buckets (≤ 1 + 8 hamming-1 flips) appear as
    # PartitionFilters literals in the scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:400]
    ref = lsh_bucketed_topk(
        df, query_vec_id=0, k=10, n_bits=8, probe_hamming=1
    ).toPandas()
    gpdf = got.toPandas()
    assert list(gpdf.vec_id) == list(ref.vec_id)
    assert list(gpdf.cosine) == list(ref.cosine)


def test_lsh_topk_table_matches_point_probes(spark, tmp_path):
    """Batched query-TABLE probe against the stored sign-LSH index:
    per-qid results identical to N calls of the point API, and the
    index scan is pruned to the touched buckets (VERDICT r04 #1)."""
    import contextlib
    import io

    import numpy as np

    from scraper_spark.operators.similarity import (
        lsh_build_buckets,
        lsh_topk_from_buckets,
        lsh_topk_table,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    table = TableIO(str(tmp_path / "lsh_batch"))
    lsh_build_buckets(df, table, n_bits=8)
    qids = [0, 7, 42]
    queries = df.where(F.col("vec_id").isin(qids))
    got = lsh_topk_table(
        spark, table, queries, k=5, n_bits=8, probe_hamming=1
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1][:400]
    gpdf = got.toPandas()
    for qid in qids:
        qvec = rows[qid][1]
        ref = lsh_topk_from_buckets(
            spark, table, qvec, k=5, n_bits=8, probe_hamming=1,
            exclude_vec_id=qid,
        ).toPandas()
        mine = gpdf[gpdf.qid == qid]
        assert list(mine.vec_id) == list(ref.vec_id), f"qid {qid}"
        assert list(mine.cosine) == list(ref.cosine), f"qid {qid}"


def test_ivf_topk_table_matches_point_probes(spark, tmp_path):
    """Batched query-TABLE probe against the stored IVF lists: per-qid
    results identical to N point calls — in particular the in-Spark
    per-qid centroid ranking must agree with the point API's
    driver-side _seq_cosine ranking (bit-mirrored fold)."""
    import numpy as np

    from scraper_spark.operators.similarity import (
        ivf_build_lists,
        ivf_topk_from_lists,
        ivf_topk_table,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(5)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    table = TableIO(str(tmp_path / "ivf_batch"))
    ivf_build_lists(df, table, k_centroids=8)
    qids = [0, 13, 99]
    queries = df.where(F.col("vec_id").isin(qids))
    gpdf = ivf_topk_table(
        spark, table, queries, k=5, k_centroids=8, nprobe=2
    ).toPandas()
    for qid in qids:
        qvec = rows[qid][1]
        ref = ivf_topk_from_lists(
            spark, table, qvec, k=5, k_centroids=8, nprobe=2,
            exclude_vec_id=qid,
        ).toPandas()
        mine = gpdf[gpdf.qid == qid]
        assert list(mine.vec_id) == list(ref.vec_id), f"qid {qid}"
        assert list(mine.cosine) == list(ref.cosine), f"qid {qid}"


def test_lsh_stored_probe_short_qvec_matches_inline(spark, tmp_path):
    """Embedding dim < n_bits: sign_bucket_col reads element_at nulls
    as bit 0 (`null > 0` is false); the stored probe's driver-side bit
    arithmetic must mirror that instead of raising IndexError
    (ADVICE r04)."""
    import numpy as np

    from scraper_spark.operators.similarity import (
        lsh_bucketed_topk,
        lsh_build_buckets,
        lsh_topk_from_buckets,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=4)], i % 2) for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    table = TableIO(str(tmp_path / "lsh_short"))
    lsh_build_buckets(df, table, n_bits=8)  # dim 4 < 8 bits
    qvec = rows[0][1]
    got = lsh_topk_from_buckets(
        spark, table, qvec, k=5, n_bits=8, probe_hamming=1, exclude_vec_id=0
    ).toPandas()
    ref = lsh_bucketed_topk(
        df, query_vec_id=0, k=5, n_bits=8, probe_hamming=1
    ).toPandas()
    assert list(got.vec_id) == list(ref.vec_id)
    assert list(got.cosine) == list(ref.cosine)


def test_lsh_bucket_prunes(spark):
    from scraper_spark.operators.similarity import lsh_bucketed_topk, sign_bucket_col

    rows = [
        (0, [1.0] * 8, 0),
        (1, [1.0] * 8, 0),          # same bucket
        (2, [-1.0] * 8, 1),         # different bucket → pruned
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = lsh_bucketed_topk(df, query_vec_id=0, k=10).toPandas()
    assert list(out.vec_id) == [1]


def test_fetch_carries_attrs_kv_bag(spark, fixture_dir):
    """Detail pages carry an open KV attribute bag (haozu.py:107-118
    P11 semantics): the fetch stage surfaces it as a JSON column and
    from_json lifts it into a queryable MapType attrs map."""
    import json as _json
    import os as _os

    from scraper_spark.sources.page_store import fetch

    store = pd.read_parquet(_os.path.join(fixture_dir, "page_store.parquet"))
    details = store[(store.kind == "detail") & (store.status == 200)].head(20)
    sched = spark.createDataFrame(
        pd.DataFrame({"canon_url": details.canon_url, "attempt": 0})
    )
    fetched = fetch(sched, _os.path.join(fixture_dir, "page_store.parquet"))
    m = F.from_json("attrs", "map<string,string>")
    out = (
        fetched.select(
            "canon_url",
            F.element_at(m, "floor").alias("floor"),
            F.element_at(m, "area").alias("area"),
            F.size(F.map_keys(m)).alias("n_keys"),
        )
        .toPandas()
        .set_index("canon_url")
    )
    for row in details.itertuples():
        want = _json.loads(row.attrs)
        got = out.loc[row.canon_url]
        assert got.floor == want["floor"] and got.area == want["area"]
        assert got.n_keys == len(want)


def test_ws_class_parity_spark_vs_duckdb(spark):
    """The explicit whitespace class must tokenize/normalize/hash
    identically on Spark (Java regex) and DuckDB (RE2) — including
    \\x0B (vertical tab), the exact character on which Java's \\s and
    RE2's \\s disagree (ADVICE r02)."""
    import duckdb

    from scraper_spark.operators import text as X

    vals = [
        "plain words here",
        "vertical\x0btab inside",
        "mixed \t\n\r\f\x0b all classes",
        "\x0b leading and trailing \x0b",
        "no_whitespace_at_all",
        "",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(vals)), "text": vals})
    sdf = spark.createDataFrame(pdf)
    got_spark = (
        sdf.select(
            "doc_id",
            F.size(X.tokens_col(F.col("text"))).alias("n_tokens"),
            F.md5(
                F.trim(F.regexp_replace(F.lower(F.col("text")), X.TOKEN_SPLIT, " "))
            ).alias("fp"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    got_duck = (
        con.sql(
            f"""SELECT doc_id, len({X.tokens_sql('text')}) AS n_tokens,
                       md5({X.NORM_SQL}) AS fp
                FROM documents ORDER BY doc_id"""
        )
        .df()
        .reset_index(drop=True)
    )
    assert list(got_spark.n_tokens) == list(got_duck.n_tokens)
    assert list(got_spark.fp) == list(got_duck.fp)


# ------------------------------------------- incremental LSH dedup ----
def _incr_docs(spark):
    """14 docs with two planted near-dup clusters that SPAN the
    corpus/batch split (batch = doc_id % 3 == 0), plus unrelated
    filler. Cluster A: 0,1,2 (batch doc 0 vs corpus 1,2); cluster B:
    3,4 (batch doc 3 vs corpus 4)."""
    base_a = "one two three four five six seven eight nine ten " * 3
    base_b = "red orange yellow green blue indigo violet ultra infra deep " * 3
    texts = {
        0: base_a + "tail0",
        1: base_a + "tail0",
        2: base_a + "tail1",
        3: base_b + "end0",
        4: base_b + "end0",
    }
    for i in range(5, 14):
        texts[i] = f"unrelated corpus number {i} with different words {i * 7}"
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )


def test_lsh_dedup_table_matches_cross_subset(spark, tmp_path):
    """The stored-index incremental dedup (minhash_build_index +
    lsh_dedup_table) must reproduce EXACTLY the cross-set subset of
    the corpus-wide lsh_candidate_pairs self-join — same pairs, same
    jaccard_est — with the batch never joined against itself."""
    from scraper_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_dedup_table,
        minhash_build_index,
        release_signature_cache,
    )
    from scraper_spark.sources.tableio import TableIO

    docs = _incr_docs(spark)
    is_batch = F.col("doc_id") % 3 == 0
    batch_ids = {r[0] for r in docs.where(is_batch).select("doc_id").collect()}
    full = lsh_candidate_pairs(docs).toPandas()
    expected = sorted(
        (
            (a, b, j) if a not in batch_ids else (b, a, j)
            for a, b, j in zip(full.doc_a, full.doc_b, full.jaccard_est)
            if (a in batch_ids) != (b in batch_ids)
        )
    )
    assert expected, "fixture must plant cross-split near-dups"
    bands_t = TableIO(str(tmp_path / "bands"))
    sigs_t = TableIO(str(tmp_path / "sigs"))
    minhash_build_index(docs.where(~is_batch), bands_t, sigs_t)
    got = lsh_dedup_table(spark, bands_t, sigs_t, docs.where(is_batch)).toPandas()
    assert sorted(zip(got.doc_a, got.doc_b, got.jaccard_est)) == expected
    # batch-internal pair (0,3)-style rows must NOT appear
    assert not [r for r in zip(got.doc_a, got.doc_b) if r[0] in batch_ids]
    release_signature_cache()


def test_minhash_index_append_equals_rebuild(spark, tmp_path):
    """minhash_index_append folds a batch into the stored index with
    O(batch) work; probing the appended index must equal probing an
    index rebuilt from scratch on the union — the multi-root append
    path and the single-root rebuild are interchangeable."""
    from scraper_spark.operators.dedup import (
        lsh_dedup_table,
        minhash_build_index,
        minhash_index_append,
        release_signature_cache,
    )
    from scraper_spark.sources.tableio import TableIO

    docs = _incr_docs(spark)
    is_batch = F.col("doc_id") % 3 == 0
    corpus = docs.where(~is_batch)
    first, second = corpus.where(F.col("doc_id") < 5), corpus.where(F.col("doc_id") >= 5)
    at, st = TableIO(str(tmp_path / "ab")), TableIO(str(tmp_path / "as"))
    minhash_build_index(first, at, st)
    minhash_index_append(second, at, st)
    rt, rs = TableIO(str(tmp_path / "rb")), TableIO(str(tmp_path / "rs"))
    minhash_build_index(corpus, rt, rs)
    batch = docs.where(is_batch)
    got_a = lsh_dedup_table(spark, at, st, batch).toPandas()
    got_r = lsh_dedup_table(spark, rt, rs, batch).toPandas()
    key = lambda d: sorted(zip(d.doc_a, d.doc_b, d.jaccard_est))
    assert key(got_a) == key(got_r)
    assert len(got_a) > 0
    release_signature_cache()


def test_lsh_dedup_index_scan_pruned(spark, tmp_path):
    """Scan pruning on the stored dedup index, both layouts: a
    single-root (overwrite-only) index prunes via Catalyst
    PartitionFilters on bb; a multi-root (post-append) index prunes at
    the manifest level — TableIO.read lists only the touched bb= leaf
    dirs, verified via inputFiles()."""
    import contextlib
    import io

    from scraper_spark.operators.dedup import (
        lsh_dedup_table,
        minhash_build_index,
        minhash_index_append,
        release_signature_cache,
    )
    from scraper_spark.sources.tableio import TableIO

    docs = _incr_docs(spark)
    is_batch = F.col("doc_id") % 3 == 0
    bands_t = TableIO(str(tmp_path / "bands"))
    sigs_t = TableIO(str(tmp_path / "sigs"))
    minhash_build_index(docs.where(~is_batch), bands_t, sigs_t)
    got = lsh_dedup_table(spark, bands_t, sigs_t, docs.where(is_batch))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "bb" in plan.split("PartitionFilters", 1)[1][:400]
    # multi-root: append flips TableIO.read to manifest-level pruning
    minhash_index_append(docs.where(F.col("doc_id") == 13), bands_t, sigs_t)
    some_bb = int(
        bands_t.read(spark).select("bb").distinct().limit(1).collect()[0][0]
    )
    pruned = bands_t.read(spark, partitions={"bb": {some_bb}})
    files = pruned.inputFiles()
    assert files and all(f"bb={some_bb}/" in f for f in files)
    release_signature_cache()


def test_lsh_append_buckets_equals_rebuild(spark, tmp_path):
    """Sign buckets are stateless per vector, so build(first) +
    append(rest) must be row-identical to build(union), and probes
    against both indexes must agree exactly."""
    import numpy as np

    from scraper_spark.operators.similarity import (
        lsh_append_buckets,
        lsh_build_buckets,
        lsh_topk_from_buckets,
        lsh_topk_table,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    first, rest = df.where(F.col("vec_id") < 200), df.where(F.col("vec_id") >= 200)
    at = TableIO(str(tmp_path / "lsh_app"))
    lsh_build_buckets(first, at, n_bits=8)
    lsh_append_buckets(rest, at, n_bits=8)
    rt = TableIO(str(tmp_path / "lsh_reb"))
    lsh_build_buckets(df, rt, n_bits=8)
    ga = at.read(spark).select("vec_id", "bucket").toPandas().sort_values("vec_id")
    gr = rt.read(spark).select("vec_id", "bucket").toPandas().sort_values("vec_id")
    assert list(ga.vec_id) == list(gr.vec_id)
    assert list(ga.bucket) == list(gr.bucket)
    # probes agree: a point probe and a batched probe, appended vs rebuilt
    qvec = rows[250][1]
    pa = lsh_topk_from_buckets(spark, at, qvec, k=5, n_bits=8, exclude_vec_id=250).toPandas()
    pr = lsh_topk_from_buckets(spark, rt, qvec, k=5, n_bits=8, exclude_vec_id=250).toPandas()
    assert list(pa.vec_id) == list(pr.vec_id) and list(pa.cosine) == list(pr.cosine)
    queries = df.where(F.col("vec_id").isin([5, 250]))
    ta = lsh_topk_table(spark, at, queries, k=5, n_bits=8).toPandas()
    tr = lsh_topk_table(spark, rt, queries, k=5, n_bits=8).toPandas()
    key = lambda d: sorted(zip(d.qid, d.vec_id, d.cosine))
    assert key(ta) == key(tr)


def test_ivf_append_lists_equals_rebuild(spark, tmp_path):
    """IVF append assigns the batch against the STORED index's
    centroids (not the batch's own), so build(first) + append(rest)
    is assignment-identical to build(union) whenever the pinned
    first-k vectors live in `first` — and probes agree exactly."""
    import numpy as np

    from scraper_spark.operators.similarity import (
        ivf_append_lists,
        ivf_build_lists,
        ivf_topk_from_lists,
        ivf_topk_table,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(13)
    rows = [
        (i, [float(x) for x in rng.normal(size=16)], i % 3) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    first, rest = df.where(F.col("vec_id") < 200), df.where(F.col("vec_id") >= 200)
    at = TableIO(str(tmp_path / "ivf_app"))
    ivf_build_lists(first, at, k_centroids=8)
    ivf_append_lists(spark, at, rest, k_centroids=8)
    rt = TableIO(str(tmp_path / "ivf_reb"))
    ivf_build_lists(df, rt, k_centroids=8)
    ga = at.read(spark).select("vec_id", "cid").toPandas().sort_values("vec_id")
    gr = rt.read(spark).select("vec_id", "cid").toPandas().sort_values("vec_id")
    assert list(ga.vec_id) == list(gr.vec_id)
    assert list(ga.cid) == list(gr.cid)
    qvec = rows[250][1]
    pa = ivf_topk_from_lists(
        spark, at, qvec, k=5, k_centroids=8, nprobe=2, exclude_vec_id=250
    ).toPandas()
    pr = ivf_topk_from_lists(
        spark, rt, qvec, k=5, k_centroids=8, nprobe=2, exclude_vec_id=250
    ).toPandas()
    assert list(pa.vec_id) == list(pr.vec_id) and list(pa.cosine) == list(pr.cosine)
    queries = df.where(F.col("vec_id").isin([5, 250]))
    ta = ivf_topk_table(spark, at, queries, k=5, k_centroids=8, nprobe=2).toPandas()
    tr = ivf_topk_table(spark, rt, queries, k=5, k_centroids=8, nprobe=2).toPandas()
    key = lambda d: sorted(zip(d.qid, d.vec_id, d.cosine))
    assert key(ta) == key(tr)


# ---------------------------------------- stored pHash band index ----


def _ph_corpus(spark):
    """Synthetic 64-bit phashes with planted cross-split near-dups:
    id < 100 are random hashes; id 100+j is id j's hash with j%4+1 bit
    flips (hamming 1-4), so pairs (j, 100+j) are ground truth."""
    import numpy as np

    rng = np.random.default_rng(23)
    base = rng.integers(-(2**63), 2**63, size=100, dtype=np.int64)
    rows = [(int(i), int(h)) for i, h in enumerate(base)]
    for j in range(0, 100, 7):
        ph = int(base[j])
        for b in range(j % 4 + 1):
            ph ^= 1 << ((j * 5 + b * 13) % 64)
        rows.append((100 + j, ph))
    return spark.createDataFrame(rows, "image_id long, phash long")


def test_phash_dedup_table_matches_cross_subset(spark, tmp_path):
    """The stored-index incremental image dedup (phash_build_index +
    phash_dedup_table) must reproduce EXACTLY the cross-set subset of
    the corpus-wide banded self-join — same pairs, same hamming — with
    the batch never joined against itself."""
    from scraper_spark.operators.phash_dedup import (
        phash_build_index,
        phash_dedup_table,
    )
    from scraper_spark.sources.tableio import TableIO

    imgs = _ph_corpus(spark)
    is_batch = F.col("image_id") % 3 == 0
    batch_ids = {r[0] for r in imgs.where(is_batch).select("image_id").collect()}
    full = phash_near_dup_pairs(imgs, max_hamming=3).toPandas()
    expected = sorted(
        (a, b, h) if a not in batch_ids else (b, a, h)
        for a, b, h in zip(full.id_a, full.id_b, full.hamming)
        if (a in batch_ids) != (b in batch_ids)
    )
    assert expected, "fixture must plant cross-split near-dups"
    t = TableIO(str(tmp_path / "ph_bands"))
    phash_build_index(imgs.where(~is_batch), t)
    got = phash_dedup_table(spark, t, imgs.where(is_batch)).toPandas()
    assert sorted(zip(got.id_a, got.id_b, got.hamming)) == expected
    # batch-internal rows must NOT appear (id_a is always a corpus id)
    assert not [a for a in got.id_a if a in batch_ids]


def test_phash_index_append_equals_rebuild(spark, tmp_path):
    """Band keys are stateless bit slices, so build(first) +
    append(rest) must be row-identical to build(union), and probes
    against both indexes must agree exactly."""
    from scraper_spark.operators.phash_dedup import (
        phash_build_index,
        phash_dedup_table,
        phash_index_append,
    )
    from scraper_spark.sources.tableio import TableIO

    imgs = _ph_corpus(spark)
    is_batch = F.col("image_id") % 3 == 0
    corpus = imgs.where(~is_batch)
    first = corpus.where(F.col("image_id") < 60)
    rest = corpus.where(F.col("image_id") >= 60)
    at = TableIO(str(tmp_path / "ph_app"))
    phash_build_index(first, at)
    phash_index_append(rest, at)
    rt = TableIO(str(tmp_path / "ph_reb"))
    phash_build_index(corpus, rt)
    ga = at.read(spark).select("id", "ph").toPandas().sort_values(["id", "ph"])
    gr = rt.read(spark).select("id", "ph").toPandas().sort_values(["id", "ph"])
    assert list(ga.id) == list(gr.id) and list(ga.ph) == list(gr.ph)
    batch = imgs.where(is_batch)
    key = lambda d: sorted(zip(d.id_a, d.id_b, d.hamming))
    got_a = phash_dedup_table(spark, at, batch).toPandas()
    got_r = phash_dedup_table(spark, rt, batch).toPandas()
    assert key(got_a) == key(got_r)
    assert len(got_a) > 0


def test_phash_index_scan_pruned(spark, tmp_path):
    """Scan pruning on the stored pHash band index, both layouts:
    single-root prunes via Catalyst PartitionFilters on pb; multi-root
    (post-append) prunes at the TableIO manifest level (only touched
    pb= leaf dirs listed), verified via inputFiles()."""
    import contextlib
    import io

    from scraper_spark.operators.phash_dedup import (
        phash_build_index,
        phash_dedup_table,
        phash_index_append,
    )
    from scraper_spark.sources.tableio import TableIO

    imgs = _ph_corpus(spark)
    is_batch = F.col("image_id") % 3 == 0
    t = TableIO(str(tmp_path / "ph_bands"))
    phash_build_index(imgs.where(~is_batch), t)
    got = phash_dedup_table(spark, t, imgs.where(is_batch))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "pb" in plan.split("PartitionFilters", 1)[1][:400]
    phash_index_append(imgs.where(F.col("image_id") == 0), t)
    some_pb = int(t.read(spark).select("pb").distinct().limit(1).collect()[0][0])
    pruned = t.read(spark, partitions={"pb": {some_pb}})
    files = pruned.inputFiles()
    assert files and all(f"pb={some_pb}/" in f for f in files)


# ------------------------------------------- review-fix regressions ----


def test_dedup_table_replay_self_match_both_twins(spark, tmp_path):
    """Both batch-vs-stored-corpus twins share the replay semantic: a
    batch id already present in the index matches its stored self
    (jaccard 1.0 / hamming 0) and is reported, so a replayed
    micro-batch drops as dups of its stored selves instead of
    re-appending duplicate index entries (idempotent at-least-once
    ingest)."""
    from scraper_spark.operators.dedup import (
        lsh_dedup_table,
        minhash_build_index,
        release_signature_cache,
    )
    from scraper_spark.operators.phash_dedup import (
        phash_build_index,
        phash_dedup_table,
    )
    from scraper_spark.sources.tableio import TableIO

    docs = _incr_docs(spark)
    bt, st = TableIO(str(tmp_path / "rb")), TableIO(str(tmp_path / "rs"))
    minhash_build_index(docs, bt, st)
    replay = docs.where(F.col("doc_id").isin([5, 6]))
    hits = lsh_dedup_table(spark, bt, st, replay).toPandas()
    self_hits = hits[hits.doc_a == hits.doc_b]
    assert sorted(self_hits.doc_a) == [5, 6]
    assert (self_hits.jaccard_est == 1.0).all()
    release_signature_cache()

    imgs = _ph_corpus(spark)
    t = TableIO(str(tmp_path / "rp"))
    phash_build_index(imgs, t)
    rbatch = imgs.where(F.col("image_id").isin([7, 8]))
    ph = phash_dedup_table(spark, t, rbatch).toPandas()
    ph_self = ph[ph.id_a == ph.id_b]
    assert sorted(ph_self.id_a) == [7, 8]
    assert (ph_self.hamming == 0).all()


def test_ivf_centroid_sidecar(spark, tmp_path):
    """ivf_build_lists writes the k-row centroid sidecar; pinned-mode
    appends and probes read it (O(k), not an O(corpus) vec_id filter),
    and pre-sidecar indexes still work via the legacy fallback with
    identical results."""
    import shutil

    from scraper_spark.operators.similarity import (
        _ivf_centroids_sidecar,
        ivf_append_lists,
        ivf_build_lists,
        ivf_topk_from_lists,
    )
    from scraper_spark.sources.tableio import TableIO

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 80)
    batch = emb.where((F.col("vec_id") >= 80) & (F.col("vec_id") < 100))
    t = TableIO(str(tmp_path / "lists"))
    ivf_build_lists(base, t, k_centroids=8)
    side = _ivf_centroids_sidecar(t)
    assert side.exists()
    cents = side.read(spark).toPandas()
    assert sorted(cents.cid) == list(range(8))
    qvec = emb.where(F.col("vec_id") == 1).first()["embedding"]
    got_side = ivf_topk_from_lists(
        spark, t, qvec, k=5, k_centroids=8, nprobe=2, exclude_vec_id=1
    ).toPandas()
    # legacy fallback: same index without its sidecar answers identically
    t2 = TableIO(str(tmp_path / "lists2"))
    ivf_build_lists(base, t2, k_centroids=8)
    shutil.rmtree(_ivf_centroids_sidecar(t2).root)
    ivf_append_lists(spark, t2, batch, k_centroids=8)  # legacy centroid read
    ivf_append_lists(spark, t, batch, k_centroids=8)   # sidecar centroid read
    got_legacy = ivf_topk_from_lists(
        spark, t2, qvec, k=5, k_centroids=8, nprobe=2, exclude_vec_id=1
    ).toPandas()
    got_after = ivf_topk_from_lists(
        spark, t, qvec, k=5, k_centroids=8, nprobe=2, exclude_vec_id=1
    ).toPandas()
    key = lambda d: sorted(zip(d.vec_id, d.cosine))
    assert key(got_after) == key(got_legacy)
    assert len(got_side) == 5 and len(got_after) == 5


def test_minhash_index_keeps_caller_signature_cache(spark, tmp_path):
    """A caller-provided signatures= frame's cache belongs to the
    caller: minhash_build_index/minhash_index_append must not evict it
    (the streaming ingest path shares ONE persisted signature frame
    across three consumers)."""
    from scraper_spark.operators.dedup import (
        minhash_build_index,
        minhash_index_append,
        minhash_signatures,
    )
    from scraper_spark.sources.tableio import TableIO

    docs = _incr_docs(spark)
    sig = minhash_signatures(docs).persist()
    try:
        bt, st = TableIO(str(tmp_path / "cb")), TableIO(str(tmp_path / "cs"))
        minhash_build_index(docs, bt, st, signatures=sig)
        assert sig.is_cached
        minhash_index_append(docs.limit(0), bt, st, signatures=sig.limit(0))
        assert sig.is_cached
    finally:
        sig.unpersist()


def test_page_store_empty_parquet_clean_missing(spark, tmp_path):
    """A zero-row page_store must serve clean STATUS_MISSING lookups
    (combine_chunks() yields zero chunks on empty tables — chunk(0)
    would raise IndexError inside the executor)."""
    import pandas as pd_

    from scraper_spark.plans.spec import STATUS_MISSING
    from scraper_spark.sources import page_store as PS

    path = str(tmp_path / "empty_store.parquet")
    pd_.DataFrame(
        {
            "canon_url": pd_.Series([], dtype="string"),
            "status": pd_.Series([], dtype="int64"),
            "links": pd_.Series([], dtype="object"),
            "image_id": pd_.Series([], dtype="string"),
            "caption": pd_.Series([], dtype="string"),
        }
    ).to_parquet(path, index=False)
    client = PS.ParquetPageStoreClient(path)
    out = client.lookup_batch(
        pd_.Series(["http://a.example/"]), pd_.Series([0])
    )
    assert list(out.status) == [STATUS_MISSING]
    assert out.links.iloc[0] is None


def test_ivf_point_probe_pruned_after_append(spark, tmp_path):
    """ivf_topk_from_lists must scan only the probed cid partitions
    even on the multi-root (post-append) layout — a post-scan isin()
    would silently full-scan every snapshot (the multi-root read
    rebuilds cid from file paths, which Catalyst can't prune with)."""
    from scraper_spark.operators.similarity import (
        ivf_append_lists,
        ivf_build_lists,
        ivf_topk_from_lists,
    )
    from scraper_spark.sources.tableio import TableIO

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    t = TableIO(str(tmp_path / "plists"))
    ivf_build_lists(emb.where(F.col("vec_id") < 80), t, k_centroids=8)
    ivf_append_lists(
        spark, t, emb.where((F.col("vec_id") >= 80) & (F.col("vec_id") < 100)),
        k_centroids=8,
    )
    assert len(t.snapshots()) >= 2  # genuinely multi-root
    qvec = emb.where(F.col("vec_id") == 1).first()["embedding"]
    out = ivf_topk_from_lists(
        spark, t, qvec, k=5, k_centroids=8, nprobe=2, exclude_vec_id=1
    )
    files = out.inputFiles()
    cids = {f.split("cid=")[1].split("/")[0] for f in files if "cid=" in f}
    assert files and len(cids) <= 2  # nprobe partitions only


def test_ivf_sidecar_staleness_guard(spark, tmp_path):
    """A centroid sidecar left behind by a different (e.g. crashed or
    out-of-band) build must fail fast instead of silently probing with
    the previous quantization's centroids."""
    import pytest as _pytest

    from scraper_spark.operators.similarity import (
        ivf_build_lists,
        ivf_topk_from_lists,
    )
    from scraper_spark.sources.tableio import TableIO

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 60)
    t = TableIO(str(tmp_path / "slists"))
    ivf_build_lists(base, t, k_centroids=8)
    # simulate a rebuild that bumped the lists without the sidecar
    t.overwrite(t.read(spark), partition_by=["cid"])
    qvec = emb.where(F.col("vec_id") == 1).first()["embedding"]
    with _pytest.raises(ValueError, match="stale IVF centroid sidecar"):
        ivf_topk_from_lists(spark, t, qvec, k=5, k_centroids=8, nprobe=2)


def test_lsh_dedup_table_bounded_thread_cache(spark, tmp_path):
    """A per-batch driver loop calling lsh_dedup_table (no signatures=)
    must pin O(1) cached frames, not O(batches): each materializing
    call releases the previous call's thread-cache entries."""
    from scraper_spark.operators import dedup as D
    from scraper_spark.sources.tableio import TableIO

    docs = _incr_docs(spark)
    bt, st = TableIO(str(tmp_path / "lb")), TableIO(str(tmp_path / "ls"))
    D.minhash_build_index(docs.where(F.col("doc_id") % 3 != 0), bt, st)
    D.release_signature_cache()
    for _ in range(3):
        D.lsh_dedup_table(spark, bt, st, docs.where(F.col("doc_id") % 3 == 0)).count()
    # nsig + nbands + cand from the LAST call only
    assert len(D._thread_sig_caches()) <= 3
    D.release_signature_cache()


def test_ivf_sidecar_without_meta_trusted(spark, tmp_path):
    """A sidecar with no lists_sid.json (pre-guard build) IS the
    quantization the index was built with and must be used: for a
    kmeans-built (centroids=) index the legacy vec_id<k fallback would
    hand back arbitrary corpus vectors and silently mis-rank every
    probe."""
    import os as _os

    import numpy as np

    from scraper_spark.operators.similarity import (
        _ivf_centroids_sidecar,
        ivf_build_lists,
        ivf_topk_from_lists,
        kmeans_centroids,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], i % 2) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    table = TableIO(str(tmp_path / "ivf_meta"))
    ivf_build_lists(df, table, k_centroids=8, centroids=kmeans_centroids(df, k=8))
    qvec = rows[0][1]

    def probe():
        return ivf_topk_from_lists(
            spark, table, qvec, k=5, k_centroids=8, nprobe=2, exclude_vec_id=0
        ).toPandas()

    with_meta = probe()
    _os.remove(_os.path.join(_ivf_centroids_sidecar(table).root, "lists_sid.json"))
    without_meta = probe()
    assert list(without_meta.vec_id) == list(with_meta.vec_id)
    assert list(without_meta.cosine) == list(with_meta.cosine)


def test_probe_table_calls_rotate_thread_cache(spark, tmp_path):
    """A per-batch ANN enrichment loop (lsh_topk_table / ivf_topk_table
    per arriving batch) must pin O(1) cached frames, not O(batches):
    each call's probes pin releases the previous call's — the same
    lifecycle test_lsh_dedup_table_bounded_thread_cache pins for the
    dedup path."""
    import numpy as np

    from scraper_spark.operators import dedup as D
    from scraper_spark.operators.similarity import (
        ivf_build_lists,
        ivf_topk_table,
        lsh_build_buckets,
        lsh_topk_table,
    )
    from scraper_spark.sources.tableio import TableIO

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(size=8)], i % 2) for i in range(150)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = df.where(F.col("vec_id") < 3)
    lsh_t = TableIO(str(tmp_path / "rb"))
    lsh_build_buckets(df, lsh_t, n_bits=8)
    D.release_signature_cache()
    for _ in range(3):
        lsh_topk_table(spark, lsh_t, queries, k=3, n_bits=8).count()
    assert len(D._thread_sig_caches()) == 1  # last call's probes only
    ivf_t = TableIO(str(tmp_path / "rl"))
    ivf_build_lists(df, ivf_t, k_centroids=8)
    for _ in range(3):
        ivf_topk_table(spark, ivf_t, queries, k=3, k_centroids=8, nprobe=2).count()
    assert len(D._thread_sig_caches()) == 1
    D.release_signature_cache()
