"""Deterministic synthetic web-graph + image/caption corpus (seed=42).

The fetch substrate for the no-network sandbox (FIXTURES.md §1-3):

- ``page_store``   — the "web": list pages that paginate and stop at the
  first empty page (reference loop: handlers/scrapers.py:88-98) and
  detail pages that carry an image + caption payload
  (reference: handlers/diandianzu.py:71-72 image-URL-per-row). Hot-host
  skew is Zipf(s=1.2) on purpose — it exercises the salted scheduling.
- ``image_captions`` — exactly the BASELINE.json input_hint schema
  ``(image_id, bytes, w, h, fmt, caption, phash)``; ~2% near-duplicate
  rows (re-encoded copies, Hamming ≤ 4) as dedup ground truth.
- ``seeds`` + politeness config — shared verbatim by the oracle crawler
  and the Spark engine.

Everything derives from ``numpy.random.default_rng(seed)`` — no wall
clock, no global random (the reference's `random.randint` jitter —
handlers/haozu.py:41 — is exactly what the determinism ban removes).
Generation is pure pyarrow/pandas; Spark reads the parquet output.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd

from scraper_spark.functions.canon import canonicalize_url
from scraper_spark.functions.hashes import md5_hex
from scraper_spark.functions.imagecodec import (
    decode_image,
    encode_image,
    phash64,
)

LIST_PAGE_SIZE = 10
MAX_CROSS_LINKS = 3

_ADJ = ["quiet", "bright", "rusty", "vivid", "pale", "grand", "tiny", "bold",
        "明亮", "安静", "古老", "崭新"]
_NOUN = ["harbor", "lantern", "market", "garden", "bridge", "tower", "alley",
         "码头", "灯笼", "集市", "花园"]


def _noisy_variant(canon: str, rng: np.random.Generator) -> str:
    """Degrade a canonical URL (uppercase host / :80 / fragment / shuffled
    query) so the engine's canonicalization is actually exercised."""
    choice = rng.integers(0, 5)
    if choice == 0:
        return canon
    scheme, rest = canon.split("://", 1)
    host, _, path = rest.partition("/")
    path = "/" + path
    if choice == 1:
        host = host.upper()
    elif choice == 2:
        host = host + ":80"
    elif choice == 3:
        path = path + "#frag%d" % rng.integers(0, 100)
    elif choice == 4 and "?" in path:
        base, _, q = path.partition("?")
        pairs = q.split("&")
        rng.shuffle(pairs)
        path = base + "?" + "&".join(pairs)
    return f"{scheme}://{host}{path}"


def _caption(rng: np.random.Generator) -> str:
    return (
        f"{_ADJ[rng.integers(0, len(_ADJ))]} "
        f"{_NOUN[rng.integers(0, len(_NOUN))]} "
        f"{_ADJ[rng.integers(0, len(_ADJ))]}-{_NOUN[rng.integers(0, len(_NOUN))]}"
    )


def _render_image(image_id: str, w: int, h: int) -> np.ndarray:
    """Pixel content seeded from the image_id alone — deterministic
    regardless of generation order/parallelism."""
    rng = np.random.default_rng(int(md5_hex(image_id)[:8], 16))
    img = rng.integers(0, 256, (h, w, 3)).astype(np.float64)
    # low-pass the noise + stamp flat patches → realistic-ish, compressible
    for _ in range(2):
        img = (np.roll(img, 1, 0) + np.roll(img, -1, 0)
               + np.roll(img, 1, 1) + np.roll(img, -1, 1) + img) / 5
    n_patches = int(rng.integers(1, 4))
    for _ in range(n_patches):
        y0 = int(rng.integers(0, max(1, h - 8)))
        x0 = int(rng.integers(0, max(1, w - 8)))
        ph = int(rng.integers(4, min(24, h - y0) + 1))
        pw = int(rng.integers(4, min(24, w - x0) + 1))
        img[y0 : y0 + ph, x0 : x0 + pw] = rng.integers(0, 256, 3)
    return np.clip(img, 0, 255).astype(np.uint8)


def _encode_job(job: tuple[str, int, int, str, str]) -> dict:
    """Worker: render + encode + phash one image (process-pool safe)."""
    image_id, w, h, fmt, caption = job
    img = _render_image(image_id, w, h)
    data = encode_image(img, fmt)
    return dict(
        image_id=image_id, bytes=data, w=w, h=h, fmt=fmt, caption=caption,
        phash=phash64(decode_image(data)),
    )


def _reencode_job(job: tuple[str, bytes, str, int, int, str]) -> dict:
    """Worker: near-duplicate = re-encode existing bytes in the other fmt."""
    new_id, src_bytes, fmt, w, h, caption = job
    img = decode_image(bytes(src_bytes))
    data = encode_image(img, fmt)
    return dict(
        image_id=new_id, bytes=data, w=w, h=h, fmt=fmt, caption=caption,
        phash=phash64(decode_image(data)),
    )


# 256 buckets: a sparse round touching k images prunes the store scan
# to ≤ k of 256 partitions — with 64 buckets a 200-image politeness
# round hashed into ~all buckets and re-scanned the whole store (the
# engine's prune set and this layout share the same md5 derivation, so
# the constant must match the corpus it generated; the bench fixture
# fingerprint includes it)
N_IMAGE_BUCKETS = 256


def write_image_store(images_df: pd.DataFrame, path: str) -> None:
    """Write the image+caption payload table hive-partitioned by
    ``pbucket = md5_long(image_id) % N_IMAGE_BUCKETS`` (the
    Iceberg-analog of ``PARTITIONED BY (bucket(N, image_id))``,
    SURVEY §2.1 K3).

    The crawl's payload join carries the same derived bucket on its
    small side, so dynamic partition pruning skips untouched files on
    sparse rounds; bounded row groups keep full scans splittable."""
    import pyarrow as pa
    import pyarrow.parquet as papq
    import shutil

    from scraper_spark.functions.hashes import md5_long

    if images_df.empty:
        images_df = images_df.reindex(
            columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
        )
    df = images_df.assign(
        pbucket=[
            md5_long(i) % N_IMAGE_BUCKETS for i in images_df["image_id"]
        ]
        if len(images_df)
        else []
    )
    shutil.rmtree(path, ignore_errors=True)
    if os.path.exists(path):
        os.remove(path)
    papq.write_to_dataset(
        pa.Table.from_pandas(df, preserve_index=False),
        root_path=path,
        partition_cols=["pbucket"],
        max_rows_per_group=1_000,
        min_rows_per_group=200,
    )
    # the bucket modulus travels WITH the corpus: the engine's payload
    # join derives pbucket on its probe side and a modulus mismatch
    # (e.g. a corpus generated before a constant change) would silently
    # drop most images from the inner join
    with open(os.path.join(path, "_store_meta.json"), "w") as f:
        json.dump({"n_buckets": N_IMAGE_BUCKETS}, f)


def store_bucket_count(path: str) -> int:
    """Bucket modulus of an image store dir.

    Prefers the meta file; for corpora predating it, infers from the
    hive layout: md5-uniform ids populate EVERY bucket on any non-toy
    corpus, so when the pbucket= dirs are dense (count == max+1) the
    dir count IS the modulus. A wrong guess here silently drops rows
    from the payload inner join (observed: a 256-bucket corpus read
    with a 64 guess lost 75 % of images and inflated bench throughput
    2.4×), so density inference beats a hardcoded historical default;
    64 remains the last-resort fallback for sparse meta-less stores."""
    try:
        with open(os.path.join(path, "_store_meta.json")) as f:
            return int(json.load(f)["n_buckets"])
    except (FileNotFoundError, KeyError, ValueError):
        pass
    try:
        vals = sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(path)
            if e.startswith("pbucket=")
        )
    except (FileNotFoundError, NotADirectoryError, ValueError):
        vals = []
    if vals and vals[-1] + 1 == len(vals):
        return len(vals)
    return 64


def generate(
    out_dir: str,
    n_hosts: int = 20,
    n_urls: int = 2000,
    seed: int = 42,
    near_dup_rate: float = 0.02,
    default_tokens: int = 2,
    hot_tokens: int = 1,
    max_attempts: int = 3,
    image_rate: float = 1.0,
    pagination_fanout: int = 3,
    page_size: int = LIST_PAGE_SIZE,
    img_size: tuple[int, int] = (32, 128),
    recrawl_after_rounds: int | None = None,
) -> dict:
    """Materialize page_store / image_captions / seeds parquet + politeness
    JSON under ``out_dir``. Returns summary counts."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    # --- host sizes: Zipf(s=1.2) over ranks -----------------------------
    ranks = np.arange(1, n_hosts + 1, dtype=np.float64)
    weights = ranks ** -1.2
    weights /= weights.sum()
    n_detail = np.maximum(1, np.round(weights * n_urls)).astype(int)
    hosts = [f"h{i}.example" for i in range(n_hosts)]

    pages: list[dict] = []
    image_jobs: list[tuple] = []

    def detail_url(i: int, k: int) -> str:
        return f"http://{hosts[i]}/d/{k}"

    def list_url(i: int, p: int) -> str:
        return f"http://{hosts[i]}/list?page={p}&site=s{i}"

    all_detail = [
        (i, k) for i in range(n_hosts) for k in range(n_detail[i])
    ]

    for i in range(n_hosts):
        nd = n_detail[i]
        n_list = max(1, math.ceil(nd / page_size))
        for p in range(1, n_list + 1):
            canon = canonicalize_url(list_url(i, p))
            ks = range((p - 1) * page_size, min(p * page_size, nd))
            links = [_noisy_variant(detail_url(i, k), rng) for k in ks]
            # paginate forward with fanout (real list pages expose a
            # "page 1..N" strip) — keeps BFS depth ~n_list/fanout
            for nxt in range(p + 1, min(p + 1 + pagination_fanout, n_list + 1)):
                links.append(_noisy_variant(list_url(i, nxt), rng))
            # ~10% of list pages carry one dangling link
            if rng.random() < 0.10:
                links.append(f"http://{hosts[i]}/d/missing{int(rng.integers(0, 10**6))}")
            # ~15% duplicate targets: repeat one link
            if links and rng.random() < 0.15:
                links.append(links[int(rng.integers(0, len(links)))])
            status = 200  # list pages always resolve
            pages.append(
                dict(url=_noisy_variant(canon, rng), canon_url=canon,
                     host=hosts[i], kind="list", struct_depth=p - 1,
                     links=links, image_id=None, caption=None, status=status)
            )
        for k in range(nd):
            canon = canonicalize_url(detail_url(i, k))
            n_cross = int(rng.integers(0, MAX_CROSS_LINKS + 1))
            links = []
            for _ in range(n_cross):
                j, kk = all_detail[int(rng.integers(0, len(all_detail)))]
                links.append(_noisy_variant(detail_url(j, kk), rng))
            r = rng.random()
            status = 200 if r < 0.92 else (404 if r < 0.97 else 503)
            image_id = caption = None
            if status == 200 and rng.random() < image_rate:
                image_id = md5_hex(canon)
                w = int(rng.integers(img_size[0], img_size[1] + 1))
                h = int(rng.integers(img_size[0], img_size[1] + 1))
                fmt = "png" if rng.random() < 0.5 else "jpg"
                caption = _caption(rng)
                image_jobs.append((image_id, w, h, fmt, caption))
            # open KV attribute bag (reference: handlers/haozu.py:107-118
            # lifts arbitrary label/value rows per detail page — SURVEY
            # §1.2 P11): keys vary per page, values deterministic
            attrs = {"floor": f"F{int(rng.integers(1, 30))}",
                     "area": f"{int(rng.integers(20, 500))}㎡"}
            if rng.random() < 0.5:
                attrs["orient"] = ["南", "北", "东", "西"][int(rng.integers(0, 4))]
            pages.append(
                dict(url=_noisy_variant(canon, rng), canon_url=canon,
                     host=hosts[i], kind="detail", struct_depth=2,
                     links=links, image_id=image_id, caption=caption,
                     status=status, attrs=json.dumps(attrs, sort_keys=True,
                                                     ensure_ascii=False))
            )

    # --- render/encode images (parallel; content keyed by image_id so
    # worker scheduling cannot affect determinism) -----------------------
    def _pmap(fn, jobs):
        if len(jobs) > 400:
            from concurrent.futures import ProcessPoolExecutor

            with ProcessPoolExecutor(max_workers=min(32, os.cpu_count() or 8)) as ex:
                return list(ex.map(fn, jobs, chunksize=32))
        return [fn(j) for j in jobs]

    images = _pmap(_encode_job, image_jobs)

    # --- near-duplicate images (~2%): re-encode an existing image -------
    dup_jobs = []
    if images:
        n_dup = max(1, int(len(images) * near_dup_rate))
        for d in range(n_dup):
            src = images[int(rng.integers(0, len(images)))]
            fmt = "jpg" if src["fmt"] == "png" else "png"
            dup_jobs.append(
                (md5_hex(src["image_id"] + f"/dup{d}"), src["bytes"], fmt,
                 src["w"], src["h"], src["caption"])
            )
    images.extend(_pmap(_reencode_job, dup_jobs))

    # --- seeds: ≥3 per of the 5 hottest hosts, 50 total -----------------
    seeds = []
    for i in range(min(5, n_hosts)):
        seeds.append(_noisy_variant(list_url(i, 1), rng))
        seeds.append(_noisy_variant(detail_url(i, 0), rng))
        if n_detail[i] > 1:
            seeds.append(_noisy_variant(detail_url(i, 1), rng))
    i = 5
    while len(seeds) < 50 and n_hosts > 5:
        seeds.append(_noisy_variant(list_url(5 + (i - 5) % (n_hosts - 5), 1), rng))
        i += 1
    seeds_df = pd.DataFrame(
        dict(url=seeds, priority=np.zeros(len(seeds), dtype=np.int32))
    )

    politeness = {
        "default_tokens": default_tokens,
        "hosts": {hosts[i]: hot_tokens for i in range(min(5, n_hosts))},
        "robots_disallow": {hosts[0]: ["/d/1"], hosts[1]: ["/d/2"]},
        "max_attempts": max_attempts,
    }
    if recrawl_after_rounds is not None:
        politeness["recrawl_after_rounds"] = int(recrawl_after_rounds)

    pages_df = pd.DataFrame(pages)
    images_df = pd.DataFrame(images)
    # bounded row groups: a single monolithic row group would make the
    # image store unsplittable — one Spark task would scan all of it
    pages_df.to_parquet(
        os.path.join(out_dir, "page_store.parquet"), index=False,
        row_group_size=20_000,
    )
    write_image_store(images_df, os.path.join(out_dir, "image_captions.parquet"))
    seeds_df.to_parquet(os.path.join(out_dir, "seeds.parquet"), index=False)
    with open(os.path.join(out_dir, "politeness.json"), "w") as f:
        json.dump(politeness, f, indent=1, sort_keys=True)
    return dict(pages=len(pages_df), images=len(images_df), seeds=len(seeds_df))


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scraper_fixtures"
    n_hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_urls = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    print(generate(out, n_hosts=n_hosts, n_urls=n_urls))
