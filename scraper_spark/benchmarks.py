"""Crawl-throughput benchmark, one parallelism level per process.

The north rule's two-cluster-size scaling criterion (N → 4N executors,
efficiency ≥ 0.8) is evidenced in-sandbox by running the SAME crawl on
the SAME fixture at ``local[8]`` and ``local[32]`` (4× cores) and
comparing pages/sec. One level per process because a JVM can't change
masters; ``bench.py`` orchestrates both and computes the efficiency.

Usage: python -m scraper_spark.benchmarks --cores 8 [--fixture DIR]
Prints one JSON line: {"cores": 8, "pages": N, "wall_s": ..., "pages_per_sec": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

BENCH_FIXTURE = "/tmp/scraper_bench_fixtures"


def ensure_fixture(path: str = BENCH_FIXTURE) -> str:
    """Deterministic bench corpus (seed=42): 50 hosts, ~100k URLs,
    full image payload (decode+phash is the dominant per-page work, as
    in a real crawl), politeness budgets set high and the list-page
    graph shallow (page_size 50, fanout 400) so the crawl is work-bound
    in ~6 rounds instead of latency-bound in hundreds — throughput and
    N→4N scaling are measured on real per-round work."""
    marker = os.path.join(path, "politeness.json")
    if not os.path.exists(marker):
        from scraper_spark.sources.fixtures import generate

        generate(
            path,
            n_hosts=50,
            n_urls=100_000,
            default_tokens=20_000,
            hot_tokens=20_000,
            image_rate=1.0,
            pagination_fanout=400,
            page_size=50,
            img_size=(64, 256),
        )
    return path


def run_crawl(cores: int, fixture: str, work_dir: str, decode_images: bool = True) -> dict:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")  # 5 GB image shuffle
    from scraper_spark.session import get_spark
    from scraper_spark.plans.frontier import CrawlEngine

    spark = get_spark(app_name=f"crawl_bench_{cores}", cores=cores)
    shutil.rmtree(work_dir, ignore_errors=True)
    eng = CrawlEngine(spark, fixture, work_dir, decode_images=decode_images)
    t0 = time.monotonic()
    totals = eng.run()
    wall = time.monotonic() - t0
    return {
        "cores": cores,
        "pages": totals["fetched"],
        "rounds": totals["rounds"],
        "wall_s": round(wall, 2),
        "pages_per_sec": round(totals["fetched"] / wall, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--fixture", default=None)
    ap.add_argument("--work", default=None)
    ap.add_argument("--no-images", action="store_true")
    args = ap.parse_args()
    fixture = args.fixture or ensure_fixture()
    work = args.work or f"/tmp/crawl_bench_work_{args.cores}"
    res = run_crawl(args.cores, fixture, work, decode_images=not args.no_images)
    print(json.dumps(res))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
