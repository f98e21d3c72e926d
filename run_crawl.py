#!/usr/bin/env python
"""spark-submit entry point for the crawl engine.

    spark-submit --master <cluster> --py-files dist/scraper_spark.zip \
        run_crawl.py --fixture <dir> --work <dir> [--max-rounds N]

On a cluster the existing SparkSession (created by spark-submit) is
reused; standalone execution falls back to local mode. The job is
resumable: re-submitting with the same --work dir continues from the
last committed round (byte-identically — plans/frontier.py).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", required=True)
    ap.add_argument("--work", required=True)
    ap.add_argument("--max-rounds", type=int, default=100_000)
    ap.add_argument("--no-images", action="store_true")
    ap.add_argument("--no-bloom", action="store_true")
    ap.add_argument(
        "--seen-filter",
        choices=["bloom", "cuckoo"],
        default="bloom",
        help="seen-set prefilter structure (cuckoo = deletable tables)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from scraper_spark.session import get_spark

        spark = get_spark(app_name="scraper_spark_crawl")

    from scraper_spark.plans.frontier import CrawlEngine

    eng = CrawlEngine(
        spark,
        args.fixture,
        args.work,
        use_bloom=not args.no_bloom,
        decode_images=not args.no_images,
        seen_filter=args.seen_filter,
    )
    t0 = time.monotonic()
    totals = eng.run(max_rounds=args.max_rounds)
    totals["wall_s"] = round(time.monotonic() - t0, 2)
    totals["pages_per_sec"] = round(
        totals["fetched"] / max(totals["wall_s"], 1e-9), 2
    )
    print(json.dumps(totals))


if __name__ == "__main__":
    main()
