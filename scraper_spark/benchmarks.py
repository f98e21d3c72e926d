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


FIXTURE_PARAMS = dict(
    n_hosts=50,
    n_urls=180_000,
    default_tokens=120_000,
    hot_tokens=120_000,
    image_rate=1.0,
    pagination_fanout=1000,
    page_size=100,
    img_size=(64, 256),
)


def _fixture_fingerprint() -> str:
    from scraper_spark.sources.fixtures import N_IMAGE_BUCKETS

    return json.dumps(
        dict(FIXTURE_PARAMS, n_image_buckets=N_IMAGE_BUCKETS), sort_keys=True
    )


def ensure_fixture(path: str = BENCH_FIXTURE) -> str:
    """Deterministic bench corpus (seed=42): 50 hosts, ~180k URLs,
    full image payload (decode+phash is the dominant per-page work, as
    in a real crawl), politeness budgets set high and the list-page
    graph shallow so the crawl is work-bound in ~6 rounds instead of
    latency-bound in hundreds. The bulk round carries ~150k pages: at
    10^10-URL scale EVERY round is work-bound like this one, so the
    steady-state N→4N ratio is measured where the fixed ~3 s/round
    driver+scheduling constant is amortized the way a real crawl
    amortizes it. The corpus is cached under a parameter fingerprint
    and regenerated when the parameters change."""
    meta = os.path.join(path, "fixture_meta.json")
    want = _fixture_fingerprint()
    have = None
    try:
        with open(meta) as f:
            have = f.read()
    except FileNotFoundError:
        pass
    if have != want:
        from scraper_spark.sources.fixtures import generate

        shutil.rmtree(path, ignore_errors=True)
        generate(path, **FIXTURE_PARAMS)
        with open(meta, "w") as f:
            f.write(want)
        # settle the ~9 GB of dirty pages NOW: background writeback
        # overlapping the first timed run costs it ~2× on the bulk
        # round and silently wrecks the N→4N ratio (measured: steady
        # eff 0.81 dirty vs 0.98 settled on identical code)
        os.sync()
    return path


_PROBE_SRC = """
import os, time, sys
import numpy as np
rng = np.random.default_rng(0)
a = rng.random((256, 256))
t0 = time.monotonic(); n = 0
while time.monotonic() - t0 < float(sys.argv[1]):
    a = np.tanh(a @ a.T * 1e-4); n += 1
print(n)
"""


def cpu_scaling_probe(seconds: float = 4.0) -> float:
    """Measured 2→8-proc scaling efficiency of PURE numpy work (no
    Spark): the physical ceiling any engine could reach on this box
    right now. Each worker is a FRESH subprocess with BLAS pinned to 1
    thread — a fork-based pool inherits the parent's already-
    initialized OpenBLAS pool (32 threads/proc on this box), and 8×32
    threads thrashing 32 cores reads ~0.45 'scaling' that measures the
    oversubscription, not the host."""
    import subprocess

    env = dict(os.environ)
    for var in (
        "OMP_NUM_THREADS",
        "OPENBLAS_NUM_THREADS",
        "MKL_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "VECLIB_MAXIMUM_THREADS",
    ):
        env[var] = "1"
    totals = {}
    for procs in (2, 8):
        ps = [
            subprocess.Popen(
                [sys.executable, "-c", _PROBE_SRC, str(seconds)],
                stdout=subprocess.PIPE, env=env, text=True,
            )
            for _ in range(procs)
        ]
        totals[procs] = sum(int(p.communicate()[0].strip()) for p in ps)
    return round(totals[8] / (4.0 * totals[2]), 3)


def _prewarm(fixture: str) -> None:
    """Normalize the page-cache state, identically for every
    parallelism level: flush dirty pages, drop the caches (root-only;
    skipped silently otherwise), then pull the fixture back through
    the cache. Without the drop, the FIRST run after corpus generation
    pays ~40 % on its bulk rounds (measured: 2002 vs 3492 pages/s
    steady on identical code) from post-write kernel housekeeping —
    which lands on whichever level happens to run first and corrupts
    the N→4N ratio in either direction."""
    os.sync()
    try:
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
    except OSError:
        pass
    for dirpath, _, files in os.walk(fixture):
        for f in files:
            with open(os.path.join(dirpath, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass


def run_crawl(cores: int, fixture: str, work_dir: str, decode_images: bool = True) -> dict:
    """One parallelism level. ``cores`` maps to a local-cluster of
    4-core executor JVMs: 8 → 2 executors, 32 → 8 executors (the north
    rule's N → 4N executors with per-executor resources held fixed —
    a single shared-heap local[N] JVM would confound scaling with GC
    and memory-bandwidth effects no real cluster has)."""
    from scraper_spark.session import get_spark
    from scraper_spark.plans.frontier import CrawlEngine

    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "local")
    if mode == "cluster":
        # multi-JVM emulation: separate executor JVMs, engine shipped
        # as a zip exactly like spark-submit --py-files.
        # SPARK_GRAFT_EXEC_CORES sets cores PER executor (default 4 —
        # a realistic executor shape). Setting it to 1 turns the
        # (2, 8)-core pair into 2 vs 8 single-core executor JVMs: the
        # north rule's N → 4N EXECUTORS measured with real process
        # boundaries while total cores stay inside this VM's clean
        # memory-bandwidth envelope (BENCH.md §hardware).
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
        exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
        n_exec = max(1, cores // exec_cores)
        exec_mem_mb = 5120 if exec_cores >= 4 else 3072
        spark = get_spark(
            app_name=f"crawl_bench_{cores}",
            cores=cores,
            master=f"local-cluster[{n_exec},{exec_cores},{exec_mem_mb}]",
            extra_conf={
                "spark.executor.memory": f"{exec_mem_mb - 512}m",
                # each executor JVM sizes GC/JIT pools for ITS cores,
                # not the machine's 32
                "spark.executor.extraJavaOptions":
                    f"-XX:ActiveProcessorCount={exec_cores}",
            },
        )
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo)
        from tools.package import build

        spark.sparkContext.addPyFile(build())
    else:
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
        spark = get_spark(app_name=f"crawl_bench_{cores}", cores=cores)
    # JVM/JIT/python-worker warmup outside the timed window: a
    # micro-crawl over a throwaway 2-host fixture drives EVERY code
    # path the timed crawl uses (codegen compiler, window exchange,
    # anti-join, parquet writers, Arrow decode UDFs, snapshot commits)
    # so the first timed round doesn't bill Spark first-use costs —
    # applied identically at every parallelism level, so it cannot
    # move the N→4N ratio by asymmetry, only stop round 0 from
    # measuring the JIT instead of the engine. The prewarm below then
    # normalizes the page cache AFTER the warmup's IO.
    warm_fx = "/tmp/scraper_warm_fixture"
    if not os.path.exists(os.path.join(warm_fx, "politeness.json")):
        from scraper_spark.sources.fixtures import generate

        generate(warm_fx, n_hosts=2, n_urls=12, default_tokens=8,
                 hot_tokens=8)
    warm_work = f"/tmp/scraper_warm_work_{cores}"
    shutil.rmtree(warm_work, ignore_errors=True)
    CrawlEngine(
        spark, warm_fx, warm_work, decode_images=decode_images,
        store_image_bytes=False,
    ).run()
    shutil.rmtree(warm_work, ignore_errors=True)
    _prewarm(fixture)
    shutil.rmtree(work_dir, ignore_errors=True)
    eng = CrawlEngine(
        spark, fixture, work_dir, decode_images=decode_images,
        store_image_bytes=False,
    )
    t0 = time.monotonic()
    totals = eng.run()
    wall = time.monotonic() - t0
    # steady-state = the fully work-bound rounds (≥20k pages): at
    # 10^10-URL scale (thousands of such rounds) the small startup /
    # politeness-drain rounds amortize to nothing; in a 6-round sandbox
    # crawl they are a fixed-latency artifact, so report both.
    sp, sw = 0, 0.0
    for line in open(os.path.join(work_dir, "metrics.jsonl")):
        m = json.loads(line)
        if m["scheduled"] >= 20_000:
            sp += m["scheduled"]
            sw += m["wall_ms"]
    steady = {"pages": sp, "wall_ms": max(sw, 1.0)}
    return {
        "cores": cores,
        "pages": totals["fetched"],
        "rounds": totals["rounds"],
        "wall_s": round(wall, 2),
        "pages_per_sec": round(totals["fetched"] / wall, 2),
        "steady_pages_per_sec": round(
            steady["pages"] / (steady["wall_ms"] / 1000.0), 2
        ),
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
