"""Scale-robustness sweep: run EVERY ``queries()`` entry at a larger
scale factor than the correctness gate uses (default sf0.1, 10x the
driver's sf0.01) and report row count + wall time per query.

This is NOT a correctness check (tools/check_oracle.py is) — it proves
each operator's plan executes cleanly when the input grows 10x, i.e.
no query quietly depends on small-SF behavior (a broadcast that stops
fitting, a collect that stops being bounded, a join that degenerates).

Usage: python tools/sweep.py [sf_dir] [name,...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Observation, functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from scraper_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(cores=32)
    failures = 0
    for name, fn in E.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # noop sink (not count()): count() alone lets Catalyst
            # prune projection-only queries to a bare scan, so a regex
            # blowup / overflow that only manifests at 10x would pass
            # the gate without the expressions ever running (the same
            # hazard bench.py documents — ADVICE r01). The row count
            # rides the SAME execution as an observed metric, so each
            # query runs once, not once per sink + once per count
            obs = Observation()
            df = fn(spark, sf).observe(obs, F.count(F.lit(1)).alias("n"))
            df.write.format("noop").mode("overwrite").save()
            n = obs.get["n"]
            print(f"OK   {name}: {n} rows in {time.time() - t0:.2f}s", flush=True)
        except Exception as ex:  # noqa: BLE001 — sweep must report, not die
            failures += 1
            print(
                f"FAIL {name}: {type(ex).__name__}: {str(ex)[:200]}",
                flush=True,
            )
    print(f"\n{'FAILURES: %d' % failures if failures else 'ALL OK'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
