"""Oracle-compare + time a list of queries at one or more SFs.

Usage: python plans/r15/check_queries.py sf0.01,sf0.1 q1 q2 ...
Prints ok/fail per (sf, query) plus a warm noop-sink timing at the last SF.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from newyork_taxi_etl_spark import registry
from newyork_taxi_etl_spark.session import get_spark
from tests.oracle_harness import compare


def main() -> None:
    sfs = sys.argv[1].split(",")
    names = sys.argv[2:]
    spark = get_spark(app_name="check-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    fails = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        for name in names:
            ok, msg = compare(spark, name, sf_dir)
            print(("OK  " if ok else "FAIL") + f" {sf} {msg}", flush=True)
            fails += 0 if ok else 1
    sf_dir = f"/root/testdata/{sfs[-1]}"
    for name in names:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"TIME {sfs[-1]} {name}: best {best:.2f}s", flush=True)
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
