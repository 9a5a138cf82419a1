"""Capture .explain('formatted') for a list of batch queries into
plans/r16/<query>_<tag>.txt.

Usage: python plans/r16/capture_plans.py <tag> <query> [<query> ...]

Streaming-fold queries are excluded by the caller: invoking them runs
the drain (their returned DF is the already-drained ledger), so a plan
capture would time-and-run the fold — their structure is documented in
OPTIMIZATION_r15.md instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from newyork_taxi_etl_spark import registry
from newyork_taxi_etl_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"capture-plans-r16-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        spark.sparkContext.setJobDescription(f"explain: {name}")
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
