"""Bench output contract guards.

BENCH_r01 came back ``"parsed": null`` because the driver keeps only a
bounded tail of stdout (~2.9 KB observed) and the round-1 JSON line
overflowed it. bench.py now prints one compact line; this test pins the
worst-case line length as the registry grows so the next added query can't
silently break per-round benchmark capture.
"""

from __future__ import annotations

import json


def test_bench_json_line_fits_driver_tail_buffer():
    from newyork_taxi_etl_spark import registry

    names = list(registry.queries())
    # worst width under bench.py's tiered rounding (2dp < 10s, 1dp above):
    # every per-query value is at most 5 chars (999.9 — the 600s suite
    # timeout bounds any real value below this)
    worst = json.dumps(
        {
            "metric": "suite_runtime",
            "value": 99999.99,
            "unit": "sec",
            "queries": {n: 999.9 for n in names},
            "sf": 0.1,
        },
        separators=(",", ":"),
    )
    assert len(worst) < 2800, (
        f"bench JSON line would be {len(worst)}B with {len(names)} queries; "
        "driver tail buffer holds ~2.9KB — move per-query detail to a file "
        "or shorten rounding before registering more queries"
    )
