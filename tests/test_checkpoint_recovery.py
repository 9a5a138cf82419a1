"""Checkpoint-restart contract: the registered query's oracle proves the
restarted drain added ONLY the new files; these tests pin that the check is
actually discriminating (a restart that LOSES the checkpoint double-counts)
and that phase 2 really ran incremental batches rather than one big one.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_recovery_equals_batch_and_fresh_ckpt_double_counts(spark):
    from newyork_taxi_etl_spark.sources.readers import read_events
    from newyork_taxi_etl_spark.streaming.windows import (
        _drain,
        _upsert_counts_fn,
        run_checkpoint_recovery,
    )

    ev = read_events(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        out = run_checkpoint_recovery(spark, ev, d).collect()
        want = {
            r["user_id"]: (r["n"], round(r["s"], 6))
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(38,12)"))
                .cast("double")
                .alias("s"),
            )
            .collect()
        }
        got = {
            r["user_id"]: (r["n_events"], round(r["total_value"], 6))
            for r in out
        }
        assert got == want

        # phase 2 appended 4 files and the commit log shows BOTH phases'
        # batches (>= 5 commits total: 4 phase-1 files + phase-2 files)
        commits = os.listdir(str(Path(d) / "ckpt" / "commits"))
        assert len([c for c in commits if not c.endswith(".tmp")]) >= 5

        # NEGATIVE CONTROL — rerun the second half against the same target
        # with a FRESH checkpoint: the file-source log is gone, so every
        # stage file (both halves) is reprocessed and the first half
        # double-folds. This is the failure mode the oracle would catch.
        stage = str(Path(d) / "stage")
        target = str(Path(d) / "target")
        stream = (
            spark.readStream.schema(ev.schema)
            .format("parquet")
            .option("path", stage)
            .option("maxFilesPerTrigger", 1)
            .load()
        )
        q = (
            stream.writeStream.foreachBatch(_upsert_counts_fn(target))
            .option("checkpointLocation", str(Path(d) / "ckpt_fresh"))
            .trigger(availableNow=True)
            .start()
        )
        _drain(q, 180)
        doubled = {
            r["user_id"]: r["n_events"]
            for r in spark.read.parquet(target).collect()
        }
        assert all(
            doubled[u] == 2 * want[u][0] for u in want
        ), "fresh checkpoint must reprocess everything (double-count)"
