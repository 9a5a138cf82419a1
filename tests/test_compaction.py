"""Layout contract for small_file_compaction.

The driver's value oracle for `small_file_compaction` is structural
(files_reduced + row count + checksum — data-correctness properties).
The exact committer-layout claims live HERE, where a Spark upgrade that
changes empty-partition file emission reads as a test update rather than
a correctness failure (r6 ADVICE):

  * explicit repartition(16) survives AQE and writes exactly 16 files
    (orders has >> 16 rows at every test SF, so no partition is empty);
  * coalesce(2) is a NARROW rewrite emitting exactly 2 files;
  * content is lossless (row count preserved through both rewrites).
"""

from __future__ import annotations

import glob
import os

from tests.conftest import SF_SMOKE


def test_compaction_layout_16_to_2(spark):
    from newyork_taxi_etl_spark.queries.sinks import _compact_orders

    n_before, n_after, compact_dir = _compact_orders(spark, SF_SMOKE)
    assert n_before == 16
    assert n_after == 2
    n_rows = spark.read.parquet(compact_dir).count()
    assert n_rows == spark.read.parquet(
        os.path.join(SF_SMOKE, "orders.parquet")
    ).count()


def test_compaction_workdirs_are_unique(spark):
    from newyork_taxi_etl_spark.queries.sinks import _compact_orders

    _, _, d1 = _compact_orders(spark, SF_SMOKE)
    _, _, d2 = _compact_orders(spark, SF_SMOKE)
    assert d1 != d2  # mkdtemp-unique: concurrent drivers never race
    assert glob.glob(os.path.join(d1, "*.parquet"))  # both stay readable
    assert glob.glob(os.path.join(d2, "*.parquet"))
