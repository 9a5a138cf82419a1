"""Join operators.

The reference has ZERO joins (SURVEY §2.3) — its one multi-table
relationship is hardcoded as ``airport_ids=[1,132,138]``. The engine
implements the join surface properly, Spark-first:

  * small dimensions are ``broadcast()`` joined — no shuffle of the fact
    table, the build side ships to every executor once;
  * fact-to-fact joins shuffle on the join key and rely on AQE for skew
    splitting;
  * semi/anti joins expressed as ``left_semi``/``left_anti`` (no payload
    columns cross the exchange).

At 100 TB the fact table never moves for dimension enrichment — that is the
entire point of the broadcast-join upgrade over the reference's literal list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich_with_dim(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Broadcast-hash enrichment join (the zone-lookup upgrade, SURVEY §2.3):
    ``trips.join(broadcast(zones), trips.PULocationID == zones.LocationID)``.
    """
    return fact.join(broadcast(dim), fact[fact_key] == dim[dim_key], how)


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, str, str]]) -> DataFrame:
    """Chain broadcast joins over a star schema; each dim is
    (df, fact_key, dim_key)."""
    out = fact
    for dim, fk, dk in dims:
        out = out.join(broadcast(dim), out[fk] == dim[dk], "inner")
    return out


def anti_join(left: DataFrame, right: DataFrame, lk: str, rk: str) -> DataFrame:
    """Rows of left with no match in right (NOT EXISTS)."""
    return left.join(broadcast(right), left[lk] == right[rk], "left_anti")


def semi_join(left: DataFrame, right: DataFrame, lk: str, rk: str) -> DataFrame:
    """Rows of left with at least one match in right (EXISTS)."""
    return left.join(broadcast(right), left[lk] == right[rk], "left_semi")
