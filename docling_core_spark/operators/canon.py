"""Output canonicalization gate.

Every operator ends with a deterministic ``orderBy`` so the DuckDB oracle
can value-hash the result.  That global sort is pure test ceremony: at
100 TB it is an avoidable full exchange + sort of the final output.  The
``canonical_order`` helper keeps the default (oracle-friendly) behavior but
lets a scale deployment drop every trailing sort at once:

- per call: ``canonical_order(df, "k", canonical=False)``
- globally: ``SPARK_GRAFT_CANONICAL=0`` in the environment
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame


def canonical_default() -> bool:
    return os.environ.get("SPARK_GRAFT_CANONICAL", "1") != "0"


def canonical_order(df: DataFrame, *cols, canonical: Optional[bool] = None) -> DataFrame:
    """Trailing deterministic sort, skippable for the scale path."""
    if canonical is None:
        canonical = canonical_default()
    return df.orderBy(*cols) if canonical else df
