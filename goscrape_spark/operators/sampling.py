"""Deterministic sampling for training-data pipelines.

Hash-based sampling keeps a row iff a uniform hash of its key falls below
the stratum's rate: reproducible across runs/engines (no RNG state),
embarrassingly parallel (pure column expressions, no shuffle, survives
predicate pushdown), and composable — re-running with a larger rate
yields a superset, so corpus mixes can be grown monotonically.

The bucket is the first 8 hex chars of md5(key): comparing that hex
string lexicographically against a precomputed 8-char threshold is
identical to comparing the 32-bit integer (fixed-width lowercase hex
orders numerically), and renders the same in every engine that has md5 —
which is what lets the DuckDB oracle mirror the sample exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rate_threshold_hex(rate: float) -> str:
    """The 8-hex-char threshold for a keep-rate in [0, 1]."""
    t = max(0, min(int(rate * 16 ** 8), 16 ** 8))
    return f"{min(t, 16 ** 8 - 1):08x}" if t < 16 ** 8 else "g"  # > any hex


def sample_bucket(key: Column) -> Column:
    """The row's sampling bucket: first 8 hex chars of md5(key-as-string)."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      key_col: str = "doc_id") -> DataFrame:
    """Keep each row with its stratum's rate, deterministically in
    ``key_col``.  E.g. rates={'en': 0.5, 'es': 0.25} downsamples dominant
    languages while keeping the long tail at ``default_rate``."""
    thr = F.lit(rate_threshold_hex(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(rate_threshold_hex(rate))).otherwise(thr)
    return df.filter(sample_bucket(F.col(key_col)) < thr)
