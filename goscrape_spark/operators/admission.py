"""Epoch admission: F1-F8 + W1 first-wins + J1 seen anti-join, as pure
DataFrame operations.

This is the distributed re-expression of ``shouldURLBeDownloaded``
(scraper/checks.go:26-72).  The sequential loop considers candidates one at a
time and mutates the seen set as it goes; the epoch-synchronous equivalent is

1. scheme filter (F1) — candidates failing it never touch the seen set;
2. dedup-key projection (F2+F3) as column expressions;
3. within-epoch first-wins (W1): ``row_number() over (partition by dedup_key
   order by <consideration order>) == 1`` where the consideration order is
   the composite key (parent_seq, stage_rank, sub_rank, intra1, intra2) that
   totally orders the sequential loop's candidate considerations (SURVEY
   §3.4);
4. cross-epoch dedup (J1): left_anti join against the global ``seen`` table
   (optionally pre-filtered by a Bloom filter, operators/seen.py);
5. ALL rows surviving 1-4 become seen-set inserts — including rows that the
   action filters then reject (host/depth/include/exclude), reproducing the
   reference's insert-before-reject semantics (scraper/checks.go:42-60).

Scale notes: the first-wins window and the anti-join both shuffle on
``dedup_key`` — the natural partitioning for a 10^10-key seen table.  The
candidate side is typically orders of magnitude smaller than ``seen``; with
the Bloom pre-filter only probable-duplicates reach the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urlnorm import (
    col_dedup_key,
    col_host,
    col_path,
    col_scheme,
    col_scheme_ok,
)

# composite consideration-order key (SURVEY §3.4)
ORDER_COLS = ["parent_seq", "stage_rank", "sub_rank", "intra1", "intra2"]


def with_url_parts(candidates: DataFrame, url_col: str = "url") -> DataFrame:
    """Derive scheme/host/path columns from a fragment-free URL column.
    Pure column expressions — stays inside whole-stage codegen."""
    u = F.col(url_col)
    return (candidates
            .withColumn("scheme", col_scheme(u))
            .withColumn("host", col_host(u))
            .withColumn("path", col_path(u)))


def _regex_filter(path: Column, includes: list[str], excludes: list[str]) -> Column:
    """F7/F8: unanchored include/exclude regex over the URL path
    (scraper/checks.go:63-96).  Java regex via rlike; fixture patterns are
    pinned to the RE2/Java common subset (SURVEY §2.2 F7)."""
    cond = F.lit(True)
    if includes:
        inc = F.lit(False)
        for p in includes:
            inc = inc | path.rlike(p)
        cond = cond & inc
    for p in excludes:
        cond = cond & ~path.rlike(p)
    return cond


def admit(candidates: DataFrame, seen: DataFrame, seed_host: str,
          max_depth: int, includes: list[str],
          excludes: list[str], bloom=None) -> tuple[DataFrame, DataFrame]:
    """Run epoch admission.

    ``candidates`` needs columns: url (fragment-free), is_asset boolean,
    depth int (the parent page's processing depth for a-links; anything for
    assets) + ORDER_COLS.

    Returns ``(inserts, survivors)``:
      - inserts: rows whose dedup_key is appended to ``seen`` this epoch
        (one row per key, the first-considered candidate);
      - survivors: the subset of inserts that also passes the action filters
        and should actually be fetched/enqueued.

    ``bloom`` (operators.seen.SeenSet, optional): pre-filter so that only
    maybe-seen rows are COMPARED against the big seen table.  Shape (r6):
    one left_anti join whose condition is ``key-equal AND might_contain``
    — the residual keeps bloom-certified-new rows unconditionally (the
    filter has no false negatives, so such a key cannot be in ``seen``)
    while maybe-seen rows pay the real key comparison.  The probe column
    is consumed exactly once with no materialization; the previous
    surely-new/maybe-seen union re-evaluated the aggregate-final + Arrow
    probe in both branches above the reused exchange (the probe
    accumulators counted every row twice, guide §4.1), and fixing THAT
    with a checkpoint cost one extra driver job per epoch.  Exactness is
    unaffected (no false negatives; false positives just pay a compare).

    The two returned frames share one physical plan (survivors = filter of
    inserts on the ``survived`` flag) so callers can checkpoint ``inserts``
    once and derive both.
    """
    if "dedup_key" in candidates.columns:
        # fully precomputed upstream (the fused extraction pass computes the
        # key and drops non-http(s) refs at the source — the scheme check
        # precedes the seen insert, checks.go:27-29, so they are observable
        # nowhere): zero per-candidate JVM regex work here
        keyed = candidates
    else:
        if {"scheme", "host", "path"} <= set(candidates.columns):
            parts = candidates  # components precomputed upstream
        else:
            parts = with_url_parts(candidates)
        valid = parts.filter(col_scheme_ok(F.col("scheme")))
        keyed = valid.withColumn(
            "dedup_key",
            col_dedup_key(F.col("url"), F.col("host"), F.col("path"),
                          F.lit(seed_host)))

    # W1 first-wins as min_by hash aggregation, NOT a row_number window: a
    # window piles every row of a hot dedup_key (think: the one logo/css
    # every page references) into a single sort task, while a hash aggregate
    # gets map-side partial combine — each input partition reduces its local
    # rows for the hot key to ONE before the shuffle.  This is the explicit
    # skew handling the frontier needs at web scale; composite consideration
    # keys are unique per candidate, so min_by is deterministic.
    ord_col = F.struct(*[F.col(c) for c in ORDER_COLS])
    row_col = F.struct(*[F.col(c) for c in keyed.columns])
    first = (keyed.groupBy("dedup_key")
             .agg(F.min_by(row_col, ord_col).alias("_row"))
             .select("_row.*"))

    seen_keys = seen.select("dedup_key")
    if bloom is None:
        inserts = first.join(seen_keys, on="dedup_key", how="left_anti")
    else:
        probed = bloom.probe_df(first)
        sk = seen_keys.select(F.col("dedup_key").alias("_seen_key"))
        inserts = probed.join(
            sk, (probed["dedup_key"] == F.col("_seen_key"))
                & probed["might_contain"],
            "left_anti").drop("might_contain")

    page_ok = (F.col("host") == F.lit(seed_host))
    if max_depth != 0:
        page_ok = page_ok & (F.col("depth") < F.lit(max_depth))
    action_ok = F.when(F.col("is_asset"), F.lit(True)).otherwise(page_ok)
    action_ok = action_ok & _regex_filter(F.col("path"), includes, excludes)

    inserts = inserts.withColumn("survived", action_ok)
    survivors = inserts.filter(F.col("survived"))
    return inserts, survivors
