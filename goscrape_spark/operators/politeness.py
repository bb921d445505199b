"""Per-host politeness scheduling (J5) and robots.txt exclusion (J4).

Both are north_rule extensions — the reference's only politeness is the
inline 429 backoff (scraper/http.go:18-23,50-77) and it has no robots
support.  Design constraints:

* Politeness must not change crawl ORDER (the reference's backoff blocks
  inline, preserving order), so it is expressed as a ``not_before`` schedule:
  the i-th fetch of a host within an epoch (in consideration order) may start
  no earlier than ``i * delay``.  Pure column expressions — a rank per host
  times the delay — no Python.  A real HTTP fetcher consumes the schedule
  inside its per-host ``applyInPandas`` batch (fetches for one host land in
  one group, sorted by schedule, slept between).

* Robots rules ride a **broadcast** join on ``host`` (the rules table is tiny
  relative to the frontier) and reject candidates whose path matches a
  disallow prefix.  Like the include/exclude filters (F7/F8), robots
  rejection happens AFTER seen-set insertion — a robots-blocked URL never
  gets reconsidered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def schedule_politeness(df: DataFrame, delay_ms: int,
                        host_col: str = "host",
                        order_cols: list[str] | None = None,
                        out_col: str = "not_before_ms",
                        host_delays_ms: dict[str, int] | None = None,
                        parts: int | None = None) -> DataFrame:
    """Assign per-host fetch offsets: 0, delay, 2*delay, ... in consideration
    order.

    ``host_delays_ms`` (robots.txt ``Crawl-delay`` per host) overrides the
    global delay where LARGER: the effective per-row delay is
    ``greatest(delay_ms, host_delays_ms[host])``.  The map is a literal
    column expression (bounded: one entry per robots-bearing host), so the
    multiply stays inside whole-stage codegen — no extra join.

    ``parts`` engages the skew-proof rank path (ranking.grouped_sequence):
    a plain per-host window puts each host's whole row set into ONE task,
    and a goscrape-style crawl is overwhelmingly single-host — i.e. the
    entire epoch in one task.  The grouped two-pass keeps a hot host
    spanning many range partitions with only O(partitions) driver data."""
    order_cols = order_cols or ["parent_seq", "stage_rank", "sub_rank",
                                "intra1", "intra2"]
    from .ranking import grouped_sequence
    ranked = grouped_sequence(df, host_col, order_cols,
                              out_col="_host_rank", parts=parts)
    delay = F.lit(delay_ms).cast("long")
    if host_delays_ms:
        mapping = F.create_map(*[F.lit(x) for kv in host_delays_ms.items()
                                 for x in kv])
        delay = F.greatest(
            delay, F.coalesce(mapping[F.col(host_col)].cast("long"),
                              F.lit(0).cast("long")))
    return ranked.withColumn(out_col, F.col("_host_rank") * delay) \
                 .drop("_host_rank")


def retry_backoff_ms(attempts: Column, retry_delay_ms: int = 1500) -> Column:
    """S2: total backoff time spent before attempt N under the reference's
    LINEAR schedule (retries+1)*1500ms per wait (scraper/http.go:70-75 — the
    comment says exponential; the code is linear).  Sum of 1..(attempts-1)
    waits."""
    n = attempts - F.lit(1)  # number of sleeps
    return (n * (n + 1) / 2).cast("long") * F.lit(retry_delay_ms)


def parse_robots_txt(text: str) -> list[str]:
    """Minimal robots.txt: Disallow prefixes for User-agent: * groups."""
    disallows: list[str] = []
    applies = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif field == "disallow" and applies and value:
            disallows.append(value)
    return disallows


def robots_rules_df(spark, rules: dict[str, list[str]]) -> DataFrame:
    rows = [(host, prefix) for host, prefixes in rules.items()
            for prefix in prefixes]
    return spark.createDataFrame(rows or [], "host string, disallow string")


def apply_robots(candidates: DataFrame, rules: DataFrame,
                 host_col: str = "host",
                 path_col: str = "path") -> DataFrame:
    """Drop candidates whose path starts with a disallow prefix for their
    host.  Broadcast join: rules are tiny, candidates are huge."""
    hits = (candidates.join(
        F.broadcast(rules.withColumnRenamed("host", "_r_host")),
        (F.col(host_col) == F.col("_r_host"))
        & F.col(path_col).startswith(F.col("disallow")),
        "inner")
        .select(host_col, path_col).distinct())
    return candidates.join(hits, on=[host_col, path_col], how="left_anti")


def rfc_rules_df(spark, parsed: dict[str, list[tuple[str, bool]]]) -> DataFrame:
    """RFC 9309 rules table from ``host -> parse_robots(...) output``.
    Columns: host, pattern, regex (Java/RE2 common subset), is_allow,
    rule_len (the §2.2.2 specificity key)."""
    from ..functions.robotstxt import rule_regex
    rows = [(host, pat, rule_regex(pat), allow, len(pat))
            for host, rules in parsed.items()
            for pat, allow in rules]
    return spark.createDataFrame(
        rows or [], "host string, pattern string, regex string, "
                    "is_allow boolean, rule_len int")


def apply_robots_rfc(candidates: DataFrame, rules: DataFrame,
                     host_col: str = "host",
                     path_col: str = "path") -> DataFrame:
    """RFC 9309 matcher over a candidates frame: most-specific rule wins
    (longest pattern), Allow wins length ties, no matching rule allows.

    Distributed shape: the per-host rules table broadcasts (a robots file
    is bounded; RFC 9309 only requires parsing the first 500 KiB), each
    candidate joins only its host's rules, the regex match runs JVM-side
    (``rlike``), and the winning rule per (host, path) is a max_by hash
    aggregate over the (rule_len, is_allow) specificity key — partial
    map-side combine, no window, no skew pile-up on hot hosts.  Must agree
    exactly with functions.robotstxt.match_allowed (unit-tested)."""
    verdict_key = F.struct(F.col("rule_len"), F.col("is_allow"))
    blocked = (candidates.select(host_col, path_col).distinct()
               .join(F.broadcast(rules.withColumnRenamed("host", "_r_host")),
                     (F.col(host_col) == F.col("_r_host"))
                     # column-valued regex: RLIKE via expr (Column.rlike
                     # only takes a literal pattern)
                     & F.expr(f"{path_col} RLIKE regex"),
                     "inner")
               .groupBy(host_col, path_col)
               .agg(F.max_by(F.col("is_allow"), verdict_key).alias("_allow"))
               .filter(~F.col("_allow"))
               .select(host_col, path_col))
    return candidates.join(blocked, on=[host_col, path_col], how="left_anti")
