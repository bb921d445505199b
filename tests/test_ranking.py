"""W2 global sequence: the scalable two-pass path must be bit-identical to
the single-task window."""

from pyspark.sql import functions as F

from goscrape_spark.operators.ranking import global_sequence


def _df(spark, n=5000):
    # bijective scramble -> unique unordered keys
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 7919) % n).alias("k1"),
        (F.col("id") % 7).alias("k2"))


def test_scalable_matches_window(spark):
    df = _df(spark)
    win = {r.id: r.seq for r in
           global_sequence(df, ["k1"], start=10, parts=None).collect()}
    par = {r.id: r.seq for r in
           global_sequence(df, ["k1"], start=10, parts=8).collect()}
    assert par == win
    # seq is exactly start + rank(k1)
    k1_of = {r.id: r.k1 for r in df.collect()}
    assert all(par[i] == 10 + k1_of[i] for i in par)


def test_scalable_composite_key_and_empty(spark):
    df = _df(spark, 997)
    win = {(r.k2, r.k1): r.seq for r in
           global_sequence(df, ["k2", "k1"], parts=None).collect()}
    par = {(r.k2, r.k1): r.seq for r in
           global_sequence(df, ["k2", "k1"], parts=6).collect()}
    assert par == win and len(par) == 997
    empty = spark.createDataFrame([], "id long, k1 long")
    assert global_sequence(empty, ["k1"], parts=8).count() == 0


def test_no_single_partition_exchange_in_scalable_plan(spark):
    """The scalable plan must not contain the single-partition window
    exchange (docs/PLANS.md evidence for the 100x scale-up)."""
    df = _df(spark)
    plan = global_sequence(df, ["k1"], parts=8)._jdf \
        .queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


# --- grouped_sequence (per-group rank without a per-group window task) ------


def _gdf(spark, n=6000, hosts=5):
    """hosts distinct groups; one (host 0) owns ~60% of rows — a hot group
    that must span several range partitions."""
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 6, F.lit("hot.example"))
         .otherwise(F.concat(F.lit("h"), (F.col("id") % hosts)
                             .cast("string"))).alias("host"),
        ((F.col("id") * 6007) % n).alias("ord"))


def _window_ranks(spark, df):
    from pyspark.sql import Window
    w = Window.partitionBy("host").orderBy("ord")
    return {r.id: r.g for r in
            df.withColumn("g", F.row_number().over(w) - 1).collect()}


def test_grouped_sequence_matches_window(spark):
    from goscrape_spark.operators.ranking import grouped_sequence

    df = _gdf(spark)
    want = _window_ranks(spark, df)
    got = {r.id: r.grank for r in
           grouped_sequence(df, "host", ["ord"], parts=8).collect()}
    assert got == want


def test_grouped_sequence_single_hot_group(spark):
    """The motivating case: ONE group owning every row (a same-host crawl
    epoch) — ranks must still be 0..n-1 and the plan must have no Window
    and no SinglePartition exchange."""
    from goscrape_spark.operators.ranking import grouped_sequence

    n = 5000
    df = spark.range(n).select(
        F.col("id"), F.lit("only.example").alias("host"),
        ((F.col("id") * 7919) % n).alias("ord"))
    out = grouped_sequence(df, "host", ["ord"], parts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "SinglePartition" not in plan
    got = {r.ord: r.grank for r in out.collect()}
    assert got == {i: i for i in range(n)}


def test_grouped_sequence_small_and_empty(spark):
    from goscrape_spark.operators.ranking import grouped_sequence

    df = _gdf(spark, 200)
    want = _window_ranks(spark, df)
    got = {r.id: r.grank for r in
           grouped_sequence(df, "host", ["ord"], parts=None).collect()}
    assert got == want
    empty = spark.createDataFrame([], "id long, host string, ord long")
    assert grouped_sequence(empty, "host", ["ord"], parts=8).count() == 0


def test_schedule_politeness_scalable_matches_window(spark):
    """J5 hot-path shape: schedule_politeness(parts=...) must emit the
    same offsets as the window path, including Crawl-delay overrides."""
    from goscrape_spark.operators.politeness import schedule_politeness

    df = _gdf(spark, 3000).select(
        "id", "host", F.col("ord").alias("parent_seq"),
        F.lit(0).alias("stage_rank"), F.lit(0).alias("sub_rank"),
        F.lit(0).alias("intra1"), F.lit(0).alias("intra2"))
    delays = {"hot.example": 900}
    win = {r.id: r.not_before_ms for r in
           schedule_politeness(df, 250, host_delays_ms=delays,
                               parts=None).collect()}
    par = {r.id: r.not_before_ms for r in
           schedule_politeness(df, 250, host_delays_ms=delays,
                               parts=8).collect()}
    assert par == win


def test_grouped_sequence_randomized_parts_sweep(spark):
    """Seeded random groups/orders, several partition counts including
    parts > groups and parts close to n — every configuration must match
    the window exactly (exercises empty partitions, single-row runs, and
    multi-partition boundary carries)."""
    from goscrape_spark.operators.ranking import grouped_sequence

    n = 2003
    # deterministic pseudo-random group sizes: group = id*2654435761 % 13,
    # order = bijective scramble (unique)
    df = spark.range(n).select(
        F.col("id"),
        F.concat(F.lit("g"), ((F.col("id") * 2654435761) % 13)
                 .cast("string")).alias("host"),
        ((F.col("id") * 4999) % n).alias("ord"))
    want = _window_ranks(spark, df)
    for parts in (4, 7, 16, 64):
        got = {r.id: r.grank for r in
               grouped_sequence(df, "host", ["ord"], parts=parts).collect()}
        assert got == want, f"parts={parts}"
