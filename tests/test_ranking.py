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
