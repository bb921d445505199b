"""W2: global total-order sequence assignment without a single-task sort.

The reference's BFS queue implies one global discovery order
(scraper/scraper.go:165-175).  A naive ``row_number() OVER (ORDER BY ...)``
funnels the whole epoch through ONE task — at the 10^7-10^8 pages/epoch the
BASELINE.md model projects, that is the scale-killer.  ``global_sequence``
is the two-pass zipWithIndex shape on DataFrames:

1. range-partition on the order key (order-preserving across partitions)
   and sort within partitions — a normal parallel shuffle+sort;
2. count rows per partition (tiny aggregate -> driver: one int per
   partition) to derive per-partition starting offsets;
3. assign ``offset + local running index`` inside each partition with an
   Arrow ``mapInPandas`` pass — zero additional shuffle, order preserved.

The result is bit-identical to the global window (order keys are unique),
but the heaviest stage is an ordinary range shuffle that scales with
executors.  Small inputs keep the plain window: one small task beats three
jobs.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# below this many partitions the plain window wins on job-launch overhead
SCALABLE_MIN_PARTS = 4


def _window_sequence(df: DataFrame, order_cols: list[str], start: int,
                     out_col: str) -> DataFrame:
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(
        out_col, (F.row_number().over(w) + F.lit(start - 1)).cast("long"))


def global_sequence(df: DataFrame, order_cols: list[str], start: int = 0,
                    out_col: str = "seq", parts: int | None = None) -> DataFrame:
    """Append ``out_col`` = start, start+1, ... in the total order of
    ``order_cols`` (which must be unique per row for determinism)."""
    return global_sequence_with_total(df, order_cols, start, out_col,
                                      parts)[0]


def global_sequence_with_total(
        df: DataFrame, order_cols: list[str], start: int = 0,
        out_col: str = "seq",
        parts: int | None = None) -> tuple[DataFrame, int | None]:
    """global_sequence plus the row count when the scalable path already
    collected it (its per-partition offsets sum to the total, so callers
    can skip a separate count() action); None on the small window path."""
    if parts is None or parts < SCALABLE_MIN_PARTS:
        return _window_sequence(df, order_cols, start, out_col), None

    ranged = (df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
              .sortWithinPartitions(*order_cols)
              .withColumn("_pid", F.spark_partition_id())
              .localCheckpoint(eager=True))  # pin partitions for both passes
    counts = {r._pid: r.n for r in
              ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    offsets = {}
    acc = start
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    in_cols = [f for f in ranged.schema.fields if f.name != "_pid"]
    schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                       for f in in_cols) + f", {out_col} bigint"
    names = [f.name for f in in_cols]

    def run(batches) -> Iterator:
        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            out = pdf[names].copy()
            out[out_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield out

    return ranged.mapInPandas(run, schema=schema), acc - start
