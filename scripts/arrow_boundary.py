"""Arrow-boundary scaling sweep (round-5 ask #2).

The steady-state pipeline's 4->16 scaling residue was attributed (BENCH.md
round 4) to the JVM<->Python Arrow boundary anti-scaling: a noop
mapInPandas pass over 1.2 GB degraded 4.0 s (local[1]) -> 13.8 s
(local[16]).  This script measures the engine-side levers VERDICT r4
named: ``spark.sql.execution.arrow.maxRecordsPerBatch`` (10k rows of ~6 KB
bodies = ~60 MB Arrow batches; smaller batches change allocator behavior)
and ``spark.sql.execution.arrow.useLargeVarTypes``.

Each (cores, batch, largevar) cell runs in a FRESH subprocess JVM with the
process tree CPU-pinned to `cores` (same protocol as bench.py's scaling
pairs), does one untimed warmup pass and reports the min of two timed noop
passes, plus aggregate MB/s and MB/s/worker.

Usage:  python scripts/arrow_boundary.py            # full sweep, JSON out
        python scripts/arrow_boundary.py --cell 16 2000 0   # one cell
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROWS = int(os.environ.get("ARROW_SWEEP_ROWS", "200000"))
BODY = int(os.environ.get("ARROW_SWEEP_BODY", "6144"))


def _set_tree_affinity(n: int) -> None:
    """Pin THIS process tree (JVM + Arrow workers, every thread) to the
    TOP ``n`` cores — bench.py's protocol.  The first version of this
    script pinned every pid on the HOST to cores 0..n-1 (and never
    restored them) while missing the JVM's existing threads entirely;
    reuse the bench implementation instead of re-deriving it."""
    import bench
    bench._set_tree_affinity(n)


def _cell(cores: int, batch: int, largevar: bool,
          pin: bool = True) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from goscrape_spark.session import get_spark

    spark = get_spark(
        "arrow-sweep", master=f"local[{cores}]", shuffle_partitions=cores,
        extra_conf={
            "spark.sql.execution.arrow.maxRecordsPerBatch": str(batch),
            "spark.sql.execution.arrow.useLargeVarTypes":
                "true" if largevar else "false",
        })
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    df = (spark.range(ROWS, numPartitions=cores * 4)
          .select("id", F.repeat(F.lit("x"), BODY).cast("binary")
                  .alias("body"))
          .localCheckpoint(eager=True))

    def noop(batches):
        for pdf in batches:
            yield pdf

    def one_pass() -> float:
        t0 = time.time()
        df.mapInPandas(noop, schema="id long, body binary") \
          .write.format("noop").mode("overwrite").save()
        return time.time() - t0

    if pin:
        _set_tree_affinity(cores)
    one_pass()                                   # warmup (fork pools, JIT)
    sec = min(one_pass(), one_pass())
    mb = ROWS * (BODY + 8) / 1e6
    print(json.dumps({
        "cores": cores, "batch": batch, "largevar": largevar, "pin": pin,
        "sec": round(sec, 3), "mb_s": round(mb / sec, 1),
        "mb_s_per_worker": round(mb / sec / cores, 2)}), flush=True)
    spark.stop()


def main() -> None:
    results = []
    for batch in (2000, 10000, 50000):
        for largevar in (False, True):
            for cores in (4, 16):
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--cell",
                     str(cores), str(batch), "1" if largevar else "0"],
                    capture_output=True, text=True, timeout=600)
                line = [ln for ln in out.stdout.splitlines()
                        if ln.startswith("{")]
                if line:
                    results.append(json.loads(line[-1]))
                    print(line[-1], flush=True)
                else:
                    print(json.dumps({"cores": cores, "batch": batch,
                                      "largevar": largevar,
                                      "error": out.stderr[-200:]}),
                          flush=True)
    # pair up 4->16 efficiency per config
    for batch in (2000, 10000, 50000):
        for largevar in (False, True):
            pair = [r for r in results
                    if r["batch"] == batch and r["largevar"] == largevar]
            if len(pair) == 2:
                lo = next(r for r in pair if r["cores"] == 4)
                hi = next(r for r in pair if r["cores"] == 16)
                print(json.dumps({
                    "batch": batch, "largevar": largevar,
                    "speedup_4_16": round(lo["sec"] / hi["sec"], 3),
                    "efficiency": round(lo["sec"] / hi["sec"] / 4, 3)}),
                    flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cell":
        _cell(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4] == "1",
              pin=not (len(sys.argv) > 5 and sys.argv[5] == "nopin"))
    else:
        main()
