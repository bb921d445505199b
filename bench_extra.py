"""Supplementary benchmarks for the optimization rounds (guide §1.4).

NOT part of the driver contract — bench.py is frozen; numbers from here are
cited in OPTIMIZATION_r*.md.  Components:

* ``queries`` (default): time every declared query exactly like
  bench._sf_queries (construction + noop sink) in one session, N reps each,
  reporting per-rep seconds — rep 0 carries session/codegen warmup, the min
  approximates steady-state compute.
* ``plans``: dump .explain("formatted") for each declared query to
  plans/r06/<name>_{before,after}.txt (pass a suffix).

Usage:
    python bench_extra.py queries [rep_count] [only,names]
    python bench_extra.py plans <suffix> [only,names]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

SF_DIR = os.environ["SPARK_GRAFT_SF_DIR"]
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from goscrape_spark.session import get_spark

    head_cores = min(CPUS, 16)
    spark = get_spark("bench-extra", master=f"local[{head_cores}]",
                      shuffle_partitions=head_cores)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def run_queries(reps: int, only: set[str]) -> None:
    import __spark_entry__ as entry_mod

    spark = _session()
    qs = entry_mod.queries()
    names = [n for n in qs if not only or n in only]
    out: dict[str, list[float]] = {}
    for name in names:
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = samples
        print(f"{name}: {samples} (min {min(samples)})", flush=True)
    print("BENCH_EXTRA " + json.dumps(out))
    spark.stop()


def dump_plans(suffix: str, only: set[str]) -> None:
    import __spark_entry__ as entry_mod

    spark = _session()
    qs = entry_mod.queries()
    os.makedirs("plans/r06", exist_ok=True)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # crawl_fixture etc. may be heavy; never die
            txt = f"ERROR {type(e).__name__}: {e}"
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(txt)
        print(f"wrote plans/r06/{name}_{suffix}.txt", flush=True)
    spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "plans":
        suffix = sys.argv[2]
        only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
        dump_plans(suffix, only)
    else:
        reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else set()
        run_queries(reps, only)
