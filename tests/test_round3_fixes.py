"""Round-3 regression tests.

Covers the four scale/correctness fixes:
* _simhash_batch reduceat bounds (trailing empty doc crashed the stage) and
  the n*u dense-path memory bound;
* IVF cell assignment as broadcast-centroids + NumPy argmax (was an
  O(n_cells x dim) Catalyst literal tree that OOMed the driver);
* MinHash LSH hot-bucket blowup (exact-dup clusters -> O(c^2) candidates);
* the politeness page offset as pure column arithmetic (was a single-task
  global window).
"""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from goscrape_spark.config import CrawlConfig
from goscrape_spark.operators.dedup import (
    _simhash_batch,
    minhash_lsh_pairs,
    near_dup_minhash,
)
from goscrape_spark.operators.similarity import fixed_centroids, ivf_index
from goscrape_spark.plans.crawl import crawl
from goscrape_spark.sources.fixtures import SITE_LINKS, SITE_LINKS_START, pages_df


# ---------------------------------------------------------------------------
# SimHash batch kernel
# ---------------------------------------------------------------------------


def _ref_simhash(tokens: list[str]) -> int:
    """Per-token reference implementation (the definition both NumPy paths
    must reproduce bit-for-bit)."""
    acc = [0] * 64
    for t in tokens:
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        for k in range(64):
            acc[k] += 1 if (h >> k) & 1 else -1
    sig = 0
    for k in range(64):
        if acc[k] > 0:
            sig |= 1 << k
    return sig


def test_simhash_batch_trailing_empty_docs_reduceat():
    # trailing zero-token docs put cumsum bounds == len(flat): the reduceat
    # path must clip, not crash (ADVICE r2: IndexError on any large-vocab
    # batch ending in an empty/None doc)
    docs = [[f"tok{i}", f"tok{i+1}", f"tok{(i*7) % 50}"] for i in range(30)]
    docs += [[], None]                       # trailing empty AND null doc
    want = np.array([_ref_simhash(t or []) for t in docs], dtype=np.uint64)
    # dense_cells_limit=1 forces the reduceat path regardless of vocab size
    got_reduceat = _simhash_batch(docs, dense_cells_limit=1)
    got_matmul = _simhash_batch(docs)        # small n*u: matmul path
    assert got_reduceat.dtype == np.uint64
    assert (got_reduceat == want).all()
    assert (got_matmul == want).all()


def test_simhash_batch_middle_empty_and_all_empty():
    docs = [["a", "b"], [], ["c"], None, ["a", "a", "b"]]
    want = np.array([_ref_simhash(t or []) for t in docs], dtype=np.uint64)
    for limit in (1, 1 << 23):               # both accumulation paths
        got = _simhash_batch(docs, dense_cells_limit=limit)
        assert (got == want).all()
    assert (_simhash_batch([[], None], dense_cells_limit=1) == 0).all()
    assert len(_simhash_batch([])) == 0


# ---------------------------------------------------------------------------
# IVF broadcast assignment
# ---------------------------------------------------------------------------


def test_ivf_assignment_matches_numpy_at_256x256(spark):
    # the round-2 literal-expression tree OOMed an 8g driver at 16x64; the
    # broadcast+argmax path must handle 256 cells x 256 dims in the default
    # test session without plan blowup
    n, dim, n_cells = 400, 256, 256
    cents = fixed_centroids(n_cells, dim)
    rng = np.random.RandomState(7)
    X = rng.randn(n, dim).astype(np.float32)
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cell for r in ivf_index(df, cents).collect()}

    C = np.asarray(cents, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    want = (X.astype(np.float64) @ Cn.T).argmax(axis=1)
    assert got == {i: int(want[i]) for i in range(n)}


def test_ivf_assignment_null_and_ragged_rows(spark):
    cents = fixed_centroids(4, 3)
    rows = [(0, [1.0, 0.0, 0.0]), (1, None), (2, [1.0, 2.0]), (3, [])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cell for r in ivf_index(df, cents).collect()}
    # null / wrong-dim vectors deterministically land in cell 0
    assert got[1] == 0 and got[2] == 0 and got[3] == 0
    assert 0 <= got[0] < 4


def test_ivf_tie_breaks_to_lowest_cell(spark):
    # two identical centroids: argmax must take the FIRST (lowest cell id),
    # matching the old strict-> comparison and the DuckDB oracle
    cents = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    df = spark.createDataFrame([(0, [5.0, 0.0]), (1, [0.0, 2.0])],
                               "vec_id long, embedding array<float>")
    got = {r.vec_id: r.cell for r in ivf_index(df, cents).collect()}
    assert got == {0: 0, 1: 2}


# ---------------------------------------------------------------------------
# MinHash hot buckets
# ---------------------------------------------------------------------------


def test_minhash_exact_dup_cluster_collapses(spark):
    # 5000 byte-identical docs: without the collapse every band bucket holds
    # all 5000 -> ~12.5M candidate rows per band; with it the cluster
    # contributes ONE representative
    boiler = "the same boilerplate footer text appears on every single page"
    near_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near_b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [(i, boiler) for i in range(100, 5100)]
    rows += [(1, near_a), (2, near_b),
             (3, "totally unrelated content about spark partitioning")]
    df = spark.createDataFrame(rows, "doc_id long, text string") \
              .repartition(4)
    pairs = {(r.id1, r.id2) for r in
             near_dup_minhash(df, threshold=0.5).collect()}
    # the near-dup pair among distinct texts survives
    assert (1, 2) in pairs
    # no pair touches a non-representative member of the identical cluster
    assert all(i1 not in range(101, 5100) and i2 not in range(101, 5100)
               for i1, i2 in pairs)


def test_minhash_bucket_cap_bounds_candidates(spark):
    text = "identical text for the cap test repeated across docs"
    df = spark.createDataFrame([(i, text) for i in range(60)],
                               "doc_id long, text string")
    pairs = {(r.id1, r.id2) for r in
             minhash_lsh_pairs(df, bucket_cap=5).collect()}
    # each band keeps the 5 lowest ids -> pairs only among {0..4}
    assert pairs == {(i, j) for i in range(5) for j in range(i + 1, 5)}


# ---------------------------------------------------------------------------
# politeness offsets (no global window)
# ---------------------------------------------------------------------------


def test_crawl_source_has_no_unpartitioned_window():
    import inspect

    import goscrape_spark.plans.crawl as m
    src = inspect.getsource(m)
    assert "Window.orderBy" not in src          # the W2 scale-killer shape
    assert "Window" not in src.split("import", 1)[1].split("\n")[0]


def test_politeness_page_offsets_are_epoch_ranks(spark):
    res = crawl(spark,
                CrawlConfig(url=SITE_LINKS_START, politeness_delay_ms=1000),
                pages_df(spark, SITE_LINKS))
    rows = [r for r in res.fetch_log.collect() if r.kind == "page"]
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    for rs in by_epoch.values():
        rs.sort(key=lambda r: r.parent_seq)
        # identical schedule to the old row_number window: 0, delay, 2*delay
        assert [r.not_before_ms for r in rs] == \
               [i * 1000 for i in range(len(rs))]
