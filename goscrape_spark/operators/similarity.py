"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — brute-force exact top-k against a query vector,
                         pure column expressions (F.aggregate/F.zip_with dot
                         product); the correctness baseline.
* ``rp_lsh_buckets``   — random-hyperplane (sign) LSH bucketing; the scale
                         path: top-k probes only the query's bucket ring.
* ``embedding_near_dup_pairs`` — pairwise cosine >= tau near-dup pairs via
                         bucketed self-join (exact verify after LSH block).

Hyperplanes are derived deterministically from a seed (no RNG state on
executors; plain arithmetic on (seed, plane, dim) hashes) so results are
stable across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``; ties break on id.

    The plan is a full scan + projection + top-k sort: Spark's TakeOrdered
    keeps only k rows per partition, so no global sort materializes."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (df.select(F.col(id_col),
                      F.round(cosine(vec, q), 6).alias("cosine_sim"))
            .orderBy(F.desc("cosine_sim"), F.col(id_col))
            .limit(k))


def _hyperplane(seed: int, plane: int, dim: int) -> list[float]:
    """Deterministic unit-ish hyperplane via hashed gaussians (Box-Muller on
    hash-derived uniforms)."""
    out = []
    for d in range(0, dim, 2):
        h = hashlib.blake2b(f"{seed}:{plane}:{d}".encode(),
                            digest_size=16).digest()
        u1 = (int.from_bytes(h[:8], "little") % (10 ** 12) + 1) / (10 ** 12 + 1)
        u2 = (int.from_bytes(h[8:], "little") % (10 ** 12)) / (10 ** 12)
        r = math.sqrt(-2 * math.log(u1))
        out.append(r * math.cos(2 * math.pi * u2))
        out.append(r * math.sin(2 * math.pi * u2))
    return out[:dim]


def rp_lsh_buckets(df: DataFrame, dim: int, n_planes: int = 8,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH: bucket = sign-bit string over n_planes
    hyperplanes.  Column-expression dot products — no Python at run time."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(seed, p, dim)])
        bits.append(F.when(_dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("bucket", F.concat(*bits))


def query_bucket_bits(query_vec: list[float], dim: int, n_planes: int,
                      seed: int = 42) -> str:
    """The query's sign-bucket under the deterministic hyperplanes."""
    qbits = ""
    for p in range(n_planes):
        plane = _hyperplane(seed, p, dim)
        dot = sum(a * b for a, b in zip(query_vec, plane))
        qbits += "1" if dot >= 0 else "0"
    return qbits


def probe_buckets(qbits: str, radius: int) -> list[str]:
    """Multi-probe bucket ring: all buckets within Hamming distance
    <= radius of the query bucket (radius 1 = flip each bit once)."""
    from itertools import combinations

    out = [qbits]
    for r in range(1, radius + 1):
        for flips in combinations(range(len(qbits)), r):
            b = list(qbits)
            for i in flips:
                b[i] = "0" if b[i] == "1" else "1"
            out.append("".join(b))
    return out


def ann_topk_lsh(df: DataFrame, query_vec: list[float], dim: int, k: int = 10,
                 n_planes: int = 8, id_col: str = "vec_id",
                 vec_col: str = "embedding", seed: int = 42,
                 probe_radius: int = 1, fallback: bool = False) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket ring
    (multi-probe: the bucket plus its Hamming-<=radius neighbors — the
    standard fix for near-boundary queries and sparse buckets).  With
    ``fallback=True`` a ring holding fewer than k rows degrades to the
    exact full scan, guaranteeing k results."""
    qbits = query_bucket_bits(query_vec, dim, n_planes, seed)
    ring = probe_buckets(qbits, probe_radius)
    bucketed = rp_lsh_buckets(df, dim, n_planes, id_col, vec_col, seed)
    cand = bucketed.filter(F.col("bucket").isin(ring))
    if fallback and cand.count() < k:
        cand = bucketed  # degenerate ring: exact scan keeps recall = 1
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(df: DataFrame, dim: int, threshold: float = 0.9,
                             n_planes: int = 6, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             seed: int = 42) -> DataFrame:
    """Cosine >= threshold pairs: LSH-blocked self-join + exact verify.

    High-threshold near-dups almost always share the sign bucket; the
    self-join runs per bucket (equi-join, shuffles on bucket), then the
    exact cosine filters.  For guaranteed recall, union several seeds."""
    b = rp_lsh_buckets(df, dim, n_planes, id_col, vec_col, seed) \
        .select(F.col(id_col).alias("id"), "bucket",
                F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
    l = b.alias("l")
    r = b.alias("r")
    return (l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col("l.id") < F.col("r.id")))
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"),
                    F.round(cosine(F.col("l.v"), F.col("r.v")), 6)
                     .alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse k-means quantizer + cell-probed search
# ---------------------------------------------------------------------------


def train_ivf_centroids(df: DataFrame, n_cells: int, dim: int,
                        vec_col: str = "embedding", sample: int = 10_000,
                        iters: int = 8, seed: int = 42):
    """Train the coarse quantizer: mini k-means on a deterministic sample,
    driver-side NumPy (the sample is tiny; the expensive part — assignment
    over the full table — is distributed column math).  Returns a
    (n_cells, dim) list-of-lists."""
    import numpy as np

    rows = (df.select(vec_col).limit(sample).collect())
    X = np.array([[float(v) for v in r[0]] for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        # cosine assignment: normalize then argmax dot
        Xn = X / (np.linalg.norm(X, axis=1, keepdims=True) + 1e-12)
        Cn = cents / (np.linalg.norm(cents, axis=1, keepdims=True) + 1e-12)
        assign = (Xn @ Cn.T).argmax(axis=1)
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [[float(x) for x in c] for c in cents]


def fixed_centroids(n_cells: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Data-independent deterministic centroids (hash-gaussian directions).
    A valid-but-unlearned coarse quantizer: cell assignment and probing
    behave identically to trained centroids, so this tier is the
    DuckDB-mirrorable one (centroid literals are pure functions of the
    seed); ``train_ivf_centroids`` learns better-balanced cells."""
    return [_hyperplane(seed * 1_000_003 + 17, c, dim) for c in range(n_cells)]


def ivf_index(df: DataFrame, centroids: list[list[float]],
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid cell (argmax cosine,
    ties -> the LOWEST cell id; null/zero/ragged vectors -> cell 0).

    The assignment is a BROADCAST (n_cells, dim) row-normalized centroid
    matrix + one batched matmul-argmax inside an Arrow pandas_udf —
    O(batch × n_cells × dim) FLOPs and O(n_cells × dim) memory once per
    executor.  A previous version built the argmax as an O(n_cells × dim)
    nested-``when`` Catalyst literal tree; at 16 cells × 64 dims it blew an
    8g driver heap during plan/codegen, and at a realistic 4096 × 768 it is
    a driver-killer — the expression size must never scale with the index.
    Cosine argmax is scale-invariant in the query vector, so only the
    centroids are normalized (dot against unit centroids ≡ cosine ranking).

    At scale, write the result partitioned by ``cell`` so a probe reads
    only its cells' files (partition pruning)."""
    C = np.asarray(centroids, dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0          # zero-norm centroid guard (matches the
    Cn = C / cn[:, None]       # old literal expression's `or 1.0`)
    n_cells, dim = Cn.shape
    bc = df.sparkSession.sparkContext.broadcast(Cn)

    @F.pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        cents = bc.value
        arrs = vecs.to_numpy()
        bad = np.fromiter(
            (v is None or len(v) != dim for v in arrs),
            dtype=bool, count=len(arrs))
        if bad.any():
            arrs = arrs.copy()
            zero = np.zeros(dim)
            for i in np.flatnonzero(bad):   # bad rows are the rare exception
                arrs[i] = zero
        if len(arrs) == 0:
            return pd.Series(np.zeros(0, dtype=np.int32))
        M = np.vstack(arrs).astype(np.float64, copy=False)
        # argmax of dot-vs-unit-centroids == argmax cosine (row scaling
        # cannot change a row's argmax); np.argmax takes the FIRST max,
        # i.e. the lowest cell id on ties
        cell = (M @ cents.T).argmax(axis=1).astype(np.int32)
        cell[bad] = 0
        return pd.Series(cell)

    return df.withColumn("cell", assign(F.col(vec_col)))


def ivf_topk(indexed: DataFrame, centroids: list[list[float]],
             query_vec: list[float], k: int = 10, nprobe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Probe the ``nprobe`` nearest cells and rank exactly within them.

    The scan touches only the probed cells — with a cell-partitioned table
    that is a partition-pruned read of ~nprobe/n_cells of the data."""
    import math as _math

    qn = _math.sqrt(sum(x * x for x in query_vec)) or 1.0
    sims = []
    for cid, cent in enumerate(centroids):
        cn = _math.sqrt(sum(x * x for x in cent)) or 1.0
        sims.append((sum(a * b for a, b in zip(query_vec, cent)) / (qn * cn),
                     cid))
    # ties break on the LOWER cell id (matches _cell_assign and the oracle)
    probe_cells = [cid for _, cid in
                   sorted(sims, key=lambda t: (-t[0], t[1]))[:nprobe]]
    return cosine_topk(indexed.filter(F.col("cell").isin(probe_cells)),
                       query_vec, k, id_col, vec_col)


def brute_force_near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> DataFrame:
    """Exact O(n^2) near-dup pairs — the oracle tier for small n."""
    b = df.select(F.col(id_col).alias("id"),
                  F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"))
    l = b.alias("l")
    r = b.alias("r")
    return (l.join(r, F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id1"), F.col("r.id").alias("id2"),
                    F.round(cosine(F.col("l.v"), F.col("r.v")), 6)
                     .alias("cosine_sim"))
            .filter(F.col("cosine_sim") >= threshold))
