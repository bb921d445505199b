"""Training-data operators: dedup / similarity / textops / multimodal."""

import duckdb
import pytest
from pyspark.sql import functions as F

from goscrape_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_keep_first,
    minhash_lsh_pairs,
    near_dup_minhash,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from goscrape_spark.operators.multimodal import (
    extract_media_features,
    media_from_fetched,
)
from goscrape_spark.operators.similarity import (
    ann_topk_lsh,
    brute_force_near_dup_pairs,
    cosine_topk,
    embedding_near_dup_pairs,
)
from goscrape_spark.operators.textops import text_profile

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_dedup_matches_duckdb(docs):
    got = {(r.text_hash, r.rep_id, r.dup_count)
           for r in exact_dedup(docs).collect()}
    want = set(duckdb.sql(
        f"select md5(text) h, min(doc_id) r, count(*) c "
        f"from '{SF_DIR}/documents.parquet' group by 1").fetchall())
    assert got == want
    kept = exact_dedup_keep_first(docs)
    assert kept.count() == len(want)


def test_ngram_jaccard_detects_self_similarity(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id1, r.id2) for r in
             ngram_jaccard_pairs(df, threshold=0.3).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_lsh_finds_near_dups(spark):
    base = "spark engines shuffle partitions across executors with adaptive query execution enabled for skew"
    rows = [(1, base), (2, base.replace("skew", "drift")),
            (3, "unrelated text about cooking pasta with tomatoes and basil leaves fresh")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {(r.id1, r.id2) for r in minhash_lsh_pairs(df).collect()}
    assert (1, 2) in cands
    verified = near_dup_minhash(df, threshold=0.5)
    got = {(r.id1, r.id2) for r in verified.collect()}
    assert got == {(1, 2)}


def test_simhash_near_pairs(spark):
    base = ("distributed systems need consensus replication snapshots "
            "leader election and failure detection to work correctly")
    rows = [(1, base), (2, base.replace("snapshots", "checkpoints")),
            (3, "gardening tips for growing tomatoes basil and peppers in small urban spaces today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id1, r.id2) for r in
             simhash_near_pairs(df, max_hamming=15).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs


def test_cosine_topk_matches_duckdb(embs):
    qrow = duckdb.sql(
        f"select embedding from '{SF_DIR}/embeddings.parquet' "
        f"where vec_id = 0").fetchone()
    q = [float(x) for x in qrow[0]]
    got = [(r.vec_id, r.cosine_sim) for r in
           cosine_topk(embs, q, k=5).collect()]
    want = duckdb.sql(f"""
        with scored as (
          select vec_id,
                 round(list_dot_product(embedding::DOUBLE[], {q}::DOUBLE[]) /
                       (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                        sqrt(list_dot_product({q}::DOUBLE[], {q}::DOUBLE[]))), 6) s
          from '{SF_DIR}/embeddings.parquet')
        select vec_id, s from scored order by s desc, vec_id limit 5
        """).fetchall()
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert abs(g[1] - w[1]) < 1e-5


def test_ann_lsh_recall(embs):
    q = [float(x) for x in embs.filter(F.col("vec_id") == 1)
         .first().embedding]
    exact = [r.vec_id for r in cosine_topk(embs, q, k=5).collect()]
    approx = [r.vec_id for r in
              ann_topk_lsh(embs, q, dim=len(q), k=5, n_planes=4).collect()]
    # query vector itself must be found; recall is approximate by design
    assert 1 in approx
    assert len(set(exact) & set(approx)) >= 1


def test_embedding_near_dup_vs_brute_force(spark):
    rows = [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.99, 0.1, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0]), (4, [1.0, 0.01, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r.id1, r.id2) for r in
             brute_force_near_dup_pairs(df, threshold=0.95).collect()}
    lsh = {(r.id1, r.id2) for r in
           embedding_near_dup_pairs(df, dim=4, threshold=0.95,
                                    n_planes=2).collect()}
    assert exact == {(1, 2), (1, 4), (2, 4)}
    assert lsh <= exact  # LSH never invents pairs; may miss across buckets


def test_ivf_ann(embs):
    from goscrape_spark.operators.similarity import (
        cosine_topk,
        ivf_index,
        ivf_topk,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(embs, n_cells=8, dim=64, sample=500)
    assert len(cents) == 8 and len(cents[0]) == 64
    indexed = ivf_index(embs, cents).localCheckpoint(eager=True)
    # every vector lands in exactly one cell
    assert indexed.count() == embs.count()
    q = [float(x) for x in embs.filter(F.col("vec_id") == 3).first().embedding]
    exact = [r.vec_id for r in cosine_topk(embs, q, k=5).collect()]
    approx = [r.vec_id for r in ivf_topk(indexed, cents, q, k=5,
                                         nprobe=3).collect()]
    assert 3 in approx  # the query vector itself is found
    assert len(set(exact) & set(approx)) >= 2  # decent recall at nprobe=3
    # determinism
    cents2 = train_ivf_centroids(embs, n_cells=8, dim=64, sample=500)
    assert cents == cents2


def test_text_profile(docs):
    prof = text_profile(docs).limit(50).collect()
    for r in prof:
        assert r.n_tokens > 0
        assert r.n_bpe_tokens >= r.n_tokens
        assert 0.0 <= r.quality <= 1.0
        assert r.lang_pred in ("en", "es", "de", "fr", "und")
        assert r.fp is not None and len(r.fp) == 32


def test_multimodal_plumbing(spark):
    rows = [("u1", bytearray(b"\x89PNG\r\n\x1a\nxxxx")),
            ("u2", bytearray(b"\xff\xd8\xff\xe0yyyy")),
            ("u3", bytearray(b"plain text"))]
    fetched = spark.createDataFrame(rows, "url string, body binary")
    media = media_from_fetched(fetched)
    kinds = {r.media_id: r.kind for r in media.collect()}
    assert kinds == {"u1": "image", "u2": "image", "u3": "binary"}
    feats = extract_media_features(media, dim=8).collect()
    assert all(len(r.feature) == 8 for r in feats)
    # deterministic features
    feats2 = extract_media_features(media, dim=8).collect()
    assert {r.media_id: tuple(r.feature) for r in feats} == \
           {r.media_id: tuple(r.feature) for r in feats2}
    # decode='real': decodable images get REAL pixel statistics through the
    # vendored codec; undecodable "images" and non-images degrade honestly
    import numpy as np

    from goscrape_spark.functions.imagecodec import png_encode

    grad = np.zeros((4, 8, 3), np.uint8)
    grad[:, :, 0] = 200     # constant red plane
    grad[:, :, 1] = np.arange(8, dtype=np.uint8) * 30
    rows = [("img_ok", bytearray(png_encode(grad))),
            ("img_bad", bytearray(b"\x89PNG\r\n\x1a\ntruncated")),
            ("txt", bytearray(b"plain text"))]
    media2 = media_from_fetched(
        spark.createDataFrame(rows, "url string, body binary"))
    real = {r.media_id: r for r in
            extract_media_features(media2, dim=10,
                                   decode="real").collect()}
    assert real["img_ok"].decode_status == "real"
    assert real["img_bad"].decode_status == "undecodable"
    assert real["txt"].decode_status == "stub"
    f = real["img_ok"].feature
    assert abs(f[0] - 200 / 255) < 1e-6          # mean R
    assert abs(f[1] - 105 / 255) < 1e-6          # mean G of 0,30,..210
    assert f[6] == 4.0 and f[7] == 8.0           # height, width


def test_near_dup_clusters_small_graph(spark):
    """Chain a-b-c plus isolated pair d-e: two components, min-id labels."""
    from goscrape_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11)], "id1 bigint, id2 bigint")
    out = {r.doc_id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_near_dup_clusters_long_chain_converges(spark):
    """A 12-node path needs ~diameter rounds — label propagation must keep
    iterating past round 1 and still produce one component."""
    from goscrape_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)],
                                  "id1 bigint, id2 bigint")
    out = {r.doc_id: r.cluster_id for r in near_dup_clusters(pairs).collect()}
    assert set(out) == set(range(13))
    assert set(out.values()) == {0}


def test_stratified_sample_deterministic_and_monotone(spark):
    from goscrape_spark.operators.sampling import stratified_sample

    rows = [(i, "en" if i % 3 == 0 else "fr") for i in range(3000)]
    d = spark.createDataFrame(rows, "doc_id bigint, lang string")
    s1 = {r.doc_id for r in
          stratified_sample(d, "lang", {"en": 0.5}, 0.1).collect()}
    s2 = {r.doc_id for r in
          stratified_sample(d, "lang", {"en": 0.5}, 0.1).collect()}
    assert s1 == s2                       # deterministic, no RNG state
    # raising a rate yields a SUPERSET (monotone growth of the mix)
    s3 = {r.doc_id for r in
          stratified_sample(d, "lang", {"en": 0.8}, 0.1).collect()}
    assert s1 <= s3
    # measured rates are near nominal
    en = [i for i, lang in rows if lang == "en"]
    fr = [i for i, lang in rows if lang == "fr"]
    en_rate = len(s1 & set(en)) / len(en)
    fr_rate = len(s1 & set(fr)) / len(fr)
    assert abs(en_rate - 0.5) < 0.06 and abs(fr_rate - 0.1) < 0.04


def test_near_dup_clusters_raises_without_convergence(spark):
    """Exhausting max_iter must raise, not silently return split labels."""
    import pytest as _pt

    from goscrape_spark.operators.dedup import near_dup_clusters

    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)],
                                  "id1 bigint, id2 bigint")
    with _pt.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(pairs, max_iter=1)
