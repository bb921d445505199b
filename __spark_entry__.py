"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship epoch-synchronous crawl over a mock web
derived deterministically from sf0.001 documents and returns the crawled
span table.  ``queries()``/``oracle_sql()`` expose each implemented operator
from SURVEY.md §2 (plus the training-data operators) over the driver's
testdata tables, with DuckDB-mirrored SQL for every SQL-expressible stage.

Naming convention: every computed column is aliased identically in the Spark
code and the SQL so the driver's order-insensitive value-hash compare works.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEED_HOST = "src0.example.com"

# ---------------------------------------------------------------------------
# shared derivations (Spark + SQL mirrors)
# ---------------------------------------------------------------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _candidate_urls(docs: DataFrame) -> DataFrame:
    """Deterministic URL-shaped rows derived from the documents table —
    the fixture for the crawl-engine column operators (F1-F3, W1, J1...).
    Collisions are intentional: path uses doc_id mod 37/101."""
    did = F.col("doc_id")
    host = (F.when(did % 7 == 0, F.lit("cdn.external.net"))
            .otherwise(F.concat(F.col("source"), F.lit(".example.com"))))
    path = F.concat(F.lit("/c"), (did % 37).cast("string"),
                    F.lit("/doc-"), (did % 101).cast("string"),
                    F.when(did % 5 == 0, F.lit("/")).otherwise(F.lit("")))
    frag = F.when(did % 3 == 0,
                  F.concat(F.lit("#s"), did.cast("string"))) \
            .otherwise(F.lit(""))
    url = F.concat(F.lit("https://"), host, path, frag)
    return docs.select("doc_id", "n_chars", url.alias("url"))


_SQL_CANDS = """
cands AS (
  SELECT doc_id, n_chars,
         'https://' ||
         (CASE WHEN doc_id % 7 = 0 THEN 'cdn.external.net'
               ELSE source || '.example.com' END) ||
         ('/c' || (doc_id % 37)::VARCHAR || '/doc-' || (doc_id % 101)::VARCHAR ||
          CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
         (CASE WHEN doc_id % 3 = 0 THEN '#s' || doc_id::VARCHAR ELSE '' END)
         AS url
  FROM documents
)"""

_SQL_PARSED = _SQL_CANDS + """,
parsed AS (
  SELECT doc_id, n_chars,
         split_part(url, '#', 1) AS url_no_frag,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1) AS host,
         regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path
  FROM cands
),
keyed AS (
  SELECT doc_id, n_chars, url_no_frag, host, path,
         (CASE WHEN
            (CASE WHEN host = 'src0.example.com'
                  THEN (CASE WHEN path = '' THEN '/' ELSE path END)
                  ELSE url_no_frag END) <> '/'
            AND (CASE WHEN host = 'src0.example.com'
                      THEN (CASE WHEN path = '' THEN '/' ELSE path END)
                      ELSE url_no_frag END) LIKE '%/'
          THEN substr((CASE WHEN host = 'src0.example.com'
                            THEN (CASE WHEN path = '' THEN '/' ELSE path END)
                            ELSE url_no_frag END), 1,
                      length(CASE WHEN host = 'src0.example.com'
                                  THEN (CASE WHEN path = '' THEN '/' ELSE path END)
                                  ELSE url_no_frag END) - 1)
          ELSE (CASE WHEN host = 'src0.example.com'
                     THEN (CASE WHEN path = '' THEN '/' ELSE path END)
                     ELSE url_no_frag END) END) AS dedup_key
  FROM parsed
)"""


def _keyed(docs: DataFrame) -> DataFrame:
    """Spark side of the parsed+keyed candidate table, using the engine's
    own column helpers (goscrape_spark.functions.urlnorm)."""
    from goscrape_spark.functions.urlnorm import (
        col_dedup_key,
        col_host,
        col_path,
        col_strip_fragment,
    )

    c = _candidate_urls(docs)
    u = F.col("url")
    return c.select(
        "doc_id", "n_chars",
        col_strip_fragment(u).alias("url_no_frag"),
        col_host(u).alias("host"),
        col_path(u).alias("path"),
        col_dedup_key(col_strip_fragment(u), col_host(u), col_path(u),
                      F.lit(SEED_HOST)).alias("dedup_key"))


_SQL_WORDS = """
w AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
  FROM documents
)"""

_STOPS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "dans"],
}


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_urlnorm_dedup_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F3 + C2: fragment strip, URL part projection, dedup-key."""
    return _keyed(_docs(spark, sf_dir))


def q_admission_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: first-wins within the consideration order (doc_id)."""
    k = _keyed(_docs(spark, sf_dir))
    w = Window.partitionBy("dedup_key").orderBy("doc_id")
    return (k.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("dedup_key", F.col("doc_id").alias("winner_doc")))


def q_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/U3: candidate keys minus an already-seen table."""
    k = _keyed(_docs(spark, sf_dir))
    w = Window.partitionBy("dedup_key").orderBy("doc_id")
    winners = (k.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1))
    seen = (k.filter(F.col("doc_id") < 100)
            .select("dedup_key").distinct())
    return (winners.join(seen, "dedup_key", "left_anti")
            .select("dedup_key", F.col("doc_id").alias("winner_doc")))


def q_frontier_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/O2: global frontier sequence by (depth, host, key) priority."""
    base = q_admission_first_wins(spark, sf_dir)
    k = _keyed(_docs(spark, sf_dir)).select("doc_id", "host")
    j = base.join(k, base["winner_doc"] == k["doc_id"], "inner") \
            .withColumn("depth", (F.col("winner_doc") % 4).cast("int"))
    w = Window.orderBy("depth", "host", "dedup_key")
    return j.select("dedup_key", "depth", "host",
                    F.row_number().over(w).cast("long").alias("seq"))


def q_per_host_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-host crawl metrics (count + bytes)."""
    k = _keyed(_docs(spark, sf_dir))
    return (k.groupBy("host")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.sum("n_chars").alias("total_chars")))


def q_page_file_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: page file naming as a column expression."""
    from goscrape_spark.functions.urlmath import col_page_file_path

    k = _keyed(_docs(spark, sf_dir))
    return k.select("doc_id", "path",
                    col_page_file_path(F.col("path")).alias("file_path"))


def q_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: 429 retry outcome + total linear backoff (scraper/http.go:18-96)."""
    from goscrape_spark.operators.politeness import retry_backoff_ms

    ev = _events(spark, sf_dir)
    retry_after = (F.col("event_id") % 13).cast("int")
    attempts = (F.when(retry_after <= 10, retry_after + 1)
                .otherwise(F.lit(11))).cast("int")
    status = F.when(retry_after <= 10, F.lit("ok")).otherwise(F.lit("exhausted"))
    return ev.select(
        "event_id", attempts.alias("attempts"), status.alias("status"),
        retry_backoff_ms(attempts).alias("backoff_ms"))


def q_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: per-host politeness spacing in consideration order."""
    from goscrape_spark.operators.politeness import schedule_politeness

    ev = _events(spark, sf_dir).select(
        "event_id", F.col("event_type").alias("host"))
    out = schedule_politeness(ev, delay_ms=1500, host_col="host",
                              order_cols=["event_id"])
    return out.select("event_id", "host", "not_before_ms")


def q_sorted_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/O1: per-document distinct sorted reference lists (exploded)."""
    from goscrape_spark.operators.textops import words

    d = _docs(spark, sf_dir)
    return (d.select("doc_id",
                     F.explode(F.array_sort(F.array_distinct(
                         words(F.col("text"))))).alias("ref")))


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: robots disallow-prefix exclusion (broadcast rules join)."""
    from goscrape_spark.operators.politeness import apply_robots, robots_rules_df

    k = _keyed(_docs(spark, sf_dir))
    hosts = [r.host for r in k.select("host").distinct().collect()
             if r.host != "cdn.external.net"]
    rules = robots_rules_df(spark, {h: ["/c1"] for h in hosts})
    return (apply_robots(k, rules)
            .select("doc_id", "host", "path"))


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.dedup import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.textops import token_count_bpe, token_count_ws

    d = _docs(spark, sf_dir)
    return d.select("doc_id",
                    token_count_ws(F.col("text")).cast("long").alias("n_ws"),
                    token_count_bpe(F.col("text")).cast("long").alias("n_bpe"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.textops import lang_id

    return _docs(spark, sf_dir).select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.textops import quality_score

    return _docs(spark, sf_dir).select(
        "doc_id", quality_score(F.col("text")).alias("quality"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.textops import fingerprint

    return _docs(spark, sf_dir).select(
        "doc_id", fingerprint(F.col("text")).alias("fp"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.dedup import ngram_jaccard_pairs

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 40)
    return ngram_jaccard_pairs(d, threshold=0.1)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.similarity import cosine_topk

    e = _embs(spark, sf_dir)
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    top = cosine_topk(e, q, k=10)
    return top.select("vec_id",
                      F.round(F.col("cosine_sim"), 4).alias("cosine_sim"))


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.similarity import brute_force_near_dup_pairs

    e = _embs(spark, sf_dir).filter(F.col("vec_id") < 200)
    pairs = brute_force_near_dup_pairs(e, threshold=0.3)
    return pairs.select("id1", "id2",
                        F.round(F.col("cosine_sim"), 4).alias("cosine_sim"))


# --- rows-only (non-SQL-expressible) ---------------------------------------


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.dedup import minhash_lsh_pairs

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 100)
    return minhash_lsh_pairs(d)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.dedup import simhash_signatures

    return simhash_signatures(_docs(spark, sf_dir))


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.similarity import ann_topk_lsh

    e = _embs(spark, sf_dir)
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return ann_topk_lsh(e, q, dim=len(q), k=10, n_planes=4)


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.similarity import (
        ivf_index,
        ivf_topk,
        train_ivf_centroids,
    )

    e = _embs(spark, sf_dir)
    cents = train_ivf_centroids(e, n_cells=8, dim=64, sample=500)
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return ivf_topk(ivf_index(e, cents), cents, q, k=10, nprobe=3) \
        .select("vec_id", F.round(F.col("cosine_sim"), 4).alias("cosine_sim"))


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from goscrape_spark.operators.multimodal import (
        extract_media_features,
        media_from_fetched,
    )

    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.encode(F.col("text"), "utf-8").alias("body"))
    return extract_media_features(media_from_fetched(d), dim=8)


def q_crawl_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full epoch-synchronous crawl on the reference's TestScraperLinks
    fixture; returns the final seen table (golden: 4 keys)."""
    from goscrape_spark.config import CrawlConfig
    from goscrape_spark.plans.crawl import crawl
    from goscrape_spark.sources.fixtures import (
        SITE_LINKS,
        SITE_LINKS_START,
        pages_df,
    )

    res = crawl(spark, CrawlConfig(url=SITE_LINKS_START),
                pages_df(spark, SITE_LINKS))
    return res.seen.select("dedup_key")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "urlnorm_dedup_key": q_urlnorm_dedup_key,
        "admission_first_wins": q_admission_first_wins,
        "seen_anti_join": q_seen_anti_join,
        "frontier_seq": q_frontier_seq,
        "per_host_metrics": q_per_host_metrics,
        "page_file_path": q_page_file_path,
        "retry_backoff": q_retry_backoff,
        "politeness_schedule": q_politeness_schedule,
        "sorted_refs": q_sorted_refs,
        "robots_filter": q_robots_filter,
        "exact_dedup": q_exact_dedup,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "ngram_jaccard": q_ngram_jaccard,
        "cosine_topk": q_cosine_topk,
        "embedding_near_dup": q_embedding_near_dup,
        # rows-only checks (non-SQL-expressible: hashes/LSH/crawl iteration)
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "media_features": q_media_features,
        "crawl_fixture": q_crawl_fixture,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    stop_hits = {lang: (f"len(list_filter(ws, w -> list_contains("
                        f"{_sql_list(ws)}, w)))")
                 for lang, ws in _STOPS.items()}
    lang_case = f"""
      CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
           WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr THEN 'en'
           WHEN h_es >= h_de AND h_es >= h_fr THEN 'es'
           WHEN h_de >= h_fr THEN 'de'
           ELSE 'fr' END"""

    return {
        "urlnorm_dedup_key": f"WITH {_SQL_PARSED} "
            "SELECT doc_id, n_chars, url_no_frag, host, path, dedup_key FROM keyed",

        "admission_first_wins": f"WITH {_SQL_PARSED} "
            "SELECT dedup_key, doc_id AS winner_doc FROM ("
            "  SELECT dedup_key, doc_id, row_number() OVER ("
            "    PARTITION BY dedup_key ORDER BY doc_id) rn FROM keyed) "
            "WHERE rn = 1",

        "seen_anti_join": f"WITH {_SQL_PARSED}, "
            "winners AS (SELECT dedup_key, doc_id FROM ("
            "  SELECT dedup_key, doc_id, row_number() OVER ("
            "    PARTITION BY dedup_key ORDER BY doc_id) rn FROM keyed) WHERE rn=1), "
            "seen AS (SELECT DISTINCT dedup_key FROM keyed WHERE doc_id < 100) "
            "SELECT w.dedup_key, w.doc_id AS winner_doc FROM winners w "
            "WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.dedup_key = w.dedup_key)",

        "frontier_seq": f"WITH {_SQL_PARSED}, "
            "winners AS (SELECT dedup_key, doc_id FROM ("
            "  SELECT dedup_key, doc_id, row_number() OVER ("
            "    PARTITION BY dedup_key ORDER BY doc_id) rn FROM keyed) WHERE rn=1) "
            "SELECT w.dedup_key, (w.doc_id % 4)::INT AS depth, k.host, "
            "  row_number() OVER (ORDER BY (w.doc_id % 4), k.host, w.dedup_key)::BIGINT AS seq "
            "FROM winners w JOIN keyed k ON k.doc_id = w.doc_id",

        "per_host_metrics": f"WITH {_SQL_PARSED} "
            "SELECT host, count(*)::BIGINT AS n_urls, "
            "  sum(n_chars)::BIGINT AS total_chars FROM keyed GROUP BY host",

        "page_file_path": f"WITH {_SQL_PARSED} "
            "SELECT doc_id, path, "
            "  CASE WHEN path = '' OR path = '/' THEN 'index.html' "
            "       WHEN path LIKE '%/' THEN path || 'index.html' "
            "       WHEN NOT regexp_matches(path, '\\.[^/]*$') THEN path || '.html' "
            "       ELSE path END AS file_path FROM keyed",

        "retry_backoff": """
            SELECT event_id,
              (CASE WHEN event_id % 13 <= 10 THEN (event_id % 13) + 1
                    ELSE 11 END)::INT AS attempts,
              CASE WHEN event_id % 13 <= 10 THEN 'ok' ELSE 'exhausted' END AS status,
              (((CASE WHEN event_id % 13 <= 10 THEN (event_id % 13) + 1 ELSE 11 END) - 1)
               * (CASE WHEN event_id % 13 <= 10 THEN (event_id % 13) + 1 ELSE 11 END)
               / 2)::BIGINT * 1500 AS backoff_ms
            FROM events""",

        "politeness_schedule": """
            SELECT event_id, event_type AS host,
              ((row_number() OVER (PARTITION BY event_type ORDER BY event_id)) - 1)::BIGINT
              * 1500 AS not_before_ms
            FROM events""",

        "sorted_refs": f"WITH {_SQL_WORDS} "
            "SELECT DISTINCT doc_id, unnest(ws) AS ref FROM w",

        "robots_filter": f"WITH {_SQL_PARSED} "
            "SELECT doc_id, host, path FROM keyed "
            "WHERE NOT (host <> 'cdn.external.net' AND path LIKE '/c1%')",

        "exact_dedup": """
            SELECT md5(text) AS text_hash, min(doc_id) AS rep_id,
                   count(*)::BIGINT AS dup_count
            FROM documents GROUP BY md5(text)""",

        "token_counts": """
            SELECT doc_id,
              (CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END)::BIGINT AS n_ws,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-zA-Z0-9\\s]'))::BIGINT AS n_bpe
            FROM documents""",

        "lang_id": f"WITH {_SQL_WORDS}, hits AS (SELECT doc_id, "
            f"{stop_hits['en']} AS h_en, {stop_hits['es']} AS h_es, "
            f"{stop_hits['de']} AS h_de, {stop_hits['fr']} AS h_fr FROM w) "
            f"SELECT doc_id, {lang_case} AS lang_pred FROM hits",

        "quality_score": f"""
            WITH {_SQL_WORDS}, m AS (
              SELECT d.doc_id, length(d.text) AS nc,
                (CASE WHEN length(trim(d.text)) = 0 THEN 0 ELSE len(w.ws) END) AS nw,
                len(regexp_extract_all(d.text, '[.,;:!?]')) AS np,
                {stop_hits['en']} AS sh
              FROM documents d JOIN w ON w.doc_id = d.doc_id)
            SELECT doc_id, round((
                (CASE WHEN nc >= 50 AND nc <= 20000 THEN 1.0 ELSE 0.0 END) +
                (CASE WHEN np / greatest(nw, 1) <= 0.3
                      THEN 1.0 - np / greatest(nw, 1) ELSE 0.0 END) +
                least(sh * 4.0 / greatest(nw, 1), 1.0) +
                (CASE WHEN nc / greatest(nw, 1) >= 3 AND nc / greatest(nw, 1) <= 12
                      THEN 1.0 ELSE 0.0 END)
              ) / 4, 4) AS quality
            FROM m""",

        "fingerprint": f"WITH {_SQL_WORDS} "
            "SELECT doc_id, list_min(list_transform(range(1, len(ws)-1), "
            "  i -> md5(array_to_string(ws[i:i+2], ' ')))) AS fp FROM w",

        "ngram_jaccard": f"""
            WITH w AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ws
              FROM documents WHERE doc_id < 40),
            sh AS (
              SELECT DISTINCT doc_id, unnest(list_transform(
                range(1, len(ws)-1),
                i -> array_to_string(ws[i:i+2], ' '))) AS shingle
              FROM w),
            sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS i
              FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT id1, id2,
              round(i / (sa.sz + sb.sz - i), 4) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = id1
                       JOIN sizes sb ON sb.doc_id = id2
            WHERE i / (sa.sz + sb.sz - i) >= 0.1""",

        "cosine_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
            scored AS (
              SELECT vec_id,
                list_dot_product(embedding::DOUBLE[], qe) /
                (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
                 sqrt(list_dot_product(qe, qe))) AS s
              FROM embeddings, q)
            SELECT vec_id, round(round(s, 6), 4) AS cosine_sim
            FROM scored ORDER BY round(s, 6) DESC, vec_id LIMIT 10""",

        "embedding_near_dup": """
            SELECT a.vec_id AS id1, b.vec_id AS id2,
              round(round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                 sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6), 4)
              AS cosine_sim
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
              AND round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                 sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)
                  >= 0.3""",
    }


# ---------------------------------------------------------------------------
# flagship entry
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: epoch-synchronous crawl of a mock web derived from sf0.001
    documents; returns the crawled interleaved span table."""
    from goscrape_spark.config import CrawlConfig
    from goscrape_spark.plans.crawl import crawl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    host = "corpus.example.com"
    did = F.col("doc_id")
    url = F.when(did == 0, F.lit(f"https://{host}/")) \
           .otherwise(F.concat(F.lit(f"https://{host}/doc/"),
                               did.cast("string")))
    children = F.filter(
        F.sequence(did * 4 + 1, did * 4 + 4),
        lambda c: c < F.lit(500))
    links = F.array_join(F.transform(
        children, lambda c: F.concat(F.lit('<a href="/doc/'),
                                     c.cast("string"), F.lit('">d</a>'))), "\n")
    img = F.concat(F.lit('<img src="/img/'), (did % 50).cast("string"),
                   F.lit('.png">'))
    body = F.concat(F.lit("<html><body><p>"), F.col("text"),
                    F.lit("</p>\n"), img, F.lit("\n"), links,
                    F.lit("</body></html>"))
    pages = docs.select(url.alias("url"), F.encode(body, "utf-8").alias("body"),
                        F.lit(None).cast("string").alias("resp_url"),
                        F.lit(0).alias("retry_after"))
    imgs = spark.range(50).select(
        F.concat(F.lit(f"https://{host}/img/"), F.col("id").cast("string"),
                 F.lit(".png")).alias("url"),
        F.encode(F.lit("\x89PNGfake"), "utf-8").alias("body"),
        F.lit(None).cast("string").alias("resp_url"),
        F.lit(0).alias("retry_after"))

    res = crawl(spark, CrawlConfig(url=f"https://{host}/", max_depth=3),
                pages.unionByName(imgs))
    return res.documents.select("url", "kind", "text", "media_ref", "offset",
                                "depth", "epoch")
