"""Text-analysis operators for large-scale training-data pipelines.

These extend the crawl engine with the document-processing stages a 100 TB
corpus pipeline needs (see the build brief): language ID, quality scoring,
token counting, and document fingerprinting — all pure column expressions
(JVM-side, whole-stage codegen; zero Python on the hot path), each with a
DuckDB-mirrorable formulation so the driver's oracle can verify values.

Portability note: fingerprints use md5 (identical hex output in Spark and
DuckDB) rather than xxhash64 (Spark-only), trading a few cycles for an
exactly verifiable result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny high-frequency stopword lists (public knowledge) for the n-gram/
# stopword language heuristic. Ordering matters for tie-breaks: first wins.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "du", "dans"],
}

# BPE-ish token splitter: word pieces, numbers, or single non-space symbols —
# the classic pre-tokenization regex shape used by BPE vocabularies.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-zA-Z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
            .otherwise(F.size(words(text)))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenization regex (column expr).
    regexp_count walks the same Java-regex matcher as
    size(regexp_extract_all(...)) but never materializes the match strings
    (~hundreds of allocations per document saved)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def stopword_hits(text: Column, lang: str) -> Column:
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(text), lambda w: F.array_contains(stops, w)))


def lang_id(text: Column) -> Column:
    """Stopword-ratio language ID: the language whose stopword list hits the
    most tokens; 'und' (undetermined) when nothing hits.  Ties break by the
    STOPWORDS declaration order."""
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang in STOPWORDS:
        hits = stopword_hits(text, lang)
        better = hits > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, hits).otherwise(best_hits)
    return best_lang


def lang_hits_from_words(ws: Column) -> Column:
    """Per-language stopword hit counts (STOPWORDS declaration order) over
    an ALREADY-TOKENIZED word array.  Staging the tokenization into its own
    projection matters: array HOFs are CodegenFallback (no subexpression
    elimination), so lang_id's single-column form re-splits the text for
    every language and re-evaluates the hit counts inside the nested
    tie-break whens — 4-8 splits per row.  A multi-referenced non-trivial
    alias blocks Catalyst's CollapseProject, so the split and each hit
    count evaluate exactly once (guide §1.2 step 2)."""
    def hit_count(stops):
        return F.size(F.filter(ws, lambda w: F.array_contains(stops, w)))

    return F.array(*[
        hit_count(F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        for lang in STOPWORDS])


def lang_pick(hits: Column) -> Column:
    """lang_id's exact tie-break chain (first language wins on >) over a
    precomputed hit-count array — cheap integer whens only."""
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for i, lang in enumerate(STOPWORDS):
        h = hits[i]
        better = h > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, h).otherwise(best_hits)
    return best_lang


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: length band + punctuation sanity +
    stopword presence + mean word length band.  All column arithmetic;
    rounded to 4 decimals for cross-engine verification."""
    n_chars = F.length(text)
    n_words = token_count_ws(text)
    n_punct = F.regexp_count(text, F.lit(r"[.,;:!?]"))
    stop_hits = stopword_hits(text, "en")

    len_ok = F.when((n_chars >= 50) & (n_chars <= 20000), F.lit(1.0)) \
              .otherwise(F.lit(0.0))
    punct_ratio = n_punct / F.greatest(n_words, F.lit(1))
    punct_ok = F.when(punct_ratio <= 0.3, F.lit(1.0) - punct_ratio) \
                .otherwise(F.lit(0.0))
    stop_ratio = stop_hits / F.greatest(n_words, F.lit(1))
    stop_ok = F.least(stop_ratio * 4, F.lit(1.0))
    mean_wlen = n_chars / F.greatest(n_words, F.lit(1))
    wlen_ok = F.when((mean_wlen >= 3) & (mean_wlen <= 12), F.lit(1.0)) \
               .otherwise(F.lit(0.0))
    return F.round((len_ok + punct_ok + stop_ok + wlen_ok) / 4, 4)


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings ('w1 w2 w3')."""
    ws = words(text)
    k = F.size(ws) - (n - 1)
    return F.when(k <= 0, F.array(F.concat_ws(" ", ws))).otherwise(
        F.transform(F.sequence(F.lit(1), k),
                    lambda i: F.concat_ws(" ", F.slice(ws, i, n))))


def fingerprint(text: Column, n: int = 3) -> Column:
    """Document fingerprint: lexicographic min of md5 over word n-gram
    shingles — a 1-perm MinHash, portable across engines."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


def fingerprint_from_words(df, id_col: str = "doc_id",
                           text_col: str = "text", n: int = 3):
    """fingerprint() as an Arrow batch over JVM-tokenized words (guide
    §4.2): tokenization stays the identical JVM ``split(lower(trim(.)),
    '\\s+')`` (Java vs Python ``\\s`` semantics differ, so the split must
    not move), while shingle assembly + md5 + min run in C
    (str.join/hashlib) instead of interpreted Catalyst HOFs, which
    evaluate per element with no codegen.  hexdigest is byte-identical to
    Spark md5(); ASCII hex makes Python ``min`` == UTF8-binary array_min.
    Returns (id_col, fp) — same values as
    ``select(id, fingerprint(text))``."""
    from typing import Iterator

    tokens = df.select(F.col(id_col), words(F.col(text_col)).alias("_ws"))
    out_schema = f"{id_col} {df.schema[id_col].dataType.simpleString()}, " \
                 "fp string"

    def run(batches) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            fps = []
            for ws in pdf["_ws"]:
                if ws is None:
                    fps.append(None)
                    continue
                toks = list(ws)
                k = len(toks) - (n - 1)
                if k <= 0:
                    gen = [" ".join(toks)]
                else:
                    gen = (" ".join(toks[i:i + n]) for i in range(k))
                fps.append(min(hashlib.md5(s.encode("utf-8")).hexdigest()
                               for s in gen))
            yield pd.DataFrame({id_col: pdf[id_col], "fp": fps})

    return tokens.mapInPandas(run, schema=out_schema)


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: tokens, bpe tokens, lang, quality, fingerprint."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count_ws(t).alias("n_tokens"),
        token_count_bpe(t).alias("n_bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )
