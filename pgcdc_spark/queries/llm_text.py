"""Text-analysis operators over `documents` (BASELINE.json north star):
token stats, language profiling, heuristic language-ID, quality scoring,
document fingerprinting.

All token work uses built-in split/explode/higher-order functions —
JVM-side, no UDFs. Per-doc operators are embarrassingly parallel (no
shuffle); rollups shuffle only |groups| after map-side combine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..catalog import fan_out, load
from . import query

# --- per-doc token statistics ----------------------------------------------

_TOKSTATS_ORACLE = """
SELECT
  doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS BIGINT) AS sum_tok_len,
  CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
    / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_tok_len,
  n_chars
FROM documents
"""


@query("docs_token_stats", oracle=_TOKSTATS_ORACLE, tags=("llm", "text"))
def docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    w = F.split("text", " ")
    d = docs.withColumn("w", w)
    sum_len = F.expr("aggregate(transform(w, x -> length(x)), 0, (a, x) -> a + x)")
    return d.select(
        "doc_id",
        F.size("w").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("w")).cast("long").alias("n_unique"),
        sum_len.cast("long").alias("sum_tok_len"),
        (sum_len.cast("double") / F.size("w").cast("double")).alias("avg_tok_len"),
        "n_chars",
    )


# --- corpus rollup by language ---------------------------------------------

_LANGPROF_ORACLE = """
SELECT
  lang,
  COUNT(*) AS n_docs,
  COUNT(DISTINCT source) AS n_sources,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT) AS total_tokens,
  CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS avg_tokens
FROM documents
GROUP BY lang
ORDER BY lang
"""


@query("docs_lang_profile", oracle=_LANGPROF_ORACLE, tags=("llm", "text", "agg"))
def docs_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " ")).cast("long")
    return (
        docs.withColumn("ntok", ntok)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("ntok").cast("long").alias("total_tokens"),
            (F.sum("ntok").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "avg_tokens"
            ),
        )
        .orderBy("lang")
    )


# --- heuristic language-ID (stopword overlap) ------------------------------
# n-gram/stopword-hit language ID: score = |distinct tokens ∩ stoplist|,
# argmax with a fixed tie order. Deterministic by construction.

_STOPLISTS = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "en"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "les", "des", "et", "un"),
}


def _lang_case_sql() -> str:
    return """
  CASE
    WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en > 0 THEN 'en'
    WHEN s_es >= s_de AND s_es >= s_fr AND s_es > 0 THEN 'es'
    WHEN s_de >= s_fr AND s_de > 0 THEN 'de'
    WHEN s_fr > 0 THEN 'fr'
    ELSE 'und'
  END"""


def _stop_score_sql(code: str) -> str:
    lst = ", ".join(f"'{t}'" for t in _STOPLISTS[code])
    return (
        f"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), [{lst}])) AS BIGINT)"
    )


_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT
    doc_id,
    lang,
    {_stop_score_sql('en')} AS s_en,
    {_stop_score_sql('es')} AS s_es,
    {_stop_score_sql('de')} AS s_de,
    {_stop_score_sql('fr')} AS s_fr
  FROM documents
)
SELECT doc_id, lang, s_en, s_es, s_de, s_fr, {_lang_case_sql()} AS predicted_lang
FROM scored
"""


@query("docs_lang_id", oracle=_LANGID_ORACLE, tags=("llm", "text", "langid"))
def docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    wd = F.array_distinct(F.split("text", " "))
    scored = docs.select(
        "doc_id",
        "lang",
        *[
            F.size(F.array_intersect(wd, F.array(*[F.lit(t) for t in _STOPLISTS[c]])))
            .cast("long")
            .alias(f"s_{c}")
            for c in ("en", "es", "de", "fr")
        ],
    )
    s = {c: F.col(f"s_{c}") for c in ("en", "es", "de", "fr")}
    predicted = (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["fr"]) & (s["en"] > 0),
            "en",
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["fr"]) & (s["es"] > 0), "es")
        .when((s["de"] >= s["fr"]) & (s["de"] > 0), "de")
        .when(s["fr"] > 0, "fr")
        .otherwise("und")
    )
    return scored.withColumn("predicted_lang", predicted)


# --- quality scoring --------------------------------------------------------

_QUALITY_ORACLE = """
WITH feat AS (
  SELECT
    doc_id,
    CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS n_uniq,
    CAST(len(list_filter(string_split(text, ' '), x -> length(x) <= 2)) AS DOUBLE) AS n_short,
    CAST(len(list_filter(string_split(text, ' '),
                         x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE) AS n_stop
  FROM documents
)
SELECT
  doc_id,
  n_uniq / n_tok AS distinct_ratio,
  n_short / n_tok AS short_ratio,
  n_stop / n_tok AS stopword_ratio,
  0.4 * (n_uniq / n_tok) + 0.3 * (1.0 - n_short / n_tok) + 0.3 * (1.0 - n_stop / n_tok)
    AS quality_score,
  CASE
    WHEN 0.4 * (n_uniq / n_tok) + 0.3 * (1.0 - n_short / n_tok) + 0.3 * (1.0 - n_stop / n_tok) >= 0.75
      THEN 'high'
    WHEN 0.4 * (n_uniq / n_tok) + 0.3 * (1.0 - n_short / n_tok) + 0.3 * (1.0 - n_stop / n_tok) >= 0.6
      THEN 'mid'
    ELSE 'low'
  END AS quality_band
FROM feat
"""


@query("docs_quality_score", oracle=_QUALITY_ORACLE, tags=("llm", "text", "quality"))
def docs_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    d = docs.withColumn("w", F.split("text", " "))
    n_tok = F.size("w").cast("double")
    n_uniq = F.size(F.array_distinct("w")).cast("double")
    n_short = F.size(F.expr("filter(w, x -> length(x) <= 2)")).cast("double")
    n_stop = F.size(
        F.expr("filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to'))")
    ).cast("double")
    score = (
        F.lit(0.4) * (n_uniq / n_tok)
        + F.lit(0.3) * (F.lit(1.0) - n_short / n_tok)
        + F.lit(0.3) * (F.lit(1.0) - n_stop / n_tok)
    )
    return d.select(
        "doc_id",
        (n_uniq / n_tok).alias("distinct_ratio"),
        (n_short / n_tok).alias("short_ratio"),
        (n_stop / n_tok).alias("stopword_ratio"),
        score.alias("quality_score"),
        F.when(score >= 0.75, "high").when(score >= 0.6, "mid").otherwise("low").alias(
            "quality_band"
        ),
    )


# --- fingerprinting (head hash + min-of-windows rolling hash) ---------------

_FP_ORACLE = """
SELECT
  doc_id,
  md5(array_to_string(string_split(text, ' ')[1:16], ' ')) AS head_fp,
  list_aggregate(
    list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 6, 2)),
      i -> md5(array_to_string(string_split(text, ' ')[i:i+7], ' '))
    ), 'min') AS winnow_fp
FROM documents
"""


@query("docs_fingerprint", oracle=_FP_ORACLE, tags=("llm", "text", "fingerprint"))
def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style fingerprint: min md5 over all 8-token windows (plus a
    16-token head hash). Shift-resistant dedup key, computed without UDFs."""
    (docs,) = load(spark, sf_dir, "documents")
    d = docs.withColumn("w", F.split("text", " "))
    head = F.md5(F.array_join(F.slice("w", 1, 16), " ").cast("binary"))
    winnow = F.array_min(
        F.expr(
            "transform(sequence(1, greatest(size(w) - 7, 1)),"
            " i -> md5(cast(concat_ws(' ', slice(w, i, 8)) as binary)))"
        )
    )
    return d.select("doc_id", head.alias("head_fp"), winnow.alias("winnow_fp"))


# --- TF-IDF top terms per document -----------------------------------------

_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(CAST(tf.tf AS DOUBLE)
               * ROUND(LN((n.n + 1.0) / (df.df + 1.0)), 9), 9) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, tfidf, rank FROM r WHERE rank <= 3
"""


@query("docs_tfidf", oracle=_TFIDF_ORACLE, tags=("llm", "text", "tfidf"))
def docs_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Two aggs over one tokenize pass
    (tf by (doc,term), df by term), then a pinned shuffled-hash join of
    the vocabulary-sized df side back onto tf (df reuses its own groupBy
    partitioning; only the 1-row N rides as a broadcast) — the
    vocabulary grows with the corpus, so df is never forced into a
    broadcast. LN differs in the last ulp across libms, so idf is rounded
    to 9 decimals on both engines before the (exact) multiply, and the
    product is rounded again for a stable hash."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    tok = fan_out(docs).select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf already has one row per (doc, term), so document frequency is a
    # plain count over it — the tokenize+explode subtree runs ONCE, not
    # twice, and countDistinct becomes a cheap count.
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nrow = docs.agg(F.count(F.lit(1)).alias("n"))
    idf = F.round(F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)), 9)
    scored = (
        # df_ is VOCABULARY-SIZED (one row per distinct term — grows
        # with the corpus under Heaps' law), so it must never be forced
        # into a broadcast (r12 audit). It comes out of its own groupBy
        # already partitioned by term, so the pinned shuffled-hash join
        # reuses that partitioning and only tf re-shuffles, on term.
        tf.join(df_.hint("shuffle_hash"), "term")
        .crossJoin(F.broadcast(nrow))    # bounded: 1-row aggregate
        .select(
            "doc_id", "term",
            F.round(F.col("tf").cast("double") * idf, 9).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


# --- deterministic content-hash sampling ------------------------------------

_SAMPLE_ORACLE = """
SELECT doc_id, lang, source
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
"""


@query("docs_hash_sample", oracle=_SAMPLE_ORACLE, tags=("llm", "text", "sampling"))
def docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% sample keyed on md5(doc_id) — unlike rand()-based sampling this
    is reproducible across engines, runs, and re-partitions, and a given
    document is ALWAYS in or out (stable train/holdout splits). At 100 TB
    the predicate evaluates in the scan stage; no shuffle, no state."""
    (docs,) = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    return docs.filter(bucket < 10).select("doc_id", "lang", "source")


# --- overlapping window chunking --------------------------------------------

_CHUNK_SIZE = 40
_CHUNK_STRIDE = 30  # 10-token overlap

_CHUNK_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
chunks AS (
  SELECT doc_id, CAST(s.s AS BIGINT) // {_CHUNK_STRIDE} AS chunk_idx,
         array_to_string(w[s.s + 1 : s.s + {_CHUNK_SIZE}], ' ') AS chunk
  FROM tok,
       UNNEST(range(0, GREATEST(len(w) - {_CHUNK_SIZE - _CHUNK_STRIDE}, 1),
                    {_CHUNK_STRIDE})) s(s)
)
SELECT doc_id, chunk_idx,
       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
       md5(chunk) AS chunk_hash
FROM chunks
"""


@query("docs_chunk_windows", oracle=_CHUNK_ORACLE, tags=("llm", "text", "chunking"))
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking ({_CHUNK_SIZE} tokens, stride
    {_CHUNK_STRIDE}) — the standard context-window prep for training /
    embedding. Pure higher-order functions: per-doc slice arithmetic, no
    UDF, no shuffle; output is one row per chunk with a content hash."""
    (docs,) = load(spark, sf_dir, "documents")
    starts = (
        f"sequence(0, greatest(size(w) - {_CHUNK_SIZE - _CHUNK_STRIDE} - 1, 0),"
        f" {_CHUNK_STRIDE})"
    )
    return (
        fan_out(docs).select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(F.expr(
                f"transform({starts}, s -> struct("
                f" CAST(s DIV {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,"
                f" array_join(slice(w, s + 1, {_CHUNK_SIZE}), ' ') AS chunk))"
            )).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.size(F.split("c.chunk", " ")).cast("long").alias("n_tokens"),
            F.md5(F.col("c.chunk").cast("binary")).alias("chunk_hash"),
        )
    )


# --- corpus-level line dedup (C4 / RefinedWeb boilerplate removal) ----------
#
# C4 (Raffel et al. '20) drops any three-sentence span occurring more than
# once in the corpus; RefinedWeb (Penedo et al. '23) dedups at line level.
# Both keep the FIRST occurrence and drop the rest — that is the semantics
# here: an occurrence survives iff it is the global first for its line in
# (doc_id, line_idx) order. The synthetic corpus has no newlines, so the
# unit tokenizer is fixed-width word windows (_LINE_W words); in production
# the same pipeline runs on newline- or sentence-split units — the operator
# downstream of the unit explode is identical either way.

_LINE_W = 8  # words per "line" unit (non-overlapping)

_LINE_DEDUP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
occ AS (
  SELECT doc_id, CAST(s.s // {_LINE_W} AS BIGINT) AS line_idx,
         array_to_string(w[s.s + 1 : s.s + {_LINE_W}], ' ') AS line
  FROM tok, UNNEST(range(0, len(w), {_LINE_W})) s(s)
),
rk AS (
  SELECT doc_id, line_idx, line,
         ROW_NUMBER() OVER (PARTITION BY md5(line)
                            ORDER BY doc_id, line_idx) AS rn
  FROM occ
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, ' '
                           ORDER BY line_idx), '') AS text_clean
FROM rk GROUP BY doc_id
"""


def tokenize_docs(docs: DataFrame) -> DataFrame:
    """``(doc_id, w)`` word-array base from a ``(doc_id, text, ...)``
    frame — the word-split half of the unit tokenizer. ONE home shared
    by the batch query and the streaming maintainer
    (streaming/linededup.py): if the production tokenizer moves to
    newline/sentence units, this split and line_occurrences' windowing
    change here, in lockstep for every caller."""
    return docs.select("doc_id", F.split("text", " ").alias("w"))


def line_occurrences(base: DataFrame) -> DataFrame:
    """Narrow line-occurrence stream ``(doc_id, line_idx, lh)`` from a
    ``tokenize_docs`` base. ONE home for the unit windowing so the
    batch query and the streaming maintainer (streaming/linededup.py)
    can never disagree on what a "line" is — line text itself never
    leaves this projection."""
    return (
        base.select(
            "doc_id",
            "w",
            F.explode(
                F.expr(f"sequence(0, (size(w) - 1) DIV {_LINE_W})")
            ).alias("line_idx"),
        )
        .select(
            "doc_id",
            F.col("line_idx").cast("long").alias("line_idx"),
            F.md5(
                F.expr(
                    f"cast(array_join(slice(w, cast(line_idx * {_LINE_W} + 1 as int),"
                    f" {_LINE_W}), ' ') as binary)"
                )
            ).alias("lh"),
        )
    )


def reassemble_clean_text(kept_col: str = "kept", w_col: str = "w") -> F.Column:
    """Rebuild a document from its kept line indexes by re-slicing the
    original word array — shared by the batch query and the streaming
    maintainer so the rewrite rule has exactly one home."""
    return F.expr(
        f"array_join(flatten(transform({kept_col},"
        f" i -> slice({w_col}, cast(i * {_LINE_W} + 1 as int), {_LINE_W}))), ' ')"
    )


@query("docs_line_dedup", oracle=_LINE_DEDUP_ORACLE, tags=("llm", "text", "dedup"))
def docs_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level keep-first line dedup — the C4/RefinedWeb cleaning
    step that removes boilerplate (nav bars, cookie banners, license
    headers) by deduplicating repeated lines ACROSS documents, distinct
    from within-doc repetition (docs_repetition) and from substring span
    dedup (dedup_dup_ngram_spans, which finds spans but does not rewrite
    documents). Emits each document rewritten with only its surviving
    lines, plus removal counts.

    100-TB shape — line TEXT never enters a shuffle (the dup-k-gram
    discipline): the occurrence stream carries only (doc_id, line_idx,
    md5); the first-occurrence rank shuffles those narrow rows on the
    hash; per-doc keep-lists shuffle (doc_id, idx-array); the one
    full-text shuffle is the final doc_id join that rebuilds text_clean
    by re-slicing the original word array — the floor for any rewrite.
    The keep-list join is shuffle-hash-pinned: one row per document,
    corpus-scaled, must never broadcast."""
    (docs,) = load(spark, sf_dir, "documents")
    base = tokenize_docs(fan_out(docs))
    occ = line_occurrences(base)
    wnd = Window.partitionBy("lh").orderBy("doc_id", "line_idx")
    perdoc = (
        occ.withColumn("rn", F.row_number().over(wnd))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).alias("n_removed"),
            F.sort_array(
                F.collect_list(F.when(F.col("rn") == 1, F.col("line_idx")))
            ).alias("kept"),
        )
    )
    return (
        base.join(perdoc.hint("shuffle_hash"), "doc_id")
        .select(
            "doc_id",
            "n_lines",
            "n_removed",
            reassemble_clean_text().alias("text_clean"),
        )
    )


# --- repetition detection (gopher-style quality signal) ---------------------

_REP_ORACLE = """
WITH tri AS (
  SELECT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tri
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(range(1, len(w) - 1)) t(i)
),
cnt AS (
  SELECT doc_id, tri, COUNT(*) AS c FROM tri GROUP BY doc_id, tri
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_trigrams,
       CAST(MAX(c) AS BIGINT) AS max_repeat,
       ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 9) AS top_trigram_frac
FROM cnt
GROUP BY doc_id
"""


@query("docs_repetition", oracle=_REP_ORACLE, tags=("llm", "text", "quality"))
def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-repeated-trigram fraction per document — the Gopher/C4-style
    repetition filter (boilerplate and degenerate generations score high).
    Trigram counting happens per-row in a higher-order expression, so the
    only shuffle is the final per-doc agg of (count) pairs."""
    (docs,) = load(spark, sf_dir, "documents")
    # w bound ONCE (lambdas are interpreted — re-splitting per trigram would
    # be O(tokens^2)); nested zip_with over shifted slices is both
    # short-doc safe (slices run dry below 3 tokens, null pads filter out
    # — never a descending sequence(1, 0)) and ~2x faster than the
    # element_at indexing form (cf. llm_dedup._SHINGLE_EXPR).
    tri = (
        fan_out(docs).select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(F.expr(
                "filter(zip_with("
                " zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),"
                "          (a, b) -> concat(a, ' ', b)),"
                " slice(w, 3, greatest(size(w) - 2, 0)),"
                " (ab, c) -> concat(ab, ' ', c)), x -> x IS NOT NULL)"
            )).alias("tri"),
        )
    )
    cnt = tri.groupBy("doc_id", "tri").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_trigrams"),
            F.max("c").cast("long").alias("max_repeat"),
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 9
            ).alias("top_trigram_frac"),
        )
    )


# --- PII-style redaction -----------------------------------------------------

_REDACT_ORACLE = """
SELECT doc_id,
  CAST(length(text) - length(regexp_replace(text, '[0-9]+', '', 'g'))
       AS BIGINT) AS digits_removed,
  md5(regexp_replace(regexp_replace(text, '[0-9]+', '<NUM>', 'g'),
                     '[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'))
    AS redacted_hash
FROM documents
"""


@query("docs_redact", oracle=_REDACT_ORACLE, tags=("llm", "text", "redact"))
def docs_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number/email redaction — the scrubbing pass every training corpus
    gets. Pure regexp_replace in the scan stage (JVM regex, codegen'd);
    emits a hash of the redacted text so the oracle verifies the exact
    transformation without shipping full text through the compare."""
    (docs,) = load(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace("text", r"[0-9]+", "<NUM>"),
        r"[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+", "<EMAIL>",
    )
    return docs.select(
        "doc_id",
        (F.length("text") - F.length(F.regexp_replace("text", r"[0-9]+", "")))
        .cast("long").alias("digits_removed"),
        F.md5(redacted.cast("binary")).alias("redacted_hash"),
    )


# --- composed corpus-prep pipeline (pipelines.py, end-to-end oracle) --------

_CORPUS_ORACLE = """
WITH gated AS (
  SELECT * FROM documents
  WHERE lang IN ('en', 'de') AND n_chars BETWEEN 100 AND 10000
),
deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
),
tok AS (
  SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM deduped
),
chunks AS (
  SELECT doc_id, lang, source,
         CAST(s.s AS BIGINT) // 30 AS chunk_idx,
         array_to_string(w[s.s + 1 : s.s + 40], ' ') AS chunk
  FROM tok, UNNEST(range(0, GREATEST(len(w) - 10, 1), 30)) s(s)
),
sampled AS (
  SELECT * FROM chunks
  WHERE ('0x' || substr(md5(chunk), 1, 8))::BIGINT % 100 < 50
)
SELECT doc_id, lang, source, chunk_idx,
       md5(chunk) AS chunk_hash,
       CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens
FROM sampled
"""


@query("corpus_prep_pipeline", oracle=_CORPUS_ORACLE, tags=("llm", "pipeline"))
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED gate->dedup->chunk->sample pipeline from pipelines.py,
    hash-checked end-to-end: proves the standalone operators compose into
    one lazy plan (column pruning crosses stage boundaries; only the dedup
    window shuffles)."""
    from ..pipelines import corpus_prep

    (docs,) = load(spark, sf_dir, "documents")
    return corpus_prep(docs)


# --- corpus heavy hitters (top-k frequent bigrams) ---------------------------
# Corpus-frequency profiling (boilerplate detection, stop-phrase lists)
# is a full-scan aggregate whose result is tiny. The scale shape matters:
# groupBy(bigram) combines map-side before the shuffle, and the global
# top-k runs as TakeOrderedAndProject — per-partition heaps of k rows
# merged on the driver, never a full sort of the frequency table. The
# (n DESC, bigram ASC) order is total, so the k-row cutoff is
# deterministic on both engines.

_TOP_K_BIGRAMS = 25

_TOP_BIGRAMS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
bg AS (
  SELECT w[i] || ' ' || w[i+1] AS bigram
  FROM tok, UNNEST(range(1, len(w))) t(i)
)
SELECT bigram, COUNT(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT {_TOP_K_BIGRAMS}
"""


@query("docs_top_bigrams", oracle=_TOP_BIGRAMS_ORACLE, tags=("llm", "text", "heavy-hitters"))
def docs_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    # zip_with over the shifted array: short-doc safe with no branch (for
    # size(w) < 2 the slice is empty, null pads filter out to an empty
    # array — never a descending sequence(1, 0)) and ~2x faster than the
    # element_at indexing form (cf. llm_dedup._SHINGLE_EXPR).
    bg = docs.select(F.split("text", " ").alias("w")).select(
        F.explode(
            F.expr(
                "filter(zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b)), x -> x IS NOT NULL)"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram"))
        .limit(_TOP_K_BIGRAMS)
    )


# --- stratified (per-source quota) sampling ----------------------------------
# Training mixes are specified per source/domain ("n docs from source X"),
# not as a global rate (that's docs_hash_sample). Deterministic rank within
# each stratum = md5 of the doc id — an order-free, seedless shuffle both
# engines agree on; the quota is a per-stratum WindowGroupLimit, so each
# partition keeps at most `quota` rows before the final per-key merge (no
# global sort, no full-stratum materialization).

_STRATA_QUOTA = 8

_STRAT_SAMPLE_ORACLE = f"""
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY md5(doc_id::VARCHAR), doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= {_STRATA_QUOTA}
"""


@query("docs_stratified_sample", oracle=_STRAT_SAMPLE_ORACLE,
       tags=("llm", "text", "sampling"))
def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _STRATA_QUOTA)
        .select("doc_id", "source", "sample_rank")
    )


# --- BPE-ish regex tokenization ----------------------------------------------
# Whitespace tokens (docs_token_stats) undercount what an LLM tokenizer
# sees; the standard pre-tokenizer (GPT-2 style) splits runs of letters,
# digits, and punctuation separately, each optionally space-prefixed. The
# ASCII form below uses only constructs RE2 (DuckDB) and java.util.regex
# (Spark) interpret identically — no lookahead, no unicode classes — so
# the counts are exact parity. Per-doc map-only work: no shuffle at all.

_BPE_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

_BPE_ORACLE = f"""
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+')) AS BIGINT) AS n_word_tokens,
  CAST(len(regexp_extract_all(text, ' ?[0-9]+')) AS BIGINT) AS n_number_tokens,
  CAST(length(text) AS DOUBLE)
    / CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS DOUBLE)
    AS chars_per_token
FROM documents
"""


@query("docs_token_bpe_regex", oracle=_BPE_ORACLE, tags=("llm", "text", "tokenize"))
def docs_token_bpe_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    def n_matches(pat: str):
        return F.expr(f"size(regexp_extract_all(text, '{pat}', 0))").cast("long")
    return docs.select(
        "doc_id",
        n_matches(_BPE_PATTERN).alias("n_bpe_tokens"),
        n_matches(" ?[A-Za-z]+").alias("n_word_tokens"),
        n_matches(" ?[0-9]+").alias("n_number_tokens"),
        (F.length("text").cast("double")
         / n_matches(_BPE_PATTERN).cast("double")).alias("chars_per_token"),
    )


# --- corpus-trained unigram cross-entropy (model-based quality score) --------
# The model-based cousin of the heuristic quality score: "train" a unigram
# LM on the whole corpus (one token-count aggregation), then score each
# document by its average negative log-probability under that model. High
# scores = out-of-distribution documents (boilerplate, noise, wrong
# domain) — the classic perplexity filter of LLM data pipelines, minus
# the external LM. Two shuffles total: token counts (|vocab| after
# map-side combine) and the per-doc average; the vocab table broadcasts
# back against the token stream.
# Parity: -ln(p) is rounded to 9 decimals per token and summed as an
# exact DECIMAL, so the average is order-independent and the libm ulp
# wobble (see q-notes on LN/EXP) is absorbed before aggregation.

_UNIGRAM_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
cnt AS (
  SELECT w, COUNT(*) AS n FROM tok GROUP BY w
),
tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS t FROM cnt
)
SELECT tok.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CAST(ROUND(-LN(CAST(cnt.n AS DOUBLE) / tot.t), 9)
                     AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS avg_neg_logprob
FROM tok JOIN cnt USING (w) CROSS JOIN tot
GROUP BY tok.doc_id
ORDER BY doc_id
"""


@query("docs_unigram_logprob", oracle=_UNIGRAM_ORACLE, tags=("llm", "text", "quality"))
def docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    tok = fan_out(docs).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    # Pre-aggregate per-(doc, term) tf BEFORE the vocabulary join: the
    # side shuffled onto the term key is tf rows, not raw token
    # occurrences (in-doc repetition collapses map-side), and the
    # per-token decimal sum becomes the exactly-equal tf-weighted sum
    # (tf x one decimal term == tf identical decimal addends, so the
    # oracle's per-token SUM is reproduced bit-for-bit).
    # NOT shared()/persisted (r13 measurement): tf and cnt each feed two
    # consumers, but every duplicated subtree sits directly above an
    # identical Exchange (tf's and cnt's own groupBy shuffles), which
    # runtime ReuseExchange already deduplicates — persisting both
    # measured consistently SLOWER at sf0.1 (ABAB medians 1.91/2.82 vs
    # 1.58/2.13: cache materialization + IO without removing real work),
    # the same adjudication as hybrid_rrf_retrieval. Sharing pays only
    # where the duplicate work has NO common exchange boundary (the BPE
    # fold stages, emb_semantic_dedup, the old rangejoin remainder).
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    cnt = tf.groupBy("w").agg(F.sum("tf").alias("n"))
    total = cnt.agg(F.sum("n").cast("double").alias("t"))
    neg_lp = F.round(-F.log(F.col("n").cast("double") / F.col("t")), 9).cast(
        "decimal(18,9)"
    )
    return (
        # cnt is VOCABULARY-SIZED (one row per distinct token — grows
        # with the corpus): pinned shuffled-hash join reusing cnt's own
        # groupBy partitioning, never a forced broadcast (r12 audit);
        # bounded: total is a 1-row aggregate
        tf.join(cnt.hint("shuffle_hash"), "w")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(F.col("tf").cast("decimal(10,0)") * neg_lp).cast("double")
             / F.sum("tf")).alias("avg_neg_logprob"),
        )
        .orderBy("doc_id")
    )


# --- benchmark decontamination (n-gram overlap vs a held-out set) ------------
# Before training, every corpus document is checked for n-gram overlap
# against the evaluation/benchmark set; contaminated documents are
# dropped. Here the "benchmark" is the src0 slice of the corpus, the
# corpus is everything else, and overlap = distinct shared word trigrams.
# Scale: the benchmark trigram set is orders of magnitude smaller than
# the corpus, so it broadcasts; the corpus-side trigram stream joins
# against it map-side (no corpus shuffle before the per-doc count).

_DECONTAM_THRESHOLD = 3

_DECONTAM_ORACLE = f"""
WITH tri AS (
  SELECT doc_id, source, tg
  FROM (
    SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
  ), UNNEST(range(1, len(w) - 1)) t(i),
  LATERAL (SELECT w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS tg) g
),
bench AS (
  SELECT DISTINCT tg FROM tri WHERE source = 'src0'
),
corpus AS (
  SELECT DISTINCT doc_id, tg FROM tri WHERE source <> 'src0'
)
SELECT c.doc_id,
       COUNT(*) AS n_shared_trigrams,
       COUNT(*) >= {_DECONTAM_THRESHOLD} AS contaminated
FROM corpus c JOIN bench b USING (tg)
GROUP BY c.doc_id
ORDER BY doc_id
"""


@query("docs_decontam_overlap", oracle=_DECONTAM_ORACLE, tags=("llm", "text", "dedup"))
def docs_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    # Nested zip_with (pairs, then zip with the twice-shifted array):
    # short-doc safe with no branch and no element_at indexing — for
    # size(w) < 3 the slices run dry, null pads filter out.
    trigrams = F.array_distinct(
        F.expr(
            "filter(zip_with("
            " zip_with(w, slice(w, 2, greatest(size(w) - 1, 0)),"
            "          (a, b) -> concat(a, ' ', b)),"
            " slice(w, 3, greatest(size(w) - 2, 0)),"
            " (ab, c) -> concat(ab, ' ', c)), x -> x IS NOT NULL)"
        )
    )
    tri = (
        fan_out(docs)
        .select("doc_id", "source", F.split("text", " ").alias("w"))
        .select("doc_id", "source", F.explode(trigrams).alias("tg"))
    )
    bench = tri.filter(F.col("source") == "src0").select("tg").distinct()
    corpus = tri.filter(F.col("source") != "src0").select("doc_id", "tg")
    return (
        # semantically a benchmark holdout is fixed-size, but in THIS
        # corpus src0 is a constant fraction of the documents — i.e.
        # corpus-scaled — so the trigram set is not forced into a
        # broadcast; AQE promotes it from measured runtime size while
        # it fits (r12 audit)
        corpus.join(bench, "tg", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_trigrams"))
        .withColumn("contaminated", F.col("n_shared_trigrams") >= _DECONTAM_THRESHOLD)
        .orderBy("doc_id")
    )


# --- sequence packing (concat-and-chunk batch assembly) ---------------------
# Pretraining batch assembly: per source, documents are concatenated in a
# deterministic order (doc_id) and the token stream is chunked into
# fixed-budget context windows; a doc belongs to the pack its first token
# lands in. Expressed as a running integer sum (ROWS window) + integer
# division — exact on both engines. At scale the only shuffle is the
# range-partitioned sort within each source; pack stats are a map-side
# combinable group-by on (source, pack_id).

_PACK_BUDGET = 128

_PACK_ORACLE = f"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
  FROM documents
)
SELECT source,
       CAST((end_off - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc_id
FROM t
GROUP BY source, pack_id
ORDER BY source, pack_id
"""


@query("docs_pack_sequences", oracle=_PACK_ORACLE, tags=("llm", "text", "packing"))
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into {budget}-token context windows.

    Parity of the reference's flatMap-shaping stage taken to the LLM
    pipeline (``src/mapping/customMapper.ts:27-34`` shapes events; here the
    shaping is docs → packed training sequences)."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    ).withColumn("end_off", F.sum("n_tokens").over(w))
    return (
        t.withColumn(
            "pack_id",
            F.expr(f"(end_off - n_tokens) div {_PACK_BUDGET}"),
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("source", "pack_id")
    )


# --- weighted sampling (Efraimidis–Spirakis, hash-derandomized) ---------------
# Distributed weighted random sampling: each row draws u in (0,1) and the
# top-k by u^(1/w) is an exact weighted-without-replacement sample
# (Efraimidis & Spirakis 2006). The draw is md5-derived instead of
# rand(), so the sample is reproducible across engines/runs/partitions —
# same derandomization stance as docs_hash_sample. At 100 TB this is a
# scan + one TopK — no shuffle of the corpus, no state.
#
# STATUS — historical twin, superseded as the scale path (r12, one
# weighted-sampling story): the u^(1/w) key needs pow(), and libm pow
# differs in the last ulp across engines, so cross-engine parity here
# leans on a 12-decimal ROUNDING CRUTCH — adequate for the oracle gate
# (collision probability of distinct rounded keys is negligible at any
# k) but a rounding, not an exactness, argument.
# ``docs_priority_sample_strata`` (Duffield-Lund-Thorup priority
# sampling, further down this file) draws the SAME weighted-without-
# replacement distribution from integer-exact operands with one multiply
# and one divide — IEEE-bit-exact on both engines, no transcendental, no
# rounding step — and is the successor every new weighted draw should
# use. This entry stays registered as the classic-scheme twin (the two
# algorithms' SAMPLES differ by design — different priority transforms
# of the same hash — so it also serves as an independent check that the
# top-k machinery is distribution-agnostic).

_WSAMPLE_K = 64

_WSAMPLE_ORACLE = f"""
SELECT doc_id, source, n_chars
FROM (
  SELECT doc_id, source, n_chars,
         ROUND(POW(
           (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
             / 4294967297.0,
           1.0 / CAST(n_chars AS DOUBLE)
         ), 12) AS sk
  FROM documents
)
ORDER BY sk DESC, doc_id
LIMIT {_WSAMPLE_K}
"""


@query("docs_weighted_sample", oracle=_WSAMPLE_ORACLE,
       tags=("llm", "text", "sampling"))
def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} weighted sample of documents with weight = n_chars: long
    documents are proportionally likelier, short ones still possible —
    the standard corpus-balancing draw, deterministic by construction.

    Historical twin — see the section comment: the pow()-keyed
    Efraimidis-Spirakis form needs a 12-decimal rounding step for
    cross-engine parity; ``docs_priority_sample_strata`` is the
    transcendental-free scale-path successor."""
    (docs,) = load(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
        16, 10,
    ).cast("long")
    u = (h + F.lit(1.0)) / F.lit(4294967297.0)
    sk = F.round(F.pow(u, F.lit(1.0) / F.col("n_chars").cast("double")), 12)
    return (
        docs.select("doc_id", "source", "n_chars", sk.alias("sk"))
        .orderBy(F.col("sk").desc(), F.col("doc_id"))
        .limit(_WSAMPLE_K)
        .select("doc_id", "source", "n_chars")
    )


# --- BM25 retrieval scoring ---------------------------------------------------
# The classic lexical-retrieval scorer (Robertson-Sparck Jones BM25, the
# e.g. Elasticsearch/Lucene default) over the documents table for a fixed
# query-term set: tf from per-doc token counts, idf from corpus document
# frequencies, length normalization against the corpus mean. Scale
# shape: one explode -> two partial-agg shuffles (per-(doc,term) tf and
# per-term df); N and avgdl are 1-row aggregates broadcast into the
# scorer; the final top-k is TakeOrderedAndProject. ln() differs in the
# last ulp across libms, so scores round to 9 decimals on both engines
# (SURVEY trap list); ordering uses the rounded score with doc_id as the
# total-order tiebreak.

_BM25_TERMS = ("the", "data", "system", "model", "analysis")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOP = 20

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
),
dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl FROM dl
),
tf AS (
  SELECT doc_id, t, CAST(COUNT(*) AS DOUBLE) AS tf FROM tok
  WHERE t IN {_BM25_TERMS} GROUP BY doc_id, t
),
df AS (
  SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tok
  WHERE t IN {_BM25_TERMS} GROUP BY t
),
scored AS (
  SELECT f.doc_id,
    ROUND(SUM(
      CAST(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        * f.tf * ({_BM25_K1} + 1.0)
        / (f.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * l.dl / s.avgdl))
      AS DECIMAL(28,9))
    )::DOUBLE, 9) AS bm25
  FROM tf f
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
  JOIN df d USING (t)
  GROUP BY f.doc_id
)
SELECT doc_id, bm25, rank FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM scored
) WHERE rank <= {_BM25_TOP}
"""


@query("docs_bm25_topk", oracle=_BM25_ORACLE, tags=("llm", "text", "retrieval"))
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} documents by BM25 for a fixed query-term set. The
    per-(doc,term) partial sums go through exact decimals before the
    9-decimal round, so the ranking key is engine-stable."""
    (docs,) = load(spark, sf_dir, "documents")
    terms = list(_BM25_TERMS)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t").isin(terms))
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("double").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = tok.groupBy("doc_id", "t").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    df_ = tok.groupBy("t").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = (
        idf * F.col("tf") * (_BM25_K1 + 1.0)
        / (F.col("tf") + _BM25_K1
           * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        # tf and dl are both corpus-scaled — pin the merge join instead
        # of leaving the strategy to a size estimate (r12 audit; same
        # pin as the incremental twin in queries/ivm_views.py)
        tf.join(dl.hint("merge"), "doc_id")
        .crossJoin(F.broadcast(stats))   # bounded: 1-row aggregate
        .join(F.broadcast(df_), "t")     # bounded: one row per fixed term
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(term_score.cast("decimal(28,9)")).cast("double"), 9
            ).alias("bm25")
        )
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _BM25_TOP)
        .select("doc_id", "bm25", "rank")
    )


# --- positional phrase search -------------------------------------------------
# The inverted-index query shape: token positions per document (the
# posting-list payload), phrase matching as a positional self-join —
# term A at position p, term B at p+1. Scale: the postings table is one
# posexplode (no shuffle); the phrase join keys on (doc_id, position
# arithmetic) after an IN-list filter prunes it to the two query terms,
# so the join sides are term-selective slivers of the corpus, never the
# full postings table. Hit counts and first positions hash-check
# exactly.

_PHRASE = ("order", "fast")  # frequent in the synthetic corpus at every SF

_PHRASE_ORACLE = f"""
WITH pos AS (
  SELECT doc_id, t.i - 1 AS p, w[t.i] AS tok
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       UNNEST(range(1, len(w) + 1)) t(i)
),
a AS (SELECT doc_id, p FROM pos WHERE tok = '{_PHRASE[0]}'),
b AS (SELECT doc_id, p FROM pos WHERE tok = '{_PHRASE[1]}')
SELECT a.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(MIN(a.p) AS BIGINT) AS first_pos
FROM a JOIN b ON b.doc_id = a.doc_id AND b.p = a.p + 1
GROUP BY a.doc_id
"""


@query("docs_phrase_search", oracle=_PHRASE_ORACLE,
       tags=("llm", "text", "retrieval", "phrase"))
def docs_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase matching ('{p0} {p1}') via positional postings: per
    matching document the hit count and first match position."""
    (docs,) = load(spark, sf_dir, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("p", "tok")
    )
    a = pos.filter(F.col("tok") == _PHRASE[0]).select("doc_id", "p")
    b = pos.filter(F.col("tok") == _PHRASE[1]).select(
        "doc_id", (F.col("p") - 1).alias("p")
    )
    return (
        a.join(b, ["doc_id", "p"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hits"),
            F.min("p").cast("long").alias("first_pos"),
        )
    )


# --- temperature-scaled source mixture weights -------------------------------
# The training-mix planning number every multi-source pretraining run
# computes (cf. multilingual/多-corpus sampling: p_i ∝ mass_i^alpha with
# alpha < 1 to up-weight small sources): per source, its token mass, its
# alpha=0.5 sampling weight, and the implied repeat factor ("epochs") at
# a fixed token budget. alpha = 0.5 is chosen deliberately: sqrt is
# IEEE-exact on both engines (POWER/EXP/LN differ in the last ulp), and
# the cross-source normalizer goes through an exact DECIMAL sum so the
# ratio is order-free; the division chain's double->decimal->double
# round-trips can still differ in the final ulp across engines, so the
# emitted ratios apply the standard round-to-9 discipline.
#
# Scale shape: one groupBy(source) with map-side partial aggregation
# collapses the corpus to |sources| rows BEFORE the shuffle; the
# normalizer is a scalar over those rows (broadcast back via a windowless
# cross join on a 1-row aggregate). No second corpus scan.

_MIX_BUDGET = 1_000_000  # planning token budget


_MIXTURE_ORACLE = f"""
WITH per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
w AS (
  SELECT *, CAST(sqrt(CAST(n_tokens AS DOUBLE)) AS DECIMAL(28,15)) AS sw
  FROM per_src
)
SELECT source, n_docs, n_tokens,
       round(CAST(sw AS DOUBLE) / CAST((SELECT SUM(sw) FROM w) AS DOUBLE), 9) AS mix_weight,
       round(CAST(sw AS DOUBLE) / CAST((SELECT SUM(sw) FROM w) AS DOUBLE)
         * {_MIX_BUDGET}.0 / CAST(n_tokens AS DOUBLE), 9) AS epochs_at_budget
FROM w
"""


@query("docs_mixture_weights", oracle=_MIXTURE_ORACLE,
       tags=("llm", "text", "sampling", "mixture"))
def docs_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source alpha=0.5 mixture weights over token mass, plus the
    repeat factor each source would see at a fixed token budget — the
    sampling table a training-data pipeline feeds its data loader."""
    (docs,) = load(spark, sf_dir, "documents")
    per_src = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")))
            .cast("long").alias("n_tokens"),
        )
        .withColumn(
            "sw",
            F.sqrt(F.col("n_tokens").cast("double")).cast("decimal(28,15)"),
        )
    )
    total = per_src.agg(F.sum("sw").alias("tot"))
    # decimal SUM keeps the normalizer order-free and exact; the DIVISION
    # happens in doubles on both engines (decimal/decimal division scale
    # rules differ between Spark and DuckDB in the last ulp)
    mixw = F.col("sw").cast("double") / F.col("tot").cast("double")
    # bounded: 1-row total
    return per_src.crossJoin(F.broadcast(total)).select(
        "source", "n_docs", "n_tokens",
        F.round(mixw, 9).alias("mix_weight"),
        # round-to-9: the multiply/divide chain can differ in the last
        # ulp across engines (SURVEY gotcha discipline)
        F.round(
            mixw * F.lit(float(_MIX_BUDGET)) / F.col("n_tokens").cast("double"),
            9,
        ).alias("epochs_at_budget"),
    )


# --- deterministic train/val/test split --------------------------------------
# The split every training-data pipeline freezes before anything else:
# hash-bucketed (never rand()), so a document's assignment is stable
# across engines, runs, re-partitions, and corpus growth (new docs land
# in splits without moving old ones — the property date- or
# position-based splits lack). 90/5/5 on the md5 bucket; per
# (source, split) counts + token mass so mixture planning can be done
# per split. Predicate evaluates in the scan stage; one groupBy shuffle
# over |sources| * 3 groups with map-side partials.

_SPLIT_ORACLE = """
WITH b AS (
  SELECT source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
           AS bucket,
         len(string_split(text, ' ')) AS n_tok
  FROM documents
)
SELECT source,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens
FROM b GROUP BY source, split
"""


@query("docs_train_val_test_split", oracle=_SPLIT_ORACLE,
       tags=("llm", "text", "sampling", "split"))
def docs_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 md5-bucketed split with per-(source, split) doc and token
    counts — reproducible holdout assignment, summarized for mixture
    planning."""
    (docs,) = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8
            ),
            16, 10,
        ).cast("long") % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(
            "source", split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


# --- PII scrubbing (r9) --------------------------------------------------------
# The standard pre-training redaction pass: emails and US-style phone
# numbers replaced with placeholder tokens before anything else sees the
# text. Patterns are RE2-safe (no lookaround) so Java regex (Spark) and
# RE2 (DuckDB) agree byte-for-byte; the synthetic corpus carries no PII,
# so the fixture INJECTS deterministic contacts (doc_id%4==0 an email,
# doc_id%4==1 a phone, doc_id%4==2 both) — the redaction counts, the
# scrubbed lengths, and the leftover-PII check (must be zero) are all
# hash-checked. Per-doc map work, no shuffle until the bucket rollup.

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\(\\d{3}\\) \\d{3}-\\d{4}"

_PII_ORACLE = f"""
WITH injected AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN text || ' mail user' || CAST(doc_id AS VARCHAR)
                        || '@example-site.org now'
           WHEN 1 THEN text || ' call (555) 123-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           WHEN 2 THEN 'a' || CAST(doc_id AS VARCHAR)
                        || '@b.co says call (555) 000-1111 re ' || text
           ELSE text END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id % 10 AS bucket,
         len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
         LENGTH(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                               '{_PII_PHONE}', '<PHONE>', 'g')) AS scrubbed_len
  FROM injected
)
SELECT bucket,
       CAST(SUM(n_email) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phone) AS BIGINT) AS phones_redacted,
       CAST(SUM(CASE WHEN n_email + n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(SUM(scrubbed_len) AS BIGINT) AS total_scrubbed_chars
FROM scrubbed GROUP BY bucket ORDER BY bucket
"""


@query("docs_pii_scrub", oracle=_PII_ORACLE, tags=("llm", "text", "pii"))
def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    # regex over every byte is compute-heavy per input byte: spread a
    # narrow single-file scan across the cores (no-op at scale)
    injected = fan_out(docs).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat("text", F.lit(" mail user"),
                     F.col("doc_id").cast("string"),
                     F.lit("@example-site.org now")),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat("text", F.lit(" call (555) 123-"),
                     F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("a"), F.col("doc_id").cast("string"),
                     F.lit("@b.co says call (555) 000-1111 re "), "text"),
        )
        .otherwise(F.col("text")),
    )
    scrubbed = injected.select(
        (F.col("doc_id") % 10).alias("bucket"),
        F.regexp_count("text", F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count("text", F.lit(_PII_PHONE)).alias("n_phone"),
        F.length(
            F.regexp_replace(
                F.regexp_replace("text", _PII_EMAIL, "<EMAIL>"),
                _PII_PHONE, "<PHONE>",
            )
        ).alias("scrubbed_len"),
    )
    return (
        scrubbed.groupBy("bucket")
        .agg(
            F.sum("n_email").alias("emails_redacted"),
            F.sum("n_phone").alias("phones_redacted"),
            F.sum(((F.col("n_email") + F.col("n_phone")) > 0).cast("long"))
            .alias("docs_with_pii"),
            F.sum("scrubbed_len").cast("long").alias("total_scrubbed_chars"),
        )
        .orderBy("bucket")
    )


# --- intra-document repetition filter (r9) -------------------------------------
# The Gopher/MassiveText repetition rule: a document whose 3-gram stream
# is dominated by repeats is boilerplate/spam and leaves the training
# mix. dup_frac = 1 - distinct(3-grams)/count(3-grams). Shape: fan_out
# the scan (compute-heavy per byte), explode the grams ONCE, then a
# two-level aggregate — (doc, gram) counts, folded to (n, nd) per doc.
# Each gram is materialized exactly once; higher-order lambdas are
# INTERPRETED (not codegen), so the per-row-HOF alternative that keeps
# re-evaluating the gram transform in a pushed-down filter measured ~8 s
# single-task at sf0.1 where this plan takes a fraction of a second —
# the r9 lesson that "no shuffle" is not automatically the fast path
# when the map stage is interpreted and the scan has one split.

_REP_THRESHOLD = 0.2

_REP_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         list_transform(
           range(1, len(string_split(text, ' ')) - 1),
           i -> string_split(text, ' ')[i] || ' ' ||
                string_split(text, ' ')[i+1] || ' ' ||
                string_split(text, ' ')[i+2]
         ) AS grams
  FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
d AS (
  SELECT doc_id,
         ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                     / CAST(len(grams) AS DOUBLE), 9) AS dup_frac
  FROM g
)
SELECT doc_id, dup_frac,
       dup_frac > {_REP_THRESHOLD} AS flagged
FROM d
WHERE dup_frac > 0
ORDER BY doc_id
"""


@query("docs_repetition_filter", oracle=_REP_ORACLE,
       tags=("llm", "text", "quality"))
def docs_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = fan_out(docs).withColumn("t", toks).filter(F.size("t") >= 3)
    grams = F.expr(
        "transform(sequence(1, size(t) - 2),"
        " i -> concat_ws(' ', t[i-1], t[i], t[i+1]))"
    )
    g = d.select("doc_id", F.explode(grams).alias("g"))
    # two-level agg: (doc, gram) tf then per-doc (n, nd) — no Expand,
    # map-side partial combine on both levels
    per_gram = g.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("tf"))
    agg = per_gram.groupBy("doc_id").agg(
        F.sum("tf").alias("n"), F.count(F.lit(1)).alias("nd")
    )
    out = agg.select(
        "doc_id",
        F.round(
            1.0 - F.col("nd").cast("double") / F.col("n").cast("double"), 9
        ).alias("dup_frac"),
    )
    return (
        out.filter(F.col("dup_frac") > 0)
        .select("doc_id", "dup_frac",
                (F.col("dup_frac") > _REP_THRESHOLD).alias("flagged"))
        .orderBy("doc_id")
    )


# --- leakage-free split: duplicates must co-locate (r9) ------------------------
# Splitting by doc_id leaks: two byte-identical documents can land in
# train AND test, inflating eval scores (the classic contamination-by-
# split bug). The fix is to bucket on the CONTENT (all copies of a text
# share the split), here via the same md5 convention as
# docs_train_val_test_split but keyed on md5(text). The query proves the
# property itself: per split, doc/group counts, plus a corpus-level
# leak counter = number of duplicate GROUPS whose members span >1 split
# — which must be 0 by construction and is hash-checked as such
# (the oracle computes it the same way; a regression in the bucketing
# would show up as a nonzero leak count on both the engine and the
# judge's own reading). Near-duplicate (MinHash-cluster) co-location is
# the same construction keyed on the cluster canonical id — the exact
# variant keeps the oracle cheap at sf0.1 (no recursive CC SQL).

_NOLEAK_ORACLE = """
WITH b AS (
  SELECT doc_id, md5(text) AS grp,
         ('0x' || substr(md5(md5(text)), 1, 8))::BIGINT % 100 AS bucket
  FROM documents
),
s AS (
  SELECT doc_id, grp,
         CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM b
),
leaks AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS leaked_groups FROM (
    SELECT grp FROM s GROUP BY grp HAVING COUNT(DISTINCT split) > 1
  )
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
       (SELECT leaked_groups FROM leaks) AS leaked_groups
FROM s GROUP BY split ORDER BY split
"""


@query("docs_split_no_leakage", oracle=_NOLEAK_ORACLE,
       tags=("llm", "text", "sampling", "split", "dedup"))
def docs_split_no_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = load(spark, sf_dir, "documents")
    grp = F.md5(F.col("text").cast("binary"))
    bucket = (
        F.conv(F.substring(F.md5(grp.cast("binary")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    s = docs.select(grp.alias("grp"), split.alias("split"))
    leaks = (
        s.groupBy("grp")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_groups"))
    )
    return (
        s.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("grp").cast("long").alias("n_groups"),
        )
        # bounded: 1-row leak count
        .crossJoin(F.broadcast(leaks))
        .select("split", "n_docs", "n_groups", "leaked_groups")
        .orderBy("split")
    )


# --- BPE merge-rule TRAINING (tokenizer learning, not just tokenizing) --------
# docs_token_bpe_regex applies a FIXED pre-tokenization pattern; a real
# training-data pipeline also LEARNS the merge table (Sennrich et al.,
# ACL'16): start from characters, repeatedly take the most frequent
# adjacent symbol pair (all occurrences counted, overlaps included —
# get_stats semantics) and merge it greedily left-to-right in every
# word. Engine shape: the heavy stage is ONE word-count shuffle (the
# corpus reduces to its vocabulary immediately — pair counting and
# merging run on the DISTINCT-WORD table, weighted by count, which is
# tiny relative to 100 TB of text); each unrolled step is a
# partial-agg pair count + a 1-row broadcast argmax + a per-row HOF
# merge fold. The greedy fold (merge and continue after the merged
# symbol) equals run-parity selection — consecutive candidate
# positions only arise when left == right — which is how the DuckDB
# oracle expresses it declaratively.

_BPE_MERGE_STEPS = 3

_BPE_MERGE_FOLD = (
    "aggregate(syms, CAST(array() AS ARRAY<STRING>), (out, x) -> "
    "IF(size(out) > 0 AND element_at(out, -1) = pl AND x = pr, "
    "concat(slice(out, 1, size(out) - 1), array(concat(pl, pr))), "
    "concat(out, array(x))))"
)


def _bpe_merge_oracle(steps: int = _BPE_MERGE_STEPS) -> str:
    ctes = ["""w0 AS (
  SELECT w, COUNT(*) AS cnt FROM (
    SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
)""", """s0 AS (
  SELECT w, cnt, string_split(w, '') AS syms FROM w0
)"""]
    for i in range(1, steps + 1):
        prev = f"s{i - 1}"
        ctes.append(f"""p{i} AS (
  SELECT s.syms[t.i] AS l, s.syms[t.i + 1] AS r,
         CAST(SUM(s.cnt) AS BIGINT) AS freq
  FROM {prev} s, UNNEST(range(1, len(s.syms))) t(i)
  GROUP BY 1, 2
)""")
        ctes.append(f"""b{i} AS (
  SELECT l, r, freq FROM p{i} ORDER BY freq DESC, l, r LIMIT 1
)""")
        ctes.append(f"""c{i} AS (
  SELECT s.w, t.i AS p
  FROM {prev} s, b{i} b, UNNEST(range(1, len(s.syms))) t(i)
  WHERE s.syms[t.i] = b.l AND s.syms[t.i + 1] = b.r
)""")
        # greedy left-to-right == keep odd ranks within each run of
        # CONSECUTIVE candidate positions (consecutive => l = r)
        ctes.append(f"""g{i} AS (
  SELECT w, p FROM (
    SELECT w, p, ROW_NUMBER() OVER (PARTITION BY w, run ORDER BY p) AS rr
    FROM (SELECT w, p,
                 p - ROW_NUMBER() OVER (PARTITION BY w ORDER BY p) AS run
          FROM c{i})
  ) WHERE rr % 2 = 1
)""")
        ctes.append(f"""s{i} AS (
  SELECT u.w, u.cnt, list(u.sym ORDER BY u.i) AS syms FROM (
    SELECT s.w, s.cnt, t.i,
           CASE WHEN g.p IS NOT NULL THEN s.syms[t.i] || s.syms[t.i + 1]
                ELSE s.syms[t.i] END AS sym,
           g2.p AS consumed
    FROM {prev} s
    CROSS JOIN UNNEST(range(1, len(s.syms) + 1)) t(i)
    LEFT JOIN g{i} g ON g.w = s.w AND g.p = t.i
    LEFT JOIN g{i} g2 ON g2.w = s.w AND g2.p = t.i - 1
  ) u WHERE u.consumed IS NULL
  GROUP BY u.w, u.cnt
)""")
    sel = "\nUNION ALL ".join(
        f"SELECT {i} AS step, l AS lhs, r AS rhs, l || r AS merged, freq"
        f" FROM b{i}"
        for i in range(1, steps + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\n{sel}\nORDER BY step"


@query("docs_bpe_train_merges", oracle=_bpe_merge_oracle(),
       tags=("llm", "text", "bpe", "tokenizer", "training"))
def docs_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first k BPE merge rules from the corpus: per step, the
    most frequent adjacent symbol pair (ties: lexicographically smallest
    (l, r)) with its pre-merge frequency. One corpus-sized shuffle total
    (word counts); everything after runs on the weighted vocabulary.
    Each step's argmax rides as a broadcast 1-row aggregate (job-free
    build); the merge itself is a per-row greedy fold over the symbol
    array — merging consumes its right symbol, so overlapping
    candidates (only possible when l = r) merge alternately, exactly
    the oracle's run-parity selection."""
    bests, _stages = _bpe_train_stages(spark, sf_dir)
    out = bests[0]
    for b in bests[1:]:
        out = out.unionByName(b)
    return out.orderBy("step")


def _bpe_train_stages(spark: SparkSession, sf_dir: str):
    """The unrolled BPE training loop: returns (bests, stages) where
    ``bests[i]`` is step i+1's 1-row merge rule and ``stages[i]`` is the
    vocabulary symbol table (cnt, syms) AFTER i merges (stages[0] = the
    character-level start). Shared by the merge-rule query above and
    the encode-stats composition below.

    Each stage's symbol table is persisted via ``cache.shared`` (r13):
    step i consumes stage i-1 TWICE (the pair count feeding the argmax,
    and the merge fold), so the unrolled plan otherwise doubles the
    whole prefix per step — the word-count shuffle replayed 2^(k-1)
    times by step k. The shared tables are the weighted VOCABULARY
    (Heaps-law — tiny relative to the corpus at any scale), the
    canonical persist-an-iterative-frontier shape (guide §5)."""
    from ..cache import shared

    (docs,) = load(spark, sf_dir, "documents")
    wc = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = shared(wc.select("cnt", F.split("w", "").alias("syms")))
    bests, stages = [], [syms]
    for step in range(1, _BPE_MERGE_STEPS + 1):
        # shared: feeds both the max-freq aggregate and the argmax filter
        pairs = shared(
            syms.select("cnt", F.explode(F.expr(
                "zip_with(slice(syms, 1, greatest(size(syms) - 1, 0)),"
                " slice(syms, 2, greatest(size(syms) - 1, 0)),"
                " (a, b) -> struct(a AS l, b AS r))")).alias("pr"))
            .groupBy(F.col("pr.l").alias("l"), F.col("pr.r").alias("r"))
            .agg(F.sum("cnt").alias("freq"))
        )
        mx = pairs.agg(F.max("freq").alias("mxf"))
        best = (
            # bounded: 1-row argmax
            pairs.crossJoin(F.broadcast(mx))
            .filter(F.col("freq") == F.col("mxf"))
            .agg(F.min(F.struct(F.col("l"), F.col("r"))).alias("p"),
                 F.first("mxf").alias("freq"))
            .select(
                F.lit(step).alias("step"),
                F.col("p.l").alias("lhs"),
                F.col("p.r").alias("rhs"),
                F.concat(F.col("p.l"), F.col("p.r")).alias("merged"),
                F.col("freq"),
            )
        )
        bests.append(best)
        pair = best.select(F.col("lhs").alias("pl"), F.col("rhs").alias("pr"))
        # bounded: 1-row winning merge pair
        syms = shared(syms.crossJoin(F.broadcast(pair)).select(
            "cnt", F.expr(_BPE_MERGE_FOLD).alias("syms")))
        stages.append(syms)
    return bests, stages


def _bpe_encode_oracle(steps: int = _BPE_MERGE_STEPS) -> str:
    train = _bpe_merge_oracle(steps)
    ctes = train[len("WITH "):train.index("\nSELECT 1 AS step")]
    per_stage = "\nUNION ALL ".join(
        f"SELECT {i} AS step,"
        f" CAST(SUM(len(syms)) AS BIGINT) AS vocab_tokens,"
        f" CAST(SUM(cnt * len(syms)) AS BIGINT) AS corpus_tokens"
        f" FROM s{i}"
        for i in range(0, steps + 1)
    )
    return f"""WITH {ctes},
stage AS ({per_stage}),
base AS (SELECT corpus_tokens AS c0 FROM stage WHERE step = 0)
SELECT s.step, s.vocab_tokens, s.corpus_tokens,
       CAST(s.corpus_tokens AS DOUBLE) / CAST(b.c0 AS DOUBLE) AS compression
FROM stage s, base b
ORDER BY s.step
"""


@query("docs_bpe_encode_stats", oracle=_bpe_encode_oracle(),
       tags=("llm", "text", "bpe", "tokenizer", "training"))
def docs_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned merges back to the corpus and report the
    number every tokenizer team tracks: corpus token count after each
    merge step and its compression ratio vs the character-level start.
    Composes the training stages above — encoding happens on the
    weighted VOCABULARY (cnt x tokens-per-word), so the corpus total is
    exact without touching the text twice. Step 0 rides as a broadcast
    1-row aggregate into the ratio (job-free build)."""
    _bests, stages = _bpe_train_stages(spark, sf_dir)
    per_stage = [
        s.agg(
            F.sum(F.size("syms")).alias("vocab_tokens"),
            F.sum(F.col("cnt") * F.size("syms")).alias("corpus_tokens"),
        ).select(F.lit(i).alias("step"), "vocab_tokens", "corpus_tokens")
        for i, s in enumerate(stages)
    ]
    stage = per_stage[0]
    for s in per_stage[1:]:
        stage = stage.unionByName(s)
    base = per_stage[0].select(F.col("corpus_tokens").alias("c0"))
    return (
        # bounded: 1-row baseline
        stage.crossJoin(F.broadcast(base))
        .select(
            "step", "vocab_tokens", "corpus_tokens",
            (F.col("corpus_tokens").cast("double")
             / F.col("c0").cast("double")).alias("compression"),
        )
        .orderBy("step")
    )


# --- weighted sampling without replacement (priority sampling) ---------------
# Training-mix construction samples documents PROPORTIONALLY TO WEIGHT
# (token count, quality score), not uniformly — docs_hash_sample /
# docs_stratified_sample cover the uniform case only, and
# docs_weighted_sample above is the GLOBAL Efraimidis-Spirakis draw
# whose pow() keys need a 12-decimal rounding crutch. The scalable
# scheme is priority sampling (Duffield, Lund & Thorup, JACM '07):
# each item draws priority w / u with u ~ Uniform(0,1]; the top-k by
# priority is a weighted sample without replacement, computed here as
# one row_number window per stratum — no sequential pass, no rejection
# loop, exactly the top-k machinery every engine already has.
#
# Cross-engine determinism: u derives from md5(doc_id) as the integer
# h in [0, 2^30), u = (2h+1) / 2^31 (never 0, dyadic). The priority
# w * 2^30 / (h + 0.5) is computed as DOUBLE from integer-exact
# operands with one multiply and one divide — IEEE ops both engines
# round identically, so the ranking (and the hash gate) is bit-exact
# with NO transcendental in sight (the exponential-race form
# u^(1/w) would need pow/log, which differ in the last ulp across
# libm implementations).

_PSAMPLE_K = 25

_PSAMPLE_ORACLE = f"""
WITH weighted AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1073741824 AS h
  FROM documents
  WHERE len(string_split(text, ' ')) >= 1
),
prio AS (
  SELECT doc_id, lang, n_tokens,
         CAST(n_tokens AS DOUBLE) * 1073741824.0
           / CAST(2 * h + 1 AS DOUBLE) AS priority
  FROM weighted
)
SELECT doc_id, lang, n_tokens, priority, sample_rank
FROM (
  SELECT p.*,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY priority DESC, doc_id) AS sample_rank
  FROM prio p
)
WHERE sample_rank <= {_PSAMPLE_K}
"""


@query("docs_priority_sample_strata", oracle=_PSAMPLE_ORACLE,
       tags=("llm", "text", "sampling"))
def docs_priority_sample_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language weighted sample without replacement, k=25, weight =
    token count. One narrow map (hash + priority arithmetic, codegen)
    and one per-stratum top-k window — WindowGroupLimit keeps per-
    partition heaps of k rows, so the shuffle carries O(k x strata)
    survivors however large the corpus. Inclusion probability tracks
    weight (long docs sample in; the dyadic u keeps replays exact)."""
    from pyspark.sql import Window

    (docs,) = load(spark, sf_dir, "documents")
    weighted = docs.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"),
        (F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")),
                        1, 8), 16, 10).cast("long")
         % F.lit(1073741824)).alias("h"),
    ).filter(F.col("n_tokens") >= 1)
    prio = weighted.select(
        "doc_id", "lang", "n_tokens",
        (F.col("n_tokens").cast("double") * F.lit(1073741824.0)
         / (F.lit(2) * F.col("h") + F.lit(1)).cast("double"))
        .alias("priority"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("priority").desc(), F.col("doc_id"))
    return (
        prio.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= _PSAMPLE_K)
        .select("doc_id", "lang", "n_tokens", "priority", "sample_rank")
    )
