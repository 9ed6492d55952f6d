"""UDF-surface queries (SURVEY.md §2.2): the engine's extension points,
mirroring the reference's Transformer list (src/mapping/customMapper.ts:27-29)
at each Spark granularity:

- scalar vectorized pandas UDF (Arrow batches, ~10-100x over row-at-a-time
  Python UDFs) — for logic the built-in library genuinely lacks;
- grouped-map ``applyInPandas`` — the UDAF-ish path: whole group in, whole
  group out.

Both queries are deliberately ALSO expressible in SQL so the driver oracle
can hash-check the UDF infrastructure itself (Arrow round-trip, null
handling, grouping) — the UDF is the unit under test, not the formula.
Rule stays: built-ins first; these paths are for when built-ins run out.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from ..catalog import load
from . import query

# --- scalar vectorized pandas UDF -------------------------------------------

_PUDF_ORACLE = """
SELECT
  doc_id,
  CAST(length(regexp_replace(lower(trim(text)), '[^a-z ]', '', 'g')) AS BIGINT)
    AS clean_len
FROM documents
"""


@query("udf_pandas_scalar", oracle=_PUDF_ORACLE, tags=("udf", "pandas"))
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # UDF built inside the query: @pandas_udf resolves its DDL return type
    # against the ACTIVE session, so a module-level decorator would make
    # the whole registry un-importable without a SparkContext.
    @pandas_udf("long")
    def clean_len(texts: pd.Series) -> pd.Series:
        # whole Arrow batch at once — vectorized pandas string kernels
        return (
            texts.str.strip().str.lower()
            .str.replace(r"[^a-z ]", "", regex=True).str.len()
        )

    (docs,) = load(spark, sf_dir, "documents")
    return docs.select("doc_id", clean_len("text").alias("clean_len"))


# --- grouped-map applyInPandas (UDAF-ish) -----------------------------------

_ZSCORE_ORACLE = """
WITH stats AS (
  SELECT source,
    CAST(SUM(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE)
      / CAST(COUNT(*) AS DOUBLE) AS mu,
    COUNT(*) AS n
  FROM documents GROUP BY source
)
SELECT d.doc_id, d.source,
  ROUND((CAST(d.n_chars AS DOUBLE) - s.mu), 9) AS centered
FROM documents d JOIN stats s USING (source)
"""


@query("udf_grouped_map_center", oracle=_ZSCORE_ORACLE, tags=("udf", "applyInPandas"))
def udf_grouped_map_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean-centering of n_chars via applyInPandas: the whole
    group arrives as ONE pandas DataFrame (shuffle on the group key — at
    100 TB the group must fit an executor, which is the documented
    contract of grouped-map). The mean is computed from an exact integer
    sum / n (deterministic), result rounded to 9 decimals on both sides."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        # exact: n_chars are ints; Python int sum is arbitrary precision
        mu = float(sum(int(x) for x in pdf["n_chars"])) / len(pdf)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "source": pdf["source"],
                "centered": [round(float(x) - mu, 9) for x in pdf["n_chars"]],
            }
        )

    (docs,) = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", "n_chars")
        .groupBy("source")
        .applyInPandas(center, schema="doc_id long, source string, centered double")
    )


# --- Python UDTF (table function: one row in -> N rows out) -------------------

_UDTF_ORACLE = """
SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS pos, w[t.i] AS token,
       CAST(length(w[t.i]) AS BIGINT) AS tok_len
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE doc_id % 50 = 0),
     (SELECT UNNEST(range(1, 300)) AS i) t
WHERE t.i <= len(w)
"""


@query("udf_udtf_tokenize", oracle=_UDTF_ORACLE, tags=("udf", "udtf"))
def udf_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 `@udtf`): the 1->N extension point — the
    generalization of the reference's flatMap Transformer contract
    (src/mapping/customMapper.ts:27-34, event -> Student[]). The lateral
    join streams one input partition per worker; no shuffle is introduced
    (the UDTF is a map-side row expander). A doc_id sample keeps the
    oracle's row count modest; built-ins (split+posexplode) would be the
    production path for THIS formula — the UDTF machinery is the unit
    under test, per this module's rule."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos bigint, token string, tok_len bigint")
    class Tokenize:
        def eval(self, text: str):
            for pos, token in enumerate((text or "").split(" ")):
                yield pos, token, len(token)

    spark.udtf.register("udtf_tokenize", Tokenize)
    (docs,) = load(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text") \
        .createOrReplaceTempView("udtf_docs_sample")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token, t.tok_len
        FROM udtf_docs_sample d, LATERAL udtf_tokenize(d.text) t
        """
    )


# --- SQL-registered vectorized UDF (ad-hoc SQL path, R3) ---------------------

_SQL_UDF_ORACLE = """
SELECT
  doc_id,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
  upper(substr(trim(text), 1, 1)) AS initial
FROM documents
WHERE doc_id % 20 = 0
"""


@query("udf_sql_registered", oracle=_SQL_UDF_ORACLE, tags=("udf", "pandas", "sql"))
def udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A vectorized pandas UDF registered into the SQL function catalog
    (``spark.udf.register``) and invoked from an ad-hoc ``spark.sql``
    string over registered views — the reference's R3 passthrough surface
    (src/database/postgresql/PostgresPg.ts:5-14) with engine-extended
    functions available to the SQL author, still Arrow-batched."""
    from ..catalog import register_views

    @pandas_udf("long")
    def word_count(texts: pd.Series) -> pd.Series:
        return texts.str.count(" ") + 1

    @pandas_udf("string")
    def initial_letter(texts: pd.Series) -> pd.Series:
        return texts.str.strip().str.slice(0, 1).str.upper()

    spark.udf.register("engine_word_count", word_count)
    spark.udf.register("engine_initial", initial_letter)
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT doc_id,
               engine_word_count(text) AS n_words,
               engine_initial(text) AS initial
        FROM documents
        WHERE doc_id % 20 = 0
        """
    )
