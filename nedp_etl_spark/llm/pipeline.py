"""End-to-end training-data curation pipeline — the composed shape every
LLM data run executes: language filter → length filter → stopword-ratio
quality gate → exact dedup (keep lowest doc_id per content hash) →
per-source corpus stats.

Each stage is individually proven elsewhere (llm_lang_id, llm_quality_score,
llm_dedup_exact, llm_text_stats); this registers the composition so the
fused plan is exercised: all filters collapse into the scan, the dedup is
one hash shuffle, the final rollup is a handful of groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import r6

_FILTER_PIPELINE_ORACLE = """
WITH scored AS (
  SELECT doc_id, source, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '), x -> x IN ('a', 'the')))
           AS n_stop,
         md5(text) AS h
  FROM documents
  WHERE lang = 'en'
),
kept AS (
  SELECT * FROM scored
  WHERE n_tokens >= 20 AND n_stop * 1.0 / n_tokens < 0.3
),
deduped AS (
  SELECT * FROM (
    SELECT kept.*, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_tokens), 6) AS avg_tokens
FROM deduped
GROUP BY source
"""


@register("llm_filter_pipeline", oracle=_FILTER_PIPELINE_ORACLE)
def llm_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = F.split("text", " ")
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda x: x.isin("a", "the"))).alias("n_stop"),
        F.md5("text").alias("h"),
    )
    kept = scored.filter(
        (F.col("n_tokens") >= 20) & (F.col("n_stop") * 1.0 / F.col("n_tokens") < 0.3)
    )
    # argmin-by-doc_id per content hash: min over a struct ordered by its
    # first field — one shuffle, no window needed.
    deduped = (
        kept.groupBy("h")
        .agg(F.min(F.struct("doc_id", "source", "n_chars", "n_tokens")).alias("w"))
        .select("w.source", "w.n_chars", "w.n_tokens")
    )
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        r6(F.avg("n_tokens")).alias("avg_tokens"),
    )


# --------------------------------------------------------------------------
# llm_dataset_split — deterministic train/val/test assignment by content
# hash (90/5/5): reproducible on any engine/partitioning, stable under
# re-runs and appends — the only split strategy that survives a 100 TB
# corpus rebuild (rand()-based splits reshuffle every run).
# --------------------------------------------------------------------------

_DATASET_SPLIT_ORACLE = """
WITH assigned AS (
  SELECT lang,
         CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'e6' THEN 'train'
           WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'f3' THEN 'val'
           ELSE 'test'
         END AS split
  FROM documents
)
SELECT split, lang, COUNT(*) AS n
FROM assigned GROUP BY split, lang
"""


@register("llm_dataset_split", oracle=_DATASET_SPLIT_ORACLE)
def llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.concat_ws(":", "doc_id", "text")), 1, 2)
    split = (
        F.when(bucket < "e6", "train").when(bucket < "f3", "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
