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
    # F.concat, not concat_ws: concat_ws silently DROPS null elements, so a
    # null text would hash as just the doc_id while the oracle's || operator
    # (null-propagating) yields NULL -> 'test'.  concat matches the oracle:
    # null text -> null hash -> every WHEN is null -> otherwise('test').
    bucket = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
        1,
        2,
    )
    split = (
        F.when(bucket < "e6", "train").when(bucket < "f3", "val").otherwise("test")
    )
    return (
        d.select("lang", split.alias("split"))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# llm_epoch_shuffle — deterministic global shuffle + sharding for a training
# epoch.  Each doc's position is md5(seed:doc_id): a content-independent,
# engine-independent pseudo-random total order (rand() reshuffles per run
# and per partitioning — useless for reproducible epochs).  Docs land in 16
# shards by the first hash byte; within a shard the epoch order is the hash
# order.  At 100 TB this is one hash computation map-side plus one
# repartition-by-shard with a per-shard sort — exactly how training shards
# are materialized (shard = output file, rank = line number).
# --------------------------------------------------------------------------

_EPOCH_SHUFFLE_ORACLE = """
WITH h AS (
  SELECT doc_id, md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS hx
  FROM documents
),
sharded AS (
  SELECT doc_id,
         CAST(CAST('0x' || substr(hx, 1, 2) AS INT) % 16 AS INT) AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY CAST('0x' || substr(hx, 1, 2) AS INT) % 16
           ORDER BY hx, doc_id) AS epoch_rank
  FROM h
)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(CASE WHEN epoch_rank = 1 THEN doc_id END) AS BIGINT)
         AS head_doc
FROM sharded GROUP BY shard
"""


@register("llm_epoch_shuffle", oracle=_EPOCH_SHUFFLE_ORACLE)
def llm_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string")))
    shard = (F.conv(F.substring("hx", 1, 2), 16, 10).cast("int") % 16).cast("int")
    w = Window.partitionBy("shard").orderBy("hx", "doc_id")
    sharded = (
        d.select("doc_id", hx.alias("hx"))
        .select("doc_id", "hx", shard.alias("shard"))
        .withColumn("epoch_rank", F.row_number().over(w))
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max(F.when(F.col("epoch_rank") == 1, F.col("doc_id"))).alias("head_doc"),
    )


# --------------------------------------------------------------------------
# llm_chat_format — render documents into the single-string chat template a
# tokenizer consumes (SFT-data materialization).  Pure map-side string
# assembly from built-in expressions (concat/replace): no UDF, no shuffle —
# the entire op pipelines inside the scan stage at any corpus size.  Quote
# and backslash escaping is applied so the rendered JSON-lines string is
# well-formed even for hostile text.
# --------------------------------------------------------------------------

_CHAT_FORMAT_ORACLE = r"""
WITH esc AS (
  SELECT doc_id, lang,
         replace(replace(text, '\', '\\'), '"', '\"') AS t
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       '{"messages":[{"role":"system","content":"You are a helpful '
       || 'assistant. Reply in ' || lang || '."},{"role":"user","content":"'
       || t || '"}]}' AS chat_jsonl,
       CAST(length(t) AS BIGINT) AS content_len
FROM esc
"""


@register("llm_chat_format", oracle=_CHAT_FORMAT_ORACLE)
def llm_chat_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    t = F.regexp_replace(
        F.regexp_replace("text", r"\\", r"\\\\"), '"', r'\\"'
    )
    esc = d.select("doc_id", "lang", t.alias("t"))
    return esc.select(
        "doc_id",
        F.concat(
            F.lit('{"messages":[{"role":"system","content":"You are a helpful '
                  'assistant. Reply in '),
            F.col("lang"),
            F.lit('."},{"role":"user","content":"'),
            F.col("t"),
            F.lit('"}]}'),
        ).alias("chat_jsonl"),
        F.length("t").cast("bigint").alias("content_len"),
    )


# --------------------------------------------------------------------------
# llm_assembly_e2e — the dataset-ASSEMBLY composition flagship (the
# training-side twin of llm_curation_e2e's filtering pipeline): ONE
# lineage running split → temperature rebalance → epoch shuffle → sequence
# packing → sharding, with per-shard mix QA at the end.  Stage semantics
# are the standalone operators', verbatim: the llm_dataset_split content
# hash ('train' = first-2 md5 chars < 'e6'), llm_temperature_sample's
# α=0.5 keep-rates over exact int64 sqrt-micros, llm_epoch_shuffle's
# seeded position hash, llm_seq_packing's 512-token running-sum packing,
# and modulo-8 shard assignment.  Output: per shard, the doc/pack/token
# census plus language count and q6 language-mix entropy — the dataset
# card a training run reads before consuming the shards.
#
# Scale shape (featurize-once, the curation_e2e discipline): document
# text is read ONCE in stage 0 — tokens counted, both hashes and the
# uniform u computed — then dropped; nothing wide ever shuffles.  The
# train filter and acceptance filter only shrink the relation; the
# rebalance rates are an O(#langs) broadcast; the only global ordering is
# the two-phase prefix sum (util.global_running_sum — range partition +
# per-partition window + bounded offsets collect, never a one-partition
# window); the QA rollup is two keyed aggregates.  The lazy checkpoint
# stops the rebalance branch re-deriving stage 0.
# --------------------------------------------------------------------------

_ASM_CAP = 512
_ASM_SHARDS = 8

_ASSEMBLY_ORACLE = f"""
WITH f AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) AS hsplit,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
           / 4294967296.0 AS u,
         md5('epoch1:' || CAST(doc_id AS VARCHAR)) AS pos
  FROM documents
),
tr AS (SELECT * FROM f WHERE hsplit < 'e6'),
counts AS (
  SELECT lang, COUNT(*) AS n,
         CAST(FLOOR(sqrt(COUNT(*)) * 1000000.0 + 0.5) AS BIGINT) AS smicros
  FROM tr GROUP BY lang
),
tot AS (SELECT SUM(n) AS total, SUM(smicros) AS denom FROM counts),
rates AS (
  SELECT c.lang,
         LEAST(1.0, (CAST(c.smicros AS DOUBLE) * CAST(t.total AS DOUBLE))
                    / (CAST(t.denom AS DOUBLE) * CAST(c.n AS DOUBLE))) AS rate
  FROM counts c, tot t
),
kept AS (
  SELECT tr.doc_id, tr.lang, tr.n_tokens, tr.pos
  FROM tr JOIN rates r ON tr.lang = r.lang
  WHERE tr.u < r.rate
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         SUM(n_tokens) OVER (ORDER BY pos, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM kept
),
sh AS (
  SELECT doc_id, lang, n_tokens,
         CAST(floor((cum - n_tokens) / {_ASM_CAP}) AS BIGINT) AS pack_id,
         CAST(CAST(floor((cum - n_tokens) / {_ASM_CAP}) AS BIGINT)
              % {_ASM_SHARDS} AS INT) AS shard
  FROM packed
),
sl AS (SELECT shard, lang, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY shard, lang),
st AS (
  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT pack_id) AS BIGINT) AS n_packs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM sh GROUP BY shard
),
ent AS (
  SELECT sl.shard, CAST(COUNT(*) AS BIGINT) AS n_langs,
         CAST(SUM(CAST(FLOOR(-(CAST(sl.c AS DOUBLE) / st.n_docs)
              * LN(CAST(sl.c AS DOUBLE) / st.n_docs) * 1000000.0 + 0.5)
              AS BIGINT)) AS BIGINT) AS eq
  FROM sl JOIN st ON st.shard = sl.shard GROUP BY sl.shard
)
SELECT st.shard, st.n_docs, st.n_packs, st.total_tokens,
       ent.n_langs, ent.eq / 1000000.0 AS lang_entropy
FROM st JOIN ent ON ent.shard = st.shard
"""


@register("llm_assembly_e2e", oracle=_ASSEMBLY_ORACLE)
def llm_assembly_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sum

    d = load(spark, sf_dir, "documents")
    f = d.select(  # stage 0: featurize once; text never leaves this select
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
            1,
            2,
        ).alias("hsplit"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            / F.lit(4294967296.0)
        ).alias("u"),
        F.md5(F.concat(F.lit("epoch1:"), F.col("doc_id").cast("string"))).alias(
            "pos"
        ),
    )
    # stage 1: train split.  Lazy checkpoint: the rate aggregate and the
    # acceptance filter both consume this narrow relation.
    tr = f.filter(F.col("hsplit") < "e6").drop("hsplit").localCheckpoint(eager=False)
    counts = tr.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.floor(F.sqrt(F.count(F.lit(1))) * 1_000_000.0 + 0.5)
        .cast("long")
        .alias("smicros"),
    )
    tot = counts.agg(F.sum("n").alias("total"), F.sum("smicros").alias("denom"))
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.least(
            F.lit(1.0),
            (F.col("smicros").cast("double") * F.col("total").cast("double"))
            / (F.col("denom").cast("double") * F.col("n").cast("double")),
        ).alias("rate"),
    )
    # stage 2: temperature acceptance (α=0.5), O(#langs) broadcast
    kept = (
        tr.join(F.broadcast(rates), "lang")
        .filter(F.col("u") < F.col("rate"))
        .select("doc_id", "lang", "n_tokens", "pos")
    )
    # stage 3+4: epoch-order packing via the two-phase prefix sum
    c = global_running_sum(kept, ["pos", "doc_id"], F.col("n_tokens"), "cum")
    start = F.col("cum") - F.col("n_tokens")
    pack = F.floor(start / _ASM_CAP).cast("bigint")
    sh = c.select(
        "doc_id",
        "lang",
        "n_tokens",
        pack.alias("pack_id"),
        (pack % _ASM_SHARDS).cast("int").alias("shard"),
    )
    # stage 5: per-shard census + mix QA
    sl = sh.groupBy("shard", "lang").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    st = sh.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("pack_id").cast("bigint").alias("n_packs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )
    share = F.col("c").cast("double") / F.col("n_docs")
    ent = (
        sl.join(st.select("shard", "n_docs"), "shard")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_langs"),
            F.sum(
                F.floor(-share * F.log(share) * 1_000_000.0 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("eq"),
        )
    )
    return st.join(ent, "shard").select(
        "shard",
        "n_docs",
        "n_packs",
        "total_tokens",
        "n_langs",
        (F.col("eq") / 1_000_000.0).alias("lang_entropy"),
    )
