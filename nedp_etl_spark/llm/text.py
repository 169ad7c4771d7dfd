"""Text-analysis operators for LLM training-data pipelines (SURVEY.md §2
north-star block + BASELINE.json:6): token counting, language-ID heuristic,
quality scoring, corpus statistics.

All pure built-in expressions (split/regexp/arrays) — map-side except the
final small aggregations, so the shape is one scan of the corpus at any
scale.  Every ratio is integer-derived (count/count), making the doubles
bit-identical across engines — no rounding slack needed for comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum, r6

# --------------------------------------------------------------------------
# llm_text_stats — corpus statistics by language.
# --------------------------------------------------------------------------

_TEXT_STATS_ORACLE = f"""
WITH d AS (
  SELECT lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_unique
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(n_tokens), 6) AS avg_tokens,
       ROUND(AVG(n_unique * 1.0 / n_tokens), 6) AS avg_ttr,
       MIN(n_tokens) AS min_tokens,
       MAX(n_tokens) AS max_tokens
FROM d
GROUP BY lang
"""


@register("llm_text_stats", oracle=_TEXT_STATS_ORACLE)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    base = d.select(
        "lang",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique"),
    )
    return base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        r6(F.avg("n_tokens")).alias("avg_tokens"),
        r6(F.avg(F.col("n_unique") * 1.0 / F.col("n_tokens"))).alias("avg_ttr"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


# --------------------------------------------------------------------------
# llm_token_count — whitespace tokens + BPE-ish regex tokens per doc.
# --------------------------------------------------------------------------

_BPE_RX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

_TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RX}')) AS bpe_tokens,
       n_chars,
       ROUND(n_chars * 1.0 / len(string_split(text, ' ')), 6) AS chars_per_token
FROM documents
"""


@register("llm_token_count", oracle=_TOKEN_COUNT_ORACLE)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    ws = F.size(F.split("text", " ")).cast("bigint")
    bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_RX), 0)).cast("bigint")
    return d.select(
        "doc_id",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        "n_chars",
        F.round(F.col("n_chars") * 1.0 / ws, 6).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# llm_lang_id — n-gram/stopword-overlap language heuristic.  The marker
# lists are engine-vocabulary words (the fixture corpus is synthetic word
# soup); the *mechanism* — per-language marker-hit ratio, deterministic
# argmax — is the real lang-ID shape.  Both sides evaluate identical
# integer-ratio comparisons, so the argmax is engine-stable.
# --------------------------------------------------------------------------

_MARKERS = {
    "en": ("the", "fast", "join", "order"),
    "de": ("scan", "merge", "window"),
    "fr": ("table", "sort", "stream"),
    "es": ("hash", "batch", "spark"),
}


def _marker_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in _MARKERS[lang])
    return f"len(list_intersect(toks, [{lst}])) * 1.0 / len(toks)"


_LANG_ID_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang AS actual_lang, list_distinct(string_split(text, ' ')) AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, actual_lang,
         {_marker_sql('en')} AS r_en,
         {_marker_sql('de')} AS r_de,
         {_marker_sql('fr')} AS r_fr,
         {_marker_sql('es')} AS r_es
  FROM t
)
SELECT doc_id, actual_lang,
       ROUND(r_en, 6) AS r_en, ROUND(r_de, 6) AS r_de,
       ROUND(r_fr, 6) AS r_fr, ROUND(r_es, 6) AS r_es,
       CASE WHEN r_en >= r_de AND r_en >= r_fr AND r_en >= r_es THEN 'en'
            WHEN r_de >= r_fr AND r_de >= r_es THEN 'de'
            WHEN r_fr >= r_es THEN 'fr'
            ELSE 'es' END AS predicted
FROM scored
"""


@register("llm_lang_id", oracle=_LANG_ID_ORACLE)
def llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split("text", " "))
    base = d.select("doc_id", F.col("lang").alias("actual_lang"), toks.alias("toks"))

    def ratio(lang: str):
        markers = F.array(*[F.lit(w) for w in _MARKERS[lang]])
        return F.size(F.array_intersect(F.col("toks"), markers)) * 1.0 / F.size(F.col("toks"))

    scored = base.select(
        "doc_id",
        "actual_lang",
        ratio("en").alias("r_en"),
        ratio("de").alias("r_de"),
        ratio("fr").alias("r_fr"),
        ratio("es").alias("r_es"),
    )
    pred = (
        F.when(
            (F.col("r_en") >= F.col("r_de"))
            & (F.col("r_en") >= F.col("r_fr"))
            & (F.col("r_en") >= F.col("r_es")),
            "en",
        )
        .when((F.col("r_de") >= F.col("r_fr")) & (F.col("r_de") >= F.col("r_es")), "de")
        .when(F.col("r_fr") >= F.col("r_es"), "fr")
        .otherwise("es")
    )
    return scored.select(
        "doc_id",
        "actual_lang",
        r6(F.col("r_en")).alias("r_en"),
        r6(F.col("r_de")).alias("r_de"),
        r6(F.col("r_fr")).alias("r_fr"),
        r6(F.col("r_es")).alias("r_es"),
        pred.alias("predicted"),
    )


# --------------------------------------------------------------------------
# llm_quality_score — length / punctuation / stopword / shape heuristics
# composed into one score, the standard pre-training quality-filter shape.
# --------------------------------------------------------------------------

_QUALITY_ORACLE = """
WITH q AS (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
         len(list_filter(string_split(text, ' '),
                         t -> list_contains(['the','a','of','and','scan','join'], t))) AS n_stop
  FROM documents
)
SELECT doc_id, lang, n_tokens,
       ROUND(n_chars * 1.0 / n_tokens, 6) AS mean_token_len,
       ROUND(n_punct * 1.0 / n_chars, 6) AS punct_ratio,
       ROUND(n_stop * 1.0 / n_tokens, 6) AS stop_ratio,
       (n_tokens >= 10 AND n_punct * 1.0 / n_chars < 0.1) AS passes_filter
FROM q
"""


@register("llm_quality_score", oracle=_QUALITY_ORACLE)
def llm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "scan", "join")])
    base = d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), 0)).cast("bigint").alias("n_punct"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).cast("bigint").alias("n_stop"),
    )
    return base.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.round(F.col("n_chars") * 1.0 / F.col("n_tokens"), 6).alias("mean_token_len"),
        F.round(F.col("n_punct") * 1.0 / F.col("n_chars"), 6).alias("punct_ratio"),
        F.round(F.col("n_stop") * 1.0 / F.col("n_tokens"), 6).alias("stop_ratio"),
        ((F.col("n_tokens") >= 10) & (F.col("n_punct") * 1.0 / F.col("n_chars") < 0.1)).alias(
            "passes_filter"
        ),
    )


# --------------------------------------------------------------------------
# llm_entropy_filter — character-entropy gibberish detection, the quality
# rule that catches what ratio heuristics (llm_quality_score,
# llm_quality_gopher) miss: binary junk and base64 blobs have
# near-uniform character distributions (high Shannon entropy — base64
# sits near log2(64) = 6 bits, above any natural language), while
# single-character runs and template spam sit near zero.  H = -sum(p_c *
# log2 p_c) over the doc's character histogram, in BITS — the [2, 5]
# bits pass band keeps natural text (English ~4 bits/char) and rejects
# both tails.  (In nats the same constants would be dead code: printable
# ASCII caps at ln 95 ~= 4.55 nats, so a 5.0 upper bound could never
# fire — caught in review.)
#
# Scale shape: ONE char explode, map-side; the only raw shuffle carries
# (doc_id, char) partial counts (alphabet-bounded per doc — at most a few
# hundred distinct chars regardless of doc length).  The per-doc total is
# a window sum over that bounded histogram keyed by doc_id — NOT a
# re-derivation join, which would re-run the explode lineage twice — and
# the final entropy fold reuses the same doc_id partitioning.  Per-char
# entropy terms are rounded to 6 dp then summed with the fixed-point
# accumulator, so H is partition-order-free and engine-identical.  (The
# total comes from the histogram, not length(text), so the empty-string
# edge — both engines split '' to [''] — stays consistent.)
# Reference parity: quality filtering reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_ENTROPY_ORACLE = f"""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
),
hist AS (
  SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch
),
withn AS (
  SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM hist
),
terms AS (
  SELECT doc_id, n,
         ROUND(-(c * 1.0 / n) * log2(c * 1.0 / n), 6) AS term
  FROM withn
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_chars,
       ROUND({osum('term')}, 6) AS entropy,
       ({osum('term')} BETWEEN 2.0 AND 5.0) AS passes_filter
FROM terms
GROUP BY doc_id
"""


@register("llm_entropy_filter", oracle=_ENTROPY_ORACLE)
def llm_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    chars = d.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c") * 1.0 / F.col("n")
    terms = hist.select("doc_id", "c", n.alias("n")).select(
        "doc_id", "n", r6(-p * F.log2(p)).alias("term")
    )
    h = dsum("term")
    return terms.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("n_chars"),
        r6(h).alias("entropy"),
        h.between(2.0, 5.0).alias("passes_filter"),
    )


# --------------------------------------------------------------------------
# llm_quality_classifier — fastText-style LINEAR quality model (the
# CCNet / RedPajama-class learned filter, vs llm_quality_score's hand
# thresholds): five map-side features → fixed published-style weights →
# logistic score → keep decision.  Pure scan→score pipeline stage; zero
# shuffles at any corpus size (the type-token ratio folds in-array).
#
# Cross-engine determinism: features are ratios of integers (bit-identical
# IEEE divisions), the logit accumulates in one fixed expression order,
# and the KEEP decision compares the 6-dp-ROUNDED logit against 0 — an
# exact comparison on both engines; only the reported sigmoid itself
# carries the usual ≤1-ulp libm exp() risk inside its own 6-dp round
# (the fn_trig precedent).
# Reference parity: classifier SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_QC_W = {
    "bias": -2.1,
    "stop": 6.0,       # stopword ratio: fluent prose has function words
    "punct": -8.0,     # symbol soup is a negative signal
    "mtl": 0.12,       # mean token length
    "loglen": 0.55,    # ln(1 + tokens): longer docs score higher, saturating
    "ttr": 1.5,        # type-token ratio: vocabulary diversity
}

_QC_ORACLE = f"""
WITH f AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         n_chars,
         len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
         len(list_filter(string_split(text, ' '),
             t -> list_contains(['the','a','of','and','scan','join'], t))) AS n_stop,
         len(list_distinct(string_split(text, ' '))) AS n_types
  FROM documents
),
z AS (
  SELECT doc_id, lang, n_tokens,
         {_QC_W['bias']} + {_QC_W['stop']} * (n_stop * 1.0 / n_tokens)
           + {_QC_W['punct']} * (n_punct * 1.0 / n_chars)
           + {_QC_W['mtl']} * (n_chars * 1.0 / n_tokens)
           + {_QC_W['loglen']} * ln(1.0 + n_tokens)
           + {_QC_W['ttr']} * (n_types * 1.0 / n_tokens) AS logit
  FROM f WHERE n_tokens > 0 AND n_chars > 0
)
SELECT doc_id, lang, n_tokens,
       ROUND(logit, 6) AS logit,
       ROUND(1.0 / (1.0 + exp(-ROUND(logit, 6))), 6) AS prob,
       ROUND(logit, 6) >= 0 AS keep
FROM z
"""


@register("llm_quality_classifier", oracle=_QC_ORACLE)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "scan", "join")])
    f = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.col("n_chars"),
        F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), 0)).alias("n_punct"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop, t))).alias("n_stop"),
        F.size(F.array_distinct(toks)).alias("n_types"),
    ).filter((F.col("n_tokens") > 0) & (F.col("n_chars") > 0))
    logit = (
        F.lit(_QC_W["bias"])
        + _QC_W["stop"] * (F.col("n_stop") * 1.0 / F.col("n_tokens"))
        + _QC_W["punct"] * (F.col("n_punct") * 1.0 / F.col("n_chars"))
        + _QC_W["mtl"] * (F.col("n_chars") * 1.0 / F.col("n_tokens"))
        + _QC_W["loglen"] * F.log(1.0 + F.col("n_tokens"))
        + _QC_W["ttr"] * (F.col("n_types") * 1.0 / F.col("n_tokens"))
    )
    zr = F.round(logit, 6)
    return f.select(
        "doc_id",
        "lang",
        "n_tokens",
        zr.alias("logit"),
        F.round(1.0 / (1.0 + F.exp(-zr)), 6).alias("prob"),
        (zr >= 0).alias("keep"),
    )


# --------------------------------------------------------------------------
# llm_watermark_score — statistical watermark detection (Kirchenbauer et
# al. 2023): a watermarking LLM biases generation toward a pseudorandom
# "green list" (here: tokens whose md5 low hex digit is even — a fixed,
# key-derived vocabulary split both engines reproduce); natural text lands
# near the 50 % green fraction, watermarked text far above.  The detector
# is the one-proportion z-test z = (g − n/2)/sqrt(n/4) = (2g − n)/sqrt(n),
# flagged at z > 2.  Pure map-side scan→score (the in-array fold counts
# green tokens); zero shuffles at any corpus size — the shape a 100 TB
# synthetic-text sweep needs.
# Reference parity: detector SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_WATERMARK_ORACLE = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
g AS (
  SELECT doc_id, lang,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks,
              x -> ascii(substr(md5(x), 32, 1)) % 2 = 0)) AS BIGINT) AS n_green
  FROM t WHERE len(toks) >= 1
)
SELECT doc_id, lang, n_tokens, n_green,
       ROUND(n_green * 1.0 / n_tokens, 6) AS green_frac,
       ROUND((2.0 * n_green - n_tokens) / sqrt(CAST(n_tokens AS DOUBLE)), 6) AS z,
       (2.0 * n_green - n_tokens) / sqrt(CAST(n_tokens AS DOUBLE)) > 2.0
         AS watermark_suspect
FROM g
"""


@register("llm_watermark_score", oracle=_WATERMARK_ORACLE)
def llm_watermark_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    green = F.size(
        F.filter(toks, lambda x: F.ascii(F.substring(F.md5(x), 32, 1)) % 2 == 0)
    )
    g = d.select(
        "doc_id",
        "lang",
        F.size(toks).cast("bigint").alias("n_tokens"),
        green.cast("bigint").alias("n_green"),
    ).filter(F.col("n_tokens") >= 1)
    z = (2.0 * F.col("n_green") - F.col("n_tokens")) / F.sqrt(
        F.col("n_tokens").cast("double")
    )
    return g.select(
        "doc_id",
        "lang",
        "n_tokens",
        "n_green",
        F.round(F.col("n_green") * 1.0 / F.col("n_tokens"), 6).alias("green_frac"),
        F.round(z, 6).alias("z"),
        (z > 2.0).alias("watermark_suspect"),
    )
