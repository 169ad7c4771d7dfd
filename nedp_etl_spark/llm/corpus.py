"""Web-corpus curation operators: URL-canonicalization dedup, duplicated-span
detection, tokenizer fertility, multi-query BM25 retrieval, bigram LM scoring.

The reference reaches data curation only as dbt-model SQL
(``/root/reference/dbtoperator.py:273-274``); these are the CommonCrawl-style
pipeline stages (URL dedup before fetch, exact-substring dedup à la
"Deduplicating Training Data Makes Language Models Better", tokenizer
fertility audits, retrieval and LM-quality scoring) re-expressed Spark-first.

Scale shape:
- ``llm_url_dedup`` is one map-side canonicalization expression chain
  (parse_url + higher-order filter/sort over query params — no UDF) and one
  groupBy on the canonical key: only (canonical, doc_id) pairs shuffle.
- ``llm_span_dedup`` hashes every W-token window map-side (transform over
  sequence — no self-join, no window function) and shuffles only (hash,
  doc_id); duplicated spans come from one count-distinct per hash.  This is
  the bucketed shape of suffix-array dedup: candidates are found by equality
  on the span hash, never by pairwise comparison.
- ``llm_rag_retrieval`` is inverted-index retrieval: the query set is a
  broadcast, scoring is an equi-join on term + partial agg per (query, doc),
  top-k per query via WindowGroupLimit.  At 100 TB the posting lists shard
  by term; nothing pairwise.
- ``llm_bigram_logprob`` builds bigrams map-side (zip of shifted slices),
  so the only shuffles are the bigram/unigram count aggregates; the LM
  tables broadcast back (vocab-sized, corpus-size-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load, local_rows
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum

# --------------------------------------------------------------------------
# llm_url_dedup — canonicalize synthetic crawl URLs (lowercase host, strip
# leading www., drop fragment, drop tracking params utm_*/ref, sort kept
# params) and collapse duplicates, keeping the lowest doc_id.  The URL is
# deterministically derived from (source, lang, doc_id) on BOTH sides so the
# oracle exercises the identical canonicalization contract.
# --------------------------------------------------------------------------

_URL_EXPR_SQL = (
    "'https://WWW.' || source || '.Example.COM/articles/' || (doc_id % 40)"
    " || '?utm_source=feed&page=' || (doc_id % 3) || '&utm_campaign=c'"
    " || (doc_id % 7) || '&ref=' || lang || '#sec' || (doc_id % 5)"
)

_URL_DEDUP_ORACLE = f"""
WITH u AS (SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents),
canon AS (
  SELECT doc_id,
         'https://' ||
         regexp_replace(lower(regexp_extract(url, 'https://([^/]+)', 1)),
                        '^www\\.', '') ||
         regexp_extract(url, 'https://[^/]+(/[^?#]*)', 1) || '?' ||
         array_to_string(
           list_sort(list_filter(string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                                 p -> NOT (p LIKE 'utm_%' OR p LIKE 'ref=%'))),
           '&') AS canonical_url
  FROM u
)
SELECT canonical_url, COUNT(*) AS n_dups, MIN(doc_id) AS keeper
FROM canon GROUP BY canonical_url
"""


@register("llm_url_dedup", oracle=_URL_DEDUP_ORACLE)
def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."), F.col("source"), F.lit(".Example.COM/articles/"),
        (F.col("doc_id") % 40).cast("string"),
        F.lit("?utm_source=feed&page="), (F.col("doc_id") % 3).cast("string"),
        F.lit("&utm_campaign=c"), (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref="), F.col("lang"),
        F.lit("#sec"), (F.col("doc_id") % 5).cast("string"),
    )
    with_url = d.select("doc_id", url.alias("url"))
    host = F.regexp_replace(F.lower(F.parse_url("url", F.lit("HOST"))), r"^www\.", "")
    kept = F.array_sort(
        F.filter(
            F.split(F.parse_url("url", F.lit("QUERY")), "&"),
            lambda p: ~(p.like("utm_%") | p.like("ref=%")),
        )
    )
    canonical = F.concat(
        F.lit("https://"), host, F.parse_url("url", F.lit("PATH")),
        F.lit("?"), F.array_join(kept, "&"),
    )
    return (
        with_url.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keeper"))
    )


# --------------------------------------------------------------------------
# llm_span_dedup — exact-substring duplication audit: hash every window of
# W=8 consecutive tokens; a span is "duplicated" when its hash occurs in ≥2
# distinct documents.  Per-document output: total spans, duplicated-span
# instances, duplication fraction.
# --------------------------------------------------------------------------

_SPAN_W = 8

_SPAN_DEDUP_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
spans AS (
  SELECT doc_id,
         md5(array_to_string(l[CAST(i AS INT):CAST(i + {_SPAN_W - 1} AS INT)], ' ')) AS h
  FROM (SELECT doc_id, l,
               unnest(generate_series(1, CAST(len(l) - {_SPAN_W} + 1 AS BIGINT))) AS i
        FROM t WHERE len(l) >= {_SPAN_W})
),
dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
SELECT s.doc_id,
       COUNT(*) AS n_spans,
       CAST(COUNT(dup.h) AS BIGINT) AS n_dup_spans,
       ROUND(COUNT(dup.h) * 1.0 / COUNT(*), 6) AS dup_frac
FROM spans s LEFT JOIN dup ON s.h = dup.h
GROUP BY s.doc_id
"""


@register("llm_span_dedup", oracle=_SPAN_DEDUP_ORACLE)
def llm_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l")).filter(
        F.size("l") >= _SPAN_W
    )
    spans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("l") - _SPAN_W + 1),
                lambda i: F.md5(F.concat_ws(" ", F.slice("l", i, _SPAN_W))),
            )
        ).alias("h"),
    )
    dup = (
        spans.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    return (
        # dup grows with duplicated-content volume (unbounded at 100 TB):
        # plain shuffle join on the span hash; AQE broadcasts iff small.
        spans.join(dup.withColumn("is_dup", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count("is_dup").cast("bigint").alias("n_dup_spans"),
            F.round(F.count("is_dup") / F.count(F.lit(1)), 6).alias("dup_frac"),
        )
    )


# --------------------------------------------------------------------------
# llm_suffix_dedup — exact substring-level dedup drop list (the suffix-array
# dedup of Lee et al. 2022, "Deduplicating Training Data Makes Language
# Models Better", re-expressed in the bucketed-candidate shape): hash every
# window of K consecutive tokens; a window repeated ANYWHERE in the corpus
# (cross-doc or within-doc — the suffix-array definition, unlike
# llm_span_dedup's cross-doc count audit) marks its positions, and per doc
# the marked positions merge into MAXIMAL spans (gap-and-island: windows
# chain while the position gap is <= K, i.e. the covered text is
# contiguous).  Output is the actionable (doc_id, span_start, span_end)
# token-range drop list — what llm_span_dedup's per-doc counts cannot give.
#
# Scale shape: candidates by EQUALITY on the window hash (groupBy h +
# equi-join back), never pairwise; the island merge is one per-doc running
# window ([unboundedPreceding, currentRow] — the O(1)-per-row frame).
# Shuffles: (h) agg, (h) join, (doc_id) window, (doc_id, island) agg.  At
# 100 TB this is exactly the Lee et al. sharded pipeline: dup-hash
# discovery shards by hash, span assembly shards by document.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SUFFIX_K = 8

_SUFFIX_DEDUP_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
spans AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         md5(array_to_string(l[CAST(i AS INT):CAST(i + {_SUFFIX_K - 1} AS INT)], ' ')) AS h
  FROM (SELECT doc_id, l,
               unnest(generate_series(1, CAST(len(l) - {_SUFFIX_K} + 1 AS BIGINT))) AS i
        FROM t WHERE len(l) >= {_SUFFIX_K})
),
dup AS (SELECT h FROM spans GROUP BY h HAVING COUNT(*) >= 2),
hits AS (SELECT s.doc_id, s.pos FROM spans s JOIN dup USING (h)),
lagged AS (
  SELECT doc_id, pos,
         LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > {_SUFFIX_K} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM lagged
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + {_SUFFIX_K - 1} AS span_end,
       MAX(pos) + {_SUFFIX_K} - MIN(pos) AS span_tokens
FROM isl GROUP BY doc_id, island
"""


@register("llm_suffix_dedup", oracle=_SUFFIX_DEDUP_ORACLE)
def llm_suffix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.data import fan_out

    # fan_out: the per-position md5-of-8-token-window chain runs before the
    # first shuffle — single-core on a 1-row-group fixture (no-op at scale).
    d = fan_out(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        sf_dir,
        "documents",
    )
    toks = d.select("doc_id", F.split("text", " ").alias("l")).filter(
        F.size("l") >= _SUFFIX_K
    )
    spans = (
        toks.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - _SUFFIX_K + 1),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("l", i, _SUFFIX_K))),
                )
            ).alias("p0", "h"),
        )
        # sequence() is 1-based; posexplode re-indexes from 0 — undo it so
        # both engines speak 1-based token positions.
        .select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "h")
    )
    # total-occurrence count (>= 2 ANYWHERE), not distinct-doc count: a
    # window repeated twice inside one doc is duplicated training text too.
    dup = (
        spans.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("h")
    )
    hits = spans.join(dup, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    run = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("pos").over(w)
    brk = F.when(
        prev.isNull() | ((F.col("pos") - prev) > _SUFFIX_K), F.lit(1)
    ).otherwise(F.lit(0))
    isl = hits.withColumn("brk", brk).withColumn("island", F.sum("brk").over(run))
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + _SUFFIX_K - 1).alias("span_end"),
        (F.max("pos") + _SUFFIX_K - F.min("pos")).alias("span_tokens"),
    ).drop("island")


# --------------------------------------------------------------------------
# llm_tokenizer_fertility — subword fertility audit per language: a BPE-ish
# deterministic proxy (ceil(len(word)/4) subwords per word) aggregated to
# tokens-per-word by language.  Pure higher-order array math — zero shuffles
# beyond the final per-language aggregate.
# --------------------------------------------------------------------------

_FERTILITY_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(string_split(text, ' '),
                       w -> CAST(CEIL(LENGTH(w) / 4.0) AS BIGINT))) AS BIGINT)
           AS n_subwords
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_subwords) AS BIGINT) AS total_subwords,
       ROUND(SUM(n_subwords) * 1.0 / SUM(n_words), 6) AS fertility
FROM per_doc GROUP BY lang
"""


@register("llm_tokenizer_fertility", oracle=_FERTILITY_ORACLE)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    subwords = F.aggregate(
        F.transform(words, lambda w: F.ceil(F.length(w) / 4.0)),
        F.lit(0).cast("bigint"),
        lambda s, x: s + x,
    )
    per_doc = d.select(
        "lang",
        F.size(words).cast("bigint").alias("n_words"),
        subwords.alias("n_subwords"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_subwords").alias("total_subwords"),
        F.round(F.sum("n_subwords") / F.sum("n_words"), 6).alias("fertility"),
    )


# --------------------------------------------------------------------------
# llm_rag_retrieval — multi-query BM25 top-3 retrieval (k1=1.2, b=0.75) over
# an inverted index: query set broadcast, equi-join on term, per-(query,doc)
# partial-score sum, WindowGroupLimit top-k per query.
# --------------------------------------------------------------------------

_RAG_QUERIES: list[tuple[str, str]] = [
    ("q_join", "hash join merge"),
    ("q_scan", "scan filter fast"),
    ("q_sort", "sort window line"),
    ("q_table", "table value part"),
    ("q_spark", "spark batch key"),
]

_RAG_VALUES = ", ".join(
    f"('{q}', '{t}')" for q, terms in _RAG_QUERIES for t in terms.split(" ")
)

_RAG_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n_docs FROM dl
),
q(query_id, term) AS (VALUES {_RAG_VALUES}),
parts AS (
  SELECT q.query_id, tf.doc_id,
         ROUND(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6) AS s
  FROM q
  JOIN tf ON q.term = tf.term
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
),
scored AS (
  SELECT query_id, doc_id, ROUND({osum('s')}, 6) AS bm25
  FROM parts GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, bm25, rank FROM (
  SELECT scored.*,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY bm25 DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= 3
"""


@register("llm_rag_retrieval", oracle=_RAG_ORACLE)
def llm_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    q = local_rows(spark, 
        [(qid, t) for qid, terms in _RAG_QUERIES for t in terms.split(" ")],
        "query_id string, term string",
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    part = F.round(idf * F.col("tf") * 2.2 / norm, 6)
    scored = (
        tf.join(F.broadcast(q), "term")  # q: a handful of query terms
        # dfreq is vocabulary-sized: no broadcast hint, AQE decides
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", part.alias("s"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(dsum("s"), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("query_id", "doc_id", "bm25", "rank")
    )


# --------------------------------------------------------------------------
# llm_bigram_logprob — interpolated bigram LM quality score:
# p(w2|w1) = 0.7·c(w1,w2)/c(w1·) + 0.3·c(w2)/N, avg log-prob per document
# for a stable probe subset.  Bigrams are built map-side (zip of shifted
# slices) — no self-join, no window; LM tables broadcast back.
# --------------------------------------------------------------------------

_BIGRAM_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bi AS (
  SELECT doc_id, l[CAST(i AS INT)] AS w1, l[CAST(i + 1 AS INT)] AS w2
  FROM (SELECT doc_id, l,
               unnest(generate_series(1, CAST(len(l) - 1 AS BIGINT))) AS i
        FROM t)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY w1),
uni AS (
  SELECT term, COUNT(*) AS cu
  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
  GROUP BY term
),
n AS (SELECT CAST(SUM(cu) AS DOUBLE) AS nt FROM uni),
scored AS (
  SELECT bi.doc_id,
         ROUND(ln(0.7 * c12.c12 * 1.0 / c1.c1 + 0.3 * uni.cu / n.nt), 6) AS lp
  FROM bi
  JOIN c12 ON bi.w1 = c12.w1 AND bi.w2 = c12.w2
  JOIN c1 ON bi.w1 = c1.w1
  JOIN uni ON bi.w2 = uni.term
  CROSS JOIN n
  WHERE bi.doc_id < 100
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ROUND({osum('lp')} / COUNT(*), 6) AS avg_logprob
FROM scored GROUP BY doc_id
"""


@register("llm_bigram_logprob", oracle=_BIGRAM_ORACLE)
def llm_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    l = F.split("text", " ")
    bi = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(l, 1, F.size(l) - 1).alias("w1"),
                F.slice(l, 2, F.size(l) - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    uni = (
        d.select(F.explode(l).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n = uni.agg(F.sum("cu").cast("double").alias("nt"))
    lp = F.round(
        F.log(
            0.7 * F.col("c12") / F.col("c1") + 0.3 * F.col("cu") / F.col("nt")
        ),
        6,
    )
    return (
        bi.filter(F.col("doc_id") < 100)
        .join(c12, ["w1", "w2"])
        # c1/uni are vocabulary-sized: plain shuffle joins, AQE decides
        .join(c1, "w1")
        .join(uni.withColumnRenamed("term", "w2"), "w2")
        .crossJoin(F.broadcast(n))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(dsum("lp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# llm_bpe_merges — the first round of BPE tokenizer training at corpus
# scale (Sennrich et al. 2016): count every adjacent character pair
# weighted by word frequency; the top pairs are the first merge
# candidates.  This is the map-reduce shape real tokenizer training uses —
# the corpus collapses to a word-frequency table first (vocab-sized, NOT
# corpus-sized), so the pair explode runs over distinct words only and the
# pair aggregate is pair-vocab-bounded.  Top-k via orderBy+limit compiles
# to TakeOrderedAndProject (per-partition local top-k).  Shuffles: one
# vocab-sized word count, one pair-vocab-sized pair count — both with
# map-side partial aggregation; 100 TB of text streams through the first.
# Reference parity: tokenizer workloads reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_BPE_TOP = 20

_BPE_MERGES_ORACLE = f"""
WITH wf AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
freq AS (SELECT w, COUNT(*) AS f FROM wf GROUP BY w),
pairs AS (
  SELECT substr(w, CAST(unnest(range(1, len(w))) AS INT), 2) AS pair, f
  FROM freq WHERE len(w) >= 2
)
SELECT pair, CAST(SUM(f) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT {_BPE_TOP}
"""


@register("llm_bpe_merges", oracle=_BPE_MERGES_ORACLE)
def llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)  # drop 1-char/empty tokens BEFORE the shuffle
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    pairs = freq.select(
        F.posexplode(F.sequence(F.lit(1), F.length("w") - 1)).alias("_p", "i"),
        F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(_BPE_TOP)
    )


# --------------------------------------------------------------------------
# llm_bpe_train — the FULL iterative BPE training loop (Sennrich et al.
# 2016), extending llm_bpe_merges' single pair count to K merge rounds:
# each round picks the most frequent adjacent symbol pair (ties broken
# lexicographically), merges it greedily left-to-right in every word that
# contains it, and re-derives the pair table INCREMENTALLY — only the
# words containing the merged pair contribute deltas (old pairs negated,
# new pairs added), so no round ever re-explodes the corpus or even the
# full vocabulary (the round-5 verdict's named requirement; the
# llm_dedup_cluster iteration discipline).
#
# Scale shape per round: the winner is ONE row off the pair table
# (TakeOrderedAndProject — a bounded driver collect, like the kmeans
# centroids); the affected-word scan is a shuffle-free map over the
# vocab-sized word table (a production variant would keep an inverted
# pair->word index to skip even that); the delta explode runs over
# changed words only; the pair-table refresh is a keyed union+sum whose
# lineage is truncated by per-round localCheckpoint (the frontier-BFS
# discipline — without it round K's plan would nest K unions deep).
# Corpus text is touched exactly once, at the initial vocab collapse.
#
# Merge semantics (identical on both engines, pinned by the planted
# test): greedy left-to-right non-overlapping — in a chain "aaa" the
# pair (a,a) merges positions {1,2} then skips, giving [aa, a].  The
# Spark side is a left fold (F.aggregate: merge the new symbol into the
# accumulator tail iff tail == a AND s == b); the oracle derives the
# SAME positions by a different algebra — hit positions, gaps-and-islands
# run ids over consecutive hits, merge at odd offsets within each run —
# so a shared misreading of the greedy rule cannot self-confirm.
# Reference parity: tokenizer workloads reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_BPE_TRAIN_K = 5


def _bpe_train_oracle(k: int) -> str:
    """Unrolled K-round BPE replay in DuckDB SQL (generated, exact)."""
    parts = [
        """w1 AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f, string_split(w, '') AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) >= 2 GROUP BY w
)"""
    ]
    for r in range(1, k + 1):
        parts.append(
            f"""p{r} AS (
  SELECT s.syms[u.i] AS a, s.syms[u.i+1] AS b, SUM(s.f) AS n
  FROM w{r} s, unnest(range(1, len(s.syms))) AS u(i)
  GROUP BY 1, 2
),
win{r} AS (SELECT a, b, n FROM p{r} ORDER BY n DESC, a, b LIMIT 1)"""
        )
        if r < k:
            parts.append(
                f"""h{r} AS (
  SELECT s.w, u.i,
         u.i - ROW_NUMBER() OVER (PARTITION BY s.w ORDER BY u.i) AS grp
  FROM w{r} s, unnest(range(1, len(s.syms))) AS u(i), win{r}
  WHERE s.syms[u.i] = win{r}.a AND s.syms[u.i+1] = win{r}.b
),
g{r} AS (
  SELECT w, i FROM (
    SELECT w, i, ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY i) AS rk
    FROM h{r}
  ) WHERE rk % 2 = 1
),
w{r + 1} AS (
  SELECT p.w, p.f,
         list(CASE WHEN gm.i IS NOT NULL THEN p.sym || p.nxt ELSE p.sym END
              ORDER BY p.j) AS syms
  FROM (SELECT s.w, s.f, u.j, s.syms[u.j] AS sym, s.syms[u.j+1] AS nxt
        FROM w{r} s, unnest(range(1, len(s.syms) + 1)) AS u(j)) p
  LEFT JOIN g{r} gm ON gm.w = p.w AND gm.i = p.j
  LEFT JOIN g{r} gs ON gs.w = p.w AND gs.i = p.j - 1
  WHERE gs.i IS NULL
  GROUP BY p.w, p.f
)"""
            )
    selects = "\nUNION ALL ".join(
        f"SELECT {r} AS round, a AS pair_a, b AS pair_b, CAST(n AS BIGINT) AS n"
        f" FROM win{r}"
        for r in range(1, k + 1)
    )
    return "WITH " + ",\n".join(parts) + "\n" + selects


def _bpe_pair_counts(wdf: DataFrame) -> DataFrame:
    """(a, b, n): adjacent symbol pairs weighted by word frequency.  The
    size guard matters: sequence(1, 0) would DESCEND ([1, 0]), not yield
    an empty array."""
    pairs = wdf.filter(F.size("syms") >= 2).select(
        "f",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(element_at(syms, i) AS a,"
                "             element_at(syms, i + 1) AS b))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("f").alias("n")
    )


@register("llm_bpe_train", oracle=_bpe_train_oracle(_BPE_TRAIN_K))
def llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
        .withColumn("syms", F.split("w", ""))
        # EAGER checkpoints here are the measured optimum (r13 optimization
        # round probed lazy: words/pc feed 3+ branches per merge round, and
        # lazy blocks double-computed inside the argmax job — 3.0 → 5.5 s).
        .localCheckpoint(eager=True)
    )
    pc = _bpe_pair_counts(words).localCheckpoint(eager=True)
    merges: list[tuple] = []
    for r in range(1, _BPE_TRAIN_K + 1):
        win = pc.orderBy(F.col("n").desc(), "a", "b").limit(1).collect()
        if not win:  # corpus exhausted (every word a single symbol)
            break
        a, b, n = win[0]["a"], win[0]["b"], win[0]["n"]
        merges.append((r, a, b, int(n)))
        if r == _BPE_TRAIN_K:
            break  # last winner recorded: skip the now-dead merge pass
        # Affected words only (shuffle-free vocab scan): everything below
        # this filter is changed-words-proportional.
        hit = F.when(
            F.size("syms") >= 2,
            F.exists(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) AS x,"
                    "             element_at(syms, i + 1) AS y))"
                ),
                lambda p: (p["x"] == F.lit(a)) & (p["y"] == F.lit(b)),
            ),
        ).otherwise(F.lit(False))
        changed = words.filter(hit)
        unchanged = words.filter(~hit)
        # Greedy left-to-right merge as a left fold over the symbols.
        merged_syms = F.aggregate(
            F.col("syms"),
            F.expr("cast(array() as array<string>)"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(F.lit(a), s)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        new_changed = changed.withColumn("syms", merged_syms)
        # Incremental pair-table refresh: subtract the changed words' old
        # pairs, add their new pairs; zero/negative counts drop out.
        pc = (
            pc.unionAll(_bpe_pair_counts(changed).withColumn("n", -F.col("n")))
            .unionAll(_bpe_pair_counts(new_changed))
            .groupBy("a", "b")
            .agg(F.sum("n").alias("n"))
            .filter(F.col("n") > 0)
            .localCheckpoint(eager=True)
        )
        words = unchanged.unionAll(new_changed).localCheckpoint(eager=True)
    return local_rows(spark, 
        merges, "round int, pair_a string, pair_b string, n bigint"
    )


# --------------------------------------------------------------------------
# llm_bpe_encode — APPLY a trained merge table (the fixed 4-merge
# vocabulary below, chaining t+h→th→the) to the corpus: tokenize every
# document and report its BPE token count and chars-per-token compression.
#
# Scale shape — encode once per DISTINCT word, not per occurrence: the
# corpus collapses to the vocab first (llm_bpe_merges' discipline), the
# merge chain runs as nested greedy left-folds over the vocab-sized
# relation only, and the per-doc counts come from joining the corpus word
# stream back against the encoded vocab (vocab-sized build side).  This
# is exactly how production tokenizers amortize encoding at 100 TB.
#
# Greedy semantics shared with llm_bpe_train (left-to-right,
# non-overlapping, merges applied in table order so later merges compound
# on earlier outputs); the oracle derives the same positions by the
# gaps-and-islands algebra — a different algorithm, so a shared
# misreading cannot self-confirm.
# Reference parity: tokenizer workloads reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_BPE_ENCODE_MERGES = [("t", "h"), ("th", "e"), ("i", "n"), ("e", "r")]


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b (left fold,
    identical to llm_bpe_train's per-round merge)."""
    return F.aggregate(
        syms,
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(F.lit(a), s))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_encode_oracle() -> str:
    parts = [
        """v1 AS (
  SELECT w, string_split(w, '') AS syms
  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE len(w) >= 1
)"""
    ]
    for r, (a, b) in enumerate(_BPE_ENCODE_MERGES, start=1):
        parts.append(
            f"""h{r} AS (
  SELECT s.w, u.i,
         u.i - ROW_NUMBER() OVER (PARTITION BY s.w ORDER BY u.i) AS grp
  FROM v{r} s, unnest(range(1, len(s.syms))) AS u(i)
  WHERE s.syms[u.i] = '{a}' AND s.syms[u.i+1] = '{b}'
),
g{r} AS (
  SELECT w, i FROM (
    SELECT w, i, ROW_NUMBER() OVER (PARTITION BY w, grp ORDER BY i) AS rk
    FROM h{r}
  ) WHERE rk % 2 = 1
),
v{r + 1} AS (
  SELECT p.w,
         list(CASE WHEN gm.i IS NOT NULL THEN p.sym || p.nxt ELSE p.sym END
              ORDER BY p.j) AS syms
  FROM (SELECT s.w, u.j, s.syms[u.j] AS sym, s.syms[u.j+1] AS nxt
        FROM v{r} s, unnest(range(1, len(s.syms) + 1)) AS u(j)) p
  LEFT JOIN g{r} gm ON gm.w = p.w AND gm.i = p.j
  LEFT JOIN g{r} gs ON gs.w = p.w AND gs.i = p.j - 1
  WHERE gs.i IS NULL
  GROUP BY p.w
)"""
        )
    final_v = f"v{len(_BPE_ENCODE_MERGES) + 1}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f""",
enc AS (SELECT w, CAST(len(syms) AS BIGINT) AS toks FROM {final_v}),
docw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(d.w)) AS BIGINT) AS n_chars,
       CAST(SUM(e.toks) AS BIGINT) AS n_tokens,
       ROUND(SUM(len(d.w)) * 1.0 / SUM(e.toks), 6) AS chars_per_token
FROM docw d JOIN enc e ON d.w = e.w
GROUP BY d.doc_id"""
    )


def _bpe_fertility_oracle() -> str:
    # Same vocab-level encode as _bpe_encode_oracle (the parts builder is
    # shared by construction: identical merges, identical gaps-and-islands
    # algebra), with the final rollup keyed by LANGUAGE instead of doc.
    encode_sql = _bpe_encode_oracle()
    prefix = encode_sql[: encode_sql.index("docw AS (")]
    return (
        prefix
        + """docw AS (
  SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents
)
SELECT d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(e.toks) AS BIGINT) AS n_pieces,
       FLOOR(SUM(e.toks) * 1.0 / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
         AS fertility,
       FLOOR(SUM(len(d.w)) * 1.0 / SUM(e.toks) * 1000000.0 + 0.5) / 1000000.0
         AS chars_per_piece,
       FLOOR(SUM(CASE WHEN e.toks > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
             * 1000000.0 + 0.5) / 1000000.0 AS split_word_frac
FROM docw d JOIN enc e ON d.w = e.w
GROUP BY d.lang"""
    )


@register("llm_bpe_encode", oracle=_bpe_encode_oracle())
def llm_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 1)
        .distinct()
        .withColumn("syms", F.split("w", ""))
    )
    syms = F.col("syms")
    for a, b in _BPE_ENCODE_MERGES:
        syms = _merge_fold(syms, a, b)
    enc = vocab.select("w", F.size(syms).cast("bigint").alias("toks"))
    docw = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 1
    )
    return (
        docw.join(enc, "w")  # vocab-sized build side; AQE may broadcast it
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
            F.round(
                F.sum(F.length("w")) * 1.0 / F.sum("toks"), 6
            ).alias("chars_per_token"),
        )
    )


# --------------------------------------------------------------------------
# llm_ngram_novelty — per-document novelty: what fraction of a doc's
# distinct trigrams appear NOWHERE else in the corpus?  Low novelty means
# the doc is assembled from corpus-common phrasing (boilerplate /
# template / near-duplicate tails that survive exact dedup); the signal
# behind memorization and template-collapse screens.
#
# Scale shape: distinct (doc, gram) pairs explode ONCE; the corpus-wide
# document frequency is a gram-keyed aggregate with map-side combine; the
# novelty join is gram-keyed equi (never all-pairs) and the final
# aggregate is doc-keyed.  Identical cost family to llm_tfidf's df pass —
# the novel part is the df=1 fraction per doc, not the plumbing.
# Reference parity: text-analysis SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_NOVELTY_ORACLE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id,
         UNNEST(list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                               FOR i IN range(1, len(t) - 1)])) AS g
  FROM toks WHERE len(t) >= 3
),
df AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g)
SELECT grams.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(*) FILTER (WHERE df.df = 1) AS BIGINT) AS n_unique,
       ROUND(COUNT(*) FILTER (WHERE df.df = 1) * 1.0 / COUNT(*), 6) AS novelty
FROM grams JOIN df ON grams.g = df.g
GROUP BY grams.doc_id
"""


@register("llm_ngram_novelty", oracle=_NOVELTY_ORACLE)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.llm.curation import _trigram_set

    d = load(spark, sf_dir, "documents")
    grams = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .filter(F.size("t") >= 3)
        .select("doc_id", F.explode(_trigram_set(F.col("t"))).alias("g"))
    )
    df = grams.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        grams.join(df, "g")  # gram-keyed equi-join: shuffle by gram hash
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )


# --------------------------------------------------------------------------
# llm_kneser_ney — interpolated Kneser-Ney bigram LM score (the standard
# n-gram smoothing; Chen & Goodman 1999): absolute discount d = 0.75 on the
# bigram count, mass redistributed through the CONTINUATION unigram —
# P_cont(w2) = |{w1 : c(w1,w2) > 0}| / |distinct bigram types| — which
# scores words by how many contexts they complete, not raw frequency
# ("San Francisco" inflates c(Francisco) but not its continuation count).
#   P_kn(w2|w1) = (c(w1,w2) − d)/c(w1·) + (d·N1+(w1,·)/c(w1·))·P_cont(w2)
# Per-doc average log-prob over the llm_bigram_logprob probe subset — the
# drop-in upgrade of that operator's interpolated-MLE scoring.
#
# Scale shape: the corpus collapses to the bigram-TYPE table first (one
# map-side-combining aggregate, pair-vocab-sized, NOT corpus-sized); the
# left-context totals, continuation counts, and type total all derive
# from that reduced relation — three tiny aggregates, no second corpus
# pass.  Probe docs join the LM tables on vocabulary keys (hash joins);
# the 1-row type-total broadcast is the allowlisted scalar shape.
# Every observed bigram has c ≥ 1 > d, so the discounted term is
# positive and the log argument never needs a guard on either engine.
# Reference parity: LM scoring reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_KN_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bi AS (
  SELECT doc_id, l[CAST(i AS INT)] AS w1, l[CAST(i + 1 AS INT)] AS w2
  FROM (SELECT doc_id, l,
               unnest(generate_series(1, CAST(len(l) - 1 AS BIGINT))) AS i
        FROM t)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, COUNT(*) AS n1w1
  FROM c12 GROUP BY w1
),
cont AS (SELECT w2, COUNT(*) AS n1w2 FROM c12 GROUP BY w2),
tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM c12),
scored AS (
  SELECT bi.doc_id,
         ROUND(ln((c12.c12 - 0.75) / c1.c1
                  + (0.75 * c1.n1w1 / c1.c1) * (cont.n1w2 / tt.t)), 6) AS lp
  FROM bi
  JOIN c12 ON bi.w1 = c12.w1 AND bi.w2 = c12.w2
  JOIN c1 ON bi.w1 = c1.w1
  JOIN cont ON bi.w2 = cont.w2
  CROSS JOIN tt
  WHERE bi.doc_id < 100
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       ROUND({osum('lp')} / COUNT(*), 6) AS avg_logprob
FROM scored GROUP BY doc_id
"""


@register("llm_kneser_ney", oracle=_KN_ORACLE)
def llm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    l = F.split("text", " ")
    bi = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(l, 1, F.size(l) - 1).alias("w1"),
                F.slice(l, 2, F.size(l) - 1).alias("w2"),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1w1")
    )
    cont = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1w2"))
    tt = c12.agg(F.count(F.lit(1)).cast("double").alias("t"))
    lp = F.round(
        F.log(
            (F.col("c12") - 0.75) / F.col("c1")
            + (0.75 * F.col("n1w1") / F.col("c1")) * (F.col("n1w2") / F.col("t"))
        ),
        6,
    )
    return (
        bi.filter(F.col("doc_id") < 100)
        .join(c12, ["w1", "w2"])
        # c1/cont are vocabulary-sized: plain shuffle joins, AQE decides
        .join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(dsum("lp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# llm_dataset_card — the per-source "dataset card" statistics block every
# training-data release ships (HF dataset cards / Datasheets for
# Datasets): document count, token volume, language spread + top
# language, mean length, exact-duplicate rate, and short-doc fraction,
# one row per source.
#
# Scale shape: per-doc metrics are map-side; everything downstream is
# keyed aggregates over (source), (source, lang), (source, text_hash) —
# three combining shuffles of key-cardinality rows, joined at
# |sources| size.  top_lang is a rank-1 keyed window over the (source,
# lang) counts, never the corpus.
# --------------------------------------------------------------------------

_DATASET_CARD_ORACLE = """
WITH per_doc AS (
  SELECT source, lang, doc_id,
         len(string_split(text, ' ')) AS n_toks,
         n_chars,
         md5(text) AS text_hash
  FROM documents
),
base AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
         COUNT(DISTINCT lang) AS n_langs,
         FLOOR(SUM(n_chars) * 1.0 / COUNT(*) * 1000000.0 + 0.5) / 1000000.0
           AS avg_chars,
         FLOOR(SUM(CASE WHEN n_toks < 10 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
               * 1000000.0 + 0.5) / 1000000.0 AS short_frac
  FROM per_doc GROUP BY source
),
lang_rank AS (
  SELECT source, lang,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY COUNT(*) DESC, lang) AS rn
  FROM per_doc GROUP BY source, lang
),
dup AS (
  SELECT source,
         CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs
  FROM (SELECT source, text_hash, COUNT(*) AS c
        FROM per_doc GROUP BY source, text_hash)
  GROUP BY source
)
SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs, b.total_tokens,
       CAST(b.n_langs AS INT) AS n_langs, l.lang AS top_lang,
       b.avg_chars, b.short_frac,
       FLOOR(d.dup_docs * 1.0 / b.n_docs * 1000000.0 + 0.5) / 1000000.0
         AS dup_rate
FROM base b
JOIN (SELECT source, lang FROM lang_rank WHERE rn = 1) l ON l.source = b.source
JOIN dup d ON d.source = b.source
"""


@register("llm_dataset_card", oracle=_DATASET_CARD_ORACLE)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    from nedp_etl_spark.util import q6

    per_doc = d.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_toks"),
        F.md5("text").alias("text_hash"),
    )
    base = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        q6(F.sum("n_chars") * 1.0 / F.count(F.lit(1))).alias("avg_chars"),
        q6(
            F.sum(F.when(F.col("n_toks") < 10, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1))
        ).alias("short_frac"),
    )
    lr = (
        per_doc.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.col("c").desc(), "lang")
            ),
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    dup = (
        per_doc.groupBy("source", "text_hash")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("dup_docs")
        )
    )
    return (
        base.join(lr, "source")
        .join(dup, "source")
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "total_tokens",
            F.col("n_langs").cast("int").alias("n_langs"),
            "top_lang",
            "avg_chars",
            "short_frac",
            q6(F.col("dup_docs") * 1.0 / F.col("n_docs")).alias("dup_rate"),
        )
    )


# --------------------------------------------------------------------------
# llm_bpe_fertility — per-language tokenizer fertility under the
# TRAINED BPE merge table (llm_tokenizer_fertility is the merge-free
# length proxy; this is the real thing) (the multilingual-equity metric: languages the
# tokenizer splits into more pieces per word pay more sequence length per
# sentence — Ács 2019 / the XLM-R fertility analyses): pieces per word,
# chars per piece, and the fraction of words the tokenizer splits at all.
#
# Scale shape: identical to llm_bpe_encode — the merge fold runs on the
# DISTINCT VOCABULARY only; the corpus word stream joins the vocab-sized
# encode table (AQE broadcasts it) and rolls up per language.
# --------------------------------------------------------------------------


@register("llm_bpe_fertility", oracle=_bpe_fertility_oracle())
def llm_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 1)
        .distinct()
        .withColumn("syms", F.split("w", ""))
    )
    syms = F.col("syms")
    for a, b in _BPE_ENCODE_MERGES:
        syms = _merge_fold(syms, a, b)
    enc = vocab.select("w", F.size(syms).cast("bigint").alias("toks"))
    docw = d.select("lang", F.explode(F.split("text", " ")).alias("w")).filter(
        F.length("w") >= 1
    )
    from nedp_etl_spark.util import q6

    return (
        docw.join(enc, "w")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("toks").cast("bigint").alias("n_pieces"),
            q6(F.sum("toks") * 1.0 / F.count(F.lit(1))).alias("fertility"),
            q6(F.sum(F.length("w")) * 1.0 / F.sum("toks")).alias("chars_per_piece"),
            q6(
                F.sum(F.when(F.col("toks") > 1, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1))
            ).alias("split_word_frac"),
        )
    )


# --------------------------------------------------------------------------
# llm_paragraph_dedup — CCNet-style duplicated-paragraph REMOVAL (the
# transform, where llm_span_dedup is the audit): documents split into
# non-overlapping 20-token paragraphs; a paragraph occurrence survives
# only if it is the globally FIRST occurrence of its hash (ordered by
# (doc_id, position) — the CCNet keep-first convention); survivors
# reassemble in order into the cleaned text.  This is the boilerplate
# killer that removes repeated headers/footers/navigation across a crawl
# snapshot.  Reference parity: curation transforms reach the reference
# only as dbt-model SQL (dbtoperator.py:273-274).
#
# Scale shape: paragraphs explode map-side; the only shuffles are the
# hash-keyed first-occurrence aggregate (min of an encoded int64
# occurrence key — map-side combine) joined back by hash, and the per-doc
# reassembly aggregate.  Reassembly order comes from sort_array over the
# collected (position, paragraph) structs — per-doc arrays, never a
# window.  Occurrence keys encode (doc_id, position) as doc_id·2²⁰ + p
# (paragraph index < 2²⁰ = docs up to ~20M tokens; guarded by the 2²⁰
# cap being far beyond any real document).
# --------------------------------------------------------------------------

_PARA_W = 20

_PARA_DEDUP_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
paras AS (
  SELECT doc_id, CAST(p AS BIGINT) AS p,
         array_to_string(
           l[CAST(p * {_PARA_W} + 1 AS INT):CAST((p + 1) * {_PARA_W} AS INT)],
           ' ') AS para
  FROM (SELECT doc_id, l,
               unnest(generate_series(
                 0, CAST(CEIL(len(l) * 1.0 / {_PARA_W}) - 1 AS BIGINT))) AS p
        FROM t)
),
h AS (
  SELECT doc_id, p, para, md5(para) AS hh,
         doc_id * 1048576 + p AS okey
  FROM paras
),
first_occ AS (SELECT hh, MIN(okey) AS keeper FROM h GROUP BY hh),
kept AS (
  SELECT h.doc_id, h.p, h.para
  FROM h JOIN first_occ f ON f.hh = h.hh
  WHERE h.okey = f.keeper
)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN k.para IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       COALESCE(STRING_AGG(k.para, ' ' ORDER BY h.p), '') AS cleaned_text
FROM h
LEFT JOIN kept k ON k.doc_id = h.doc_id AND k.p = h.p
GROUP BY h.doc_id
"""


@register("llm_paragraph_dedup", oracle=_PARA_DEDUP_ORACLE)
def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("l"))
    n_paras = F.ceil(F.size("l") * 1.0 / _PARA_W).cast("bigint")
    paras = t.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_paras - 1)).alias("p"),
        "l",
    ).select(
        "doc_id",
        "p",
        F.concat_ws(
            " ", F.slice(F.col("l"), (F.col("p") * _PARA_W + 1).cast("int"), _PARA_W)
        ).alias("para"),
    )
    h = paras.select(
        "doc_id",
        "p",
        "para",
        F.md5("para").alias("hh"),
        (F.col("doc_id") * 1048576 + F.col("p")).alias("okey"),
    )
    first_occ = h.groupBy("hh").agg(F.min("okey").alias("keeper"))
    kept = (
        h.join(first_occ, "hh")
        .filter(F.col("okey") == F.col("keeper"))
        .select("doc_id", "p", F.col("para").alias("kpara"))
    )
    joined = h.join(kept, ["doc_id", "p"], "left")
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras"),
        F.sum(F.when(F.col("kpara").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kpara").isNotNull(),
                                F.struct(F.col("p"), F.col("kpara").alias("para")),
                            )
                        )
                    ),
                    lambda s: s["para"],
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )


# --------------------------------------------------------------------------
# llm_ngram_entropy_rate — corpus-level Shannon statistics: unigram
# entropy H(W), bigram conditional entropy H(W₂|W₁) = −Σ p(w₁,w₂)·
# ln(c₁₂/c₁), and the corresponding perplexities — the classic
# "information rate" readout that tracks corpus repetitiveness across
# snapshots (a dedup/boilerplate regression shows up as a falling
# entropy rate before any manual inspection finds it).  Complements the
# per-document scoring keys (llm_unigram_logprob / llm_bigram_logprob)
# with one corpus-level row.  The reference reaches corpus statistics
# only as dbt-model SQL (dbtoperator.py:273-274).
#
# Determinism: counts are exact int64; each entropy term quantizes to
# 1e-9 int64 units before its sum (order-free); EXP passes q6.  Scale:
# bigrams build map-side (the ngram_topk transform idiom); the only
# shuffles are the two count aggregates; 1-row totals broadcast
# (allowlisted).
# --------------------------------------------------------------------------

_ENTROPY_RATE_ORACLE = """
WITH t AS (SELECT string_split(text, ' ') AS l FROM documents),
bi AS (
  SELECT l[CAST(i AS INT)] AS w1, l[CAST(i + 1 AS INT)] AS w2
  FROM (SELECT l, unnest(generate_series(1, CAST(len(l) - 1 AS BIGINT))) AS i
        FROM t)
),
c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
nb AS (SELECT CAST(SUM(c12) AS BIGINT) AS n FROM c12),
hc AS (
  SELECT CAST(SUM(CAST(FLOOR(-(CAST(c12.c12 AS DOUBLE) / nb.n)
                 * LN(CAST(c12.c12 AS DOUBLE) / c1.c1)
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq
  FROM c12 JOIN c1 ON c1.w1 = c12.w1 CROSS JOIN nb
),
uni AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS cu
  FROM (SELECT unnest(l) AS g FROM t) GROUP BY g
),
nu AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM uni),
hu AS (
  SELECT CAST(SUM(CAST(FLOOR(-(CAST(cu AS DOUBLE) / nu.n)
                 * LN(CAST(cu AS DOUBLE) / nu.n)
                 * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS hq
  FROM uni CROSS JOIN nu
)
SELECT nb.n AS n_bigrams,
       FLOOR(hu.hq / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS h_unigram,
       FLOOR(hc.hq / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0
         AS h_bigram_cond,
       FLOOR(EXP(hc.hq / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0
         AS perplexity_rate
FROM nb CROSS JOIN hc CROSS JOIN hu
"""


@register("llm_ngram_entropy_rate", oracle=_ENTROPY_RATE_ORACLE)
def llm_ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("l"))
    bi = d.select(
        F.explode(
            F.transform(
                F.slice(F.col("l"), 1, F.greatest(F.size("l") - 1, F.lit(0))),
                lambda x, i: F.struct(
                    x.alias("w1"), F.element_at(F.col("l"), i + 2).alias("w2")
                ),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c12 = bi.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c12")
    ).localCheckpoint(eager=True)  # vocabulary²-bounded; 3 consumers
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    nb = c12.agg(F.sum("c12").cast("bigint").alias("n"))
    q9 = lambda c: F.floor(c * 1_000_000_000.0 + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    hc = (
        c12.join(c1, "w1")
        .crossJoin(F.broadcast(nb))
        .agg(
            F.sum(
                q9(
                    -(F.col("c12").cast("double") / F.col("n"))
                    * F.log(F.col("c12").cast("double") / F.col("c1"))
                )
            )
            .cast("bigint")
            .alias("hcq")
        )
    )
    uni = d.select(F.explode("l").alias("g")).groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("cu")
    ).localCheckpoint(eager=True)  # vocabulary-bounded; 2 consumers
    nu = uni.agg(F.sum("cu").cast("bigint").alias("n"))
    hu = (
        uni.crossJoin(F.broadcast(nu))
        .agg(
            F.sum(
                q9(
                    -(F.col("cu").cast("double") / F.col("n"))
                    * F.log(F.col("cu").cast("double") / F.col("n"))
                )
            )
            .cast("bigint")
            .alias("huq")
        )
    )
    q6c = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    return (
        nb.crossJoin(F.broadcast(hc))
        .crossJoin(F.broadcast(hu))
        .select(
            F.col("n").alias("n_bigrams"),
            q6c(F.col("huq") / 1_000_000_000.0).alias("h_unigram"),
            q6c(F.col("hcq") / 1_000_000_000.0).alias("h_bigram_cond"),
            q6c(F.exp(F.col("hcq") / 1_000_000_000.0)).alias("perplexity_rate"),
        )
    )


# --------------------------------------------------------------------------
# llm_corpus_overlap_sketch — source-pair content overlap from K-minimum-
# values sketches (Beyer et al. 2007; the Dolma/CC corpus-overlap recipe):
# per source, the K lexicographically smallest distinct 5-token shingle
# md5s form the sketch; the pairwise Jaccard ESTIMATE is the fraction of
# the union-re-ranked K smallest that appear in both sketches.  The point
# at 100 TB: corpora are NEVER joined — each is scanned once into a K-row
# artifact, and all pair math runs on (#sources² × K) sketch rows.  The
# exact-Jaccard column is the fixture-scale QA readout pricing the
# estimate (the llm_ann_recall sketch-vs-truth pattern).
#
# Determinism: md5 order is total; ROW_NUMBER ties cannot occur (distinct
# hashes); estimates and exacts quantize q6 identically on both engines.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_KMV_K = 128
_KMV_W = 5

_KMV_ORACLE = f"""
WITH t AS (SELECT source, string_split(text, ' ') AS l FROM documents),
sh AS (
  SELECT DISTINCT source,
         md5(array_to_string(l[CAST(i AS INT):CAST(i + {_KMV_W - 1} AS INT)], ' ')) AS h
  FROM (SELECT source, l,
               unnest(generate_series(1, CAST(len(l) - {_KMV_W} + 1 AS BIGINT))) AS i
        FROM t WHERE len(l) >= {_KMV_W})
),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM sh) WHERE rn <= {_KMV_K}
),
srcs AS (SELECT DISTINCT source FROM sh),
pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM srcs a JOIN srcs b ON a.source < b.source
),
tagged AS (
  SELECT p.sa, p.sb, s.h, 1 AS in_a, 0 AS in_b
  FROM pairs p JOIN sk s ON s.source = p.sa
  UNION ALL
  SELECT p.sa, p.sb, s.h, 0 AS in_a, 1 AS in_b
  FROM pairs p JOIN sk s ON s.source = p.sb
),
u AS (
  SELECT sa, sb, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM tagged GROUP BY sa, sb, h
),
ur AS (
  SELECT sa, sb, in_a, in_b,
         ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
  FROM u
),
est AS (
  SELECT sa, sb,
         CAST(COUNT(*) AS BIGINT) AS k_used,
         CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_both
  FROM ur WHERE rn <= {_KMV_K} GROUP BY sa, sb
),
sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS ni
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT e.sa AS source_a, e.sb AS source_b, e.k_used,
       FLOOR(e.n_both * 1.0 / e.k_used * 1000000.0 + 0.5) / 1000000.0
         AS est_jaccard,
       FLOOR(COALESCE(i.ni, 0) * 1.0
             / (x.n + y.n - COALESCE(i.ni, 0)) * 1000000.0 + 0.5) / 1000000.0
         AS exact_jaccard
FROM est e
JOIN sizes x ON x.source = e.sa
JOIN sizes y ON y.source = e.sb
LEFT JOIN inter i ON i.sa = e.sa AND i.sb = e.sb
"""


@register("llm_corpus_overlap_sketch", oracle=_KMV_ORACLE)
def llm_corpus_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("source", F.split("text", " ").alias("l")).filter(
        F.size("l") >= _KMV_W
    )
    sh = (
        toks.select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - _KMV_W + 1),
                    lambda i: F.md5(F.concat_ws(" ", F.slice("l", i, _KMV_W))),
                )
            ).alias("h"),
        )
        .distinct()
        # feeds the sketch, the sizes aggregate, and BOTH sides of the
        # exact-intersection join
        .localCheckpoint(eager=False)
    )
    rn = F.row_number().over(Window.partitionBy("source").orderBy("h"))
    sk = sh.withColumn("rn", rn).filter(F.col("rn") <= _KMV_K).drop("rn")
    srcs = sh.select("source").distinct()
    # #sources² pair spine: tiny theta self-join (10 × 10 at any sf; the
    # source list is dimension-sized, never corpus-sized)
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
    )
    tagged = (
        pairs.join(sk.withColumnRenamed("source", "sa"), "sa")
        .select("sa", "sb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionAll(
            pairs.join(sk.withColumnRenamed("source", "sb"), "sb")
            .select("sa", "sb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
    )
    u = tagged.groupBy("sa", "sb", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    urn = F.row_number().over(Window.partitionBy("sa", "sb").orderBy("h"))
    est = (
        u.withColumn("rn", urn)
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("k_used"),
            F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int"))
            .cast("bigint")
            .alias("n_both"),
        )
    )
    sizes = sh.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    inter = (
        sh.alias("x")
        .join(
            sh.alias("y"),
            (F.col("x.h") == F.col("y.h")) & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(F.col("x.source").alias("sa"), F.col("y.source").alias("sb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ni"))
    )
    q6 = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    return (
        est.join(sizes.withColumnRenamed("source", "sa").withColumnRenamed("n", "na"), "sa")
        .join(sizes.withColumnRenamed("source", "sb").withColumnRenamed("n", "nb"), "sb")
        .join(inter, ["sa", "sb"], "left")
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            "k_used",
            q6(F.col("n_both") * 1.0 / F.col("k_used")).alias("est_jaccard"),
            q6(
                F.coalesce(F.col("ni"), F.lit(0))
                * 1.0
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("ni"), F.lit(0)))
            ).alias("exact_jaccard"),
        )
    )


# --------------------------------------------------------------------------
# llm_topic_segments — lexical-cohesion topic segmentation (TextTiling,
# Hearst 1997, in its block-comparison form): slice each document into
# 10-token blocks, score adjacent blocks by token-set Jaccard, and call a
# topic boundary wherever cohesion drops below τ — the
# chunk-by-TOPIC preprocessor for RAG indexing and long-document packing
# (llm_chunking cuts at fixed offsets; this cuts where the vocabulary
# actually shifts).
#
# Scale shape: tokens explode map-side into (doc, block, token) distinct
# rows; adjacent-block scoring is an equi-join on (doc, block+1) plus
# per-(doc, block) size aggregates — work ∝ corpus tokens, never
# pairwise across documents.
#
# Parity: exact integer intersection/union counts; Jaccard q6; the
# boundary threshold is a shared literal; single-block documents emit
# zero boundaries and cohesion NULL.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SEG_BLOCK = 10
_SEG_TAU = 0.2

_TOPIC_SEG_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, t.i - 1 AS idx, string_split(text, ' ')[CAST(t.i AS INT)] AS w
  FROM documents, UNNEST(range(1, len(string_split(text, ' ')) + 1)) t(i)
  WHERE doc_id < 300
),
blk AS (
  SELECT DISTINCT doc_id, CAST(FLOOR(idx / {_SEG_BLOCK}) AS BIGINT) AS b, w
  FROM tok
),
sz AS (
  SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS n FROM blk GROUP BY doc_id, b
),
inter AS (
  SELECT a.doc_id, a.b,
         CAST(COUNT(*) AS BIGINT) AS i
  FROM blk a JOIN blk c ON c.doc_id = a.doc_id AND c.b = a.b + 1 AND c.w = a.w
  GROUP BY a.doc_id, a.b
),
adj AS (
  SELECT sa.doc_id, sa.b,
         FLOOR(COALESCE(i.i, 0) * 1.0
               / (sa.n + sb.n - COALESCE(i.i, 0)) * 1000000.0 + 0.5)
           / 1000000.0 AS jac
  FROM sz sa
  JOIN sz sb ON sb.doc_id = sa.doc_id AND sb.b = sa.b + 1
  LEFT JOIN inter i ON i.doc_id = sa.doc_id AND i.b = sa.b
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(CASE WHEN jac < {_SEG_TAU} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boundaries,
         FLOOR(CAST(SUM(CAST(FLOOR(jac * 1000000.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / COUNT(*) / 1000000.0 * 1000000.0 + 0.5)
           / 1000000.0 AS mean_cohesion
  FROM adj GROUP BY doc_id
),
nb AS (
  SELECT doc_id, CAST(COUNT(DISTINCT b) AS BIGINT) AS n_blocks FROM blk
  GROUP BY doc_id
)
SELECT nb.doc_id, nb.n_blocks,
       COALESCE(a.n_boundaries, 0) AS n_boundaries,
       COALESCE(a.n_boundaries, 0) + 1 AS n_segments,
       a.mean_cohesion
FROM nb LEFT JOIN agg a ON a.doc_id = nb.doc_id
"""


@register("llm_topic_segments", oracle=_TOPIC_SEG_ORACLE)
def llm_topic_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    tok = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("idx", "w"),
    )
    blk = tok.select(
        "doc_id",
        F.floor(F.col("idx") / _SEG_BLOCK).cast("bigint").alias("b"),
        "w",
    ).distinct().localCheckpoint(eager=True)  # sizes + both join sides
    sz = blk.groupBy("doc_id", "b").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nxt = blk.select("doc_id", (F.col("b") - 1).alias("b"), F.col("w"))
    inter = (
        blk.join(nxt, ["doc_id", "b", "w"])
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    sb = sz.select("doc_id", (F.col("b") - 1).alias("b"), F.col("n").alias("nb"))
    adj = (
        sz.join(sb, ["doc_id", "b"])
        .join(inter, ["doc_id", "b"], "left")
        .select(
            "doc_id",
            "b",
            (
                F.floor(
                    F.coalesce(F.col("i"), F.lit(0))
                    * 1.0
                    / (F.col("n") + F.col("nb") - F.coalesce(F.col("i"), F.lit(0)))
                    * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("jac"),
        )
    )
    agg = adj.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.sum(F.when(F.col("jac") < _SEG_TAU, 1).otherwise(0))
        .cast("bigint")
        .alias("n_boundaries"),
        (
            F.floor(
                F.sum(F.floor(F.col("jac") * 1_000_000.0 + F.lit(0.5)).cast("bigint"))
                .cast("double")
                / F.count(F.lit(1))
                / 1_000_000.0
                * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("mean_cohesion"),
    )
    nb = blk.groupBy("doc_id").agg(
        F.countDistinct("b").cast("bigint").alias("n_blocks")
    )
    return nb.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_blocks",
        F.coalesce(F.col("n_boundaries"), F.lit(0)).cast("bigint").alias(
            "n_boundaries"
        ),
        (F.coalesce(F.col("n_boundaries"), F.lit(0)) + 1)
        .cast("bigint")
        .alias("n_segments"),
        "mean_cohesion",
    )
