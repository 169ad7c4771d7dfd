"""Corpus ranking / n-gram statistics for LLM training-data pipelines:
TF-IDF term extraction, BM25 retrieval scoring, corpus-wide top-k n-grams.

All plain DataFrame compositions over ``documents``.  Scale shape: token
explode is map-side; the only shuffles are the (doc, term) / term
aggregates; corpus scalars (N, avgdl) are 1-row broadcasts — a
BroadcastNestedLoopJoin against one row is O(n) and the correct plan, and
the plan audit whitelists these two queries for exactly that reason.

Determinism: every score is rounded to 6 dp before it participates in
ordering or summation, and double sums go through the decimal accumulator
(``util.dsum``), so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, histogram_rank_walk, osum

# --------------------------------------------------------------------------
# llm_tfidf — top-3 TF-IDF terms per document (smoothed idf), for a stable
# probe subset of docs; document frequencies computed over the full corpus.
# --------------------------------------------------------------------------

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln((n.n_docs + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
  WHERE tf.doc_id < 50
)
SELECT doc_id, term, tfidf, rank
FROM (SELECT scored.*,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rank
      FROM scored)
WHERE rank <= 3
"""


@register("llm_tfidf", oracle=_TFIDF_ORACLE)
def llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 50)
        # dfreq is vocabulary-sized (unbounded at corpus scale): plain
        # shuffle join on term; AQE broadcasts it at runtime iff small.
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


# --------------------------------------------------------------------------
# llm_bm25 — Okapi BM25 (k1=1.2, b=0.75) for a fixed query term set,
# top-20 documents.  Per-term partial scores are rounded to 6 dp and summed
# through the decimal accumulator so the 2-3-addend sum is order-free.
# --------------------------------------------------------------------------

_BM25_QTERMS = ("spark", "query", "join")

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
stats AS (
  SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, COUNT(*) AS n_docs FROM dl
),
parts AS (
  SELECT tf.doc_id,
         ROUND(
           ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)), 6) AS s
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats
  WHERE tf.term IN ('spark', 'query', 'join')
)
SELECT doc_id, ROUND({osum('s')}, 6) AS bm25
FROM parts GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 20
"""


@register("llm_bm25", oracle=_BM25_ORACLE)
def llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = toks.distinct().groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") + 1.2 * (1 - 0.75 + 0.75 * F.col("dl") / F.col("avgdl"))
    part = F.round(idf * F.col("tf") * 2.2 / norm, 6)
    return (
        tf.filter(F.col("term").isin(*_BM25_QTERMS))
        # vocabulary-sized dfreq: no broadcast hint (see llm_tfidf)
        .join(dfreq, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", part.alias("s"))
        .groupBy("doc_id")
        .agg(F.round(dsum("s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# llm_ngram_topk — corpus-wide top-25 bigrams.  Spark side builds bigrams
# entirely map-side (higher-order transform over the token array — no
# per-doc window shuffle); the only shuffle is the final bigram count.
# The oracle spells the same bigrams with the positional-unnest idiom.
# --------------------------------------------------------------------------

_NGRAM_TOPK_ORACLE = """
WITH t AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
b AS (
  SELECT term || ' ' || LEAD(term) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM t
)
SELECT bigram, COUNT(*) AS n
FROM b WHERE bigram IS NOT NULL
GROUP BY bigram
ORDER BY n DESC, bigram
LIMIT 25
"""


@register("llm_ngram_topk", oracle=_NGRAM_TOPK_ORACLE)
def llm_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # Materialize the token array first: a lambda that re-referenced
    # split(...) would re-evaluate it per element (see memory note on
    # F.transform lambda arity — two-param lambdas receive (element, index)).
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("t"), i + 2)),
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(25)
    )


# --------------------------------------------------------------------------
# llm_unigram_logprob — unigram language-model scoring (the classic cheap
# quality filter): p(w) estimated on the full corpus, each probe document
# scored by its mean token log-probability.  Per-token log-probs are rounded
# to 6 dp before the decimal-accumulator sum, so the mean is order-free and
# engine-identical.  The corpus-LM block is shared with
# llm_perplexity_buckets (``_lm_token_logprobs`` / ``_LM_CTES``) so the
# scoring contract cannot drift between the two operators.
# --------------------------------------------------------------------------

_LM_CTES = """toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
counts AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY term),
total AS (SELECT COUNT(*) AS n_tokens FROM toks),
probs AS (
  SELECT term, ROUND(ln(cnt * 1.0 / total.n_tokens), 6) AS lp
  FROM counts CROSS JOIN total
)"""


def _lm_token_logprobs(d: DataFrame):
    """(toks, probs): the exploded (doc_id, term) stream and the 6-dp
    rounded corpus unigram log-probability per term — the Spark twin of
    ``_LM_CTES``."""
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    total = toks.agg(F.count(F.lit(1)).alias("n_tokens_corpus"))
    probs = counts.crossJoin(F.broadcast(total)).select(
        "term",
        F.round(F.log(F.col("cnt") * 1.0 / F.col("n_tokens_corpus")), 6).alias("lp"),
    )
    return toks, probs


_UNIGRAM_ORACLE = f"""
WITH {_LM_CTES}
SELECT toks.doc_id,
       COUNT(*) AS n_tokens,
       ROUND({osum('probs.lp')} / COUNT(*), 6) AS avg_logprob
FROM toks JOIN probs ON toks.term = probs.term
WHERE toks.doc_id < 100
GROUP BY toks.doc_id
"""


@register("llm_unigram_logprob", oracle=_UNIGRAM_ORACLE)
def llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks, probs = _lm_token_logprobs(d)
    return (
        toks.filter(F.col("doc_id") < 100)
        # probs is vocabulary-sized: plain shuffle join, AQE decides
        .join(probs, "term")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(dsum("lp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------------------
# llm_perplexity_buckets — CCNet-style quality bucketing (Wenzek et al.,
# "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
# Data", 2019): score every document by mean token log-probability under
# the corpus unigram LM, then split the corpus into head / middle / tail
# terciles of that score (head = least perplexed = highest quality).
#
# The scale-critical step is the tercile CUTOFFS.  percentile_cont over
# per-doc scores buffers every score in one aggregation buffer (fatal at
# 10^10 docs), and ntile() is a corpus-wide single-partition window — both
# rejected.  Instead the cutoffs are EXACT k-th-smallest values found by
# the two-phase histogram refinement of agg_percentile_histogram
# (operators/analytics.py): a min/max pre-pass fixes the bucket width so
# the histogram is <=256 buckets BY CONSTRUCTION, the driver walks the
# bounded (bucket, count) table to the bucket holding each target rank,
# and a second pass ranks only that bucket's occupants (~n/256 rows for
# roughly-spread scores; a bucket above _PPL_REFINE_THRESH is
# histogrammed recursively until window-safe — see _tercile_cuts).
# The two cutoff VALUES then flow back as a broadcast 1-row relation and
# the bucket label is a pure map-side CASE — so the corpus is never
# globally sorted and no window ever sees more than one histogram
# bucket per cut.  Scores are localCheckpoint-ed: four downstream
# consumers (min/max, histogram, refinement, labeling) reuse the one
# corpus-LM scoring pass instead of re-running the explode+join lineage.
#
# Tie semantics are value-based (score >= cutoff), so both engines agree
# even when many docs share a rounded score; k-th-smallest VALUE is
# well-defined under ties.
# Reference parity: quality filtering reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PPL_B = 256  # histogram bucket count — fixed by construction

# Refinement-window bound: a phase-2 ranking window may hold at most this
# many rows in one partition.  When a target bucket's occupancy exceeds it
# (a concentrated distribution piling most of the corpus into one 6-dp
# sliver — the round-5 advisory's hazard), the walk histograms THAT bucket
# one level deeper instead of sorting it whole; each level splits the value
# range 256x, so a 6-dp-rounded score space collapses to a single value
# within a handful of levels.  Roughly-uniform corpora never recurse
# (occupancy ~ n/256), so the common path is unchanged.
_PPL_REFINE_THRESH = 65536

_PPL_BUCKETS_ORACLE = f"""
WITH {_LM_CTES},
scores AS (
  SELECT toks.doc_id, COUNT(*) AS n_tokens,
         ROUND({osum('probs.lp')} / COUNT(*), 6) AS avg_logprob
  FROM toks JOIN probs ON toks.term = probs.term
  GROUP BY toks.doc_id
),
ranked AS (
  SELECT avg_logprob AS s,
         ROW_NUMBER() OVER (ORDER BY avg_logprob) AS rn,
         COUNT(*) OVER () AS n
  FROM scores
),
cuts AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(n / 3.0) AS BIGINT) THEN s END) AS c1,
         MAX(CASE WHEN rn = CAST(CEIL(2 * n / 3.0) AS BIGINT) THEN s END) AS c2
  FROM ranked
)
SELECT doc_id, n_tokens, avg_logprob,
       CASE WHEN avg_logprob >= c2 THEN 'head'
            WHEN avg_logprob >= c1 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM scores CROSS JOIN cuts
"""


def _bucket_expr(lo: float, width: float):
    """Clamped 256-way bucket index for ``v`` over [lo, lo + 256*width].

    greatest(0)/least(B-1): a value can sit an ULP outside its parent
    bucket's recomputed bounds (floor((v-lo)/width) vs lo + b*width don't
    commute in floats), so deeper levels must clamp both ends."""
    return F.greatest(
        F.least(
            F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(_PPL_B - 1),
        ),
        F.lit(0),
    )


def _rank_histogram(li: DataFrame, pred, lo: float, hi: float, rank: int):
    """One histogram level: bucket ``li.v`` under ``pred`` 256 ways and walk
    to ``rank``.  Returns (pred', lo', hi', k, occupancy) narrowing to the
    rank's bucket.  Only the bounded (bucket, count) table reaches the
    driver — never a data value."""
    width = (hi - lo) / _PPL_B
    bexpr = _bucket_expr(lo, width)
    hist = sorted(
        (r["b"], r["c"])
        for r in li.filter(pred)
        .groupBy(bexpr.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )  # bounded: <=256 rows BY CONSTRUCTION (the llm_kmeans collect pattern)
    b, k = histogram_rank_walk(hist, rank)
    occ = dict(hist)[b]
    blo = lo + b * width
    bhi = hi if b == _PPL_B - 1 else lo + (b + 1) * width
    return pred & (bexpr == F.lit(b)), blo, bhi, k, occ


def exact_rank_values(
    spark: SparkSession, li: DataFrame, names: list, rank_fns: list
) -> DataFrame:
    """1-row DataFrame of exact k-th-smallest values of column ``v``.

    ``names[i]`` is the output column for the rank ``rank_fns[i](n)``
    (each fn maps the total row count n to a 1-based rank).  This is the
    generalized core of the perplexity-tercile refinement — shared by
    ``_tercile_cuts`` (2 ranks) and ``operators.analytics``'s RFM
    quintiles (4 ranks/metric), so the histogram-walk arithmetic cannot
    drift between consumers.

    Concentrated-distribution guard (round-5 advisory): if a target
    bucket's occupancy exceeds ``_PPL_REFINE_THRESH``, that bucket is
    histogrammed one level deeper (repeatedly, if needed) before any
    ranking window runs, so the phase-2 window partition is bounded no
    matter how the values are distributed.  A bucket that collapses to a
    single value (lo == hi) pins the rank's value with no window at all.
    Only bounded (bucket, count) tables reach the driver — never a data
    value (the llm_kmeans collect discipline)."""
    schema = ", ".join(f"{c} double" for c in names)
    lo, hi = li.agg(F.min("v"), F.max("v")).first()
    if lo is None:  # empty input: all ranks undefined
        return spark.createDataFrame([tuple(None for _ in names)], schema)
    if lo == hi:
        # Fully degenerate distribution: every rank's value IS that value.
        return spark.createDataFrame([tuple(lo for _ in names)], schema)
    # Level-1 histogram is shared by all cuts: ONE pass over the input.
    width = (hi - lo) / _PPL_B
    b0 = _bucket_expr(lo, width)
    hist = sorted(
        (r["b"], r["c"])
        for r in li.groupBy(b0.alias("b")).agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n = sum(c for _, c in hist)
    cut_specs = []  # (cut_id, pred, k) needing a window | (cut_id, value)
    for cut_id, rank in enumerate(fn(n) for fn in rank_fns):
        b, k = histogram_rank_walk(hist, rank)
        occ = dict(hist)[b]
        pred = b0 == F.lit(b)
        blo = lo + b * width
        bhi = hi if b == _PPL_B - 1 else lo + (b + 1) * width
        value = None
        while occ > _PPL_REFINE_THRESH:
            if blo == bhi:  # bucket is one value: rank's value is pinned
                value = blo
                break
            pred, blo, bhi, k, occ = _rank_histogram(li, pred, blo, bhi, k)
        cut_specs.append((cut_id, value) if value is not None else (cut_id, pred, k))
    # Each surviving cut ranks ONE window-safe bucket's occupants: keyed
    # window, never a corpus-wide sort.
    cut_rows = None
    win_parts = [s for s in cut_specs if len(s) == 3]
    if win_parts:
        cand = None
        for cut_id, pred, k in win_parts:
            part = li.filter(pred).select(
                F.lit(cut_id).alias("cut_id"), "v", F.lit(k).alias("k")
            )
            cand = part if cand is None else cand.unionAll(part)
        w = Window.partitionBy("cut_id").orderBy("v")
        cut_rows = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == F.col("k"))
            .select("cut_id", "v")
        )
    for cut_id, value in (s for s in cut_specs if len(s) == 2):
        lit_row = spark.createDataFrame([(cut_id, float(value))], "cut_id int, v double")
        cut_rows = lit_row if cut_rows is None else cut_rows.unionAll(lit_row)
    return cut_rows.agg(
        *[
            F.max(F.when(F.col("cut_id") == i, F.col("v"))).alias(c)
            for i, c in enumerate(names)
        ]
    )


def _tercile_cuts(spark: SparkSession, scores: DataFrame) -> DataFrame:
    """1-row DataFrame (c1, c2): exact k-th-smallest ``avg_logprob`` at
    ranks ceil(n/3) and ceil(2n/3) — see :func:`exact_rank_values`."""
    return exact_rank_values(
        spark,
        scores.select(F.col("avg_logprob").alias("v")),
        ["c1", "c2"],
        [lambda n: -(-n // 3), lambda n: -(-(2 * n) // 3)],
    )


@register("llm_perplexity_buckets", oracle=_PPL_BUCKETS_ORACLE)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks, probs = _lm_token_logprobs(d)
    scores = (
        toks.join(probs, "term")  # vocabulary-sized: plain shuffle join
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(dsum("lp") / F.count(F.lit(1)), 6).alias("avg_logprob"),
        )
        .localCheckpoint(eager=True)  # one scoring pass, four consumers
    )
    cuts = _tercile_cuts(spark, scores)
    return scores.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "n_tokens",
        "avg_logprob",
        F.when(F.col("avg_logprob") >= F.col("c2"), "head")
        .when(F.col("avg_logprob") >= F.col("c1"), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )
