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

from nedp_etl_spark.data import load, local_rows
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
        return local_rows(spark, [tuple(None for _ in names)], schema)
    if lo == hi:
        # Fully degenerate distribution: every rank's value IS that value.
        return local_rows(spark, [tuple(lo for _ in names)], schema)
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
        lit_row = local_rows(spark, [(cut_id, float(value))], "cut_id int, v double")
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


# --------------------------------------------------------------------------
# llm_rouge_overlap — ROUGE-1/ROUGE-2 multiset n-gram overlap between
# deterministic document pairs (each even doc_id is the reference, the
# following odd doc_id the candidate) — the standard summarization /
# generation-eval metric, run at corpus scale the way an eval harness
# scores model outputs against references.  Multiset semantics: each
# n-gram contributes min(count_cand, count_ref) to the overlap, and
# F1 = 2·ov / (n_cand + n_ref) (equivalent to the harmonic mean of the
# clipped precision/recall).  The reference reaches eval scoring only as
# dbt-model SQL (dbtoperator.py:273-274).
#
# Scale shape: n-grams are built map-side (the llm_ngram_topk transform
# idiom), collapse to per-(doc, gram) counts, and the overlap is ONE
# equi-join keyed on (pair, gram) — no per-pair nested loop; totals are
# per-doc aggregates joined back by pair key.  All counts are exact
# int64; the final ratios pass the q6 FLOOR quantize.
# --------------------------------------------------------------------------

_ROUGE_ORACLE = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pairs AS (
  SELECT r.doc_id AS ref_id, c.doc_id AS cand_id,
         CAST(len(r.l) AS BIGINT) AS n1_ref, CAST(len(c.l) AS BIGINT) AS n1_cand,
         CAST(GREATEST(len(r.l) - 1, 0) AS BIGINT) AS n2_ref,
         CAST(GREATEST(len(c.l) - 1, 0) AS BIGINT) AS n2_cand
  FROM d r JOIN d c ON c.doc_id = r.doc_id + 1
  WHERE r.doc_id % 2 = 0
),
uc AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(l) AS g FROM d) GROUP BY doc_id, g
),
bc AS (
  SELECT doc_id, g, COUNT(*) AS c
  FROM (SELECT doc_id, l[CAST(i AS INT)] || ' ' || l[CAST(i + 1 AS INT)] AS g
        FROM (SELECT doc_id, l,
                     unnest(generate_series(1, CAST(len(l) - 1 AS BIGINT))) AS i
              FROM d))
  GROUP BY doc_id, g
),
ov1 AS (
  SELECT p.ref_id, CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov
  FROM pairs p
  JOIN uc a ON a.doc_id = p.cand_id
  JOIN uc b ON b.doc_id = p.ref_id AND b.g = a.g
  GROUP BY p.ref_id
),
ov2 AS (
  SELECT p.ref_id, CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS ov
  FROM pairs p
  JOIN bc a ON a.doc_id = p.cand_id
  JOIN bc b ON b.doc_id = p.ref_id AND b.g = a.g
  GROUP BY p.ref_id
)
SELECT p.ref_id, p.cand_id,
       CAST(COALESCE(ov1.ov, 0) AS BIGINT) AS ov1,
       FLOOR(2.0 * COALESCE(ov1.ov, 0) / (p.n1_cand + p.n1_ref)
             * 1000000.0 + 0.5) / 1000000.0 AS rouge1_f,
       CAST(COALESCE(ov2.ov, 0) AS BIGINT) AS ov2,
       CASE WHEN p.n2_cand + p.n2_ref = 0 THEN NULL
            ELSE FLOOR(2.0 * COALESCE(ov2.ov, 0) / (p.n2_cand + p.n2_ref)
                       * 1000000.0 + 0.5) / 1000000.0 END AS rouge2_f
FROM pairs p
LEFT JOIN ov1 ON ov1.ref_id = p.ref_id
LEFT JOIN ov2 ON ov2.ref_id = p.ref_id
"""


@register("llm_rouge_overlap", oracle=_ROUGE_ORACLE)
def llm_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("l")
    )
    pairs = (
        d.filter(F.col("doc_id") % 2 == 0)
        .alias("r")
        .join(d.alias("c"), F.col("c.doc_id") == F.col("r.doc_id") + 1)
        .select(
            F.col("r.doc_id").alias("ref_id"),
            F.col("c.doc_id").alias("cand_id"),
            F.size("r.l").cast("bigint").alias("n1_ref"),
            F.size("c.l").cast("bigint").alias("n1_cand"),
            F.greatest(F.size("r.l") - 1, F.lit(0)).cast("bigint").alias("n2_ref"),
            F.greatest(F.size("c.l") - 1, F.lit(0)).cast("bigint").alias("n2_cand"),
        )
        .localCheckpoint(eager=True)  # one pair derivation, 3 consumers
    )
    uc = (
        d.select("doc_id", F.explode("l").alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bg = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice(F.col("l"), 1, F.size("l") - 1),
                lambda x, i: F.concat_ws(" ", x, F.element_at(F.col("l"), i + 2)),
            )
        ).alias("g"),
    )
    bc = bg.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))

    def _overlap(counts: DataFrame) -> DataFrame:
        a = counts.select(
            F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("ca")
        )
        b = counts.select(F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("cb"))
        return (
            pairs.select("ref_id", "cand_id")
            .join(a, "cand_id")
            .join(b, ["ref_id", "g"])
            .groupBy("ref_id")
            .agg(F.sum(F.least("ca", "cb")).cast("bigint").alias("ov"))
        )

    o1 = _overlap(uc).withColumnRenamed("ov", "_ov1")
    o2 = _overlap(bc).withColumnRenamed("ov", "_ov2")
    ov1 = F.coalesce(F.col("_ov1"), F.lit(0))
    ov2 = F.coalesce(F.col("_ov2"), F.lit(0))
    return (
        pairs.join(o1, "ref_id", "left")
        .join(o2, "ref_id", "left")
        .select(
            "ref_id",
            "cand_id",
            ov1.cast("bigint").alias("ov1"),
            (
                F.floor(
                    2.0 * ov1 / (F.col("n1_cand") + F.col("n1_ref")) * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("rouge1_f"),
            ov2.cast("bigint").alias("ov2"),
            F.when(
                F.col("n2_cand") + F.col("n2_ref") == 0, F.lit(None).cast("double")
            )
            .otherwise(
                F.floor(
                    2.0 * ov2 / (F.col("n2_cand") + F.col("n2_ref")) * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            )
            .alias("rouge2_f"),
        )
    )


# --------------------------------------------------------------------------
# llm_cooccurrence_pmi — pointwise mutual information of token
# co-occurrence within a forward window of 2, restricted to the top-50
# unigram vocabulary: PMI(x,y) = ln(c_xy·N / (c_x·c_y)) over the
# restricted skip-gram pair distribution — the classic distributional-
# semantics signal (collocation mining, embedding-quality QA, phrase
# detection) a corpus pipeline publishes per snapshot.  The reference
# reaches corpus statistics only as dbt-model SQL (dbtoperator.py:273-274).
#
# Scale shape: skip-gram pairs are built map-side from the token array
# (distances 1 and 2 — the ngram_topk transform idiom); the top-50 vocab
# is a bounded global top-k (TakeOrdered, never a full sort) broadcast
# onto the pair stream as a semi-join filter; marginals and the pair
# count are keyed aggregates of the FILTERED pairs (≤ 50×50 keys); the
# 1-row N total is an allowlisted broadcast.  Counts stay exact int64;
# ln() runs on identical exact ratios and passes the q6 FLOOR quantize.
# --------------------------------------------------------------------------

_PMI_V = 50      # vocabulary cap — pair domain bounded by V²
_PMI_MIN_C = 3   # min pair support in the output

_PMI_ORACLE = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
uni AS (
  SELECT g, COUNT(*) AS n
  FROM (SELECT unnest(l) AS g FROM d) GROUP BY g
),
voc AS (SELECT g FROM uni ORDER BY n DESC, g LIMIT {_PMI_V}),
pr AS (
  SELECT l[CAST(i AS INT)] AS w1, l[CAST(i + dd AS INT)] AS w2
  FROM (SELECT l, unnest(generate_series(1, CAST(len(l) - 1 AS BIGINT))) AS i
        FROM d),
       (SELECT unnest([1, 2]) AS dd)
  WHERE i + dd <= len(l)
),
fp AS (
  SELECT w1, w2 FROM pr
  WHERE w1 IN (SELECT g FROM voc) AND w2 IN (SELECT g FROM voc)
),
cxy AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM fp GROUP BY w1, w2),
cx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c FROM fp GROUP BY w1),
cy AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c FROM fp GROUP BY w2),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM fp)
SELECT cxy.w1, cxy.w2, cxy.c AS n_pair,
       FLOOR(LN(CAST(cxy.c AS DOUBLE) * nn.n / (CAST(cx.c AS DOUBLE) * cy.c))
             * 1000000.0 + 0.5) / 1000000.0 AS pmi
FROM cxy
JOIN cx ON cx.w1 = cxy.w1
JOIN cy ON cy.w2 = cxy.w2
CROSS JOIN nn
WHERE cxy.c >= {_PMI_MIN_C}
"""


@register("llm_cooccurrence_pmi", oracle=_PMI_ORACLE)
def llm_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(F.split("text", " ").alias("l"))
    uni = (
        d.select(F.explode("l").alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    voc = uni.orderBy(F.col("n").desc(), "g").limit(_PMI_V).select("g")
    def _skipgram(dd: int):
        # closure factory: transform() inspects the lambda arity, so the
        # distance must be captured, not passed as a defaulted third arg
        def fn(x, i):
            return F.struct(
                x.alias("w1"), F.element_at(F.col("l"), i + 1 + dd).alias("w2")
            )

        return fn

    pr = None
    for dd in (1, 2):
        p = d.select(
            F.explode(
                # greatest(0, ...): a doc shorter than the distance must
                # yield no pairs, not a negative-length slice error
                F.transform(
                    F.slice(F.col("l"), 1, F.greatest(F.size("l") - dd, F.lit(0))),
                    _skipgram(dd),
                )
            ).alias("p")
        ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        pr = p if pr is None else pr.unionAll(p)
    fp = (
        pr.join(F.broadcast(voc.withColumnRenamed("g", "w1")), "w1", "left_semi")
        .join(F.broadcast(voc.withColumnRenamed("g", "w2")), "w2", "left_semi")
        .localCheckpoint(eager=True)  # one pair derivation, 4 consumers
    )
    cxy = fp.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cx = fp.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("cxc"))
    cy = fp.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("cyc"))
    nn = fp.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        cxy.filter(F.col("c") >= _PMI_MIN_C)
        .join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(nn))
        .select(
            "w1",
            "w2",
            F.col("c").alias("n_pair"),
            (
                F.floor(
                    F.log(
                        F.col("c").cast("double")
                        * F.col("n")
                        / (F.col("cxc").cast("double") * F.col("cyc"))
                    )
                    * 1_000_000.0
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("pmi"),
        )
    )


# --------------------------------------------------------------------------
# llm_judge_agreement — Cohen's kappa between two independent document
# judges (chance-corrected inter-rater agreement, the standard QA readout
# when two quality signals — or an LLM judge vs a heuristic — label the
# same corpus).  Judges here are the two cheap deterministic signals a
# curation pass already has: A = length gate (n_chars ≥ 200), B = token
# gate (≥ 40 whitespace tokens); κ = (p_o − p_e)/(1 − p_e) from the 2×2
# confusion cells.  The reference reaches eval tooling only as dbt-model
# SQL (dbtoperator.py:273-274).
#
# Determinism: the four cells are exact int64 from ONE keyed-free global
# aggregate (map-side combine); p_o/p_e/κ are identical double closed
# forms over exact integers, q6-quantized.  Scale: one scan, one global
# aggregate, no joins.
# --------------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH j AS (
  SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
         CASE WHEN len(string_split(text, ' ')) >= 40 THEN 1 ELSE 0 END AS b
  FROM documents
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
         CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM j
),
p AS (
  SELECT n, n11, n10, n01, n00,
         CAST(n11 + n00 AS DOUBLE) / n AS po,
         (CAST(n11 + n10 AS DOUBLE) / n) * (CAST(n11 + n01 AS DOUBLE) / n)
         + (CAST(n01 + n00 AS DOUBLE) / n) * (CAST(n10 + n00 AS DOUBLE) / n)
           AS pe
  FROM s
)
SELECT n, n11, n10, n01, n00,
       FLOOR(po * 1000000.0 + 0.5) / 1000000.0 AS p_observed,
       FLOOR(pe * 1000000.0 + 0.5) / 1000000.0 AS p_expected,
       CASE WHEN pe = 1.0 THEN NULL
            ELSE FLOOR((po - pe) / (1.0 - pe) * 1000000.0 + 0.5) / 1000000.0
       END AS kappa
FROM p
"""


@register("llm_judge_agreement", oracle=_KAPPA_ORACLE)
def llm_judge_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") >= 200, 1).otherwise(0)
    b = F.when(F.size(F.split("text", " ")) >= 40, 1).otherwise(0)
    s = d.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
    )
    n = F.col("n")
    po = (F.col("n11") + F.col("n00")).cast("double") / n
    pe = ((F.col("n11") + F.col("n10")).cast("double") / n) * (
        (F.col("n11") + F.col("n01")).cast("double") / n
    ) + ((F.col("n01") + F.col("n00")).cast("double") / n) * (
        (F.col("n10") + F.col("n00")).cast("double") / n
    )
    q6c = lambda c: F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0  # noqa: E731
    return s.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        q6c(po).alias("p_observed"),
        q6c(pe).alias("p_expected"),
        F.when(pe == 1.0, F.lit(None).cast("double"))
        .otherwise(q6c((po - pe) / (1.0 - pe)))
        .alias("kappa"),
    )


# --------------------------------------------------------------------------
# llm_calibration_ece — expected calibration error of a document judge:
# confidence = the deterministic hash-uniform score every sampler here
# uses (so the contract is self-contained), outcome = the length gate
# (n_chars ≥ 200); 10 equal-width confidence bins; ECE = Σ (n_b/N)·
# |acc_b − conf_b| — the standard reliability readout for any
# quality-classifier / LLM-judge score before its threshold is trusted.
# The reference reaches eval calibration only as dbt-model SQL
# (dbtoperator.py:273-274).
#
# Determinism: bin ids, hit counts, and N are exact int64; mean
# confidence per bin sums the exact 1e-6-quantized uniform (int64);
# |acc − conf| terms quantize at 1e-9 before the final bounded sum.
# Scale: one scan → one 10-key aggregate → one 1-row rollup.
# --------------------------------------------------------------------------

_ECE_ORACLE = """
WITH j AS (
  SELECT CAST(('0x' || substr(md5('conf:' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) / 4294967296.0 AS conf,
         CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS hit
  FROM documents
),
b AS (
  SELECT LEAST(CAST(FLOOR(conf * 10.0) AS INT), 9) AS bin,
         CAST(FLOOR(conf * 1000000.0 + 0.5) AS BIGINT) AS confq,
         hit
  FROM j
),
g AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
         CAST(SUM(hit) AS BIGINT) AS hits,
         CAST(SUM(confq) AS BIGINT) AS confsum
  FROM b GROUP BY bin
),
tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM g),
terms AS (
  SELECT g.bin, g.n_b, g.hits, g.confsum, tot.n,
         CAST(FLOOR((CAST(g.n_b AS DOUBLE) / tot.n)
              * ABS(CAST(g.hits AS DOUBLE) / g.n_b
                    - CAST(g.confsum AS DOUBLE) / g.n_b / 1000000.0)
              * 1000000000.0 + 0.5) AS BIGINT) AS tq
  FROM g CROSS JOIN tot
)
SELECT CAST(MAX(n) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       FLOOR(SUM(tq) / 1000000000.0 * 1000000.0 + 0.5) / 1000000.0 AS ece
FROM terms
"""


@register("llm_calibration_ece", oracle=_ECE_ORACLE)
def llm_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    conf = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("conf:"), F.col("doc_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(4294967296.0)
    )
    j = d.select(
        conf.alias("conf"),
        F.when(F.col("n_chars") >= 200, 1).otherwise(0).alias("hit"),
    )
    b = j.select(
        F.least(F.floor(F.col("conf") * 10.0).cast("int"), F.lit(9)).alias("bin"),
        F.floor(F.col("conf") * 1_000_000.0 + F.lit(0.5)).cast("bigint").alias(
            "confq"
        ),
        "hit",
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("hit").cast("bigint").alias("hits"),
        F.sum("confq").cast("bigint").alias("confsum"),
    ).localCheckpoint(eager=True)  # ≤10 rows, 2 consumers: one corpus scan
    tot = g.agg(F.sum("n_b").cast("bigint").alias("n"))
    terms = g.crossJoin(F.broadcast(tot)).select(
        "n",
        F.floor(
            (F.col("n_b").cast("double") / F.col("n"))
            * F.abs(
                F.col("hits").cast("double") / F.col("n_b")
                - F.col("confsum").cast("double") / F.col("n_b") / 1_000_000.0
            )
            * 1_000_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("tq"),
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        (
            F.floor(F.sum("tq") / 1_000_000_000.0 * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("ece"),
    )


# --------------------------------------------------------------------------
# llm_curriculum_order — curriculum phase assignment by EXACT difficulty
# terciles: difficulty = mean token length in micro-units (the cheap
# complexity proxy — longer average words track rarer vocabulary), cut
# at exact ranks ⌈n/3⌉ / ⌈2n/3⌉ via the shared bounded histogram
# refinement (llm.ranking.exact_rank_values — the third consumer after
# perplexity terciles and RFM quintiles).  Output is the per-phase
# census a curriculum-training run reads to schedule its phases.
#
# Determinism: difficulty is an exact int64 (Σ token chars · 1e6 / token
# count, FLOOR-quantized); cuts are exact order statistics; phase
# boundaries are value-based (strict >), so ties agree on both engines.
# --------------------------------------------------------------------------

_CURRICULUM_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(FLOOR(CAST(len(replace(text, ' ', '')) AS DOUBLE)
                    / len(string_split(text, ' '))
                    * 1000000.0 + 0.5) AS BIGINT) AS diff_q
  FROM documents
),
ranked AS (
  SELECT diff_q,
         ROW_NUMBER() OVER (ORDER BY diff_q) AS rn,
         COUNT(*) OVER () AS n
  FROM t
),
cuts AS (
  SELECT MAX(CASE WHEN rn = CAST(CEIL(n / 3.0) AS BIGINT) THEN diff_q END) AS c1,
         MAX(CASE WHEN rn = CAST(CEIL(2 * n / 3.0) AS BIGINT) THEN diff_q END) AS c2
  FROM ranked
)
SELECT CASE WHEN diff_q > c2 THEN 'hard'
            WHEN diff_q > c1 THEN 'medium'
            ELSE 'easy' END AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(diff_q) AS BIGINT) AS min_diff_q,
       CAST(MAX(diff_q) AS BIGINT) AS max_diff_q
FROM t CROSS JOIN cuts
GROUP BY 1
"""


@register("llm_curriculum_order", oracle=_CURRICULUM_ORACLE)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    diff_q = (
        F.floor(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            .cast("double")
            / F.size(toks)
            * 1_000_000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("diff_q")
    )
    t = d.select("doc_id", diff_q).localCheckpoint(eager=True)  # 2 consumers
    cuts = exact_rank_values(
        d.sparkSession,
        t.select(F.col("diff_q").cast("double").alias("v")),
        ["c1", "c2"],
        [lambda n: -(-n // 3), lambda n: -(-(2 * n) // 3)],
    )
    phase = (
        F.when(F.col("diff_q") > F.col("c2"), "hard")
        .when(F.col("diff_q") > F.col("c1"), "medium")
        .otherwise("easy")
    )
    return (
        t.crossJoin(F.broadcast(cuts))
        .groupBy(phase.alias("phase"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("diff_q").cast("bigint").alias("min_diff_q"),
            F.max("diff_q").cast("bigint").alias("max_diff_q"),
        )
    )


# --------------------------------------------------------------------------
# llm_bradley_terry — arena-style leaderboard fit (Bradley-Terry 1952 via
# Hunter 2004's MM iteration — the model behind Chatbot-Arena Elo-style
# rankings): sources are the players, matches pair the rank-i document of
# each source (deterministic zip by per-source doc_id order) with the
# longer document winning (n_chars; ties to the lexicographically smaller
# source), and three unrolled MM updates fit the strengths
#     p_i <- W_i / Σ_j n_ij / (p_i + p_j),    p renormalized to mean 1.
# Laplace-smoothed wins (W_i + 0.5 per opponent pair) keep a winless
# player's strength positive so no division can hit 0+0.
#
# Scale shape: matches are one rank-zip equi-join (per-source ROW_NUMBER
# windows, partitioned); every MM update aggregates the (#players²)-row
# match table joined to the #players-row strength vector — model-sized
# work after one corpus pass, the IVF/kmeans discipline.  Exactness:
# strengths round to 1e-9 after every update (fixed-point idiom), final
# readout q6; win counts are exact integers.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_BT_ITERS = 3


def _bt_oracle() -> str:
    parts = ["""
ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rk
  FROM documents
),
matches AS (
  SELECT a.source AS sa, b.source AS sb,
         CASE WHEN a.n_chars > b.n_chars THEN a.source
              WHEN b.n_chars > a.n_chars THEN b.source
              WHEN a.source < b.source THEN a.source ELSE b.source END AS winner
  FROM ranked a JOIN ranked b ON a.rk = b.rk AND a.source < b.source
),
sym AS (
  SELECT sa AS i, sb AS j, CAST(COUNT(*) AS BIGINT) AS n_ij,
         CAST(SUM(CASE WHEN winner = sa THEN 1 ELSE 0 END) AS BIGINT) AS w_ij
  FROM matches GROUP BY sa, sb
  UNION ALL
  SELECT sb AS i, sa AS j, CAST(COUNT(*) AS BIGINT) AS n_ij,
         CAST(SUM(CASE WHEN winner = sb THEN 1 ELSE 0 END) AS BIGINT) AS w_ij
  FROM matches GROUP BY sb, sa
),
wins AS (
  SELECT i, SUM(w_ij) + 0.5 * COUNT(*) AS w_sm,
         CAST(SUM(w_ij) AS BIGINT) AS wins_raw,
         CAST(SUM(n_ij) AS BIGINT) AS n_matches
  FROM sym GROUP BY i
),
p0 AS (SELECT i, 1.0 AS p FROM wins)""".strip()]
    for t in range(1, _BT_ITERS + 1):
        parts.append(f"""
d{t} AS (
  SELECT s.i, SUM((s.n_ij + 1.0) / (pi.p + pj.p)) AS denom
  FROM sym s JOIN p{t - 1} pi ON pi.i = s.i JOIN p{t - 1} pj ON pj.i = s.j
  GROUP BY s.i
),
r{t} AS (
  SELECT w.i, w.w_sm / d.denom AS rawp
  FROM wins w JOIN d{t} d ON d.i = w.i
),
p{t} AS (
  SELECT i, FLOOR(rawp / (SELECT AVG(rawp) FROM r{t}) * 1000000000.0 + 0.5)
            / 1000000000.0 AS p
  FROM r{t}
)""".strip())
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT w.i AS source, w.wins_raw AS wins, w.n_matches,
       FLOOR(p.p * 1000000.0 + 0.5) / 1000000.0 AS strength,
       ROW_NUMBER() OVER (ORDER BY p.p DESC, w.i) AS rank
FROM wins w JOIN p{_BT_ITERS} p ON p.i = w.i
"""
    )


_BT_ORACLE = _bt_oracle()

# Driver-page bound for the per-pass strength-vector collect (module-level
# so the fallback-parity test can monkeypatch it).
_BT_PAGE_CAP = 1 << 16


@register("llm_bradley_terry", oracle=_BT_ORACLE)
def llm_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rk = F.row_number().over(Window.partitionBy("source").orderBy("doc_id"))
    ranked = d.select("source", "n_chars", rk.alias("rk"))
    a, b = ranked.alias("a"), ranked.alias("b")
    winner = (
        F.when(F.col("a.n_chars") > F.col("b.n_chars"), F.col("a.source"))
        .when(F.col("b.n_chars") > F.col("a.n_chars"), F.col("b.source"))
        .when(F.col("a.source") < F.col("b.source"), F.col("a.source"))
        .otherwise(F.col("b.source"))
    )
    matches = (
        a.join(b, (F.col("a.rk") == F.col("b.rk"))
               & (F.col("a.source") < F.col("b.source")))
        .select(
            F.col("a.source").alias("sa"),
            F.col("b.source").alias("sb"),
            winner.alias("winner"),
        )
    )
    half = (
        matches.groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ij"),
            F.sum((F.col("winner") == F.col("sa")).cast("int"))
            .cast("bigint")
            .alias("w_ij"),
        )
    )
    sym = (
        half.select(F.col("sa").alias("i"), F.col("sb").alias("j"), "n_ij", "w_ij")
        .unionAll(
            matches.groupBy("sb", "sa")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_ij"),
                F.sum((F.col("winner") == F.col("sb")).cast("int"))
                .cast("bigint")
                .alias("w_ij"),
            )
            .select(F.col("sb").alias("i"), F.col("sa").alias("j"), "n_ij", "w_ij")
        )
        # model-sized (#players²) relation feeding every MM update
        .localCheckpoint(eager=False)
    )
    wins = sym.groupBy("i").agg(
        (F.sum("w_ij") + 0.5 * F.count(F.lit(1))).alias("w_sm"),
        F.sum("w_ij").cast("bigint").alias("wins_raw"),
        F.sum("n_ij").cast("bigint").alias("n_matches"),
    ).localCheckpoint(eager=False)
    # Driver-resident strength vector (r13 optimization round): the lazy MM
    # chain referenced p_{t-1} TWICE per pass (pi and pj), so the unrolled
    # plan subtree DOUBLED per iteration (2^T copies, each re-running the
    # denom/raw/mean chain).  The vector is model-sized (#players); collect
    # the new p each pass — every arithmetic op (denominator sums, the mean
    # normalization, the 1e-9 floor) stays in Spark exactly as before, so
    # results are bit-identical — and re-inject it as a LOCAL-relation leaf
    # (no subtree to duplicate).  One bounded collect per pass, linear plan.
    from nedp_etl_spark.data import local_rows

    def mm_update(pdf) -> DataFrame:
        """One MM pass: p_{t-1} (None ⇒ p ≡ 1.0) → the new normalized p.
        Shared by the driver-page loop and the distributed fallback so both
        run the identical plan (same broadcasts, same float sum order) and
        produce bit-identical vectors."""
        if pdf is None:
            pi = wins.select(F.col("i").alias("pi_i"), F.lit(1.0).alias("pi_p"))
            pj = wins.select(F.col("i").alias("pj_i"), F.lit(1.0).alias("pj_p"))
        else:
            pi = pdf.select(F.col("i").alias("pi_i"), F.col("p").alias("pi_p"))
            pj = pdf.select(F.col("i").alias("pj_i"), F.col("p").alias("pj_p"))
        denom = (
            sym.join(F.broadcast(pi), sym["i"] == pi["pi_i"])
            .join(F.broadcast(pj), sym["j"] == pj["pj_i"])
            .groupBy("i")
            .agg(
                F.sum((F.col("n_ij") + 1.0) / (F.col("pi_p") + F.col("pj_p")))
                .alias("denom")
            )
        )
        raw = wins.join(denom, "i").select(
            "i", (F.col("w_sm") / F.col("denom")).alias("rawp")
        )
        mean = raw.agg(F.avg("rawp").alias("mp"))
        return raw.crossJoin(F.broadcast(mean)).select(
            "i",
            (
                F.floor(
                    F.col("rawp") / F.col("mp") * 1_000_000_000.0 + F.lit(0.5)
                )
                / 1_000_000_000.0
            ).alias("p"),
        )

    # Bounded-page discipline (ADVICE r13: the per-pass collect had no size
    # guard): #players grows with distinct sources, so the driver page is
    # capped like graph_topo_levels'.  Past the cap, the loop falls back to
    # a DISTRIBUTED p relation with an eager per-pass localCheckpoint —
    # same arithmetic, linear plan (the checkpoint leaf stops the 2^T
    # subtree doubling the driver page was introduced to fix).
    p_rows, p = None, None
    for _ in range(_BT_ITERS):
        page = mm_update(
            None if p_rows is None else local_rows(spark, p_rows, "i string, p double")
        ).limit(_BT_PAGE_CAP + 1).collect()
        if len(page) > _BT_PAGE_CAP:
            p_rows = None
            break
        p_rows = [(r["i"], r["p"]) for r in page]
    if p_rows is not None:
        p = local_rows(spark, p_rows, "i string, p double")
    else:
        pdf = None
        for _ in range(_BT_ITERS):
            pdf = mm_update(pdf).localCheckpoint(eager=True)
        p = pdf
    rnk = F.row_number().over(
        Window.orderBy(F.col("p").desc(), F.col("source"))
    )
    return (
        wins.withColumnRenamed("i", "source")
        .join(p.withColumnRenamed("i", "source"), "source")
        .select(
            "source",
            F.col("wins_raw").alias("wins"),
            "n_matches",
            (F.floor(F.col("p") * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0)
            .alias("strength"),
            "p",  # q9 strength: the rank orders on it, q6 would collapse ties
        )
        .withColumn("rank", rnk)
        .drop("p")
    )
