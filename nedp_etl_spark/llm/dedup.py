"""Deduplication operators for LLM training-data pipelines (SURVEY.md §2
north-star block): exact hash dedup, MinHash-LSH near-dedup, SimHash
fingerprints, n-gram Jaccard, bottom-k document fingerprints.

Engine-portability trick that makes these *exact*-checkable: every hash is
md5 (identical hex in Spark and DuckDB), so even MinHash signatures and
SimHash bits reproduce bit-for-bit in the oracle.  In production the hash
would be xxhash64 for speed — the algebra is identical.

Scale shapes:
- exact dedup: groupBy(hash) — one shuffle of (hash, id), never the text;
- MinHash-LSH: per-doc signature (map-side) → explode to (band, key) →
  shuffle on band key → pairs only within buckets.  Candidate-pair count is
  the banded O(n·similar) not O(n²);
- SimHash: one 64-ish-bit fingerprint per doc, map-side only.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import fan_out, load, local_rows
from nedp_etl_spark.registry import register

# --------------------------------------------------------------------------
# llm_dedup_exact — normalized-text hash dedup with deterministic keeper.
# --------------------------------------------------------------------------

_DEDUP_EXACT_ORACLE = """
SELECT sha256(lower(trim(text))) AS text_hash,
       MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


@register("llm_dedup_exact", oracle=_DEDUP_EXACT_ORACLE)
def llm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    # groupBy(hash) + min(id) instead of dropDuplicates: the surviving row
    # is deterministic and only (hash, id) shuffles — at 100 TB the text
    # never leaves the scan stage.
    d = load(spark, sf_dir, "documents")
    return (
        d.select(F.sha2(F.lower(F.trim("text")), 256).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# Shared shingling helpers (word 3-grams, 1-based indexing both engines).
# --------------------------------------------------------------------------


def _shingles(toks: Column) -> Column:
    """Word 3-grams from a pre-split token array.  Callers must materialize
    the token array as its own column first — referencing split() inside the
    lambda would re-evaluate it per element.

    HAZARD BOUNDARY (round-11 long-doc finding): this index-lambda form
    references the ENCLOSING array; it stays linear only because
    CollapseProject declines to inline a non-cheap multi-use reference
    into a PROJECT.  Predicate pushdown substitutes unconditionally, so
    if a consumer ever puts a shingle expression inside a FILTER
    predicate, interpreted eval re-splits the text per element — O(n²)
    per document (the llm_curation_e2e stage-1 wedge; see
    curation._trigram_set for the zip_with rewrite that is immune, and
    tests/test_longdoc_inputs.py for the empirical tripwire).  No current
    consumer filters on shingles (the opt-in long-doc sweep pins that);
    rewrite to zip_with before adding one.

    Total for ANY input length:
    Spark's sequence() auto-steps DOWNWARD when start > stop, so an
    unguarded ``sequence(1, n-2)`` on a 2-token doc yields indices [1, 0]
    and element_at(toks, 0) throws at execution (1-token: [1, 0, -1],
    where -1 silently aliases the last token) — docs shorter than one
    shingle therefore return an empty array via a per-row branch (the
    untaken branch is not evaluated for a row, so the bad indices never
    execute)."""
    n = F.size(toks)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    return F.when(n >= 3, shingles).otherwise(F.array().cast("array<string>"))


_SHINGLES_SQL = """list_transform(range(1, len(string_split(text,' ')) - 1),
    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])"""

# Augmented corpus: every doc plus a copy with the first token dropped —
# guaranteed near-duplicates so the LSH path is exercised non-trivially.
_AUG_SQL = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, substr(text, instr(text, ' ') + 1) AS text
  FROM documents
"""


def _aug_corpus(d: DataFrame) -> DataFrame:
    clipped = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    return d.select("doc_id", "text").unionAll(clipped)


# --------------------------------------------------------------------------
# llm_dedup_near — MinHash + LSH banding.
# k=6 hash functions (md5 with seed suffix), 3 bands × 2 rows.
# --------------------------------------------------------------------------

_N_HASHES = 6
_BAND_ROWS = 2

# One md5 per shingle; the 6 MinHash functions are disjoint 5-hex-digit
# slices of that digest (independent bits of a good hash ≈ independent
# hash functions).  6× cheaper than seeded re-hashing at 100 TB, and still
# bit-reproducible in the oracle.
_MINHASH_LIST_SQL = "[" + ", ".join(
    f"list_min(list_transform(hs, h -> substr(h, {i * 5 + 1}, 5)))" for i in range(_N_HASHES)
) + "]"

# Hot-bucket cap (the CCNet/BigQuery-dedup convention, made lossless for
# connectivity): a bucket of k co-colliding docs normally emits all
# k(k−1)/2 pairs — one viral near-duplicate cluster at 100 TB turns that
# into an O(k²) explosion inside a single join task.  Buckets larger than
# the cap switch to STAR topology (every member pairs with the bucket's
# min doc_id): k−1 pairs, same connected components — which is all the
# downstream dedup (keep-min-per-cluster) consumes.  Current fixtures top
# out at bucket size 14 (sf0.1), so outputs are unchanged below the cap.
_HOT_BUCKET_CAP = 32

_DEDUP_NEAR_ORACLE = f"""
WITH corpus AS ({_AUG_SQL}),
sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS s
  FROM corpus WHERE len(string_split(text,' ')) >= 3
),
hsh AS (SELECT doc_id, list_transform(s, x -> md5(x)) AS hs FROM sh),
mh AS (SELECT doc_id, {_MINHASH_LIST_SQL} AS m FROM hsh),
bands AS (
  SELECT doc_id, CAST(t.j AS INT) AS band,
         m[CAST(2*t.j + 1 AS INT)] || '|' || m[CAST(2*t.j + 2 AS INT)] AS band_key
  FROM mh, range(0, {_N_HASHES // _BAND_ROWS}) t(j)
),
stats AS (
  SELECT band, band_key, COUNT(*) AS bsz, MIN(doc_id) AS hub
  FROM bands GROUP BY 1, 2
),
bb AS (
  SELECT b.doc_id, b.band, b.band_key, s.bsz, s.hub
  FROM bands b JOIN stats s ON b.band = s.band AND b.band_key = s.band_key
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bb a
  JOIN bb b ON a.band = b.band AND a.band_key = b.band_key
            AND a.doc_id < b.doc_id
  WHERE a.bsz <= {_HOT_BUCKET_CAP}
  UNION ALL
  SELECT hub AS doc_a, doc_id AS doc_b
  FROM bb WHERE bsz > {_HOT_BUCKET_CAP} AND doc_id <> hub
)
SELECT doc_a, doc_b, COUNT(*) AS n_shared_bands
FROM pairs GROUP BY 1, 2
"""


@register("llm_dedup_near", oracle=_DEDUP_NEAR_ORACLE)
def llm_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = _aug_corpus(d)
    tok = corpus.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    sh = tok.select("doc_id", _shingles(F.col("toks")).alias("s"))
    def _minhash(i: int):
        # NB: single-arg lambdas only — PySpark treats a two-parameter
        # lambda as (element, index).
        off = i * 5 + 1
        return F.array_min(F.transform(F.col("hs"), lambda h: F.substring(h, off, 5)))

    hsh = sh.select("doc_id", F.transform(F.col("s"), F.md5).alias("hs"))
    minhashes = F.array(*[_minhash(i) for i in range(_N_HASHES)])
    mh = hsh.select("doc_id", minhashes.alias("m"))
    n_bands = _N_HASHES // _BAND_ROWS
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        *[F.col("m")[b * _BAND_ROWS + r] for r in range(_BAND_ROWS)],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    # Materialize the narrow band rows once (doc_id, band, band_key — no
    # text): they feed the stats aggregate, both sides of the pair
    # self-join, and the hot-bucket branch, and without the cut each branch
    # re-runs the whole split→shingle→md5→minhash lineage (4-5 executions
    # observed in the executed plan; r13 optimization round, guide §5
    # "reuse + recompute cost" and §2.4).
    bands = bands.localCheckpoint(eager=False)
    # Hot-bucket cap: bucket sizes + hubs are one keyed aggregate over the
    # band rows (bucket-cardinality-sized); joining them back is an
    # equi-join on the band key.  Small buckets keep the exact all-pairs
    # contract; hot buckets emit star pairs (hub = bucket min) — k−1 rows
    # instead of k(k−1)/2, identical connectivity.
    stats = bands.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bsz"), F.min("doc_id").alias("hub")
    )
    # bb feeds the self-join (twice) + the hot-pair branch: materialize the
    # narrow join result too, so stats is not re-aggregated per branch.
    bb = bands.join(stats, ["band", "band_key"]).localCheckpoint(eager=False)
    small = bb.filter(F.col("bsz") <= _HOT_BUCKET_CAP).select(
        "doc_id", "band", "band_key"
    )
    a, b = small.alias("a"), small.alias("b")
    pairs_small = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    pairs_hot = bb.filter(
        (F.col("bsz") > _HOT_BUCKET_CAP) & (F.col("doc_id") != F.col("hub"))
    ).select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    return (
        pairs_small.unionByName(pairs_hot)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )

_PAIRS_CACHE: dict = {}
_PAIRS_LOCK = threading.Lock()


def derived_table(spark: SparkSession, sf_dir: str, name: str, builder) -> DataFrame:
    """A session-scoped DERIVED TABLE: ``builder(spark, sf_dir)`` is
    executed ONCE per (live session, fixture dir, name), its result
    written to scratch parquet, and every caller handed a plain scan —
    the featurize-once discipline applied ACROSS queries.

    Materialization is parquet (``data.load`` semantics) rather than a
    cross-query localCheckpoint: checkpoint blocks reused by LATER
    queries try to update the original query's GC'd SQL-metrics
    accumulators (spurious DAGScheduler ERROR noise), memory-cached
    blocks evict under pressure and silently re-run the whole lineage
    (the round-10 llm_candidate_compare 13.7 s ↔ 3.96 s bimodality),
    while a parquet scan re-plans cleanly per query, costs no executor
    memory, and is exactly the "materialize the pair list" shape a
    production dedup pipeline uses.  Cache key = live session id +
    fixture dir + name (fixture dirs are immutable within a session; a
    fresh session rewrites).
    """
    import hashlib
    import os

    from nedp_etl_spark.operators.scans import _scratch

    # Stable session identity: sessionUUID is unique per live session and
    # never reused, unlike id(jobj) which CPython recycles after GC — a new
    # session could alias a stale entry holding a DataFrame bound to a
    # stopped session.  Entries from OTHER sessions are evicted on insert
    # (they are dead weight once a different session is deriving), which
    # also bounds the dict across many-session test runs.
    session_uuid = spark._jsparkSession.sessionUUID()
    key = (session_uuid, sf_dir, name)
    df = _PAIRS_CACHE.get(key)
    if df is None:
        # Build under the module lock: two concurrent consumers on a cold
        # cache would otherwise BOTH miss and race overwrite-writes to the
        # SAME scratch path (thin-client apps do issue registry queries
        # from thread pools; round-12 concurrency tripwire).  Double-check
        # after acquiring — the loser of the race reuses the winner's
        # materialization instead of rebuilding.
        with _PAIRS_LOCK:
            df = _PAIRS_CACHE.get(key)
            if df is None:
                # digest of the FULL fixture path in the scratch layout:
                # _scratch keys on basename(sf_dir) alone, and unlike every
                # other _scratch user this one SKIPS the rewrite on cache
                # hit — two dirs sharing a basename must not share a
                # derived table (review finding).
                tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
                path = os.path.join(_scratch(name, sf_dir), tag, name)
                builder(spark, sf_dir).write.mode("overwrite").parquet(path)
                df = spark.read.parquet(path)
                for k in [k for k in _PAIRS_CACHE if k[0] != session_uuid]:
                    del _PAIRS_CACHE[k]
                _PAIRS_CACHE[key] = df
    return df


def candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH candidate pair list (doc_a < doc_b), derived ONCE
    per (live session, fixture dir) and shared by every downstream
    graph/QA consumer: ten operators ride this relation, and without the
    cache each re-runs the shingle→minhash→band lineage (~2.5 s at sf0.1
    apiece).  See :func:`derived_table` for the materialization rationale.
    """
    return derived_table(
        spark,
        sf_dir,
        "candidate_pairs",
        lambda s, d: llm_dedup_near(s, d).select("doc_a", "doc_b"),
    )


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The verified SimHash pair list (doc_a, doc_b, hamming), derived
    once per (session, fixture dir) — the order-insensitive complement of
    :func:`candidate_pairs`, shared by the QA comparators so they scan a
    materialized relation instead of re-running the token→votes→band→
    verify lineage (whose localCheckpoint blocks evicted under load and
    made llm_candidate_compare bimodal, round-10 bench postmortem)."""
    return derived_table(spark, sf_dir, "simhash_pairs", _simhash_pairs_build)



# --------------------------------------------------------------------------
# llm_simhash — 8-bit SimHash from per-token md5 nibble parities.
# bit_b's ±1 vote for a token is the parity of hex digit b of md5(token);
# the fingerprint packs the sign bits of the vote sums.
# --------------------------------------------------------------------------

_SIMHASH_BITS = 8

_SIMHASH_VOTE_SQL = ", ".join(
    f"SUM(2 * (ascii(substr(h, {b + 1}, 1)) % 2) - 1) AS v{b}" for b in range(_SIMHASH_BITS)
)
_SIMHASH_PACK_SQL = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS)
)

_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, md5(t.tok) AS h
  FROM documents, UNNEST(string_split(text, ' ')) t(tok)
),
votes AS (SELECT doc_id, {_SIMHASH_VOTE_SQL} FROM tok GROUP BY doc_id)
SELECT doc_id, CAST({_SIMHASH_PACK_SQL} AS BIGINT) AS simhash
FROM votes
"""


@register("llm_simhash", oracle=_SIMHASH_ORACLE)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).select(
        "doc_id", F.md5("tok").alias("h")
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(2 * (F.ascii(F.substring("h", b + 1, 1)) % 2) - 1).alias(f"v{b}")
            for b in range(_SIMHASH_BITS)
        ]
    )
    packed = None
    for b in range(_SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return votes.select("doc_id", packed.cast("bigint").alias("simhash"))


# --------------------------------------------------------------------------
# llm_ngram_jaccard — pairwise 3-gram Jaccard similarity on a probe subset.
# --------------------------------------------------------------------------

_JACCARD_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS s
  FROM documents
  WHERE doc_id < 30 AND len(string_split(text,' ')) >= 3
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
             len(list_distinct(a.s || b.s)), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
"""


@register("llm_ngram_jaccard", oracle=_JACCARD_ORACLE)
def llm_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-definition demo: exact pairwise n-gram Jaccard over an
    explicitly probe-bounded slice (doc_id < 30 → ≤435 pairs).

    This key intentionally keeps the all-pairs shape — it *defines* the
    similarity metric that the scale path verifies against.  Deduplicating a
    full corpus with this metric goes through ``llm_dedup_lsh_verified``
    (banded-LSH candidates → true Jaccard verify on candidates only), which
    is the 100 TB plan; the nested-loop here is allow-listed in
    ``tests/test_plans.py`` solely because of the probe bound.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    sh = (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", F.array_distinct(_shingles(F.col("toks"))).alias("s"))
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sa", "sb"))
                * 1.0
                / F.size(F.array_union("sa", "sb")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# llm_fingerprint — bottom-k sketch (winnowing-style document fingerprint):
# the 3 smallest shingle hashes identify the document robustly.
# --------------------------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       array_to_string(list_sort(list_transform({_SHINGLES_SQL}, x -> md5(x)))[1:3], ',') AS fingerprint
FROM documents
WHERE len(string_split(text,' ')) >= 3
"""


@register("llm_fingerprint", oracle=_FINGERPRINT_ORACLE)
def llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.split("text", " ").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.concat_ws(
                ",",
                F.slice(F.array_sort(F.transform(_shingles(F.col("toks")), F.md5)), 1, 3),
            ).alias("fingerprint"),
        )
    )


# --------------------------------------------------------------------------
# llm_dedup_lsh_verified — the full two-stage near-dedup pipeline: LSH
# banding proposes candidate pairs (cheap, high recall), then TRUE 3-gram
# Jaccard verifies each candidate (exact, computed only on the candidate
# set — never O(n²)).  Output: verified near-duplicate pairs at τ=0.5.
# --------------------------------------------------------------------------

_LSH_VERIFIED_ORACLE = f"""
WITH corpus AS ({_AUG_SQL}),
sh AS (
  SELECT doc_id, {_SHINGLES_SQL} AS s
  FROM corpus WHERE len(string_split(text,' ')) >= 3
),
hsh AS (SELECT doc_id, list_transform(s, x -> md5(x)) AS hs, list_distinct(s) AS sd FROM sh),
mh AS (SELECT doc_id, sd, {_MINHASH_LIST_SQL} AS m FROM hsh),
bands AS (
  SELECT doc_id, sd, CAST(t.j AS INT) AS band,
         m[CAST(2*t.j + 1 AS INT)] || '|' || m[CAST(2*t.j + 2 AS INT)] AS band_key
  FROM mh, range(0, {_N_HASHES // _BAND_ROWS}) t(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sd AS sa, b.sd AS sb
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       ROUND(len(list_intersect(sa, sb)) * 1.0 / len(list_distinct(sa || sb)), 6) AS jaccard
FROM cand
WHERE len(list_intersect(sa, sb)) * 2 >= len(list_distinct(sa || sb))
"""


@register("llm_dedup_lsh_verified", oracle=_LSH_VERIFIED_ORACLE)
def llm_dedup_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = _aug_corpus(d)
    tok = corpus.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    sh = tok.select("doc_id", _shingles(F.col("toks")).alias("s"))
    hsh = sh.select(
        "doc_id",
        F.transform(F.col("s"), F.md5).alias("hs"),
        F.array_distinct("s").alias("sd"),
    )

    def _minhash(i: int):
        off = i * 5 + 1
        return F.array_min(F.transform(F.col("hs"), lambda h: F.substring(h, off, 5)))

    # Materialize (doc_id, sd, m) once: it feeds both sides of the band
    # self-join AND both shingle-set re-joins below — without the cut the
    # split→shingle→md5→minhash lineage executes 4× (r13 optimization
    # round; same reuse discipline as llm_dedup_near's band checkpoint).
    mh = hsh.select(
        "doc_id", "sd", F.array(*[_minhash(i) for i in range(_N_HASHES)]).alias("m")
    ).localCheckpoint(eager=False)
    n_bands = _N_HASHES // _BAND_ROWS
    # Band rows carry ONLY (doc_id, band, band_key): the shingle sets would
    # otherwise be replicated ×n_bands through the explode and shuffled on
    # both sides of the self-join — at corpus scale that dominates the
    # shuffle.  The sets re-join by doc_id onto the deduped candidate pairs
    # (one shuffle per side, proportional to candidates, not bands).
    bands = mh.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws("|", *[F.col("m")[b * _BAND_ROWS + r] for r in range(_BAND_ROWS)])
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sets = mh.select("doc_id", "sd")
    cand = (
        cand.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("sd").alias("sa")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("sd").alias("sb")), "doc_b")
    )
    inter = F.size(F.array_intersect("sa", "sb"))
    union = F.size(F.array_union("sa", "sb"))
    return (
        cand.filter(inter * 2 >= union)
        .select("doc_a", "doc_b", F.round(inter * 1.0 / union, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# llm_dedup_cluster — connected components over the near-duplicate pair
# graph (the step that turns pairs into dedup groups), via min-label
# propagation.  Iterations are FIXED at 4 so the oracle can unroll the same
# steps; the fixture graph (planted doc↔doc+1e6 pairs plus small triangles)
# has diameter ≤ 3, so 4 steps reach the fixpoint.  Production runs
# until-convergence with localCheckpoint every few steps — the per-step
# shape (join + min-agg on the edge list) is exactly what scales.
# --------------------------------------------------------------------------

_CC_ITERS = 4

# Public: the LSH candidate-pair CTE — the distinct (doc_a < doc_b) pairs
# of llm_dedup_near INCLUDING the hot-bucket star cap, so every consumer's
# oracle (graph_triangle_count / graph_bfs_reach / graph_neighbor_jaccard /
# graph_kcore in operators/graph.py, the cluster ops below) states exactly
# the pair graph the Spark side materializes at ANY bucket size — above
# the cap both engines emit the same star pairs.  Downstream metrics are
# therefore metrics OVER THE CAPPED CANDIDATE GRAPH (the graph the dedup
# pipeline actually builds), by construction on both engines.  Carries
# ONLY the pairs CTE; the connected-components edges/l0 scaffolding is
# appended privately below.
PAIRS_SQL = f"""
pairs AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    WITH corpus AS ({_AUG_SQL}),
    sh AS (
      SELECT doc_id, {_SHINGLES_SQL} AS s
      FROM corpus WHERE len(string_split(text,' ')) >= 3
    ),
    hsh AS (SELECT doc_id, list_transform(s, x -> md5(x)) AS hs FROM sh),
    mh AS (SELECT doc_id, {_MINHASH_LIST_SQL} AS m FROM hsh),
    bands AS (
      SELECT doc_id, CAST(t.j AS INT) AS band,
             m[CAST(2*t.j + 1 AS INT)] || '|' || m[CAST(2*t.j + 2 AS INT)] AS band_key
      FROM mh, range(0, {_N_HASHES // _BAND_ROWS}) t(j)
    ),
    stats AS (
      SELECT band, band_key, COUNT(*) AS bsz, MIN(doc_id) AS hub
      FROM bands GROUP BY 1, 2
    ),
    bb AS (
      SELECT b.doc_id, b.band, b.band_key, s.bsz, s.hub
      FROM bands b JOIN stats s ON b.band = s.band AND b.band_key = s.band_key
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bb a
    JOIN bb b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
    WHERE a.bsz <= {_HOT_BUCKET_CAP}
    UNION ALL
    SELECT hub AS doc_a, doc_id AS doc_b
    FROM bb WHERE bsz > {_HOT_BUCKET_CAP} AND doc_id <> hub
  )
)"""

_CC_EDGES_SQL = f"""{PAIRS_SQL},
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
  UNION ALL SELECT doc_a, doc_a FROM pairs
  UNION ALL SELECT doc_b, doc_b FROM pairs
),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM edges)
"""

_CC_STEPS_SQL = ",\n".join(
    f"l{i+1} AS (SELECT e.a AS node, MIN(l{i}.label) AS label "
    f"FROM edges e JOIN l{i} ON l{i}.node = e.b GROUP BY e.a)"
    for i in range(_CC_ITERS)
)

_DEDUP_CLUSTER_ORACLE = f"""
WITH {_CC_EDGES_SQL},
{_CC_STEPS_SQL}
SELECT node AS doc_id, label AS cluster_id FROM l{_CC_ITERS}
"""


@register("llm_dedup_cluster", oracle=_DEDUP_CLUSTER_ORACLE)
def llm_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Materialize the pair graph ONCE: every propagation step re-walks the
    # edge lineage, and without truncation that re-runs the whole
    # MinHash-LSH pipeline per iteration (~5× the work).
    pairs = candidate_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionAll(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .unionAll(pairs.select(F.col("doc_a").alias("a"), F.col("doc_a").alias("b")))
        .unionAll(pairs.select(F.col("doc_b").alias("a"), F.col("doc_b").alias("b")))
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(_CC_ITERS):
        labels = (
            edges.join(labels, edges.b == labels.node)
            .groupBy(F.col("a").alias("n"))
            .agg(F.min("label").alias("l"))
            .select(F.col("n").alias("node"), F.col("l").alias("label"))
        )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@register("llm_dedup_cluster_converged", oracle=_DEDUP_CLUSTER_ORACLE)
def llm_dedup_cluster_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production connected components: min-label propagation iterated to
    FIXPOINT (label-change count = 0) instead of a fixed unroll.

    Each step is the same join+min-agg as ``llm_dedup_cluster``; the labels
    frame is ``localCheckpoint``-ed every step so (a) the lineage never grows
    with the iteration count (the 100 TB failure mode of iterative Spark
    jobs) and (b) the convergence count re-reads the checkpointed frame, not
    the whole propagation chain.  Steps are bounded by the cluster graph's
    diameter — the fixture converges in ≤ 4, so the fixed-unroll oracle SQL
    is exactly the fixpoint and this key stays exact-checked.
    """
    pairs = candidate_pairs(spark, sf_dir)
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionAll(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .unionAll(pairs.select(F.col("doc_a").alias("a"), F.col("doc_a").alias("b")))
        .unionAll(pairs.select(F.col("doc_b").alias("a"), F.col("doc_b").alias("b")))
    )
    labels = (
        edges.select(F.col("a").alias("node")).distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    def _propagate(lbl: DataFrame) -> DataFrame:
        return (
            edges.join(lbl, edges.b == lbl.node)
            .groupBy(F.col("a").alias("n"))
            .agg(F.min("label").alias("l"))
            .select(F.col("n").alias("node"), F.col("l").alias("label"))
        )

    for _ in range(32):  # hard bound: diameter of any real dedup graph is tiny
        # Two propagation steps per convergence check: labels shrink
        # monotonically, so "no change across a double step" ⇔ fixpoint —
        # and it halves the count actions + checkpoints per converged run.
        new_labels = _propagate(_propagate(labels)).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError("label propagation did not converge in 64 steps")
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


# --------------------------------------------------------------------------
# llm_cross_dedup — incremental (shard-vs-corpus) exact dedup: new-shard
# documents are dropped when their content hash already exists in the
# reference corpus.  This is the production cadence — you never re-cluster
# the whole corpus when a crawl lands; you anti-join the new shard against
# the corpus hash index.  The corpus side pre-aggregates to (hash,
# min doc_id) before the join, so only 16-byte hashes + ids shuffle and the
# join key is unique on the build side; text never leaves the scan.  At
# 100 TB the hash index is a bucketed table and this join is co-located.
# Reference parity: incremental-materialization semantics are the
# reference's own (`dbt run` incremental models,
# /root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_CROSS_DEDUP_ORACLE = """
WITH corpus AS (
  SELECT md5(text) AS h, MIN(doc_id) AS dup_of
  FROM documents WHERE CAST(substr(source, 4) AS INT) < 10
  GROUP BY md5(text)
),
shard AS (
  SELECT doc_id, source, lang, md5(text) AS h
  FROM documents WHERE CAST(substr(source, 4) AS INT) >= 10
)
SELECT s.doc_id, s.source, s.lang, c.dup_of,
       (c.dup_of IS NULL) AS keep
FROM shard s LEFT JOIN corpus c ON s.h = c.h
"""


@register("llm_cross_dedup", oracle=_CROSS_DEDUP_ORACLE)
def llm_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    src_num = F.substring("source", 4, 10).cast("int")
    corpus = (
        d.filter(src_num < 10)
        .groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("dup_of"))
    )
    shard = d.filter(src_num >= 10).select(
        "doc_id", "source", "lang", F.md5("text").alias("h")
    )
    return shard.join(corpus, on="h", how="left").select(
        "doc_id",
        "source",
        "lang",
        "dup_of",
        F.col("dup_of").isNull().alias("keep"),
    )


# --------------------------------------------------------------------------
# llm_minhash_recall — dedup quality gate (the MinHash twin of
# llm_ann_recall): for a deterministic probe subset, compute the TRUE
# near-duplicate pairs by exact shingle Jaccard (>= 0.5), then measure what
# fraction the banded MinHash-LSH candidate generation recovers.  This is
# the measurement that justifies band/row parameters before a production
# dedup run.  Scale shape: the probe set is tiny and broadcast, so ground
# truth costs one map-side pass over the corpus (O(n x probes)); the LSH
# side reuses the banded pipeline (O(n x similar)).  Integer-exact
# threshold test (3*inter >= |a|+|b|  <=>  Jaccard >= 0.5) keeps the oracle
# bit-identical.
# --------------------------------------------------------------------------

_MINHASH_RECALL_ORACLE = f"""
WITH corpus AS ({_AUG_SQL}),
sh AS (
  SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS s
  FROM corpus WHERE len(string_split(text,' ')) >= 3
),
probes AS (
  SELECT doc_id AS p_id, s AS ps FROM sh
  WHERE doc_id < 1000000 AND doc_id % 200 = 0
),
truth AS (
  SELECT p.p_id, c.doc_id AS other
  FROM probes p JOIN sh c ON c.doc_id <> p.p_id
  WHERE 3 * len(list_filter(p.ps, x -> list_contains(c.s, x)))
        >= len(p.ps) + len(c.s)
),
hsh AS (SELECT doc_id, list_transform(s, x -> md5(x)) AS hs FROM sh),
mh AS (SELECT doc_id, {_MINHASH_LIST_SQL} AS m FROM hsh),
bands AS (
  SELECT doc_id, CAST(t.j AS INT) AS band,
         m[CAST(2*t.j + 1 AS INT)] || '|' || m[CAST(2*t.j + 2 AS INT)] AS band_key
  FROM mh, range(0, {_N_HASHES // _BAND_ROWS}) t(j)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT t.p_id,
       COUNT(*) AS n_true,
       COUNT(c.doc_a) AS n_found,
       ROUND(COUNT(c.doc_a) * 1.0 / COUNT(*), 6) AS recall
FROM truth t
LEFT JOIN cand c
  ON c.doc_a = LEAST(t.p_id, t.other) AND c.doc_b = GREATEST(t.p_id, t.other)
GROUP BY t.p_id
"""


@register("llm_minhash_recall", oracle=_MINHASH_RECALL_ORACLE)
def llm_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = _aug_corpus(d)
    tok = corpus.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    sets = tok.select(
        "doc_id", F.array_distinct(_shingles(F.col("toks"))).alias("s")
    )
    probes = sets.filter(
        (F.col("doc_id") < 1000000) & (F.col("doc_id") % 200 == 0)
    ).select(F.col("doc_id").alias("p_id"), F.col("s").alias("ps"))
    # Ground truth: one broadcast pass — every corpus doc against every
    # probe, exact distinct-shingle Jaccard, integer threshold.
    inter = F.size(F.array_intersect("ps", "s"))
    truth = (
        sets.join(F.broadcast(probes), F.col("doc_id") != F.col("p_id"))
        .filter(3 * inter >= F.size("ps") + F.size("s"))
        .select("p_id", F.col("doc_id").alias("other"))
    )
    cand = candidate_pairs(spark, sf_dir)
    return (
        truth.join(
            cand,
            (cand.doc_a == F.least("p_id", "other"))
            & (cand.doc_b == F.greatest("p_id", "other")),
            "left",
        )
        .groupBy("p_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("doc_a").alias("n_found"),
            F.round(F.count("doc_a") / F.count(F.lit(1)), 6).alias("recall"),
        )
    )


# --------------------------------------------------------------------------
# llm_winnowing — positional winnowing fingerprints (Schleimer et al.,
# SIGMOD 2003, the MOSS algorithm): slide a window of w consecutive shingle
# hashes and keep each window's minimum.  Unlike the bottom-k sketch
# (llm_fingerprint), winnowing GUARANTEES any shared substring of length
# >= w+k-1 tokens contributes a common fingerprint — the property span-level
# plagiarism/dedup needs.  Map-side only (array ops inside codegen, one
# explode); the only shuffle is the per-doc count aggregate.  w=4, k=3.
# --------------------------------------------------------------------------

_WINNOW_W = 4

_WINNOWING_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, list_transform({_SHINGLES_SQL}, x -> md5(x)) AS hs
  FROM documents WHERE len(string_split(text,' ')) >= {2 + _WINNOW_W}
),
wins AS (
  SELECT doc_id,
         UNNEST([list_min(hs[i:i+{_WINNOW_W - 1}])
                 FOR i IN range(1, len(hs) - {_WINNOW_W} + 2)]) AS fp
  FROM sh
)
SELECT doc_id, fp, COUNT(*) AS n_windows
FROM wins GROUP BY doc_id, fp
"""


@register("llm_winnowing", oracle=_WINNOWING_ORACLE)
def llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # Need at least w shingles = w+2 tokens for one full window.
    tok = d.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 2 + _WINNOW_W
    )
    hs = tok.select(
        "doc_id", F.transform(_shingles(F.col("toks")), F.md5).alias("hs")
    )
    wins = hs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("hs") - _WINNOW_W + 1),
                lambda i: F.array_min(F.slice(F.col("hs"), i, _WINNOW_W)),
            )
        ).alias("fp"),
    )
    return wins.groupBy("doc_id", "fp").agg(F.count(F.lit(1)).alias("n_windows"))


# --------------------------------------------------------------------------
# llm_dedup_cluster_sizes — duplicate-cluster size distribution, the
# corpus diagnostic every dedup run ships with: how many near-duplicate
# clusters of each size exist, how many documents they hold, and what
# fraction of the DUPLICATED sub-corpus that is.  (Scope is the near-dup
# pair graph's nodes — singleton documents never enter a cluster; the
# distribution answers "when we dedup, what do we collapse?".)
#
# Scale shape: two tiny keyed aggregates on top of the converged
# clustering (cluster_id -> size, size -> histogram) plus a 1-row total
# broadcast — the expensive part is the clustering itself, shared with
# llm_dedup_cluster_converged and derived once there.  The histogram is
# bounded by the largest cluster size, not the corpus.
# Reference parity: dedup diagnostics reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_CLUSTER_SIZES_ORACLE = f"""
WITH {_CC_EDGES_SQL},
{_CC_STEPS_SQL},
cl AS (SELECT node AS doc_id, label AS cluster_id FROM l{_CC_ITERS}),
sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cl GROUP BY cluster_id),
tot AS (SELECT SUM(cluster_size) AS n FROM sz)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
       ROUND(SUM(cluster_size) * 1.0 / tot.n, 6) AS pct_docs
FROM sz CROSS JOIN tot
GROUP BY cluster_size, tot.n
"""


@register("llm_dedup_cluster_sizes", oracle=_CLUSTER_SIZES_ORACLE)
def llm_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cl = llm_dedup_cluster_converged(spark, sf_dir)
    sz = cl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    tot = sz.agg(F.sum("cluster_size").alias("n"))
    return (
        sz.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("cluster_size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            "n_docs",
            F.round(F.col("n_docs") * 1.0 / F.col("n"), 6).alias("pct_docs"),
        )
    )


# --------------------------------------------------------------------------
# llm_sorted_neighborhood — sorted-neighborhood blocking (the classic
# entity-resolution alternative to banded LSH): docs sort into 8-bit
# SimHash blocks, and each doc is compared ONLY with its next w-1 = 2
# neighbors inside its block (LEAD over a simhash-keyed window), scoring
# candidate pairs by exact trigram Jaccard.  Cost is O(n·w) comparisons
# after ONE keyed exchange — never all-pairs.
#
# Scale shape: featurization is fully map-side — the gram set comes from
# the shared shingle transform and the SimHash votes are computed by an
# in-array fold (8 O(tokens) aggregates over the per-token md5 list), so
# there is NO explode/groupBy/join before the single simhash-keyed window
# exchange.  Complements MinHash-LSH (llm_dedup_near): SNM trades recall
# at block boundaries for a fixed comparison budget per document.
# Runs on the augmented corpus (_aug_corpus) so near-duplicates exist.
# Reference parity: dedup SQL reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SNM_W = 3           # neighborhood width: compare with the next w-1 docs
_SNM_MIN_JACCARD = 0.3

_SNM_VOTE_SQL = ", ".join(
    f"list_sum(list_transform(hs, h -> 2 * (ascii(substr(h, {b + 1}, 1)) % 2) - 1)) AS v{b}"
    for b in range(_SIMHASH_BITS)
)

_SNM_ORACLE = f"""
WITH corpus AS ({_AUG_SQL}),
tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM corpus
  WHERE len(string_split(text, ' ')) >= 3
),
f AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs,
         list_transform(toks, t -> md5(t)) AS hs
  FROM tok
),
votes AS (SELECT doc_id, gs, {_SNM_VOTE_SQL} FROM f),
blocked AS (
  SELECT doc_id, gs, CAST({_SIMHASH_PACK_SQL} AS BIGINT) AS simhash FROM votes
),
nbr AS (
  SELECT doc_id, gs, simhash,
         LEAD(doc_id, 1) OVER w AS id1, LEAD(gs, 1) OVER w AS gs1,
         LEAD(doc_id, 2) OVER w AS id2, LEAD(gs, 2) OVER w AS gs2
  FROM blocked
  WINDOW w AS (PARTITION BY simhash ORDER BY doc_id)
),
pairs AS (
  SELECT doc_id AS doc_a, id1 AS doc_b, simhash,
         len(list_intersect(gs, gs1)) * 1.0 /
         (len(gs) + len(gs1) - len(list_intersect(gs, gs1))) AS jaccard
  FROM nbr WHERE id1 IS NOT NULL
  UNION ALL
  SELECT doc_id, id2, simhash,
         len(list_intersect(gs, gs2)) * 1.0 /
         (len(gs) + len(gs2) - len(list_intersect(gs, gs2)))
  FROM nbr WHERE id2 IS NOT NULL
)
SELECT doc_a, doc_b, simhash, ROUND(jaccard, 6) AS jaccard
FROM pairs WHERE jaccard >= {_SNM_MIN_JACCARD}
"""


@register("llm_sorted_neighborhood", oracle=_SNM_ORACLE)
def llm_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    corpus = _aug_corpus(d)
    tok = corpus.select("doc_id", F.split("text", " ").alias("toks")).filter(
        F.size("toks") >= 3
    )
    f = tok.select(
        "doc_id",
        F.array_distinct(_shingles(F.col("toks"))).alias("gs"),
        F.transform(F.col("toks"), F.md5).alias("hs"),
    )

    def _vote(b: int) -> Column:
        # in-array fold: per-token ±1 from md5 nibble parity, summed
        # map-side — no explode/groupBy (contrast llm_simhash, which
        # demonstrates the explode shape on the raw corpus).
        return F.aggregate(
            F.col("hs"),
            F.lit(0),
            lambda acc, h: acc + (2 * (F.ascii(F.substring(h, b + 1, 1)) % 2) - 1),
        )

    packed = None
    for b in range(_SIMHASH_BITS):
        term = F.when(_vote(b) > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    blocked = f.select("doc_id", "gs", packed.cast("bigint").alias("simhash"))

    w = Window.partitionBy("simhash").orderBy("doc_id")
    nbr = blocked.select(
        "doc_id",
        "gs",
        "simhash",
        F.lead("doc_id", 1).over(w).alias("id1"),
        F.lead("gs", 1).over(w).alias("gs1"),
        F.lead("doc_id", 2).over(w).alias("id2"),
        F.lead("gs", 2).over(w).alias("gs2"),
    )

    def _pair(idc: str, gsc: str) -> DataFrame:
        inter = F.size(F.array_intersect(F.col("gs"), F.col(gsc)))
        union = F.size("gs") + F.size(gsc) - inter
        return nbr.filter(F.col(idc).isNotNull()).select(
            F.col("doc_id").alias("doc_a"),
            F.col(idc).alias("doc_b"),
            "simhash",
            (inter * 1.0 / union).alias("jaccard"),
        )

    pairs = _pair("id1", "gs1").unionAll(_pair("id2", "gs2"))
    return pairs.filter(F.col("jaccard") >= _SNM_MIN_JACCARD).select(
        "doc_a", "doc_b", "simhash", F.round("jaccard", 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# llm_dedup_token_sort — bag-of-words (token-sort) duplicate detection:
# docs whose SORTED token multisets coincide are duplicates regardless of
# word order — the fuzzywuzzy token-sort idiom, catching shuffled /
# reordered plagiarism that exact hashing misses and LSH only scores
# partially.  The corpus is augmented with a reversed-token copy (+3M) of
# every doc, a guaranteed order-permutation so the key provably groups.
#
# Scale shape: the canonical key (sha256 of the sorted-token join) is
# map-side; ONE keyed aggregate groups duplicates (min doc_id keeps the
# survivor) — identical cost profile to llm_dedup_exact, just an
# order-insensitive key.
# Reference parity: dedup SQL reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_TOKEN_SORT_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 3000000,
         array_to_string(list_reverse(string_split(text, ' ')), ' ')
  FROM documents
),
k AS (
  SELECT doc_id,
         sha256(array_to_string(list_sort(string_split(lower(trim(text)), ' ')), ' '))
           AS bag_key
  FROM corpus
)
SELECT bag_key,
       MIN(doc_id) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_permutations
FROM k GROUP BY bag_key
"""


@register("llm_dedup_token_sort", oracle=_TOKEN_SORT_ORACLE)
def llm_dedup_token_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    rev = d.select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split("text", " ")), " ").alias("text"),
    )
    corpus = d.select("doc_id", "text").unionAll(rev)
    bag_key = F.sha2(
        F.array_join(F.array_sort(F.split(F.lower(F.trim("text")), " ")), " "), 256
    )
    return (
        corpus.select("doc_id", bag_key.alias("bag_key"))
        .groupBy("bag_key")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_permutations"),
        )
    )


# --------------------------------------------------------------------------
# llm_prefix_dedup — boilerplate-prefix duplicate detection: documents
# sharing their first _PREFIX_K tokens verbatim (scraped headers, license
# banners, template scaffolds) are grouped; any group with more than one
# member is flagged with its canonical representative (min doc_id) and
# size.  The prefix complement to llm_dedup_token_sort (order-insensitive
# bags) and llm_span_dedup (interior spans): real scrape corpora duplicate
# the START of documents far more often than arbitrary spans.
#
# Scale shape: the prefix key is computed map-side (slice + hash — no
# shuffle), the group statistics are ONE map-side-combining aggregate
# keyed on the 128-bit prefix hash, and the per-doc verdict is an equi
# join back on the same key (one shuffle layout reused).  The hash key
# keeps the shuffle row width constant regardless of prefix length —
# 100 TB of text shuffles 16-byte keys, not 8-token strings.
# Reference parity: dedup reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PREFIX_K = 8

_PREFIX_DEDUP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
keyed AS (
  SELECT doc_id,
         md5(array_to_string(l[1:{_PREFIX_K}], ' ')) AS pk
  FROM toks WHERE len(l) >= {_PREFIX_K}
),
grp AS (
  SELECT pk, CAST(MIN(doc_id) AS BIGINT) AS prefix_group,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM keyed GROUP BY pk
)
SELECT k.doc_id, g.prefix_group, g.group_size
FROM keyed k JOIN grp g ON k.pk = g.pk
WHERE g.group_size > 1
"""


@register("llm_prefix_dedup", oracle=_PREFIX_DEDUP_ORACLE)
def llm_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    l = F.split("text", " ")
    keyed = d.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.slice(l, 1, _PREFIX_K))).alias("pk"),
    ).filter(F.size(l) >= _PREFIX_K)
    grp = keyed.groupBy("pk").agg(
        F.min("doc_id").alias("prefix_group"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        keyed.join(grp, "pk")
        .filter(F.col("group_size") > 1)
        .select("doc_id", "prefix_group", "group_size")
    )


# --------------------------------------------------------------------------
# llm_dedup_simhash — SimHash near-dedup at Hamming distance ≤ 3 over a
# 32-bit fingerprint (one bit per md5 hex char, voting on the CHARACTER's
# ASCII-code parity — '0'..'9' alternate, 'a'..'f' alternate inverted; any
# fixed per-position hash bit works, and this one shares llm_simhash's
# convention; token votes summed).
# Candidate generation is the PIGEONHOLE band join: 4 disjoint 8-bit
# blocks — any pair within Hamming 3 agrees exactly on ≥ 1 block — so
# candidates come from 4 equi-joins on (block_idx, block_value), never
# all pairs; the same hot-bucket star cap as llm_dedup_near bounds viral
# blocks.  Candidates verify by TRUE Hamming distance (bit_count of xor)
# computed from the fingerprint table via two keyed joins.
# Cap-recall contract: within a CAPPED block only hub pairs are proposed,
# so a member–member pair whose hub fails the ≤3 verify is NOT recovered
# from that block — unlike llm_dedup_near (no post-filter there, star
# keeps components intact).  The pair still has the other 3 blocks as
# independent chances (pigeonhole), and the CCNet alternative — dropping
# hot buckets outright — loses strictly more; both engines state the
# identical capped computation, so the trade is deterministic, not drift.
# The word-order-insensitive complement to MinHash-LSH (which keys on
# shingles): SimHash catches bag-of-words-similar docs cheaply — one
# fingerprint per doc, 4 band rows, no shingle explosion.
# --------------------------------------------------------------------------

_SIMHASH32_BITS = 32
_SIMHASH32_BLOCKS = 4
_SIMHASH32_HAM_MAX = 3

_SH32_VOTE_SQL = ", ".join(
    f"SUM(2 * (ascii(substr(h, {b + 1}, 1)) % 2) - 1) AS v{b}"
    for b in range(_SIMHASH32_BITS)
)
_SH32_PACK_SQL = " + ".join(
    f"(CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for b in range(_SIMHASH32_BITS)
)

# Public like PAIRS_SQL: the full SimHash verified-pair CTE chain, shared
# with llm_candidate_compare's oracle below.  Top-level names do not
# collide with PAIRS_SQL, whose internals are scoped inside its own
# subquery.
SIMHASH_PAIRS_SQL = f"""tok AS (
  SELECT doc_id, md5(t.tok) AS h
  FROM documents, UNNEST(string_split(text, ' ')) t(tok)
),
votes AS (SELECT doc_id, {_SH32_VOTE_SQL} FROM tok GROUP BY doc_id),
fp AS (SELECT doc_id, CAST({_SH32_PACK_SQL} AS BIGINT) AS f FROM votes),
bands AS (
  SELECT doc_id, CAST(t.k AS INT) AS band,
         (f >> CAST(8 * t.k AS INT)) & 255 AS block_val
  FROM fp, range(0, {_SIMHASH32_BLOCKS}) t(k)
),
stats AS (
  SELECT band, block_val, COUNT(*) AS bsz, MIN(doc_id) AS hub
  FROM bands GROUP BY 1, 2
),
bb AS (
  SELECT b.doc_id, b.band, b.block_val, s.bsz, s.hub
  FROM bands b JOIN stats s ON b.band = s.band AND b.block_val = s.block_val
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bb a
    JOIN bb b ON a.band = b.band AND a.block_val = b.block_val
              AND a.doc_id < b.doc_id
    WHERE a.bsz <= {_HOT_BUCKET_CAP}
    UNION ALL
    SELECT hub AS doc_a, doc_id AS doc_b
    FROM bb WHERE bsz > {_HOT_BUCKET_CAP} AND doc_id <> hub
  )
),
sh_pairs AS (
  SELECT c.doc_a, c.doc_b,
         CAST(bit_count(xor(fa.f, fb.f)) AS INT) AS hamming
  FROM cand c
  JOIN fp fa ON fa.doc_id = c.doc_a
  JOIN fp fb ON fb.doc_id = c.doc_b
  WHERE bit_count(xor(fa.f, fb.f)) <= {_SIMHASH32_HAM_MAX}
)"""

_DEDUP_SIMHASH_ORACLE = f"""
WITH {SIMHASH_PAIRS_SQL}
SELECT doc_a, doc_b, hamming FROM sh_pairs
"""


@register("llm_dedup_simhash", oracle=_DEDUP_SIMHASH_ORACLE)
def llm_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Serve the registered key from the session-scoped derived table:
    # the token→votes→band→verify lineage runs ONCE per (session, sf) —
    # whichever of llm_candidate_compare / llm_dedup_simhash builds first
    # pays the materialization, the other scans parquet (round-11 task 7:
    # under box load the re-run lineage read 13.7 s vs 3.96 s quiet).
    return simhash_pairs(spark, sf_dir)


def _simhash_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).select(
        "doc_id", F.md5("tok").alias("h")
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(2 * (F.ascii(F.substring("h", b + 1, 1)) % 2) - 1).alias(f"v{b}")
            for b in range(_SIMHASH32_BITS)
        ]
    )
    packed = None
    for b in range(_SIMHASH32_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        packed = term if packed is None else packed + term
    fp = votes.select("doc_id", packed.alias("f")).localCheckpoint(eager=False)
    bands = fp.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("f", 8 * k).bitwiseAND(F.lit(255))
                    for k in range(_SIMHASH32_BLOCKS)
                ]
            )
        ).alias("band", "block_val"),
    )
    # same reuse discipline as llm_dedup_near (r13 optimization round):
    # bands feeds the stats aggregate + the join; bb feeds the self-join
    # twice + the hot branch — materialize the narrow relations once.
    bands = bands.localCheckpoint(eager=False)
    stats = bands.groupBy("band", "block_val").agg(
        F.count(F.lit(1)).alias("bsz"), F.min("doc_id").alias("hub")
    )
    bb = bands.join(stats, ["band", "block_val"]).localCheckpoint(eager=False)
    small = bb.filter(F.col("bsz") <= _HOT_BUCKET_CAP).select(
        "doc_id", "band", "block_val"
    )
    a, b = small.alias("a"), small.alias("b")
    cand_small = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.block_val") == F.col("b.block_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    cand_hot = bb.filter(
        (F.col("bsz") > _HOT_BUCKET_CAP) & (F.col("doc_id") != F.col("hub"))
    ).select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    cand = cand_small.unionByName(cand_hot).distinct()
    fa = fp.select(F.col("doc_id").alias("doc_a"), F.col("f").alias("fa"))
    fb = fp.select(F.col("doc_id").alias("doc_b"), F.col("f").alias("fb"))
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .filter(ham <= _SIMHASH32_HAM_MAX)
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
    )


# --------------------------------------------------------------------------
# llm_candidate_compare — QA diagnostic comparing the two candidate
# generators side by side: MinHash-LSH band collisions (llm_dedup_near,
# shingle-keyed, word-ORDER-sensitive) vs verified SimHash pairs
# (llm_dedup_simhash, bag-of-words, order-insensitive).  The pair-set
# Jaccard and the only-one-side counts tell a curation operator whether
# the two families disagree enough to justify running both — the
# standard dedup-pipeline ablation (CCNet/Gopher run exactly this
# comparison when choosing their near-dup stage).
#
# Scale shape: both inputs are the capped candidate generators (never
# all-pairs); the comparison itself is ONE full-outer equi-join on
# (doc_a, doc_b) followed by a single global aggregate — no new
# quadratic surface.  Single-row output.
# --------------------------------------------------------------------------

_CANDIDATE_COMPARE_ORACLE = f"""
WITH {PAIRS_SQL},
{SIMHASH_PAIRS_SQL},
agg AS (
  SELECT
    (SELECT COUNT(*) FROM pairs) AS n_minhash,
    (SELECT COUNT(*) FROM sh_pairs) AS n_simhash,
    (SELECT COUNT(*) FROM pairs JOIN sh_pairs USING (doc_a, doc_b)) AS n_both
)
SELECT CAST(n_minhash AS BIGINT) AS n_minhash,
       CAST(n_simhash AS BIGINT) AS n_simhash,
       CAST(n_both AS BIGINT) AS n_both,
       CAST(n_minhash - n_both AS BIGINT) AS only_minhash,
       CAST(n_simhash - n_both AS BIGINT) AS only_simhash,
       CASE WHEN n_minhash + n_simhash - n_both = 0 THEN 0.0
            ELSE FLOOR(n_both * 1.0 / (n_minhash + n_simhash - n_both)
                       * 1000000.0 + 0.5) / 1000000.0
       END AS pair_jaccard
FROM agg
"""


@register("llm_candidate_compare", oracle=_CANDIDATE_COMPARE_ORACLE)
def llm_candidate_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    mh = candidate_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_m")
    )
    # materialized derived table, not the live simhash lineage: both join
    # inputs are then plain parquet scans (round-10 bimodality fix)
    sh = simhash_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_s")
    )
    j = mh.join(sh, ["doc_a", "doc_b"], "full_outer")
    agg = j.agg(
        F.coalesce(F.sum("in_m"), F.lit(0)).cast("bigint").alias("n_minhash"),
        F.coalesce(F.sum("in_s"), F.lit(0)).cast("bigint").alias("n_simhash"),
        F.coalesce(F.sum(F.col("in_m") * F.col("in_s")), F.lit(0))
        .cast("bigint")
        .alias("n_both"),
    )
    nm, ns, nb = F.col("n_minhash"), F.col("n_simhash"), F.col("n_both")
    denom = nm + ns - nb
    return agg.select(
        "n_minhash",
        "n_simhash",
        "n_both",
        (nm - nb).cast("bigint").alias("only_minhash"),
        (ns - nb).cast("bigint").alias("only_simhash"),
        F.when(denom == 0, F.lit(0.0))
        .otherwise(
            F.floor(nb * 1.0 / denom * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        )
        .alias("pair_jaccard"),
    )


# --------------------------------------------------------------------------
# llm_minhash_band_tuning — the LSH design sheet: for every (bands, rows)
# split of a 128-hash MinHash budget, the S-curve threshold (1/b)^(1/r),
# detection probability 1 − (1 − s^r)^b at similarity 0.7 and 0.9, and the
# false-positive / false-negative areas against the 0.8 target threshold
# (midpoint integration, 100 steps) — the pre-flight a dedup operator runs
# BEFORE committing a band config to a 100 TB pass (the tuning table from
# the MMDS LSH treatment).  Pure analytic computation — no corpus scan;
# the 5-config × 100-step grid is literal and bounded.
#
# Cross-engine determinism: every POWER() term is quantized to 1e-6 int64
# units immediately, so the integration sums are order-free integer sums;
# grid points (i + 0.5)/100 are exact IEEE on both engines.
# --------------------------------------------------------------------------

_BAND_CONFIGS = [(4, 32), (8, 16), (16, 8), (32, 4), (64, 2)]
_TUNE_STEPS = 100
_TUNE_TARGET = 0.8


def _tune_p_sql(s: str, b: str, r: str) -> str:
    """S-curve detection probability 1 − (1 − s^r)^b, textual SQL."""
    return (
        f"(1.0 - POWER(1.0 - POWER({s}, CAST({r} AS DOUBLE)),"
        f" CAST({b} AS DOUBLE)))"
    )


_BAND_TUNE_ORACLE = f"""
WITH cfg(b, r) AS (VALUES {", ".join(f"({b}, {r})" for b, r in _BAND_CONFIGS)}),
grid AS (
  SELECT b, r, (i + 0.5) / {_TUNE_STEPS}.0 AS s
  FROM cfg, generate_series(0, {_TUNE_STEPS - 1}) t(i)
),
terms AS (
  SELECT b, r, s,
         CAST(FLOOR({_tune_p_sql("s", "b", "r")} * 1000000.0 + 0.5)
              AS BIGINT) AS pq
  FROM grid
),
area AS (
  SELECT b, r,
         CAST(SUM(CASE WHEN s < {_TUNE_TARGET} THEN pq ELSE 0 END) AS BIGINT)
           AS fp_q,
         CAST(SUM(CASE WHEN s >= {_TUNE_TARGET} THEN 1000000 - pq ELSE 0 END)
           AS BIGINT) AS fn_q
  FROM terms GROUP BY b, r
)
SELECT CAST(cfg.b AS INT) AS bands, CAST(cfg.r AS INT) AS rows_per_band,
       FLOOR(POWER(1.0 / cfg.b, 1.0 / cfg.r) * 1000000.0 + 0.5) / 1000000.0
         AS threshold,
       FLOOR({_tune_p_sql("0.7", "cfg.b", "cfg.r")} * 1000000.0 + 0.5)
         / 1000000.0 AS p_at_70,
       FLOOR({_tune_p_sql("0.9", "cfg.b", "cfg.r")} * 1000000.0 + 0.5)
         / 1000000.0 AS p_at_90,
       area.fp_q / 1000000.0 / {_TUNE_STEPS}.0 AS fp_area,
       area.fn_q / 1000000.0 / {_TUNE_STEPS}.0 AS fn_area
FROM cfg JOIN area ON area.b = cfg.b AND area.r = cfg.r
"""


@register("llm_minhash_band_tuning", oracle=_BAND_TUNE_ORACLE)
def llm_minhash_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    cfg = local_rows(spark, _BAND_CONFIGS, "b int, r int")
    steps = spark.range(_TUNE_STEPS).select(
        ((F.col("id") + 0.5) / float(_TUNE_STEPS)).alias("s")
    )
    bd, rd = F.col("b").cast("double"), F.col("r").cast("double")

    def p_curve(s):
        return 1.0 - F.pow(1.0 - F.pow(s, rd), bd)

    terms = cfg.crossJoin(steps).select(  # bounded 5x100 literal grid
        "b",
        "r",
        "s",
        F.floor(p_curve(F.col("s")) * 1_000_000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("pq"),
    )
    area = terms.groupBy("b", "r").agg(
        F.sum(F.when(F.col("s") < _TUNE_TARGET, F.col("pq")).otherwise(0))
        .cast("bigint")
        .alias("fp_q"),
        F.sum(
            F.when(F.col("s") >= _TUNE_TARGET, 1_000_000 - F.col("pq")).otherwise(0)
        )
        .cast("bigint")
        .alias("fn_q"),
    )
    return cfg.join(area, ["b", "r"]).select(
        F.col("b").alias("bands"),
        F.col("r").alias("rows_per_band"),
        (
            F.floor(F.pow(1.0 / bd, 1.0 / rd) * 1_000_000.0 + F.lit(0.5))
            / 1_000_000.0
        ).alias("threshold"),
        (
            F.floor(p_curve(F.lit(0.7)) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        ).alias("p_at_70"),
        (
            F.floor(p_curve(F.lit(0.9)) * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0
        ).alias("p_at_90"),
        (F.col("fp_q") / 1_000_000.0 / float(_TUNE_STEPS)).alias("fp_area"),
        (F.col("fn_q") / 1_000_000.0 / float(_TUNE_STEPS)).alias("fn_area"),
    )


# --------------------------------------------------------------------------
# llm_dedup_threshold_sweep — dedup-threshold sensitivity sheet: over the
# VERIFIED candidate pairs (banded LSH proposes, true 3-gram Jaccard
# verifies — the llm_dedup_lsh_verified derivation, run once), the pair
# count, affected-document count, and the keep-lowest removal bound at
# each τ on the 0.5–0.9 grid — the table a dedup owner reads before
# committing a threshold to a 100 TB pass (the execution-side companion
# to llm_minhash_band_tuning's analytic S-curves).  The removal bound
# counts distinct higher-id pair members (pairwise, not transitive — the
# connected-components keys own transitive closure).
#
# Scale shape: the expensive verify runs ONCE; the sweep is the verified
# pair list × a 5-row literal grid (allowlisted) and two keyed counts
# per τ.
# --------------------------------------------------------------------------

_SWEEP_TAUS = ("0.5", "0.6", "0.7", "0.8", "0.9")

_THRESHOLD_SWEEP_ORACLE = f"""
WITH verified AS ({_LSH_VERIFIED_ORACLE}),
grid AS (SELECT CAST(t AS DOUBLE) AS tau
         FROM (SELECT unnest([{", ".join(_SWEEP_TAUS)}]) AS t)),
hits AS (
  SELECT g.tau, v.doc_a, v.doc_b
  FROM verified v JOIN grid g ON v.jaccard >= g.tau
)
SELECT g.tau,
       CAST(COALESCE(COUNT(h.doc_a), 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(COUNT(DISTINCT h.doc_a) + COUNT(DISTINCT h.doc_b), 0)
            AS BIGINT) AS n_endpoint_ids,
       CAST(COALESCE(COUNT(DISTINCT h.doc_b), 0) AS BIGINT) AS n_removed_bound
FROM grid g LEFT JOIN hits h ON h.tau = g.tau
GROUP BY g.tau
"""


@register("llm_dedup_threshold_sweep", oracle=_THRESHOLD_SWEEP_ORACLE)
def llm_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    verified = llm_dedup_lsh_verified(spark, sf_dir).localCheckpoint(
        eager=True
    )  # the expensive verify runs once; 5 grid consumers
    grid = local_rows(spark, 
        [(float(t),) for t in _SWEEP_TAUS], "tau double"
    )
    hits = verified.join(
        F.broadcast(grid), verified["jaccard"] >= F.col("tau")
    ).select("tau", "doc_a", "doc_b")
    return (
        grid.join(hits, "tau", "left")
        .groupBy("tau")
        .agg(
            F.count("doc_a").cast("bigint").alias("n_pairs"),
            (F.countDistinct("doc_a") + F.countDistinct("doc_b"))
            .cast("bigint")
            .alias("n_endpoint_ids"),
            F.countDistinct("doc_b").cast("bigint").alias("n_removed_bound"),
        )
    )


# --------------------------------------------------------------------------
# llm_bloom_dedup — cross-corpus membership via a Bloom filter (the
# CCNet/Dolma trick for deduplicating a NEW shard against an existing
# corpus WITHOUT joining it: the corpus compresses to an m-bit filter that
# broadcasts to every probe task).  Corpus A = the documents table; probe
# set B = exact copies of docs < 100 (true members — the Bloom no-false-
# negative invariant makes every one flag) plus first-word-stripped
# variants of every doc (non-members — only false positives can flag).
# k = 3 index functions from disjoint md5 slices; m = 32768 bits packed as
# 1024 int64 words of 32 used bits each (32-bit payloads keep every shift
# clear of the sign bit on BOTH engines — the fn_bitpack_roundtrip trap).
#
# Scale shape: the build is one keyed bit_or aggregate (m/32 rows
# regardless of corpus size); the probe joins only the 1024-row word
# table (AQE broadcasts it — exactly how a production Bloom probe is a
# map-side test).  The exact-membership columns are the QA readout that
# prices the filter's false-positive rate on real data (the llm_ann_recall
# pattern: sketch + truth side-by-side).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_BLOOM_M = 32768
_BLOOM_K = 3
_BLOOM_WORD = 32

_BLOOM_DEDUP_ORACLE = f"""
WITH norm AS (
  SELECT doc_id, source, md5(lower(trim(text))) AS h, text FROM documents
),
probe_set AS (
  SELECT doc_id + 1000000 AS probe_id, source,
         md5(lower(trim(text))) AS h
  FROM norm WHERE doc_id < 100
  UNION ALL
  SELECT doc_id + 2000000 AS probe_id, source,
         md5(lower(trim(substr(text, instr(text, ' ') + 1)))) AS h
  FROM norm
),
a_bits AS (
  SELECT DISTINCT
         CAST(CAST('0x' || substr(h, CAST(j.j * 8 + 1 AS INT), 8) AS BIGINT)
              % {_BLOOM_M} AS BIGINT) AS bitidx
  FROM norm, generate_series(0, {_BLOOM_K - 1}) j(j)
),
words AS (
  SELECT bitidx // {_BLOOM_WORD} AS word,
         bit_or(1::BIGINT << CAST(bitidx % {_BLOOM_WORD} AS INT)) AS bits
  FROM a_bits GROUP BY bitidx // {_BLOOM_WORD}
),
probe_bits AS (
  SELECT p.probe_id, p.source, p.h,
         CAST(CAST('0x' || substr(p.h, CAST(j.j * 8 + 1 AS INT), 8) AS BIGINT)
              % {_BLOOM_M} AS BIGINT) AS bitidx
  FROM probe_set p, generate_series(0, {_BLOOM_K - 1}) j(j)
),
probed AS (
  SELECT pb.probe_id, pb.source, pb.h,
         MIN(CASE WHEN (COALESCE(w.bits, 0)
                        >> CAST(pb.bitidx % {_BLOOM_WORD} AS INT)) & 1 = 1
                  THEN 1 ELSE 0 END) AS flagged
  FROM probe_bits pb
  LEFT JOIN words w ON w.word = pb.bitidx // {_BLOOM_WORD}
  GROUP BY pb.probe_id, pb.source, pb.h
),
truth AS (SELECT DISTINCT h FROM norm)
SELECT p.source,
       CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(p.flagged) AS BIGINT) AS n_flagged,
       CAST(SUM(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_members,
       CAST(SUM(CASE WHEN p.flagged = 1 AND t.h IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       FLOOR(SUM(CASE WHEN p.flagged = 1 AND t.h IS NULL THEN 1 ELSE 0 END)
             * 1000000.0 / COUNT(*) + 0.5) / 1000000.0 AS fp_rate
FROM probed p LEFT JOIN truth t ON t.h = p.h
GROUP BY p.source
"""


def _bloom_bitidx(h, j: int):
    return (
        F.conv(F.substring(h, j * 8 + 1, 8), 16, 10).cast("bigint") % _BLOOM_M
    )


@register("llm_bloom_dedup", oracle=_BLOOM_DEDUP_ORACLE)
def llm_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id", "source", F.md5(F.lower(F.trim("text"))).alias("h"), "text"
    )
    probe_set = (
        norm.filter(F.col("doc_id") < 100)
        .select((F.col("doc_id") + 1000000).alias("probe_id"), "source", "h")
        .unionAll(
            norm.select(
                (F.col("doc_id") + 2000000).alias("probe_id"),
                "source",
                F.md5(
                    F.lower(F.trim(F.expr("substr(text, instr(text, ' ') + 1)")))
                ).alias("h"),
            )
        )
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(_BLOOM_K)])).alias("j")
    a_bits = (
        norm.select(js, "h")
        .select(
            F.conv(
                F.expr(f"substring(h, j * 8 + 1, 8)"), 16, 10
            ).cast("bigint").__mod__(_BLOOM_M).alias("bitidx")
        )
        .distinct()
    )
    # shiftleft/shiftright take a literal bit count in the Python API —
    # column-valued shifts go through expr()
    words = a_bits.groupBy(
        (F.col("bitidx") / _BLOOM_WORD).cast("bigint").alias("word")
    ).agg(
        F.bit_or(
            F.expr(f"shiftleft(1L, CAST(bitidx % {_BLOOM_WORD} AS INT))")
        ).alias("bits")
    )
    probe_bits = probe_set.select(
        "probe_id", "source", "h", js
    ).select(
        "probe_id",
        "source",
        "h",
        F.conv(F.expr("substring(h, j * 8 + 1, 8)"), 16, 10)
        .cast("bigint")
        .__mod__(_BLOOM_M)
        .alias("bitidx"),
    )
    probed = (
        probe_bits.join(
            words,
            (F.col("bitidx") / _BLOOM_WORD).cast("bigint") == F.col("word"),
            "left",
        )
        .select(
            "probe_id",
            "source",
            "h",
            F.when(
                F.expr(
                    f"shiftright(COALESCE(bits, 0L),"
                    f" CAST(bitidx % {_BLOOM_WORD} AS INT)) & 1"
                )
                == 1,
                1,
            )
            .otherwise(0)
            .alias("bit_set"),
        )
        .groupBy("probe_id", "source", "h")
        .agg(F.min("bit_set").alias("flagged"))
    )
    truth = norm.select("h").distinct().withColumn("member", F.lit(1))
    return (
        probed.join(truth, "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.sum("flagged").cast("bigint").alias("n_flagged"),
            F.count("member").cast("bigint").alias("n_members"),
            F.sum(
                F.when((F.col("flagged") == 1) & F.col("member").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_false_pos"),
            (
                F.floor(
                    F.sum(
                        F.when(
                            (F.col("flagged") == 1) & F.col("member").isNull(), 1
                        ).otherwise(0)
                    )
                    * 1_000_000.0
                    / F.count(F.lit(1))
                    + F.lit(0.5)
                )
                / 1_000_000.0
            ).alias("fp_rate"),
        )
    )


# --------------------------------------------------------------------------
# llm_minhash_containment — ASYMMETRIC containment on the shared candidate
# pairs (Broder 1997's containment C(A,B) = |A∩B|/|A|, the quantity
# resemblance-Jaccard cannot see): a short document quoted whole inside a
# long one has tiny Jaccard but containment ≈ 1 — exactly the
# quote/excerpt contamination case llm_dedup_near under-flags.  Candidates
# come from the ONE shared MinHash-LSH pair table (featurize-once); the
# containment itself is EXACT — distinct-shingle intersection counted per
# candidate pair — so the sketch only proposes, never decides.
#
# Scale shape: pair list is LSH-bounded (never all-pairs); the exact
# intersection joins the (doc, shingle) relation to the pair table on doc
# key then on shingle equality — work ∝ Σ shingles over candidate docs,
# not corpus².  Sizes ride the same shingle relation.
#
# Parity: counts are exact integers; ratios q6; direction thresholds at
# the shared 0.9 literal.  The augmented corpus guarantees true
# containments exist (a first-token-dropped copy's shingle set is a
# strict subset of its source's).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_CONTAIN_TAU = 0.9

_CONTAIN_ORACLE = f"""
WITH {PAIRS_SQL},
corpus AS ({_AUG_SQL}),
sh AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform({_SHINGLES_SQL},
                                                     x -> md5(x)))) AS h
  FROM corpus WHERE len(string_split(text,' ')) >= 3
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.doc_a, p.doc_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM pairs p
  JOIN sh a ON a.doc_id = p.doc_a
  JOIN sh b ON b.doc_id = p.doc_b AND b.h = a.h
  GROUP BY p.doc_a, p.doc_b
),
scored AS (
  SELECT i.doc_a, i.doc_b, i.i AS inter_size,
         FLOOR(i.i * 1.0 / sa.sz * 1000000.0 + 0.5) / 1000000.0 AS cont_a_in_b,
         FLOOR(i.i * 1.0 / sb.sz * 1000000.0 + 0.5) / 1000000.0 AS cont_b_in_a
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, inter_size, cont_a_in_b, cont_b_in_a,
       CASE WHEN cont_a_in_b >= {_CONTAIN_TAU} AND cont_b_in_a >= {_CONTAIN_TAU}
              THEN 'mutual'
            WHEN cont_a_in_b >= {_CONTAIN_TAU} THEN 'a_in_b'
            ELSE 'b_in_a' END AS direction
FROM scored
WHERE cont_a_in_b >= {_CONTAIN_TAU} OR cont_b_in_a >= {_CONTAIN_TAU}
"""


@register("llm_minhash_containment", oracle=_CONTAIN_ORACLE)
def llm_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = candidate_pairs(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    corpus = _aug_corpus(docs)
    toks = F.split(F.col("text"), " ")
    sh = (
        corpus.select("doc_id", toks.alias("toks"))
        .filter(F.size(F.col("toks")) >= 3)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(_shingles(F.col("toks")), lambda x: F.md5(x))
                )
            ).alias("h"),
        )
        .localCheckpoint(eager=True)  # intersection (×2 sides) + sizes
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    scored = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("i").alias("inter_size"),
            (
                F.floor(F.col("i") * 1.0 / F.col("sza") * 1_000_000.0 + F.lit(0.5))
                / 1_000_000.0
            ).alias("cont_a_in_b"),
            (
                F.floor(F.col("i") * 1.0 / F.col("szb") * 1_000_000.0 + F.lit(0.5))
                / 1_000_000.0
            ).alias("cont_b_in_a"),
        )
    )
    ca, cb = F.col("cont_a_in_b"), F.col("cont_b_in_a")
    return scored.filter((ca >= _CONTAIN_TAU) | (cb >= _CONTAIN_TAU)).select(
        "doc_a",
        "doc_b",
        "inter_size",
        "cont_a_in_b",
        "cont_b_in_a",
        F.when((ca >= _CONTAIN_TAU) & (cb >= _CONTAIN_TAU), "mutual")
        .when(ca >= _CONTAIN_TAU, "a_in_b")
        .otherwise("b_in_a")
        .alias("direction"),
    )
