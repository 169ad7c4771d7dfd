"""Document chunking + text scrubbing — core LLM training-data prep stages.

Chunking: overlapping token windows (size 50, stride 40) per document —
the pre-tokenization shape for context-window packing.  Map-side explode;
output rows ≈ docs × (tokens/stride), linear at any scale.

Scrubbing: global regex redaction (the PII-scrub shape — here digit runs,
since the synthetic corpus has no real PII; the mechanism is identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load
from nedp_etl_spark.registry import register

_CHUNK = 50
_STRIDE = 40

_CHUNKING_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
spans AS (
  -- per-doc chunk spine via the LIST-valued range() + unnest (the TABLE
  -- function range() cannot take lateral column args; a fixed-width spine
  -- would silently cap chunks per doc on longer-document fixtures)
  SELECT doc_id, t,
         CAST(unnest(range(0, 1 + CAST(floor(greatest(len(t) - {_CHUNK}, 0) * 1.0 / {_STRIDE}) AS BIGINT))) AS INT) AS chunk_id
  FROM tok
)
SELECT doc_id, chunk_id,
       array_to_string(list_slice(t, chunk_id * {_STRIDE} + 1, chunk_id * {_STRIDE} + {_CHUNK}), ' ') AS chunk_text,
       len(list_slice(t, chunk_id * {_STRIDE} + 1, chunk_id * {_STRIDE} + {_CHUNK})) AS chunk_tokens
FROM spans
"""


@register("llm_chunking", oracle=_CHUNKING_ORACLE)
def llm_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.split("text", " ").alias("t"))
    n_chunks = 1 + F.floor(
        F.greatest(F.size("t") - _CHUNK, F.lit(0)) * 1.0 / _STRIDE
    ).cast("bigint")
    spans = tok.select(
        "doc_id",
        "t",
        F.posexplode(F.sequence(F.lit(1), n_chunks)).alias("chunk_id", "_one"),
    ).select(
        "doc_id",
        "t",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        (F.col("chunk_id") * _STRIDE + 1).cast("int").alias("start_tok"),
    )
    piece = F.slice(F.col("t"), F.col("start_tok"), F.lit(_CHUNK))
    return spans.select(
        "doc_id",
        "chunk_id",
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("bigint").alias("chunk_tokens"),
    )


_SCRUB_ORACLE = """
SELECT doc_id,
       regexp_replace(text, '[0-9]+', '<NUM>', 'g') AS scrubbed,
       len(regexp_extract_all(text, '[0-9]+')) AS n_redactions
FROM documents WHERE doc_id < 300
"""


@register("llm_pii_scrub", oracle=_SCRUB_ORACLE)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return d.select(
        "doc_id",
        F.regexp_replace("text", "[0-9]+", "<NUM>").alias("scrubbed"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).cast("bigint").alias(
            "n_redactions"
        ),
    )


# --------------------------------------------------------------------------
# llm_seq_packing — pack documents into fixed token-budget training
# sequences: running token count in doc_id order, floor-divided by the
# context budget.  The global prefix sum is two-phase so no single task ever
# holds the corpus: range-partition by doc_id, per-partition running sums
# (window keyed by the physical partition id — balanced, never global),
# then a bounded collect of the ~num-partitions partial totals whose
# cumulative offsets are broadcast-joined back.  Scales as one range
# shuffle + one balanced hash shuffle regardless of corpus size.
# --------------------------------------------------------------------------

_PACK_CAP = 512

_SEQ_PACKING_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(floor((cum - n_tokens) / {_PACK_CAP}) AS BIGINT) AS pack_id,
       CAST(cum - n_tokens - floor((cum - n_tokens) / {_PACK_CAP}) * {_PACK_CAP} AS BIGINT) AS offset_in_pack
FROM c
"""


@register("llm_seq_packing", oracle=_SEQ_PACKING_ORACLE)
def llm_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sum

    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"))
    c = global_running_sum(t, ["doc_id"], F.col("n_tokens"), "cum")
    start = F.col("cum") - F.col("n_tokens")
    pack = F.floor(start / _PACK_CAP)
    return c.select(
        "doc_id",
        "n_tokens",
        pack.cast("bigint").alias("pack_id"),
        (start - pack * _PACK_CAP).cast("bigint").alias("offset_in_pack"),
    )


# --------------------------------------------------------------------------
# llm_html_extract — web-page boilerplate removal, the first stage of any
# crawl-derived training corpus: drop non-content elements (nav / footer /
# ad blocks), strip remaining markup, collapse whitespace.  The synthetic
# page is deterministically derived from (doc_id, source, text) on BOTH
# sides — the llm_url_dedup pattern — so the oracle exercises the identical
# extraction contract, and the round-trip flag (extracted == original
# body text) proves the pipeline is lossless on content.  Pure map-side
# regexp chains (Java regex and RE2 agree on this subset: explicit
# alternation, non-greedy spans, NO backreferences — RE2 has none); zero
# shuffles, linear at any corpus size.
# Reference parity: text extraction reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_HTML_SQL = (
    "'<html><head><title>' || source || '-' || doc_id || "
    "'</title></head><body><nav>Home | About</nav>"
    "<div class=\"ad\">Buy now!</div><p>' || text || "
    "'</p><footer>(c) example.com</footer></body></html>'"
)

_BOILERPLATE_RX = (
    '<head>.*?</head>|<nav>.*?</nav>|<footer>.*?</footer>'
    '|<div class="ad">.*?</div>'
)

_HTML_EXTRACT_ORACLE = f"""
WITH page AS (
  SELECT doc_id, text, {_HTML_SQL} AS html FROM documents WHERE doc_id < 300
),
stripped AS (
  SELECT doc_id, text, html,
         trim(regexp_replace(regexp_replace(regexp_replace(html,
              '{_BOILERPLATE_RX}', ' ', 'g'),
              '<[^>]*>', ' ', 'g'),
              ' +', ' ', 'g')) AS extracted
  FROM page
)
SELECT doc_id, extracted,
       CAST(LENGTH(extracted) AS BIGINT) AS n_chars_kept,
       ROUND(LENGTH(extracted) * 1.0 / LENGTH(html), 6) AS keep_ratio,
       (extracted = text) AS roundtrip_clean
FROM stripped
"""


@register("llm_html_extract", oracle=_HTML_EXTRACT_ORACLE)
def llm_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    html = F.concat(
        F.lit("<html><head><title>"),
        F.col("source"),
        F.lit("-"),
        F.col("doc_id").cast("string"),
        F.lit('</title></head><body><nav>Home | About</nav>'
              '<div class="ad">Buy now!</div><p>'),
        F.col("text"),
        F.lit("</p><footer>(c) example.com</footer></body></html>"),
    )
    page = d.select("doc_id", "text", html.alias("html"))
    extracted = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.col("html"), _BOILERPLATE_RX, " "),
                "<[^>]*>",
                " ",
            ),
            " +",
            " ",
        )
    )
    s = page.select("doc_id", "text", "html", extracted.alias("extracted"))
    return s.select(
        "doc_id",
        "extracted",
        F.length("extracted").cast("bigint").alias("n_chars_kept"),
        F.round(F.length("extracted") * 1.0 / F.length("html"), 6).alias("keep_ratio"),
        (F.col("extracted") == F.col("text")).alias("roundtrip_clean"),
    )


# --------------------------------------------------------------------------
# llm_shard_balance — data-parallel shard assignment with token balancing:
# docs rank by token count (desc) and deal to W=8 workers in SNAKE order
# (worker 0..7 then 7..0), the deterministic one-pass approximation of
# longest-processing-time scheduling — consecutive heavy docs land on
# different workers and each worker's total stays within one max-doc of
# optimal per round-trip.  The shape every multi-epoch training job runs
# to keep ranks stride-balanced without a driver-side bin packer.
#
# Scale shape: one global rank (the two-phase prefix-sum discipline would
# apply at 100 TB; at fixture scale a single ROW_NUMBER sort suffices and
# the ORDER key is (tokens, doc_id) — total, so both engines agree), then
# a map-side worker formula and one tiny keyed aggregate.  Integer
# arithmetic end-to-end.
# Reference parity: sharding SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SHARD_W = 8

_SHARD_ORACLE = f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS rk
  FROM t
),
a AS (
  SELECT doc_id, n_tokens,
         CASE WHEN (rk // {_SHARD_W}) % 2 = 0
              THEN rk % {_SHARD_W}
              ELSE {_SHARD_W - 1} - rk % {_SHARD_W} END AS worker
  FROM r
)
SELECT worker,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(MIN(n_tokens) AS BIGINT) AS min_doc_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens
FROM a GROUP BY worker
"""


@register("llm_shard_balance", oracle=_SHARD_ORACLE)
def llm_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sum

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    ).withColumn("neg_tokens", -F.col("n_tokens"))
    # global rank WITHOUT a single-partition window: the two-phase prefix
    # sum over (−tokens, doc_id) is a scalable ROW_NUMBER (value = 1)
    r = global_running_sum(
        t, ["neg_tokens", "doc_id"], F.lit(1), "rk1"
    ).withColumn("rk", F.col("rk1") - 1)
    rnd = (F.col("rk") / _SHARD_W).cast("long")
    pos = F.col("rk") % _SHARD_W
    worker = F.when(rnd % 2 == 0, pos).otherwise(_SHARD_W - 1 - pos)
    return (
        r.withColumn("worker", worker)
        .groupBy("worker")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("n_tokens").cast("bigint").alias("min_doc_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_doc_tokens"),
        )
    )


# --------------------------------------------------------------------------
# llm_dataset_interleave — deterministic fixed-ratio corpus mixing (the
# interleave_datasets shape behind curriculum/mixture training): English
# docs and the rest interleave 3:1 into one globally-ordered stream with
# NO RNG — group-A item i takes slot (i//3)·4 + i%3, group-B item j takes
# slot j·4 + 3, so every window of 4 consecutive slots holds exactly
# 3 A's and 1 B until a side exhausts.  Retry-reproducible and
# shard-stable, the same reasons llm_stratified_sample hashes instead of
# sampling.
#
# Scale shape: per-group rank WITHOUT a 2-partition keyed window (two
# giant groups would skew): ONE two-phase prefix sum over (grp, doc_id)
# gives a global rank; per-group rank = global rank − group's min rank
# (a 2-row broadcast).  Slot math is then map-side integer arithmetic.
# Reference parity: mixing SQL reaches the reference only as dbt-model
# SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_INTERLEAVE_RA = 3  # A (en) parts per cycle
_INTERLEAVE_CYCLE = 4  # cycle length (A parts + 1 B part)

_INTERLEAVE_ORACLE = f"""
WITH g AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS grp
  FROM documents
),
r AS (
  SELECT doc_id, grp,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY doc_id) - 1 AS i
  FROM g
)
SELECT doc_id, grp,
       CASE WHEN grp = 0
            THEN (i // {_INTERLEAVE_RA}) * {_INTERLEAVE_CYCLE} + i % {_INTERLEAVE_RA}
            ELSE i * {_INTERLEAVE_CYCLE} + {_INTERLEAVE_RA} END AS mix_pos
FROM r
"""


@register("llm_dataset_interleave", oracle=_INTERLEAVE_ORACLE)
def llm_dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sum

    d = load(spark, sf_dir, "documents")
    g = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 0).otherwise(1).alias("grp"),
    )
    # global rank over (grp, doc_id): groups are contiguous in the range
    # layout, so per-group rank = global rank − the group's first rank
    rk = global_running_sum(g, ["grp", "doc_id"], F.lit(1), "grk")
    starts = rk.groupBy("grp").agg(F.min("grk").alias("g0"))
    r = rk.join(F.broadcast(starts), "grp").select(
        "doc_id", "grp", (F.col("grk") - F.col("g0")).alias("i")
    )
    pos_a = (F.col("i") / _INTERLEAVE_RA).cast("long") * _INTERLEAVE_CYCLE + (
        F.col("i") % _INTERLEAVE_RA
    )
    pos_b = F.col("i") * _INTERLEAVE_CYCLE + _INTERLEAVE_RA
    return r.select(
        "doc_id",
        "grp",
        F.when(F.col("grp") == 0, pos_a).otherwise(pos_b).alias("mix_pos"),
    )


# --------------------------------------------------------------------------
# llm_cdc_chunking — content-defined chunking (the FastCDC/rsync idea at
# token granularity): a chunk boundary falls AFTER any token whose hash
# lands in 1/8 of the hash space, so boundaries — and therefore chunk
# hashes — depend only on content, not position.  Insert one sentence at
# the front of a document and every chunk after the next boundary still
# hashes identically: the property that makes chunk-level dedup robust to
# shifts, where fixed-width chunking resyncs never.
#
# Boundary predicate (engine-portable): hexval(md5(token)[2]) % 8 == 0 —
# the second hex digit alone decides, because 16 ≡ 0 (mod 8) makes the
# first digit irrelevant to byte % 8.  Everything is array-native and
# MAP-SIDE (no shuffle at all before the output explode): starts/ends
# assemble from a filtered index sequence, chunk hashes are md5 of the
# sliced token span.
# --------------------------------------------------------------------------

_CDC_HEXVAL = (
    "CASE WHEN ascii(substr(md5({t}), 2, 1)) >= 97 "
    "THEN ascii(substr(md5({t}), 2, 1)) - 87 "
    "ELSE ascii(substr(md5({t}), 2, 1)) - 48 END"
)

_CDC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
marks AS (
  SELECT doc_id, l,
         list_filter(range(1, len(l)),
                     i -> ({_CDC_HEXVAL.format(t='l[i]')}) % 8 = 0) AS bs
  FROM toks WHERE len(l) >= 1
),
se AS (
  SELECT doc_id, l,
         list_prepend(1, list_transform(bs, b -> b + 1)) AS starts,
         list_append(bs, len(l)) AS ends
  FROM marks
)
SELECT doc_id, CAST(t.k - 1 AS INT) AS chunk_idx,
       CAST(ends[CAST(t.k AS INT)] - starts[CAST(t.k AS INT)] + 1 AS INT) AS n_tokens,
       md5(array_to_string(l[starts[CAST(t.k AS INT)]:ends[CAST(t.k AS INT)]], ' ')) AS chunk_hash
FROM se, UNNEST(range(1, len(starts) + 1)) t(k)
"""


@register("llm_cdc_chunking", oracle=_CDC_ORACLE)
def llm_cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size("l")

    def _hexval(tok):
        a = F.ascii(F.substring(F.md5(tok), 2, 1))
        return F.when(a >= 97, a - 87).otherwise(a - 48)

    # boundary indices 1..n-1 (a boundary at the last token would open an
    # empty chunk); sequence() descends when start > stop, so guard n < 2
    bs = F.when(
        n >= 2,
        F.filter(
            F.sequence(F.lit(1), n - 1),
            lambda i: _hexval(F.element_at(F.col("l"), i)) % 8 == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    base = d.filter(F.size(toks) >= 1).select(
        "doc_id", toks.alias("l")
    ).select("doc_id", "l", bs.alias("bs"))
    se = base.select(
        "doc_id",
        "l",
        F.concat(F.array(F.lit(1)), F.transform("bs", lambda b: b + 1)).alias("starts"),
        F.concat(F.col("bs"), F.array(n)).alias("ends"),
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("starts")),
        lambda k: F.struct(
            (k - 1).cast("int").alias("chunk_idx"),
            (
                F.element_at(F.col("ends"), k) - F.element_at(F.col("starts"), k) + 1
            ).cast("int").alias("n_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("l"),
                        F.element_at(F.col("starts"), k),
                        F.element_at(F.col("ends"), k)
                        - F.element_at(F.col("starts"), k)
                        + 1,
                    ),
                )
            ).alias("chunk_hash"),
        ),
    )
    return (
        se.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.n_tokens", "c.chunk_hash")
    )


# --------------------------------------------------------------------------
# llm_pack_utilization — packing QA over llm_seq_packing's assignment: a
# document belongs to the pack its RUNNING-OFFSET start falls in and
# never splits, so a doc can straddle its pack boundary; this operator
# publishes the per-pack fill census a training-loader owner reads before
# trusting the shards — docs per pack, fill tokens, utilization vs the
# 512 budget, and the straddle flag.  Same two-phase prefix
# sum as the packer (util.global_running_sum — no global window).
#
# Determinism: all masses are exact int64 token counts; utilization is
# one q6-quantized division per pack.
# --------------------------------------------------------------------------

_PACK_UTIL_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
),
p AS (
  SELECT CAST(floor((cum - n_tokens) / {_PACK_CAP}) AS BIGINT) AS pack_id,
         n_tokens, cum
  FROM c
),
g AS (
  SELECT pack_id,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS fill_tokens,
         CAST(MAX(cum) AS BIGINT) AS end_cum
  FROM p GROUP BY pack_id
)
SELECT pack_id, n_docs, fill_tokens,
       FLOOR(CAST(fill_tokens AS DOUBLE) / {_PACK_CAP} * 1000000.0 + 0.5)
         / 1000000.0 AS utilization,
       end_cum > (pack_id + 1) * {_PACK_CAP} AS straddles_next
FROM g
"""


@register("llm_pack_utilization", oracle=_PACK_UTIL_ORACLE)
def llm_pack_utilization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sum

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    c = global_running_sum(t, ["doc_id"], F.col("n_tokens"), "cum")
    p = c.select(
        F.floor((F.col("cum") - F.col("n_tokens")) / _PACK_CAP)
        .cast("bigint")
        .alias("pack_id"),
        "n_tokens",
        "cum",
    )
    g = p.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("fill_tokens"),
        F.max("cum").cast("bigint").alias("end_cum"),
    )
    return g.select(
        "pack_id",
        "n_docs",
        "fill_tokens",
        (
            F.floor(
                F.col("fill_tokens").cast("double") / _PACK_CAP * 1_000_000.0
                + F.lit(0.5)
            )
            / 1_000_000.0
        ).alias("utilization"),
        (F.col("end_cum") > (F.col("pack_id") + 1) * _PACK_CAP).alias(
            "straddles_next"
        ),
    )


# --------------------------------------------------------------------------
# llm_packing_attention_mask — the varlen-attention sidecar for packed
# training sequences (the `cu_seqlens` input of FlashAttention varlen /
# the document-mask of packed pretraining): extend llm_seq_packing's
# start-offset assignment to FULL document segmentation — a document
# spanning pack boundaries contributes one segment per pack it crosses —
# and emit, per pack, the 0-prefixed cumulative segment lengths plus how
# many segments continue a document from an earlier pack (those get
# position-id resets but must NOT attend to their prefix — the exact
# metadata a trainer needs to mask cross-document attention).
#
# Scale shape: the same two-phase global prefix sum as llm_seq_packing
# (range partition + per-pid windows + bounded offset collect — never a
# global window); segmentation explodes each doc into ≤ ⌈n/cap⌉+1
# segments map-side; per-pack windows are bounded by the cap (≤ cap
# segments per pack).  Exact integers end to end.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_MASK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
c AS (
  SELECT doc_id, n,
         SUM(n) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
           AS start
  FROM t WHERE n > 0
),
seg AS (
  SELECT c.doc_id,
         CAST(p.p AS BIGINT) AS pack_id,
         GREATEST(c.start, p.p * {_PACK_CAP}) - p.p * {_PACK_CAP} AS seg_off,
         LEAST(c.start + c.n, (p.p + 1) * {_PACK_CAP})
           - GREATEST(c.start, p.p * {_PACK_CAP}) AS seg_len,
         p.p > CAST(FLOOR(c.start / {_PACK_CAP}) AS BIGINT) AS is_cont
  FROM c, UNNEST(range(CAST(FLOOR(c.start / {_PACK_CAP}) AS BIGINT),
                       CAST(FLOOR((c.start + c.n - 1) / {_PACK_CAP}) AS BIGINT)
                       + 1)) p(p)
),
cum AS (
  SELECT pack_id, seg_off, seg_len, is_cont,
         CAST(SUM(seg_len) OVER (PARTITION BY pack_id ORDER BY seg_off
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cu
  FROM seg
)
SELECT pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(seg_len) AS BIGINT) AS pack_tokens,
       CAST(SUM(CASE WHEN is_cont THEN 1 ELSE 0 END) AS BIGINT)
         AS n_continuations,
       array_to_string(list_prepend(CAST(0 AS BIGINT),
                                    list(cu ORDER BY seg_off)), '|')
         AS cu_seqlens
FROM cum GROUP BY pack_id
"""


@register("llm_packing_attention_mask", oracle=_MASK_ORACLE)
def llm_packing_attention_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from nedp_etl_spark.util import global_running_sum

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n")
    ).filter(F.col("n") > 0)
    c = global_running_sum(t, ["doc_id"], F.col("n"), "cum").withColumn(
        "start", F.col("cum") - F.col("n")
    )
    p0 = F.floor(F.col("start") / _PACK_CAP).cast("bigint")
    p1 = F.floor((F.col("start") + F.col("n") - 1) / _PACK_CAP).cast("bigint")
    seg = c.select(
        "doc_id",
        "start",
        "n",
        F.explode(F.sequence(p0, p1)).alias("pack_id"),
        p0.alias("p0"),
    ).select(
        "pack_id",
        (
            F.greatest(F.col("start"), F.col("pack_id") * _PACK_CAP)
            - F.col("pack_id") * _PACK_CAP
        ).alias("seg_off"),
        (
            F.least(F.col("start") + F.col("n"), (F.col("pack_id") + 1) * _PACK_CAP)
            - F.greatest(F.col("start"), F.col("pack_id") * _PACK_CAP)
        ).alias("seg_len"),
        (F.col("pack_id") > F.col("p0")).alias("is_cont"),
    )
    w = (
        Window.partitionBy("pack_id")
        .orderBy("seg_off")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = seg.withColumn("cu", F.sum("seg_len").over(w).cast("bigint"))
    return cum.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("seg_len").cast("bigint").alias("pack_tokens"),
        F.sum(F.when(F.col("is_cont"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_continuations"),
        # |-joined string, not array<bigint>: the driver's pandas
        # canonicalizer sort_values-es every output column and a raw list
        # column is unhashable (round-10 incident) — container types must
        # never appear in a registered query's top-level output schema.
        F.concat_ws(
            "|",
            F.concat(
                F.array(F.lit(0).cast("bigint")),
                F.transform(
                    F.sort_array(F.collect_list(F.struct("seg_off", "cu"))),
                    lambda x: x["cu"],
                ),
            ).cast("array<string>"),
        ).alias("cu_seqlens"),
    )
