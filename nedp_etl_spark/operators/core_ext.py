"""Second-wave core operators: deterministic hash sampling, struct
construction/access, median+mode aggregation, sequence generation, and
dynamic partition overwrite.

All are plain DataFrame compositions (reference parity: arbitrary dbt-model
SQL on Spark, ``dbtoperator.py:273-274``); the sampling and
partition-overwrite entries are the two patterns a 100 TB deployment leans
on hardest — content-hash sampling is reproducible across runs/engines and
pushes into the scan, and dynamic overwrite rewrites only the partitions a
batch touches instead of the whole table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load, local_rows
from nedp_etl_spark.operators.scans import _scratch, _sf_tag
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum

# Sibling-session memo for the dbt DAG operators: temp views are
# session-scoped (so each sf gets its own namespace — the isolation these
# siblings exist for), but a NEW session per invocation pins a JVM
# SessionState plus data.py's cached plans forever (the leak class the
# join_bloom_prefilter memo closes; joins.py documents the growth rate).
# One sibling per (root session, operator, sf) gives the same isolation
# with a bounded session count; every view/model inside is
# create-or-replace, so re-running on a memoized sibling is idempotent.
_SIBLING_SESSIONS: dict[tuple, SparkSession] = {}


def _sibling(spark: SparkSession, op: str, sf_dir: str) -> SparkSession:
    key = (spark, op, sf_dir)
    s = _SIBLING_SESSIONS.get(key)
    if s is None:
        s = spark.newSession()
        _SIBLING_SESSIONS[key] = s
    return s

# --------------------------------------------------------------------------
# sample_hash — deterministic content-hash sampling (~10.2%: first two md5
# hex chars < '1a').  Unlike rand()-based sampling this is reproducible on
# any engine and any partitioning — the right way to sample 100 TB.
# --------------------------------------------------------------------------

_SAMPLE_HASH_ORACLE = f"""
SELECT COUNT(*) AS n_sampled,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       {osum('l_extendedprice')} AS sampled_price
FROM lineitem
WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '1a'
"""


@register("sample_hash", oracle=_SAMPLE_HASH_ORACLE)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    bucket = F.substring(F.md5(F.concat_ws("-", "l_orderkey", "l_linenumber")), 1, 2)
    return li.filter(bucket < "1a").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        dsum("l_extendedprice").alias("sampled_price"),
    )


# --------------------------------------------------------------------------
# fn_struct — struct construction, nested structs, field access, struct
# equality; rendered via to_json (hash-safe string output both engines).
# --------------------------------------------------------------------------

_FN_STRUCT_ORACLE = """
SELECT o_orderkey,
       to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS order_json,
       to_json(struct_pack(hdr := struct_pack(k := o_orderkey, pr := o_orderpriority),
                           yr := CAST(EXTRACT(year FROM o_orderdate) AS BIGINT))) AS nested_json,
       struct_pack(k := o_orderkey, s := o_orderstatus).s AS status_field,
       struct_pack(k := o_orderkey, s := o_orderstatus)
         = struct_pack(k := o_orderkey, s := 'O') AS is_open
FROM orders
WHERE o_orderkey < 500
"""


@register("fn_struct", oracle=_FN_STRUCT_ORACLE)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    st = F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("s"))
    nested = F.struct(
        F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("pr")).alias("hdr"),
        F.year("o_orderdate").cast("bigint").alias("yr"),
    )
    open_st = F.struct(F.col("o_orderkey").alias("k"), F.lit("O").alias("s"))
    return o.select(
        "o_orderkey",
        F.to_json(st).alias("order_json"),
        F.to_json(nested).alias("nested_json"),
        st.getField("s").alias("status_field"),
        (st == open_st).alias("is_open"),
    )


# --------------------------------------------------------------------------
# agg_mode_median — exact median (interpolated) plus a deterministic mode
# (max count, ties broken by smallest value — spelled out identically in
# both engines rather than relying on either engine's mode() tie behavior).
# --------------------------------------------------------------------------

_MODE_MEDIAN_ORACLE = """
WITH m AS (
  SELECT o_orderstatus, ROUND(MEDIAN(o_totalprice), 6) AS median_price, COUNT(*) AS n
  FROM orders GROUP BY o_orderstatus
),
c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
),
md AS (
  SELECT o_orderstatus, o_orderpriority AS mode_priority
  FROM (SELECT c.*, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                       ORDER BY cnt DESC, o_orderpriority) AS rn
        FROM c)
  WHERE rn = 1
)
SELECT m.o_orderstatus, m.median_price, m.n, md.mode_priority
FROM m JOIN md USING (o_orderstatus)
"""


@register("agg_mode_median", oracle=_MODE_MEDIAN_ORACLE)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    med = o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("n"),
    )
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("cnt").desc(), "o_orderpriority")
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    return med.join(mode, "o_orderstatus").select(
        "o_orderstatus", "median_price", "n", "mode_priority"
    )


# --------------------------------------------------------------------------
# fn_sequence — interval sequence generation + explode: a 1996 month
# calendar left-joined to per-month order stats (empty months kept).  At
# scale the calendar side is a constant — Spark broadcasts it for free.
# --------------------------------------------------------------------------

_FN_SEQUENCE_ORACLE = f"""
WITH cal AS (
  SELECT CAST(m AS DATE) AS month_start
  FROM generate_series(DATE '1996-01-01', DATE '1996-12-01', INTERVAL 1 MONTH) t(m)
),
agg AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         COUNT(*) AS n_orders,
         {osum('o_totalprice')} AS revenue
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1
)
SELECT CAST(cal.month_start AS VARCHAR) AS month,
       COALESCE(agg.n_orders, 0) AS n_orders,
       COALESCE(agg.revenue, 0.0) AS revenue
FROM cal LEFT JOIN agg USING (month_start)
"""


@register("fn_sequence", oracle=_FN_SEQUENCE_ORACLE)
def fn_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1996-01-01").cast("date"),
                F.lit("1996-12-01").cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("month_start")
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    agg = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    return cal.join(agg, "month_start", "left").select(
        F.col("month_start").cast("string").alias("month"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )


# --------------------------------------------------------------------------
# sink_partition_overwrite — dbt `incremental` insert_overwrite strategy:
# dynamic partition overwrite rewrites ONLY the partitions present in the
# incoming batch (here: order_year=1997 repriced), leaving all other
# partitions untouched.  At 100 TB this is the difference between rewriting
# one day and rewriting the table.
# --------------------------------------------------------------------------

_SINK_DYN_ORACLE = f"""
WITH t AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
         CASE WHEN EXTRACT(year FROM o_orderdate) = 1997
              THEN ROUND(ROUND(o_totalprice, 6) * 1.1, 6)
              ELSE ROUND(o_totalprice, 6) END AS price
  FROM orders
)
SELECT order_year, COUNT(*) AS n, {osum('price')} AS total_price
FROM t GROUP BY order_year
"""


@register("sink_partition_overwrite", oracle=_SINK_DYN_ORACLE)
def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_partition_overwrite", sf_dir)
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.round("o_totalprice", 6).alias("price"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    )
    base.write.mode("overwrite").partitionBy("order_year").parquet(path)

    upd = base.filter(F.col("order_year") == 1997).withColumn(
        "price", F.round(F.col("price") * 1.1, 6)
    )
    # per-WRITE option, not a session-conf save/restore: two interleaved
    # runs on the shared session could each read the other's "previous"
    # value and leave the session stuck in dynamic mode, silently switching
    # every later partitioned overwrite in the session to per-partition
    # semantics.  The writer option scopes the mode to this one write.
    (
        upd.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("order_year")
        .parquet(path)
    )

    return (
        # explicit schema: an all-empty source writes no data files and
        # schema inference would fail (routine empty-day case at scale)
        spark.read.schema(base.schema)
        .parquet(path)
        .groupBy(F.col("order_year").cast("int").alias("order_year"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("price").alias("total_price"))
    )


# --------------------------------------------------------------------------
# scan_schema_evolution — mergeSchema read across batches whose schemas
# drifted (a column added mid-history): old rows surface NULL for the new
# column.  This is the schema-on-read contract a long-lived 100 TB table
# lives by — readers never require a rewrite of old files.
# --------------------------------------------------------------------------

_SCHEMA_EVOLUTION_ORACLE = f"""
WITH t AS (
  SELECT o_orderkey, ROUND(o_totalprice, 6) AS price,
         CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
              THEN o_orderstatus ELSE NULL END AS o_orderstatus
  FROM orders
)
SELECT o_orderstatus, COUNT(*) AS n, {osum('price')} AS total_price
FROM t GROUP BY o_orderstatus
"""


@register("scan_schema_evolution", oracle=_SCHEMA_EVOLUTION_ORACLE)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _scratch("scan_schema_evolution", sf_dir)
    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")
    old = o.filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", F.round("o_totalprice", 6).alias("price")
    )
    new = o.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", F.round("o_totalprice", 6).alias("price"), "o_orderstatus"
    )
    old.write.mode("overwrite").parquet(f"{root}/b1")
    new.write.mode("overwrite").parquet(f"{root}/b2")
    merged = spark.read.option("mergeSchema", "true").parquet(f"{root}/b1", f"{root}/b2")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("price").alias("total_price")
    )


# --------------------------------------------------------------------------
# sink_compaction — small-file compaction: 64 tiny files coalesced to 4
# WITHOUT a shuffle (coalesce merges co-located partitions).  The table
# maintenance job every 100 TB parquet lake schedules nightly; file count
# is asserted via input_file_name on the read-back.
# --------------------------------------------------------------------------

_COMPACTION_ORACLE = f"""
SELECT CAST(4 AS BIGINT) AS n_files,
       COUNT(*) AS n_rows,
       {osum('l_extendedprice')} AS total_price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
"""


@register("sink_compaction", oracle=_COMPACTION_ORACLE)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    small_path = _scratch("sink_compaction/small", sf_dir)
    out_path = _scratch("sink_compaction/compacted", sf_dir)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
    li.repartition(64).write.mode("overwrite").parquet(small_path)

    spark.read.parquet(small_path).coalesce(4).write.mode("overwrite").parquet(out_path)

    back = spark.read.parquet(out_path).withColumn("_file", F.input_file_name())
    return back.agg(
        F.countDistinct("_file").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("total_price"),
    )


# --------------------------------------------------------------------------
# agg_string_agg — LISTAGG/string_agg: ordered string concatenation per
# group, both DISTINCT-sorted and explicit ORDER BY forms.  Spark spells it
# collect + array_sort + array_join (deterministic by construction — a bare
# collect order would not be).
# --------------------------------------------------------------------------

_STRING_AGG_ORACLE = """
SELECT o.o_custkey,
       array_to_string(list_sort(list_distinct(list(o.o_orderpriority))), ',')
         AS priorities,
       string_agg(o.o_orderstatus, '' ORDER BY o.o_orderkey) AS status_seq,
       COUNT(*) AS n
FROM orders o
WHERE o.o_custkey < 50
GROUP BY o.o_custkey
"""


@register("agg_string_agg", oracle=_STRING_AGG_ORACLE)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    by_key = F.array_sort(
        F.collect_list(F.struct(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("v")))
    )
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
        F.array_join(F.transform(by_key, lambda s: s.getField("v")), "").alias("status_seq"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# join_null_safe — null-safe equality join (<=> / IS NOT DISTINCT FROM):
# rows with NULL keys match the dimension's NULL row instead of dropping
# out — the canonical "route unknowns to an UNKNOWN bucket" dim join.
# --------------------------------------------------------------------------

_NULL_SAFE_ORACLE = f"""
WITH c2 AS (
  SELECT c_custkey, c_acctbal,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer
),
dim AS (
  SELECT DISTINCT c_mktsegment AS seg, c_mktsegment AS label FROM customer
  UNION ALL SELECT NULL, 'UNKNOWN'
)
SELECT dim.label, COUNT(*) AS n, {osum('c2.c_acctbal')} AS total_bal
FROM c2 JOIN dim ON c2.seg IS NOT DISTINCT FROM dim.seg
GROUP BY dim.label
"""


@register("join_null_safe", oracle=_NULL_SAFE_ORACLE)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    c2 = c.select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    dim = (
        c.select(F.col("c_mktsegment").alias("dseg"))
        .distinct()
        .select("dseg", F.col("dseg").alias("label"))
        .unionAll(
            c.sparkSession.range(1).select(
                F.lit(None).cast("string").alias("dseg"), F.lit("UNKNOWN").alias("label")
            )
        )
    )
    return (
        c2.join(F.broadcast(dim), c2.seg.eqNullSafe(F.col("dseg")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"), dsum("c_acctbal").alias("total_bal"))
    )


# --------------------------------------------------------------------------
# agg_approx_percentile — sketch-based percentile (rows-only check like
# agg_approx; exact percentiles ride along so the in-repo sanity test can
# assert the band).  The sketch is one-pass and mergeable — the 100 TB path
# where exact percentile would need a full sort.
# --------------------------------------------------------------------------


_AGG_APPROX_PCT_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5),  6) AS exact_p50,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS exact_p95,
       TRUE AS approx_p50_in_band,
       TRUE AS approx_p95_in_band
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_approx_percentile", oracle=_AGG_APPROX_PCT_ORACLE)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exact-checkable form: the GK-sketch estimate is engine-specific, so
    # the hashed output is the exact percentile (Spark PERCENTILE and DuckDB
    # quantile_cont — both linear interpolation, verified identical) plus
    # in-band booleans for the sketch (accuracy=1000 → rank error ≤ 1/1000;
    # a 2% value band on this distribution is deterministically true).
    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("ap50"),
        F.percentile_approx("l_extendedprice", 0.95, 1000).alias("ap95"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("exact_p50"),
        F.round(F.percentile("l_extendedprice", 0.95), 6).alias("exact_p95"),
    )
    in_band = lambda approx, exact: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= 0.02 * F.col(exact)
    )
    return agg.select(
        "l_returnflag",
        "exact_p50",
        "exact_p95",
        in_band("ap50", "exact_p50").alias("approx_p50_in_band"),
        in_band("ap95", "exact_p95").alias("approx_p95_in_band"),
    )


# --------------------------------------------------------------------------
# fn_regex — the full regexp surface beyond extract/replace (fn_string):
# extract-all, match counting, boolean match, first-match position.
# --------------------------------------------------------------------------

_FN_REGEX_ORACLE = """
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS words,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
       regexp_matches(p_name, '^(small|large)') AS sized,
       CAST(CASE WHEN regexp_matches(p_name, 'o') THEN instr(p_name, 'o') ELSE 0 END AS BIGINT)
         AS first_o
FROM part
WHERE p_partkey < 300
"""


@register("fn_regex", oracle=_FN_REGEX_ORACLE)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.array_join(F.regexp_extract_all("p_name", F.lit("[a-z]+"), 0), "|").alias("words"),
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("bigint").alias("n_vowels"),
        F.col("p_name").rlike("^(small|large)").alias("sized"),
        F.regexp_instr("p_name", F.lit("o")).cast("bigint").alias("first_o"),
    )


# --------------------------------------------------------------------------
# sink_jsonl — JSON-lines sink + re-ingest (the interchange format every
# LLM data pipeline emits): write a projection as .jsonl, read it back with
# an explicit schema, aggregate.  Lossless for int/string columns.
# --------------------------------------------------------------------------

_SINK_JSONL_ORACLE = """
SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents WHERE doc_id < 200
GROUP BY lang
"""


@register("sink_jsonl", oracle=_SINK_JSONL_ORACLE)
def sink_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    path = _scratch("sink_jsonl", sf_dir)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    d.select("doc_id", "lang", "n_chars").write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars")
    )


# --------------------------------------------------------------------------
# sink_file_sizing — output file-size control (the small-files problem):
# maxRecordsPerFile rolls the writer to a new file every N records, so a
# 100 TB job emits uniformly-sized parquet instead of one file per task
# (or thousands of KB-sized ones).  File count is arithmetic —
# ceil(rows / N) for a single write partition — so the check is exact.
# --------------------------------------------------------------------------

_FILE_SIZING_N = 1000

_SINK_FILE_SIZING_ORACLE = f"""
SELECT
  CAST(CEIL(COUNT(*) / {_FILE_SIZING_N}.0) AS BIGINT) AS n_files,
  COUNT(*) AS total_rows,
  CAST(LEAST({_FILE_SIZING_N}, COUNT(*)) AS BIGINT) AS max_rows_per_file
FROM orders WHERE o_orderstatus = 'O'
"""


@register("sink_file_sizing", oracle=_SINK_FILE_SIZING_ORACLE)
def sink_file_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_file_sizing", sf_dir)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    (
        o.repartition(1)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", _FILE_SIZING_N)
        .parquet(path)
    )
    back = spark.read.parquet(path)
    per_file = back.groupBy(F.input_file_name().alias("f")).agg(
        F.count(F.lit(1)).alias("rows_in_file")
    )
    return per_file.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("rows_in_file").alias("total_rows"),
        F.max("rows_in_file").alias("max_rows_per_file"),
    )


# --------------------------------------------------------------------------
# sink_observe_metrics — pipeline data-quality metrics via df.observe():
# the metrics (row count, null count, exact total) are computed DURING the
# write pass — no second scan of the data, which at 100 TB is the
# difference between free monitoring and doubling the job.  The dbt
# post-hook test analogue, fused into the sink.
# --------------------------------------------------------------------------

_SINK_OBSERVE_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS BIGINT) AS n_null_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total_price
FROM orders WHERE o_orderstatus <> 'F'
"""


@register("sink_observe_metrics", oracle=_SINK_OBSERVE_ORACLE)
def sink_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    path = _scratch("sink_observe_metrics", sf_dir)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    # anonymous Observation: the listener matches observations BY NAME, so
    # two concurrent runs sharing the literal name "sink_metrics" could
    # capture each other's metrics; the auto-generated UUID name is unique
    obs = Observation()
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_orderpriority").isNull().cast("bigint")).alias("n_null_priority"),
        F.sum(F.col("o_totalprice").cast("decimal(25,6)")).alias("total_price"),
    )
    observed.write.mode("overwrite").parquet(path)  # the ONLY pass over the data
    m = obs.get
    # SUM over zero rows observes NULL (SQL semantics) — keep it NULL
    total = float(m["total_price"]) if m["total_price"] is not None else None
    return local_rows(spark, 
        [(m["n_rows"], m["n_null_priority"], total)],
        "n_rows bigint, n_null_priority bigint, total_price double",
    )


# --------------------------------------------------------------------------
# sink_surrogate_keys — stable surrogate-key assignment (dbt ID-generation
# pattern): dense row_number over the business key, NOT
# monotonically_increasing_id (whose values depend on partition layout and
# change between runs/clusters).  The total-order rank is computed with the
# two-phase prefix-sum idiom (util.global_running_sum: range-partition →
# per-partition rank → broadcast partition offsets), so ``sk`` itself is
# fact-scale-safe — no single-partition window anywhere.  ``sk_hash`` stays
# as the shuffle-free alternative when density isn't required.
# Deterministic ⇒ exact-checked.
# --------------------------------------------------------------------------

_SINK_SURROGATE_ORACLE = """
SELECT c_custkey,
       ROW_NUMBER() OVER (ORDER BY c_mktsegment, c_custkey) AS sk,
       md5(c_mktsegment || '|' || CAST(c_custkey AS VARCHAR)) AS sk_hash
FROM customer WHERE c_acctbal > 9000
"""


@register("sink_surrogate_keys", oracle=_SINK_SURROGATE_ORACLE)
def sink_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import global_running_sum

    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    ranked = global_running_sum(c, ["c_mktsegment", "c_custkey"], F.lit(1), "sk")
    return ranked.select(
        "c_custkey",
        F.col("sk").cast("bigint").alias("sk"),
        F.md5(F.concat_ws("|", "c_mktsegment", F.col("c_custkey").cast("string"))).alias(
            "sk_hash"
        ),
    )


# --------------------------------------------------------------------------
# agg_count_min — Count-Min-Sketch heavy-hitter counts (the mergeable-
# sketch companion to agg_hll_mergeable), built entirely with public
# DataFrame ops: each row hashes into one cell per sketch row
# (xxhash64(key, depth) mod width), the counter table is a (depth, cell)
# groupBy whose map-side partial aggregation bounds the shuffle at
# depth x width counters per partition regardless of input size, and the
# point estimate is the classic min-over-depths, computed by probing the
# counter table with the key set.  Sketches merge by union + re-sum — the
# mergeable property falls out of the representation.  (Earlier versions
# used the JVM ``count_min_sketch`` aggregate, but PySpark has no public
# reader for its binary payload; the DataFrame-native table avoids the
# private ``spark._jvm`` bridge entirely.)  With depth 5 a key's estimate
# is exact unless it collides in EVERY row (p < 1e-15 at this
# cardinality), so the oracle is the exact GROUP BY count.
# Reference parity: approximate aggregates reach the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_AGG_CMS_ORACLE = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS est_n
FROM events GROUP BY event_type
"""

_CMS_DEPTH = 5
_CMS_WIDTH = 2048


def _cms_cells(df: DataFrame, key: str) -> DataFrame:
    """Explode each row into its (depth, cell) sketch coordinates."""
    depths = F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])  # design constant
    return df.select(
        F.col(key),
        F.explode(depths).alias("d"),
    ).select(
        F.col(key),
        "d",
        F.pmod(F.xxhash64(F.col(key), F.col("d")), F.lit(_CMS_WIDTH)).alias("cell"),
    )


@register("agg_count_min", oracle=_AGG_CMS_ORACLE)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    sketch = (
        _cms_cells(ev, "event_type")
        .groupBy("d", "cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Probe keys: in a real heavy-hitter pipeline these come from a sample
    # or a space-saving pass; here the distinct set is a few strings.
    keys = ev.select("event_type").distinct()
    probe = _cms_cells(keys, "event_type")
    return (
        probe.join(F.broadcast(sketch), ["d", "cell"])
        .groupBy("event_type")
        .agg(F.min("n").alias("est_n"))
    )


# --------------------------------------------------------------------------
# dbt_model_dag — a 4-model dbt-style DAG run through ModelGraph
# (nedp_etl_spark/models.py): staging views over orders/lineitem, a fact
# model joining both refs, and a report model over the fact.  The view
# materializations inline into downstream plans (dbt ephemeral-as-CTE), so
# the whole DAG executes as one fused Catalyst job with pushdown through
# every layer — the oracle is the equivalent nested SQL.
# Reference parity: `dbt run` DAG execution + `--select` subgraphs
# (/root/reference/dbtoperator.py:35,273-274,491).
# --------------------------------------------------------------------------

_MODEL_DAG_ORACLE = """
WITH stg_orders AS (
  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
),
stg_lineitem AS (
  SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem
  WHERE l_quantity >= 10
),
fct_revenue AS (
  SELECT o.o_orderpriority,
         l.l_extendedprice * (1 - l.l_discount) AS rev
  FROM stg_orders o JOIN stg_lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) AS revenue
FROM fct_revenue
GROUP BY o_orderpriority
"""


@register("dbt_model_dag", oracle=_MODEL_DAG_ORACLE)
def dbt_model_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.data import views
    from nedp_etl_spark.models import ModelGraph

    # memoized sibling session: temp views are session-scoped, so the DAG's
    # 'orders'/'lineitem' source views can't collide with a concurrent run
    # at another sf (scratch paths are sf-scoped; names must be too)
    s = _sibling(spark, "dbt_model_dag", sf_dir)
    views(s, sf_dir, "orders", "lineitem")
    g = ModelGraph()
    g.add_model(
        "stg_orders",
        "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 100000",
    )
    g.add_model(
        "stg_lineitem",
        "SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem "
        "WHERE l_quantity >= 10",
    )
    g.add_model(
        "fct_revenue",
        "SELECT o.o_orderpriority, l.l_extendedprice * (1 - l.l_discount) AS rev "
        "FROM {{ ref('stg_orders') }} o "
        "JOIN {{ ref('stg_lineitem') }} l ON l.l_orderkey = o.o_orderkey",
    )
    g.add_model(
        "rpt_priority",
        "SELECT o_orderpriority, COUNT(*) AS n_lines, "
        "CAST(SUM(CAST(rev AS DECIMAL(25,6))) AS DOUBLE) AS revenue "
        "FROM {{ ref('fct_revenue') }} GROUP BY o_orderpriority",
    )
    return g.run(s, select=["rpt_priority"])["rpt_priority"]


# --------------------------------------------------------------------------
# dbt_incremental_dag — dbt's flagship `incremental` materialization run
# through ModelGraph (models.py): same model SQL on every run, an
# `{% if is_incremental() %}` date guard that only applies once the target
# exists, and a MERGE on unique_key.  Two batches: run 1 full-builds from
# snapshot 1 (plain orders); the source then "advances" (orders from
# 1995-12-01 re-land with status 'U' and a 10% price bump) and run 2
# processes ONLY the guarded slice and merges it over the target.
# At 100 TB the second run scans just the slice (the guard is a pushed
# partition/date filter) and anti-joins the target on the slice's keys.
# Reference parity: dbt-spark incremental models are the reference's main
# production mode (/root/reference/dbtoperator.py:273-274 delegates
# `dbt run`, whose incremental strategy compiles to Spark SQL MERGE).
# --------------------------------------------------------------------------

_INCR_DAG_ORACLE = """
WITH t0 AS (
  SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 6) AS o_totalprice
  FROM orders
),
inc AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, ROUND(o_totalprice * 1.1, 6) AS o_totalprice
  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-12-01 00:00:00'
)
SELECT o_orderkey, o_orderstatus, o_totalprice FROM inc
UNION ALL
SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice
FROM t0 t
WHERE NOT EXISTS (SELECT 1 FROM inc i WHERE i.o_orderkey = t.o_orderkey)
"""


@register("dbt_incremental_dag", oracle=_INCR_DAG_ORACLE)
def dbt_incremental_dag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.models import ModelGraph

    # memoized sibling session: the 'feed' source view is re-pointed between
    # the two batches below, and a concurrent run at another sf must see ITS
    # feed, not this one's (temp views are session-scoped)
    s = _sibling(spark, "dbt_incremental_dag", sf_dir)
    o = load(s, sf_dir, "orders")
    cutoff = F.lit("1995-12-01 00:00:00").cast("timestamp")

    g = ModelGraph()
    g.add_model(
        "inc_orders",
        "SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 6) AS o_totalprice "
        "FROM feed "
        "{% if is_incremental() %} WHERE o_orderdate >= DATE '1995-12-01' {% endif %}",
        materialization="incremental",
        unique_key="o_orderkey",
    )
    table_dir = _scratch("dbt_incremental_dag", sf_dir)

    # batch 1: initial snapshot → full build (guard compiled out)
    o.createOrReplaceTempView("feed")
    g.run(s, table_dir=table_dir)

    # batch 2: source advanced — late rows re-land updated; guard active
    updated = F.col("o_orderdate") >= cutoff
    snap2 = o.withColumn(
        "o_orderstatus", F.when(updated, F.lit("U")).otherwise(F.col("o_orderstatus"))
    ).withColumn(
        "o_totalprice",
        F.when(updated, F.col("o_totalprice") * 1.1).otherwise(F.col("o_totalprice")),
    )
    snap2.createOrReplaceTempView("feed")
    return g.run(s, table_dir=table_dir)["inc_orders"]


# --------------------------------------------------------------------------
# profile_skew — join/groupBy key-skew diagnostic (the measurement you run
# BEFORE choosing between plain shuffle, AQE skew-split, and salting — see
# operators/skew.py for the treatment): per-key counts → top-10 heavy
# keys, each annotated with its share of all rows and the max/avg
# imbalance ratio.  One count aggregate + TakeOrderedAndProject over the
# (small) per-key counts; the global totals are a 1-row broadcast onto 10
# rows.  At 100 TB the per-key count table is the only shuffle and is
# itself map-side combined.
# --------------------------------------------------------------------------

_PROFILE_SKEW_ORACLE = """
WITH k AS (
  SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total, AVG(n) AS avg_n, MAX(n) AS max_n
  FROM k
),
top AS (
  SELECT key, n, ROW_NUMBER() OVER (ORDER BY n DESC, key) AS rank
  FROM k
)
SELECT t.rank, t.key, t.n,
       ROUND(t.n * 1.0 / tot.total, 6) AS share,
       ROUND(tot.max_n * 1.0 / tot.avg_n, 6) AS skew_ratio
FROM top t, tot
WHERE t.rank <= 10
"""


@register("profile_skew", oracle=_PROFILE_SKEW_ORACLE)
def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    k = o.groupBy(F.col("o_custkey").alias("key")).agg(F.count(F.lit(1)).alias("n"))
    tot = k.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.avg("n").alias("avg_n"),
        F.max("n").alias("max_n"),
    )
    # Top-10 via orderBy+limit first (TakeOrderedAndProject — distributed
    # top-k over the per-key counts), THEN the global rank window runs on
    # 10 rows, not on every distinct key.
    top = (
        k.orderBy(F.col("n").desc(), "key")
        .limit(10)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.col("n").desc(), "key"))
        )
    )
    return top.crossJoin(F.broadcast(tot)).select(
        "rank",
        "key",
        "n",
        F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("share"),
        F.round(F.col("max_n") * 1.0 / F.col("avg_n"), 6).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# dbt_run_hooks — dbt's hook surface: per-model post-hooks append (model,
# row count) rows to a warehouse audit table, bracketed by
# on-run-start/on-run-end project hooks (DDL + run marker) — the canonical
# dbt audit pattern ("INSERT INTO audit SELECT ... FROM {{ this }}").
# Hooks are plain Spark SQL against the session catalog, so the audit table
# is a real parquet-backed table, not a temp view.  Scale: hooks add one
# tiny aggregate job per model; the DAG's own plans are untouched.
# Reference parity: dbt pre/post/on-run hooks ride the same `dbt run` the
# reference delegates (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_RUN_HOOKS_ORACLE = """
SELECT 'run_end' AS model, CAST(2 AS BIGINT) AS n_rows
UNION ALL
SELECT 'rpt_priority', CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT)
FROM orders WHERE o_totalprice > 100000
UNION ALL
SELECT 'stg_big_orders', CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_totalprice > 100000
"""


@register("dbt_run_hooks", oracle=_RUN_HOOKS_ORACLE)
def dbt_run_hooks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.data import views
    from nedp_etl_spark.models import ModelGraph

    # memoized sibling session for the session-scoped 'orders' source view;
    # the audit TABLE lives in the shared catalog and is already sf-scoped
    s = _sibling(spark, "dbt_run_hooks", sf_dir)
    views(s, sf_dir, "orders")
    audit = f"nedp_audit_{_sf_tag(sf_dir)}"

    # The in-memory catalog forgets tables across sessions but the managed
    # location survives on disk; CREATE TABLE then fails with
    # LOCATION_ALREADY_EXISTS.  If the catalog doesn't know the table,
    # clear any stale location first (on a real metastore this never fires).
    if not spark.catalog.tableExists(audit):
        import shutil
        from urllib.parse import urlparse

        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        wh_path = urlparse(wh).path or wh
        shutil.rmtree(os.path.join(wh_path, audit), ignore_errors=True)

    g = ModelGraph()
    g.add_model(
        "stg_big_orders",
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
        "WHERE o_totalprice > 100000",
        post_hook=[
            f"INSERT INTO {audit} "
            "SELECT 'stg_big_orders', COUNT(*) FROM {{ this }}"
        ],
    )
    g.add_model(
        "rpt_priority",
        "SELECT o_orderpriority, COUNT(*) AS n "
        "FROM {{ ref('stg_big_orders') }} GROUP BY o_orderpriority",
        post_hook=[
            f"INSERT INTO {audit} "
            "SELECT 'rpt_priority', COUNT(*) FROM {{ this }}"
        ],
    )
    g.run(
        s,
        on_run_start=[
            f"DROP TABLE IF EXISTS {audit}",
            f"CREATE TABLE {audit} (model STRING, n_rows BIGINT) USING PARQUET",
        ],
        on_run_end=[
            f"INSERT INTO {audit} "
            f"SELECT 'run_end', COUNT(*) FROM (SELECT model FROM {audit} GROUP BY model)"
        ],
    )
    # the audit table lives in the SHARED catalog — readable from either
    # session; the caller's session is the natural return surface.  Refresh
    # first: a PRIOR run's read left the caller's relation cache holding
    # the old file listing, and this run just dropped/recreated the table
    # (FAILED_READ_FILE.FILE_NOT_EXIST on any repeat invocation otherwise —
    # latent before the sibling memo too, since the drop always happened in
    # a different session from this read).
    spark.catalog.refreshTable(audit)
    return spark.table(audit).select("model", "n_rows")


# --------------------------------------------------------------------------
# sample_bottomk — EXACT-size deterministic sample: the k rows with the
# smallest content hash.  sample_hash above gives a reproducible ~p% slice;
# this gives a reproducible exactly-k subset (the "give me exactly 100k
# docs, same ones every run, on any engine/partitioning" contract a
# training-data pipeline needs for pinned eval sets).  Spark executes
# orderBy(h).limit(k) as TakeOrderedAndProject — each partition keeps its
# local k smallest and only k rows per partition reach the driver-side
# merge; the 100 TB input is never globally sorted.  Equivalent to bottom-k
# consistent sampling / a KMV sketch membership pass.
# Reference parity: sampling reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SAMPLE_BOTTOMK_K = 200

_SAMPLE_BOTTOMK_ORACLE = f"""
SELECT l_orderkey, l_linenumber, l_extendedprice,
       md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS h
FROM lineitem
ORDER BY h NULLS LAST, l_extendedprice NULLS LAST
LIMIT {_SAMPLE_BOTTOMK_K}
"""


@register("sample_bottomk", oracle=_SAMPLE_BOTTOMK_ORACLE)
def sample_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # concat (NULL-propagating) mirrors the oracle's || operator; concat_ws
    # would silently drop a NULL key part and hash the remainder — the
    # llm_dataset_split hazard class.
    h = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        )
    )
    # The synthetic lineitem is NOT keyed by (l_orderkey, l_linenumber) —
    # the fixture carries duplicate pairs — so the hash alone leaves the
    # k-th-row boundary tie engine-defined; the extendedprice tie-breaker
    # pins it on both sides.  NULLS LAST explicitly: a NULL-keyed row gets
    # h = NULL via the null-propagating concat, and Spark's ASC default
    # (nulls FIRST) would sample the opposite end from DuckDB's (nulls
    # last) — NULL keys sort out of the sample in both engines.
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", h.alias("h"))
        .orderBy(
            F.col("h").asc_nulls_last(),
            F.col("l_extendedprice").asc_nulls_last(),
        )
        .limit(_SAMPLE_BOTTOMK_K)
    )


# --------------------------------------------------------------------------
# profile_drift_psi — population-stability-index drift monitor (the
# standard ML-ops screen for feature/score drift between a baseline and a
# current period): o_totalprice bucketed into 10 fixed 50k-wide bins,
# PSI = Σ (q−p)·ln(q/p) per o_orderpriority, baseline = orders before
# 1998-01-01, current = after.  PSI < 0.1 stable, > 0.2 drifted (the
# conventional thresholds; the flag uses 0.2).
#
# Scale shape: ONE corpus pass — period tag + bucket are map-side, the
# (priority, bucket, period) histogram combines map-side and is
# groups×10×2 rows; per-priority totals broadcast back.  Exactness: fixed
# bucket edges (integer math), probabilities clamped at the shared 1e-6
# literal, per-bucket PSI terms quantized to 6-dp fixed point pre-sum.
# Reference parity: monitoring SQL reaches the reference only as
# dbt-model SQL (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_PSI_CUT = "1998-01-01"
_PSI_W = 50_000
_PSI_EPS = "0.000001"

_PSI_ORACLE = f"""
WITH b AS (
  SELECT o_orderpriority AS priority,
         LEAST(CAST(FLOOR(o_totalprice / {_PSI_W}) AS BIGINT), 9) AS bucket,
         CASE WHEN CAST(o_orderdate AS TIMESTAMP) < TIMESTAMP '{_PSI_CUT} 00:00:00'
              THEN 1 ELSE 0 END AS is_base
  FROM orders
),
h AS (
  SELECT priority, bucket,
         SUM(is_base) AS n_b, SUM(1 - is_base) AS n_c
  FROM b GROUP BY priority, bucket
),
t AS (
  -- drift is undefined without BOTH periods populated: a priority whose
  -- orders fall entirely on one side of the cut is dropped (exact-integer
  -- guard — an unguarded divide is an ANSI error on Spark and a silent
  -- NULL→eps on DuckDB, a guaranteed parity break)
  SELECT priority, SUM(n_b) AS tot_b, SUM(n_c) AS tot_c FROM h
  GROUP BY priority
  HAVING SUM(n_b) > 0 AND SUM(n_c) > 0
),
terms AS (
  SELECT h.priority, t.tot_b, t.tot_c,
         GREATEST(h.n_b * 1.0 / t.tot_b, {_PSI_EPS}) AS p,
         GREATEST(h.n_c * 1.0 / t.tot_c, {_PSI_EPS}) AS q
  FROM h JOIN t ON h.priority = t.priority
)
SELECT priority,
       CAST(MAX(tot_b) AS BIGINT) AS n_baseline,
       CAST(MAX(tot_c) AS BIGINT) AS n_current,
       CAST(SUM(CAST(FLOOR(((q - p) * ln(q / p)) * 1000000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 1000000.0 AS psi,
       CAST(SUM(CAST(FLOOR(((q - p) * ln(q / p)) * 1000000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 1000000.0 > 0.2 AS drifted
FROM terms GROUP BY priority
"""


@register("profile_drift_psi", oracle=_PSI_ORACLE)
def profile_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    b = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.least(F.floor(F.col("o_totalprice") / _PSI_W).cast("bigint"), F.lit(9)).alias(
            "bucket"
        ),
        F.when(
            F.col("o_orderdate").cast("timestamp")
            < F.lit(f"{_PSI_CUT} 00:00:00").cast("timestamp"),
            1,
        )
        .otherwise(0)
        .alias("is_base"),
    )
    # checkpoint the groups×10 histogram (totals + terms both branch off
    # it — without this the corpus is scanned twice)
    h = b.groupBy("priority", "bucket").agg(
        F.sum("is_base").alias("n_b"), F.sum(1 - F.col("is_base")).alias("n_c")
    ).localCheckpoint(eager=False)
    t = (
        h.groupBy("priority")
        .agg(F.sum("n_b").alias("tot_b"), F.sum("n_c").alias("tot_c"))
        # drift undefined without both periods (see oracle comment)
        .filter((F.col("tot_b") > 0) & (F.col("tot_c") > 0))
    )
    eps = float(_PSI_EPS)
    terms = h.join(F.broadcast(t), "priority").select(
        "priority",
        "tot_b",
        "tot_c",
        F.greatest(F.col("n_b") * 1.0 / F.col("tot_b"), F.lit(eps)).alias("p"),
        F.greatest(F.col("n_c") * 1.0 / F.col("tot_c"), F.lit(eps)).alias("q"),
    )
    term = (F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))
    psi = F.sum(F.floor(term * 1_000_000.0 + 0.5).cast("long")) / 1_000_000.0
    return terms.groupBy("priority").agg(
        F.max("tot_b").cast("bigint").alias("n_baseline"),
        F.max("tot_c").cast("bigint").alias("n_current"),
        psi.alias("psi"),
        (psi > 0.2).alias("drifted"),
    )



# --------------------------------------------------------------------------
# scan_range_generator — the generator SOURCE (spark.range): synthetic
# tables derive from a distributed integer range with deterministic
# column expressions — no input files at all, parallelism = range
# splits.  The backbone of fixture generation, load testing, and spine
# construction (calendar/sequence scaffolds) at any scale.
# --------------------------------------------------------------------------

_RANGE_GEN_ORACLE = """
SELECT CAST(t.i AS BIGINT) AS id,
       CAST(t.i % 7 AS INT) AS bucket,
       md5(CAST(t.i AS VARCHAR)) AS tag,
       CAST(t.i * t.i % 997 AS BIGINT) AS checksum
FROM range(0, 10000) t(i)
"""


@register("scan_range_generator", oracle=_RANGE_GEN_ORACLE)
def scan_range_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.range(0, 10_000, numPartitions=8).select(
        F.col("id"),
        (F.col("id") % 7).cast("int").alias("bucket"),
        F.md5(F.col("id").cast("string")).alias("tag"),
        (F.col("id") * F.col("id") % 997).cast("bigint").alias("checksum"),
    )


# --------------------------------------------------------------------------
# sink_ttl_expire — retention-policy enforcement as a PARTITION DROP: the
# events table lands partitioned by day; rows older than the 14-day TTL
# (against the corpus high-water day) expire by deleting whole partition
# directories — a metadata/filesystem operation that never reads or
# rewrites surviving data.  At 100 TB this is the difference between a
# table rewrite and an O(#expired-partitions) directory delete; it is the
# dbt retention macro / `ALTER TABLE DROP PARTITION` the reference ships
# via dbt-spark (dbtoperator.py:273-274).
#
# Output: the per-day census of the SURVIVING table read back from disk,
# plus the expired-partition count on every row (exact, oracle-checked).
# --------------------------------------------------------------------------

_TTL_DAYS = 14

_SINK_TTL_ORACLE = f"""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day FROM events
),
hw AS (SELECT MAX(day) AS max_d FROM d),
dropped AS (
  SELECT COUNT(DISTINCT day) AS n_expired
  FROM d CROSS JOIN hw WHERE day < max_d - INTERVAL {_TTL_DAYS} DAY
)
SELECT CAST(d.day AS VARCHAR) AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(dropped.n_expired AS BIGINT) AS n_expired_partitions
FROM d CROSS JOIN hw CROSS JOIN dropped
WHERE d.day >= hw.max_d - INTERVAL {_TTL_DAYS} DAY
GROUP BY d.day, dropped.n_expired
"""


@register("sink_ttl_expire", oracle=_SINK_TTL_ORACLE)
def sink_ttl_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime
    import shutil

    path = _scratch("sink_ttl_expire", sf_dir)
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", "value", F.to_date("ts").alias("day")
    )
    base.write.mode("overwrite").partitionBy("day").parquet(path)

    # High-water day straight from the partition LISTING (ISO dates sort
    # lexicographically) — no second scan of the source (review finding):
    # the directory enumeration below is already the operator's cost.
    days = sorted(
        e[4:]
        for e in os.listdir(path)
        # NULL event timestamps land in day=__HIVE_DEFAULT_PARTITION__ —
        # undated rows have no age, so TTL neither counts nor expires them
        if e.startswith("day=") and not e.endswith("__HIVE_DEFAULT_PARTITION__")
    )
    if not days:  # empty source → no partitions, nothing to expire
        return local_rows(spark, 
            [], "day string, n bigint, n_expired_partitions bigint"
        )
    cutoff = (
        datetime.date.fromisoformat(days[-1])
        - datetime.timedelta(days=_TTL_DAYS)
    ).isoformat()
    # Partition drop: remove expired day= directories — O(#expired dirs),
    # zero data read/rewrite (the ALTER TABLE DROP PARTITION shape).
    n_expired = 0
    for d in days:
        if d < cutoff:
            shutil.rmtree(os.path.join(path, f"day={d}"))
            n_expired += 1

    return (
        spark.read.parquet(path)
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .withColumn("n_expired_partitions", F.lit(n_expired).cast("bigint"))
    )


# --------------------------------------------------------------------------
# sink_quarantine — write-time constraint enforcement (the Delta/DLT
# expectations story): incoming orders pass a constraint battery
# (price > 0, known status, non-null custkey); violators are NOT dropped
# silently — they land in a quarantine table tagged with the FIRST failed
# constraint while clean rows land in the target, and the audit the
# operator returns reconciles both sides exactly.  Violations are planted
# deterministically (orderkey-keyed corruptions) so both engines enforce
# the identical battery on identical payloads.
#
# Scale: one scan, one map-side constraint tag, two partitioned writes;
# the audit is a keyed count over the read-back tables (counts re-read
# from DISK, not the in-flight relation — the write is what's audited).
# --------------------------------------------------------------------------

_QUAR_ORACLE = """
WITH corrupted AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
              ELSE o_totalprice END AS price,
         CASE WHEN o_orderkey % 101 = 0 THEN 'X'
              ELSE o_orderstatus END AS status,
         CASE WHEN o_orderkey % 103 = 0 THEN NULL
              ELSE o_custkey END AS custkey
  FROM orders
),
tagged AS (
  SELECT *,
         CASE WHEN price <= 0 THEN 'nonpositive_price'
              WHEN status NOT IN ('O', 'F', 'P') THEN 'unknown_status'
              WHEN custkey IS NULL THEN 'null_custkey'
              ELSE NULL END AS violation
  FROM corrupted
)
SELECT COALESCE(violation, 'CLEAN') AS disposition,
       CAST(COUNT(*) AS BIGINT) AS n
FROM tagged GROUP BY COALESCE(violation, 'CLEAN')
"""


@register("sink_quarantine", oracle=_QUAR_ORACLE)
def sink_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_quarantine", sf_dir)
    o = load(spark, sf_dir, "orders")
    corrupted = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 101 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.when(F.col("o_orderkey") % 103 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("o_custkey"))
        .alias("custkey"),
    )
    violation = (
        F.when(F.col("price") <= 0, "nonpositive_price")
        .when(~F.col("status").isin("O", "F", "P"), "unknown_status")
        .when(F.col("custkey").isNull(), "null_custkey")
    )
    tagged = corrupted.withColumn("violation", violation)
    clean = tagged.filter(F.col("violation").isNull()).drop("violation")
    quarantined = tagged.filter(F.col("violation").isNotNull())
    clean.write.mode("overwrite").parquet(os.path.join(path, "target"))
    quarantined.write.mode("overwrite").parquet(os.path.join(path, "quarantine"))
    # audit from DISK — the landed tables are the contract
    t = (
        spark.read.parquet(os.path.join(path, "target"))
        .select(F.lit("CLEAN").alias("disposition"))
    )
    q = spark.read.parquet(os.path.join(path, "quarantine")).select(
        F.col("violation").alias("disposition")
    )
    return (
        t.unionAll(q)
        .groupBy("disposition")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


# --------------------------------------------------------------------------
# sink_vacuum — orphan-file removal against the newest manifest (the
# VACUUM half of the Iceberg/Delta maintenance pair whose time-travel
# half is sink_time_travel): data files are immutable and versions are
# file lists, so a failed write, a retried task, or an expired version
# leaves files on disk that NO manifest references — reclaimable only by
# set-differencing the directory listing against the manifest.  The
# operator plants two deterministic orphans (a copied data file per
# commit dir — exactly what a killed task attempt leaves), vacuums
# everything the v2 manifest does not reference, and proves
# read-after-vacuum integrity by re-aggregating the surviving table.
#
# Scale: the listing/diff is metadata-only (no data read); deletion is
# O(#orphans).  Like sink_ttl_expire, the local-FS walk stands in for
# the object-store/catalog listing API (PLANS.md note).  The file COUNT
# is environment-dependent (writer parallelism) and deliberately not
# output; the orphan count is exactly the 2 planted.
# --------------------------------------------------------------------------

_VACUUM_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       {osum('o_totalprice')} AS total_price,
       CAST(2 AS BIGINT) AS n_orphans_removed
FROM orders
"""


@register("sink_vacuum", oracle=_VACUUM_ORACLE)
def sink_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import json as _json
    import shutil

    from nedp_etl_spark.operators.scans import (
        _read_at_version,
        _time_travel_layout,
    )

    root = _time_travel_layout(spark, sf_dir)
    # plant one orphan per commit dir (idempotent: plant-if-missing, and a
    # vacuumed orphan is re-planted on the next call so every run removes
    # exactly 2)
    planted = []
    for commit in ("commit1", "commit2"):
        parts = sorted(_glob.glob(os.path.join(root, commit, "*.parquet")))
        orphan = os.path.join(root, commit, "orphan-attempt-0.parquet")
        if parts and not os.path.exists(orphan):
            shutil.copyfile(parts[0], orphan)
        planted.append(orphan)

    with open(os.path.join(root, "v2.json")) as fh:
        referenced = set(_json.load(fh)["files"])
    on_disk = {
        f
        for commit in ("commit1", "commit2")
        for f in _glob.glob(os.path.join(root, commit, "*.parquet"))
    }
    orphans = sorted(on_disk - referenced)
    for f in orphans:
        os.remove(f)

    return _read_at_version(spark, root, 2).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
        F.lit(len(orphans)).cast("bigint").alias("n_orphans_removed"),
    )


# --------------------------------------------------------------------------
# sample_weighted_reservoir — weight-proportional sampling without
# replacement, derandomized (Efraimidis & Spirakis 2006's A-ES: assign
# each item key = u^(1/w) with u uniform, keep the top-k keys — the ONLY
# known one-pass weighted reservoir).  sample_bottomk draws uniformly;
# this draws documents proportionally to n_chars (importance sampling for
# curation: long documents carry more training tokens, so a
# token-budgeted audit sample should over-represent them).  u derives
# from md5(doc_id) — no RNG, bit-replayable on any engine.
#
# Scale shape: key assignment is map-side; top-k is orderBy+limit
# (TakeOrderedAndProject: each partition keeps its local k; the corpus is
# never globally sorted).
#
# Parity: u = (first 8 md5 hex digits)/2^32, clamped away from 0; key
# computed as exp(ln(u)/w) TEXTUALLY on both engines, quantized q9 with
# the doc_id tie-break; zero/negative weights are excluded (their key is
# undefined — A-ES requires w > 0).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_WRES_K = 25

_WRES_ORACLE = f"""
WITH it AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
         CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) AS DOUBLE) / 4294967296.0 AS u0
  FROM documents WHERE n_chars > 0
),
keyed AS (
  SELECT doc_id, w,
         FLOOR(exp(ln(GREATEST(u0, 0.000000001)) / w) * 1000000000.0 + 0.5)
           / 1000000000.0 AS k
  FROM it
)
SELECT doc_id, CAST(w AS BIGINT) AS weight, k AS sample_key
FROM keyed
ORDER BY k DESC, doc_id
LIMIT {_WRES_K}
"""


@register("sample_weighted_reservoir", oracle=_WRES_ORACLE)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u0 = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / 4294967296.0
    )
    w = F.col("n_chars").cast("double")
    key = (
        F.floor(
            F.exp(F.log(F.greatest(u0, F.lit(0.000000001))) / w)
            * 1_000_000_000.0
            + F.lit(0.5)
        )
        / 1_000_000_000.0
    )
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), "doc_id")
        .limit(_WRES_K)
    )
