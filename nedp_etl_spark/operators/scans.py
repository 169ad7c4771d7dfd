"""Scan / source / sink operators (SURVEY.md §2 'Scans / sources / sinks').

These mirror the materialization strategies the reference ships through
dbt-spark (``/root/reference/dbtoperator.py:273-274``): ``seed`` (CSV/JSON
ingest), ``table`` (full rewrite), ``incremental`` (merge), ``snapshot``
(SCD2).  Spark's parquet tables don't support MERGE INTO without a
lakehouse format, so the incremental/snapshot merges are expressed
algebraically (anti-join + union) — the exact algorithm dbt-spark's
``incremental`` materialization generates for non-Delta tables, and the
plan Catalyst produces is the same shuffled join either way.  At 100 TB the
write path partitions by date so an incremental run rewrites only touched
partitions.

Sinks write under ``_scratch/<query>/<sf>`` inside the repo (the driver may
run any query at any sf concurrently — paths are sf-scoped).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nedp_etl_spark.data import load, local_rows
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum_dec, osum_dec

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "..", "_scratch")


def _sf_tag(sf_dir: str) -> str:
    """Identifier-safe scale-factor tag (view/observation name suffixes)."""
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return sf.replace(".", "_").replace("-", "_")


def _fixture_fingerprint(sf_dir: str) -> str:
    """8-hex digest of the fixture identity: the full normalized path plus
    (name, size, mtime_ns) of every parquet file directly under it.

    Scratch layouts skip regeneration via on-disk markers (_SUCCESS,
    v2.json); keying the scratch path on basename alone let two fixture
    dirs sharing a basename — or a fixture regenerated in place — silently
    serve a stale layout (round-8 advice).  Content-stat keying makes the
    marker check sound: a different or regenerated fixture gets a fresh
    scratch dir and the layout rebuilds."""
    import hashlib

    h = hashlib.md5(os.path.abspath(os.path.normpath(sf_dir)).encode())
    try:
        with os.scandir(sf_dir) as it:
            for e in sorted(it, key=lambda e: e.name):
                if e.name.endswith(".parquet") and e.is_file():
                    st = e.stat()
                    h.update(f"{e.name}:{st.st_size}:{st.st_mtime_ns}".encode())
    except OSError:
        pass
    return h.hexdigest()[:8]


def _scratch(name: str, sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.abspath(
        os.path.join(_SCRATCH, name, f"{sf}-{_fixture_fingerprint(sf_dir)}")
    )


# --------------------------------------------------------------------------
# scan_parquet — full-table scan summary.
# --------------------------------------------------------------------------

_SCAN_PARQUET_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM lineitem) AS lineitem_rows,
  (SELECT COUNT(*) FROM orders) AS orders_rows,
  (SELECT COUNT(*) FROM customer) AS customer_rows,
  (SELECT CAST(CAST(MIN(l_shipdate) AS DATE) AS VARCHAR) FROM lineitem) AS min_ship,
  (SELECT CAST(CAST(MAX(l_shipdate) AS DATE) AS VARCHAR) FROM lineitem) AS max_ship
"""


@register("scan_parquet", oracle=_SCAN_PARQUET_ORACLE)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    li_agg = li.agg(
        F.count(F.lit(1)).alias("lineitem_rows"),
        F.min(F.col("l_shipdate").cast("date")).cast("string").alias("min_ship"),
        F.max(F.col("l_shipdate").cast("date")).cast("string").alias("max_ship"),
    )
    return (
        li_agg.crossJoin(o.agg(F.count(F.lit(1)).alias("orders_rows")))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("customer_rows")))
        .select("lineitem_rows", "orders_rows", "customer_rows", "min_ship", "max_ship")
    )


# --------------------------------------------------------------------------
# scan_csv_json — dbt `seed` analogue: CSV + JSON ingest with explicit
# schemas, round-tripped from the parquet fixtures so the oracle can check
# exact equality against the originals.
# --------------------------------------------------------------------------

_SCAN_CSV_JSON_ORACLE = """
SELECT n.n_nationkey, n.n_name, n.n_regionkey, r.r_name
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@register("scan_csv_json", oracle=_SCAN_CSV_JSON_ORACLE)
def scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation_csv = _scratch("scan_csv_json/nation_csv", sf_dir)
    region_json = _scratch("scan_csv_json/region_json", sf_dir)
    load(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(nation_csv)
    load(spark, sf_dir, "region").write.mode("overwrite").json(region_json)

    nation_schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    region_schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    n = spark.read.schema(nation_schema).option("header", True).csv(nation_csv)
    r = spark.read.schema(region_schema).json(region_json)
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "n_regionkey", "r_name"
    )


# --------------------------------------------------------------------------
# scan_partition_prune — filtered scan that skips row groups via parquet
# min/max stats (and partitions, when the layout is date-partitioned).
# --------------------------------------------------------------------------

_SCAN_PRUNE_ORACLE = """
SELECT
  CAST(CAST(date_trunc('month', l_shipdate) AS DATE) AS VARCHAR) AS ship_month,
  COUNT(*) AS n,
  COUNT(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
GROUP BY 1
"""


@register("scan_partition_prune", oracle=_SCAN_PRUNE_ORACLE)
def scan_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.date_trunc("month", "l_shipdate").cast("date").cast("string").alias("ship_month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# sink_table — dbt `table` materialization: full rewrite, partitioned by a
# derived date column (the 100 TB layout), then read back.
# --------------------------------------------------------------------------

_SINK_TABLE_ORACLE = """
SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 6) AS o_totalprice,
       CAST(year(o_orderdate) AS INT) AS order_year
FROM orders WHERE o_totalprice > 150000
"""


@register("sink_table", oracle=_SINK_TABLE_ORACLE)
def sink_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_table", sf_dir)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    out = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 6).alias("o_totalprice"),
        F.year("o_orderdate").cast("int").alias("order_year"),
    )
    out.write.mode("overwrite").partitionBy("order_year").parquet(path)
    # explicit schema: an all-empty source (an empty day/partition at 100 TB
    # is routine) writes zero data files, and schema inference would fail
    df = spark.read.schema(out.schema).parquet(path)
    # partition column comes back last and as read-schema int — re-order and
    # re-cast so the materialized table equals the declared SELECT.
    return df.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("order_year").cast("int").alias("order_year"),
    )


# --------------------------------------------------------------------------
# sink_incremental_merge — dbt `incremental` (merge strategy): new+changed
# source rows override matched target rows; unmatched target rows survive.
# --------------------------------------------------------------------------

_SINK_MERGE_ORACLE = """
WITH target AS (
  SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 6) AS o_totalprice
  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
),
source AS (
  SELECT o_orderkey, 'U' AS o_orderstatus, ROUND(o_totalprice * 1.1, 6) AS o_totalprice
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-06-01 00:00:00'
)
SELECT o_orderkey, o_orderstatus, o_totalprice, 'merged' AS src FROM source
UNION ALL
SELECT t.o_orderkey, t.o_orderstatus, t.o_totalprice, 'kept' AS src
FROM target t
WHERE NOT EXISTS (SELECT 1 FROM source s WHERE s.o_orderkey = t.o_orderkey)
"""


@register("sink_incremental_merge", oracle=_SINK_MERGE_ORACLE)
def sink_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_incremental_merge", sf_dir)
    o = load(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")).select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 6).alias("o_totalprice")
    )
    target.write.mode("overwrite").parquet(path)  # existing materialized state

    source = o.filter(
        F.col("o_orderdate") >= F.lit("1996-06-01 00:00:00").cast("timestamp")
    ).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        F.round(F.col("o_totalprice") * 1.1, 6).alias("o_totalprice"),
    )

    existing = spark.read.parquet(path)
    # MERGE: source wins on key match, target rows without a match survive.
    # (left_anti + unionAll ≡ WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT
    # for whole-row updates; on Delta/Iceberg this becomes MERGE INTO.)
    kept = existing.join(source, on="o_orderkey", how="left_anti")
    merged = source.withColumn("src", F.lit("merged")).unionAll(
        kept.withColumn("src", F.lit("kept"))
    )
    merged.write.mode("overwrite").parquet(path + "_v2")
    return spark.read.parquet(path + "_v2").select("o_orderkey", "o_orderstatus", "o_totalprice", "src")


# --------------------------------------------------------------------------
# sink_snapshot_scd2 — dbt `snapshot`: slowly-changing-dimension type 2
# with valid_from / valid_to / is_current.
# --------------------------------------------------------------------------

_SINK_SCD2_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_mktsegment, ROUND(c_acctbal, 6) AS c_acctbal FROM customer
),
changed AS (SELECT * FROM base WHERE c_acctbal > 5000)
SELECT c_custkey, c_mktsegment AS segment, c_acctbal,
       '2024-01-01' AS valid_from, '2024-06-01' AS valid_to, FALSE AS is_current
FROM changed
UNION ALL
SELECT c_custkey, 'PREMIUM' AS segment, c_acctbal,
       '2024-06-01' AS valid_from, NULL AS valid_to, TRUE AS is_current
FROM changed
UNION ALL
SELECT c_custkey, c_mktsegment AS segment, c_acctbal,
       '2024-01-01' AS valid_from, NULL AS valid_to, TRUE AS is_current
FROM base WHERE c_acctbal <= 5000
"""


@register("sink_snapshot_scd2", oracle=_SINK_SCD2_ORACLE)
def sink_snapshot_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_snapshot_scd2", sf_dir)
    base = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 6).alias("c_acctbal"),
    )
    # snapshot t0: everyone current as of 2024-01-01
    t0 = base.select(
        "c_custkey",
        "segment",
        "c_acctbal",
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    t0.write.mode("overwrite").parquet(path)

    # update set at 2024-06-01: high-balance customers move to PREMIUM
    updates = base.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", F.lit("PREMIUM").alias("segment"), "c_acctbal"
    )

    snap = spark.read.parquet(path)
    upd_keys = updates.select("c_custkey")
    # close out current rows for changed keys …
    closed = (
        snap.join(upd_keys, "c_custkey", "left_semi")
        .withColumn("valid_to", F.lit("2024-06-01"))
        .withColumn("is_current", F.lit(False))
    )
    # … keep unchanged rows …
    untouched = snap.join(upd_keys, "c_custkey", "left_anti")
    # … append new current versions.
    opened = updates.select(
        "c_custkey",
        "segment",
        "c_acctbal",
        F.lit("2024-06-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    result = closed.unionByName(untouched).unionByName(opened)
    result.write.mode("overwrite").parquet(path + "_v2")
    return spark.read.parquet(path + "_v2")


# --------------------------------------------------------------------------
# sink_scd2_partitioned — SCD2 snapshot merge with PARTITION-PRUNED
# rewrite (dbt `insert_overwrite` incremental strategy, the scale path for
# sink_snapshot_scd2 which rewrites the whole target): the partition list
# is derived from the CHANGED KEYS (old partition ∪ new partition), the
# merge reads ONLY those partitions (PartitionFilters on the scan), and
# dynamic partition overwrite rewrites only them — at 100 TB the other
# partitions' files are never opened, never rewritten.
# Reference parity: this is the `insert_overwrite` strategy the reference
# ships via dbt-spark (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SINK_SCD2_PART_ORACLE = """
WITH base AS (
  SELECT c_custkey, c_mktsegment AS segment, ROUND(c_acctbal, 6) AS c_acctbal
  FROM customer
),
changed AS (SELECT * FROM base WHERE segment = 'BUILDING' AND c_acctbal > 9000)
SELECT c_custkey, segment, c_acctbal,
       '2024-01-01' AS valid_from, '2024-06-01' AS valid_to, FALSE AS is_current
FROM changed
UNION ALL
SELECT c_custkey, 'PREMIUM' AS segment, c_acctbal,
       '2024-06-01' AS valid_from, NULL AS valid_to, TRUE AS is_current
FROM changed
UNION ALL
SELECT c_custkey, segment, c_acctbal,
       '2024-01-01' AS valid_from, NULL AS valid_to, TRUE AS is_current
FROM base WHERE NOT (segment = 'BUILDING' AND c_acctbal > 9000)
"""


def _scd2_affected_read(
    spark: SparkSession, path: str, affected: list, schema
) -> DataFrame:
    """Partition-pruned read of the SCD2 target — only `affected` segments.

    Factored out so the plan test can assert the scan carries
    PartitionFilters (the rewrite never opens untouched partitions).  The
    explicit schema keeps the read working when the target holds zero data
    files (an all-empty snapshot — inference would fail).
    """
    return (
        spark.read.schema(schema).parquet(path).filter(F.col("segment").isin(affected))
    )


@register("sink_scd2_partitioned", oracle=_SINK_SCD2_PART_ORACLE)
def sink_scd2_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_scd2_partitioned", sf_dir)
    base = load(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.round("c_acctbal", 6).alias("c_acctbal"),
    )
    # snapshot t0: everyone current as of 2024-01-01, PARTITIONED by segment
    t0 = base.select(
        "c_custkey",
        "c_acctbal",
        F.lit("2024-01-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
        "segment",
    )
    t0.write.mode("overwrite").partitionBy("segment").parquet(path)

    # change set at 2024-06-01: high-balance BUILDING customers → PREMIUM
    updates = base.filter(
        (F.col("segment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    ).select("c_custkey", F.lit("PREMIUM").alias("segment"), "c_acctbal")

    # Affected partitions = old partitions of changed keys ∪ their new
    # partitions.  Bounded collect: ≤ #segments (5-ish) rows at ANY corpus
    # size — this is the partition list dbt's insert_overwrite computes.
    affected = sorted(
        {r["segment"] for r in updates.select("segment").distinct().collect()}
        | {"BUILDING"}
    )
    existing = _scd2_affected_read(spark, path, affected, t0.schema)

    upd_keys = updates.select("c_custkey")
    closed = (
        existing.join(upd_keys, "c_custkey", "left_semi")
        .withColumn("valid_to", F.lit("2024-06-01"))
        .withColumn("is_current", F.lit(False))
    )
    kept = existing.join(upd_keys, "c_custkey", "left_anti")
    opened = updates.select(
        "c_custkey",
        "c_acctbal",
        F.lit("2024-06-01").alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
        "segment",
    )
    merged = closed.unionByName(kept).unionByName(opened)
    # dynamic overwrite: ONLY partitions present in `merged` (BUILDING,
    # PREMIUM) are replaced; the other segments' files are never touched.
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("segment")
        .parquet(path)
    )
    return spark.read.schema(t0.schema).parquet(path).select(
        "c_custkey", "segment", "c_acctbal", "valid_from", "valid_to", "is_current"
    )


# --------------------------------------------------------------------------
# scan_orc — ORC ingest (columnar source beyond parquet/CSV/JSON).  DuckDB
# cannot read ORC, so the oracle checks the round-trip against the source
# table instead — format conversion must be lossless.
# --------------------------------------------------------------------------

_SCAN_ORC_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey FROM nation
"""


@register("scan_orc", oracle=_SCAN_ORC_ORACLE)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("scan_orc/nation", sf_dir)
    load(spark, sf_dir, "nation").write.mode("overwrite").orc(path)
    return spark.read.orc(path).select("n_nationkey", "n_name", "n_regionkey")


# --------------------------------------------------------------------------
# sink_view — dbt `view` materialization: the query is stored, not the data;
# reads re-execute the plan (createOrReplaceTempView in-session).
# --------------------------------------------------------------------------

_SINK_VIEW_ORACLE = f"""
SELECT o_orderstatus, COUNT(*) AS n, {osum_dec('o_totalprice')} AS total
FROM orders WHERE o_totalprice > 100000 GROUP BY o_orderstatus
"""


@register("sink_view", oracle=_SINK_VIEW_ORACLE)
def sink_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    # sf-scoped view name: temp views are SESSION-global, so concurrent
    # runs at different sfs must not share one name (the module contract
    # at the top of this file scopes every other resource by sf)
    view = f"v_big_orders_{_sf_tag(sf_dir)}"
    o.createOrReplaceTempView(view)
    return spark.sql(
        f"SELECT o_orderstatus, COUNT(*) AS n, {osum_dec('o_totalprice')} AS total "
        f"FROM {view} GROUP BY o_orderstatus"
    )


# --------------------------------------------------------------------------
# sink_ephemeral — dbt `ephemeral` materialization: the model never
# materializes anywhere; it is inlined into downstream queries as a CTE.
# --------------------------------------------------------------------------

_SINK_EPHEMERAL_ORACLE = f"""
WITH eph_order_value AS (
  SELECT o_custkey, {osum_dec('o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey
)
SELECT c.c_mktsegment, COUNT(*) AS n_customers,
       {osum_dec('e.spend')} AS segment_spend
FROM customer c JOIN eph_order_value e ON c.c_custkey = e.o_custkey
GROUP BY c.c_mktsegment
"""


@register("sink_ephemeral", oracle=_SINK_EPHEMERAL_ORACLE)
def sink_ephemeral(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the "ephemeral model" is just a DataFrame expression composed inline —
    # exactly how dbt inlines ephemeral models as CTEs.
    o = load(spark, sf_dir, "orders")
    eph = o.groupBy("o_custkey").agg(
        dsum_dec("o_totalprice").alias("spend")
    )
    c = load(spark, sf_dir, "customer")
    return (
        c.join(eph, c.c_custkey == eph.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum_dec("spend").alias("segment_spend"),
        )
    )


# --------------------------------------------------------------------------
# scan_csv_malformed — robust ingest: a CSV with injected bad rows read in
# PERMISSIVE mode (corrupt rows captured, not fatal) vs DROPMALFORMED.
# Exact-checkable form: one bad row is injected after every 10th good row,
# so good = COUNT(nation) and bad = CEIL(good/10) deterministically; the
# output is those counts as parsed by Spark's CSV reader, the oracle derives
# the same numbers from the nation view (DuckDB's own CSV error handling
# differs by design, so it never reads the staged file).
# --------------------------------------------------------------------------

_SCAN_CSV_MALFORMED_ORACLE = """
SELECT
  CAST(COUNT(*) AS BIGINT)                          AS good_rows,
  CAST(CEIL(COUNT(*) / 10.0) AS BIGINT)             AS corrupt_rows,
  CAST(COUNT(*) + CEIL(COUNT(*) / 10.0) AS BIGINT)  AS total_rows,
  CAST(COUNT(*) AS BIGINT)                          AS dropmalformed_rows
FROM nation
"""


@register("scan_csv_malformed", oracle=_SCAN_CSV_MALFORMED_ORACLE)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = _scratch("scan_csv_malformed", sf_dir)
    os.makedirs(stage, exist_ok=True)
    path = os.path.join(stage, "nation_bad.csv")
    # Always rewrite (nation is 25 rows): a staged CSV surviving a fixture
    # regeneration would silently diverge from the oracle's nation-derived
    # counts (ADVICE r3 — same drift mode as the _stream_events staleness fix).
    rows = load(spark, sf_dir, "nation").collect()
    with open(path, "w") as f:
        f.write("n_nationkey,n_name,n_regionkey\n")
        for i, r in enumerate(rows):
            f.write(f"{r.n_nationkey},{r.n_name},{r.n_regionkey}\n")
            if i % 10 == 0:
                f.write(f"not_an_int,BROKEN_ROW_{i},also_bad\n")  # malformed

    schema = "n_nationkey INT, n_name STRING, n_regionkey INT, _corrupt STRING"
    permissive = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        # Spark disallows corrupt-column-only queries on a raw CSV scan
        # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
        # documented pattern is to materialize the parse first.
        # localCheckpoint, not cache(): each invocation builds a fresh plan,
        # so cache() would pin a NEW CacheManager entry per call for the
        # session's lifetime (never GC'd); checkpoint blocks are freed with
        # the DataFrame.  The input is a 28-line staged CSV.
        .localCheckpoint(eager=True)
    )
    dropped = (
        spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    return permissive.agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("good_rows"),
        F.count(F.col("_corrupt")).alias("corrupt_rows"),
        F.count(F.lit(1)).alias("total_rows"),
    ).crossJoin(
        # count(*) would prune every column and CSV malformed-detection only
        # fires on columns actually parsed — count a real column so the bad
        # rows are parsed, detected, and dropped.
        dropped.agg(F.count("n_nationkey").alias("dropmalformed_rows"))
    )


# --------------------------------------------------------------------------
# scan_jsonl_nested — nested-JSONL ingestion (the LLM-corpus interchange
# shape: per-line records with nested metadata structs and tag arrays):
# stage a nested projection, re-ingest with an EXPLICIT nested schema (no
# sampling-based inference job at 100 TB), flatten via dot-paths + explode,
# aggregate.  Struct field pruning keeps unread nested fields out of the
# scan, exactly like top-level column pruning.
# --------------------------------------------------------------------------

_SCAN_JSONL_NESTED_ORACLE = """
WITH flat AS (
  SELECT doc_id, lang, n_chars,
         UNNEST([CASE WHEN n_chars < 100 THEN 'short' ELSE 'long' END, source]) AS tag
  FROM documents WHERE doc_id < 500
)
SELECT lang, tag, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM flat GROUP BY lang, tag
"""


@register("scan_jsonl_nested", oracle=_SCAN_JSONL_NESTED_ORACLE)
def scan_jsonl_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("scan_jsonl_nested", sf_dir)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    nested = d.select(
        "doc_id",
        F.struct(F.col("lang"), F.col("source")).alias("meta"),
        F.struct(
            F.col("n_chars"),
            F.array(
                F.when(F.col("n_chars") < 100, "short").otherwise("long"),
                F.col("source"),
            ).alias("tags"),
        ).alias("stats"),
    )
    nested.write.mode("overwrite").json(path)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("lang", T.StringType()),
                        T.StructField("source", T.StringType()),
                    ]
                ),
            ),
            T.StructField(
                "stats",
                T.StructType(
                    [
                        T.StructField("n_chars", T.LongType()),
                        T.StructField("tags", T.ArrayType(T.StringType())),
                    ]
                ),
            ),
        ]
    )
    back = spark.read.schema(schema).json(path)
    flat = back.select(
        F.col("meta.lang").alias("lang"),
        F.col("stats.n_chars").alias("n_chars"),
        F.explode("stats.tags").alias("tag"),
    )
    return flat.groupBy("lang", "tag").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


# --------------------------------------------------------------------------
# scan_binaryfile — whole-file binary ingestion via the ``binaryFile``
# source (path, modificationTime, length, content), the standard Spark
# entry point for image/audio/model-file corpora: each file becomes one row
# with the raw bytes as a ``binary`` column, feeding the multimodal stack
# (llm_multimodal_col / llm_multimodal_decode) without any custom reader.
# At 100 TB the source lists and splits by FILE (content is never split),
# so small-file consolidation happens upstream (sink_compaction) and
# ``pathGlobFilter`` prunes by extension at listing time, before any read.
# The fixture files are materialized deterministically from ``documents``;
# the oracle recomputes byte length + md5 from the same table, so the
# whole write→list→read→hash round-trip is exact-checked.
# Reference parity: file ingestion appears in the reference only as S3
# download staging (/root/reference/dbtoperator.py, R4) — here it is a
# first-class distributed scan.
# --------------------------------------------------------------------------

_SCAN_BINARYFILE_ORACLE = """
SELECT doc_id,
       octet_length(CAST(text AS BLOB)) AS n_bytes,
       md5(text) AS content_md5
FROM documents WHERE doc_id < 40
"""


@register("scan_binaryfile", oracle=_SCAN_BINARYFILE_ORACLE)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("scan_binaryfile", sf_dir)
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
        .collect()  # 40 rows — fixture materialization only, like the
    )  # nation-CSV setup in scan_csv_json; the SCAN under test is distributed.
    # clear the stage first: the scan lists every *.bin, so doc_N.bin files
    # surviving from a previous fixture generation (different doc_id set)
    # would be read alongside the fresh ones — the scan_csv_malformed
    # staleness-drift class
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    for r in docs:
        with open(os.path.join(path, f"doc_{r['doc_id']}.bin"), "wb") as fh:
            # NULL text → empty blob: a missing payload is an empty file,
            # the binaryFile scan under test must still list and read it
            fh.write((r["text"] or "").encode("utf-8"))
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(path)
    )
    return bf.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )


# --------------------------------------------------------------------------
# sink_sorted_layout — write-for-data-skipping: ``repartitionByRange`` on
# the filter column + ``sortWithinPartitions`` before the parquet write, so
# every output file covers a narrow, non-overlapping o_orderdate range and
# each row group's min/max statistics become selective.  On the read-back,
# a date-band predicate reaches the scan as PushedFilters and parquet
# skips whole row groups / files by footer stats — at 100 TB this layout
# (clustering by the dominant filter dimension) is the difference between
# scanning 100 TB and scanning one date band's worth of files.  The write
# path costs ONE range-shuffle (sampled range boundaries keep output files
# balanced even under date skew).
# Reference parity: dbt clustered/sorted materializations
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_SINK_SORTED_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-07-01'
GROUP BY 1
"""


@register("sink_sorted_layout", oracle=_SINK_SORTED_ORACLE)
def sink_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_sorted_layout", sf_dir)
    o = load(spark, sf_dir, "orders")
    (
        o.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("date"))
    )
    return back.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(25,2)")).cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# sink_zorder — multi-dimensional clustering via a Z-order (Morton) key:
# interleave the bits of the two dominant filter dimensions (customer,
# order day), range-partition + sort the write on the interleaved key, and
# every output file/row group covers a small RECTANGLE in (custkey, day)
# space — so min/max footer stats skip files for predicates on EITHER
# dimension or both.  ``sink_sorted_layout`` clusters one dimension
# perfectly and leaves the other unclustered; Z-order trades a little of
# each for selectivity on both — the standard lakehouse OPTIMIZE ZORDER BY
# layout, built here from first principles (bit interleaving is plain
# integer arithmetic, so the oracle reproduces the key bit-for-bit).
# Write cost: ONE range shuffle on the z-key, same as any clustered write.
# Reference parity: dbt clustered materializations
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_Z_BITS = 12  # 12 bits per dimension → 24-bit Morton key


def _zorder_terms_sql(x: str, y: str, idiv: str) -> str:
    """Bit-interleave as pure integer arithmetic (`idiv` = engine's integer
    division operator), identical in Spark SQL and DuckDB."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x}) {idiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {idiv} {1 << i}) % 2) * {2 << (2 * i)}")
    return " + ".join(terms)


_ZX_SQL = f"o_custkey % {1 << _Z_BITS}"
_ZY_SQL_DUCK = f"date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % {1 << _Z_BITS}"
_ZY_SQL_SPARK = f"datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01') % {1 << _Z_BITS}"

_SINK_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT o_orderdate, o_totalprice,
         {_zorder_terms_sql(_ZX_SQL, _ZY_SQL_DUCK, '//')} AS zkey
  FROM orders
  WHERE o_custkey % {1 << _Z_BITS} < 2048
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
)
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS n_orders,
       CAST(MIN(zkey) AS BIGINT) AS min_zkey,
       CAST(MAX(zkey) AS BIGINT) AS max_zkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
FROM keyed GROUP BY 1
"""


@register("sink_zorder", oracle=_SINK_ZORDER_ORACLE)
def sink_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_zorder", sf_dir)
    o = load(spark, sf_dir, "orders")
    zkey = F.expr(_zorder_terms_sql(_ZX_SQL, _ZY_SQL_SPARK, "div")).alias("zkey")
    (
        o.select("*", zkey)
        .repartitionByRange(8, "zkey")
        .sortWithinPartitions("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    # 2-D box probe: BOTH dimensions' footer stats are now selective.
    back = spark.read.parquet(path).filter(
        (F.col("o_custkey") % (1 << _Z_BITS) < 2048)
        & (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
    )
    return back.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("zkey").alias("min_zkey"),
        F.max("zkey").alias("max_zkey"),
        F.sum(F.col("o_totalprice").cast("decimal(25,2)")).cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# scan_text_lines — whole-line text source (``spark.read.text``): the
# ingestion shape for raw log/corpus files where each line is one record and
# parsing happens IN the engine (split/regexp on the `value` column), not in
# the reader.  Staged from nation (25 rows) as pipe-delimited lines; the
# oracle reconstructs the same lines relationally, so the parse logic — not
# the file handling — is what gets verified.  Scale: the text reader splits
# by line ranges exactly like CSV; parsing is map-side whole-stage codegen.
# --------------------------------------------------------------------------

_SCAN_TEXT_LINES_ORACLE = """
WITH lines AS (
  SELECT n_name || '|' || n_regionkey || '|' || upper(n_name) AS value
  FROM nation
)
SELECT string_split(value, '|')[1] AS name,
       CAST(string_split(value, '|')[2] AS INT) AS region_key,
       length(value) AS line_len
FROM lines
"""


@register("scan_text_lines", oracle=_SCAN_TEXT_LINES_ORACLE)
def scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = _scratch("scan_text_lines", sf_dir)
    (
        load(spark, sf_dir, "nation")
        .select(
            F.concat_ws(
                "|", "n_name", F.col("n_regionkey").cast("string"), F.upper("n_name")
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(stage)
    )
    lines = spark.read.text(stage)
    parts = F.split("value", "\\|")
    # F.get, not getItem: a malformed/short line (NULL fields upstream make
    # concat_ws emit fewer separators) must read back as NULL, not raise
    # INVALID_ARRAY_INDEX under ANSI mode
    return lines.select(
        F.get(parts, 0).alias("name"),
        F.get(parts, 1).cast("int").alias("region_key"),
        F.length("value").cast("bigint").alias("line_len"),
    )


# --------------------------------------------------------------------------
# sink_csv_roundtrip — CSV sink with options (header, explicit null marker,
# quoting) + schema-ed re-ingest.  CSV is lossy for floats unless the write
# pins a format — prices are pre-rounded to 2 dp (exact in both engines) so
# the roundtrip is value-stable.  The verified output is an aggregate over
# the re-read data: equality proves write→read fidelity, not just that the
# files appeared.
# --------------------------------------------------------------------------

_SINK_CSV_ROUNDTRIP_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100
         AS total_price
FROM orders WHERE o_orderkey < 5000
GROUP BY o_orderpriority
"""


@register("sink_csv_roundtrip", oracle=_SINK_CSV_ROUNDTRIP_ORACLE)
def sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = _scratch("sink_csv_roundtrip", sf_dir)
    # Prices travel as integer cents (floor(x*100+0.5) — the dsum idiom,
    # bit-identical in both engines): integer CSV roundtrip is lossless,
    # where 2-dp float text would re-parse inexactly.
    src = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 5000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("price_cents"),
        )
    )
    (
        src.write.mode("overwrite")
        .option("header", True)
        .option("nullValue", "\\N")
        .option("quoteAll", False)
        .csv(stage)
    )
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_orderpriority", T.StringType()),
            T.StructField("price_cents", T.LongType()),
        ]
    )
    back = spark.read.schema(schema).option("header", True).option("nullValue", "\\N").csv(stage)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("price_cents").cast("double") / 100).alias("total_price"),
    )


# --------------------------------------------------------------------------
# sink_parquet_bloom — point-lookup layout: write with a parquet BLOOM
# FILTER on the lookup key (parquet.bloom.filter.enabled#col) plus
# dictionary fallback disabled for the key so the bloom filter is actually
# consulted, then point-probe a key set on the read-back.  Min/max stats
# only help range-clustered columns; bloom filters are the skipping
# mechanism for HIGH-CARDINALITY EQUALITY probes (order ids, content
# hashes) on columns the file is NOT sorted by — at 100 TB a 1%-fpp bloom
# per row group turns a full-table point lookup into a handful of row-group
# reads.  The probe results are exact-checked against the base table.
# --------------------------------------------------------------------------

_SINK_BLOOM_ORACLE = """
SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 6) AS o_totalprice
FROM orders WHERE o_orderkey % 1000 = 7
"""


@register("sink_parquet_bloom", oracle=_SINK_BLOOM_ORACLE)
def sink_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = _scratch("sink_parquet_bloom", sf_dir)
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", F.round("o_totalprice", 6).alias("o_totalprice")
    )
    (
        o.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "200000")
        .option("parquet.enable.dictionary#o_orderkey", "false")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.filter(F.col("o_orderkey") % 1000 == 7)


# --------------------------------------------------------------------------
# scan_file_metadata — per-row lineage via the parquet reader's hidden
# ``_metadata`` struct (file_name, row_index): the provenance columns a
# 100 TB lake pipeline attaches to every ingested row for audit /
# incremental reconciliation.  Purely a scan-time projection — zero extra
# I/O (metadata comes from reader state, not data pages) plus one tiny
# aggregate.  The oracle cannot see filenames through its table views, so
# the compared output is the INVARIANT the provenance contract promises:
# with the single-file fixture, row_index must be a COMPLETE 0-based
# sequence (first 0, last n-1, sum n(n-1)/2 — any duplicate, hole, or
# 1-based indexing breaks the sum) and the file count must be 1; the
# multi-file layout (per-file restart of the sequence) is pinned by the
# planted semantic test, which writes a 2-file table.
# --------------------------------------------------------------------------

_SCAN_FILE_META_ORACLE = """
SELECT CAST(1 AS BIGINT) AS n_files,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(0 AS BIGINT) AS first_row_index,
       CAST(COUNT(*) - 1 AS BIGINT) AS last_row_index,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS sum_row_index,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey
FROM orders
"""


@register("scan_file_metadata", oracle=_SCAN_FILE_META_ORACLE)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return o.select(
        F.col("_metadata.file_name").alias("file_name"),
        F.col("_metadata.row_index").alias("row_index"),
        "o_orderkey",
    ).agg(
        F.countDistinct("file_name").alias("n_files"),
        F.count(F.lit(1)).alias("n_rows"),
        F.min("row_index").cast("bigint").alias("first_row_index"),
        F.max("row_index").cast("bigint").alias("last_row_index"),
        F.sum("row_index").cast("bigint").alias("sum_row_index"),
        F.min("o_orderkey").cast("bigint").alias("min_orderkey"),
    )


# --------------------------------------------------------------------------
# scan_xml — XML ingest via Spark 4's NATIVE xml data source (the former
# spark-xml package, merged into core in Spark 4.0): the supplier table is
# round-tripped through an XML file layout (one <supplier> element per
# row) and read back with an explicit schema, proving the full
# write→escape→parse→type cycle against the parquet original.
#
# Scale shape: the XML reader is a standard FileFormat — it splits by
# file, pushes the explicit schema down (no schema inference pass over
# 100 TB — inference reads every byte TWICE), and feeds the same
# map-side-combining aggregate as any columnar scan.  XML escaping
# (&, <, quotes in names) is exercised by whatever bytes the fixture
# carries; the hash gate compares against the parquet originals, so a
# lossy escape round-trip would surface as a value mismatch.
# Reference parity: the reference ingests seeds/CSV via dbt
# (/root/reference/dbtoperator.py:273-274); XML is the same seed surface
# through Spark 4's native source.
# --------------------------------------------------------------------------

_SCAN_XML_ORACLE = f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND({osum_dec('s_acctbal')}, 2) AS total_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("scan_xml", oracle=_SCAN_XML_ORACLE)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    xml_dir = _scratch("scan_xml/supplier_xml", sf_dir)
    load(spark, sf_dir, "supplier").write.mode("overwrite").format("xml").option(
        "rootTag", "suppliers"
    ).option("rowTag", "supplier").save(xml_dir)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    s = spark.read.format("xml").option("rowTag", "supplier").schema(schema).load(xml_dir)
    n = load(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(dsum_dec("s_acctbal"), 2).alias("total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# scan_manifest_prune — manifest-based FILE SKIPPING (the Iceberg/Delta
# planning model re-expressed on raw parquet): the table is laid out as
# range-partitioned files; a manifest of per-file (min, max, rows)
# statistics is derived once from the `_metadata.file_path` hidden column;
# query planning intersects the predicate with the manifest and reads
# ONLY the overlapping files.  Soundness is the min/max interval algebra:
# a skipped file provably contains no matching row.  At 100 TB manifests
# are why a one-month query on a ten-year table opens 1% of the files —
# pruning happens before any data IO.
#
# The file list is a bounded collect (O(#files of the table), the same
# list Iceberg's planner holds); the data read is a plain pruned scan
# with the residual predicate pushed down.
# --------------------------------------------------------------------------

from nedp_etl_spark.util import dsum, osum  # noqa: E402  (manifest block)

_MANIFEST_PRUNE_ORACLE = f"""
SELECT o_orderstatus, COUNT(*) AS n, {osum('o_totalprice')} AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderstatus
"""


def _manifest_layout(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the range-partitioned file layout once per sf.

    Idempotent via the _SUCCESS marker: repeat invocations (bench, tests)
    skip the table rewrite and pay only the planning cost — matching the
    real system, where the layout exists and only manifests are consulted
    (review catch, round 8)."""
    path = _scratch("scan_manifest_prune", sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
            .repartitionByRange(8, "o_orderdate")
            .write.mode("overwrite")
            .parquet(path)
        )
    return path


def _manifest_prune_files(spark: SparkSession, path: str, lo: str, hi: str) -> list:
    """The planning step: per-file min/max from _metadata, keep files whose
    interval intersects [lo, hi).  Returns the bounded file list."""
    manifest = (
        spark.read.parquet(path)
        .groupBy(F.col("_metadata.file_path").alias("file"))
        .agg(F.min("o_orderdate").alias("dmin"), F.max("o_orderdate").alias("dmax"))
    )
    rows = manifest.filter(
        (F.col("dmax") >= F.lit(lo).cast("timestamp"))
        & (F.col("dmin") < F.lit(hi).cast("timestamp"))
    ).collect()
    return [r["file"] for r in rows]


@register("scan_manifest_prune", oracle=_MANIFEST_PRUNE_ORACLE)
def scan_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo, hi = "1996-01-01 00:00:00", "1997-01-01 00:00:00"
    path = _manifest_layout(spark, sf_dir)
    files = _manifest_prune_files(spark, path, lo, hi)
    pruned = spark.read.parquet(*files) if files else spark.read.parquet(path).limit(0)
    return (
        pruned.filter(
            (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))
    )



# --------------------------------------------------------------------------
# join_dpp — dynamic partition pruning, pinned: the fact table is laid out
# partitioned by order_year; the query joins it to a SMALL dim filtered on
# a non-partition attribute, so the partitions to read are only knowable
# at RUNTIME from the dim's surviving keys.  Catalyst inserts a
# DynamicPruningExpression on the fact scan (the broadcast's key set
# becomes a partition filter) — at 100 TB this is the difference between
# scanning 7 years and the 2 the dim selects, with no literal year filter
# anywhere in the query text.  The plan test asserts the
# dynamicpruningexpression is present; this is the one Catalyst scan
# optimization the plan-audit suite did not yet pin.
# --------------------------------------------------------------------------

_DPP_TARGET_YEARS = (1995, 1996)

_DPP_ORACLE = f"""
SELECT CAST(year(o_orderdate) AS INT) AS order_year, o_orderstatus,
       COUNT(*) AS n, {osum('o_totalprice')} AS revenue
FROM orders
WHERE year(o_orderdate) IN {_DPP_TARGET_YEARS}
GROUP BY 1, 2
"""


def _dpp_layout(spark: SparkSession, sf_dir: str) -> str:
    """Year-partitioned orders layout, idempotent via _SUCCESS (the
    _manifest_layout pattern; _scratch is fixture-fingerprint-keyed)."""
    path = _scratch("join_dpp", sf_dir)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load(spark, sf_dir, "orders")
            .select(
                "o_orderkey",
                "o_orderstatus",
                "o_totalprice",
                F.year("o_orderdate").cast("int").alias("order_year"),
            )
            .write.mode("overwrite")
            .partitionBy("order_year")
            .parquet(path)
        )
    return path


@register("join_dpp", oracle=_DPP_ORACLE)
def join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit schema: an empty source leaves the layout with no data files
    fact = spark.read.schema(
        "o_orderkey bigint, o_orderstatus string, o_totalprice double,"
        " order_year int"
    ).parquet(_dpp_layout(spark, sf_dir))
    dim = local_rows(spark, 
        [
            (y, "target" if y in _DPP_TARGET_YEARS else "other")
            for y in range(1992, 1999)
        ],
        "order_year int, label string",
    )
    return (
        fact.join(F.broadcast(dim.filter(F.col("label") == "target")), "order_year")
        .groupBy(F.col("order_year").cast("int").alias("order_year"), "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))
    )


# --------------------------------------------------------------------------
# sink_time_travel — snapshot-versioned table with manifest-driven
# time-travel reads: the transaction-log primitive of Iceberg/Delta-style
# lakehouse tables, built from plain parquet + JSON manifests.  Commit v1
# writes the pre-1997 order book; commit v2 APPENDS the 1997+ files and
# writes a new manifest referencing old + new files — data files are
# immutable, a version is just a file list, and reading @v1 after v2
# exists is a pure manifest lookup (no copy, no rewind).  The reference
# ships incremental dbt models whose audit story needs exactly this
# (dbtoperator.py:273-274 delegates to dbt-spark).
#
# Scale shape: each commit touches only its own files; the time-travel
# read plans a parquet scan over the manifest's file list, so @v1 cost is
# v1's data size regardless of how many commits followed.  The output
# aggregates each version's state — at 100 TB the same manifests drive
# partition/file pruning exactly like scan_manifest_prune above.
# --------------------------------------------------------------------------

_TT_CUT = "1997-01-01 00:00:00"

_TIME_TRAVEL_ORACLE = f"""
WITH v1 AS (
  SELECT COUNT(*) AS n_orders, {osum('o_totalprice')} AS total_price
  FROM orders WHERE o_orderdate < TIMESTAMP '{_TT_CUT}'
),
v2 AS (
  SELECT COUNT(*) AS n_orders, {osum('o_totalprice')} AS total_price
  FROM orders
)
SELECT 1 AS version, CAST(n_orders AS BIGINT) AS n_orders, total_price FROM v1
UNION ALL
SELECT 2 AS version, CAST(n_orders AS BIGINT) AS n_orders, total_price FROM v2
"""


def _time_travel_layout(spark: SparkSession, sf_dir: str) -> str:
    """Two immutable commits + JSON manifests; idempotent via v2.json."""
    import glob as _glob
    import json as _json

    root = _scratch("sink_time_travel", sf_dir)
    if os.path.exists(os.path.join(root, "v2.json")):
        return root
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cut = F.lit(_TT_CUT).cast("timestamp")
    d1 = os.path.join(root, "commit1")
    d2 = os.path.join(root, "commit2")
    orders.filter(F.col("o_orderdate") < cut).write.mode("overwrite").parquet(d1)
    orders.filter(F.col("o_orderdate") >= cut).write.mode("overwrite").parquet(d2)
    f1 = sorted(_glob.glob(os.path.join(d1, "*.parquet")))
    f2 = sorted(_glob.glob(os.path.join(d2, "*.parquet")))
    with open(os.path.join(root, "v1.json"), "w") as fh:
        _json.dump({"version": 1, "files": f1}, fh)
    with open(os.path.join(root, "v2.json"), "w") as fh:  # old + new files
        _json.dump({"version": 2, "files": f1 + f2}, fh)
    return root


def _read_at_version(spark: SparkSession, root: str, version: int) -> DataFrame:
    import json as _json

    with open(os.path.join(root, f"v{version}.json")) as fh:
        manifest = _json.load(fh)
    return spark.read.parquet(*manifest["files"])


@register("sink_time_travel", oracle=_TIME_TRAVEL_ORACLE)
def sink_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _time_travel_layout(spark, sf_dir)

    def _state(version: int) -> DataFrame:
        return _read_at_version(spark, root, version).agg(
            F.lit(version).alias("version"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )

    return _state(1).unionAll(_state(2)).select(
        "version", "n_orders", "total_price"
    )


# --------------------------------------------------------------------------
# scan_deletion_vectors — merge-on-read with positional deletion vectors
# (the Delta Lake "deletion vectors" / Iceberg v2 "positional delete file"
# mechanic): a delete marks (file, row_position) pairs in a side file
# instead of rewriting data files; readers anti-join positions during the
# scan.  The layout builds once per (sf, fixture fingerprint): an 8-file
# range layout of orders, then a DV parquet holding the positions of the
# rows a predicate delete would remove — derived POSITIONALLY via
# ``_metadata.row_index``, exactly as a real writer records them.  The
# read path never sees the predicate; the oracle states it directly
# against the fixture, so the gate proves positional MOR reproduces the
# predicate delete.
#
# Scale shape: DV files are tiny relative to data files — the anti-join
# broadcasts the DV side (real readers load the per-file bitmap into
# memory); the base scan stays a plain parquet scan with pushdown intact.
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_DV_ORACLE = """
SELECT o_orderkey, o_orderstatus, ROUND(o_totalprice, 6) AS o_totalprice
FROM orders WHERE o_orderkey % 7 <> 3
"""


def _dv_layout(spark: SparkSession, sf_dir: str) -> str:
    """Base files + deletion-vector file, built once (marker-gated like
    _manifest_layout; the scratch path is fixture-fingerprint-keyed)."""
    root = _scratch("scan_deletion_vectors", sf_dir)
    base = os.path.join(root, "base")
    dv = os.path.join(root, "deletes")
    if not os.path.exists(os.path.join(dv, "_SUCCESS")):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice")
            .repartitionByRange(8, "o_orderkey")
            .write.mode("overwrite")
            .parquet(base)
        )
        (
            spark.read.parquet(base)
            .select(
                "o_orderkey",
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
                    "file_name"
                ),
                F.col("_metadata.row_index").alias("pos"),
            )
            .filter(F.col("o_orderkey") % 7 == 3)
            .select("file_name", "pos")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(dv)
        )
    return root


@register("scan_deletion_vectors", oracle=_DV_ORACLE)
def scan_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    root = _dv_layout(spark, sf_dir)
    base = spark.read.parquet(os.path.join(root, "base")).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1).alias(
            "file_name"
        ),
        F.col("_metadata.row_index").alias("pos"),
    )
    dv = spark.read.parquet(os.path.join(root, "deletes"))
    return base.join(F.broadcast(dv), ["file_name", "pos"], "left_anti").select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 6).alias("o_totalprice"),
    )


# --------------------------------------------------------------------------
# sink_write_audit_publish — the WAP (write-audit-publish) table promotion
# pattern (popularized by Netflix on Iceberg; Delta's staging+swap twin):
# a candidate batch is STAGED to an unpublished location, a quality-check
# battery runs ON THE STAGED FILES (never the live table), and only a
# fully-green audit atomically advances the published-version manifest —
# a red audit leaves the previous version live.  Exercised here with two
# cycles: a clean batch (publishes as v1) and a corrupted batch (NULLed
# keys; audit fails, v1 stays live).  Returns the audit ledger plus the
# live version after each cycle — the artifact a data-platform oncall
# actually reads.
#
# Scale shape: staging writes are ordinary partitioned parquet writes;
# each audit is one aggregate over the staged files; the manifest is a
# 1-line JSON pointer (the atomic swap is a pointer write, never a data
# rewrite — same shape at 100 TB).
# Reference parity: reaches the reference only as dbt-model SQL
# (/root/reference/dbtoperator.py:273-274).
# --------------------------------------------------------------------------

_WAP_ORACLE = """
WITH good AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS nulls,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS dk
  FROM orders
),
bad AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(*) FILTER (WHERE CASE WHEN o_orderkey % 97 = 0 THEN NULL
                                     ELSE o_orderkey END IS NULL) AS BIGINT)
           AS nulls,
         CAST(COUNT(DISTINCT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                             ELSE o_orderkey END) AS BIGINT) AS dk
  FROM orders
)
SELECT 1 AS cycle, 'row_count' AS check_name, n AS observed, n > 0 AS passed,
       1 AS live_version FROM good
UNION ALL SELECT 1, 'null_keys', nulls, nulls = 0, 1 FROM good
UNION ALL SELECT 1, 'unique_keys', dk, dk = n - nulls, 1 FROM good
UNION ALL SELECT 2, 'row_count', n, n > 0, 1 FROM bad
UNION ALL SELECT 2, 'null_keys', nulls, nulls = 0, 1 FROM bad
UNION ALL SELECT 2, 'unique_keys', dk, dk = n - nulls, 1 FROM bad
"""


def _wap_audit(df: DataFrame) -> list:
    """The check battery, computed ON THE STAGED FILES in one aggregate.
    Returns [(check_name, observed, passed)] — bounded (3 rows)."""
    [r] = df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).cast("bigint").alias(
            "nulls"
        ),
        F.countDistinct("o_orderkey").cast("bigint").alias("dk"),
    ).collect()
    return [
        ("row_count", r["n"], r["n"] > 0),
        ("null_keys", r["nulls"], r["nulls"] == 0),
        ("unique_keys", r["dk"], r["dk"] == r["n"] - r["nulls"]),
    ]


@register("sink_write_audit_publish", oracle=_WAP_ORACLE)
def sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    root = _scratch("sink_write_audit_publish", sf_dir)
    manifest = os.path.join(root, "published.json")
    os.makedirs(root, exist_ok=True)
    if os.path.exists(manifest):
        os.remove(manifest)  # replay both cycles deterministically

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    batches = {
        1: o,  # clean candidate
        2: o.withColumn(  # corrupted upstream: keys NULLed on a spine
            "o_orderkey",
            F.when(F.col("o_orderkey") % 97 == 0, F.lit(None)).otherwise(
                F.col("o_orderkey")
            ),
        ),
    }
    ledger = []
    live = 0
    for cycle, batch in batches.items():
        stage = os.path.join(root, f"stage_v{cycle}")
        batch.write.mode("overwrite").parquet(stage)  # 1. WRITE (staged)
        staged = spark.read.parquet(stage)  # audit reads the FILES
        checks = _wap_audit(staged)  # 2. AUDIT
        if all(p for _, _, p in checks):  # 3. PUBLISH (pointer write)
            live = cycle
            with open(manifest, "w") as f:
                json.dump({"version": live, "path": stage}, f)
        if os.path.exists(manifest):  # live version AFTER this cycle
            with open(manifest) as f:
                now_live = json.load(f)["version"]
        else:  # nothing ever published (e.g. every audit failed) — v0
            now_live = 0
        ledger.extend(
            (cycle, name, obs, passed, now_live) for name, obs, passed in checks
        )
    return local_rows(spark, 
        ledger,
        "cycle int, check_name string, observed bigint, passed boolean,"
        " live_version int",
    )


# --------------------------------------------------------------------------
# sink_shallow_clone — zero-copy table clone via manifest pointers (Delta
# Lake's SHALLOW CLONE / Iceberg snapshot-ref semantics): the clone is a
# MANIFEST that lists the source's physical files — no data movement, so
# cloning a 100 TB table costs one JSON write — and subsequent writes land
# in the clone's OWN delta area, diverging the clone without ever
# touching the source.  The dev/staging-against-prod-data workflow.
#
# Layout (fingerprint-keyed scratch): src/ holds the source files;
# clone.json lists [src files] + the clone's delta files; delta/ holds
# clone-only appends.  The registered query builds the layout, appends a
# divergence batch to the CLONE only, and returns per-side aggregates —
# the oracle states both sides' expected content against the fixture.
# The planted test proves zero-copy: the clone manifest references the
# SOURCE'S physical files and the clone directory holds only delta files.
# --------------------------------------------------------------------------

_SHALLOW_CLONE_ORACLE = """
SELECT 'source' AS side, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 1000000.0 AS total_price
FROM orders WHERE o_totalprice > 150000
UNION ALL
SELECT 'clone', CAST(a.n + b.n AS BIGINT),
       CAST(a.s + b.s AS DOUBLE) / 1000000.0
FROM (SELECT COUNT(*) AS n,
             SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT)) AS s
      FROM orders WHERE o_totalprice > 150000) a,
     (SELECT COUNT(*) AS n,
             SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT)) AS s
      FROM orders WHERE o_orderkey % 89 = 5) b
"""


@register("sink_shallow_clone", oracle=_SHALLOW_CLONE_ORACLE)
def sink_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import json
    import shutil

    root = _scratch("sink_shallow_clone", sf_dir)
    src, delta = os.path.join(root, "src"), os.path.join(root, "delta")
    manifest = os.path.join(root, "clone.json")
    shutil.rmtree(root, ignore_errors=True)

    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_totalprice"]
    o.filter(F.col("o_totalprice") > 150000).select(*cols).write.parquet(src)
    src_files = sorted(_glob.glob(os.path.join(src, "*.parquet")))
    # SHALLOW CLONE: a manifest pointing at the source's files — no copy
    with open(manifest, "w") as f:
        json.dump({"files": src_files}, f)
    # diverge the CLONE only: append a batch into the clone's delta area
    o.filter(F.col("o_orderkey") % 89 == 5).select(*cols).write.parquet(delta)
    clone_spec = json.load(open(manifest))
    clone_spec["files"] += sorted(_glob.glob(os.path.join(delta, "*.parquet")))
    with open(manifest, "w") as f:
        json.dump(clone_spec, f)

    src_df = spark.read.parquet(src)
    clone_df = spark.read.parquet(*json.load(open(manifest))["files"])
    q = lambda df: df.agg(  # noqa: E731
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (
            F.sum(F.floor(F.col("o_totalprice") * 1_000_000.0 + 0.5).cast("long"))
            .cast("double")
            / 1_000_000.0
        ).alias("total_price"),
    )
    return (
        q(src_df).select(F.lit("source").alias("side"), "n_rows", "total_price")
    ).unionByName(
        q(clone_df).select(F.lit("clone").alias("side"), "n_rows", "total_price")
    )
