"""Change-data-capture apply + dbt source-freshness / catalog parity.

The reference's production loop is Airflow-scheduled dbt invocations
(``/root/reference/dbtoperator.py:314-385``): ``run`` materializes
incremental models (CDC apply is what an incremental model over an op-log
does), ``source freshness`` and ``docs generate`` are first-class dbt
commands.  These register the same surfaces as native queries.

Scale shape:
- ``sink_cdc_apply`` is latest-op-wins over an op-log: ONE shuffle on the
  business key (window row_number by seq desc), deletes dropped, then a
  tiny rollup.  This is exactly the reduce side of a streaming MERGE; at
  100 TB the op-log shards by key and the window state is one key's ops.
- ``dbt_source_freshness`` computes per-source max-loaded-at lag against
  the corpus watermark — two tiny aggregates over one scan, no shuffle
  beyond the group-by.
- ``dbt_catalog`` derives the column catalog from the parquet footers (a
  metadata-only operation at any scale — no data rows are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nedp_etl_spark.data import TABLES, load, local_rows
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import dsum, osum

# --------------------------------------------------------------------------
# sink_cdc_apply — deterministic op-log synthesized from orders: every key
# inserts at seq 1; keys %5 update at seq 2 (price × 1.1); keys %7 delete
# at seq 3.  Apply = keep the highest-seq op per key, drop deletes.
# --------------------------------------------------------------------------

_CDC_ORACLE = f"""
WITH ops AS (
  SELECT o_orderkey AS k, o_orderstatus AS st, 1 AS seq, 'I' AS op,
         o_totalprice AS val
  FROM orders
  UNION ALL
  SELECT o_orderkey, o_orderstatus, 2, 'U', o_totalprice * 1.1
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, o_orderstatus, 3, 'D', CAST(0 AS DOUBLE)
  FROM orders WHERE o_orderkey % 7 = 0
),
latest AS (
  SELECT * FROM (
    SELECT ops.*, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
    FROM ops
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT st AS status,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       {osum('val')} AS total_val
FROM latest GROUP BY st
"""


@register("sink_cdc_apply", oracle=_CDC_ORACLE)
def sink_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("price"),
    )
    ops = (
        o.select("k", "st", F.lit(1).alias("seq"), F.lit("I").alias("op"),
                 F.col("price").alias("val"))
        .unionAll(
            o.filter(F.col("k") % 5 == 0).select(
                "k", "st", F.lit(2).alias("seq"), F.lit("U").alias("op"),
                (F.col("price") * 1.1).alias("val"),
            )
        )
        .unionAll(
            o.filter(F.col("k") % 7 == 0).select(
                "k", "st", F.lit(3).alias("seq"), F.lit("D").alias("op"),
                F.lit(0.0).alias("val"),
            )
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    latest = (
        ops.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
    )
    return latest.groupBy(F.col("st").alias("status")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).cast("bigint").alias("n_updated"),
        dsum("val").alias("total_val"),
    )


# --------------------------------------------------------------------------
# dbt_source_freshness — per-source staleness vs the corpus watermark (the
# deterministic stand-in for now()): warn past 12h lag, error past 48h.
# --------------------------------------------------------------------------

_FRESHNESS_ORACLE = """
WITH wm AS (SELECT MAX(ts) AS as_of FROM events),
per_src AS (
  SELECT event_type AS source_name, MAX(ts) AS max_loaded_at
  FROM events GROUP BY event_type
)
SELECT source_name,
       strftime(max_loaded_at, '%Y-%m-%d %H:%M:%S') AS max_loaded_at,
       CAST(date_diff('second', max_loaded_at, wm.as_of) AS BIGINT)
         AS lag_seconds,
       CASE
         WHEN date_diff('second', max_loaded_at, wm.as_of) > 172800 THEN 'error'
         WHEN date_diff('second', max_loaded_at, wm.as_of) > 43200 THEN 'warn'
         ELSE 'pass'
       END AS status
FROM per_src, wm
"""


@register("dbt_source_freshness", oracle=_FRESHNESS_ORACLE)
def dbt_source_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_src = ev.groupBy(F.col("event_type").alias("source_name")).agg(
        F.max("ts").alias("max_loaded_at")
    )
    wm = ev.agg(F.max("ts").alias("as_of"))
    lag = F.col("as_of").cast("long") - F.col("max_loaded_at").cast("long")
    return per_src.crossJoin(F.broadcast(wm)).select(
        "source_name",
        F.date_format("max_loaded_at", "yyyy-MM-dd HH:mm:ss").alias("max_loaded_at"),
        lag.alias("lag_seconds"),
        F.when(lag > 172800, "error")
        .when(lag > 43200, "warn")
        .otherwise("pass")
        .alias("status"),
    )


# --------------------------------------------------------------------------
# dbt_catalog — docs-generate catalog: (table, column, canonical type) for
# every fixture table, from schema metadata only.
# --------------------------------------------------------------------------

_CATALOG_TYPE_MAP = {
    # spark dtype -> canonical
    "bigint": "bigint", "int": "int", "double": "double", "float": "float",
    "string": "varchar", "timestamp": "timestamp", "timestamp_ntz": "timestamp",
    "date": "date", "boolean": "boolean", "binary": "blob",
    "array<float>": "array<float>", "array<double>": "array<double>",
}

_CATALOG_ORACLE = """
SELECT table_name, column_name,
       CAST(ordinal_position AS BIGINT) AS ordinal_position,
       CASE
         WHEN data_type LIKE 'TIMESTAMP%' THEN 'timestamp'
         WHEN data_type = 'BIGINT' THEN 'bigint'
         WHEN data_type = 'INTEGER' THEN 'int'
         WHEN data_type = 'DOUBLE' THEN 'double'
         WHEN data_type = 'FLOAT' THEN 'float'
         WHEN data_type = 'VARCHAR' THEN 'varchar'
         WHEN data_type = 'DATE' THEN 'date'
         WHEN data_type = 'BOOLEAN' THEN 'boolean'
         WHEN data_type = 'BLOB' THEN 'blob'
         WHEN data_type = 'FLOAT[]' THEN 'array<float>'
         WHEN data_type = 'DOUBLE[]' THEN 'array<double>'
         ELSE lower(data_type)
       END AS data_type
FROM information_schema.columns
WHERE table_name IN ({tables})
""".replace(
    "{tables}", ", ".join(f"'{t}'" for t in TABLES)
)


@register("dbt_catalog", oracle=_CATALOG_ORACLE)
def dbt_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for t in TABLES:
        # schema metadata only — parquet footer read, no data scan
        for i, f_ in enumerate(load(spark, sf_dir, t).schema.fields, start=1):
            dt = f_.dataType.simpleString()
            rows.append((t, f_.name, i, _CATALOG_TYPE_MAP.get(dt, dt)))
    return local_rows(spark, 
        rows, "table_name string, column_name string, "
              "ordinal_position bigint, data_type string"
    )
