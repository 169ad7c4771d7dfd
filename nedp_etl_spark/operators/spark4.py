"""Spark 4.x native surface: batch ``session_window`` aggregation, collated
(case-insensitive) grouping, and SQL pipe syntax.

The reference delegates all SQL to whatever Spark version the cluster runs
(``/root/reference/dbtoperator.py:273-274``), so a replacement engine should
also expose the *current* engine surface, not just the lowest common
denominator.  Each op here is the Spark-4-native form of a pattern already
proven elsewhere in the repo, with the classic rewrite as its oracle:

- ``win_session_native`` is the engine-native form of ``ts_sessionize``
  (timeseries.py): one ``groupBy(session_window(...))`` instead of the
  lag→flag→running-sum island rewrite.  Catalyst plans it as a single
  exchange on ``user_id`` + a sort-based session merge — the same one-shuffle
  posture, with per-key state bounded by one user's events.  Boundary
  semantics differ from the manual rewrite: the native window half-open
  interval starts a NEW session at gap >= 30 min (the island oracle here
  uses ``>=`` to match; ``ts_sessionize`` keeps the ``>`` form).
- ``fn_collate`` groups under UTF8_LCASE collation — the collation travels
  in the type, so the same hash-aggregate machinery applies (no lower()
  materialization on the hot path); the oracle is the classic lower() twin.
- ``sql_pipe_syntax`` runs a pipe-syntax (|>) aggregation — Spark 4 parses
  pipes into the identical logical plan as the nested-SQL oracle, so this
  also pins that no plan regression hides behind the new parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nedp_etl_spark.data import load, run_sql
from nedp_etl_spark.registry import register
from nedp_etl_spark.util import osum

# --------------------------------------------------------------------------
# win_session_native — per-user session stats via the native session_window.
# --------------------------------------------------------------------------

_SESSION_NATIVE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_num
  FROM flagged
),
per_session AS (
  SELECT user_id, session_num, COUNT(*) AS n_events
  FROM sess GROUP BY user_id, session_num
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events
FROM per_session
GROUP BY user_id
"""


@register("win_session_native", oracle=_SESSION_NATIVE_ORACLE)
def win_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_session = ev.groupBy(
        F.session_window("ts", "30 minutes"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
    )


# --------------------------------------------------------------------------
# fn_collate — case-insensitive grouping via UTF8_LCASE collation.  A
# deterministic mixed-case rendering of `source` (half the docs upper-cased)
# collapses back to one group per source under the collation.
# --------------------------------------------------------------------------

_COLLATE_ORACLE = """
WITH mixed AS (
  SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS s
  FROM documents
)
SELECT min(s) AS representative, COUNT(*) AS n
FROM mixed
GROUP BY lower(s)
"""


@register("fn_collate", oracle=_COLLATE_ORACLE)
def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    mixed = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.upper("source"))
        .otherwise(F.col("source"))
        .alias("s")
    )
    # Collated group-bys fall off the hash-aggregate/codegen path in Spark
    # 4.1 (the plan degrades to SortAggregate over EVERY row — 6.8 s on 5k
    # docs at sf0.1, a scale-killer).  Two-phase instead: an exact binary
    # pre-aggregate (hash agg, whole-stage codegen) collapses the input to
    # its distinct keys, then the collation-aware merge — the part only the
    # collation can express — runs on that tiny intermediate.  Same answer,
    # and the sort-agg cost is O(distinct keys), not O(rows).  See SCALE.md.
    pre = mixed.groupBy("s").agg(F.count(F.lit(1)).alias("pre_n"))
    return (
        pre.groupBy(F.collate("s", "UTF8_LCASE").alias("k"))
        .agg(
            F.min("s").alias("representative"),
            F.sum("pre_n").alias("n"),
        )
        .select("representative", "n")
    )


# --------------------------------------------------------------------------
# sql_pipe_syntax — Spark 4 pipe-syntax aggregation; oracle is the plain
# nested form of the same query.
# --------------------------------------------------------------------------

_PIPE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_lines,
       {osum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
WHERE l_quantity > 10
GROUP BY l_returnflag, l_linestatus
"""


@register("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(
        spark,
        sf_dir,
        """
        FROM lineitem
        |> WHERE l_quantity > 10
        |> EXTEND l_extendedprice * (1 - l_discount) AS rev
        |> AGGREGATE COUNT(*) AS n_lines,
             CAST(SUM(CAST(FLOOR(rev * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS revenue
           GROUP BY l_returnflag, l_linestatus
        """,
        ["lineitem"],
    )


# --------------------------------------------------------------------------
# scan_python_datasource — Spark 4 Python DataSource API: a custom source
# with real partition planning (one InputPartition per shard → one parallel
# read task each), simulating a sharded crawl/feed ingest.  Row content is
# deterministic from (shard, i), so the DuckDB oracle reproduces the source
# exactly from generate_series.  At 100 TB the partitions() list is the
# shard/file/offset-range manifest; each task streams only its slice.
# read() yields pyarrow RecordBatches — the recommended bulk form of the
# API: column values are built vectorized (numpy) and cross the
# Python→JVM boundary as Arrow buffers, not per-row pickled tuples.
# --------------------------------------------------------------------------

_PYSOURCE_PARTS = 8
_PYSOURCE_ROWS = 2000

_PYSOURCE_ORACLE = f"""
WITH src AS (
  SELECT p.p AS shard, i.i AS i,
         (p.p * 1000 + i.i) / 7.0 AS val
  FROM generate_series(0, {_PYSOURCE_PARTS - 1}) p(p),
       generate_series(0, {_PYSOURCE_ROWS - 1}) i(i)
)
SELECT shard,
       COUNT(*) AS n_rows,
       {osum('val')} AS total_val
FROM src GROUP BY shard
"""


@register("scan_python_datasource", oracle=_PYSOURCE_ORACLE)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class CrawlFeedSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "crawl_feed"

        def schema(self) -> str:
            return "shard int, i int, val double"

        def reader(self, schema):  # noqa: ANN001
            return CrawlFeedReader(self.options)

    class CrawlFeedReader(DataSourceReader):
        def __init__(self, options) -> None:  # noqa: ANN001
            self.n_parts = int(options.get("parts", "4"))
            self.rows_per = int(options.get("rows", "100"))

        def partitions(self):  # one InputPartition per shard → parallel tasks
            return [InputPartition(p) for p in range(self.n_parts)]

        def read(self, partition):  # noqa: ANN001
            import numpy as np
            import pyarrow as pa

            p = partition.value
            # 64k-row batches bound per-batch memory regardless of shard
            # size; one shard may be arbitrarily large at real scale.
            step = 65536
            for lo in range(0, self.rows_per, step):
                i = np.arange(lo, min(lo + step, self.rows_per), dtype=np.int64)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(len(i), p, dtype=np.int32)),
                        pa.array(i.astype(np.int32)),
                        pa.array((p * 1000 + i) / 7.0),
                    ],
                    names=["shard", "i", "val"],
                )

    spark.dataSource.register(CrawlFeedSource)
    src = (
        spark.read.format("crawl_feed")
        .option("parts", str(_PYSOURCE_PARTS))
        .option("rows", str(_PYSOURCE_ROWS))
        .load()
    )
    from nedp_etl_spark.util import dsum

    return src.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("val").alias("total_val"),
    )


# --------------------------------------------------------------------------
# fn_xml — XML ingest round-trip: a deterministic XML rendering of each
# order is parsed back with from_xml (Spark 4 native XML support) and
# aggregated.  The oracle computes the same aggregate from the base columns
# directly — DuckDB has no XML parser, so agreement proves the parse is a
# faithful inverse of the render.  Pure map-side expressions; the double
# survives the text round-trip exactly (shortest-repr rendering).
# --------------------------------------------------------------------------

_FN_XML_ORACLE = f"""
SELECT o_orderstatus AS status,
       COUNT(*) AS n,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
       {osum('round(o_totalprice, 2)')} AS total_price
FROM orders
GROUP BY o_orderstatus
"""


@register("fn_xml", oracle=_FN_XML_ORACLE)
def fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nedp_etl_spark.util import dsum

    o = load(spark, sf_dir, "orders")
    xml = F.concat(
        F.lit("<o><k>"), F.col("o_orderkey").cast("string"),
        F.lit("</k><p>"), F.round("o_totalprice", 2).cast("string"),
        F.lit("</p><s>"), F.col("o_orderstatus"),
        F.lit("</s></o>"),
    )
    parsed = o.select(
        F.from_xml(xml.alias("x"), "k BIGINT, p DOUBLE, s STRING").alias("r")
    ).select(F.col("r.k").alias("k"), F.col("r.p").alias("p"), F.col("r.s").alias("s"))
    return parsed.groupBy(F.col("s").alias("status")).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("k").alias("max_key"),
        dsum("p").alias("total_price"),
    )
