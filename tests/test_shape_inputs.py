"""Schema-shape / file-layout sweep: twelfth degenerate regime.

The eleven regimes so far vary VALUES (junk, NULLs, non-finite, unicode,
sentinels), LENGTH (megatoken docs), SKEW, DELIVERY (duplicates), and
CARDINALITY (empty, one-row) — but not the SHAPE of the data: how many
columns a table carries, how deeply its structs nest, and how many files
its bytes are scattered across.  At 100 TB those are the layout
pathologies that actually take clusters down:

* **many small files** — the #1 real-world lakehouse failure: a 100 TB
  table delivered as millions of KB-sized parquet files.  A scan that
  schedules one task per file dies on scheduler overhead; the engine must
  pack files into splits (``spark.sql.files.openCostInBytes`` /
  ``maxPartitionBytes``) so partition count tracks BYTES, not file count.
* **wide rows** — a 1,000-column table where queries touch 5 columns.
  Column pruning must reach the scan (ReadSchema carries only the used
  columns); a scan materializing 1,000 columns for a 5-column projection
  is a 200x I/O regression that local fixtures never expose.
* **deep structs** — a 40-deep struct column in the footer.  Footer
  parsing and schema inference must tolerate it, and queries that never
  touch the column must prune it, not decode it.

Default tripwires pin representative scan-heavy keys on each fixture plus
the two structural invariants (split packing, column pruning).  Opt-in
full sweep: SPARK_GRAFT_SHAPE_SWEEP=1 runs every registry key on the
many-small-files fixture (the one regime variant that reroutes EVERY
table's scan).
"""

from __future__ import annotations

import os
import traceback

import pytest
from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load

# (n_files for the big scan targets, n_files for dimension tables)
_SHARDS_BIG = 200
_SHARDS_DIM = 16
_WIDE_PAD_COLS = 1000
_STRUCT_DEPTH = 40


@pytest.fixture(scope="module")
def manyfiles_dir(spark, sf_dir):
    """Every table re-written as many tiny parquet files (the row counts at
    sf0.001 make each file a few rows / a few KB)."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(
        here, "_scratch", f"shape_manyfiles_{_SHARDS_BIG}x{_SHARDS_DIM}"
    )
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        n = _SHARDS_BIG if t in ("documents", "events", "lineitem", "orders") else _SHARDS_DIM
        load(spark, sf_dir, t).repartition(n).write.mode("overwrite").parquet(p)
    return out


@pytest.fixture(scope="module")
def widerow_dir(spark, sf_dir):
    """documents padded with 1,000 unused int columns."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", f"shape_widerow_{_WIDE_PAD_COLS}")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        df = load(spark, sf_dir, t)
        if t == "documents":
            pad = [
                (F.col("doc_id") * 31 + i).alias(f"pad_{i:04d}")
                for i in range(_WIDE_PAD_COLS)
            ]
            df = df.select("*", *pad)
        df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


@pytest.fixture(scope="module")
def deepstruct_dir(spark, sf_dir):
    """events carrying an unused 40-deep struct column."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", f"shape_deepstruct_{_STRUCT_DEPTH}")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        df = load(spark, sf_dir, t)
        if t == "events":
            deep = F.struct(F.col("event_id").alias("leaf"))
            for i in range(_STRUCT_DEPTH - 1):
                deep = F.struct(deep.alias(f"lvl_{i}"))
            df = df.withColumn("deep", deep)
        df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


# --- structural invariants -------------------------------------------------


def test_small_files_pack_into_splits(spark, manyfiles_dir):
    # 200 tiny files must NOT become 200 scan tasks: split packing (the
    # openCostInBytes/maxPartitionBytes math) keys partition count to
    # bytes+open-cost, which for a few-MB table lands at or below the
    # core count.  One task per file at 100 TB = millions of tasks.
    df = load(spark, manyfiles_dir, "documents")
    parts = df.rdd.getNumPartitions()
    assert parts <= 64, (
        f"scan of a {_SHARDS_BIG}-file table produced {parts} partitions — "
        "split packing is broken; at cluster scale this schedules one task "
        "per file"
    )


def test_wide_row_scan_prunes_columns(spark, widerow_dir):
    # A documents consumer touching ~5 columns must not read the 1,000 pad
    # columns: ReadSchema in the executed plan carries only what's used.
    df = eng.queries()["llm_text_stats"](spark, widerow_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pad_0007" not in plan, (
        "wide-row fixture: pad columns appear in the executed plan — "
        "column pruning is not reaching the documents scan"
    )


def test_deep_struct_is_pruned_not_decoded(spark, deepstruct_dir):
    # the load must tolerate the 40-deep footer...
    assert load(spark, deepstruct_dir, "events").count() > 0
    # ...and an events consumer that never touches `deep` must not carry
    # the struct through its scan (the nested lvl_* names only enter the
    # executed plan if the column is read).
    df = eng.queries()["ts_sessionize"](spark, deepstruct_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "lvl_" not in plan, (
        "deep-struct fixture: the unused 40-deep struct column appears in "
        "the executed plan — schema pruning is not reaching the events scan"
    )


# --- representative-key tripwires -------------------------------------------

# stream_state_reader pins the class this regime actually caught: stateful
# availableNow drains ran one state-store commit PER FILE (mft=1), so 200
# tiny files stalled all three stateful streaming keys past 120 s — the
# fix keys trigger size to file count (windows._stream_events "auto").
_MANYFILES_KEYS = [
    "scan_parquet",
    "agg_groupby",
    "llm_text_stats",
    "llm_dedup_near",
    "stream_state_reader",
]
_WIDEROW_KEYS = ["llm_text_stats", "llm_token_count", "llm_quality_score"]
_DEEPSTRUCT_KEYS = ["fn_json", "fn_variant", "ts_sessionize"]


@pytest.mark.parametrize("name", _MANYFILES_KEYS)
def test_keys_survive_many_small_files(spark, manyfiles_dir, name):
    assert eng.queries()[name](spark, manyfiles_dir).collect() is not None


@pytest.mark.parametrize("name", _WIDEROW_KEYS)
def test_keys_survive_wide_rows(spark, widerow_dir, name):
    assert eng.queries()[name](spark, widerow_dir).collect() is not None


@pytest.mark.parametrize("name", _DEEPSTRUCT_KEYS)
def test_keys_survive_deep_struct(spark, deepstruct_dir, name):
    assert eng.queries()[name](spark, deepstruct_dir).collect() is not None


_SWEEP = os.environ.get("SPARK_GRAFT_SHAPE_SWEEP") == "1"


@pytest.mark.skipif(not _SWEEP, reason="opt-in wide sweep; set SPARK_GRAFT_SHAPE_SWEEP=1")
@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_many_small_files(spark, manyfiles_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, manyfiles_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on many-small-files:\n" + "\n".join(failures)


@pytest.mark.skipif(not _SWEEP, reason="opt-in wide sweep; set SPARK_GRAFT_SHAPE_SWEEP=1")
@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_wide_rows(spark, widerow_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, widerow_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on wide-rows:\n" + "\n".join(failures)


@pytest.mark.skipif(not _SWEEP, reason="opt-in wide sweep; set SPARK_GRAFT_SHAPE_SWEEP=1")
@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_deep_struct(spark, deepstruct_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, deepstruct_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on deep-struct:\n" + "\n".join(failures)
