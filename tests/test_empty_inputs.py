"""Degenerate-input sweep: EVERY registry key must survive all-empty tables.

At 100 TB the empty case is not an edge case — an empty day, an empty
source partition, a filter that matches nothing upstream.  A nightly
pipeline that crashes on it pages someone.  Round-10 sweep found 8 keys
that did: four UNABLE_TO_INFER_SCHEMA read-backs of partitioned writes
that produced zero data files (sink_table, sink_partition_overwrite,
sink_scd2_partitioned, join_dpp), a high-water-mark ``[-1]`` on an empty
partition listing (sink_ttl_expire), ``float(None)`` on an observed SUM
over zero rows (sink_observe_metrics), a never-written publish manifest
(sink_write_audit_publish), and an empty moments page (llm_embed_pca_power).
All fixed; this sweep keeps the whole registry that way.

The contract is "no crash": a key may return zero rows, one NULL-ish
aggregate row, or a ledger — any shape is fine, raising is not.
"""

from __future__ import annotations

import os
import traceback

import pytest

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir):
    """Every fixture table with its real schema and ZERO rows."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", "empty_fixtures")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(p):
            load(spark, sf_dir, t).limit(0).coalesce(1).write.mode(
                "overwrite"
            ).parquet(p)
    return out


# Split the registry into fixed-size chunks so a failure report names a
# narrow slice and the suite shows progress; membership is positional, so
# chunks stay stable as long as registration order is.
_CHUNKS = 8


@pytest.mark.parametrize("chunk", range(_CHUNKS))
def test_every_key_survives_empty_tables(spark, empty_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::_CHUNKS]:
        try:
            qs[k](spark, empty_dir).collect()
        except Exception:
            tb = traceback.format_exc().splitlines()
            failures.append(f"{k}: {tb[-1]}")
    assert not failures, "keys crashed on all-empty input:\n" + "\n".join(failures)
