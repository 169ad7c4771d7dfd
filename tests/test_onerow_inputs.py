"""Single-row sweep: EVERY registry key must survive 1-row tables.

Third default degenerate regime (with empty and NULL-riddled): one row
per table is where off-by-one logic lives — lag/lead windows with no
neighbor, variance of a single observation, 1×1 contingency tables,
graphs with one node and no edges.  Round-10 catalog: 422/424 clean; 2
fixed (Cramér's V on a dof-0 contingency table divided by zero under
ANSI — now NULL, the undefined-statistic convention; HITS normalized by
a zero score mass on a one-node graph — now all-zero scores).  Both
re-verified oracle-exact on the real fixtures.

Contract: "no crash" — any result shape is fine, raising is not.
"""

from __future__ import annotations

import os
import traceback

import pytest

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load


@pytest.fixture(scope="module")
def onerow_dir(spark, sf_dir):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", "onerow_fixtures")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(p):
            load(spark, sf_dir, t).limit(1).coalesce(1).write.mode(
                "overwrite"
            ).parquet(p)
    return out


@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_single_row_tables(spark, onerow_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, onerow_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on single-row input:\n" + "\n".join(failures)
