"""Dirty-data sweep: EVERY registry key must survive NULL-riddled tables.

The sibling of test_empty_inputs.py: at 100 TB, rows with NULL attribute
columns (a missing payload, an unparsed timestamp, a dropped embedding)
are the norm, not the exception.  Key/identity columns stay intact — the
relational structure survives — while every value/attribute column goes
NULL on half the rows (even keys), deterministically.

Round-10 sweep found 13 keys that crashed: four multimodal stages decoding
a NULL payload, NULL vectors driven into k-means/SemDeDup/MMR driver
pages, a NULL QI cell breaking IPF raking's margin sort, ANSI
DIVIDE_BY_ZERO on a zero-variance day in the mSPRT monitor, ANSI
INVALID_ARRAY_INDEX on short text lines, `day=__HIVE_DEFAULT_PARTITION__`
fed to `date.fromisoformat`, `.encode()` on NULL text, and a native UDTF
splitting None.  All fixed (NULL-row drops or null-tolerant accessors —
verified value-exact on the real fixtures afterwards); this sweep keeps
the whole registry that way.

Contract: "no crash" — any result shape is fine, raising is not.
"""

from __future__ import annotations

import os
import traceback

import pytest
from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load

# Value/attribute columns go NULL on even-keyed rows; key / join columns
# stay intact so joins and group-bys still have structure to work on.
_NULLABLE = {
    "region": ["r_name"],
    "nation": ["n_name"],
    "customer": ["c_name", "c_acctbal", "c_mktsegment"],
    "supplier": ["s_name", "s_acctbal"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "orders": ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    "events": ["ts", "event_type", "value", "props"],
    "documents": ["text", "lang", "source", "n_chars"],
    "embeddings": ["embedding", "label"],
}
_KEY = {
    "region": "r_regionkey", "nation": "n_nationkey", "customer": "c_custkey",
    "supplier": "s_suppkey", "part": "p_partkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey", "events": "event_id", "documents": "doc_id",
    "embeddings": "vec_id",
}


@pytest.fixture(scope="module")
def null_dir(spark, sf_dir):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(here, "_scratch", "null_fixtures")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(p):
            df = load(spark, sf_dir, t)
            for c in _NULLABLE[t]:
                df = df.withColumn(
                    c,
                    F.when(F.col(_KEY[t]) % 2 == 0, F.lit(None)).otherwise(
                        F.col(c)
                    ),
                )
            df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


_CHUNKS = 8


@pytest.mark.parametrize("chunk", range(_CHUNKS))
def test_every_key_survives_null_riddled_tables(spark, null_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::_CHUNKS]:
        try:
            qs[k](spark, null_dir).collect()
        except Exception:
            tb = traceback.format_exc().splitlines()
            failures.append(f"{k}: {tb[-1]}")
    assert not failures, "keys crashed on NULL-riddled input:\n" + "\n".join(failures)
