"""Adversarial-JSON sweep: eleventh degenerate regime.

Real event streams carry junk payloads — malformed fragments, megabyte
string values, duplicate keys, 100-deep nesting, empty strings.  The
round-11 catalog run planted all of those in ``events.props`` and found
two keys crashing: ``fn_json``'s ANSI ``cast`` of the extracted ``$.k``
(a 1 MB non-numeric string value failed the whole job) and
``fn_variant``'s throwing ``parse_json`` / ``variant_get`` forms.  Fix:
``try_cast`` / ``try_parse_json`` / ``try_variant_get`` — junk
extraction routes to NULL like every other ingestion-seam junk class,
and the strict and try forms are identical on well-formed numeric
payloads, so the oracle hashes on the driver fixtures are unchanged
(``TRY_CAST`` mirrors the cast in the fn_json oracle).

Default tripwire: the JSON-consuming keys must run on the junk fixture.
Opt-in full sweep: SPARK_GRAFT_JSON_SWEEP=1 runs every registry key
(catalog ran clean round 11: 424/424 after the fix).

NOTE the deliberate scope: no VALUE pin on junk payloads — Spark
(Jackson) and DuckDB (yyjson) legitimately disagree on duplicate-key
resolution and error recovery, so the operator≡oracle contract is
declared on well-formed JSON only; on junk the contract is "NULL or
value, never a crash".
"""

from __future__ import annotations

import os
import traceback

import pytest
from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load

_PAYLOADS = {
    101: "{" + '"a":' * 200 + "1" + "}" * 200,        # over-deep / ragged
    103: ('{"a":' * 100) + "1" + ("}" * 100),          # valid 100-deep
    107: '{"k": "' + "x" * 1_000_000 + '"}',           # 1 MB string value
    109: '{"k": 1, "k": 2, "k": 3}',                   # duplicate keys
    113: '{"k": 1,,,',                                 # malformed
    127: "",                                           # empty string
}


@pytest.fixture(scope="module")
def junkjson_dir(spark, sf_dir):
    import hashlib

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # Key the fixture dir on the payload content: editing _PAYLOADS must
    # invalidate the cached parquet, or the sweep silently tests old data
    # (round-12 ADVICE).  Stale sibling dirs are bounded by the _scratch
    # wipe bench.py performs at every cold run.
    tag = hashlib.md5(repr(sorted(_PAYLOADS.items())).encode()).hexdigest()[:8]
    out = os.path.join(here, "_scratch", f"json_fixtures_{tag}")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        df = load(spark, sf_dir, t)
        if t == "events":
            col = F.col("props")
            for mod, payload in _PAYLOADS.items():
                col = F.when(
                    F.col("event_id") % mod == 0, F.lit(payload)
                ).otherwise(col)
            col = F.when(
                F.col("event_id") % 131 == 0, F.lit(None).cast("string")
            ).otherwise(col)
            df = df.withColumn("props", col)
        df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


@pytest.mark.parametrize("name", ["fn_json", "fn_variant", "profile_json_schema"])
def test_json_keys_survive_junk_payloads(spark, junkjson_dir, name):
    # NULL or value per row, never a crash (the try_cast/try_parse_json
    # contract); row count stays the input cardinality for these map-side
    # keys, so the junk rows are routed, not dropped.
    rows = eng.queries()[name](spark, junkjson_dir).collect()
    assert rows, f"{name} returned nothing on the junk-JSON fixture"


_SWEEP = os.environ.get("SPARK_GRAFT_JSON_SWEEP") == "1"


@pytest.mark.skipif(not _SWEEP, reason="opt-in wide sweep; set SPARK_GRAFT_JSON_SWEEP=1")
@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_junk_json(spark, junkjson_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, junkjson_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on junk JSON:\n" + "\n".join(failures)
