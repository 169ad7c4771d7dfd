"""Extreme-length-document sweep: tenth degenerate regime.

Real crawls contain megatoken outliers (concatenated logs, minified
bundles, OCR dumps); none of the nine prior regimes varied DOCUMENT
LENGTH.  The round-11 catalog run planted a 200k-token doc and found a
real scale bug within five keys: `llm_curation_e2e`'s stage-1 filter
wedged 10+ minutes on ONE task, because an n-gram build of the form
``F.transform(slice(toks, ...), lambda _, i: concat_ws(toks[i], ...))``
references the ENCLOSING array from the lambda — after projection
collapse inlines ``split(text)`` into the predicate, interpreted
higher-order eval re-splits the whole text per element: O(n²) per doc
(measured 19 s → 75 s for 10k → 20k tokens).  The fix (zip_with over
shifted slices — lambdas see only bound arguments) is in
``curation._trigram_set`` / ``curation._bigram_list``.

Default tripwire: the previously-quadratic keys must finish on a
200k-token doc inside a budget the quadratic form misses by >10×.
Opt-in full sweep: SPARK_GRAFT_LONGDOC_SWEEP=1 runs every registry key.
"""

from __future__ import annotations

import os
import threading
import traceback

import pytest
from pyspark.sql import functions as F

import nedp_etl_spark as eng
from nedp_etl_spark.data import TABLES, load

_LONG_N = 200_000


@pytest.fixture(scope="module")
def longdoc_dir(spark, sf_dir):
    import random

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon",
             "zeta", "eta", "theta", "iota", "kappa"]
    texts = {
        7: " ".join(rng.choice(vocab) for _ in range(_LONG_N)),
        11: " ".join(["alpha beta"] * 25_000),   # heavy repetition
        13: " ".join(["omega"] * 10_000),        # single repeated token
    }
    # Key the fixture dir on the generated text content: editing texts /
    # _LONG_N / the seed must invalidate the cached parquet (round-12
    # ADVICE — the exists() skip silently tested stale data otherwise).
    import hashlib

    tag = hashlib.md5(repr(sorted(texts.items())).encode()).hexdigest()[:8]
    out = os.path.join(here, "_scratch", f"longdoc_fixtures_{tag}")
    for t in TABLES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            continue
        df = load(spark, sf_dir, t)
        if t == "documents":
            col = F.col("text")
            for did, tx in texts.items():
                col = F.when(F.col("doc_id") == did, F.lit(tx)).otherwise(col)
            df = df.withColumn("text", col)
        df.coalesce(2).write.mode("overwrite").parquet(p)
    return out


def _run_budgeted(spark, fn, budget_s: float, label: str) -> None:
    err: list = []
    group = f"longdoc-budget-{label}"

    def work():
        # Job group is thread-local: tag the jobs this thread submits so an
        # over-budget run can be killed from the main thread — without the
        # cancel, the abandoned O(n²) job keeps contending with every later
        # test on the shared session, turning one tripwire failure into
        # cascade flakiness (round-12 ADVICE).
        # No clear needed: pinned-thread mode (the PySpark 4 default) keeps
        # local properties per Python thread, and this thread only runs fn.
        spark.sparkContext.setJobGroup(group, label, interruptOnCancel=True)
        try:
            fn()
        except Exception:
            err.append(traceback.format_exc().splitlines()[-1])

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(budget_s)
    timed_out = th.is_alive()
    if timed_out:
        spark.sparkContext.cancelJobGroup(group)
        th.join(30)
    assert not timed_out, (
        f"{label} exceeded the {budget_s:.0f}s long-doc budget — a per-doc "
        f"superlinear surface is back (round-11: index-lambdas over the "
        f"enclosing array re-evaluate it per element in interpreted eval)"
    )
    assert not err, f"{label} crashed on the long-doc fixture: {err[0]}"


@pytest.mark.parametrize(
    "name",
    ["llm_curation_e2e", "llm_contamination", "llm_repetition_filter",
     "llm_ngram_novelty"],
)
def test_ngram_keys_linear_on_megatoken_doc(spark, longdoc_dir, name):
    # quadratic form: >600 s on the 200k-token doc; linear form: <15 s
    # quiet.  120 s absorbs box load while still failing the O(n²) shape
    # by 5x or more.
    _run_budgeted(
        spark, lambda: eng.queries()[name](spark, longdoc_dir).collect(), 120, name
    )


_SWEEP = os.environ.get("SPARK_GRAFT_LONGDOC_SWEEP") == "1"


@pytest.mark.skipif(not _SWEEP, reason="opt-in wide sweep; set SPARK_GRAFT_LONGDOC_SWEEP=1")
@pytest.mark.parametrize("chunk", range(8))
def test_every_key_survives_megatoken_doc(spark, longdoc_dir, chunk):
    qs = eng.queries()
    keys = sorted(qs)
    failures = []
    for k in keys[chunk::8]:
        try:
            qs[k](spark, longdoc_dir).collect()
        except Exception:
            failures.append(f"{k}: {traceback.format_exc().splitlines()[-1]}")
    assert not failures, "keys crashed on the long-doc fixture:\n" + "\n".join(failures)
