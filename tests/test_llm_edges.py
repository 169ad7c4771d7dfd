"""Edge-input tests for llm helpers hardened in round 5 — inputs the
fixtures never produce (short documents, null text), pinned so fixture
regeneration can't surface them as confusing correctness-gate failures."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_shingles_total_for_short_docs(spark):
    # sequence(1, n-2) auto-steps DOWNWARD for n<3 — unguarded, a 2-token
    # doc throws element_at(toks, 0) and a 1-token doc silently aliases
    # element_at(toks, -1).  The guarded helper returns [] instead.
    from nedp_etl_spark.llm.dedup import _shingles

    df = spark.createDataFrame(
        [(0, ""), (1, "a"), (2, "a b"), (3, "a b c"), (4, "a b c d")],
        "doc_id bigint, text string",
    )
    rows = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", _shingles(F.split("text", " ")).alias("s")
        ).collect()
    }
    assert rows[0] == [] and rows[1] == [] and rows[2] == []
    assert rows[3] == ["a b c"]
    assert rows[4] == ["a b c", "b c d"]


def test_dataset_split_null_text_matches_oracle_semantics(spark):
    # concat (null-propagating, matching the oracle's || operator) sends a
    # null-text row to 'test' in BOTH engines; concat_ws would silently
    # drop the null and hash just the doc_id.
    bucket = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
        1,
        2,
    )
    split = (
        F.when(bucket < "e6", "train").when(bucket < "f3", "val").otherwise("test")
    )
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["split"] for r in df.select("doc_id", split.alias("split")).collect()}
    con = duckdb.connect()
    want = dict(
        con.execute(
            """
            SELECT doc_id,
                   CASE
                     WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'e6' THEN 'train'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 2) < 'f3' THEN 'val'
                     ELSE 'test'
                   END
            FROM (VALUES (1, 'hello world'), (2, NULL)) t(doc_id, text)
            """
        ).fetchall()
    )
    con.close()
    assert got == want
    assert got[2] == "test"


def test_chunking_oracle_unbounded_spine():
    # The oracle's per-doc chunk spine must not cap at any fixed width: a
    # 2700-token document needs chunk_ids past the old fixed-64 spine.
    from nedp_etl_spark.llm.chunking import _CHUNK, _CHUNKING_ORACLE, _STRIDE

    n_tok = 2700
    expected = 1 + (n_tok - _CHUNK) // _STRIDE
    assert expected > 64  # the scenario the old spine silently truncated
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 1::BIGINT AS doc_id, "
        f"array_to_string([ 'tok' || x FOR x IN range({n_tok}) ], ' ') AS text"
    )
    n = con.execute(
        f"SELECT COUNT(*), MAX(chunk_id) FROM ({_CHUNKING_ORACLE})"
    ).fetchone()
    con.close()
    assert n == (expected, expected - 1), n


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_curation_e2e_survives_total_filtering(spark, tmp_path):
    # Every doc is pure repetition → stage 1 drops the whole corpus (all
    # augmented copies too) and the pipeline must return an EMPTY result,
    # not crash in the LSH self-join or the empty prefix sum.
    import nedp_etl_spark as eng

    _write_docs(spark, tmp_path, [(i + 30, "spam spam spam spam", "en", "s", 1)
                                  for i in range(4)])
    out = eng.queries()["llm_curation_e2e"](spark, str(tmp_path)).collect()
    assert out == []


def test_sorted_neighborhood_short_docs_excluded(spark, tmp_path):
    # Docs under one shingle (<3 tokens) carry no gram set and must be
    # excluded from blocking entirely — no NULL-key block, no pairs.
    import nedp_etl_spark as eng

    _write_docs(spark, tmp_path, [(1, "one two", "en", "s", 1),
                                  (2, "uno", "en", "s", 1)])
    out = eng.queries()["llm_sorted_neighborhood"](spark, str(tmp_path)).collect()
    # the only ≥3-token docs are augmented clipped copies of nothing: the
    # 2-token doc's clip is 1 token, so the corpus has NO shingleable doc
    assert out == []


def test_lttb_series_smaller_than_bucket_count(spark, tmp_path):
    # n < K: every point lands in its own (sparse) bucket and ALL points
    # survive — downsampling never invents or drops data when the series
    # is already below the target resolution.
    import datetime as dt

    import nedp_etl_spark as eng

    b0 = dt.datetime(2024, 7, 1)
    rows = [(i, 1, "m", b0 + dt.timedelta(minutes=i), float(i)) for i in range(5)]
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = eng.queries()["ts_lttb"](spark, str(tmp_path)).collect()
    assert sorted(r["event_id"] for r in out) == [0, 1, 2, 3, 4]


def test_bpe_encode_no_applicable_merges(spark, tmp_path):
    # Vocabulary disjoint from the merge table: every word must encode to
    # exactly its character count (no merge fires, nothing lost).
    import nedp_etl_spark as eng

    _write_docs(spark, tmp_path, [(1, "xyz qq z", "en", "s", 1)])
    r = eng.queries()["llm_bpe_encode"](spark, str(tmp_path)).collect()[0]
    assert (r["n_words"], r["n_tokens"], r["n_chars"]) == (3, 6, 6)
    assert r["chars_per_token"] == 1.0


def test_holt_winters_short_series_emits_nothing(spark, tmp_path):
    # A series with <= 7 observed days has no full init week: it must be
    # silently absent from the output (schema-exact empty grouped-map
    # frame), not crash applyInPandas with a column mismatch.
    import datetime as dt

    import nedp_etl_spark as eng

    b0 = dt.datetime(2024, 9, 1)
    rows = [(i, 1, "short", b0 + dt.timedelta(days=i), 5.0) for i in range(4)] + \
           [(100 + i, 1, "long", b0 + dt.timedelta(days=i), 3.0) for i in range(9)]
    spark.createDataFrame(
        rows,
        "event_id bigint, user_id bigint, event_type string, ts timestamp, value double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = eng.queries()["ts_holt_winters"](spark, str(tmp_path)).collect()
    assert {r["event_type"] for r in out} == {"long"}
    assert len(out) == 2  # days 8 and 9 of the long series


def test_psi_one_sided_priority_dropped_not_crashed(spark, tmp_path):
    # A priority with orders only AFTER the cut has no baseline: drift is
    # undefined, the row must be dropped on BOTH engines (an unguarded
    # divide is an ANSI error on Spark and a silent NULL->eps on DuckDB).
    import datetime as dt

    import nedp_etl_spark as eng

    rows = ([(i, 1, "1-URGENT", 10_000.0, dt.datetime(1996, 1, 1)) for i in range(4)]
            + [(50 + i, 1, "1-URGENT", 10_000.0, dt.datetime(1999, 1, 1)) for i in range(4)]
            + [(100 + i, 1, "5-LOW", 10_000.0, dt.datetime(1999, 1, 1)) for i in range(4)])
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
        "o_totalprice double, o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = eng.queries()["profile_drift_psi"](spark, str(tmp_path)).collect()
    assert {r["priority"] for r in out} == {"1-URGENT"}


def test_merge_fold_property_vs_python_reference(spark):
    # 200 random symbol strings through the greedy left-fold vs an
    # independent Python implementation of BPE's merge rule — one
    # DataFrame evaluation for the whole batch.
    import random

    from pyspark.sql import functions as F

    from nedp_etl_spark.llm.corpus import _merge_fold

    rng = random.Random(991)
    words = ["".join(rng.choice("abth") for _ in range(rng.randint(0, 12)))
             for _ in range(200)]

    def py_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b); i += 2
            else:
                out.append(syms[i]); i += 1
        return out

    expected = []
    for w in words:
        syms = list(w)
        for a, b in [("t", "h"), ("a", "b"), ("th", "a")]:
            syms = py_merge(syms, a, b)
        expected.append(syms)
    df = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "i long, w string")
    col = F.split(F.col("w"), "")
    # split('') yields a trailing empty element for non-empty strings on
    # neither engine here — Spark's split of "ab" by "" is [a, b]; guard
    # empty strings (split -> [""]) to the empty list like list(w) does
    col = F.when(F.col("w") == "", F.array().cast("array<string>")).otherwise(col)
    for a, b in [("t", "h"), ("a", "b"), ("th", "a")]:
        col = _merge_fold(col, a, b)
    got = {r["i"]: r["m"] for r in df.select("i", col.alias("m")).collect()}
    for i, exp in enumerate(expected):
        assert got[i] == exp, (words[i], got[i], exp)


def test_max_token_freq_property_vs_counter(spark):
    # 300 random token lists: the run-length fold must equal Counter max.
    import collections
    import random

    from pyspark.sql import functions as F

    from nedp_etl_spark.llm.curation import _max_token_freq

    rng = random.Random(17)
    lists = [[rng.choice(["a", "b", "c", "dd", "e"]) for _ in range(rng.randint(1, 40))]
             for _ in range(300)]
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lists)],
                               "i long, toks array<string>")
    got = {r["i"]: r["m"] for r in
           df.select("i", _max_token_freq(F.col("toks")).alias("m")).collect()}
    for i, l in enumerate(lists):
        assert got[i] == max(collections.Counter(l).values()), (i, l)


def test_gram_partials_loud_on_pre_cast_overflow():
    # Round-11 ADVICE: np.floor(x*1000+0.5).astype(np.int64) is C-cast UB
    # for |x| >= ~9.2e15 (wraps silently, typically to INT64_MIN, whose
    # np.abs is itself negative — so the in-batch n*mq^2 guard could pass
    # on already-corrupt values).  The guard must fire on the FLOAT side,
    # before the cast, exactly like the replaced ANSI floor().cast('long').
    import pandas as pd
    import pytest

    from nedp_etl_spark.llm.simsearch import _EMBED_DIM, _gram_partials

    big = [9.3e15] * _EMBED_DIM  # finite, but *1000 exceeds int64
    with pytest.raises(ValueError, match="int64-safe"):
        list(_gram_partials([pd.DataFrame({"embedding": [big]})]))

    # and a normal batch still yields exact partials
    ok = [0.5] * _EMBED_DIM
    out = list(_gram_partials([pd.DataFrame({"embedding": [ok]})]))
    assert len(out) == 1
    assert (out[0]["sij"] == 500 * 500).all()
    assert (out[0]["n"] == 1).all()


def test_derived_table_distinct_dirs_sharing_basename(spark, tmp_path):
    # Two fixture dirs with the SAME basename must get DISTINCT derived
    # tables (_scratch keys on basename alone; the md5-of-full-path tag is
    # the only separator — the round-10 candidate_pairs review finding,
    # now generic to every derived_table user).
    import pyspark.sql.functions as F

    from nedp_etl_spark.llm.dedup import derived_table

    a = tmp_path / "x" / "sf"
    b = tmp_path / "y" / "sf"
    for d, n in ((a, 3), (b, 7)):
        spark.range(n).select(F.col("id")).write.parquet(str(d / "t.parquet"))

    builder = lambda s, sf: s.read.parquet(f"{sf}/t.parquet")  # noqa: E731
    na = derived_table(spark, str(a), "dt_basename_pin", builder).count()
    nb = derived_table(spark, str(b), "dt_basename_pin", builder).count()
    assert (na, nb) == (3, 7)
    # and the cache hands back the materialized table, not a rebuild
    assert derived_table(spark, str(a), "dt_basename_pin", builder).count() == 3
