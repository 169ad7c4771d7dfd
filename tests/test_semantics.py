"""Semantic property tests for the round-5 operators.

The oracle gate (tests/test_correctness.py) proves Spark and DuckDB compute
the SAME answer; these prove the answer MEANS what the operator claims, on
inputs constructed to have a known ground truth — a planted mean shift, two
separable vocabulary domains, the Lloyd-iteration error monotonicity — plus
an independent numpy re-derivation of the PQ codes (a third engine, so a
shared Spark/DuckDB misreading of the spec can't self-confirm).

Synthetic fixtures are written as parquet tables into a tmp sf_dir and fed
through the REGISTERED operator callables — the exact code path the driver
runs — never through test-local reimplementations.
"""

from __future__ import annotations

import datetime
import math

import pytest

import nedp_etl_spark as eng


def _write(spark, tmp_path, table, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{table}.parquet")
    )


def test_changepoint_finds_planted_shift(spark, tmp_path):
    # 30 one-event days: value 10.0 for days 1-15, 30.0 for days 16-30.
    # For a step change the cumulative deviation |sum(x_i - mean)| peaks at
    # the last pre-shift day — the CUSUM estimate must land on day 15.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (
            i,
            base + datetime.timedelta(days=i),
            1,
            "a",
            10.0 if i < 15 else 30.0,
            "{}",
        )
        for i in range(30)
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = {
        r["event_type"]: r
        for r in eng.queries()["ts_changepoint"](spark, str(tmp_path)).collect()
    }
    assert out["a"]["n_days"] == 30
    assert out["a"]["cp_date"] == "2024-01-15"  # last day of the first regime
    # peak |C| for a 15/15 step of height 20 is 15*(30-20) = 150
    assert out["a"]["cusum_peak"] == pytest.approx(150.0)


def test_dsir_prefers_target_domain_docs(spark, tmp_path):
    # Target docs (source src1) draw from vocabulary A, background docs
    # (src9) from vocabulary B.  Importance weights must separate the
    # domains: every A-doc scores positive, every B-doc negative.
    a_text = " ".join(f"alpha{i}" for i in range(20))
    b_text = " ".join(f"beta{i}" for i in range(20))
    rows = [(i, a_text, "en", "src1", len(a_text)) for i in range(10)] + [
        (100 + i, b_text, "en", "src9", len(b_text)) for i in range(30)
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {
        r["doc_id"]: r
        for r in eng.queries()["llm_dsir_importance"](spark, str(tmp_path)).collect()
    }
    assert all(out[i]["dsir_weight"] > 0 and out[i]["selected"] == 1 for i in range(10))
    assert all(
        out[100 + i]["dsir_weight"] < 0 and out[100 + i]["selected"] == 0
        for i in range(30)
    )


def test_pq_codes_match_numpy_and_update_reduces_error(spark, sf_dir):
    # Independent third-engine check: re-derive the PQ pipeline (init ->
    # assign -> Lloyd update -> assign) in numpy with the operator's exact
    # rounding contract and require identical codes AND that the trained
    # codebook's total quantization error is <= the init codebook's (Lloyd
    # monotonicity — the property that makes the update worth a corpus pass).
    np = pytest.importorskip("numpy")
    from nedp_etl_spark.data import load

    emb = {
        int(r["vec_id"]): np.asarray(r["embedding"], dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    }
    M, K, SUB = 4, 16, 16

    def half_up(x: float, dp: int) -> float:
        # Spark/DuckDB ROUND is half-away-from-zero; Python round()/np.round
        # are half-to-even — implement the engines' contract explicitly so a
        # boundary value can't make this third engine disagree spuriously.
        s = 10.0 ** dp
        import math

        return math.copysign(math.floor(abs(x) * s + 0.5), x) / s

    def assign(codebook):
        codes, dists = {}, {}
        for vid, v in emb.items():
            for m in range(M):
                sv = v[m * SUB : (m + 1) * SUB]
                d = []
                for cid, c in codebook[m].items():
                    acc = 0.0  # sequential fold, matching F.aggregate's order
                    for a, b in zip(sv, c):
                        acc += (a - b) * (a - b)
                    d.append((half_up(float(np.sqrt(acc)), 6), cid))
                dists[(vid, m)], codes[(vid, m)] = min(d)
        return codes, dists

    c0 = {
        m: {vid: emb[vid][m * SUB : (m + 1) * SUB] for vid in range(K)}
        for m in range(M)
    }
    codes1, _ = assign(c0)
    c1 = {m: {} for m in range(M)}
    for m in range(M):
        members = {}
        for (vid, mm), cid in sorted(codes1.items()):
            if mm == m:
                members.setdefault(cid, []).append(emb[vid][m * SUB : (m + 1) * SUB])
        for cid, svs in members.items():
            mean = sum(svs[1:], svs[0]) / len(svs)  # sequential accumulate
            c1[m][cid] = np.asarray([half_up(float(x), 9) for x in mean])
    codes2, dists2 = assign(c1)

    got = {
        (int(r["vec_id"]), int(r["m"])): (int(r["code"]), float(r["dist"]))
        for r in eng.queries()["llm_pq_encode"](spark, sf_dir).collect()
    }
    assert len(got) == len(codes2)
    mismatched = [k for k in codes2 if got[k][0] != codes2[k]]
    assert not mismatched, mismatched[:5]
    # Lloyd monotonicity holds for the summed SQUARED error (not the
    # unsquared distance sum, which a skewed cluster can legally increase).
    _, dists1 = assign(c0)
    sq2 = sum(d * d for d in dists2.values())
    sq1 = sum(d * d for d in dists1.values())
    assert sq2 <= sq1 + 1e-6


def test_bottomk_returns_all_rows_when_k_exceeds_input(spark, tmp_path):
    rows = [(1, 1, 10.0), (2, 1, 20.0), (3, 1, 30.0)]
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey bigint, l_linenumber int, l_extendedprice double",
    )
    out = eng.queries()["sample_bottomk"](spark, str(tmp_path)).collect()
    assert len(out) == 3
    assert sorted(r["h"] for r in out) == [r["h"] for r in out]


def test_bpe_merges_counts_known_corpus(spark, tmp_path):
    # "ab ab abc" per doc: pair 'ab' appears in every word (3 per doc),
    # 'bc' only in 'abc' (1 per doc) — the merge ranking must reflect it.
    rows = [(i, "ab ab abc", "en", "src1", 9) for i in range(5)]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {r["pair"]: r["n"] for r in
           eng.queries()["llm_bpe_merges"](spark, str(tmp_path)).collect()}
    assert out == {"ab": 15, "bc": 5}


def test_html_extract_roundtrip_is_lossless(spark, sf_dir):
    # The boilerplate/markup strip must reconstruct the original body text
    # exactly — the flag is part of the compared output, but only this
    # assertion pins that it is actually TRUE, not merely cross-engine-equal.
    rows = eng.queries()["llm_html_extract"](spark, sf_dir).collect()
    assert rows and all(r["roundtrip_clean"] for r in rows)


def test_percentile_histogram_true_median(spark, tmp_path):
    # Known medians, odd and even group sizes: n=101 values 0..100 ->
    # rank ceil(50.5)=51 -> 50.0; n=10 values 0..9 -> rank 5 -> 4.0.
    # Values are scaled by 300 so the groups span multiple 512-wide buckets.
    rows = [(i, 1, 300.0 * i) for i in range(101)] + [
        (1000 + i, 2, 300.0 * i) for i in range(10)
    ]
    _write(
        spark,
        tmp_path,
        "lineitem",
        [(oid, ln, "A" if ln == 1 else "B", price) for oid, ln, price in rows],
        "l_orderkey bigint, l_linenumber int, l_returnflag string,"
        " l_extendedprice double",
    )
    out = {
        r["l_returnflag"]: (r["n"], r["p50_disc"])
        for r in eng.queries()["agg_percentile_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["A"] == (101, 300.0 * 50)
    assert out["B"] == (10, 300.0 * 4)


def test_percentile_histogram_ignores_null_measures(spark, tmp_path):
    # Standard percentile semantics: NULL measures are excluded, not
    # ranked — and the driver-side histogram walk must not see a None
    # bucket (review finding: unguarded, it raised TypeError on sort).
    rows = [(1, 1, "A", 100.0), (2, 1, "A", None), (3, 1, "A", 300.0)]
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey bigint, l_linenumber int, l_returnflag string,"
        " l_extendedprice double",
    )
    out = eng.queries()["agg_percentile_histogram"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["n"] == 2 and out[0]["p50_disc"] == 100.0


def test_percentile_histogram_bounded_for_any_domain(spark, tmp_path):
    # The bucket width derives from a min/max pre-pass, so a measure
    # spanning 1e13 still produces a <=256-bucket histogram (a fixed width
    # would make the driver-side collect data-dependent); and a constant
    # column (zero span) degenerates gracefully to a single bucket.
    rows = [(i, 1, "A", 1.0e12 * i) for i in range(11)] + [
        (100 + i, 1, "B", 7.0) for i in range(5)
    ]
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey bigint, l_linenumber int, l_returnflag string,"
        " l_extendedprice double",
    )
    out = {
        r["l_returnflag"]: (r["n"], r["p50_disc"])
        for r in eng.queries()["agg_percentile_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["A"] == (11, 5.0e12)
    assert out["B"] == (5, 7.0)


def test_percentile_histogram_keeps_null_group(spark, tmp_path):
    # GROUP BY keeps a NULL group; a plain equi-join in the phase-2 re-find
    # would silently drop it (review finding) — the null-safe join must
    # emit its median row exactly like the oracle's PARTITION BY does.
    rows = [(1, 1, None, 10.0), (2, 1, None, 20.0), (3, 1, "A", 5.0)]
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey bigint, l_linenumber int, l_returnflag string,"
        " l_extendedprice double",
    )
    out = {
        r["l_returnflag"]: (r["n"], r["p50_disc"])
        for r in eng.queries()["agg_percentile_histogram"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[None] == (2, 10.0)
    assert out["A"] == (1, 5.0)


def test_bottomk_sorts_null_hash_out_of_sample(spark, tmp_path):
    # A NULL key part null-propagates into h; with explicit NULLS LAST the
    # NULL-h row must sort past the cutoff in BOTH engines, not lead the
    # sample as Spark's ASC default (nulls first) would.
    rows = [(i, 1, 10.0 * i) for i in range(1, 300)] + [(None, 1, 0.5)]
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_orderkey bigint, l_linenumber int, l_extendedprice double",
    )
    out = eng.queries()["sample_bottomk"](spark, str(tmp_path)).collect()
    assert len(out) == 200
    assert all(r["h"] is not None for r in out)


def test_perplexity_buckets_tercile_membership(spark, tmp_path):
    # Doc i carries (30-i) copies of the corpus-dominant token and i
    # singleton tokens, so avg logprob is strictly decreasing in doc_id.
    # Ascending rank r holds doc 30-r; the tercile cutoffs are the values
    # at ranks 10 (doc 20) and 20 (doc 10), and the value-based >= rule
    # puts docs 0-10 in head, 11-20 in middle, 21-29 in tail.
    rows = []
    for i in range(30):
        toks = ["w0"] * (30 - i) + [f"u{i}x{j}" for j in range(i)]
        text = " ".join(toks)
        rows.append((i, text, "en", "src0", len(text)))
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {
        r["doc_id"]: r
        for r in eng.queries()["llm_perplexity_buckets"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 30
    scores = [out[i]["avg_logprob"] for i in range(30)]
    assert all(a > b for a, b in zip(scores, scores[1:]))  # strictly decreasing
    assert {i for i in out if out[i]["ppl_bucket"] == "head"} == set(range(0, 11))
    assert {i for i in out if out[i]["ppl_bucket"] == "middle"} == set(range(11, 21))
    assert {i for i in out if out[i]["ppl_bucket"] == "tail"} == set(range(21, 30))


def test_streaks_known_calendar(spark, tmp_path):
    # User 1: active Jan 1,2,3 (day 2 twice — must collapse), Jan 10,11,
    # Jan 20 -> 6 active days in streaks of 3+2+1.  User 2: one day.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    u1_days = [0, 1, 1, 2, 9, 10, 19]  # offsets; day-2 duplicate event
    rows = [
        (i, base + datetime.timedelta(days=d), 1, "click", 1.0, "{}")
        for i, d in enumerate(u1_days)
    ] + [(100, base, 2, "view", 1.0, "{}")]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = {
        r["user_id"]: r
        for r in eng.queries()["ts_streaks"](spark, str(tmp_path)).collect()
    }
    assert out[1]["n_active_days"] == 6
    assert out[1]["longest_streak"] == 3
    assert out[1]["n_streaks"] == 3
    assert out[2]["n_active_days"] == 1
    assert out[2]["longest_streak"] == 1
    assert out[2]["n_streaks"] == 1


def test_holt_recurrence_hand_computed(spark, tmp_path):
    # Linear series 10,12,14,16,18 (one event/day): with alpha=beta=0.5 and
    # l1=x1, b1=0 the recurrence is exactly representable in binary at
    # every step — levels 10, 11, 12.75, 14.9375, 17.296875 and trends
    # 0, 0.5, 1.125, 1.65625, 2.0078125 (hand-computed; the last rounds to
    # 2.007813 at 6 dp half-up).  The trend must climb toward the true
    # slope 2.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(days=i), 1, "a", 10.0 + 2.0 * i, "{}")
        for i in range(5)
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = sorted(
        eng.queries()["ts_holt"](spark, str(tmp_path)).collect(),
        key=lambda r: r["d"],
    )
    assert [r["level"] for r in out] == [10.0, 11.0, 12.75, 14.9375, 17.296875]
    assert [r["trend"] for r in out] == [0.0, 0.5, 1.125, 1.65625, 2.007813]
    assert out[-1]["forecast_next"] == 19.304688  # 17.296875 + 2.0078125


def test_holt_drops_all_null_days(spark, tmp_path):
    # An all-NULL value day must be dropped on BOTH engines (in pandas it
    # would surface as NaN, in SQL as NULL — which the hash treats as
    # different); the recurrence then runs over observed days only.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (0, base, 1, "a", 10.0, "{}"),
        (1, base + datetime.timedelta(days=1), 1, "a", None, "{}"),
        (2, base + datetime.timedelta(days=2), 1, "a", 12.0, "{}"),
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = sorted(
        eng.queries()["ts_holt"](spark, str(tmp_path)).collect(),
        key=lambda r: r["d"],
    )
    assert [str(r["d"]) for r in out] == ["2024-01-01", "2024-01-03"]
    assert [r["level"] for r in out] == [10.0, 11.0]  # 0.5*12 + 0.5*10


def test_bitmap_distinct_counts_planted_duplicates(spark, tmp_path):
    # Group 'a': custkeys {1, 64, 65, 128} each appearing 3x (64/65 share a
    # word with different bits; 128 opens a third word) -> 4 distinct.
    # Group 'b': one custkey repeated -> 1.  Exercises word packing, bit
    # packing within a word, and duplicate collapse across rows.
    base = datetime.datetime(2024, 1, 1)
    rows = []
    oid = 0
    for ck in (1, 64, 65, 128):
        for _ in range(3):
            rows.append((oid, ck, "O", 10.0, base, "a"))
            oid += 1
    for _ in range(5):
        rows.append((oid, 999, "O", 10.0, base, "b"))
        oid += 1
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = {
        r["o_orderpriority"]: r["n_distinct"]
        for r in eng.queries()["agg_bitmap_distinct"](spark, str(tmp_path)).collect()
    }
    assert out == {"a": 4, "b": 1}


def test_bitmap_distinct_negative_keys_do_not_alias(spark, tmp_path):
    # custkey -1 must NOT collide with custkey 63: a sign-preserving %
    # would give bit -1, which Java shift-count masking aliases onto
    # 1<<63 — key 63's slot.  pmod + exact floor-div words keep them in
    # distinct (word, bit) cells: -1 -> (-1, 63), 63 -> (0, 63).
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (0, -1, "O", 10.0, base, "a"),
        (1, 63, "O", 10.0, base, "a"),
        (2, -64, "O", 10.0, base, "a"),
        (3, 0, "O", 10.0, base, "a"),
    ]
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = eng.queries()["agg_bitmap_distinct"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["n_distinct"] == 4


def test_perplexity_buckets_degenerate_all_equal(spark, tmp_path):
    # Every doc shares one rounded score: the cutoffs short-circuit to that
    # value (no refinement window over a corpus-sized bucket) and the
    # value-based >= rule puts every doc in head — matching the oracle's
    # rank-value arithmetic for the tied distribution.
    rows = [(i, "same same same", "en", "src0", 14) for i in range(9)]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = eng.queries()["llm_perplexity_buckets"](spark, str(tmp_path)).collect()
    assert len(out) == 9
    assert all(r["ppl_bucket"] == "head" for r in out)


def test_pattern_match_strict_consecutiveness(spark, tmp_path):
    # User 1: v,c,p (one match) then v,p (gap — no match).  User 2: two
    # clean v,c,p runs -> 2.  User 3: v,c,c,p — the extra click breaks
    # strict adjacency, so NO row is emitted for them at all.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, user, typ):
        return (i, base + datetime.timedelta(minutes=i), user, typ, 1.0, "{}")

    rows = (
        [ev(i, 1, t) for i, t in enumerate(["view", "click", "purchase", "view", "purchase"])]
        + [ev(10 + i, 2, t) for i, t in enumerate(
            ["view", "click", "purchase", "view", "click", "purchase"])]
        + [ev(20 + i, 3, t) for i, t in enumerate(["view", "click", "click", "purchase"])]
    )
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = {
        r["user_id"]: r["n_matches"]
        for r in eng.queries()["win_pattern_match"](spark, str(tmp_path)).collect()
    }
    assert out == {1: 1, 2: 2}


def test_entropy_filter_known_distributions(spark, tmp_path):
    # Entropy is in BITS: 'aaaa' -> 0, 'abab' -> exactly 1 bit, 30
    # distinct chars -> log2(30) ~= 4.907 (natural-text-like, passes),
    # and 64 distinct chars -> exactly 6 bits — the base64-alphabet
    # uniform distribution the high side of the [2, 5] band exists to
    # reject (in nats that bound was unreachable for ASCII: ln 95 < 5).
    b64 = "".join(
        chr(c) for c in list(range(65, 91)) + list(range(97, 123))
    ) + "0123456789+/"
    assert len(b64) == 64 and len(set(b64)) == 64
    rows = [
        (0, "aaaa", "en", "src0", 4),
        (1, "abab", "en", "src0", 4),
        (2, "abcdefghijklmnopqrstuvwxyz0123", "en", "src0", 30),
        (3, b64, "en", "src0", 64),
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {
        r["doc_id"]: r
        for r in eng.queries()["llm_entropy_filter"](spark, str(tmp_path)).collect()
    }
    assert out[0]["entropy"] == 0.0 and not out[0]["passes_filter"]
    assert out[1]["entropy"] == 1.0 and not out[1]["passes_filter"]
    assert abs(out[2]["entropy"] - 4.906891) < 2e-6 and out[2]["passes_filter"]
    assert out[3]["entropy"] == 6.0 and not out[3]["passes_filter"]


def test_mad_anomaly_flags_planted_outlier(spark, tmp_path):
    # 10 alternating days of 10/12 plus one day at 100: median = 12,
    # deviations {2x5, 0x5, 88} -> MAD = 2, so the outlier's robust z is
    # 88 / (1.4826*2) ~= 29.68 and ONLY that day crosses the 3-sigma
    # threshold.  Mean/stddev would be dragged to ~19.8/26.6 (z ~= 3.0
    # borderline) — the point of the robust statistic.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(days=i), 1, "a",
         10.0 if i % 2 == 0 else 12.0, "{}")
        for i in range(10)
    ] + [(10, base + datetime.timedelta(days=10), 1, "a", 100.0, "{}")]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = {
        r["day"]: r
        for r in eng.queries()["ts_mad_anomaly"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 11
    anomalies = [d for d, r in out.items() if r["is_anomaly"]]
    assert anomalies == ["2024-01-11"]
    assert abs(out["2024-01-11"]["robust_z"] - 29.677594) < 1e-6


def test_bitmap_intersect_set_algebra(spark, tmp_path):
    # Membership plan: custkeys 1,2 urgent-only; 3 low-only; 64,65 in BOTH
    # (same word, different bits — exercises word-wise AND/OR/XOR); 127
    # urgent-only in word 1.  Expected: both=2, either=6, exactly_one=4.
    base = datetime.datetime(2024, 1, 1)
    rows = []
    oid = 0
    plan = [
        (1, ["1-URGENT"]), (2, ["1-URGENT"]), (3, ["5-LOW"]),
        (64, ["1-URGENT", "5-LOW"]), (65, ["5-LOW", "1-URGENT"]),
        (127, ["1-URGENT", "1-URGENT"]),
        (999, ["3-MEDIUM"]),  # out-of-scope priority: must not count at all
    ]
    for ck, prios in plan:
        for p in prios:
            rows.append((oid, ck, "O", 10.0, base, p))
            oid += 1
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = eng.queries()["agg_bitmap_intersect"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_both"], r["n_either"], r["n_exactly_one"]) == (2, 6, 4)


def test_acf_detects_planted_period(spark, tmp_path):
    # Period-2 series 10,20,10,20,... over 14 days: mean 15, centered +/-5,
    # so acf(k) = (14-k)/14 * (-1)^k exactly — strong negative at lag 1,
    # strong positive at lag 2, the signature ACF of a period-2 signal.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(days=i), 1, "a",
         10.0 if i % 2 == 0 else 20.0, "{}")
        for i in range(14)
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = {
        r["k"]: r
        for r in eng.queries()["ts_acf"](spark, str(tmp_path)).collect()
    }
    assert sorted(out) == list(range(1, 8))
    assert all(out[k]["n_pairs"] == 14 - k for k in range(1, 8))
    assert out[1]["acf"] == -0.928571
    assert out[2]["acf"] == 0.857143
    assert out[7]["acf"] == -0.5


def test_bitmap_intersect_empty_scope_all_null(spark, tmp_path):
    # No order matches the two target priorities: Spark's global aggregate
    # over the empty word table yields ONE all-NULL row — and the oracle's
    # SUM-based counters (deliberately not COUNT(*)) are NULL on empty
    # input too, keeping the hash gate consistent on this edge.
    base = datetime.datetime(2024, 1, 1)
    rows = [(0, 7, "O", 10.0, base, "3-MEDIUM")]
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = eng.queries()["agg_bitmap_intersect"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_both"] is None and r["n_either"] is None and r["n_exactly_one"] is None


def test_daily_mean_ignores_null_values_in_mixed_days(spark, tmp_path):
    # A day with values [10.0, NULL] must average to 10.0 (SQL AVG
    # semantics: mean of OBSERVED values), not 5.0 — the COUNT(*) bug both
    # engines would have agreed on, invisible to the hash gate.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (0, base, 1, "a", 10.0, "{}"),
        (1, base, 1, "a", None, "{}"),
        (2, base + datetime.timedelta(days=1), 1, "a", 20.0, "{}"),
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = sorted(
        eng.queries()["ts_holt"](spark, str(tmp_path)).collect(),
        key=lambda r: r["d"],
    )
    assert [r["v"] for r in out] == [10.0, 20.0]
    assert out[1]["level"] == 15.0  # 0.5*20 + 0.5*10 — from the TRUE means


def test_holt_null_series_full_trajectory_both_engines(spark, tmp_path):
    # A NULL event_type series is a real group: Spark's groupBy keeps it
    # and emits the full 3-row trajectory; the oracle's recursive join
    # must too (IS NOT DISTINCT FROM — a plain = join truncates after the
    # rn=1 anchor).  Run BOTH engines on the same fixture and compare.
    import duckdb

    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(days=i), 1, None, 10.0 + i, "{}")
        for i in range(3)
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    s_rows = eng.queries()["ts_holt"](spark, str(tmp_path)).collect()
    assert len(s_rows) == 3
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{tmp_path}/events.parquet/*.parquet')"
    )
    d_rows = con.execute(eng.oracle_sql()["ts_holt"]).fetchall()
    assert len(d_rows) == 3
    assert sorted(round(r["level"], 6) for r in s_rows) == sorted(
        round(r[3], 6) for r in d_rows
    )


def test_bfs_reach_invariants(spark, sf_dir):
    # BFS ground truth, checked structurally against the SAME pair graph:
    # depth-0 nodes are exactly the graph nodes with id % 100 == 0; every
    # deeper node has at least one neighbor one level shallower (the
    # defining property of min-hop distance); nothing exceeds the cap.
    depths = {
        r["doc_id"]: r["depth"]
        for r in eng.queries()["graph_bfs_reach"](spark, sf_dir).collect()
    }
    pairs = eng.queries()["llm_dedup_near"](spark, sf_dir).collect()
    adj: dict = {}
    nodes = set()
    for r in pairs:
        a, b = r["doc_a"], r["doc_b"]
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        nodes.update((a, b))
    assert {n for n, d in depths.items() if d == 0} == {
        n for n in nodes if n % 100 == 0
    }
    assert all(0 <= d <= 4 for d in depths.values())
    for n, d in depths.items():
        if d > 0:
            assert any(depths.get(m) == d - 1 for m in adj[n]), (n, d)


def test_ks_test_separated_and_identical_distributions(spark, tmp_path):
    # 'click' values 1..50, 'view' values 26..75: the empirical CDFs gap
    # by exactly 0.5 (at any v in [25, 26)), and with n1 = n2 = 50 the
    # alpha=0.05 critical value is 1.358*sqrt(100/2500) ~= 0.2716 — the
    # shift MUST be rejected.  A second fixture with identical segments
    # must yield D = 0 and no rejection.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def fixture(path, view_offset):
        rows = [
            (i, base, 1, "click", float(i + 1), "{}") for i in range(50)
        ] + [
            (100 + i, base, 1, "view", float(i + 1 + view_offset), "{}")
            for i in range(50)
        ]
        _write(
            spark,
            path,
            "events",
            rows,
            "event_id bigint, ts timestamp, user_id bigint, event_type string,"
            " value double, props string",
        )

    # Distinct sf_dir per scenario: the fixture loader caches the file
    # listing per (session, sf_dir, table), so overwriting one path
    # in-place would leave the second query reading stale file names.
    shifted, same = tmp_path / "shifted", tmp_path / "same"
    shifted.mkdir(), same.mkdir()
    fixture(shifted, 25)
    out = eng.queries()["agg_ks_test"](spark, str(shifted)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n1"], r["n2"]) == (50, 50)
    assert r["ks_d"] == 0.5
    assert r["reject_05"]

    fixture(same, 0)
    out2 = eng.queries()["agg_ks_test"](spark, str(same)).collect()[0]
    assert out2["ks_d"] == 0.0
    assert not out2["reject_05"]


def test_ks_test_empty_segment_emits_no_row(spark, tmp_path):
    # One segment entirely absent ('view' never occurs): the two-sample
    # test is undefined, and the operator must emit NO row — not a NULL
    # ks_d that downstream code could misread as "not rejected"
    # (round-5 advisory; mirrored by HAVING n1 > 0 AND n2 > 0 in the
    # oracle).
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, base, 1, "click", float(i + 1), "{}") for i in range(20)]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    assert eng.queries()["agg_ks_test"](spark, str(tmp_path)).count() == 0


def test_tercile_cuts_recurse_concentrated(spark, monkeypatch):
    # Concentrated distribution: 120 of 126 scores live in one 6-dp
    # sliver (one level-1 bucket), so with the refinement threshold
    # forced below that occupancy the walk MUST histogram the bucket
    # recursively instead of sorting it in one window partition
    # (round-5 advisory).  The exact k-th-smallest answers are computed
    # from the sorted list independently.
    from nedp_etl_spark.llm import ranking

    monkeypatch.setattr(ranking, "_PPL_REFINE_THRESH", 8)
    dense = [round(-5.0 + 1e-6 * i, 6) for i in range(120)]  # one sliver
    spread = [-4.0, -3.0, -2.0, -1.5, -1.0, -0.5]
    vals = dense + spread
    scores = spark.createDataFrame(
        [(i, 10, v) for i, v in enumerate(vals)],
        "doc_id bigint, n_tokens bigint, avg_logprob double",
    )
    n = len(vals)
    srt = sorted(vals)
    want_c1 = srt[-(-n // 3) - 1]  # rank ceil(n/3), 1-based
    want_c2 = srt[-(-(2 * n) // 3) - 1]
    row = ranking._tercile_cuts(spark, scores).collect()[0]
    assert row["c1"] == want_c1
    assert row["c2"] == want_c2


def test_tercile_cuts_single_value_bucket_pins_literal(spark, monkeypatch):
    # A concentrated bucket whose occupants all share ONE value must pin
    # the cut as a literal (lo == hi short-circuit) — no ranking window
    # over the un-splittable mass.
    from nedp_etl_spark.llm import ranking

    monkeypatch.setattr(ranking, "_PPL_REFINE_THRESH", 4)
    vals = [-5.0] * 100 + [-1.0, -0.9, -0.8]
    scores = spark.createDataFrame(
        [(i, 10, v) for i, v in enumerate(vals)],
        "doc_id bigint, n_tokens bigint, avg_logprob double",
    )
    n = len(vals)
    srt = sorted(vals)
    row = ranking._tercile_cuts(spark, scores).collect()[0]
    assert row["c1"] == srt[-(-n // 3) - 1] == -5.0
    assert row["c2"] == srt[-(-(2 * n) // 3) - 1] == -5.0


def test_bitmap_dict_exact_on_sparse_scattered_keys(spark, tmp_path):
    # Custkeys scattered across the int64-safe range (including a negative
    # and a 10^12 outlier) plus duplicates and a NULL: after the
    # *1000003+12345 sparsifier the dense-domain bitmap would hold ~one key
    # per word, so this pins the dictionary path in the regime it exists
    # for.  Exact counts per group, NULL ignored (COUNT DISTINCT parity).
    rows = [
        ("1-URGENT", 1),
        ("1-URGENT", 1),
        ("1-URGENT", 10**12),
        ("1-URGENT", -999_999_999),
        ("1-URGENT", None),
        ("5-LOW", 7),
        ("5-LOW", 7),
        ("5-LOW", 8),
    ]
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderpriority string, o_custkey bigint",
    )
    out = {
        r["o_orderpriority"]: r["n_distinct"]
        for r in eng.queries()["agg_bitmap_dict"](spark, str(tmp_path)).collect()
    }
    assert out == {"1-URGENT": 3, "5-LOW": 2}


def test_pattern_var_greedy_views_and_skip_semantics(spark, tmp_path):
    # Hand-built sequences pinning the variable-length semantics:
    #   u1: v v v c p        -> 1 match, V+ length 3
    #   u2: v c c p          -> NO match (click-run length 2: no alignment
    #                           of view+ click purchase fits)
    #   u3: v c p v c p      -> 2 matches, max_views 1
    #   u4: c p              -> no match (no view)
    #   u5: v v c p p        -> 1 match (second purchase extends the
    #                           purchase run; skip-past-last-row: no rematch)
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    seqs = {
        1: ["view", "view", "view", "click", "purchase"],
        2: ["view", "click", "click", "purchase"],
        3: ["view", "click", "purchase", "view", "click", "purchase"],
        4: ["click", "purchase"],
        5: ["view", "view", "click", "purchase", "purchase"],
    }
    rows, eid = [], 0
    for uid, types in seqs.items():
        for i, t in enumerate(types):
            rows.append(
                (eid, base + datetime.timedelta(seconds=i), uid, t, 1.0, "{}")
            )
            eid += 1
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    out = {
        r["user_id"]: (r["n_matches"], r["max_views"])
        for r in eng.queries()["win_pattern_var"](spark, str(tmp_path)).collect()
    }
    assert out == {1: (1, 3), 3: (2, 1), 5: (1, 2)}


def test_bpe_train_hand_computed_merge_sequence(spark, tmp_path):
    # vocab: aaa f=3, ab f=2, aaaa f=1.  Hand-replay of greedy BPE:
    #   R1: (a,a)  n = 2*3 + 3*1 = 9   -> aaa=[aa,a], aaaa=[aa,aa]
    #   R2: (aa,a) n = 3               -> aaa=[aaa]
    #   R3: (a,b)  n = 2               -> ab=[ab]
    #   R4: (aa,aa) n = 1              -> aaaa=[aaaa]
    #   R5: no pairs left -> loop must stop at 4 rows
    # Pins: chain greediness (aaaa -> [aa,aa], NOT [aa,a,a]), weighted
    # counts, lexicographic tie-break irrelevance here, and early stop.
    rows = [
        (0, "aaa aaa aaa", "en", "src0", 11),
        (1, "ab ab aaaa", "en", "src0", 10),
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = [
        (r["round"], r["pair_a"], r["pair_b"], r["n"])
        for r in eng.queries()["llm_bpe_train"](spark, str(tmp_path))
        .orderBy("round")
        .collect()
    ]
    assert out == [
        (1, "a", "a", 9),
        (2, "aa", "a", 3),
        (3, "a", "b", 2),
        (4, "aa", "aa", 1),
    ]


def test_connected_components_chain_and_rings(spark, tmp_path):
    # 200 docs -> chain 0-1-...-64 (diameter 64, one component rooted at 0)
    # plus rings over nodes 100..139 with step 8 (gcd(8,40)=8 components,
    # each rooted at 100+r for r in 0..7).  Star contraction must converge
    # in O(log n) rounds — far under the chain's diameter — which is the
    # whole reason this operator exists next to min-label propagation.
    rows = [(i, f"doc {i}", "en", "src0", 6) for i in range(200)]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    from nedp_etl_spark.operators.graph import graph_connected_components

    out = {
        r["node"]: r["component"]
        for r in eng.queries()["graph_connected_components"](
            spark, str(tmp_path)
        ).collect()
    }
    assert len(out) == 65 + 40
    for n in range(65):
        assert out[n] == 0, (n, out[n])
    for r in range(40):
        assert out[100 + r] == 100 + (r % 8), (r, out[100 + r])
    # O(log n) convergence: the 65-node chain would need 64 propagation
    # rounds; star contraction must finish well below its diameter.
    assert graph_connected_components.last_rounds <= 8


def test_heavy_hitters_exact_with_boundary(spark, tmp_path):
    # total = 100 rows, k = 50 -> hitter iff cnt * 50 > 100 i.e. cnt >= 3.
    #   key 3    x 60  -> hitter, share 0.6
    #   key 7777 x 3   -> hitter (3*50 = 150 > 100), share 0.03
    #   key 8888 x 2   -> EXCLUDED: 2*50 = 100 is NOT > 100 (strict
    #                     boundary, integer arithmetic — no double fuzz)
    #   35 distinct cold keys x 1 each
    rows = (
        [(3,)] * 60 + [(7777,)] * 3 + [(8888,)] * 2 + [(5001 + i,) for i in range(35)]
    )
    _write(spark, tmp_path, "orders", rows, "o_orderkey bigint")
    out = {
        r["k"]: (r["cnt"], r["share"])
        for r in eng.queries()["agg_heavy_hitters"](spark, str(tmp_path)).collect()
    }
    assert out == {3: (60, 0.6), 7777: (3, 0.03)}


def test_dedup_cluster_sizes_planted_clusters(spark, tmp_path):
    # Three planted identical-text groups (sizes 2, 2, 4) + 3 unique docs.
    # The near-dup pipeline runs over the AUGMENTED corpus (_aug_corpus:
    # every doc gains a first-word-clipped twin at doc_id + 1e6), so each
    # identical group of n becomes one cluster of 2n (originals + twins,
    # all sharing every MinHash band via the group's common text), and
    # each unique doc pairs with exactly its own twin (size-2 cluster).
    # 11 written docs -> 22 clustered nodes:
    #   size 2 -> 3 clusters (the uniques),  6 docs, 6/22
    #   size 4 -> 2 clusters (g1, g2),       8 docs, 8/22
    #   size 8 -> 1 cluster  (g3),           8 docs, 8/22
    texts = {
        "g1": "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "g2": "one two three four five six seven eight nine ten",
        "g3": "red orange yellow green blue indigo violet black white gray",
    }
    rows = []
    did = 0
    for g, n in (("g1", 2), ("g2", 2), ("g3", 4)):
        for _ in range(n):
            rows.append((did, texts[g], "en", "src0", len(texts[g])))
            did += 1
    for u in range(3):
        t = f"unique{u} solo{u} words{u} apart{u} corpus{u} filler{u} more{u} stuff{u}"
        rows.append((did, t, "en", "src0", len(t)))
        did += 1
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    out = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"], r["pct_docs"])
        for r in eng.queries()["llm_dedup_cluster_sizes"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        2: (3, 6, 0.272727),
        4: (2, 8, 0.363636),
        8: (1, 8, 0.363636),
    }


def test_win_distribution_hand_computed(spark, tmp_path):
    # One priority class with 5 rows valued 10..50 (unique, no ties):
    #   percent_rank = (rank-1)/4 -> 0, .25, .5, .75, 1
    #   cume_dist    = rank/5     -> .2, .4, .6, .8, 1
    #   ntile(4) over 5 rows      -> bucket sizes 2,1,1,1
    rows = [(i, "1-URGENT", float(10 * i)) for i in range(1, 6)]
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey bigint, o_orderpriority string, o_totalprice double",
    )
    out = {
        r["o_orderkey"]: (r["quartile"], r["pct_rank"], r["cume"])
        for r in eng.queries()["win_distribution"](spark, str(tmp_path)).collect()
    }
    assert out == {
        1: (1, 0.0, 0.2),
        2: (1, 0.25, 0.4),
        3: (2, 0.5, 0.6),
        4: (3, 0.75, 0.8),
        5: (4, 1.0, 1.0),
    }


def test_curation_e2e_full_python_mini_oracle(spark, tmp_path):
    # End-to-end pipeline on a hand-built corpus, checked against an
    # INDEPENDENT Python replica of all six stages (hashlib md5/sha256 vs
    # the JVM's) — every planted behavior is exercised: the eval doc is
    # excluded but its +1M copy leaks through both dedup stages and must
    # be caught 100%-contaminated; the spam doc and all its copies die in
    # the quality stage; +1M copies of train docs die in exact dedup;
    # +2M clipped copies die when they band-collide with their source;
    # survivors are sampled by md5 threshold and packed by running sum.
    import hashlib

    vocab = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " \
            "kilo lima mike november oscar papa quebec romeo sierra tango"
    texts = {
        10: " ".join(w + "X" for w in vocab.split()),          # eval (excluded)
        30: " ".join(["spam"] * 20),                           # quality-fail
        40: vocab,                                             # en, rate 0.8
        50: " ".join(w + "D" for w in vocab.split()),          # de, rate 0.25
        60: " ".join(w + "Q" for w in vocab.split()),          # fr, rate 0.25
        70: " ".join(w + "Z" for w in vocab.split()),          # other, 0.1
    }
    langs = {10: "en", 30: "en", 40: "en", 50: "de", 60: "fr", 70: "xx"}
    rows = [(d, t, langs[d], "s", len(t)) for d, t in texts.items()]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")

    # ---- independent Python replica -------------------------------------
    def clip(t):
        # match the product's substr(text, instr(text,' ')+1): instr = 0
        # for a space-free doc, so the "clip" keeps the WHOLE text
        return t[t.index(" ") + 1:] if " " in t else t

    corpus = (
        [(d, langs[d], texts[d]) for d in texts if d >= 25]
        + [(d + 1_000_000, langs[d], texts[d]) for d in texts]
        + [(d + 2_000_000, langs[d], clip(texts[d])) for d in texts]
    )

    def grams_of(toks):
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    feat = {}
    for d, lang, text in corpus:
        toks = text.split(" ")
        n = len(toks)
        if n < 2:
            continue
        freq = max(toks.count(x) for x in set(toks))
        bigr = len({" ".join(toks[i:i + 2]) for i in range(n - 1)})
        if not (freq / n <= 0.2 and bigr / (n - 1) >= 0.5):
            continue  # stage 1
        g = grams_of(toks) if n >= 3 else set()
        h = hashlib.sha256(text.strip(" ").lower().encode()).hexdigest()
        m = [min((md5(x)[i * 5:i * 5 + 5] for x in g), default=None) for i in range(6)]
        feat[d] = dict(lang=lang, n=n, g=g, h=h, m=m)
    by_hash = {}
    for d, f in feat.items():
        by_hash.setdefault(f["h"], []).append(d)
    s2 = {d: f for d, f in feat.items() if d == min(by_hash[f["h"]])}
    bands = {}
    for d, f in s2.items():
        if f["g"]:
            for b in range(3):
                bands.setdefault((b, f["m"][2 * b] + "|" + f["m"][2 * b + 1]), []).append(d)
    dropped = {d for ds in bands.values() for d in ds if d > min(ds)}
    s3 = {d: f for d, f in s2.items() if d not in dropped}
    eval_g = set().union(*(grams_of(texts[d].split(" ")) for d in texts if d < 25))
    s4 = {d: f for d, f in s3.items()
          if not (f["g"] & eval_g)
          or len(f["g"] & eval_g) / len(f["g"]) <= 0.2}
    rates = {"en": 0.8, "es": 0.5, "de": 0.25, "fr": 0.25}
    s5 = {d: f for d, f in s4.items()
          if int(md5(str(d))[:8], 16) / 2**32 < rates.get(f["lang"], 0.1)}
    expected, cum = {}, 0
    for d in sorted(s5):
        start = cum
        cum += s5[d]["n"]
        expected[d] = (s5[d]["n"], start // 512, start % 512)

    # the planted scenario must be non-trivial in the ways it was built for:
    assert 1_000_010 in feat and 1_000_010 in s3      # eval copy leaks past dedup
    assert 1_000_010 not in s4                        # ...and contamination catches it
    assert all(d not in feat for d in (30, 1_000_030, 2_000_030))  # spam family
    assert 1_000_040 not in s2                        # exact copy of train doc dies

    out = {r["doc_id"]: (r["n_tokens"], r["pack_id"], r["offset_in_pack"])
           for r in eng.queries()["llm_curation_e2e"](spark, str(tmp_path)).collect()}
    assert out == expected


def test_fn_url_userinfo_and_percent_encoding(spark, tmp_path):
    # The synthesized fixture URLs exercise neither userinfo nor percent-
    # encoding; this pins Spark's parse_url contract on both: HOST strips
    # the userinfo (the oracle's authority regexp would keep it — a known
    # parity boundary, see SCALE.md), and percent-escapes pass through RAW
    # everywhere (no decoding; an encoded %2F does not split the path).
    rows = [
        (1, "t", "x%26y", "user:pw@h", 1),   # userinfo + encoded ref param
        (2, "t", "en", "plain", 1),          # control
    ]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = {r["doc_id"]: r for r in
           eng.queries()["fn_url"](spark, str(tmp_path)).collect()}
    r1 = out[1]
    assert r1["url"] == "https://user:pw@h.example.com/docs/1?q=spark&ref=x%26y#s1"
    assert r1["host"] == "h.example.com"          # userinfo stripped by HOST
    assert r1["path"] == "/docs/1"
    assert r1["query"] == "q=spark&ref=x%26y"     # escapes NOT decoded
    assert r1["ref_param"] == "x%26y"             # raw %26, not '&' — no split
    assert r1["fragment"] == "s1"
    r2 = out[2]
    assert r2["host"] == "plain.example.com" and r2["ref_param"] == "en"


def test_entropy_gini_hand_computed(spark, tmp_path):
    # Two groups with known distributions: 'A' uniform over 2 priorities
    # (entropy = ln 2, gini = 0.5); 'B' pure (entropy = 0, gini = 0).
    import math

    rows = [
        (1, "A", "1-URGENT"), (2, "A", "2-HIGH"),
        (3, "A", "1-URGENT"), (4, "A", "2-HIGH"),
        (5, "B", "3-MEDIUM"), (6, "B", "3-MEDIUM"),
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderstatus string, o_orderpriority string")
    out = {r["o_orderstatus"]: r for r in
           eng.queries()["agg_entropy_gini"](spark, str(tmp_path)).collect()}
    a, b = out["A"], out["B"]
    assert (a["n_rows"], a["n_categories"]) == (4, 2)
    assert abs(a["entropy"] - math.log(2)) < 1e-6 and abs(a["gini"] - 0.5) < 1e-9
    assert (b["n_rows"], b["n_categories"]) == (2, 1)
    assert b["entropy"] == 0.0 and b["gini"] == 0.0


def test_rolling_corr_known_series(spark, tmp_path):
    # One event per (day, value): daily v == value, n == 1 for days 1-3 so
    # corr7 is NULL (zero count variance); day 4 has two events so the
    # count series finally varies.  v rises with n on day 4 → by the
    # 4-point formula the correlation is +1-ish; computed by hand below.
    import datetime as dt
    import math

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    # days 1..3: single event, values 1, 2, 3
    for i, v in enumerate([1.0, 2.0, 3.0]):
        rows.append((eid, 7, "m", base + dt.timedelta(days=i), v)); eid += 1
    # day 4: two events averaging 10 → v=10, n=2
    rows.append((eid, 7, "m", base + dt.timedelta(days=3), 8.0)); eid += 1
    rows.append((eid, 7, "m", base + dt.timedelta(days=3), 12.0)); eid += 1
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, event_type string, ts timestamp, value double")
    out = {r["day"]: r for r in
           eng.queries()["ts_rolling_corr"](spark, str(tmp_path)).collect()}
    assert [out[d]["corr7"] for d in sorted(out)[:3]] == [None, None, None]
    # hand computation on (v, n) = (1,1),(2,1),(3,1),(10,2), m=4
    xs, ys = [1.0, 2.0, 3.0, 10.0], [1, 1, 1, 2]
    m = 4
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    expect = (m * sxy - sx * sy) / math.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
    assert abs(out[sorted(out)[3]]["corr7"] - round(expect, 6)) < 1e-9


def test_sorted_neighborhood_finds_planted_neighbors(spark, tmp_path):
    # Two near-identical docs (one word changed) must land in the same
    # SimHash block, be adjacent in the sort, and score high Jaccard; a
    # vocabulary-disjoint doc must never pair with either above threshold.
    # The augmented corpus adds clipped copies — so (d, d+1M) pairs with
    # high similarity must also surface for long docs.
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india "
             "juliet kilo lima mike november oscar papa quebec romeo")
    near = words.replace("kilo", "KILO9")
    other = " ".join("zz" + str(i) for i in range(18))
    rows = [(1, words, "en", "s", 1), (2, near, "en", "s", 1),
            (3, other, "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = eng.queries()["llm_sorted_neighborhood"](spark, str(tmp_path)).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}
    assert (1, 1_000_001) in pairs and pairs[(1, 1_000_001)] > 0.9  # clipped copy
    assert all(3 not in (a, b) or {a, b} == {3, 1_000_003}
               for (a, b) in pairs)  # disjoint doc only pairs with its own copy


def test_label_propagation_two_cliques(spark, tmp_path):
    # Graph = two residue groups wired so communities are planted: with 40
    # fixture docs the synthesized edge families connect residues, but a
    # tiny doc set lets us hand-pick the edges.  doc_ids 0 and 7 generate
    # (0,3),(0,1) and (7,12),(7,12): after symmetrization {0,1,3} and
    # {7,12} form disjoint components, so after 3 LPA rounds every node's
    # community label must stay within its component and the two
    # components must carry different labels.
    rows = [(0, "t", "en", "s", 1), (7, "t", "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = eng.queries()["graph_label_propagation"](spark, str(tmp_path)).collect()
    comm = {r["node"]: r["community"] for r in out}
    sizes = {r["node"]: r["community_size"] for r in out}
    comp_a, comp_b = {0, 1, 3}, {7, 12}
    assert set(comm) == comp_a | comp_b
    assert {comm[n] for n in comp_a}.isdisjoint({comm[n] for n in comp_b})
    for n in comp_a:
        assert comm[n] in comp_a and sizes[n] == sum(
            1 for m in comp_a if comm[m] == comm[n])


def test_corr_matrix_perfect_and_independent(spark, tmp_path):
    # price = 2*qty + 1 → corr(qty, price) must be exactly +1;
    # tax = -qty → corr(qty, tax) = -1; disc constant → zero variance →
    # NULL correlation (division by zero) for every pair involving disc.
    rows = [("A", float(q), 2.0 * q + 1.0, 0.05, float(-q)) for q in range(1, 9)]
    _write(spark, tmp_path, "lineitem", rows,
           "l_returnflag string, l_quantity double, l_extendedprice double, "
           "l_discount double, l_tax double")
    out = {(r["var_a"], r["var_b"]): r["corr"] for r in
           eng.queries()["agg_corr_matrix"](spark, str(tmp_path)).collect()}
    assert out[("qty", "price")] == 1.0
    assert out[("qty", "tax")] == -1.0
    assert out[("qty", "disc")] is None and out[("price", "disc")] is None
    assert len(out) == 6


def test_bpe_encode_merge_chain_hand_traced(spark, tmp_path):
    # merges: t+h→th, th+e→the, i+n→in, e+r→er applied in order.
    #  "the"    → [t,h,e] → [th,e] → [the]                 = 1 token
    #  "thin"   → [t,h,i,n] → [th,i,n] → th + in           = 2 tokens
    #  "herder" → h,e,r,d,e,r → (no th) → h,er,d,er        = 4 tokens
    #  "ththth" → greedy non-overlap → th,th,th            = 3 tokens
    rows = [(1, "the thin herder ththth", "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = eng.queries()["llm_bpe_encode"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_words"] == 4
    assert r["n_chars"] == len("the") + len("thin") + len("herder") + len("ththth")
    assert r["n_tokens"] == 1 + 2 + 4 + 3
    assert abs(r["chars_per_token"] - round(r["n_chars"] / r["n_tokens"], 6)) < 1e-9


def test_quality_classifier_hand_computed_logit(spark, tmp_path):
    # Single doc with hand-countable features; the logit must equal the
    # weight formula exactly and keep must reflect its sign.
    import math

    text = "the cat sat of the mat !!"
    # tokens: 7 (the,cat,sat,of,the,mat,!!) types: 6  stopwords: the,of,the = 3
    # punct (non-alnum, non-space): '!','!' = 2   chars = len(text)
    rows = [(1, text, "en", "s", len(text))]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = eng.queries()["llm_quality_classifier"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    n_tok, n_chars, n_punct, n_stop, n_types = 7, len(text), 2, 3, 6
    z = (-2.1 + 6.0 * (n_stop / n_tok) - 8.0 * (n_punct / n_chars)
         + 0.12 * (n_chars / n_tok) + 0.55 * math.log(1.0 + n_tok)
         + 1.5 * (n_types / n_tok))
    assert r["n_tokens"] == n_tok
    assert abs(r["logit"] - round(z, 6)) < 1e-9
    assert r["keep"] == (round(z, 6) >= 0)
    assert abs(r["prob"] - round(1 / (1 + math.exp(-round(z, 6))), 6)) < 1e-6


def test_temporal_scd2_versions_partition_time(spark, tmp_path):
    # Odd customer 1 migrates on 1997-07-01: an order before the cut must
    # see version 1 with the original segment, an order on/after it must
    # see version 2 MIGRATED-; even customer 2 always sees version 1.
    # Exactly one dim version matches every order (intervals partition
    # time) — no dropped or duplicated facts.
    import datetime as dt

    _write(spark, tmp_path, "customer",
           [(1, "n1", 0, 0.0, "AUTO"), (2, "n2", 0, 0.0, "STEEL")],
           "c_custkey bigint, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string")
    _write(spark, tmp_path, "orders",
           [(10, 1, dt.datetime(1997, 6, 30)), (11, 1, dt.datetime(1997, 7, 1)),
            (12, 2, dt.datetime(1998, 1, 1))],
           "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp")
    out = {r["o_orderkey"]: r for r in
           eng.queries()["join_temporal_scd2"](spark, str(tmp_path)).collect()}
    assert len(out) == 3  # every fact matched exactly once
    assert (out[10]["segment"], out[10]["version"]) == ("AUTO", 1)
    assert (out[11]["segment"], out[11]["version"]) == ("MIGRATED-AUTO", 2)
    assert (out[12]["segment"], out[12]["version"]) == ("STEEL", 1)


def test_file_metadata_multi_file_row_index_restarts(spark, tmp_path):
    # Two-file table: row_index must restart at 0 PER FILE (the per-file
    # provenance contract), so with files of sizes a and b the global
    # stats are first=0, last=max(a,b)-1, sum=Σ per-file n(n-1)/2,
    # n_files=2 — the layout the single-file oracle can't exercise.
    df = spark.range(10).selectExpr("id AS o_orderkey")
    df.repartition(2).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = eng.queries()["scan_file_metadata"](spark, str(tmp_path)).collect()[0]
    assert out["n_files"] == 2
    assert out["n_rows"] == 10
    assert out["first_row_index"] == 0
    # read back actual per-file sizes to compute the expected sum/last
    import collections
    per = collections.Counter(
        r["f"] for r in spark.read.parquet(str(tmp_path / "orders.parquet"))
        .selectExpr("_metadata.file_name AS f").collect()
    )
    sizes = sorted(per.values())
    assert out["last_row_index"] == max(sizes) - 1
    assert out["sum_row_index"] == sum(n * (n - 1) // 2 for n in sizes)
    assert out["min_orderkey"] == 0


def test_state_reader_state_equals_batch_aggregate(spark, tmp_path):
    # The read-back state store must equal the batch GROUP BY exactly —
    # including keys seen in DIFFERENT micro-batch arrival order (values
    # quantized to micros pre-sum, so state is order-independent).
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = dt.datetime(2024, 3, 1)
    rows = [(i, u, "view", base + dt.timedelta(minutes=i), v)
            for i, (u, v) in enumerate([(1, 1.5), (2, 2.25), (1, 3.5), (2, -0.25), (3, 7.0)])]
    # single FILE (not a Spark directory): the streaming source stages the
    # fixture by linking the file, the pattern test_streaming.py uses
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(table, str(tmp_path / "events.parquet"))
    out = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in
           eng.queries()["stream_state_reader"](spark, str(tmp_path)).collect()}
    assert out == {1: (2, 5.0), 2: (2, 2.0), 3: (1, 7.0)}


def test_twa_locf_weighting_hand_computed(spark, tmp_path):
    # Series: v=10 held for 9s, then v=100 held for 1s, then final sample
    # (no weight).  Plain AVG of the three samples would be 40; LOCF TWA
    # = (10*9000 + 100*1000) / 10000 = 19.  A single-sample day returns
    # its value with span 0.
    import datetime as dt

    b = dt.datetime(2024, 5, 1, 0, 0, 0)
    rows = [
        (1, 1, "m", b, 10.0),
        (2, 1, "m", b + dt.timedelta(seconds=9), 100.0),
        (3, 1, "m", b + dt.timedelta(seconds=10), 7.0),
        (4, 1, "m", b + dt.timedelta(days=1), 42.5),  # next day, single sample
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, event_type string, ts timestamp, value double")
    out = {r["day"]: r for r in
           eng.queries()["ts_time_weighted_avg"](spark, str(tmp_path)).collect()}
    d1, d2 = out["2024-05-01"], out["2024-05-02"]
    assert (d1["n_samples"], d1["span_ms"]) == (3, 10_000)
    assert d1["twa"] == 19.0
    assert (d2["n_samples"], d2["span_ms"], d2["twa"]) == (1, 0, 42.5)


def test_lttb_elects_spike_and_keeps_endpoints(spark, tmp_path):
    # 24 points, flat at v=10 except a spike v=500 mid-series: the spike's
    # bucket must elect the spike (largest triangle vs neighbor
    # centroids), bucket 0 must keep the FIRST point and the last bucket
    # the LAST point, and output size ≤ K buckets.
    import datetime as dt

    b0 = dt.datetime(2024, 6, 1)
    rows = []
    for i in range(24):
        v = 500.0 if i == 13 else 10.0
        rows.append((i, 1, "m", b0 + dt.timedelta(minutes=i), v))
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, event_type string, ts timestamp, value double")
    out = eng.queries()["ts_lttb"](spark, str(tmp_path)).collect()
    by_bucket = {r["bucket"]: r for r in out}
    assert len(out) == 12  # 24 points, 12 buckets of 2 — all non-empty
    assert by_bucket[0]["event_id"] == 0          # first point kept
    assert by_bucket[11]["event_id"] == 23        # last point kept
    spike = [r for r in out if r["v"] == 500.0]
    assert len(spike) == 1 and spike[0]["event_id"] == 13  # spike elected


def test_watermark_detector_flags_green_heavy_text(spark, tmp_path):
    # Build a fully-green doc by rejection-sampling tokens whose md5 low
    # hex digit is even (the detector's own green rule, computed here
    # independently with hashlib), and a balanced doc near 50%: the green
    # doc must be flagged (z = sqrt(n) > 2 for n ≥ 5), the balanced one
    # must not.
    import hashlib

    def is_green(tok):
        return ord(hashlib.md5(tok.encode()).hexdigest()[31]) % 2 == 0

    pool = [f"w{i}" for i in range(200)]
    green = [t for t in pool if is_green(t)][:9]
    red = [t for t in pool if not is_green(t)][:5]
    assert len(green) == 9 and len(red) == 5
    rows = [(1, " ".join(green), "en", "s", 1),
            (2, " ".join(green[:5] + red), "en", "s", 1)]  # 5 green / 5 red
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = {r["doc_id"]: r for r in
           eng.queries()["llm_watermark_score"](spark, str(tmp_path)).collect()}
    assert out[1]["n_green"] == 9 and out[1]["watermark_suspect"] is True  # z=3
    assert out[2]["n_green"] == 5 and out[2]["watermark_suspect"] is False  # z=0


def test_benford_chi2_hand_computed(spark, tmp_path):
    # 9 orders with leading digits exactly 1..9 (one each) in one segment:
    # chi² = Σ (1 - 9p_d)² / (9 p_d) over d=1..9 — computed independently
    # here from the Benford constants.
    import math

    prices = [1.5, 25.0, 310.0, 4000.0, 55.5, 600.0, 70.0, 800.0, 9.9]
    _write(spark, tmp_path, "orders",
           [(i, 1, p) for i, p in enumerate(prices)],
           "o_orderkey bigint, o_custkey bigint, o_totalprice double")
    _write(spark, tmp_path, "customer",
           [(1, "n", 0, 0.0, "AUTO")],
           "c_custkey bigint, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string")
    out = eng.queries()["agg_benford_test"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0]["n_values"] == 9
    ps = [round(math.log10(1 + 1 / d), 9) for d in range(1, 10)]
    expect = sum(math.floor(((1 - 9 * p) ** 2 / (9 * p)) * 1e6 + 0.5) for p in ps) / 1e6
    assert abs(out[0]["chi2"] - expect) < 1e-9


def test_psi_detects_planted_shift(spark, tmp_path):
    # Baseline all in bucket 0 (price < 50k), current all in bucket 2 —
    # total distribution swap.  PSI per the clamped formula with p=1,
    # q=eps (and vice versa) is large → drifted True.  A control priority
    # with identical base/current distributions must score PSI 0.
    import datetime as dt

    base_d, cur_d = dt.datetime(1996, 1, 1), dt.datetime(1999, 1, 1)
    rows = (
        [(i, 1, "1-URGENT", 10_000.0, base_d) for i in range(8)]
        + [(100 + i, 1, "1-URGENT", 120_000.0, cur_d) for i in range(8)]
        + [(200 + i, 1, "5-LOW", 10_000.0, base_d) for i in range(8)]
        + [(300 + i, 1, "5-LOW", 10_000.0, cur_d) for i in range(8)]
    )
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_orderpriority string, "
           "o_totalprice double, o_orderdate timestamp")
    out = {r["priority"]: r for r in
           eng.queries()["profile_drift_psi"](spark, str(tmp_path)).collect()}
    assert out["1-URGENT"]["drifted"] is True and out["1-URGENT"]["psi"] > 10
    assert out["5-LOW"]["psi"] == 0.0 and out["5-LOW"]["drifted"] is False


def test_holt_winters_hand_computed_recurrence(spark, tmp_path):
    # Flat first week (v=14 → level 14, all seasonals 0), spike day 8
    # (x=28), return day 9 (x=14) — the three-variable recurrence hand-
    # traced: day 8 (l,b,s)=(21, 3.5, 3.5) forecast 24.5; day 9
    # (19.25, 0.875, -2.625) forecast 20.125.
    import datetime as dt

    b0 = dt.datetime(2024, 8, 1, 12)
    vals = [14.0] * 7 + [28.0, 14.0]
    rows = [(i, 1, "m", b0 + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, event_type string, ts timestamp, value double")
    out = {r["day" if "day" in r else "d"].isoformat(): r for r in
           eng.queries()["ts_holt_winters"](spark, str(tmp_path)).collect()}
    assert len(out) == 2
    d8 = out["2024-08-08"]
    assert (d8["level"], d8["trend"], d8["seasonal"], d8["forecast_next"]) == \
        (21.0, 3.5, 3.5, 24.5)
    d9 = out["2024-08-09"]
    assert (d9["level"], d9["trend"], d9["seasonal"], d9["forecast_next"]) == \
        (19.25, 0.875, -2.625, 20.125)


def test_shard_balance_snake_order_hand_traced(spark, tmp_path):
    # 16 docs with token counts 16..1 onto 8 workers: snake order gives
    # worker w docs ranked w and 15-w → every worker's total is exactly
    # (16-w) + (w+1) = 17 tokens; perfect balance, deterministically.
    rows = [(i, " ".join(["t"] * (16 - i)), "en", "s", 1) for i in range(16)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = eng.queries()["llm_shard_balance"](spark, str(tmp_path)).collect()
    assert len(out) == 8
    assert all(r["n_docs"] == 2 and r["total_tokens"] == 17 for r in out)


def test_token_sort_dedup_groups_permutations_only(spark, tmp_path):
    # doc 2 is a word-order permutation of doc 1 → same bag key (with
    # their +3M reversed copies, a 4-member group keyed by min doc_id 1);
    # doc 3 shares the vocabulary but a different MULTISET (one word
    # doubled) → its own group.  Exact hashing would treat all as unique.
    rows = [(1, "alpha beta gamma", "en", "s", 1),
            (2, "gamma alpha beta", "en", "s", 1),
            (3, "alpha alpha beta", "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = eng.queries()["llm_dedup_token_sort"](spark, str(tmp_path)).collect()
    by_keeper = {r["keeper_doc_id"]: r["n_permutations"] for r in out}
    assert by_keeper == {1: 4, 3: 2}  # {1,2,+3M copies} and {3,+3M copy}


def test_chisq_independence_and_perfect_association(spark, tmp_path):
    # Perfectly independent 2×2 table (all cells equal) → chi² = 0,
    # Cramér's V = 0; dof = 1.
    rows = [(i, 1, a, p, 1.0) for i, (a, p) in enumerate(
        [("O", "1-URGENT"), ("O", "5-LOW"), ("F", "1-URGENT"), ("F", "5-LOW")] * 3
    )]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
           "o_orderpriority string, o_totalprice double")
    out = eng.queries()["agg_chisq_independence"](spark, str(tmp_path)).collect()[0]
    assert (out["n_rows"], out["dof"], out["chi2"], out["cramers_v"]) == (12, 1, 0.0, 0.0)


def test_m4_roles_hand_picked(spark, tmp_path):
    # One day, four points: first(8am, v=5), max(10am, v=50),
    # min(noon, v=1), last(3pm, v=7) — each role must name its point.
    import datetime as dt

    b = dt.datetime(2024, 10, 1)
    rows = [(1, 1, "m", b + dt.timedelta(hours=8), 5.0),
            (2, 1, "m", b + dt.timedelta(hours=10), 50.0),
            (3, 1, "m", b + dt.timedelta(hours=12), 1.0),
            (4, 1, "m", b + dt.timedelta(hours=15), 7.0)]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, user_id bigint, event_type string, ts timestamp, value double")
    out = {r["role"]: r["event_id"] for r in
           eng.queries()["ts_m4_downsample"](spark, str(tmp_path)).collect()}
    assert out == {"first": 1, "max": 2, "min": 3, "last": 4}


def test_embed_outliers_flags_planted_inversion(spark, tmp_path):
    # 10 vectors in one label: 9 near +e1, one pointing the OPPOSITE way.
    # The inverted vector must be the (single, ceil(10/10)=1) flagged
    # outlier, with a clearly negative cosine to the centroid.
    rows = []
    for i in range(9):
        v = [0.0] * 64
        v[0], v[1] = 10.0, float(i % 3)  # near +e1
        rows.append((i, v, 7))
    inv = [0.0] * 64
    inv[0] = -10.0
    rows.append((99, inv, 7))
    spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["vec_id"]: r for r in
           eng.queries()["llm_embed_outliers"](spark, str(tmp_path)).collect()}
    assert out[99]["is_outlier"] is True and out[99]["cos_centroid"] < 0
    assert sum(1 for r in out.values() if r["is_outlier"]) == 1


def test_gini_coefficient_extremes(spark, tmp_path):
    # Perfect equality (4 customers, equal spend) → Gini 0; near-total
    # concentration (one customer holds everything) → Gini (n-1)/n = 0.75.
    rows = ([(i, i, 100.0) for i in range(1, 5)]           # AUTO: equal
            + [(10 + i, 10 + i, 0.0) for i in range(3)]    # STEEL: 3 zeros...
            + [(20, 14, 400.0)])                           # ...one whale
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_custkey bigint, o_totalprice double")
    _write(spark, tmp_path, "customer",
           [(i, "n", 0, 0.0, "AUTO") for i in range(1, 5)]
           + [(10 + i, "n", 0, 0.0, "STEEL") for i in range(3)]
           + [(14, "n", 0, 0.0, "STEEL")],
           "c_custkey bigint, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string")
    out = {r["segment"]: r for r in
           eng.queries()["agg_gini_coefficient"](spark, str(tmp_path)).collect()}
    assert out["AUTO"]["gini"] == 0.0
    assert out["STEEL"]["n_customers"] == 4 and out["STEEL"]["gini"] == 0.75


def test_lsh_bucket_purity_known_split(spark, tmp_path):
    # Vectors at +e1 land in one signature bucket, vectors at -e1 in the
    # complementary one; labels planted 3:1 in the first bucket → purity
    # 0.75 with majority label 0; the second bucket is pure label 1.
    def vec(sign):
        v = [0.0] * 64
        v[0] = sign * 5.0
        return v

    rows = ([(i, vec(+1), 0) for i in range(3)] + [(3, vec(+1), 1)]
            + [(10 + i, vec(-1), 1) for i in range(2)])
    spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "embeddings.parquet"))
    out = sorted(eng.queries()["llm_lsh_bucket_purity"](spark, str(tmp_path)).collect(),
                 key=lambda r: -r["n_vectors"])
    assert len(out) == 2
    big, small = out
    assert (big["n_vectors"], big["majority_label"], big["purity"]) == (4, 0, 0.75)
    assert (small["n_vectors"], small["majority_label"], small["purity"]) == (2, 1, 1.0)


def test_interleave_three_to_one_pattern(spark, tmp_path):
    # 6 en docs + 2 others: slots 0,1,2,4,5,6 go to en (in doc order),
    # slots 3,7 to the others — every 4-slot window holds 3 en + 1 other,
    # and positions are collision-free.
    rows = ([(i, "t", "en", "s", 1) for i in range(6)]
            + [(10, "t", "de", "s", 1), (11, "t", "fr", "s", 1)])
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = {r["doc_id"]: r["mix_pos"] for r in
           eng.queries()["llm_dataset_interleave"](spark, str(tmp_path)).collect()}
    assert [out[i] for i in range(6)] == [0, 1, 2, 4, 5, 6]
    assert (out[10], out[11]) == (3, 7)
    assert len(set(out.values())) == len(out)  # no slot collisions


def test_ipv4_packing_and_cidr_membership(spark, tmp_path):
    # custkey 6 → octets (10, 42, 6, 42): inside both 10.0.0.0/8 and
    # 10.42.0.0/16, int form hand-packed; custkey 5 → (192, 5, 5, 35):
    # outside both blocks.
    _write(spark, tmp_path, "customer",
           [(6, "n", 0, 0.0, "AUTO"), (5, "n", 0, 0.0, "AUTO")],
           "c_custkey bigint, c_name string, c_nationkey int, "
           "c_acctbal double, c_mktsegment string")
    out = {r["c_custkey"]: r for r in
           eng.queries()["fn_ipv4"](spark, str(tmp_path)).collect()}
    a = out[6]
    assert a["ip"] == "10.42.6.42"
    assert a["ip_int"] == 10 * 2**24 + 42 * 2**16 + 6 * 256 + 42
    assert a["in_10_slash8"] is True and a["in_10_42_slash16"] is True
    assert a["net24"] == "10.42.6.0/24"
    b = out[5]
    assert b["ip"] == "192.5.5.35"
    assert b["in_10_slash8"] is False and b["in_10_42_slash16"] is False


def test_ngram_novelty_shared_vs_unique_grams(spark, tmp_path):
    # Docs 1 and 2 share their first trigram ("a b c") but diverge after:
    # doc 1 has grams {a b c, b c d, c d e} with only the first shared →
    # novelty 2/3; doc 3 is fully unique vocabulary → novelty 1.0.
    rows = [(1, "a b c d e", "en", "s", 1),
            (2, "a b c x y", "en", "s", 1),
            (3, "p q r s", "en", "s", 1)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = {r["doc_id"]: r for r in
           eng.queries()["llm_ngram_novelty"](spark, str(tmp_path)).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_unique"] == 2
    assert abs(out[1]["novelty"] - round(2 / 3, 6)) < 1e-9
    assert out[3]["novelty"] == 1.0


def test_markov_transitions_hand_counted(spark, tmp_path):
    # user 1: a→b→a→c (ordered by ts), user 2: b→a.
    # src a: (a,b)=1, (a,c)=1 → p=0.5 each; src b: (b,a)=2 → p=1.0.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, t, 0.0, "{}")
        for i, t in enumerate(["a", "b", "a", "c"])
    ] + [
        (10 + i, base + datetime.timedelta(minutes=i), 2, t, 0.0, "{}")
        for i, t in enumerate(["b", "a"])
    ]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, ts timestamp, user_id bigint, event_type string, "
           "value double, props string")
    out = {(r["src_type"], r["dst_type"]): r for r in
           eng.queries()["agg_markov_transitions"](spark, str(tmp_path)).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "a")}
    assert out[("a", "b")]["n_trans"] == 1 and out[("a", "b")]["p"] == 0.5
    assert out[("a", "c")]["n_trans"] == 1 and out[("a", "c")]["p"] == 0.5
    assert out[("b", "a")]["n_trans"] == 2 and out[("b", "a")]["p"] == 1.0


def test_hard_negatives_excludes_own_label_ranks_by_cosine(spark, tmp_path):
    # Probe 0 (label 0).  Candidates: 1 (label 1, near-parallel → top
    # negative), 2 (label 0 — same label, must be EXCLUDED despite cosine
    # 1.0), 3 (label 1, orthogonal → rank 2, cosine 0).
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 1),
        (2, [1.0, 0.0, 0.0, 0.0], 0),
        (3, [0.0, 0.0, 1.0, 0.0], 1),
    ]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = eng.queries()["llm_hard_negatives"](spark, str(tmp_path)).collect()
    assert [r["neg_id"] for r in out] == [1, 3]  # vec 2 (same label) absent
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["cosine"] > 0.99 and out[1]["cosine"] == 0.0
    assert all(r["probe_id"] == 0 and r["probe_label"] == 0 for r in out)


def test_shortest_path_hand_weighted_chain(spark, tmp_path):
    # Docs 0..5 → chain edges (i, i+1) and ring edges (100+i, 108+i).
    # Weights w(u,v) = (7u+13v) % 9 + 1 are direction-specific:
    # w(0,1) = 13%9+1 = 5, w(1,2) = 33%9+1 = 7.  Sources (node%50==0):
    # {0, 100}.  Reachable set is the chain (from 0) plus {100, 108}.
    rows = [(i, "x", "en", "s", 1) for i in range(6)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = {r["node"]: r["dist"] for r in
           eng.queries()["graph_shortest_path"](spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5, 6, 100, 108}
    assert out[0] == 0 and out[100] == 0
    assert out[1] == 5
    assert out[2] == 5 + 7
    assert out[108] == (100 * 7 + 108 * 13) % 9 + 1


def test_neighbor_jaccard_complete_duplicate_cluster(spark, tmp_path):
    # Three identical docs (+3 augmented tail copies) → the LSH pair graph
    # is the complete graph K6: every pair has degree-5 endpoints and 4
    # common neighbors → jaccard = 4 / (5 + 5 − 4) = 2/3 for all 15 pairs.
    rows = [(i, "a b c d e", "en", "s", 9) for i in (1, 2, 3)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = eng.queries()["graph_neighbor_jaccard"](spark, str(tmp_path)).collect()
    assert len(out) == 15
    assert all(r["n_common"] == 4 for r in out)
    assert all(abs(r["jaccard"] - round(4 / 6, 6)) < 1e-9 for r in out)


def test_kalman_hand_traced_gain_sequence(spark, tmp_path):
    # One series, one event per day: 10, 20, 20.
    # d1: x=10, p=1.  d2: p_pred=1.25, k=5/9, x=10+50/9, p=5/9.
    # d3: p_pred=29/36, k=29/65, x=10260/585, p=29/65.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, base + datetime.timedelta(days=i), 1, "a", v, "{}")
            for i, v in enumerate([10.0, 20.0, 20.0])]
    _write(spark, tmp_path, "events", rows,
           "event_id bigint, ts timestamp, user_id bigint, event_type string, "
           "value double, props string")
    out = sorted(eng.queries()["ts_kalman"](spark, str(tmp_path)).collect(),
                 key=lambda r: r["d"])
    assert out[0]["x_filt"] == 10.0 and out[0]["p_var"] == 1.0
    assert abs(out[1]["x_filt"] - round(10 + 50 / 9, 6)) < 1e-9
    assert abs(out[1]["p_var"] - round(5 / 9, 6)) < 1e-9
    assert abs(out[2]["x_filt"] - round(10260 / 585, 6)) < 1e-9
    assert abs(out[2]["p_var"] - round(29 / 65, 6)) < 1e-9
    # gain shrinks the step: filtered trajectory lags the raw jump
    assert out[1]["x_filt"] < 20.0 and out[2]["x_filt"] < 20.0


def test_kneser_ney_hand_computed_continuation(spark, tmp_path):
    # Corpus bigram types: (a,b)=1, (b,a)=2, (a,c)=1 → T=3 types,
    # c(a·)=2 with 2 continuations, c(b·)=2 with 1.
    # P(b|a) = (1−.75)/2 + (.75·2/2)·(1/3) = 0.375 = P(c|a);
    # P(a|b) = (2−.75)/2 + (.75·1/2)·(1/3) = 0.75.
    import math
    rows = [(0, "a b a c", "en", "s", 7), (1, "b a", "en", "s", 3)]
    _write(spark, tmp_path, "documents", rows,
           "doc_id bigint, text string, lang string, source string, n_chars bigint")
    out = {r["doc_id"]: r for r in
           eng.queries()["llm_kneser_ney"](spark, str(tmp_path)).collect()}
    q = lambda x: math.floor(round(x, 6) * 1e6 + 0.5) / 1e6
    exp0 = round((2 * q(math.log(0.375)) + q(math.log(0.75))) / 3, 6)
    assert out[0]["n_bigrams"] == 3
    assert abs(out[0]["avg_logprob"] - exp0) < 1e-9
    assert out[1]["n_bigrams"] == 1
    assert abs(out[1]["avg_logprob"] - round(q(math.log(0.75)), 6)) < 1e-9


def test_scan_xml_roundtrip_preserves_values(spark, tmp_path):
    # Supplier names carry XML-hostile characters (&, <, >) — the
    # write→escape→parse cycle must return them and the doubles intact.
    _write(spark, tmp_path, "supplier",
           [(1, "A & B <Ltd>", 0, 10.25), (2, "C>D", 0, 4.75), (3, "E", 1, 1.5)],
           "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double")
    _write(spark, tmp_path, "nation",
           [(0, "ALPHA", 0), (1, "BETA", 0)],
           "n_nationkey int, n_name string, n_regionkey int")
    out = {r["n_name"]: r for r in
           eng.queries()["scan_xml"](spark, str(tmp_path)).collect()}
    assert out["ALPHA"]["n_suppliers"] == 2 and out["ALPHA"]["total_acctbal"] == 15.0
    assert out["BETA"]["n_suppliers"] == 1 and out["BETA"]["total_acctbal"] == 1.5


# --------------------------------------------------------------------------
# Round-7-swept operators (agg_welch_ttest, agg_zipf_fit, fn_timezone,
# llm_prefix_dedup, win_rolling_regression) — planted ground truths added
# round 8 per the repo bar: every operator gets a semantic test, not just
# the oracle hash gate.
# --------------------------------------------------------------------------

_EV_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)
_DOC_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def test_welch_ttest_hand_computed_balanced_arms(spark, tmp_path):
    # arm = user_id % 2.  Control (even users): 10, 12, 14; treatment (odd):
    # 20, 22, 24.  n0=n1=3, means 12/22, variances both 4.
    # t = 10 / sqrt(4/3 + 4/3) = 6.123724...; Welch df = (8/3)^2 /
    # (2 * (4/3)^2 / 2) = 4 exactly (equal n, equal var → df = 2(n-1)).
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    vals0, vals1 = [10.0, 12.0, 14.0], [20.0, 22.0, 24.0]
    rows = [(i, base, 2, "a", v, "{}") for i, v in enumerate(vals0)] + [
        (10 + i, base, 1, "a", v, "{}") for i, v in enumerate(vals1)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["agg_welch_ttest"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_control"], r["n_treat"]) == (3, 3)
    assert (r["mean_control"], r["mean_treat"]) == (12.0, 22.0)
    assert (r["var_control"], r["var_treat"]) == (4.0, 4.0)
    assert abs(r["t_stat"] - round(10 / (8 / 3) ** 0.5, 6)) < 1e-9
    assert r["welch_df"] == 4.0


def test_welch_ttest_single_arm_and_tiny_arm_dropped(spark, tmp_path):
    # Metric "solo" has only even users (no treatment arm) and metric
    # "thin" has a 1-row control arm — both must emit NO row (guards:
    # n0/n1 present and >= 2), not a NULL-ridden one.
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    rows = [(i, base, 2, "solo", float(i), "{}") for i in range(4)]
    rows += [(10, base, 2, "thin", 1.0, "{}")] + [
        (11 + i, base, 1, "thin", float(i), "{}") for i in range(3)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["agg_welch_ttest"](spark, str(tmp_path)).collect()
    assert out == []


def test_zipf_fit_hand_computed_three_rank_corpus(spark, tmp_path):
    # One doc "a a a a b b c": counts a=4, b=2, c=1 → ranks 1, 2, 3.
    # Replicate the operator's quantization exactly (inputs and products
    # rounded to 6 dp before summation) in plain Python — a third engine.
    import math

    _write(spark, tmp_path, "documents",
           [(0, "a a a a b b c", "en", "s", 13)], _DOC_SCHEMA)
    pts = [(1, 4), (2, 2), (3, 1)]
    lx = [round(math.log(r), 6) for r, _ in pts]
    ly = [round(math.log(c), 6) for _, c in pts]
    n = len(pts)
    sx, sy = sum(lx), sum(ly)
    sxy = sum(round(a * b, 6) for a, b in zip(lx, ly))
    sxx = sum(round(a * a, 6) for a in lx)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    r = eng.queries()["agg_zipf_fit"](spark, str(tmp_path)).collect()[0]
    assert r["n_terms"] == 3
    assert abs(r["slope"] - round(slope, 6)) < 1e-9
    assert abs(r["intercept"] - round((sy - slope * sx) / n, 6)) < 1e-9
    # a 4/2/1 frequency ladder is near-Zipfian: slope close to -1, negative
    assert -1.5 < r["slope"] < -0.9


def test_timezone_offsets_dst_and_day_roll(spark, tmp_path):
    # 2024-01-15 23:30 UTC: NY is UTC-5 (EST) → 18:30 same day; Kolkata
    # +5:30 → next day 05:00; Tokyo +9 → next day 08:30 (day rolled).
    # 2024-06-15 12:00 UTC: NY is UTC-4 (EDT) → 08:00 — the DST case.
    rows = [
        (1, datetime.datetime(2024, 1, 15, 23, 30, 0), 1, "a", 1.0, "{}"),
        (2, datetime.datetime(2024, 6, 15, 12, 0, 0), 1, "a", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_id"]: r for r in
           eng.queries()["fn_timezone"](spark, str(tmp_path)).collect()}
    r1 = out[1]
    assert r1["utc_ts"] == "2024-01-15 23:30:00"
    assert r1["ny_ts"] == "2024-01-15 18:30:00" and r1["ny_hour"] == 18
    assert r1["kolkata_ts"] == "2024-01-16 05:00:00"
    assert r1["tokyo_ts"] == "2024-01-16 08:30:00"
    assert r1["tokyo_day_rolled"] is True
    r2 = out[2]
    assert r2["ny_ts"] == "2024-06-15 08:00:00" and r2["ny_hour"] == 8  # EDT
    assert r2["tokyo_ts"] == "2024-06-15 21:00:00"
    assert r2["tokyo_day_rolled"] is False


def test_prefix_dedup_groups_shared_heads_only(spark, tmp_path):
    # _PREFIX_K = 8.  Docs 1/2/3 share the same first 8 tokens with
    # different tails → one group keyed by min doc_id, size 3.  Doc 4
    # differs at token 8; doc 5 has only 7 tokens (excluded entirely).
    head = "w0 w1 w2 w3 w4 w5 w6 w7"
    rows = [
        (1, head + " tail one", "en", "s", 30),
        (2, head + " other tail", "en", "s", 30),
        (3, head, "en", "s", 23),
        (4, "w0 w1 w2 w3 w4 w5 w6 DIFF tail", "en", "s", 30),
        (5, "w0 w1 w2 w3 w4 w5 w6", "en", "s", 20),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["llm_prefix_dedup"](spark, str(tmp_path)).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]
    assert all(r["prefix_group"] == 1 and r["group_size"] == 3 for r in out)


def test_rolling_regression_recovers_planted_line(spark, tmp_path):
    # One event per day, daily mean v = 5 + 2*(day index): a perfect line.
    # Every window of >= 2 points must report slope exactly 2.0 (integer
    # x, 1e-6-quantized y → exact int64 arithmetic); the first day's
    # 1-point window has zero x-variance → NULL.
    base = datetime.datetime(2024, 1, 1, 6, 0, 0)
    rows = [(i, base + datetime.timedelta(days=i), 1, "a", 5.0 + 2.0 * i, "{}")
            for i in range(10)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(eng.queries()["win_rolling_regression"](spark, str(tmp_path)).collect(),
                 key=lambda r: r["d"])
    assert len(out) == 10
    assert out[0]["n_window"] == 1 and out[0]["slope"] is None
    # window widens 2..7 then stays at 7 (6 preceding + current)
    assert [r["n_window"] for r in out] == [1, 2, 3, 4, 5, 6, 7, 7, 7, 7]
    assert all(r["slope"] == 2.0 for r in out[1:])


def test_scd2_partitioned_merge_leaves_untouched_partitions_alone(spark, tmp_path):
    # 6 customers in 3 segments; the one high-balance BUILDING customer
    # moves to PREMIUM.  SCD2 invariants: the changed key gets a closed
    # BUILDING row + a current PREMIUM row; everyone else stays one
    # current row.  Scale property: the AUTOMOBILE and MACHINERY partition
    # files must be BYTE-IDENTICAL after the merge (never rewritten) —
    # the partition-pruned insert_overwrite contract.
    import glob
    import os

    rows = [
        (1, "c1", "BUILDING", 9500.0),
        (2, "c2", "BUILDING", 100.0),
        (3, "c3", "AUTOMOBILE", 9900.0),   # high balance, wrong segment: kept
        (4, "c4", "AUTOMOBILE", 50.0),
        (5, "c5", "MACHINERY", 9100.0),
        (6, "c6", "MACHINERY", 10.0),
    ]
    _write(spark, tmp_path, "customer", rows,
           "c_custkey bigint, c_name string, c_mktsegment string, c_acctbal double")
    out = eng.queries()["sink_scd2_partitioned"](spark, str(tmp_path))
    # locate the scratch target this run wrote, then fingerprint untouched
    # partitions AFTER the merge and re-run to prove stability
    from nedp_etl_spark.operators.scans import _scratch
    path = _scratch("sink_scd2_partitioned", str(tmp_path))

    def _fingerprint(seg):
        return {
            f: os.path.getmtime(f)
            for f in sorted(glob.glob(os.path.join(path, f"segment={seg}", "*.parquet")))
        }

    rows_out = out.collect()
    by_key = {}
    for r in rows_out:
        by_key.setdefault(r["c_custkey"], []).append(r)
    assert len(by_key[1]) == 2  # closed + opened
    closed = [r for r in by_key[1] if not r["is_current"]][0]
    opened = [r for r in by_key[1] if r["is_current"]][0]
    assert closed["segment"] == "BUILDING" and closed["valid_to"] == "2024-06-01"
    assert opened["segment"] == "PREMIUM" and opened["valid_from"] == "2024-06-01"
    assert opened["valid_to"] is None
    for k in (2, 3, 4, 5, 6):
        assert len(by_key[k]) == 1 and by_key[k][0]["is_current"]
    # untouched-partition stability: capture fingerprints, run the merge
    # again (idempotent on already-merged state is NOT claimed — so re-run
    # the whole operator, which rebuilds t0 then merges), and compare the
    # segments a correct prune never rewrites in the MERGE step.  The
    # strongest cheap check: after the operator, the AUTOMOBILE partition
    # mtime must predate the PREMIUM partition mtime (PREMIUM was written
    # by the merge, AUTOMOBILE only by t0).
    fp_auto = _fingerprint("AUTOMOBILE")
    fp_prem = _fingerprint("PREMIUM")
    assert fp_auto and fp_prem
    assert max(fp_auto.values()) <= min(fp_prem.values())


def test_asof_enrich_latest_signup_wins_with_ties_and_nulls(spark, tmp_path):
    # User 1 ledger (all same user): fact@d0 BEFORE any signup → NULL;
    # signup@d1 v=1.0; fact@d1 (same ts as signup, larger event_id) → sees
    # the same-ts signup (as-of <=); two signups@d3 (event_id 40, 41) →
    # the later event_id wins for the fact@d4; fact@d2 sees signup@d1.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    day = lambda i: base + datetime.timedelta(days=i)  # noqa: E731
    rows = [
        (10, day(0), 1, "click", 0.5, "{}"),
        (20, day(1), 1, "signup", 1.0, "{}"),
        (21, day(1), 1, "view", 0.5, "{}"),
        (30, day(2), 1, "click", 0.5, "{}"),
        (40, day(3), 1, "signup", 2.0, "{}"),
        (41, day(3), 1, "signup", 3.0, "{}"),
        (50, day(4), 1, "purchase", 9.9, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_id"]: r for r in
           eng.queries()["stream_asof_enrich"](spark, str(tmp_path)).collect()}
    assert set(out) == {10, 21, 30, 50}  # signups are dimension rows, not output
    us = lambda i: int(day(i).replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)  # noqa: E731
    assert out[10]["signup_ts_us"] is None and out[10]["signup_value"] is None
    assert out[21]["signup_ts_us"] == us(1) and out[21]["signup_value"] == 1.0
    assert out[30]["signup_ts_us"] == us(1) and out[30]["signup_value"] == 1.0
    assert out[50]["signup_ts_us"] == us(3) and out[50]["signup_value"] == 3.0


def test_kcore_triangle_survives_pendant_edge_peeled(spark, tmp_path):
    # Docs 1/2/3 identical → LSH pair graph K3 (a triangle: the 2-core,
    # degree 2 each); docs 10/11 identical with different text → a single
    # edge, both endpoints degree 1 → peeled in round 1.  3-token texts so
    # the _aug_corpus clipped twins fall below the shingle minimum.
    rows = [(i, "alpha beta gamma", "en", "s", 16) for i in (1, 2, 3)] + [
        (i, "delta epsilon zeta", "en", "s", 18) for i in (10, 11)
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {r["node"]: r["core_degree"] for r in
           eng.queries()["graph_kcore"](spark, str(tmp_path)).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_dedup_simhash_matches_pure_python_rederivation(spark, tmp_path):
    # Third-engine check: replicate the 32-bit SimHash + Hamming<=3 pair
    # set in pure Python (hashlib.md5) on a planted corpus — identical
    # docs (hamming 0), a one-word bag-of-words variant (small hamming),
    # and unrelated vocab — and require the operator's output to equal it
    # exactly.
    import hashlib
    from itertools import combinations

    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy dog",   # dup of 1
        3: "the quick brown fox leaps over the lazy dog",   # 1-word variant
        10: "completely different vocabulary about spark engines",
        11: "unrelated text concerning duckdb oracle parity",
    }
    rows = [(i, t, "en", "s", len(t)) for i, t in docs.items()]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)

    def simhash32(text):
        # the operator votes on the ASCII code parity of the hex CHAR
        # (ord('a')=97 is odd though nibble 10 is even) — model exactly
        # that, not int(h[b], 16) % 2 (review catch, round 8)
        votes = [0] * 32
        for tok in text.split(" "):
            h = hashlib.md5(tok.encode()).hexdigest()
            for b in range(32):
                votes[b] += 1 if ord(h[b]) % 2 else -1
        return sum((1 << b) for b in range(32) if votes[b] > 0)

    fps = {i: simhash32(t) for i, t in docs.items()}
    blocks = lambda f: [(k, (f >> (8 * k)) & 255) for k in range(4)]  # noqa: E731
    expected = set()
    for a, b in combinations(sorted(docs), 2):
        share = any(x == y for x, y in zip(blocks(fps[a]), blocks(fps[b])))
        ham = bin(fps[a] ^ fps[b]).count("1")
        if share and ham <= 3:
            expected.add((a, b, ham))
    assert (1, 2, 0) in expected  # the planted exact dup must be present
    out = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in
           eng.queries()["llm_dedup_simhash"](spark, str(tmp_path)).collect()}
    assert out == expected


def test_mase_perfect_weekly_pattern_scores_zero(spark, tmp_path):
    # Series "a": v = (day mod 7) + 1 over 21 days — the seasonal-naive
    # forecast is EXACT (mae 0, mase 0).  Series "c": constant → naive
    # denominator 0 → mase NULL, mae 0.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, base + datetime.timedelta(days=i), 1, "a", float(i % 7 + 1), "{}")
            for i in range(21)]
    rows += [(100 + i, base + datetime.timedelta(days=i), 1, "c", 5.0, "{}")
             for i in range(10)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_mase_backtest"](spark, str(tmp_path)).collect()}
    assert out["a"]["n_days"] == 21 and out["a"]["n_test"] == 14
    assert out["a"]["mae_seasonal"] == 0.0 and out["a"]["mase"] == 0.0
    assert out["c"]["mae_seasonal"] == 0.0 and out["c"]["mase"] is None


def test_fuzzy_blocked_matches_within_brand_only(spark, tmp_path):
    rows = [
        (1, "alpha widget", "B1", 10.0),
        (2, "alpha widgets", "B1", 10.0),     # lev 1 from part 1
        (3, "zzzzzzzzzzzzzzzzzzzzzz", "B1", 10.0),  # lev > 10 from both
        (4, "alpha widget", "B2", 10.0),      # identical name, other brand
    ]
    _write(spark, tmp_path, "part", rows,
           "p_partkey bigint, p_name string, p_brand string, p_retailprice double")
    out = eng.queries()["join_fuzzy_blocked"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["key_a"], r["key_b"], r["brand"], r["edit_dist"]) == (1, 2, "B1", 1)
    assert r["similarity"] == round(1 - 1 / 13, 6)


def test_embed_covariance_hand_computed_two_dims(spark, tmp_path):
    # 4 vectors, 64-dim; dim0 = [1,2,3,4], dim1 = [2,4,6,8], rest 0.
    # var(dim0) = 1.25, cov(0,1) = 2.5, var(dim1) = 5.0, all other cells 0.
    rows = [(i, [float(i + 1), float(2 * (i + 1))] + [0.0] * 62, 0)
            for i in range(4)]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = {(r["dim_i"], r["dim_j"]): r["cov"] for r in
           eng.queries()["llm_embed_covariance"](spark, str(tmp_path)).collect()}
    assert len(out) == 64 * 65 // 2
    assert out[(0, 0)] == 1.25 and out[(0, 1)] == 2.5 and out[(1, 1)] == 5.0
    assert out[(2, 2)] == 0.0 and out[(0, 63)] == 0.0


def test_cdc_chunking_shift_invariant_hashes(spark, tmp_path):
    # The CDC property itself: doc 2 = doc 1 with two tokens prepended.
    # After the first boundary following the insertion point, every chunk
    # hash of doc 2 must reappear in doc 1's chunk set (fixed-width
    # chunking would give zero common hashes).  Also: chunk sizes
    # partition the token count, and chunk_idx is dense from 0.
    t1 = " ".join(f"tok{i}" for i in range(200))
    t2 = "intro words " + t1
    rows = [(1, t1, "en", "s", len(t1)), (2, t2, "en", "s", len(t2))]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["llm_cdc_chunking"](spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, toks in ((1, 200), (2, 202)):
        rows_d = sorted(by_doc[doc_id], key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in rows_d] == list(range(len(rows_d)))
        assert sum(r["n_tokens"] for r in rows_d) == toks
    h1 = {r["chunk_hash"] for r in by_doc[1]}
    h2 = {r["chunk_hash"] for r in by_doc[2]}
    shared = h1 & h2
    # all but the first (shifted) chunk of doc 2 re-syncs onto doc 1
    assert len(shared) >= len(h2) - 2
    assert len(shared) > 0


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark, tmp_path):
    # 200 events, values 0..199 for metric "a": the full mean is 99.5 and
    # the subsample-mean CI must bracket it; a second run is bit-identical
    # (hash bootstrap has no RNG).
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, base, 1, "a", float(i), "{}") for i in range(200)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r1 = eng.queries()["agg_bootstrap_ci"](spark, str(tmp_path)).collect()
    r2 = eng.queries()["agg_bootstrap_ci"](spark, str(tmp_path)).collect()
    assert r1 == r2
    row = r1[0]
    assert row["mean"] == 99.5 and row["n_resamples"] == 32
    assert row["ci_lo"] <= 99.5 <= row["ci_hi"]
    assert row["ci_lo"] > 80 and row["ci_hi"] < 120  # half-samples of 0..199


def test_dataset_card_hand_counted(spark, tmp_path):
    rows = [
        (1, "a b c", "en", "s1", 5),
        (2, "a b c", "en", "s1", 5),          # exact dup of 1
        (3, "d e f g h i j k l m n", "de", "s1", 21),
        (4, "x y", "fr", "s2", 3),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {r["source"]: r for r in
           eng.queries()["llm_dataset_card"](spark, str(tmp_path)).collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 3 and s1["total_tokens"] == 3 + 3 + 11
    assert s1["n_langs"] == 2 and s1["top_lang"] == "en"
    assert s1["dup_rate"] == round(2 / 3, 6)
    assert s1["short_frac"] == round(2 / 3, 6)  # the two 3-token docs
    s2 = out["s2"]
    assert s2["n_docs"] == 1 and s2["dup_rate"] == 0.0 and s2["top_lang"] == "fr"


def test_stl_decompose_recovers_planted_trend_and_seasonality(spark, tmp_path):
    # v(t) = 100 + t (linear trend) + s(dow) with a planted weekly pattern
    # s = +7 on dow0, -7 on dow1, 0 elsewhere... use s = [7,-7,0,0,0,0,0]
    # re-centered mean 0.  Over 28 days the centered 7-day MA of a linear
    # trend is EXACT (= 100 + t) wherever the window is full, so detrended
    # == seasonal pattern and residuals are 0.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)  # 2024-01-01 is a Monday
    pat = [7.0, -7.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    rows = [(i, base + datetime.timedelta(days=i), 1, "a",
             100.0 + i + pat[i % 7], "{}") for i in range(28)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(eng.queries()["ts_stl_decompose"](spark, str(tmp_path)).collect(),
                 key=lambda r: r["d"])
    assert len(out) == 28
    # edges (first/last 3 days) have no trend
    assert all(r["trend"] is None for r in out[:3] + out[-3:])
    mid = out[3:-3]
    for i, r in enumerate(mid, start=3):
        assert r["trend"] == 100.0 + i          # exact centered MA of a line
        assert r["resid"] == 0.0
    # seasonal: the pattern re-centered (already mean 0) — Monday +7
    mon = [r for r in out if r["d"] == "2024-01-08"][0]
    assert mon["seasonal"] == 7.0


def test_manifest_prune_skips_non_overlapping_files(spark, sf_dir):
    # Soundness + effectiveness: the pruned file list must cover all
    # matching rows (oracle equality already checks values) and must be a
    # strict subset of the layout's files for a 1-year predicate on the
    # 7-year orders table.
    from nedp_etl_spark.operators.scans import (_manifest_layout,
                                                _manifest_prune_files)
    import glob
    import os

    p = _manifest_layout(spark, sf_dir)
    files = _manifest_prune_files(spark, p, "1996-01-01 00:00:00",
                                  "1997-01-01 00:00:00")
    total = glob.glob(os.path.join(p, "*.parquet"))
    assert 0 < len(files) < len(total)


def test_bpe_fertility_hand_traced_merges(spark, tmp_path):
    # Merges [(t,h),(th,e),(i,n),(e,r)]: "the" → 1 piece, "thin" → [th,i,n]
    # → wait: i+n merges → [th,in] = 2; "her" → [h,e,r] → e+r → [h,er] = 2;
    # "cat" → 3 (no merges apply: c-a, a-t never merge).
    rows = [(1, "the thin", "en", "s", 8), (2, "her cat", "de", "s", 7)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {r["lang"]: r for r in
           eng.queries()["llm_bpe_fertility"](spark, str(tmp_path)).collect()}
    en, de = out["en"], out["de"]
    assert en["n_words"] == 2 and en["n_pieces"] == 1 + 2
    assert en["fertility"] == 1.5
    assert en["split_word_frac"] == 0.5  # "thin" split, "the" single piece
    assert de["n_words"] == 2 and de["n_pieces"] == 2 + 3
    assert de["fertility"] == 2.5
    assert de["chars_per_piece"] == round(6 / 5, 6)


def test_survival_km_hand_computed_ladder(spark, tmp_path):
    # 4 users, single-day lifetimes ending well before the corpus end
    # (user 99 extends the corpus 30 days so nobody is censored):
    # lifetimes t = 0 (u1), 10 (u2, u3), 20 (u4); u99 has t=30 (uncensored?
    # u99's last event IS the corpus end → censored).
    # KM: t=0: n=5, d=1 → S=4/5.  t=10: n=4, d=2 → S=4/5·1/2=0.4.
    # t=20: n=2, d=1 → S=0.2.  t=30: n=1, d=0 (censored) → S=0.2.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for uid, t in ((1, 0), (2, 10), (3, 10), (4, 20), (99, 30)):
        rows.append((eid, base, uid, "a", 1.0, "{}")); eid += 1
        if t:
            rows.append((eid, base + datetime.timedelta(days=t), uid, "a", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["t_days"]: r for r in
           eng.queries()["agg_survival_km"](spark, str(tmp_path)).collect()}
    assert out[0]["n_risk"] == 5 and out[0]["n_events"] == 1
    assert out[0]["survival"] == 0.8
    assert out[10]["n_risk"] == 4 and out[10]["n_events"] == 2
    assert abs(out[10]["survival"] - 0.4) < 2e-6
    assert out[20]["n_risk"] == 2 and out[20]["n_events"] == 1
    assert abs(out[20]["survival"] - 0.2) < 2e-6
    assert out[30]["n_events"] == 0  # censored tail: curve flat
    assert out[30]["survival"] == out[20]["survival"]


def test_bipartite_projection_orthogonal_and_identical_users(spark, tmp_path):
    # Users 1,2: identical behavior (cosine 1, 2 common types); user 3
    # only shares 'view' with them; user 4 disjoint (no output pair).
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for uid, types in ((1, ["click", "view"]), (2, ["click", "view"]),
                       (3, ["view", "error"]), (4, ["purchase"])):
        for t in types:
            rows.append((eid, base, uid, t, 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {(r["user_a"], r["user_b"]): r for r in
           eng.queries()["graph_bipartite_projection"](spark, str(tmp_path)).collect()}
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 2)]["cosine"] == 1.0 and out[(1, 2)]["n_common"] == 2
    assert out[(1, 3)]["cosine"] == 0.5 and out[(1, 3)]["n_common"] == 1


def test_range_generator_deterministic_columns(spark, tmp_path):
    out = eng.queries()["scan_range_generator"](spark, str(tmp_path)).collect()
    assert len(out) == 10_000
    by_id = {r["id"]: r for r in out}
    assert by_id[0]["bucket"] == 0 and by_id[13]["bucket"] == 6
    assert by_id[5]["checksum"] == 25 and by_id[100]["checksum"] == 10000 % 997
    import hashlib
    assert by_id[42]["tag"] == hashlib.md5(b"42").hexdigest()


def test_class_weights_inverse_to_frequency(spark, tmp_path):
    # labels: 0 x 90, 1 x 10 — the minority class must get the larger
    # weight, weights sum to the class count (2), and eff_n < n always.
    rows = [(i, [0.0] * 64, 0) for i in range(90)] + [
        (100 + i, [0.0] * 64, 1) for i in range(10)
    ]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = {r["label"]: r for r in
           eng.queries()["llm_class_weights"](spark, str(tmp_path)).collect()}
    assert out[1]["weight"] > out[0]["weight"]
    assert abs(out[0]["weight"] + out[1]["weight"] - 2.0) < 1e-5
    assert out[0]["eff_n"] < 90 and out[1]["eff_n"] < 10


def test_hits_matches_fixed_point_rederivation(spark, tmp_path):
    # 60 docs -> 40-node two-family crawl graph; rederive the exact 6-dp
    # fixed-point L1-normalized HITS loop in pure python (identical integer
    # contribution sums + FLOOR(raw/S*1e6+0.5) normalization) and demand
    # bit-equality of every authority/hub score.
    import collections
    import math

    rows = [(i, f"doc {i}", "en", "s", 10) for i in range(60)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    w = collections.Counter()
    for i in range(60):
        w[(i % 40, (i * 7 + 3) % 40)] += 1
        w[(i % 40, (i * 13 + 1) % 40)] += 1
    nodes = sorted({s for s, _ in w})
    h = {v: 10**6 for v in nodes}
    a = {}
    for _ in range(3):
        ar = {v: 0 for v in nodes}
        for (s, d), wt in w.items():
            ar[d] += wt * h[s]
        tot = sum(ar.values())
        a = {v: math.floor(ar[v] / tot * 1e6 + 0.5) for v in nodes}
        hr = {v: 0 for v in nodes}
        for (s, d), wt in w.items():
            hr[s] += wt * a[d]
        tot = sum(hr.values())
        h = {v: math.floor(hr[v] / tot * 1e6 + 0.5) for v in nodes}
    out = {
        r["node"]: r
        for r in eng.queries()["graph_hits"](spark, str(tmp_path)).collect()
    }
    assert set(out) == set(nodes)
    for v in nodes:
        assert abs(out[v]["authority"] - a[v] / 1e6) < 1e-9
        assert abs(out[v]["hub"] - h[v] / 1e6) < 1e-9


def test_market_basket_hand_computed_pairs(spark, tmp_path):
    # users: 1:{a,b} (with a duplicate 'a' event that distinct must fold),
    # 2:{a,b}, 3:{a}, 4:{b,c}.  n_users=4, n_a=3, n_b=3, n_c=1.
    # (a,b): both=2 -> support .5, conf each 2/3, lift 2*4/(3*3)=8/9.
    # (b,c): both=1 -> support .25, conf_b_c=1/3, conf_c_b=1, lift 4/3.
    # (a,c) never co-occurs -> no row.
    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    evs = [
        (1, "a"), (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "b"), (4, "c"),
    ]
    rows = [
        (i, base + datetime.timedelta(minutes=i), u, t, 1.0, "{}")
        for i, (u, t) in enumerate(evs)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        (r["type_a"], r["type_b"]): r
        for r in eng.queries()["agg_market_basket"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {("a", "b"), ("b", "c")}
    ab = out[("a", "b")]
    assert (ab["n_users"], ab["n_a"], ab["n_b"], ab["n_both"]) == (4, 3, 3, 2)
    assert ab["support"] == 0.5
    assert abs(ab["conf_a_b"] - 0.666667) < 1e-9
    assert abs(ab["lift"] - 0.888889) < 1e-9
    bc = out[("b", "c")]
    assert (bc["n_b"], bc["n_both"]) == (1, 1)
    assert abs(bc["conf_a_b"] - 0.333333) < 1e-9
    assert bc["conf_b_a"] == 1.0
    assert abs(bc["lift"] - 1.333333) < 1e-9


def test_periodogram_detects_planted_period(spark, tmp_path):
    # 12 one-event days cycling 10/20/30 — a pure period-3 signal plus DC.
    # 12 days is an integer number of cycles for p in {2,3,4,6}, so the DC
    # term and the period-3 component are exactly orthogonal to p=2/4/6
    # (power ~ 0 up to 6-dp quantization); p=5/7 see bounded DC leakage
    # from the 2.4- / ~1.7-cycle partial window.  Period-3 amplitude:
    # |10 + 20w + 30w^2|/3 * 12 = 69.28 -> power ~ 4800.
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    vals = [10.0, 20.0, 30.0] * 4
    rows = [
        (i, base + datetime.timedelta(days=i), 1, "a", v, "{}")
        for i, v in enumerate(vals)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["period"]: r
        for r in eng.queries()["ts_periodogram"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 3, 4, 5, 6, 7}
    assert all(r["n_days"] == 12 for r in out.values())
    p3 = out[3]["power"]
    assert p3 > 4000.0
    for p in (2, 4, 6):
        assert out[p]["power"] < 1.0, (p, out[p]["power"])
    for p in (5, 7):
        assert out[p]["power"] < p3 / 2, (p, out[p]["power"], p3)


def test_delta_method_ci_hand_computed(spark, tmp_path):
    # One metric, three users: x=(4,2,9), y=(2,1,3).  R=15/6=2.5,
    # vx=13, vy=1, cxy=3.5, quad=13-17.5+6.25=1.75, ybar=2,
    # se=sqrt(1.75/(4*3))=0.381881 (q6).
    base = datetime.datetime(2024, 6, 1, 0, 0, 0)
    per_user = {1: [1.0, 3.0], 2: [2.0], 3: [6.0, 2.0, 1.0]}
    rows = []
    i = 0
    for u, vs in per_user.items():
        for v in vs:
            rows.append((i, base + datetime.timedelta(hours=i), u, "a", v, "{}"))
            i += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["agg_delta_method_ci"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_users"] == 3
    assert r["ratio"] == 2.5
    assert abs(r["se"] - 0.381881) < 1e-9
    lo = math.floor((2.5 - 1.959964 * 0.381881) * 1e6 + 0.5) / 1e6
    hi = math.floor((2.5 + 1.959964 * 0.381881) * 1e6 + 0.5) / 1e6
    assert abs(r["ci_lo"] - lo) < 1e-9
    assert abs(r["ci_hi"] - hi) < 1e-9


def test_windowed_distinct_hand_computed(spark, tmp_path):
    # hour 10: user 1 twice + user 2 once for type a -> 2 distinct; user 9
    # for type b -> 1.  hour 11: user 1 once for type a -> 1.
    base = datetime.datetime(2024, 2, 1, 10, 0, 0)
    evs = [
        (base, 1, "a"), (base.replace(minute=30), 1, "a"),
        (base.replace(minute=45), 2, "a"), (base.replace(minute=20), 9, "b"),
        (base.replace(hour=11), 1, "a"),
    ]
    rows = [(i, ts, u, t, 1.0, "{}") for i, (ts, u, t) in enumerate(evs)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        (r["window_start"], r["event_type"]): r["n_users"]
        for r in eng.queries()["stream_windowed_distinct"](spark, str(tmp_path)).collect()
    }
    assert out == {
        ("2024-02-01 10:00:00", "a"): 2,
        ("2024-02-01 10:00:00", "b"): 1,
        ("2024-02-01 11:00:00", "a"): 1,
    }


_ORD_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_time_travel_reads_old_version_after_new_commit(spark, tmp_path):
    # Two orders before the 1997 cut, one after.  v1 must show (2 orders,
    # 30.0) even though v2 already exists — a version is an immutable file
    # list, and v2's manifest must be a superset of v1's.
    import json

    d = datetime.datetime
    rows = [
        (1, 1, "F", 10.0, d(1996, 5, 1), "1-URGENT"),
        (2, 1, "F", 20.0, d(1996, 7, 1), "1-URGENT"),
        (3, 2, "O", 40.0, d(1997, 3, 1), "2-HIGH"),
    ]
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    out = {
        r["version"]: r
        for r in eng.queries()["sink_time_travel"](spark, str(tmp_path)).collect()
    }
    assert out[1]["n_orders"] == 2 and abs(out[1]["total_price"] - 30.0) < 1e-9
    assert out[2]["n_orders"] == 3 and abs(out[2]["total_price"] - 70.0) < 1e-9
    from nedp_etl_spark.operators.scans import _read_at_version, _scratch

    root = _scratch("sink_time_travel", str(tmp_path))
    v1 = set(json.load(open(f"{root}/v1.json"))["files"])
    v2 = set(json.load(open(f"{root}/v2.json"))["files"])
    assert v1 < v2  # immutable commit: v2 references v1's files + new ones
    # the @v1 scan must plan ONLY v1's files (cost independent of later commits)
    assert set(_read_at_version(spark, root, 1).inputFiles()) == {
        "file://" + f if not f.startswith("file:") else f for f in v1
    }


_CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey bigint,"
    " c_acctbal double, c_mktsegment string"
)


def test_pit_features_no_future_leak_and_tiebreak(spark, tmp_path):
    # user 5 orders: key 100 @May1 $10, keys 101/$20 and 103/$30 both
    # @Jun1, key 102 @Aug1 $99.  A July 1 purchase must take the LATEST
    # order <= its ts — the Jun 1 pair — resolved to the higher key (103),
    # and must NOT see the August order (future leak).  An April 1
    # purchase predates every order -> no row; user 6 has no orders -> no
    # row.
    d = datetime.datetime
    orders = [
        (100, 5, "F", 10.0, d(2024, 5, 1), "1-URGENT"),
        (101, 5, "F", 20.0, d(2024, 6, 1), "1-URGENT"),
        (103, 5, "F", 30.0, d(2024, 6, 1), "2-HIGH"),
        (102, 5, "O", 99.0, d(2024, 8, 1), "2-HIGH"),
    ]
    _write(spark, tmp_path, "orders", orders, _ORD_SCHEMA)
    _write(
        spark, tmp_path, "customer",
        [(5, "cust5", 1, 77.5, "AUTOMOBILE"), (6, "cust6", 1, 1.0, "BUILDING")],
        _CUST_SCHEMA,
    )
    evs = [
        (1, d(2024, 7, 1), 5, "purchase", 1.0, "{}"),
        (2, d(2024, 4, 1), 5, "purchase", 1.0, "{}"),
        (3, d(2024, 7, 1), 6, "purchase", 1.0, "{}"),
        (4, d(2024, 7, 2), 5, "click", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", evs, _EV_SCHEMA)
    out = eng.queries()["join_pit_features"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["event_id"], r["user_id"]) == (1, 5)
    assert r["last_order_key"] == 103
    assert r["last_order_price"] == 30.0
    assert (r["c_acctbal"], r["c_mktsegment"]) == (77.5, "AUTOMOBILE")


def test_candidate_compare_order_sensitivity_split(spark, tmp_path):
    # docs 1/2: byte-identical -> identical minhash signatures AND identical
    # simhash fingerprints, so the pair lands in BOTH candidate sets.
    # docs 3/4: same word BAG, shuffled order -> simhash (bag-of-words) sees
    # hamming 0, but every 3-shingle differs so MinHash-LSH misses the pair
    # — the split that justifies running both generators.
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, text, "en", "s", len(text)),
        (2, text, "en", "s", len(text)),
        (3, "one two three four five six seven eight nine ten", "en", "s", 49),
        (4, "ten nine eight seven six five four three two one", "en", "s", 49),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["llm_candidate_compare"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_both"] >= 1          # the identical pair, in both sets
    assert r["only_simhash"] >= 1    # the shuffled pair, simhash-only
    assert r["n_minhash"] == r["n_both"] + r["only_minhash"]
    assert r["n_simhash"] == r["n_both"] + r["only_simhash"]
    union = r["n_minhash"] + r["n_simhash"] - r["n_both"]
    assert abs(r["pair_jaccard"] - math.floor(r["n_both"] / union * 1e6 + 0.5) / 1e6) < 1e-9


def test_power_analysis_hand_computed(spark, tmp_path):
    # Same cells as the Welch fixture: arms (10,12,14) / (20,22,24) ->
    # pooled_var = (8+8)/4 = 4, grand mean 17 -> mde = 0.85,
    # n = ceil(5.612119 * 2 * 4 / 0.7225) = ceil(62.141...) = 63.
    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    vals0, vals1 = [10.0, 12.0, 14.0], [20.0, 22.0, 24.0]
    rows = [(i, base, 2, "a", v, "{}") for i, v in enumerate(vals0)] + [
        (10 + i, base, 1, "a", v, "{}") for i, v in enumerate(vals1)
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["agg_power_analysis"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_arm0"], r["n_arm1"]) == (3, 3)
    assert r["pooled_var"] == 4.0
    assert r["mde"] == 0.85
    assert r["n_required"] == math.ceil(5.612119 * 2.0 * 4.0 / (0.85 * 0.85))
    assert r["n_required"] == 63


def test_diff_in_diff_hand_computed(spark, tmp_path):
    # 2x2 cells, two rows each, all variances 2:
    #   ctl pre (11) / post (13); trt pre (21) / post (31).
    # DiD = (31-21) - (13-11) = 8; se = sqrt(4*(2/2)) = 2; t = 4.
    d = datetime.datetime
    pre, post = d(2024, 1, 1), d(2024, 1, 9)
    cells = [
        (0, pre, [10.0, 12.0]), (0, post, [12.0, 14.0]),
        (1, pre, [20.0, 22.0]), (1, post, [30.0, 32.0]),
    ]
    rows, i = [], 0
    for u, ts, vs in cells:
        for v in vs:
            rows.append((i, ts + datetime.timedelta(minutes=i), u, "a", v, "{}"))
            i += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["agg_diff_in_diff"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_ctl_pre"], r["n_ctl_post"], r["n_trt_pre"], r["n_trt_post"]) == (
        2, 2, 2, 2,
    )
    assert r["did"] == 8.0
    assert r["se"] == 2.0
    assert r["t_stat"] == 4.0


def test_modularity_internal_consistency(spark, tmp_path):
    # 60 docs -> the fixed 40-node crawl graph.  Verify the decomposition
    # against its own exact integer masses: sum(tot_w) must equal 2m (each
    # community's weighted degree partitions the symmetrized edge mass),
    # node counts partition the 40 nodes, in_w <= tot_w, and every
    # contribution must equal the formula recomputed in python from the
    # row's int64 masses — same FLOOR quantize.
    rows = [(i, f"doc {i}", "en", "s", 10) for i in range(60)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["graph_modularity"](spark, str(tmp_path)).collect()
    s = sum(r["tot_w"] for r in out)
    assert s == 4 * 60  # 2 edge families x 60 docs, symmetrized
    assert sum(r["n_nodes"] for r in out) == 40
    for r in out:
        assert 0 <= r["in_w"] <= r["tot_w"]
        expect = math.floor(
            (r["in_w"] / s - (r["tot_w"] / s) ** 2) * 1e6 + 0.5
        ) / 1e6
        assert abs(r["contribution"] - expect) < 1e-9


def test_time_decay_score_hand_computed(spark, tmp_path):
    # user 1: value 10 at the high-water mark (decay 1) + value 8 exactly
    # one half-life (7 days) earlier (decay 0.5) -> score 10 + 4 = 14.
    # user 2: value 6 fourteen days back -> 6 * 0.25 = 1.5.
    now = datetime.datetime(2024, 3, 15, 12, 0, 0)
    rows = [
        (1, now, 1, "a", 10.0, "{}"),
        (2, now - datetime.timedelta(days=7), 1, "a", 8.0, "{}"),
        (3, now - datetime.timedelta(days=14), 2, "a", 6.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["user_id"]: r
        for r in eng.queries()["agg_time_decay_score"](spark, str(tmp_path)).collect()
    }
    assert out[1]["n_events"] == 2 and abs(out[1]["score"] - 14.0) < 1e-9
    assert out[2]["n_events"] == 1 and abs(out[2]["score"] - 1.5) < 1e-9


def test_clustering_coefficient_internal_consistency(spark, tmp_path):
    # 60 docs -> the fixture near-dup pair graph.  Each row's coefficient
    # must equal 2t/(d(d-1)) recomputed from its OWN exact integers (same
    # FLOOR quantize), d=1 rows must read 0.0, and the per-node triangle
    # counts must sum to exactly 3x the global census from
    # graph_triangle_count (each triangle has three corners).
    rows = [(i, f"doc {i} common shingle text", "en", "s", 24) for i in range(60)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["graph_clustering_coefficient"](spark, str(tmp_path)).collect()
    assert out, "pair graph is empty — fixture no longer collides"
    for r in out:
        if r["degree"] >= 2:
            expect = (
                math.floor(
                    2.0 * r["n_triangles"] / (r["degree"] * (r["degree"] - 1.0)) * 1e6
                    + 0.5
                )
                / 1e6
            )
            assert abs(r["clustering"] - expect) < 1e-9
            assert 0.0 <= r["clustering"] <= 1.0
        else:
            assert r["clustering"] == 0.0 and r["n_triangles"] == 0
    census = eng.queries()["graph_triangle_count"](spark, str(tmp_path)).collect()[0]
    assert sum(r["n_triangles"] for r in out) == 3 * census["n_triangles"]


def test_degree_assortativity_matches_python_recompute(spark, tmp_path):
    # Recompute Pearson r over (deg(u), deg(v)) for every directed edge in
    # python from the SAME pair list and degree map, same FLOOR quantize.
    rows = [(i, f"doc {i} common shingle text", "en", "s", 24) for i in range(60)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in eng.queries()["llm_dedup_near"](spark, str(tmp_path))
        .select("doc_a", "doc_b")
        .collect()
    ]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xy = [(deg[a], deg[b]) for a, b in pairs] + [(deg[b], deg[a]) for a, b in pairs]
    n = len(xy)
    sx = sum(x for x, _ in xy); sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy); syy = sum(y * y for _, y in xy)
    varx, vary = n * sxx - sx * sx, n * syy - sy * sy
    out = eng.queries()["graph_degree_assortativity"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_directed_edges"] == n
    if varx * vary > 0:
        expect = (
            math.floor((n * sxy - sx * sy) / math.sqrt(varx * vary) * 1e6 + 0.5) / 1e6
        )
        assert abs(r["assortativity"] - expect) < 1e-9
    else:
        assert r["assortativity"] is None


def test_mannwhitney_hand_computed_with_ties(spark, tmp_path):
    # arm0 (even users): [1, 2, 2]; arm1 (odd users): [2, 3, 4].
    # Sorted: 1 | 2,2,2 (avg rank 3) | 3 | 4 -> R1 = 3+5+6 = 14, U1 = 8.
    # tie_t = 3^3-3 = 24; sigma2 = (9/12)*(7 - 24/30) = 4.65;
    # z = (8 - 4.5)/sqrt(4.65).
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 0, "a", v, "{}") for i, v in enumerate([1.0, 2.0, 2.0])] + [
        (10 + i, base, 1, "a", v, "{}") for i, v in enumerate([2.0, 3.0, 4.0])
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["agg_mannwhitney_u"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_control"], r["n_treat"]) == (3, 3)
    assert r["u_stat"] == 8.0
    expect = math.floor((8.0 - 4.5) / math.sqrt(4.65) * 1e6 + 0.5) / 1e6
    assert abs(r["z_stat"] - expect) < 1e-9


def test_mannwhitney_degenerate_single_arm_is_null(spark, tmp_path):
    # All rows in one arm -> sigma2 = 0 -> z_stat NULL, counts still exact.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 2, "a", float(i), "{}") for i in range(5)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_mannwhitney_u"](spark, str(tmp_path)).collect()[0]
    assert (r["n_control"], r["n_treat"]) == (5, 0)
    assert r["z_stat"] is None


def test_trimmed_winsorized_hand_computed(spark, tmp_path):
    # n=10, k=1.  Sorted: 0,2,3,4,5,6,7,8,100,1000.
    # Trimmed (ranks 2-9): (2+3+4+5+6+7+8+100)/8 = 16.875.
    # Winsorized: clamp rank1->2, rank10->100 -> (135+2+100)/10 = 23.7.
    base = datetime.datetime(2024, 3, 1)
    vals = [0.0, 100.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 1000.0]
    rows = [(i, base, 1, "a", v, "{}") for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_trimmed_winsorized"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["k_trim"]) == (10, 1)
    assert r["trimmed_mean"] == 16.875
    assert r["winsorized_mean"] == 23.7


def test_trimmed_winsorized_small_group_no_trim(spark, tmp_path):
    # n=5 -> k=0: both means equal the plain mean; ties must not double-count.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "a", v, "{}") for i, v in enumerate([1.0, 1.0, 2.0, 3.0, 3.0])]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_trimmed_winsorized"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["k_trim"]) == (5, 0)
    assert r["trimmed_mean"] == 2.0
    assert r["winsorized_mean"] == 2.0


def test_rfm_segments_hand_computed(spark, tmp_path):
    # Customer c (1..10): c orders of 100.0 each (freq=c, money=100c), last
    # order at base+c days; corpus max = base+10 -> rec = 10-c.  n=10 ->
    # quintile cut ranks 2,4,6,8 on each metric -> customers pair up into
    # exactly five diagonal cells (1,1,1)..(5,5,5), two customers each.
    base = datetime.datetime(2024, 1, 1)
    rows, key = [], 0
    for c in range(1, 11):
        for j in range(c):
            key += 1
            rows.append(
                (key, c, "O", 100.0, base + datetime.timedelta(days=c - j), "1-URGENT")
            )
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    out = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in eng.queries()["agg_rfm_segments"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {(q, q, q) for q in range(1, 6)}
    for q in range(1, 6):
        r = out[(q, q, q)]
        lo_c = 2 * q - 1  # the two customers in this cell
        assert r["n_customers"] == 2
        assert r["avg_monetary"] == 100.0 * (2 * lo_c + 1) / 2.0
        assert r["avg_recency_days"] == (10 - lo_c + 10 - lo_c - 1) / 2.0


def test_rouge_overlap_hand_computed(spark, tmp_path):
    # Pair (0,1): unigram overlap a,b,c -> 3, F1 = 6/8; bigram overlap
    # "a b","b c" -> 2, F2 = 4/6.  Pair (2,3): MULTISET clipping — doc2 has
    # three x, doc3 two x -> min = 2, F1 = 4/8; bigram "x x" appears twice
    # in doc2, once in doc3 -> clipped overlap 1, F2 = 2/6.
    rows = [
        (0, "a b c d", "en", "s", 7),
        (1, "a b c x", "en", "s", 7),
        (2, "x x x y", "en", "s", 7),
        (3, "x x z z", "en", "s", 7),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {
        r["ref_id"]: r
        for r in eng.queries()["llm_rouge_overlap"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {0, 2}
    assert out[0]["cand_id"] == 1 and out[0]["ov1"] == 3 and out[0]["ov2"] == 2
    assert out[0]["rouge1_f"] == 0.75
    assert out[0]["rouge2_f"] == math.floor(4.0 / 6.0 * 1e6 + 0.5) / 1e6
    assert out[2]["ov1"] == 2 and out[2]["rouge1_f"] == 0.5
    assert out[2]["ov2"] == 1
    assert out[2]["rouge2_f"] == math.floor(2.0 / 6.0 * 1e6 + 0.5) / 1e6


def test_cooccurrence_pmi_hand_computed(spark, tmp_path):
    # One doc "a b a b a b": window-2 pairs are (a,b)x3, (b,a)x2, (a,a)x2,
    # (b,b)x2 -> N = 9.  Only (a,b) reaches min support 3; cx(a) = 5,
    # cy(b) = 5 -> PMI = ln(3*9/25).
    rows = [(1, "a b a b a b", "en", "s", 11)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["llm_cooccurrence_pmi"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["w1"], r["w2"], r["n_pair"]) == ("a", "b", 3)
    assert abs(r["pmi"] - math.log(3.0 * 9.0 / 25.0)) < 2e-6


def test_geo_haversine_recompute(spark, tmp_path):
    # Recompute the synthetic projection + haversine + bearing in python
    # with the identical literal constants and FLOOR quantize.
    rows = [(k, f"c{k}", 1, 10.0, "BUILDING") for k in (1, 7, 12345)]
    _write(
        spark, tmp_path, "customer", rows,
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    out = {
        r["c_custkey"]: r
        for r in eng.queries()["fn_geo_haversine"](spark, str(tmp_path)).collect()
    }
    RAD, R2, LAT0, LON0 = 0.017453292519943295, 12742.0176, 40.7128, -74.006
    for k, r in out.items():
        lat = (k * 7919 % 18000) / 100.0 - 90.0 + 0.005
        lon = (k * 104729 % 36000) / 100.0 - 180.0 + 0.005
        assert r["lat"] == lat and r["lon"] == lon
        assert r["grid_cell"] == f"{math.floor(lat)}:{math.floor(lon)}"
        p1, p2 = lat * RAD, LAT0 * RAD
        dp, dl = (LAT0 - lat) * RAD, (LON0 - lon) * RAD
        hav = (
            math.sin(dp / 2.0) ** 2
            + math.cos(p1) * math.cos(p2) * math.sin(dl / 2.0) ** 2
        )
        dist = R2 * math.asin(math.sqrt(hav))
        assert abs(r["dist_km"] - math.floor(dist * 1e6 + 0.5) / 1e6) < 2e-6
        brg = math.fmod(
            math.atan2(
                math.sin(dl) * math.cos(p2),
                math.cos(p1) * math.sin(p2)
                - math.sin(p1) * math.cos(p2) * math.cos(dl),
            )
            / RAD
            + 360.0,
            360.0,
        )
        assert abs(r["bearing_deg"] - math.floor(brg * 1e6 + 0.5) / 1e6) < 2e-6


def test_minhash_band_tuning_analytic(spark, tmp_path):
    # No corpus dependency: recompute every column analytically with the
    # identical quantize; spot-check the MMDS landmark (16 bands x 8 rows
    # -> threshold (1/16)^(1/8) = 2^-0.5 ~ 0.707107).
    out = {
        (r["bands"], r["rows_per_band"]): r
        for r in eng.queries()["llm_minhash_band_tuning"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {(4, 32), (8, 16), (16, 8), (32, 4), (64, 2)}
    assert out[(16, 8)]["threshold"] == math.floor(2.0**-0.5 * 1e6 + 0.5) / 1e6
    for (b, r), row in out.items():
        p = lambda s: 1.0 - (1.0 - s**r) ** b  # noqa: E731
        assert abs(row["p_at_90"] - math.floor(p(0.9) * 1e6 + 0.5) / 1e6) < 2e-6
        fp = sum(
            math.floor(p((i + 0.5) / 100.0) * 1e6 + 0.5)
            for i in range(100)
            if (i + 0.5) / 100.0 < 0.8
        )
        fn = sum(
            1_000_000 - math.floor(p((i + 0.5) / 100.0) * 1e6 + 0.5)
            for i in range(100)
            if (i + 0.5) / 100.0 >= 0.8
        )
        assert abs(row["fp_area"] - fp / 1e6 / 100.0) < 2e-6
        assert abs(row["fn_area"] - fn / 1e6 / 100.0) < 2e-6
        # a tighter threshold (more rows/band) must push FP down and FN up
    assert out[(4, 32)]["fp_area"] < out[(64, 2)]["fp_area"]
    assert out[(4, 32)]["fn_area"] > out[(64, 2)]["fn_area"]


def test_croston_hand_computed(spark, tmp_path):
    # Demand on three consecutive kept days (epoch%3==0), values 3/6/9.
    # First demand day has no interval (dropped).  Second: lv=[6] -> z=6,
    # p=3 -> croston 2.0.  Third: z=(6*.8+9)/1.8, p=3 -> z/p.
    epoch = datetime.date(1970, 1, 1)
    d0 = datetime.date(2024, 1, 1)
    while (d0 - epoch).days % 3 != 0:
        d0 += datetime.timedelta(days=1)
    rows = [
        (i, datetime.datetime.combine(d0 + datetime.timedelta(days=3 * i),
                                      datetime.time(12)), 1, "a", v, "{}")
        for i, v in enumerate([3.0, 6.0, 9.0])
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(
        eng.queries()["ts_croston"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert len(out) == 2
    assert out[0]["demand"] == 6.0 and out[0]["interval"] == 3
    assert out[0]["z"] == 6.0 and out[0]["p"] == 3.0 and out[0]["croston"] == 2.0
    z2 = round((6.0 * 0.8 + 9.0) / 1.8, 6)
    assert out[1]["z"] == z2 and out[1]["p"] == 3.0
    assert out[1]["croston"] == math.floor(z2 / 3.0 * 1e6 + 0.5) / 1e6


def test_embed_quantize_hand_computed(spark, tmp_path):
    # scale = 1/127; lanes quantize by round-half-up: 1 -> 127 (clipped
    # boundary), -0.5 -> -63 (floor(-63.5+0.5)), 0.25 -> 32, 0 -> 0.
    # Zero vector -> all-zero codes, rel_err 0.
    rows = [(1, [1.0, -0.5, 0.25, 0.0], 0), (2, [0.0, 0.0], 1)]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = {
        r["vec_id"]: r
        for r in eng.queries()["llm_embed_quantize"](spark, str(tmp_path)).collect()
    }
    r1 = out[1]
    s = 1.0 / 127.0
    assert r1["dim"] == 4
    assert r1["scale"] == math.floor(s * 1e6 + 0.5) / 1e6
    assert r1["q_checksum"] == 127 - 63 + 32 + 0
    assert r1["n_clipped"] == 1
    err2 = (1 - 127 * s) ** 2 + (-0.5 + 63 * s) ** 2 + (0.25 - 32 * s) ** 2
    expect = math.floor(math.sqrt(err2 / 1.3125) * 1e6 + 0.5) / 1e6
    assert abs(r1["rel_err"] - expect) < 2e-6
    r2 = out[2]
    assert (r2["q_checksum"], r2["n_clipped"], r2["rel_err"]) == (0, 0, 0.0)


def test_assembly_e2e_stagewise_consistency(spark, tmp_path):
    # 400 docs, two langs (en-heavy 7:1).  Verify the composition against
    # its own stage contracts recomputed in python: total docs across
    # shards == accepted count (split + temperature acceptance replayed
    # with the identical md5 hashes), token totals partition the packed
    # stream, pack count ~ ceil(tokens/512) per contiguity, entropy in
    # [0, ln(n_langs)], and the per-shard entropy matches the q6 formula
    # recomputed from this shard's own counts... via shard totals only.
    import hashlib

    rows = [
        (i, f"tok{i} " * ((i % 7) + 3), "en" if i % 8 else "fr", "s",
         ((i % 7) + 3) * 6)
        for i in range(400)
    ]
    rows = [(i, t.strip(), l, s, len(t.strip())) for i, t, l, s, c in rows]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["llm_assembly_e2e"](spark, str(tmp_path)).collect()
    assert out

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    # replay stages 1-2 in python
    docs = {i: (t, l) for i, t, l, s, c in rows}
    train = {i for i, (t, l) in docs.items() if md5(f"{i}:{t}")[:2] < "e6"}
    from collections import Counter
    import math as m

    cnt = Counter(docs[i][1] for i in train)
    total = sum(cnt.values())
    denom = sum(m.floor(m.sqrt(n) * 1e6 + 0.5) for n in cnt.values())
    rate = {
        l: min(1.0, m.floor(m.sqrt(n) * 1e6 + 0.5) * float(total) / (denom * float(n)))
        for l, n in cnt.items()
    }
    kept = {
        i
        for i in train
        if int(md5(str(i))[:8], 16) / 4294967296.0 < rate[docs[i][1]]
    }
    n_docs = sum(r["n_docs"] for r in out)
    assert n_docs == len(kept)
    tok_total = sum(len(docs[i][0].split(" ")) for i in kept)
    assert sum(r["total_tokens"] for r in out) == tok_total
    # replay the epoch-order packing exactly: distinct pack ids overall
    order = sorted(kept, key=lambda i: (md5(f"epoch1:{i}"), i))
    packs, cum = set(), 0
    for i in order:
        packs.add(cum // 512)
        cum += len(docs[i][0].split(" "))
    assert sum(r["n_packs"] for r in out) == len(packs)
    for r in out:
        assert 0.0 <= r["lang_entropy"] <= math.log(max(r["n_langs"], 1)) + 1e-9


def test_wilson_ci_hand_computed(spark, tmp_path):
    # n=4, k=1 (values >= 1.0): recompute the closed form with the shared
    # z literal; interval must bracket p_hat and stay inside [0, 1].
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "a", v, "{}") for i, v in enumerate([2.0, 0.5, 0.25, 0.0])]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_wilson_ci"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["k"]) == (4, 1)
    z, n, p = 1.959964, 4, 0.25
    zz_n = z * z / n
    half = z * math.sqrt(p * (1 - p) / n + zz_n / (4 * n))
    lo = (p + zz_n / 2 - half) / (1 + zz_n)
    hi = (p + zz_n / 2 + half) / (1 + zz_n)
    assert r["p_hat"] == 0.25
    assert abs(r["wilson_lo"] - math.floor(lo * 1e6 + 0.5) / 1e6) < 1e-9
    assert abs(r["wilson_hi"] - math.floor(hi * 1e6 + 0.5) / 1e6) < 1e-9
    assert 0.0 <= r["wilson_lo"] <= 0.25 <= r["wilson_hi"] <= 1.0


def test_theil_index_equality_and_concentration(spark, tmp_path):
    # All-equal values -> T = 0 exactly (each term ln(1) = 0).  A planted
    # concentrated series must recompute to the python fold.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "eq", 5.0, "{}") for i in range(6)] + [
        (10 + i, base, 1, "cc", v, "{}") for i, v in enumerate([1.0, 1.0, 8.0])
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["event_type"]: r
        for r in eng.queries()["agg_theil_index"](spark, str(tmp_path)).collect()
    }
    assert out["eq"]["theil"] == 0.0
    mu = math.floor((1 + 1 + 8) / 3.0 * 1e6 + 0.5) / 1e6  # dsum-exact mean
    terms = sum(
        math.floor((v / (10.0 / 3.0)) * math.log(v / (10.0 / 3.0)) * 1e6 + 0.5)
        for v in [1.0, 1.0, 8.0]
    )
    assert out["cc"]["mean_value"] == mu
    assert abs(out["cc"]["theil"] - math.floor(terms / 1e6 / 3 * 1e6 + 0.5) / 1e6) < 2e-6
    assert out["cc"]["theil"] > 0.2


def test_cramers_v_bounds_and_hand_case(spark, tmp_path):
    # Perfect association (lang determines source, 2x2, balanced):
    # chi2 = N, V = 1.  Independence (all four cells equal): chi2 = 0.
    assoc = [(i, "t", "en" if i % 2 else "fr", "s-en" if i % 2 else "s-fr", 1)
             for i in range(40)]
    _write(spark, tmp_path, "documents", assoc, _DOC_SCHEMA)
    r = eng.queries()["agg_cramers_v"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["n_rows"], r["n_cols"]) == (40, 2, 2)
    assert abs(r["chi2"] - 40.0) < 1e-4
    assert abs(r["cramers_v"] - 1.0) < 1e-4


def test_cramers_v_independent_facets_zero(spark, tmp_path):
    # Independence (all four cells equal): chi2 = 0, V ~ 0.  Fresh
    # tmp_path — the loader caches per (session, dir, table), so the
    # fixture must not be rewritten inside one test.
    indep = [(i, "t", "en" if i % 2 else "fr", "s0" if i % 4 < 2 else "s1", 1)
             for i in range(40)]
    _write(spark, tmp_path, "documents", indep, _DOC_SCHEMA)
    r2 = eng.queries()["agg_cramers_v"](spark, str(tmp_path)).collect()[0]
    assert abs(r2["chi2"]) < 1e-4 and abs(r2["cramers_v"]) < 1e-2


def test_bollinger_hand_computed(spark, tmp_path):
    # One event per day, values 1..8 on one series: at day 8 the 7-row
    # frame holds 2..8 -> sma 5, sample var 28/6, band = 5 ± 2sd.
    base = datetime.datetime(2024, 1, 1, 12)
    rows = [(i, base + datetime.timedelta(days=i), 1, "a", float(i + 1), "{}")
            for i in range(8)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(
        eng.queries()["ts_bollinger_bands"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert out[0]["n"] == 1 and out[0]["pct_b"] is None  # single-row frame
    last = out[-1]
    assert last["n"] == 7 and last["close"] == 8.0 and last["sma"] == 5.0
    sd = math.sqrt(28.0 / 6.0)
    assert abs(last["lower"] - math.floor((5 - 2 * sd) * 1e6 + 0.5) / 1e6) < 1e-9
    assert abs(last["upper"] - math.floor((5 + 2 * sd) * 1e6 + 0.5) / 1e6) < 1e-9
    expect_b = math.floor((8.0 - (5 - 2 * sd)) / (4 * sd) * 1e6 + 0.5) / 1e6
    assert abs(last["pct_b"] - expect_b) < 1e-9


def test_mutual_information_perfect_and_independent(spark, tmp_path):
    # Perfect association: MI = H = ln 2, NMI = 1.
    assoc = [(i, "t", "en" if i % 2 else "fr", "s-en" if i % 2 else "s-fr", 1)
             for i in range(40)]
    _write(spark, tmp_path, "documents", assoc, _DOC_SCHEMA)
    r = eng.queries()["agg_mutual_information"](spark, str(tmp_path)).collect()[0]
    ln2 = math.floor(math.log(2.0) * 1e9 + 0.5) / 1e9
    assert abs(r["mi"] - math.floor(ln2 * 1e6 + 0.5) / 1e6) < 2e-6
    assert abs(r["h_lang"] - math.floor(ln2 * 1e6 + 0.5) / 1e6) < 2e-6
    assert abs(r["nmi"] - 1.0) < 1e-4


def test_mutual_information_independent_zero(spark, tmp_path):
    indep = [(i, "t", "en" if i % 2 else "fr", "s0" if i % 4 < 2 else "s1", 1)
             for i in range(40)]
    _write(spark, tmp_path, "documents", indep, _DOC_SCHEMA)
    r = eng.queries()["agg_mutual_information"](spark, str(tmp_path)).collect()[0]
    assert abs(r["mi"]) < 1e-4 and abs(r["nmi"]) < 1e-2


def test_judge_agreement_hand_computed(spark, tmp_path):
    # 4 docs: both judges fire on doc0 (long text, big n_chars), neither
    # on doc3; judges disagree on docs 1/2 -> po = 0.5.
    long_text = " ".join(f"w{i}" for i in range(50))
    rows = [
        (0, long_text, "en", "s", 300),   # a=1 (chars), b=1 (50 toks)
        (1, "short", "en", "s", 250),     # a=1, b=0
        (2, long_text, "en", "s", 100),   # a=0, b=1
        (3, "short", "en", "s", 50),      # a=0, b=0
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    r = eng.queries()["llm_judge_agreement"](spark, str(tmp_path)).collect()[0]
    assert (r["n11"], r["n10"], r["n01"], r["n00"]) == (1, 1, 1, 1)
    assert r["p_observed"] == 0.5 and r["p_expected"] == 0.5
    assert r["kappa"] == 0.0  # agreement exactly at chance


def test_moments_hand_computed(spark, tmp_path):
    # Symmetric values 1..5 -> skewness 0; m2 = 2, m4 = 6.8 -> excess
    # kurtosis 6.8/4 - 3 = -1.3.  Skewed series recomputed in python.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "sym", float(v), "{}")
            for i, v in enumerate([1, 2, 3, 4, 5])] + [
        (10 + i, base, 1, "skw", float(v), "{}")
        for i, v in enumerate([1, 1, 1, 9])
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["event_type"]: r
        for r in eng.queries()["agg_kurtosis_skewness"](spark, str(tmp_path)).collect()
    }
    sym = out["sym"]
    assert sym["mean_value"] == 3.0 and sym["m2"] == 2.0
    assert sym["skewness"] == 0.0
    assert abs(sym["excess_kurtosis"] - (6.8 / 4.0 - 3.0)) < 1e-6
    skw = out["skw"]  # mean 3, d = (-2,-2,-2,6): m2 = 12, m3 = 48, m4 = 336
    assert skw["mean_value"] == 3.0 and skw["m2"] == 12.0
    assert abs(skw["skewness"] - 48.0 / 12.0**1.5) < 1e-5
    assert abs(skw["excess_kurtosis"] - (336.0 / 144.0 - 3.0)) < 1e-5


def test_benjamini_hochberg_step_up(spark, tmp_path):
    # Two metrics: 'big' has a strong planted arm shift (tiny p, rejected);
    # 'nul' has identical arms (p ~ 1, not rejected).  BH internal
    # consistency: thresholds are rank*q/m and rejections are a prefix.
    base = datetime.datetime(2024, 3, 1)
    rows = []
    i = 0
    for v in range(30):  # arm0 low values, arm1 high values -> strong shift
        rows.append((i, base, 0, "big", float(v), "{}")); i += 1
        rows.append((i, base, 1, "big", float(v + 100), "{}")); i += 1
    for v in range(30):  # identical arms
        rows.append((i, base, 0, "nul", float(v), "{}")); i += 1
        rows.append((i, base, 1, "nul", float(v), "{}")); i += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["event_type"]: r
        for r in eng.queries()["agg_benjamini_hochberg"](spark, str(tmp_path)).collect()
    }
    assert out["big"]["rank"] == 1 and out["nul"]["rank"] == 2
    assert out["big"]["p_value"] < 0.001 and out["big"]["rejected"]
    assert out["nul"]["p_value"] > 0.5 and not out["nul"]["rejected"]
    for r in out.values():
        assert r["bh_threshold"] == math.floor(r["rank"] * 0.05 / 2 * 1e6 + 0.5) / 1e6


def test_paragraph_dedup_keep_first_reassembly(spark, tmp_path):
    # Docs of exactly two 20-token paragraphs.  P_A is shared by docs 1
    # and 2: doc 1 (first occurrence) keeps it, doc 2 loses it and
    # reassembles to only its unique paragraph; within-doc order survives.
    pa = " ".join(f"a{i}" for i in range(20))
    pb = " ".join(f"b{i}" for i in range(20))
    pc = " ".join(f"c{i}" for i in range(20))
    rows = [
        (1, f"{pa} {pb}", "en", "s", 100),
        (2, f"{pc} {pa}", "en", "s", 100),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {
        r["doc_id"]: r
        for r in eng.queries()["llm_paragraph_dedup"](spark, str(tmp_path)).collect()
    }
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["cleaned_text"] == f"{pa} {pb}"
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["cleaned_text"] == pc  # duplicated pa dropped, order kept


def test_rank_operators_ignore_null_values(spark, tmp_path):
    # NULL observations must carry no rank (review finding: the engines
    # order NULL groups differently — Spark first, DuckDB last — so an
    # unfiltered NULL group would shift every cumulative count).
    base = datetime.datetime(2024, 3, 1)
    rows = [(0, base, 0, "a", 1.0, "{}"), (1, base, 0, "a", 2.0, "{}"),
            (2, base, 1, "a", 3.0, "{}"), (3, base, 1, "a", None, "{}"),
            (4, base, 0, "a", None, "{}")]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    mw = eng.queries()["agg_mannwhitney_u"](spark, str(tmp_path)).collect()[0]
    assert (mw["n_control"], mw["n_treat"]) == (2, 1)  # NULLs uncounted
    tw = eng.queries()["agg_trimmed_winsorized"](spark, str(tmp_path)).collect()[0]
    assert tw["n"] == 3 and tw["trimmed_mean"] == 2.0


def test_cooccurrence_pmi_single_token_doc_no_crash(spark, tmp_path):
    # A doc shorter than the skip-gram distance must yield no pairs, not
    # a negative-length slice error (review finding).
    rows = [(1, "solo", "en", "s", 4), (2, "a b a b a b", "en", "s", 11)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["llm_cooccurrence_pmi"](spark, str(tmp_path)).collect()
    assert all(r["w1"] != "solo" and r["w2"] != "solo" for r in out)


def test_mix_temperature_sweep_monotonic(spark, tmp_path):
    # Skewed corpus (90 en / 10 fr): α=1 keeps everything (rates 1) with
    # head share 0.9; smaller α flattens — head share decreases and mix
    # entropy increases monotonically as α drops.
    rows = [(i, "t", "en" if i < 90 else "fr", "s", 1) for i in range(100)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {
        r["alpha"]: r
        for r in eng.queries()["llm_mix_temperature_sweep"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {0.3, 0.5, 0.7, 1.0}
    assert out[1.0]["kept_docs"] == 100
    assert out[1.0]["head_share"] == 0.9
    shares = [out[a]["head_share"] for a in (0.3, 0.5, 0.7, 1.0)]
    assert shares == sorted(shares)  # flattening monotone in alpha
    ents = [out[a]["mix_entropy"] for a in (0.3, 0.5, 0.7, 1.0)]
    assert ents == sorted(ents, reverse=True)


def test_calibration_ece_recompute(spark, tmp_path):
    # Replay confidence hashing + binning in python; ECE must match the
    # identical quantized fold and sit in [0, 1].
    import hashlib

    rows = [(i, "t", "en", "s", 300 if i % 3 else 100) for i in range(200)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    r = eng.queries()["llm_calibration_ece"](spark, str(tmp_path)).collect()[0]
    bins = {}
    for i, _, _, _, nc in rows:
        conf = int(hashlib.md5(f"conf:{i}".encode()).hexdigest()[:8], 16) / 4294967296.0
        bb = min(int(conf * 10), 9)
        n, h, cq = bins.get(bb, (0, 0, 0))
        bins[bb] = (n + 1, h + (1 if nc >= 200 else 0),
                    cq + math.floor(conf * 1e6 + 0.5))
    N = sum(n for n, _, _ in bins.values())
    tq = sum(
        math.floor((n / N) * abs(h / n - cq / n / 1e6) * 1e9 + 0.5)
        for n, h, cq in bins.values()
    )
    assert r["n"] == N and r["n_bins"] == len(bins)
    assert abs(r["ece"] - math.floor(tq / 1e9 * 1e6 + 0.5) / 1e6) < 1e-9
    assert 0.0 <= r["ece"] <= 1.0


def test_nearest_1d_hand_matches(spark, tmp_path):
    # Fills at 100/200, probes at 120 (->100, gap 20), 150 (equidistant
    # -> lower fill by rule, gap 50), 210 (->200), plus an exact-price
    # probe at 200 (gap 0 to the fill, tie-as-below).
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 1, "F", 100.0, base, "1-URGENT"),
        (2, 1, "F", 200.0, base, "1-URGENT"),
        (3, 1, "P", 120.0, base, "1-URGENT"),
        (4, 1, "P", 150.0, base, "1-URGENT"),
        (5, 1, "P", 210.0, base, "1-URGENT"),
        (6, 1, "P", 200.0, base, "1-URGENT"),
        (7, 1, "O", 999.0, base, "1-URGENT"),  # other status: excluded
    ]
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    out = {
        r["probe_key"]: r
        for r in eng.queries()["join_nearest_1d"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {3, 4, 5, 6}
    assert out[3]["match_key"] == 1 and out[3]["price_gap"] == 20.0
    assert out[4]["match_key"] == 1 and out[4]["price_gap"] == 50.0  # tie -> below
    assert out[5]["match_key"] == 2 and out[5]["price_gap"] == 10.0
    assert out[6]["match_key"] == 2 and out[6]["price_gap"] == 0.0


def test_gumbel_extremes_hand_computed(spark, tmp_path):
    # Three daily maxima 10/20/30: mean 20, sd 10 -> beta = 10*sqrt6/pi,
    # mu = 20 - gamma*beta, rl100 = mu - beta*ln(-ln(0.99)).
    base = datetime.datetime(2024, 1, 1, 6)
    rows = []
    for day, mx in enumerate([10.0, 20.0, 30.0]):
        rows.append((2 * day, base + datetime.timedelta(days=day), 1, "a", mx, "{}"))
        rows.append((2 * day + 1,
                     base + datetime.timedelta(days=day, hours=2), 1, "a",
                     mx / 2, "{}"))  # non-max row the block MAX must ignore
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_gumbel_extremes"](spark, str(tmp_path)).collect()[0]
    assert r["n_blocks"] == 3 and r["block_mean"] == 20.0
    s6pi, gam = 0.7796968012336761, 0.5772156649015329
    beta = 10.0 * s6pi
    mu = 20.0 - gam * beta
    rl = mu - beta * math.log(-math.log(0.99))
    assert abs(r["beta"] - math.floor(beta * 1e6 + 0.5) / 1e6) < 1e-9
    assert abs(r["mu"] - math.floor(mu * 1e6 + 0.5) / 1e6) < 1e-9
    assert abs(r["return_level_100"] - math.floor(rl * 1e6 + 0.5) / 1e6) < 2e-6


def test_luhn_valid_and_corrupt_split(spark, tmp_path):
    # Every repaired number must pass; every +1-corrupted twin must fail
    # (mod-10 checksums detect ALL single-digit substitutions); recompute
    # one checksum by hand.
    rows = [(k, f"c{k}", 1, 0.0, "AUTOMOBILE") for k in (1, 2, 77)]
    _write(
        spark, tmp_path, "customer", rows,
        "c_custkey bigint, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    out = eng.queries()["fn_luhn"](spark, str(tmp_path)).collect()
    assert len(out) == 3
    for r in out:
        assert r["valid_passes"] and not r["corrupt_passes"]
        digits = [int(ch) for ch in r["valid_num"]]
        total = sum(
            (2 * d - 9 if 2 * d > 9 else 2 * d) if (i + 1) % 2 == 1 else d
            for i, d in enumerate(digits)
        )
        assert total % 10 == 0


def test_entropy_rate_hand_computed(spark, tmp_path):
    # 'a b a b a b': bigrams (a,b)x3? no — tokens [a,b,a,b,a,b] give
    # (a,b),(b,a),(a,b),(b,a),(a,b): c12={(a,b):3,(b,a):2}, c1={a:3,b:2}.
    # H(W2|W1) = -(3/5)ln(3/3) - (2/5)ln(2/2) = 0 (deterministic chains);
    # unigram entropy of [a:3,b:3] over 6 tokens = ln 2.
    rows = [(1, "a b a b a b", "en", "s", 11)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    r = eng.queries()["llm_ngram_entropy_rate"](spark, str(tmp_path)).collect()[0]
    assert r["n_bigrams"] == 5
    assert r["h_bigram_cond"] == 0.0 and r["perplexity_rate"] == 1.0
    ln2q = math.floor(math.floor(math.log(2.0) * 1e9 + 0.5) / 1e9 * 1e6 + 0.5) / 1e6
    assert abs(r["h_unigram"] - ln2q) < 1e-9


def test_lorenz_curve_hand_computed(spark, tmp_path):
    # 10 observations, values 1..10 (total 55): bottom-d share is
    # sum(1..d)/55; decile d boundary rank = d exactly.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "a", float(i + 1), "{}") for i in range(10)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["decile"]: r["value_share"]
        for r in eng.queries()["agg_lorenz_curve"](spark, str(tmp_path)).collect()
    }
    assert set(out) == set(range(1, 11))
    for d in range(1, 11):
        expect = math.floor(d * (d + 1) / 2.0 / 55.0 * 1e6 + 0.5) / 1e6
        assert abs(out[d] - expect) < 1e-9
    assert out[10] == 1.0


def test_lorenz_curve_tied_run_interpolates(spark, tmp_path):
    # All-equal values: every decile's share equals its population share
    # (the curve degenerates to the diagonal) — the tied-run
    # interpolation must hold exactly.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "a", 7.0, "{}") for i in range(20)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["decile"]: r["value_share"]
        for r in eng.queries()["agg_lorenz_curve"](spark, str(tmp_path)).collect()
    }
    for d in range(1, 11):
        assert abs(out[d] - d / 10.0) < 1e-6


def test_control_chart_hand_computed(spark, tmp_path):
    # Daily values 10,10,10,10,50: center 18, MR-bar = (0+0+0+40)/4 = 10,
    # band = 26.6 -> limits (-8.6, 44.6): exactly one violation (50).
    base = datetime.datetime(2024, 1, 1, 12)
    vals = [10.0, 10.0, 10.0, 10.0, 50.0]
    rows = [(i, base + datetime.timedelta(days=i), 1, "a", v, "{}")
            for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["ts_control_chart"](spark, str(tmp_path)).collect()[0]
    assert r["n_days"] == 5 and r["center"] == 18.0
    assert r["lcl"] == -8.6 and r["ucl"] == 44.6
    assert r["n_violations"] == 1


def test_ttl_expire_drops_old_partitions(spark, tmp_path):
    # 3 days spanning 20 days: the oldest is beyond the 14-day TTL and its
    # PARTITION must disappear from disk; survivors keep exact counts.
    import os

    base = datetime.datetime(2024, 3, 21, 12)
    rows = (
        [(i, base, 1, "a", 1.0, "{}") for i in range(3)]
        + [(10 + i, base - datetime.timedelta(days=10), 1, "a", 1.0, "{}")
           for i in range(2)]
        + [(20 + i, base - datetime.timedelta(days=20), 1, "a", 1.0, "{}")
           for i in range(4)]
    )
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        r["day"]: r
        for r in eng.queries()["sink_ttl_expire"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {"2024-03-21", "2024-03-11"}
    assert out["2024-03-21"]["n"] == 3 and out["2024-03-11"]["n"] == 2
    assert all(r["n_expired_partitions"] == 1 for r in out.values())
    from nedp_etl_spark.operators.scans import _scratch

    path = _scratch("sink_ttl_expire", str(tmp_path))
    dirs = [e for e in os.listdir(path) if e.startswith("day=")]
    assert sorted(dirs) == ["day=2024-03-11", "day=2024-03-21"]


def test_weighted_median_hand_computed(spark, tmp_path):
    # values 1..4 with weights 1,1,1,4 (users 0,0,0,3 via user_id%5+1):
    # W=7, median rank ceil(3.5)=4 -> first value whose cumweight reaches
    # 4 is 4.0; p90 rank ceil(6.3)=7 -> also 4.0.  Unweighted median = 2.
    base = datetime.datetime(2024, 3, 1)
    rows = [(0, base, 0, "a", 1.0, "{}"), (1, base, 0, "a", 2.0, "{}"),
            (2, base, 0, "a", 3.0, "{}"), (3, base, 3, "a", 4.0, "{}")]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_weighted_median"](spark, str(tmp_path)).collect()[0]
    assert r["total_weight"] == 7
    assert r["wmedian"] == 4.0 and r["wp90"] == 4.0


def test_knn_graph_hand_neighbors(spark, tmp_path):
    # Three near-identical vectors + one near-orthogonal: the close trio
    # rank each other 1-2 with cosine ~1; no self-edges; rank within k.
    v = [1.0] + [0.0] * 63
    v2 = [1.0, 0.01] + [0.0] * 62
    v3 = [1.0, -0.01] + [0.0] * 62
    w = [0.0, 0.0, 1.0] + [0.0] * 61
    rows = [(1, v, 0), (2, v2, 0), (3, v3, 0), (9, w, 1)]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = eng.queries()["llm_knn_graph"](spark, str(tmp_path)).collect()
    by_src = {}
    for r in out:
        assert r["vec_id"] != r["neighbor_id"]
        assert 1 <= r["rnk"] <= 3
        by_src.setdefault(r["vec_id"], []).append(r)
    if 1 in by_src:  # trio shares a bucket: top neighbors are the twins
        top = sorted(by_src[1], key=lambda r: r["rnk"])[0]
        assert top["neighbor_id"] in (2, 3) and top["cosine"] > 0.999


def test_quarantine_reconciles_exactly(spark, tmp_path):
    # keys 97/101/103 trip one constraint each; 97*101 would trip two but
    # only the FIRST tags; everything else lands CLEAN.  Disk re-read
    # must reconcile: clean + quarantined == input.
    base = datetime.datetime(2024, 1, 1)
    keys = [1, 2, 97, 101, 103, 97 * 101]
    rows = [(k, 5, "O", 100.0, base, "1-URGENT") for k in keys]
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    out = {
        r["disposition"]: r["n"]
        for r in eng.queries()["sink_quarantine"](spark, str(tmp_path)).collect()
    }
    assert out["CLEAN"] == 2
    assert out["nonpositive_price"] == 2  # 97 and 97*101 (first rule wins)
    assert out["unknown_status"] == 1 and out["null_custkey"] == 1
    assert sum(out.values()) == len(keys)


def test_pack_utilization_reconciles_with_packer(spark, tmp_path):
    # Utilization must reconcile: Σ fill_tokens == Σ doc tokens; every
    # fill > 512 pack must flag straddles_next OR be the boundary case
    # where its last doc ends exactly at a later boundary; pack ids are
    # contiguous from 0.
    rows = [(i, " ".join(f"w{j}" for j in range(100 + 50 * (i % 3))), "en", "s", 1)
            for i in range(30)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = sorted(
        eng.queries()["llm_pack_utilization"](spark, str(tmp_path)).collect(),
        key=lambda r: r["pack_id"],
    )
    total = sum(100 + 50 * (i % 3) for i in range(30))
    assert sum(r["fill_tokens"] for r in out) == total
    assert [r["pack_id"] for r in out] == list(range(len(out)))
    for r in out:
        assert abs(r["utilization"] - math.floor(r["fill_tokens"] / 512 * 1e6 + 0.5) / 1e6) < 1e-9
        if r["fill_tokens"] > 512:
            # docs in pack p start at cum >= p*512, so fill > 512 strictly
            # implies the pack's last doc crosses the next boundary
            assert r["straddles_next"]


def test_curriculum_order_phases_partition(spark, tmp_path):
    # 9 docs with three distinct difficulties (token lengths 2/4/8 chars):
    # terciles split them 3/3/3 into easy/medium/hard by construction.
    mk = lambda ch, n: " ".join(ch * n for _ in range(10))  # noqa: E731
    rows = []
    for i in range(3):
        rows.append((i, mk("a", 2), "en", "s", 1))
        rows.append((10 + i, mk("b", 4), "en", "s", 1))
        rows.append((20 + i, mk("c", 8), "en", "s", 1))
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {
        r["phase"]: r
        for r in eng.queries()["llm_curriculum_order"](spark, str(tmp_path)).collect()
    }
    assert set(out) == {"easy", "medium", "hard"}
    assert all(r["n_docs"] == 3 for r in out.values())
    assert out["easy"]["max_diff_q"] < out["medium"]["min_diff_q"]
    assert out["medium"]["max_diff_q"] < out["hard"]["min_diff_q"]


def test_drawdown_hand_computed(spark, tmp_path):
    # Daily values 10, 20, -15, -10, 30: cumulative 10,30,15,5,35 ->
    # running peak 10,30,30,30,35 -> drawdowns 0,0,15,25,0: max 25 at
    # day 4 (the trough).
    base = datetime.datetime(2024, 1, 1, 12)
    vals = [10.0, 20.0, -15.0, -10.0, 30.0]
    rows = [(i, base + datetime.timedelta(days=i), 1, "a", v, "{}")
            for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["ts_drawdown"](spark, str(tmp_path)).collect()[0]
    assert r["max_drawdown"] == 25.0
    assert r["trough_day"] == "2024-01-04"


def test_pythagorean_means_ordering_and_hand_case(spark, tmp_path):
    # values 1, 4: AM = 2.5, GM = 2, HM = 1.6 — and AM >= GM >= HM.
    base = datetime.datetime(2024, 3, 1)
    rows = [(0, base, 1, "a", 1.0, "{}"), (1, base, 1, "a", 4.0, "{}")]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_pythagorean_means"](spark, str(tmp_path)).collect()[0]
    assert r["mean_arith"] == 2.5
    assert abs(r["mean_geom"] - 2.0) < 1e-5
    assert abs(r["mean_harm"] - 1.6) < 1e-5
    assert r["mean_arith"] >= r["mean_geom"] >= r["mean_harm"]


def test_threshold_sweep_monotone(spark, tmp_path):
    # Counts must be monotone NON-INCREASING in tau, all five grid rows
    # present even when a tau matches nothing, and the removal bound
    # never exceeds the endpoint count.
    rows = [(i, f"doc {i} common shingle text", "en", "s", 24) for i in range(60)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {
        r["tau"]: r
        for r in eng.queries()["llm_dedup_threshold_sweep"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {0.5, 0.6, 0.7, 0.8, 0.9}
    taus = sorted(out)
    pairs = [out[t]["n_pairs"] for t in taus]
    assert pairs == sorted(pairs, reverse=True)
    for r in out.values():
        assert r["n_removed_bound"] <= r["n_endpoint_ids"]
        assert (r["n_pairs"] == 0) == (r["n_removed_bound"] == 0)


def test_multimodal_dedup_reingest_groups(spark, tmp_path):
    # 20 unique payloads; every 10th re-ingested -> exactly the two
    # re-uploaded payloads form groups of 2; keeper is the original id;
    # reclaimed bytes = payload size.
    rows = [(i, f"payload body {i:03d} xyz", "en", "s", 20) for i in range(20)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = sorted(
        eng.queries()["llm_multimodal_dedup"](spark, str(tmp_path)).collect(),
        key=lambda r: r["keeper"],
    )
    assert [r["keeper"] for r in out] == [0, 10]
    for r in out:
        assert r["n_copies"] == 2
        assert r["bytes_reclaimed"] == r["n_bytes"]
        assert r["n_bytes"] == len(f"payload body {r['keeper']:03d} xyz")


def test_json_schema_profile_coverage(spark, tmp_path):
    # event_ids 0..29: 'k' everywhere (number), 'ua' on multiples of 3
    # (string), 'lat' on multiples of 5 (number), 'tags' on multiples of
    # 7 (array) — exact coverages 1.0, 10/30, 6/30, 5/30.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "a", 1.0, "{}") for i in range(30)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        (r["key"], r["vtype"]): r
        for r in eng.queries()["profile_json_schema"](spark, str(tmp_path)).collect()
    }
    assert out[("k", "number")]["n_present"] == 30
    assert out[("k", "number")]["coverage"] == 1.0
    assert out[("ua", "string")]["n_present"] == 10
    assert out[("lat", "number")]["n_present"] == 6
    assert out[("tags", "array")]["n_present"] == 5
    assert out[("tags", "array")]["n_distinct"] == 1  # constant array value
    assert out[("ua", "string")]["n_distinct"] == 7   # m-0..m-6


def test_new_vs_returning_hand_computed(spark, tmp_path):
    # Day1: users 1,2 (both new).  Day2: users 1 (returning), 3 (new).
    # Day3: user 3 only (returning).  Cumulative: 2, 3, 3.
    base = datetime.datetime(2024, 1, 1, 8)
    d = lambda k: base + datetime.timedelta(days=k)  # noqa: E731
    rows = [(0, d(0), 1, "a", 1.0, "{}"), (1, d(0), 2, "a", 1.0, "{}"),
            (2, d(1), 1, "a", 1.0, "{}"), (3, d(1), 3, "a", 1.0, "{}"),
            (4, d(2), 3, "a", 1.0, "{}"), (5, d(2), 3, "b", 1.0, "{}")]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(
        eng.queries()["ts_new_vs_returning"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert [(r["n_active"], r["n_new"], r["n_returning"], r["cumulative_users"])
            for r in out] == [(2, 2, 0, 2), (2, 1, 1, 3), (1, 0, 1, 3)]


def test_period_growth_hand_computed(spark, tmp_path):
    # Two full ISO weeks of one-event days (Mon-Sun): week totals 7*10
    # and 7*20 -> WoW growth exactly 1.0; trailing_4w accumulates both.
    start = datetime.date(2024, 1, 1)      # a Monday
    assert start.isoweekday() == 1
    rows = []
    for k in range(14):
        v = 10.0 if k < 7 else 20.0
        rows.append((k, datetime.datetime.combine(
            start + datetime.timedelta(days=k), datetime.time(9)), 1, "a", v, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(
        eng.queries()["ts_period_growth"](spark, str(tmp_path)).collect(),
        key=lambda r: r["week_start"],
    )
    assert [r["week_total"] for r in out] == [70.0, 140.0]
    assert out[0]["wow_growth"] is None
    assert out[1]["wow_growth"] == 1.0
    assert out[1]["trailing_4w"] == 210.0


def test_cohort_ltv_hand_computed(spark, tmp_path):
    # User 1 signs up week 0 (value 10), active again week 2 (value 5).
    # User 2 signs up week 1 (value 7).  Matrix: cohort0 has ages 0 and 2
    # (cumulative 10 -> 15); cohort1 has age 0 only.
    w0 = datetime.date(2024, 1, 1)  # Monday
    mk = lambda wk, dow: datetime.datetime.combine(  # noqa: E731
        w0 + datetime.timedelta(weeks=wk, days=dow), datetime.time(10))
    rows = [(0, mk(0, 2), 1, "a", 10.0, "{}"),
            (1, mk(2, 4), 1, "a", 5.0, "{}"),
            (2, mk(1, 0), 2, "a", 7.0, "{}")]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {
        (r["cohort_week"], r["age_weeks"]): r
        for r in eng.queries()["ts_cohort_ltv"](spark, str(tmp_path)).collect()
    }
    c0, c1 = "2024-01-01", "2024-01-08"
    assert out[(c0, 0)]["week_value"] == 10.0
    assert out[(c0, 0)]["cumulative_value"] == 10.0
    assert out[(c0, 2)]["week_value"] == 5.0
    assert out[(c0, 2)]["cumulative_value"] == 15.0
    assert out[(c1, 0)]["week_value"] == 7.0 and out[(c1, 0)]["n_users"] == 1


def test_price_index_hand_computed(spark, tmp_path):
    # Two parts, two months.  Base (Jan): p=10 q=2 (part 1), p=20 q=1
    # (part 2) -> den = 10*2 + 20*1 = 40.  Feb: part 1 at 15, part 2 at
    # 18 -> num = 15*2 + 18*1 = 48 -> index 1.2; Jan indexes to 1.0.
    jan = datetime.datetime(1994, 1, 10)
    feb = datetime.datetime(1994, 2, 10)
    rows = [
        (1, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O", jan),
        (1, 2, 1, 2, 1.0, 20.0, 0.0, 0.0, "N", "O", jan),
        (2, 1, 1, 1, 2.0, 30.0, 0.0, 0.0, "N", "O", feb),
        (2, 2, 1, 2, 1.0, 18.0, 0.0, 0.0, "N", "O", feb),
    ]
    schema = ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
              " l_linenumber int, l_quantity double, l_extendedprice double,"
              " l_discount double, l_tax double, l_returnflag string,"
              " l_linestatus string, l_shipdate timestamp")
    _write(spark, tmp_path, "lineitem", rows, schema)
    out = {
        r["month"]: r
        for r in eng.queries()["agg_price_index"](spark, str(tmp_path)).collect()
    }
    assert out["1994-01-01"]["laspeyres_index"] == 1.0
    assert out["1994-01-01"]["n_common"] == 2
    assert out["1994-02-01"]["laspeyres_index"] == 1.2


def test_theil_decomposition_identity(spark, tmp_path):
    # Two groups with different means and internal spreads: the
    # decomposition identity must close to ~0 (quantization residue
    # only), all parts non-negative, and total > between (within > 0).
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "lo", v, "{}") for i, v in enumerate([1.0, 2.0, 3.0])] + [
        (10 + i, base, 1, "hi", v, "{}") for i, v in enumerate([10.0, 20.0, 60.0])
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_theil_decomposition"](spark, str(tmp_path)).collect()[0]
    assert abs(r["identity_gap"]) < 1e-5
    assert r["theil_within"] > 0 and r["theil_between"] > 0
    assert abs(r["theil_total"] - (r["theil_within"] + r["theil_between"])) < 1e-5


def test_theil_decomposition_single_group_no_between(spark, tmp_path):
    # One group: between-component must be ~0 and total == within.
    base = datetime.datetime(2024, 3, 1)
    rows = [(i, base, 1, "a", v, "{}") for i, v in enumerate([1.0, 2.0, 9.0])]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    r = eng.queries()["agg_theil_decomposition"](spark, str(tmp_path)).collect()[0]
    assert abs(r["theil_between"]) < 1e-6
    assert abs(r["theil_total"] - r["theil_within"]) < 1e-5


def test_backtest_cv_perfect_linear_zero_mae(spark, tmp_path):
    # A perfectly linear daily series: every cutoff's OLS fit forecasts
    # the next week exactly -> MAE 0 at every cutoff with test days.
    base = datetime.datetime(2024, 1, 1, 12)
    rows = [(i, base + datetime.timedelta(days=i), 1, "a", 10.0 + 2.0 * i, "{}")
            for i in range(21)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["ts_backtest_cv"](spark, str(tmp_path)).collect()
    assert out, "no cutoffs scored"
    for r in out:
        assert 1 <= r["n_test_days"] <= 7
        assert r["mae"] == 0.0


def test_backtest_cv_step_change_has_error(spark, tmp_path):
    # A step change after day 13 breaks the linear fit: at least one
    # cutoff whose test window covers the step must show positive MAE.
    base = datetime.datetime(2024, 1, 1, 12)
    rows = [(i, base + datetime.timedelta(days=i), 1, "a",
             10.0 if i < 14 else 100.0, "{}") for i in range(21)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = eng.queries()["ts_backtest_cv"](spark, str(tmp_path)).collect()
    assert any(r["mae"] > 10.0 for r in out)


def test_simpson_diversity_hand_computed(spark, tmp_path):
    # Four equal cells of 10 -> lambda = 4*(10/40)^2 = 0.25,
    # diversity 0.75, effective categories 4.0.
    rows = [(i, "t", "en" if i % 2 else "fr", "s0" if i % 4 < 2 else "s1", 1)
            for i in range(40)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    r = eng.queries()["agg_simpson_diversity"](spark, str(tmp_path)).collect()[0]
    assert (r["n"], r["n_cells"]) == (40, 4)
    assert r["simpson_lambda"] == 0.25
    assert r["simpson_diversity"] == 0.75
    assert r["effective_categories"] == 4.0


def test_bitpack_roundtrip_hand_computed(spark, tmp_path):
    # orderkey 1000: lanes from exact integer floor division; the packed
    # word reconstructs each probed lane and roundtrip_ok holds.
    base = datetime.datetime(2024, 1, 1)
    rows = [(1000, 5, "O", 1.0, base, "1-URGENT")]
    _write(spark, tmp_path, "orders", rows, _ORD_SCHEMA)
    r = eng.queries()["fn_bitpack_roundtrip"](spark, str(tmp_path)).collect()[0]
    l = [1000 % 256] + [(1000 // p) % 256 for p in (7, 11, 13, 17, 19, 23)] + [
        (1000 // 29) % 128
    ]
    word = sum(v << (8 * i) for i, v in enumerate(l))
    assert r["word"] == word
    assert r["u0"] == l[0] and r["u4"] == l[4] and r["u7"] == l[7]
    assert r["roundtrip_ok"]


def test_suffix_dedup_maximal_spans(spark, tmp_path):
    # K=8.  Docs 1 and 2 share a 10-token block S -> 3 duplicated windows
    # each, merging into ONE maximal span covering exactly S.  Doc 3 is the
    # same 8-token block twice (within-doc repeat, the suffix-array
    # definition llm_span_dedup's cross-doc count misses): hits at pos 1
    # and 9, gap == K, so the islands MERGE into one 16-token span.  Doc 4
    # is all-unique and must be absent.
    s = " ".join(f"s{i}" for i in range(10))
    a = " ".join(f"a{i}" for i in range(8))
    rows = [
        (1, " ".join(f"x{i}" for i in range(5)) + f" {s} " + " ".join(f"y{i}" for i in range(5)), "en", "s", 100),
        (2, " ".join(f"z{i}" for i in range(3)) + f" {s} " + " ".join(f"w{i}" for i in range(7)), "en", "s", 100),
        (3, f"{a} {a}", "en", "s", 100),
        (4, " ".join(f"u{i}" for i in range(20)), "en", "s", 100),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
        for r in eng.queries()["llm_suffix_dedup"](spark, str(tmp_path)).collect()
    }
    assert out == {(1, 6, 15, 10), (2, 4, 13, 10), (3, 1, 16, 16)}


def test_semdedup_within_cluster_prune(spark, tmp_path):
    # 8 far-apart basis vectors (ids 0-7, the deterministic k-means init)
    # plus id 8 = a 0.97-cosine perturbation of id 0 (below tau=0.99, must
    # be KEPT).  The operator's own augmentation copies ids < 100, so each
    # cluster holds {original, exact copy}: the copy ties the original on
    # centroid distance, loses the vec_id tie-break, and is dropped with
    # dup_of = the original.  Cluster 0 = {0, 8, copies}: 8 survives the
    # prune (cos 0.97 < tau), both copies drop onto their exact twins.
    dim = 8
    def basis(k, scale=1000.0):
        v = [0.0] * dim; v[k] = scale; return v
    rows = [(k, basis(k), 0) for k in range(8)]
    rows.append((8, [970.0, 241.0] + [0.0] * (dim - 2), 0))  # cos(v0,v8)~0.9705
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = {
        r["vec_id"]: r
        for r in eng.queries()["llm_semdedup"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 18  # 9 originals + 9 copies
    for k in range(9):
        assert out[k]["keep"] and out[k]["dup_of"] is None
        assert not out[1000000 + k]["keep"]
        assert out[1000000 + k]["dup_of"] == k
    # the near-but-below-tau member shares cluster 0 with vec 0 yet is kept
    assert out[8]["cluster"] == out[0]["cluster"]
    assert out[0]["rnk"] == 1  # centroid-nearest of its cluster, always kept


def test_corr_matrix_group_beyond_old_int64_bound(spark, tmp_path):
    # 14e6 rows in ONE group — past the 2^23 group-size bound that the
    # round-8 design aborted on.  The round-9 two-phase accumulation
    # (int64 limbs per task partition, decimal over partials) must return
    # the exact answer instead; price = 2*qty + 1 -> corr exactly +1,
    # tax = -qty -> exactly -1.  Verified against the DuckDB HUGEINT
    # oracle on the same fixture (both engines, full row compare).
    from pyspark.sql import functions as F

    # qty alternates (2^20-1)/1e6 and (2^19-1)/1e6: max-lo-limb values with
    # LARGE variance (a tiny alternation cancels catastrophically in the
    # final double conversion and the true corr stops being +-1).  Average
    # ll product ~6.9e11; at 14e6 rows the single-phase int64 ll sum would
    # sit at ~9.6e18 > 2^63-1.
    n = 14_000_000
    qty = F.lit(0.524287) + (F.col("id") % 2) * 0.524288
    df = spark.range(n).select(
        F.lit("A").alias("l_returnflag"),
        qty.alias("l_quantity"),
        (qty * 2 + 1.0).alias("l_extendedprice"),
        F.lit(0.05).alias("l_discount"),
        (-qty).alias("l_tax"),
    )
    df.repartition(8).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    # constant-ish columns compress so well that one task would read every
    # row (the loud per-partition guard would fire, correctly); bound the
    # task size the way a production job would
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2m")
    try:
        rows = eng.queries()["agg_corr_matrix"](spark, str(tmp_path)).collect()
        out = {(r["var_a"], r["var_b"]): r for r in rows}
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    # both engines: the DuckDB HUGEINT oracle on the same fixture
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM read_parquet("
        f"'{tmp_path}/lineitem.parquet/*.parquet')"
    )
    orows = con.execute(eng.oracle_sql()["agg_corr_matrix"]).fetchall()
    con.close()
    spark_tuples = sorted(
        (r["l_returnflag"], r["var_a"], r["var_b"], r["n_rows"], r["corr"])
        for r in rows
    )
    assert spark_tuples == sorted(orows)
    assert out[("qty", "price")]["corr"] == 1.0
    assert out[("qty", "tax")]["corr"] == -1.0
    assert out[("qty", "disc")]["corr"] is None
    assert all(r["n_rows"] == n for r in out.values())


def test_bloom_dedup_invariants_and_engineered_fp(spark, tmp_path):
    # Bloom invariant: a true member can NEVER be missed (every copy-probe
    # flags); false positives CAN occur and are engineered here: filler
    # docs are scanned (same md5 index math as the operator) until one's
    # first-word-stripped variant lands on 3 already-covered bits.
    import hashlib

    M, K = 32768, 3

    def bits(text: str) -> set:
        h = hashlib.md5(text.lower().strip().encode()).hexdigest()
        return {int(h[j * 8:(j + 1) * 8], 16) % M for j in range(K)}

    texts = [f"w{i} " + " ".join(f"t{i}x{j}" for j in range(6)) for i in range(3000)]
    covered = set()
    for t in texts:
        covered |= bits(t)
    fp_idx = next(
        i for i, t in enumerate(texts)
        if bits(t.split(" ", 1)[1]) <= covered
    )
    rows = [(i, t, "en", "fp" if i == fp_idx else "s", len(t))
            for i, t in enumerate(texts)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {r["source"]: r for r in
           eng.queries()["llm_bloom_dedup"](spark, str(tmp_path)).collect()}
    for r in out.values():  # no false negatives, ever
        assert r["n_flagged"] >= r["n_members"]
    assert out["fp"]["n_false_pos"] >= 1  # the engineered collision flags
    # members: copies of docs < 100 are exact members and must all flag
    total_members = sum(r["n_members"] for r in out.values())
    assert total_members == 100


def test_cuped_perfect_covariate(spark, tmp_path):
    # post = 2*pre + 10 for every user: theta must be exactly 2, rho2
    # exactly 1, and the adjusted means of both arms collapse to the same
    # value (all within-arm variance explained by the covariate).
    base = datetime.datetime(2024, 1, 2)
    post_day = datetime.datetime(2024, 1, 20)
    rows = []
    eid = 0
    for u in range(10):
        pre = float(u + 1)
        rows.append((eid, base, u, "m", pre, "{}")); eid += 1
        rows.append((eid, post_day, u, "m", 2 * pre + 10.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["arm"]: r for r in
           eng.queries()["agg_cuped"](spark, str(tmp_path)).collect()}
    assert out[0]["theta"] == 2.0 and out[1]["theta"] == 2.0
    assert out[0]["rho2"] == 1.0 and out[1]["rho2"] == 1.0
    assert out[0]["mean_adj"] == out[1]["mean_adj"]
    assert out[0]["n_users"] == 5 and out[1]["n_users"] == 5


def test_corpus_overlap_sketch_exact_when_under_k(spark, tmp_path):
    # When every source's distinct-shingle set fits inside K, the sketch
    # IS the set and the estimate must equal the exact Jaccard.  Sources
    # a/b share a block; source c is disjoint from both.
    shared = " ".join(f"s{i}" for i in range(8))
    rows = [
        (1, shared + " " + " ".join(f"a{i}" for i in range(4)), "en", "a", 1),
        (2, shared + " " + " ".join(f"b{i}" for i in range(4)), "en", "b", 1),
        (3, " ".join(f"c{i}" for i in range(12)), "en", "c", 1),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {(r["source_a"], r["source_b"]): r for r in
           eng.queries()["llm_corpus_overlap_sketch"](spark, str(tmp_path)).collect()}
    assert len(out) == 3
    ab = out[("a", "b")]
    assert ab["est_jaccard"] == ab["exact_jaccard"] > 0
    for pair in (("a", "c"), ("b", "c")):
        assert out[pair]["est_jaccard"] == 0.0 == out[pair]["exact_jaccard"]


def test_join_dpp_prunes_to_target_years(spark, tmp_path):
    # Orders across 1993-1998; only the dim-selected 1995/1996 survive,
    # and the revenue aggregate is exact per (year, status).
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i, (y, st, price) in enumerate([
        (1993, "O", 10.0), (1995, "O", 20.0), (1995, "F", 30.0),
        (1996, "F", 40.0), (1996, "F", 50.0), (1998, "O", 60.0),
    ]):
        rows.append((i, st, price, datetime.datetime(y, 6, 1)))
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderstatus string, o_totalprice double, "
           "o_orderdate timestamp")
    out = {(r["order_year"], r["o_orderstatus"]): (r["n"], r["revenue"]) for r in
           eng.queries()["join_dpp"](spark, str(tmp_path)).collect()}
    assert out == {
        (1995, "O"): (1, 20.0), (1995, "F"): (1, 30.0), (1996, "F"): (2, 90.0),
    }


def test_deepwalk_matches_pure_python_rederivation(spark, tmp_path):
    # Third-engine check on a known K3 pair graph (three identical docs):
    # replicate the deterministic walk choice md5(f"{w}:{s}:{node}:{next}")
    # and the window-2 skip-gram pairing in pure Python and require the
    # operator's co-occurrence counts to equal it exactly.
    import hashlib
    from collections import Counter

    rows = [(i, "alpha beta gamma", "en", "s", 16) for i in (1, 2, 3)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)

    edges = {(1, 2), (1, 3), (2, 3)}
    nbrs = {n: sorted({b for a, b in edges if a == n} |
                      {a for a, b in edges if b == n}) for n in (1, 2, 3)}

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    expected = Counter()
    for start in (1, 2, 3):
        for w in range(2):
            walk = [start]
            node = start
            for s in range(1, 4):
                node = min(nbrs[node], key=lambda b: (md5(f"{w}:{s}:{node}:{b}"), b))
                walk.append(node)
            for i in range(len(walk)):
                for j in range(i + 1, min(i + 2, len(walk) - 1) + 1):
                    if walk[i] != walk[j]:
                        expected[(min(walk[i], walk[j]), max(walk[i], walk[j]))] += 1
    out = Counter({
        (r["node_a"], r["node_b"]): r["n_cooccur"]
        for r in eng.queries()["graph_deepwalk_pairs"](spark, str(tmp_path)).collect()
    })
    assert out == expected and sum(expected.values()) > 0


def test_bradley_terry_strict_dominance(spark, tmp_path):
    # Source x's docs are always longest, z's always shortest: x beats
    # everyone, z loses everything.  Fitted strengths must be strictly
    # ordered x > y > z with exact win/match counts; the Laplace
    # smoothing keeps winless z's strength positive.
    rows = []
    for i in range(4):
        rows.append((i, "a" * 100, "en", "x", 100))
        rows.append((10 + i, "b" * 50, "en", "y", 50))
        rows.append((20 + i, "c" * 10, "en", "z", 10))
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {r["source"]: r for r in
           eng.queries()["llm_bradley_terry"](spark, str(tmp_path)).collect()}
    assert (out["x"]["wins"], out["y"]["wins"], out["z"]["wins"]) == (8, 4, 0)
    assert all(r["n_matches"] == 8 for r in out.values())
    assert (out["x"]["rank"], out["y"]["rank"], out["z"]["rank"]) == (1, 2, 3)
    assert out["x"]["strength"] > out["y"]["strength"] > out["z"]["strength"] > 0


def test_bradley_terry_page_cap_fallback_matches(spark, tmp_path, monkeypatch):
    # The per-pass strength-vector collect is capped (ADVICE r13); force
    # the cap to 0 so the MM loop takes the distributed localCheckpoint
    # fallback, and pin that both paths emit the identical leaderboard.
    import nedp_etl_spark.llm.ranking as rk

    rows = []
    for i in range(4):
        rows.append((i, "a" * 100, "en", "x", 100))
        rows.append((10 + i, "b" * 50, "en", "y", 50))
        rows.append((20 + i, "c" * 10, "en", "z", 10))
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    fast = sorted(map(tuple, eng.queries()["llm_bradley_terry"](
        spark, str(tmp_path)).collect()))
    monkeypatch.setattr(rk, "_BT_PAGE_CAP", 0)
    slow = sorted(map(tuple, eng.queries()["llm_bradley_terry"](
        spark, str(tmp_path)).collect()))
    assert fast == slow


def test_msprt_planted_shift_detects_and_p_monotone(spark, tmp_path):
    # Arms identical for days 1-10, then a large persistent shift in the
    # treatment arm: the always-valid p must be monotone nonincreasing by
    # construction, stay high through the null days, and cross 0.05 after
    # the shift.  Null arms use IDENTICAL values so delta is exactly 0.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows, eid = [], 0
    for day in range(30):
        ts = base + datetime.timedelta(days=day)
        for k in range(6):
            v = float(10 + (k % 3))
            shift = 50.0 if day >= 10 else 0.0
            rows.append((eid, ts, 2 * k, "m", v, "{}")); eid += 1        # control
            rows.append((eid, ts, 2 * k + 1, "m", v + shift, "{}")); eid += 1  # treat
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(
        eng.queries()["agg_msprt"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    ps = [r["always_valid_p"] for r in out]
    assert all(a >= b for a, b in zip(ps, ps[1:]))  # monotone nonincreasing
    assert out[5]["delta"] == 0.0 and ps[5] == 1.0  # exact null pre-shift
    assert ps[-1] <= 0.05  # the shift is detected
    # cumulative delta by day 30: 20 of 30 treatment days carry the +50
    assert abs(out[-1]["delta"] - 50.0 * 20 / 30) < 1e-6


def test_vacuum_removes_only_unreferenced_files(spark, tmp_path):
    # After vacuum: the planted orphans are gone from disk, every
    # manifest-referenced file survives, and both time-travel reads stay
    # intact (v1 strictly pre-cut, v2 the full book).
    import glob
    import json
    import os

    rows = [
        (1, "O", 10.0, datetime.datetime(1996, 3, 1)),
        (2, "F", 20.0, datetime.datetime(1997, 5, 1)),
        (3, "F", 30.0, datetime.datetime(1998, 7, 1)),
    ]
    _write(spark, tmp_path, "orders", rows,
           "o_orderkey bigint, o_orderstatus string, o_totalprice double, "
           "o_orderdate timestamp")
    out = eng.queries()["sink_vacuum"](spark, str(tmp_path)).collect()[0]
    assert out["n_orders"] == 3 and out["n_orphans_removed"] == 2
    from nedp_etl_spark.operators.scans import _read_at_version, _scratch
    root = _scratch("sink_time_travel", str(tmp_path))
    with open(os.path.join(root, "v2.json")) as fh:
        referenced = set(json.load(fh)["files"])
    on_disk = {f for c in ("commit1", "commit2")
               for f in glob.glob(os.path.join(root, c, "*.parquet"))}
    assert on_disk == referenced  # nothing unreferenced survives
    assert all(os.path.exists(f) for f in referenced)
    assert _read_at_version(spark, root, 1).count() == 1  # pre-1997 only
    assert _read_at_version(spark, root, 2).count() == 3


def test_esd_masking_finds_second_outlier(spark, tmp_path):
    # The masking property one-shot screens lack: a huge outlier (1000)
    # inflates round-1 std enough that 100 looks ordinary; after removing
    # 1000, round 2 must surface 100.  Baseline days are flat 10s.
    base = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows, eid = [], 0
    for day in range(20):
        v = 10.0 + (day % 3) * 0.5  # mild baseline variation: zero-variance
        if day == 5:                # remainders would (correctly) end ESD early
            v = 1000.0
        elif day == 12:
            v = 100.0
        rows.append((eid, base + datetime.timedelta(days=day), 1, "a", v, "{}"))
        eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = sorted(
        eng.queries()["ts_esd_anomaly"](spark, str(tmp_path)).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in out] == [1, 2, 3]
    assert out[0]["v"] == 1000.0 and out[0]["flagged"]   # round 1: the giant
    assert out[1]["v"] == 100.0 and out[1]["flagged"]    # round 2: unmasked
    assert out[2]["v"] in (10.0, 10.5, 11.0) and not out[2]["flagged"]  # ordinary


def test_shapley_attribution_hand_computed(spark, tmp_path):
    # Paths: u1={A}->conv, u2={B}->no, u3={A,B}->conv.  v(∅)=0, v(A)=1,
    # v(B)=0, v(AB)=2/3.  phi_A = (1 + 2/3)/2 = 5/6; phi_B = (0 - 1/3)/2
    # = -1/6 (negative credit — B's presence only dilutes).  Efficiency:
    # phi_A + phi_B = v(full) = 2/3.  A channel touched AFTER the first
    # purchase must not enter the path (u1's post-purchase B touch).
    t = lambda m: datetime.datetime(2024, 1, 1, 10, m)  # noqa: E731
    rows = [
        (0, t(0), 1, "a", 1.0, "{}"),
        (1, t(5), 1, "purchase", 1.0, "{}"),
        (2, t(9), 1, "b", 1.0, "{}"),        # post-purchase: outside window
        (3, t(0), 2, "b", 1.0, "{}"),
        (4, t(0), 3, "a", 1.0, "{}"),
        (5, t(1), 3, "b", 1.0, "{}"),
        (6, t(5), 3, "purchase", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["channel"]: r for r in
           eng.queries()["agg_shapley_attribution"](spark, str(tmp_path)).collect()}
    assert out["a"]["shapley"] == 0.833333
    assert out["b"]["shapley"] == -0.166667
    assert out["a"]["n_exposed"] == 2 and out["a"]["conv_rate_exposed"] == 1.0
    assert out["b"]["n_exposed"] == 2 and out["b"]["conv_rate_exposed"] == 0.5


def test_anova_f_hand_computed_three_groups(spark, tmp_path):
    # Groups a=[1,2,3], b=[2,4,6], c=[5,5]: grand mean 3.5, SSB = 12.0,
    # SSW = 10.0 exactly -> F = (12/2)/(10/5) = 3.0, eta^2 = 12/22.
    t = datetime.datetime(2024, 1, 1, 10, 0)
    vals = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 2.0), ("b", 4.0),
            ("b", 6.0), ("c", 5.0), ("c", 5.0)]
    rows = [(i, t, i, g, v, "{}") for i, (g, v) in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_anova_f"](spark, str(tmp_path)).collect()
    assert (r["k_groups"], r["n_total"]) == (3, 8)
    assert r["ss_between"] == 12.0 and r["ss_within"] == 10.0
    assert r["f_stat"] == 3.0
    assert r["eta_sq"] == 0.545455


def test_anova_f_zero_within_variance_yields_null_f(spark, tmp_path):
    # Constant values inside every group: SSW = 0 -> F undefined (NULL),
    # eta^2 = 1 when between-group spread exists.
    t = datetime.datetime(2024, 1, 1, 10, 0)
    vals = [("a", 2.0), ("a", 2.0), ("b", 7.0), ("b", 7.0)]
    rows = [(i, t, i, g, v, "{}") for i, (g, v) in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_anova_f"](spark, str(tmp_path)).collect()
    assert r["f_stat"] is None
    assert r["ss_within"] == 0.0 and r["eta_sq"] == 1.0


def test_k_anonymity_suppression_boundaries(spark, tmp_path):
    # Class (en, bucket 0, 5 docs across 2 sources): k-anonymous AND
    # l-diverse -> keep.  Class (fr, bucket 0, 4 docs): k < 5 -> suppress.
    # Class (de, bucket 1, 5 docs all one source): l < 2 -> suppress even
    # though k holds.
    rows = []
    i = 0
    for src in ["s1", "s1", "s1", "s2", "s2"]:
        rows.append((i, "x", "en", src, 10)); i += 1
    for src in ["s1", "s2", "s1", "s2"]:
        rows.append((i, "x", "fr", src, 10)); i += 1
    for _ in range(5):
        rows.append((i, "x", "de", "s1", 300)); i += 1
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {(r["lang"], r["size_bucket"]): r for r in
           eng.queries()["llm_k_anonymity"](spark, str(tmp_path)).collect()}
    assert len(out) == 3
    en = out[("en", 0)]
    assert (en["class_size"], en["l_distinct"]) == (5, 2)
    assert en["k_anonymous"] and en["l_diverse"] and not en["suppress"]
    assert out[("fr", 0)]["suppress"] and not out[("fr", 0)]["k_anonymous"]
    de = out[("de", 1)]
    assert de["suppress"] and de["k_anonymous"] and not de["l_diverse"]


def test_mann_kendall_monotone_and_tied_series(spark, tmp_path):
    # "up": one event/day, values 1..5 -> S = C(5,2) = 10, no ties,
    # Var(S) = 5*4*15/18 = 16.666667, Z = 9/sqrt(50/3) = 2.204541 > 1.96
    # -> increasing; Sen slope exactly 1.0/day.  "flat": all values equal
    # -> S = 0 and the tie term cancels Var(S) to 0 -> Z NULL, 'no trend'.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i in range(5):
        rows.append((i, base + datetime.timedelta(days=i), i, "up",
                     float(i + 1), "{}"))
        rows.append((10 + i, base + datetime.timedelta(days=i), i, "flat",
                     7.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_mann_kendall"](spark, str(tmp_path)).collect()}
    up = out["up"]
    assert (up["n_days"], up["s_stat"]) == (5, 10)
    assert up["var_s"] == 16.666667
    assert up["z_stat"] == 2.204541
    assert up["sen_slope"] == 1.0
    assert up["trend"] == "increasing"
    flat = out["flat"]
    assert flat["s_stat"] == 0 and flat["var_s"] == 0.0
    assert flat["z_stat"] is None and flat["trend"] == "no trend"


def test_spearman_rho_hand_computed_with_ties_and_constants(spark, tmp_path):
    # qty = 1..5, price = [2,1,4,3,5] -> Spearman = 1 - 6*4/120 = 0.8;
    # tax = reversed qty -> exactly -1; disc constant -> zero rank
    # variance -> NULL for every pair involving it.
    t = datetime.datetime(1994, 1, 10)
    qty = [1.0, 2.0, 3.0, 4.0, 5.0]
    price = [2.0, 1.0, 4.0, 3.0, 5.0]
    rows = [
        (i, 1, 1, i, qty[i], price[i], 0.05, 6.0 - qty[i], "N", "O", t)
        for i in range(5)
    ]
    schema = ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
              " l_linenumber int, l_quantity double, l_extendedprice double,"
              " l_discount double, l_tax double, l_returnflag string,"
              " l_linestatus string, l_shipdate timestamp")
    _write(spark, tmp_path, "lineitem", rows, schema)
    out = {(r["var_a"], r["var_b"]): r for r in
           eng.queries()["agg_spearman_rho"](spark, str(tmp_path)).collect()}
    assert len(out) == 6 and all(r["n_rows"] == 5 for r in out.values())
    assert out[("qty", "price")]["rho"] == 0.8
    assert out[("qty", "tax")]["rho"] == -1.0
    assert out[("price", "tax")]["rho"] == -0.8
    assert out[("qty", "disc")]["rho"] is None
    assert out[("price", "disc")]["rho"] is None
    assert out[("disc", "tax")]["rho"] is None


def test_spearman_rho_page_cap_fallback_matches(spark, tmp_path, monkeypatch):
    # The bounded-vocabulary driver-page rank maps are an optimization with
    # a declared cap; force the cap to 1 so EVERY variable takes the
    # distributed prefix-sum path, and pin that both paths produce the
    # identical result on the same rows (same fixture as the ties test).
    import nedp_etl_spark.operators.analytics as an

    t = datetime.datetime(1994, 1, 10)
    qty = [1.0, 2.0, 3.0, 4.0, 5.0]
    price = [2.0, 1.0, 4.0, 3.0, 5.0]
    rows = [
        (i, 1, 1, i, qty[i], price[i], 0.05, 6.0 - qty[i], "N", "O", t)
        for i in range(5)
    ]
    schema = ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
              " l_linenumber int, l_quantity double, l_extendedprice double,"
              " l_discount double, l_tax double, l_returnflag string,"
              " l_linestatus string, l_shipdate timestamp")
    _write(spark, tmp_path, "lineitem", rows, schema)
    fast = sorted(map(tuple, eng.queries()["agg_spearman_rho"](
        spark, str(tmp_path)).collect()))
    monkeypatch.setattr(an, "_SPEAR_PAGE_CAP", 1)
    slow = sorted(map(tuple, eng.queries()["agg_spearman_rho"](
        spark, str(tmp_path)).collect()))
    assert fast == slow
    assert ("qty", "price", 5, 0.8) in fast


def test_plausible_event_time_keeps_nulls_and_drops_sentinels(spark):
    # The guard's contract: NULL flows through (hardened path), in-window
    # passes, 9999-sentinel and pre-1677 junk are routed out.
    import datetime as dt

    from nedp_etl_spark.data import plausible_event_time

    rows = [
        (1, dt.datetime(2024, 1, 1)),
        (2, None),
        (3, dt.datetime(9999, 12, 31, 23, 59, 59)),
        (4, dt.datetime(1600, 1, 1)),
    ]
    df = spark.createDataFrame(rows, "id int, ts timestamp")
    kept = sorted(r["id"] for r in df.filter(plausible_event_time("ts")).collect())
    assert kept == [1, 2]


def test_gram_partials_skip_null_and_ragged_vectors(spark):
    # The Gram stage's route-out: NULL vectors and wrong-length vectors
    # contribute nothing; n counts only the clean 64-dim rows.
    from nedp_etl_spark.llm.simsearch import _EMBED_DIM, _gram_partials

    rows = [
        (1, [1.0] * _EMBED_DIM, 0),
        (2, None, 0),
        (3, [1.0] * (_EMBED_DIM // 2), 0),
        (4, [2.0] * _EMBED_DIM, 0),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    parts = df.select("embedding").mapInPandas(
        _gram_partials,
        schema="i int, j int, n long, si long, sj long, sij long,"
        " mqi long, mqj long",
    )
    from pyspark.sql import functions as F

    agg = parts.groupBy("i", "j").agg(
        F.sum("n").alias("n"), F.sum("si").alias("si"), F.sum("sij").alias("sij")
    )
    r00 = agg.filter((F.col("i") == 0) & (F.col("j") == 0)).collect()[0]
    # two clean vectors: q = 1000 and 2000 -> si = 3000, sij = 5e6, n = 2
    assert (r00["n"], r00["si"], r00["sij"]) == (2, 3000, 5_000_000)


def test_ljung_box_hand_computed_alternating_series(spark, tmp_path):
    # "alt": days 1..4 values [1,-1,1,-1] -> mean 0, ss = 4; rho_1 = -3/4,
    # rho_2 = 2/4, rho_3 = -1/4.  Q = 4*6*(0.5625/3 + 0.25/2 + 0.0625/1)
    # = 24 * 0.375 = 9.0 > chi2(3)=7.814728 -> reject.  "const": constant
    # series -> ss = 0 -> excluded entirely (statistic undefined).
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i, v in enumerate([1.0, -1.0, 1.0, -1.0]):
        rows.append((i, base + datetime.timedelta(days=i), i, "alt", v, "{}"))
        rows.append((10 + i, base + datetime.timedelta(days=i), i, "const",
                     5.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_ljung_box"](spark, str(tmp_path)).collect()}
    assert set(out) == {"alt"}
    alt = out["alt"]
    assert (alt["n_days"], alt["m_lags"]) == (4, 3)
    assert alt["q_stat"] == 9.0
    assert alt["chi2_crit_95"] == 7.814728
    assert alt["reject_white_noise"] is True


def test_deletion_vectors_positional_not_predicate(spark, tmp_path):
    # The reader applies POSITIONS, not the predicate: corrupt the DV by
    # dropping one entry after layout build — the row whose position was
    # removed must come back, proving the read path consults the DV file
    # rather than re-evaluating o_orderkey % 7.
    import os
    from pyspark.sql import functions as F

    t = datetime.datetime(1995, 3, 1)
    rows = [(k, 1, "O", 100.0 + k, t, "1-URGENT", "c", 0, "x")
            for k in range(1, 30)]
    schema = ("o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
              " o_totalprice double, o_orderdate timestamp,"
              " o_orderpriority string, o_clerk string, o_shippriority int,"
              " o_comment string")
    _write(spark, tmp_path, "orders", rows, schema)
    q = eng.queries()["scan_deletion_vectors"]
    out1 = {r["o_orderkey"] for r in q(spark, str(tmp_path)).collect()}
    assert out1 == {k for k in range(1, 30) if k % 7 != 3}
    # drop the DV entry for key 10 (10 % 7 == 3 -> was deleted)
    import glob as _glob
    from nedp_etl_spark.operators.scans import _scratch as _sc
    dv_dir = os.path.join(_sc("scan_deletion_vectors", str(tmp_path)), "deletes")
    dv = spark.read.parquet(dv_dir)
    base_dir = os.path.join(_sc("scan_deletion_vectors", str(tmp_path)), "base")
    pos10 = (spark.read.parquet(base_dir)
             .select(F.col("o_orderkey"),
                     F.col("_metadata.row_index").alias("pos"),
                     F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
                      .alias("file_name"))
             .filter(F.col("o_orderkey") == 10).collect()[0])
    kept = dv.filter(~((F.col("file_name") == pos10["file_name"])
                       & (F.col("pos") == pos10["pos"])))
    kept.coalesce(1).write.mode("overwrite").parquet(dv_dir + "_tmp")
    for f in _glob.glob(os.path.join(dv_dir, "*")):
        os.remove(f)
    for f in _glob.glob(os.path.join(dv_dir + "_tmp", "*")):
        os.rename(f, os.path.join(dv_dir, os.path.basename(f)))
    out2 = {r["o_orderkey"] for r in q(spark, str(tmp_path)).collect()}
    assert out2 == out1 | {10}


def test_jackknife_ci_hand_computed_ratio(spark, tmp_path):
    # Metric m: day1 two users (values 4, 6), day2 one user (4), day3 one
    # user (6).  R = 20/4 = 5.0; replicates 5.0, 5.333333, 4.666667 ->
    # rbar = 5.0, var = (2/3) * 0.222221777778 -> se = 0.3849 exactly at
    # the q6 ladder; CI = 5 -/+ 1.959964*se = [4.24561, 5.75439].
    base = datetime.datetime(2024, 3, 1, 9, 0)
    rows = [
        (0, base, 1, "m", 4.0, "{}"),
        (1, base, 2, "m", 6.0, "{}"),
        (2, base + datetime.timedelta(days=1), 1, "m", 4.0, "{}"),
        (3, base + datetime.timedelta(days=2), 2, "m", 6.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_jackknife_ci"](spark, str(tmp_path)).collect()
    assert (r["event_type"], r["n_days"]) == ("m", 3)
    assert r["r_hat"] == 5.0
    assert r["jk_se"] == 0.3849
    assert (r["ci_lo"], r["ci_hi"]) == (4.24561, 5.75439)


def test_jackknife_ci_single_day_yields_null(spark, tmp_path):
    # One day only: no leave-one-out replicate has a positive denominator
    # (N - n_1 = 0) -> se and CI NULL, point estimate still reported.
    t = datetime.datetime(2024, 3, 1, 9, 0)
    rows = [(0, t, 1, "m", 8.0, "{}"), (1, t, 2, "m", 2.0, "{}")]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_jackknife_ci"](spark, str(tmp_path)).collect()
    assert r["r_hat"] == 5.0
    assert r["jk_se"] is None and r["ci_lo"] is None and r["ci_hi"] is None


def test_mmr_diversify_prefers_diverse_over_duplicate(spark, tmp_path):
    # Probe [1,0,0,0].  Candidates: v1 and v2 are EXACT duplicates
    # (rel 0.9 each, mutual sim 1.0); v3 has the same relevance 0.9 but
    # points the other way (sim(v3, v1) = 0.62).  Pure relevance ranks
    # [1, 2, 3] (tie on vec_id); MMR must pick v1, then v3 over the
    # duplicate (0.63 - 0.3*0.62 = 0.444 > 0.63 - 0.3*1.0 = 0.33), and
    # v2 last with max_sim 1.0 to the already-selected twin.
    b = 0.4358898943540674  # sqrt(1 - 0.81): unit-norm companions
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, b, 0.0, 0.0], 0),
        (2, [0.9, b, 0.0, 0.0], 0),
        (3, [0.9, -b, 0.0, 0.0], 0),
    ]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = eng.queries()["llm_mmr_diversify"](spark, str(tmp_path)).collect()
    assert [r["vec_id"] for r in out] == [1, 3, 2]  # not the rel order 1,2,3
    assert [r["rank"] for r in out] == [1, 2, 3]
    assert out[0]["max_sim"] == 0.0
    assert out[2]["max_sim"] == 1.0          # the duplicate's penalty
    assert abs(out[1]["max_sim"] - 0.62) < 1e-4
    assert out[1]["mmr_score"] > out[2]["mmr_score"]


def test_raking_ipf_symmetric_converges_exactly(spark, tmp_path):
    # Population 2x2 with margins A=3, B=3, s1=3, s2=3; subsample has one
    # unit per cell.  IPF scales every weight to exactly 1.5 in one pass
    # and stays there — fixed point, pinned exactly.
    rows, i = [], 0
    # (nation, seg, in_sample): pop A-s1 2 (1 sampled), A-s2 1 (1), B-s1 1
    # (1), B-s2 2 (1)
    for nk, seg, bal in [(0, "s1", 10.0), (0, "s1", -5.0), (0, "s2", 10.0),
                         (1, "s1", 10.0), (1, "s2", 10.0), (1, "s2", -5.0)]:
        rows.append((i, f"c{i}", "addr", nk, "p", bal, seg, "x")); i += 1
    schema = ("c_custkey bigint, c_name string, c_address string,"
              " c_nationkey bigint, c_phone string, c_acctbal double,"
              " c_mktsegment string, c_comment string")
    _write(spark, tmp_path, "customer", rows, schema)
    out = {(r["c_nationkey"], r["c_mktsegment"]): r for r in
           eng.queries()["agg_raking_ipf"](spark, str(tmp_path)).collect()}
    assert len(out) == 4
    assert all(r["raked_weight"] == 1.5 for r in out.values())
    assert out[(0, "s1")]["n_sample"] == 1 and out[(0, "s1")]["n_population"] == 2
    # raked SEGMENT margins hit the targets (segment is the final pass):
    s1 = sum(r["raked_weight"] for k, r in out.items() if k[1] == "s1")
    s2 = sum(r["raked_weight"] for k, r in out.items() if k[1] == "s2")
    assert (s1, s2) == (3.0, 3.0)


def test_raking_ipf_empty_slice_keeps_zero_weights(spark, tmp_path):
    # A nation with population but NO sampled unit cannot be raked: its
    # cells keep weight 0 (S=0 guard) instead of dividing by zero, and
    # sampled nations still hit their own margins.
    rows = [
        (0, "c0", "a", 0, "p", 10.0, "s1", "x"),
        (1, "c1", "a", 0, "p", 10.0, "s1", "x"),
        (2, "c2", "a", 1, "p", -3.0, "s1", "x"),  # nation 1: never sampled
    ]
    schema = ("c_custkey bigint, c_name string, c_address string,"
              " c_nationkey bigint, c_phone string, c_acctbal double,"
              " c_mktsegment string, c_comment string")
    _write(spark, tmp_path, "customer", rows, schema)
    out = {(r["c_nationkey"], r["c_mktsegment"]): r for r in
           eng.queries()["agg_raking_ipf"](spark, str(tmp_path)).collect()}
    assert out[(1, "s1")]["raked_weight"] == 0.0
    assert out[(0, "s1")]["raked_weight"] > 0.0


def test_hurst_alternating_is_antipersistent_zero(spark, tmp_path):
    # 32 days of [1,-1,1,-1,...]: every full block at every scale has mean
    # 0, cumulative deviations z in {1,0}, so R = 1 and S = 1 -> R/S = 1
    # at n = 8, 16, 32 -> log-log slope EXACTLY 0 (perfectly
    # anti-persistent).  "trend": v = t is maximally persistent -> H ~ 1.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i in range(32):
        rows.append((i, base + datetime.timedelta(days=i), i, "alt",
                     1.0 if i % 2 == 0 else -1.0, "{}"))
        rows.append((100 + i, base + datetime.timedelta(days=i), i, "trend",
                     float(i + 1), "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_hurst_exponent"](spark, str(tmp_path)).collect()}
    alt = out["alt"]
    assert (alt["n_days"], alt["n_scales"]) == (32, 3)
    assert alt["hurst"] == 0.0
    tr = out["trend"]
    assert tr["n_scales"] == 3
    assert 0.97 < tr["hurst"] < 1.01


def test_hurst_short_series_yields_null(spark, tmp_path):
    # 10 days: only the n=8 scale has a full block -> 1 scale point -> no
    # slope -> NULL (never a fake estimate from a single point).
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = [(i, base + datetime.timedelta(days=i), i, "s",
             float((i * 7) % 5), "{}") for i in range(10)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["ts_hurst_exponent"](spark, str(tmp_path)).collect()
    assert r["n_scales"] == 1 and r["hurst"] is None


def _irls_replica(users, t_iters=6):
    # Pure-Python third engine: the exact quantized IRLS recurrence
    # (q6 features, 1e-9 per-term floors, q9 betas, mu clamp, det guard).
    q6 = lambda v: math.floor(v * 1e6 + 0.5) / 1e6  # noqa: E731
    q9 = lambda v: math.floor(v * 1e9 + 0.5) / 1e9  # noqa: E731
    feats = [
        (y, q6(math.log(1 + n)),
         q6(math.log(1 + max(avg, 0.0))) if n > 0 else 0.0)
        for y, n, avg in users
    ]
    b = (0.0, 0.0, 0.0)
    for _ in range(t_iters):
        sums = [0] * 9
        for y, x1, x2 in feats:
            eta = b[0] + b[1] * x1 + b[2] * x2
            muc = min(max(1.0 / (1.0 + math.exp(-eta)), 1e-9), 0.999999999)
            w = muc * (1.0 - muc)
            z = eta + (y - muc) / w
            for i, t in enumerate([w, w * x1, w * x2, w * x1 * x1,
                                   w * x1 * x2, w * x2 * x2,
                                   w * z, w * z * x1, w * z * x2]):
                sums[i] += math.floor(t * 1e9 + 0.5)
        s00, s01, s02, s11, s12, s22, r0, r1, r2 = [x / 1e9 for x in sums]
        c00 = s11 * s22 - s12 * s12; c01 = s02 * s12 - s01 * s22
        c02 = s01 * s12 - s02 * s11; c11 = s00 * s22 - s02 * s02
        c12 = s01 * s02 - s00 * s12; c22 = s00 * s11 - s01 * s01
        det = (s00 * (s11 * s22 - s12 * s12)
               - s01 * (s01 * s22 - s12 * s02)
               + s02 * (s01 * s12 - s11 * s02))
        if det != 0:
            b = (q9((c00 * r0 + c01 * r1 + c02 * r2) / det),
                 q9((c01 * r0 + c11 * r1 + c12 * r2) / det),
                 q9((c02 * r0 + c12 * r1 + c22 * r2) / det))
    return {"intercept": q6(b[0]), "log_events": q6(b[1]),
            "log_avg_value": q6(b[2])}


def test_logistic_irls_matches_python_replica(spark, tmp_path):
    # 18 users: heavy-activity users mostly convert, light users mostly
    # don't, one crossover each way (no perfect separation -> finite MLE).
    # The fitted log_events coefficient must be positive and every beta
    # must equal the pure-Python replica of the quantized recurrence.
    base = datetime.datetime(2024, 5, 1, 12, 0)
    rows, eid, users = [], 0, []
    for uid in range(1, 10):          # 9 converters
        n_np = 4 if uid != 9 else 1   # user 9 converts despite light profile
        val = 10.0 if uid % 2 else 2.0  # value decorrelated from conversion
        for j in range(n_np):
            rows.append((eid, base, uid, "view", val, "{}")); eid += 1
        rows.append((eid, base, uid, "purchase", 1.0, "{}")); eid += 1
        users.append((1, n_np, val))
    for uid in range(11, 20):         # 9 non-converters
        n_np = 1 if uid != 19 else 4  # user 19 is heavy but never converts
        val = 10.0 if uid % 2 else 2.0
        for j in range(n_np):
            rows.append((eid, base, uid, "view", val, "{}")); eid += 1
        users.append((0, n_np, val))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["feature"]: r for r in
           eng.queries()["agg_logistic_irls"](spark, str(tmp_path)).collect()}
    exp = _irls_replica(users)
    assert all(r["n_users"] == 18 and r["n_converted"] == 9
               for r in out.values())
    for f in ("intercept", "log_events", "log_avg_value"):
        assert out[f]["beta"] == exp[f], f
    assert out["log_events"]["beta"] > 0


def test_sax_word_high_then_low(spark, tmp_path):
    # 14 days: 10.0 for the first week, 0.0 for the second.  m = 5,
    # population std = 5 -> z = +1/-1 -> frame means +1/-1 -> word "da"
    # (above 0.6745, below -0.6745).  "flat" is zero-variance -> NULL
    # word, segments 0.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i in range(14):
        rows.append((i, base + datetime.timedelta(days=i), i, "step",
                     10.0 if i < 7 else 0.0, "{}"))
        rows.append((50 + i, base + datetime.timedelta(days=i), i, "flat",
                     3.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_sax_symbolize"](spark, str(tmp_path)).collect()}
    step = out["step"]
    assert (step["n_days"], step["n_segments"]) == (14, 2)
    assert step["sax_word"] == "da"
    flat = out["flat"]
    assert flat["sax_word"] is None and flat["n_segments"] == 0


def test_topo_levels_chain_with_branch(spark, tmp_path):
    # Majority precedence: both users put a first and c last; they
    # DISAGREE on b-vs-d (1-1 tie -> no edge between them).  Edges:
    # a->b, a->d, a->c, b->c, d->c.  Kahn levels: a=0, b=d=1, c=2.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    m = lambda k: base + datetime.timedelta(minutes=k)  # noqa: E731
    rows, eid = [], 0
    for uid, order in [(1, ["a", "b", "d", "c"]), (2, ["a", "d", "b", "c"])]:
        for k, et in enumerate(order):
            rows.append((eid, m(k), uid, et, 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["graph_topo_levels"](spark, str(tmp_path)).collect()}
    assert not any(r["in_cycle"] for r in out.values())
    assert out["a"]["level"] == 0
    assert out["b"]["level"] == 1 and out["d"]["level"] == 1
    assert out["c"]["level"] == 2


def test_topo_levels_condorcet_cycle_flagged(spark, tmp_path):
    # Three users with rotated orderings: p<q (u1), q<r (u2), r<p (u3),
    # each direction winning 2-1 -> edges p->q->r->p, a majority cycle.
    # All three nodes must be flagged in_cycle with NULL level; an
    # isolated type "z" (one user, alone) levels at 0.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    m = lambda k: base + datetime.timedelta(minutes=k)  # noqa: E731
    rows, eid = [], 0
    for uid, order in [(1, "pqr"), (2, "qrp"), (3, "rpq")]:
        for k, et in enumerate(order):
            rows.append((eid, m(k), uid, et, 1.0, "{}")); eid += 1
    rows.append((eid, m(0), 9, "z", 1.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["graph_topo_levels"](spark, str(tmp_path)).collect()}
    for et in "pqr":
        assert out[et]["in_cycle"] and out[et]["level"] is None
    assert out["z"]["level"] == 0 and not out["z"]["in_cycle"]


def test_topo_levels_null_event_type_parity_both_paths(spark, tmp_path, monkeypatch):
    # ADVICE r13: a NULL event_type made the three implementations diverge
    # (Python peel: level 0 once; distributed loop: re-peeled every round;
    # oracle: NOT IN against a NULL-bearing peel set emptied later rounds).
    # NULL node keys now route OUT on both engines (matched pair), so the
    # oracle compare must be hash-exact on a NULL-bearing fixture via BOTH
    # the driver-page peel and the cap-forced distributed Kahn loop.
    import os

    import nedp_etl_spark.operators.graph as gr
    from tests.oracle import compare

    base = datetime.datetime(2024, 1, 1, 12, 0)
    m = lambda k: base + datetime.timedelta(minutes=k)  # noqa: E731
    rows, eid = [], 0
    for uid, order in [(1, ["a", "b", "c"]), (2, ["a", "b", "c"])]:
        for k, et in enumerate(order):
            rows.append((eid, m(k), uid, et, 1.0, "{}")); eid += 1
    rows.append((eid, m(9), 3, None, 1.0, "{}"))  # the NULL node key
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        os.symlink(f"/root/testdata/sf0.001/{t}.parquet",
                   str(tmp_path / f"{t}.parquet"))
    compare(spark, "graph_topo_levels", str(tmp_path))
    out = {r["event_type"]: r for r in
           eng.queries()["graph_topo_levels"](spark, str(tmp_path)).collect()}
    assert None not in out and out["a"]["level"] == 0 and out["c"]["level"] == 2
    monkeypatch.setattr(gr, "_TOPO_PAGE_CAP", 0)  # force the distributed loop
    compare(spark, "graph_topo_levels", str(tmp_path))


def test_conformal_interval_hand_computed(spark, tmp_path):
    # 20 days, exactly linear train half (v = 10t for t=1..10 -> slope 10,
    # intercept 0 exactly); calibration half carries planted deviations
    # with max |d| = 10 -> k* = ceil(0.9*11) = 10 = n_cal -> qhat = 10.
    # Forecast t=21: 210, interval [200, 220].
    base = datetime.datetime(2024, 1, 1, 12, 0)
    dev = [1.0, -2.0, 3.0, -4.0, 5.0, -6.0, 7.0, -8.0, 9.0, -10.0]
    rows = []
    for i in range(20):
        v = 10.0 * (i + 1) + (dev[i - 10] if i >= 10 else 0.0)
        rows.append((i, base + datetime.timedelta(days=i), i, "m", v, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["ts_conformal_interval"](spark, str(tmp_path)).collect()
    assert (r["n_train"], r["n_cal"]) == (10, 10)
    assert r["yhat_next"] == 210.0
    assert r["q_conformal"] == 10.0
    assert (r["lo"], r["hi"]) == (200.0, 220.0)


def test_conformal_interval_odd_days_and_tiny_calib(spark, tmp_path):
    # 21 days (odd: train 10, calib 11 -> k* = ceil(0.9*12) = 11 = n_cal,
    # still valid); and a 4-day series where k* = ceil(0.9*3) = 3 > 2 =
    # n_cal -> NULL interval, never a fake band.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i in range(21):
        rows.append((i, base + datetime.timedelta(days=i), i, "long",
                     10.0 * (i + 1) + (1.0 if i >= 10 else 0.0), "{}"))
    for i in range(4):
        rows.append((100 + i, base + datetime.timedelta(days=i), i, "tiny",
                     float(i * i), "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_conformal_interval"](spark, str(tmp_path)).collect()}
    lg = out["long"]
    assert (lg["n_train"], lg["n_cal"]) == (10, 11)
    assert lg["q_conformal"] == 1.0
    tiny = out["tiny"]
    assert tiny["q_conformal"] is None and tiny["lo"] is None


def test_wap_red_audit_keeps_previous_version_live(spark, tmp_path):
    # Orders 1..10 plus key 97 (hits the corruption spine).  Cycle 1 is
    # green -> publishes v1.  Cycle 2 stages a batch with key 97 NULLed ->
    # null_keys audit fails -> the manifest must still point at v1, and
    # the published table read through the manifest contains the CLEAN
    # batch (key 97 intact).
    import json, os
    t = datetime.datetime(1995, 3, 1)
    keys = list(range(1, 11)) + [97]
    rows = [(k, 1, "O", 100.0 + k, t, "1-URGENT", "c", 0, "x") for k in keys]
    schema = ("o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
              " o_totalprice double, o_orderdate timestamp,"
              " o_orderpriority string, o_clerk string, o_shippriority int,"
              " o_comment string")
    _write(spark, tmp_path, "orders", rows, schema)
    out = eng.queries()["sink_write_audit_publish"](spark, str(tmp_path)).collect()
    led = {(r["cycle"], r["check_name"]): r for r in out}
    assert led[(1, "null_keys")]["passed"] and led[(1, "null_keys")]["live_version"] == 1
    assert not led[(2, "null_keys")]["passed"]
    assert led[(2, "null_keys")]["observed"] == 1
    assert all(r["live_version"] == 1 for r in out)  # v2 never went live
    from nedp_etl_spark.operators.scans import _scratch as _sc
    man = json.load(open(os.path.join(
        _sc("sink_write_audit_publish", str(tmp_path)), "published.json")))
    assert man["version"] == 1
    live = spark.read.parquet(man["path"])
    assert live.filter("o_orderkey = 97").count() == 1  # clean batch is live


def test_pca_power_finds_dominant_axis(spark, tmp_path):
    # Four 64-dim vectors: dim 2 carries +/-10 (variance 100), dim 5
    # carries +/-1 (variance 1), signs independent -> covariance is
    # diagonal diag(0,..,100,..,1,..0).  Top component must be exactly
    # e_2 with positive loading (sign convention), lambda = 100, and
    # explained variance 100/101 = 0.990099.
    def vec(d2, d5):
        v = [0.0] * 64
        v[2], v[5] = d2, d5
        return v
    rows = [(0, vec(10.0, 1.0), 0), (1, vec(10.0, -1.0), 0),
            (2, vec(-10.0, 1.0), 1), (3, vec(-10.0, -1.0), 1)]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    out = {r["dim"]: r for r in
           eng.queries()["llm_embed_pca_power"](spark, str(tmp_path)).collect()}
    assert len(out) == 64
    assert out[2]["loading"] == 1.0
    assert all(out[i]["loading"] == 0.0 for i in range(64) if i != 2)
    assert out[0]["lambda_top"] == 100.0
    assert out[0]["explained_var_ratio"] == 0.990099
    assert out[0]["n_vectors"] == 4


def test_minhash_containment_detects_strict_subset(spark, tmp_path):
    # The augmented corpus pairs every doc with its first-token-dropped
    # copy (+1000000): that copy's shingle set is a STRICT SUBSET of its
    # source's, so containment copy-in-source must be exactly 1.0 while
    # Jaccard is below 1 (the asymmetry resemblance cannot express).
    words = " ".join(f"w{i}" for i in range(30))
    rows = [(1, words, "en", "s1", len(words))]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {(r["doc_a"], r["doc_b"]): r for r in
           eng.queries()["llm_minhash_containment"](spark, str(tmp_path)).collect()}
    pair = out[(1, 1000001)]
    # copy (doc_b) has 27 shingles, source 28; intersection = 27
    assert pair["inter_size"] == 27
    assert pair["cont_b_in_a"] == 1.0          # full containment
    assert pair["cont_a_in_b"] == 0.964286     # 27/28 — NOT symmetric
    assert pair["direction"] == "mutual"       # both clear 0.9 here


def test_packing_mask_segments_and_continuations(spark, tmp_path):
    # Three docs of 300, 400, 200 tokens against cap 512.  Doc 2 starts at
    # 300 and CROSSES the pack boundary: segment (300..512) in pack 0 and
    # a continuation (0..188) in pack 1; doc 3 fills 188..388 of pack 1.
    # cu_seqlens: pack 0 -> [0, 300, 512]; pack 1 -> [0, 188, 388];
    # continuations: pack 1 has exactly one.
    docs = [(1, " ".join(["a"] * 300)), (2, " ".join(["b"] * 400)),
            (3, " ".join(["c"] * 200))]
    rows = [(i, t, "en", "s", len(t)) for i, t in docs]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {r["pack_id"]: r for r in
           eng.queries()["llm_packing_attention_mask"](spark, str(tmp_path)).collect()}
    p0, p1 = out[0], out[1]
    assert (p0["n_segments"], p0["pack_tokens"], p0["n_continuations"]) == (2, 512, 0)
    # cu_seqlens is a |-joined STRING (round-11: container-typed output
    # columns are banned — the driver canonicalizer cannot hash them)
    assert p0["cu_seqlens"] == "0|300|512"
    assert (p1["n_segments"], p1["pack_tokens"], p1["n_continuations"]) == (2, 388, 1)
    assert p1["cu_seqlens"] == "0|188|388"


def test_theta_forecast_matches_ses_recurrence_plus_half_drift(spark, tmp_path):
    # v = [8,4,2,6]: the alpha=0.5 SES recurrence gives L4 = 5 exactly
    # (closed form must agree: 8/8 + 4/8 + 2/4 + 6/2 = 5); OLS slope is
    # (4*46 - 10*20)/(4*30 - 100) = -0.8, so theta forecasts are
    # 5 + h*(-0.4): 4.6, 4.2, 3.8.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = [(i, base + datetime.timedelta(days=i), i, "m", v, "{}")
            for i, v in enumerate([8.0, 4.0, 2.0, 6.0])]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["horizon"]: r for r in
           eng.queries()["ts_theta_forecast"](spark, str(tmp_path)).collect()}
    assert all(r["n_days"] == 4 for r in out.values())
    assert out[1]["theta_forecast"] == 4.6
    assert out[2]["theta_forecast"] == 4.2
    assert out[3]["theta_forecast"] == 3.8


def _geohash_replica(lat, lon, p=8):
    # Pure-Python third engine: textbook bisection geohash (Niemeyer).
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, "", True
    ch = 0
    while len(out) < p:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                ch = ch * 2 + 1; lon_r[0] = mid
            else:
                ch = ch * 2; lon_r[1] = mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                ch = ch * 2 + 1; lat_r[0] = mid
            else:
                ch = ch * 2; lat_r[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out += alpha[ch]; bits, ch = 0, 0
    return out


def test_geohash_matches_textbook_bisection(spark, tmp_path):
    # The branch-free scaled-integer interleave must equal the textbook
    # successive-bisection encoder for every customer, and the decoded
    # cell center must sit within half a cell of the input.
    rows = [(k, f"c{k}", "a", 0, "p", 1.0, "s", "x") for k in range(1, 60)]
    schema = ("c_custkey bigint, c_name string, c_address string,"
              " c_nationkey bigint, c_phone string, c_acctbal double,"
              " c_mktsegment string, c_comment string")
    _write(spark, tmp_path, "customer", rows, schema)
    out = eng.queries()["fn_geohash"](spark, str(tmp_path)).collect()
    assert len(out) == 59
    for r in out:
        assert r["geohash"] == _geohash_replica(r["lat"], r["lon"]), r["c_custkey"]
        assert r["geohash4"] == r["geohash"][:4]
        assert abs(r["center_lat"] - r["lat"]) <= 180.0 / (1 << 20)
        assert abs(r["center_lon"] - r["lon"]) <= 360.0 / (1 << 20)


def test_variance_ratio_alternating_is_mean_reverting(spark, tmp_path):
    # Alternating series: q=4-step increments are ALWAYS 0 (period 2
    # divides 4), so VR collapses toward 0 and the z-statistic is deeply
    # negative -> 'mean_reverting'.  A constant series has zero one-step
    # variance -> all NULLs (the test is undefined, never faked).
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i in range(18):
        rows.append((i, base + datetime.timedelta(days=i), i, "alt",
                     1.0 if i % 2 == 0 else -1.0, "{}"))
        rows.append((50 + i, base + datetime.timedelta(days=i), i, "const",
                     4.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_variance_ratio_test"](spark, str(tmp_path)).collect()}
    alt = out["alt"]
    assert alt["n_returns"] == 17
    assert alt["vr"] is not None and alt["vr"] < 0.1
    assert alt["regime"] == "mean_reverting"
    const = out["const"]
    assert const["vr"] is None and const["regime"] is None


def test_spatial_neighbors_cross_cell_boundary(spark, tmp_path):
    # Part 1: three far-apart points -> no 3x3 patch holds a candidate,
    # so the honest answer is empty.  Part 2: search the key space for a
    # derived pair in ADJACENT cells and verify each finds the other as
    # nearest neighbor with same_cell = False — the pair a plain cell
    # equi-join (join_spatial_grid) would miss.
    rows = [(k, f"c{k}", 0, 1.0, "s") for k in (1, 2, 3)]
    schema = ("c_custkey bigint, c_name string, c_nationkey bigint,"
              " c_acctbal double, c_mktsegment string")
    _write(spark, tmp_path, "customer", rows, schema)
    out = {r["c_custkey"]: r for r in
           eng.queries()["join_spatial_neighbors"](spark, str(tmp_path)).collect()}
    # derived coords: key1 -> (19.195, 7.295) cell (19,7);
    # key2 -> (18.385, 14.585) cell (18,14); key3 -> (17.575, 1.875) (17,1)
    # no two points share or neighbor a cell -> empty result is the honest
    # answer here; assert the operator returns rows ONLY when a 3x3 patch
    # holds a candidate
    assert out == {}
    # now plant a genuine boundary pair: keys 253 & 506 derive to
    # lat/lon (.., ..) — instead compute two keys whose cells are adjacent
    import itertools
    def coords(k):
        return ((k * 7919 % 2000) / 100.0 + 0.005,
                (k * 104729 % 4000) / 100.0 + 0.005)
    found = None
    for a, b in itertools.combinations(range(1, 400), 2):
        la, lo = coords(a); lb, lob = coords(b)
        ca, cb = (int(la), int(lo)), (int(lb), int(lob))
        if ca != cb and abs(ca[0] - cb[0]) <= 1 and abs(ca[1] - cb[1]) <= 1:
            found = (a, b); break
    assert found, "no boundary pair exists in the derivation"
    a, b = found
    rows = [(k, f"c{k}", 0, 1.0, "s") for k in (a, b)]
    second = tmp_path / "second"   # fresh dir: data.load caches per (session, dir)
    second.mkdir()
    _write(spark, second, "customer", rows, schema)
    out = {r["c_custkey"]: r for r in
           eng.queries()["join_spatial_neighbors"](spark, str(second)).collect()}
    assert out[a]["neighbor_key"] == b and out[b]["neighbor_key"] == a
    assert not out[a]["same_cell"]  # found ACROSS the boundary
    assert out[a]["dist_km"] < 260.0  # within the 3x3 patch diagonal


def test_roc_auc_hand_computed_with_tie(spark, tmp_path):
    # Scores (dim 0): positives [3, 2], negatives [2, 1] -> pairwise wins
    # 3 of 4 plus one tie at 0.5 -> AUC = 0.875, gini = 0.75 (the tie is
    # exactly the case naive rank() without averaging gets wrong).
    def vec(x):
        v = [0.0] * 64
        v[0] = x
        return v
    rows = [(0, vec(3.0), 1), (1, vec(2.0), 1),   # label%2==1 -> positive
            (2, vec(2.0), 0), (3, vec(1.0), 0)]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    [r] = eng.queries()["agg_roc_auc"](spark, str(tmp_path)).collect()
    assert (r["n_pos"], r["n_neg"]) == (2, 2)
    assert r["auc"] == 0.875
    assert r["gini"] == 0.75


def test_roc_auc_single_class_yields_null(spark, tmp_path):
    def vec(x):
        v = [0.0] * 64
        v[0] = x
        return v
    rows = [(0, vec(3.0), 1), (1, vec(2.0), 1)]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    [r] = eng.queries()["agg_roc_auc"](spark, str(tmp_path)).collect()
    assert r["auc"] is None and r["gini"] is None


_NATION_SCHEMA = ("n_nationkey bigint, n_name string, n_regionkey bigint,"
                  " n_comment string")
_ORDERS_MIN_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string,"
    " o_clerk string, o_shippriority int, o_comment string")
_CUST_MIN_SCHEMA = ("c_custkey bigint, c_name string, c_nationkey bigint,"
                    " c_acctbal double, c_mktsegment string")


def _recon_fixture(spark, tmp_path, b_counts):
    d0 = datetime.datetime(2024, 1, 1)
    _write(spark, tmp_path, "nation",
           [(1, "A", 7, "x"), (2, "B", 7, "x")], _NATION_SCHEMA)
    _write(spark, tmp_path, "customer",
           [(1, "c1", 1, 1.0, "s"), (2, "c2", 2, 1.0, "s")], _CUST_MIN_SCHEMA)
    rows, oid = [], 0
    for day, cnt in enumerate([1, 2, 3]):          # nation A: slope 1
        for _ in range(cnt):
            rows.append((oid, 1, "O", 1.0, d0 + datetime.timedelta(days=day),
                         "p", "c", 0, "x")); oid += 1
    for day, cnt in enumerate(b_counts):           # nation B
        for _ in range(cnt):
            rows.append((oid, 2, "O", 1.0, d0 + datetime.timedelta(days=day),
                         "p", "c", 0, "x")); oid += 1
    _write(spark, tmp_path, "orders", rows, _ORDERS_MIN_SCHEMA)


def test_forecast_reconcile_balanced_is_coherent(spark, tmp_path):
    # Aligned day sets: OLS is linear in y, so region fit = sum of nation
    # fits and the coherence gap is EXACTLY 0; top-down splits 6.0 by the
    # 6/12 shares.
    _recon_fixture(spark, tmp_path, [2, 2, 2])
    out = {r["nation_key"]: r for r in
           eng.queries()["ts_forecast_reconcile"](spark, str(tmp_path)).collect()}
    a, b = out[1], out[2]
    assert a["nation_fc"] == 4.0 and b["nation_fc"] == 2.0
    assert a["region_fc"] == 6.0 and a["bottom_up_fc"] == 6.0
    assert a["coherence_gap"] == 0.0
    assert a["td_share"] == 0.5 and a["top_down_fc"] == 3.0
    assert not a["fallback_mean"]


def test_forecast_reconcile_unbalanced_panel_gaps(spark, tmp_path):
    # Nation B misses day 2 (no orders -> absent row, not zero): its OLS
    # sees only two days (flat 2.0) while the region series [3,2,5] fits
    # slope 1 -> region fc 5.333333 vs bottom-up 6.0: gap -0.666667 —
    # exactly the incoherence reconciliation exists to close.
    _recon_fixture(spark, tmp_path, [2, 0, 2])
    out = {r["nation_key"]: r for r in
           eng.queries()["ts_forecast_reconcile"](spark, str(tmp_path)).collect()}
    a, b = out[1], out[2]
    assert b["nation_fc"] == 2.0 and a["nation_fc"] == 4.0
    assert a["region_fc"] == 5.333333
    assert a["bottom_up_fc"] == 6.0
    assert a["coherence_gap"] == -0.666667


def test_empirical_bayes_shrinks_small_samples_harder(spark, tmp_path):
    # Nations: (2 orders, 1 F), (100, 10 F), (100, 30 F) -> rates 0.5,
    # 0.1, 0.3; pooled mean exactly 0.3, between-entity var exactly 0.04.
    # The 2-order nation must be pulled far toward the prior mean while
    # the 100-order nations barely move; alpha/beta must equal the
    # method-of-moments formula computed with the identical op sequence.
    d0 = datetime.datetime(2024, 1, 1)
    _write(spark, tmp_path, "customer",
           [(1, "c1", 1, 1.0, "s"), (2, "c2", 2, 1.0, "s"),
            (3, "c3", 3, 1.0, "s")], _CUST_MIN_SCHEMA)
    rows, oid = [], 0
    for cust, n, x in [(1, 2, 1), (2, 100, 10), (3, 100, 30)]:
        for i in range(n):
            rows.append((oid, cust, "F" if i < x else "O", 1.0, d0,
                         "p", "c", 0, "x")); oid += 1
    _write(spark, tmp_path, "orders", rows, _ORDERS_MIN_SCHEMA)
    out = {r["c_nationkey"]: r for r in
           eng.queries()["agg_empirical_bayes"](spark, str(tmp_path)).collect()}
    mbar, v = 0.3, 0.04
    strength = mbar * (1.0 - mbar) / v - 1.0
    alpha = math.floor(mbar * strength * 1e6 + 0.5) / 1e6
    beta = math.floor((1.0 - mbar) * strength * 1e6 + 0.5) / 1e6
    r1 = out[1]
    assert r1["raw_rate"] == 0.5
    assert (r1["alpha"], r1["beta"]) == (alpha, beta)
    assert r1["shrunk_rate"] == math.floor(
        (1 + alpha) / (2 + alpha + beta) * 1e6 + 0.5) / 1e6
    move1 = abs(r1["shrunk_rate"] - r1["raw_rate"])
    move2 = abs(out[2]["shrunk_rate"] - out[2]["raw_rate"])
    assert move1 > 5 * move2              # small n shrinks much harder
    assert abs(r1["shrunk_rate"] - mbar) < abs(r1["raw_rate"] - mbar)
    assert not r1["no_shrinkage"]


def test_empirical_bayes_underdispersed_keeps_raw(spark, tmp_path):
    # Identical rates across entities: between-entity variance is 0 ->
    # no prior can be fit -> raw rates pass through, flagged.
    d0 = datetime.datetime(2024, 1, 1)
    _write(spark, tmp_path, "customer",
           [(1, "c1", 1, 1.0, "s"), (2, "c2", 2, 1.0, "s")],
           _CUST_MIN_SCHEMA)
    rows, oid = [], 0
    for cust in (1, 2):
        for i in range(10):
            rows.append((oid, cust, "F" if i < 2 else "O", 1.0, d0,
                         "p", "c", 0, "x")); oid += 1
    _write(spark, tmp_path, "orders", rows, _ORDERS_MIN_SCHEMA)
    out = {r["c_nationkey"]: r for r in
           eng.queries()["agg_empirical_bayes"](spark, str(tmp_path)).collect()}
    assert all(r["no_shrinkage"] for r in out.values())
    assert all(r["shrunk_rate"] == r["raw_rate"] == 0.2 for r in out.values())


def test_levene_detects_unequal_spread(spark, tmp_path):
    # a = [0,10,1,9] (|dev| = 5,5,4,4) vs b = [5,5,4,6] (|dev| = 0,0,1,1):
    # SSB = 32, SSW = 2 -> W = (32/1)/(2/6) = 96 exactly -> variances
    # differ at chi2/F crit 3.841.
    t = datetime.datetime(2024, 1, 1, 10, 0)
    vals = [("a", v) for v in (0.0, 10.0, 1.0, 9.0)] + \
           [("b", v) for v in (5.0, 5.0, 4.0, 6.0)]
    rows = [(i, t, i, g, v, "{}") for i, (g, v) in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_levene_test"](spark, str(tmp_path)).collect()
    assert (r["k_groups"], r["n_total"]) == (2, 8)
    assert r["levene_w"] == 96.0
    assert r["variances_differ"] is True


def test_levene_equal_spread_scores_zero(spark, tmp_path):
    # b is a pure LOCATION shift of a (same deviations): between-group
    # deviation spread is exactly 0 -> W = 0, no difference.
    t = datetime.datetime(2024, 1, 1, 10, 0)
    vals = [("a", v) for v in (0.0, 10.0, 1.0, 9.0)] + \
           [("b", v) for v in (100.0, 110.0, 101.0, 109.0)]
    rows = [(i, t, i, g, v, "{}") for i, (g, v) in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_levene_test"](spark, str(tmp_path)).collect()
    assert r["levene_w"] == 0.0 and r["variances_differ"] is False


def test_shallow_clone_is_zero_copy_and_diverges(spark, tmp_path):
    # The clone manifest must reference the SOURCE's physical files (no
    # data copy) plus only delta files; the clone sees source rows plus
    # the divergence batch while the source is untouched.
    import glob, json, os
    t = datetime.datetime(1995, 3, 1)
    rows = [(k, 1, "O", 200000.0 + k, t, "p", "c", 0, "x")
            for k in (1, 2, 3, 4, 6)]  # pass the filter; none is 5 mod 89
    rows.append((89 * 3 + 5, 1, "O", 100.0, t, "p", "c", 0, "x"))  # delta-only
    _write(spark, tmp_path, "orders", rows, _ORDERS_MIN_SCHEMA.replace(
        "o_custkey bigint,", "o_custkey bigint,"))
    out = {r["side"]: r for r in
           eng.queries()["sink_shallow_clone"](spark, str(tmp_path)).collect()}
    assert out["source"]["n_rows"] == 5
    assert out["clone"]["n_rows"] == 6          # source + 1 delta row
    from nedp_etl_spark.operators.scans import _scratch as _sc
    root = _sc("sink_shallow_clone", str(tmp_path))
    spec = json.load(open(os.path.join(root, "clone.json")))
    src_files = set(glob.glob(os.path.join(root, "src", "*.parquet")))
    delta_files = set(glob.glob(os.path.join(root, "delta", "*.parquet")))
    assert src_files and delta_files
    assert set(spec["files"]) == src_files | delta_files  # POINTERS, no copy
    # no data file exists outside src/ and delta/ (the clone copied nothing)
    all_parquet = set(glob.glob(os.path.join(root, "**", "*.parquet"),
                                recursive=True))
    assert all_parquet == src_files | delta_files


def test_haar_energy_localizes_scale(spark, tmp_path):
    # "step" = [1,1,1,1,5,5,5,5]: all pairwise differences vanish until
    # the coarsest split -> energy (0, 0, 4) at levels (1,2,3).
    # "alt" = [1,-1,...]x4: every 2-day pair differs -> (4, 0, 0).
    base = datetime.datetime(2024, 1, 1, 12, 0)
    rows = []
    for i in range(8):
        rows.append((i, base + datetime.timedelta(days=i), i, "step",
                     1.0 if i < 4 else 5.0, "{}"))
        rows.append((50 + i, base + datetime.timedelta(days=i), i, "alt",
                     1.0 if i % 2 == 0 else -1.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {(r["event_type"], r["level"]): r for r in
           eng.queries()["ts_haar_energy"](spark, str(tmp_path)).collect()}
    assert [out[("step", l)]["energy"] for l in (1, 2, 3)] == [0.0, 0.0, 4.0]
    assert out[("step", 3)]["energy_frac"] == 1.0
    assert [out[("alt", l)]["energy"] for l in (1, 2, 3)] == [4.0, 0.0, 0.0]
    assert out[("alt", 1)]["energy_frac"] == 1.0


def test_iv_2sls_recovers_causal_slope_under_confounding(spark, tmp_path):
    # Hidden motivation m drives BOTH engagement x = 1 + 2z + 3m and
    # outcome y = 5x + 10m.  OLS is biased up (380/52 = 7.307692); the
    # arm z moves x but reaches y only through it, so the Wald/IV ratio
    # recovers the causal 5.0 EXACTLY (czy/czx = 40/8).  With 4 users the
    # first-stage F is 0.888889 -> flagged weak.
    t = datetime.datetime(2024, 1, 1, 10, 0)
    rows, eid = [], 0
    for uid, m in [(0, 0), (1, 0), (2, 1), (3, 1)]:
        z = uid % 2
        x = 1.0 + 2.0 * z + 3.0 * m
        y = 5.0 * x + 10.0 * m
        rows.append((eid, t, uid, "view", x, "{}")); eid += 1
        rows.append((eid, t, uid, "purchase", y, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_iv_2sls"](spark, str(tmp_path)).collect()
    assert r["n_users"] == 4
    assert r["beta_iv"] == 5.0
    assert r["beta_ols"] == 7.307692
    assert r["first_stage_f"] == 0.888889
    assert r["weak_instrument"] is True


def test_topic_segments_boundary_at_vocabulary_shift(spark, tmp_path):
    # "shift": 10 fruit tokens then 10 animal tokens -> two blocks with
    # ZERO shared vocabulary -> jaccard 0 -> one boundary, two segments.
    # "same": the same 10 tokens twice -> jaccard 1 -> no boundary.
    # "tiny": a single block -> no gaps -> cohesion NULL, one segment.
    fruit = " ".join(f"apple{i}" for i in range(10))
    animal = " ".join(f"zebra{i}" for i in range(10))
    rows = [
        (1, fruit + " " + animal, "en", "s", 42),
        (2, fruit + " " + fruit, "en", "s", 42),
        (3, fruit, "en", "s", 42),
    ]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = {r["doc_id"]: r for r in
           eng.queries()["llm_topic_segments"](spark, str(tmp_path)).collect()}
    shift = out[1]
    assert (shift["n_blocks"], shift["n_boundaries"], shift["n_segments"]) == (2, 1, 2)
    assert shift["mean_cohesion"] == 0.0
    same = out[2]
    assert (same["n_boundaries"], same["n_segments"]) == (0, 1)
    assert same["mean_cohesion"] == 1.0
    tiny = out[3]
    assert (tiny["n_blocks"], tiny["n_segments"]) == (1, 1)
    assert tiny["mean_cohesion"] is None


def test_event_study_lift_curve(spark, tmp_path):
    # One user, purchase anchored at day 5; activity value 1.0 on days
    # 2-5 and 3.0 on days 6-8 -> per-offset means [1,1,1,1,3,3,3] over
    # rel days -3..+3, pre-mean 1.0, lift [0,0,0,0,2,2,2].
    base = datetime.datetime(2024, 1, 1, 12, 0)
    day = lambda k: base + datetime.timedelta(days=k)  # noqa: E731
    rows, eid = [], 0
    for k in range(2, 9):
        rows.append((eid, day(k), 1, "view", 1.0 if k <= 5 else 3.0, "{}"))
        eid += 1
    rows.append((eid, day(5), 1, "purchase", 1.0, "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["rel_day"]: r for r in
           eng.queries()["ts_event_study"](spark, str(tmp_path)).collect()}
    assert sorted(out) == [-3, -2, -1, 0, 1, 2, 3]
    for rd in (-3, -2, -1, 0):
        assert out[rd]["mean_value"] == 1.0 and out[rd]["lift_vs_pre"] == 0.0
    for rd in (1, 2, 3):
        assert out[rd]["mean_value"] == 3.0 and out[rd]["lift_vs_pre"] == 2.0
    assert all(r["n_obs"] == 1 for r in out.values())


def test_gpd_tail_bounded_uniform_exceedances(spark, tmp_path):
    # 960 zero-value events plus a planted uniform tail 101..140: the
    # mean+2sigma threshold lands near 52, all 40 tail points exceed it,
    # and uniform exceedances have m^2/v ~ 3 -> xi ~ -1 (a BOUNDED tail).
    # Exact values are pinned by replicating the estimator's op sequence.
    t = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [(i, t, i, "m", 0.0, "{}") for i in range(960)]
    rows += [(1000 + i, t, i, "m", 100.0 + i, "{}") for i in range(1, 41)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_gpd_tail"](spark, str(tmp_path)).collect()
    # replica (same op sequence as both engines)
    vals = [0.0] * 960 + [100.0 + i for i in range(1, 41)]
    n = len(vals)
    sq = sum(math.floor(v * 1e6 + 0.5) for v in vals)
    ssq = sum(math.floor(v * 1e6 + 0.5) ** 2 for v in vals)
    mean = sq / 1e6 / n
    var = (ssq / 1e6 / 1e6 - sq / 1e6 * (sq / 1e6) / n) / n
    u = math.floor((mean + 2.0 * math.sqrt(max(var, 0.0))) * 1e6 + 0.5) / 1e6
    exc = [v for v in vals if v > u]
    k = len(exc)
    eq = [math.floor((v - u) * 1e6 + 0.5) for v in exc]
    seq_, sseq = sum(eq), sum(x * x for x in eq)
    m = seq_ / 1e6 / k
    v2 = (sseq / 1e6 / 1e6 - seq_ / 1e6 * (seq_ / 1e6) / k) / (k - 1)
    xi = (1.0 - m * m / v2) / 2.0
    beta = m * (m * m / v2 + 1.0) / 2.0
    rl = u + beta / xi * (math.pow(10000.0 * k / n, xi) - 1.0)
    assert r["n_exceed"] == 40 and r["threshold"] == u
    assert r["xi"] == math.floor(xi * 1e6 + 0.5) / 1e6
    assert r["xi"] < 0                      # bounded tail detected
    assert r["beta"] == math.floor(beta * 1e6 + 0.5) / 1e6
    assert r["return_level_10k"] == math.floor(rl * 1e6 + 0.5) / 1e6
    assert r["return_level_10k"] < 150.0    # finite endpoint respected


def test_gpd_tail_too_few_exceedances_yields_null(spark, tmp_path):
    t = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [(i, t, i, "m", 0.0, "{}") for i in range(100)]
    rows += [(200 + i, t, i, "m", 50.0 + i, "{}") for i in range(5)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_gpd_tail"](spark, str(tmp_path)).collect()
    assert r["xi"] is None and r["return_level_10k"] is None


def test_huber_mean_resists_outlier(spark, tmp_path):
    # [1, 2, 3, 100]: plain mean 26.5; Huber reweighting must land near
    # the inlier mass (< 10) and equal the op-sequence replica exactly.
    t = datetime.datetime(2024, 1, 1, 10, 0)
    vals = [1.0, 2.0, 3.0, 100.0]
    rows = [(i, t, i, "m", v, "{}") for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_huber_mean"](spark, str(tmp_path)).collect()
    # replica
    n = len(vals)
    sq = sum(math.floor(v * 1e6 + 0.5) for v in vals)
    ssq = sum(math.floor(v * 1e6 + 0.5) ** 2 for v in vals)
    m0 = math.floor(sq / 1e6 / n * 1e6 + 0.5) / 1e6
    s = math.floor(math.sqrt(max((ssq / 1e6 / 1e6
                                  - sq / 1e6 * (sq / 1e6) / n) / n, 0.0))
                   * 1e6 + 0.5) / 1e6
    mu = m0
    for _ in range(5):
        swx = sum(math.floor(min(1.0, 1.345 * s / abs(v - mu)) * v * 1e9 + 0.5)
                  if v != mu else math.floor(1.0 * v * 1e9 + 0.5)
                  for v in vals)
        sw = sum(math.floor(min(1.0, 1.345 * s / abs(v - mu)) * 1e9 + 0.5)
                 if v != mu else math.floor(1e9 + 0.5) for v in vals)
        mu = math.floor((swx / 1e9) / (sw / 1e9) * 1e9 + 0.5) / 1e9
    assert r["mean_plain"] == 26.5
    assert r["huber_mean"] == math.floor(mu * 1e6 + 0.5) / 1e6
    assert r["huber_mean"] < 26.5  # pulled toward the inlier mass
    assert r["scale_s"] == s


def test_huber_constant_column_passthrough(spark, tmp_path):
    t = datetime.datetime(2024, 1, 1, 10, 0)
    rows = [(i, t, i, "m", 7.0, "{}") for i in range(5)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_huber_mean"](spark, str(tmp_path)).collect()
    assert r["huber_mean"] == 7.0 and r["scale_s"] == 0.0


def test_seasonality_strength_separates_regimes(spark, tmp_path):
    # "seasonal": pure weekly pattern (v = dow index, 28 days) -> the
    # seasonal component explains the interior variance, F_S near 1 and
    # flagged; F_T near 0 (no trend).  "trendy": v = t (pure ramp) -> the
    # trend explains everything: F_T near 1, F_S near 0, not flagged.
    base = datetime.datetime(2024, 1, 1, 12, 0)  # a Monday
    rows = []
    for i in range(28):
        rows.append((i, base + datetime.timedelta(days=i), i, "seasonal",
                     float(i % 7), "{}"))
        rows.append((100 + i, base + datetime.timedelta(days=i), i, "trendy",
                     float(i), "{}"))
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["event_type"]: r for r in
           eng.queries()["ts_seasonality_strength"](spark, str(tmp_path)).collect()}
    sea = out["seasonal"]
    assert sea["n_days_used"] == 22          # 28 minus the 3+3 MA edges
    assert sea["f_seasonal"] > 0.99 and sea["strongly_seasonal"]
    # pure pattern: the deseasonalized series is CONSTANT -> trend
    # strength undefined (zero component variance) -> NULL, not a number
    assert sea["f_trend"] is None
    tr = out["trendy"]
    assert tr["f_trend"] > 0.99
    # pure ramp: detrended interior is identically 0 -> seasonal strength
    # undefined -> NULL (and the flag with it)
    assert tr["f_seasonal"] is None and tr["strongly_seasonal"] is None


def test_embedding_drift_detects_planted_shift(spark, tmp_path):
    # Cohort 0 (labels 0): unit mass on dim 0.  Cohort 1 (labels 1): the
    # same mass rotated onto dim 1 -> mean cosine 0, L2 shift sqrt(2),
    # exactly 2 dims moved beyond tau; equal variances -> trace NULL
    # (both cohorts are constant -> zero trace) — so plant variance too:
    # cohort 1 jitters dim 2 by +/-0.5 -> trace ratio > 1.
    def vec(d0, d1, d2):
        v = [0.0] * 64
        v[0], v[1], v[2] = d0, d1, d2
        return v
    rows = [
        (0, vec(1.0, 0.0, 0.5), 0), (1, vec(1.0, 0.0, -0.5), 0),
        (2, vec(0.0, 1.0, 1.5), 1), (3, vec(0.0, 1.0, -1.5), 1),
    ]
    _write(spark, tmp_path, "embeddings", rows,
           "vec_id bigint, embedding array<float>, label int")
    [r] = eng.queries()["profile_embedding_drift"](spark, str(tmp_path)).collect()
    assert r["n_dims"] == 64
    assert r["mean_cosine"] == 0.0            # orthogonal mean vectors
    assert r["mean_l2_shift"] == 1.414214     # sqrt(2) at q6
    assert r["dims_moved"] == 2               # dims 0 and 1 only
    assert r["trace_ratio"] == 9.0            # var 2.25 vs 0.25 on dim 2


def test_weighted_reservoir_favors_heavy_items(spark, tmp_path):
    # 30 light docs (w=10) and 10 heavy docs (w=100000): u^(1/w) -> 1 as
    # w grows, so ALL heavy docs must enter the k=25 sample; the exact
    # selection equals the A-ES replica computed with the same ops.
    import hashlib
    rows = [(i, "x", "en", "s", 10) for i in range(30)]
    rows += [(100 + i, "x", "en", "s", 100000) for i in range(10)]
    _write(spark, tmp_path, "documents", rows, _DOC_SCHEMA)
    out = eng.queries()["sample_weighted_reservoir"](spark, str(tmp_path)).collect()
    assert len(out) == 25
    got = [r["doc_id"] for r in out]
    def key(doc_id, w):
        u0 = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 4294967296.0
        return math.floor(math.exp(math.log(max(u0, 1e-9)) / w) * 1e9 + 0.5) / 1e9
    exp = sorted(((key(i, 10), i) for i in range(30)), key=lambda t: (-t[0], t[1]))
    exph = sorted(((key(100 + i, 100000), 100 + i) for i in range(10)),
                  key=lambda t: (-t[0], t[1]))
    allk = sorted([(k, i) for k, i in exp] + [(k, i) for k, i in exph],
                  key=lambda t: (-t[0], t[1]))[:25]
    assert got == [i for _, i in allk]
    assert all(100 + i in got for i in range(10))  # every heavy doc sampled


def test_peak_prominence_separates_spike_from_ripple(spark, tmp_path):
    # v = [1,1,5,1,1,3,1]: peaks at the 5 (prominence 4, rank 1) and the
    # 3 (prominence 2, rank 2); endpoints can never be peaks.
    base = datetime.datetime(2024, 1, 1, 12, 0)
    vals = [1.0, 1.0, 5.0, 1.0, 1.0, 3.0, 1.0]
    rows = [(i, base + datetime.timedelta(days=i), i, "m", v, "{}")
            for i, v in enumerate(vals)]
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    out = {r["peak_rank"]: r for r in
           eng.queries()["ts_peak_prominence"](spark, str(tmp_path)).collect()}
    assert len(out) == 2
    assert out[1]["v"] == 5.0 and out[1]["prominence"] == 4.0
    assert out[2]["v"] == 3.0 and out[2]["prominence"] == 2.0


def test_parallel_trends_pre_test(spark, tmp_path):
    # Pre-period = first half (midpoint cutoff).  Case A: both arms rise
    # together (gap constant 1.0) -> slope 0, t = 0, parallel_ok TRUE.
    base = datetime.datetime(2024, 1, 1, 0, 0)
    day = lambda k, h=12: base + datetime.timedelta(days=k, hours=h)  # noqa: E731
    rows, eid = [], 0
    for k in range(4):                       # pre-period days 0..3
        rows.append((eid, day(k), 0, "view", 10.0 + k, "{}")); eid += 1
        rows.append((eid, day(k), 1, "view", 11.0 + k, "{}")); eid += 1
    rows.append((eid, day(40), 0, "view", 1.0, "{}")); eid += 1  # post tail
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_parallel_trends"](spark, str(tmp_path)).collect()
    assert r["n_pre_days"] == 4
    assert r["gap_slope_per_day"] == 0.0
    assert r["trend_t_stat"] == 0.0
    assert r["parallel_ok"] is True


def test_parallel_trends_detects_divergence(spark, tmp_path):
    # Case B: the gap opens 2.0/day EXACTLY (perfect linear divergence):
    # slope 2, zero residual -> infinitely significant -> t NULL,
    # parallel_ok FALSE — DiD on this data would be confounded.
    base = datetime.datetime(2024, 1, 1, 0, 0)
    day = lambda k: base + datetime.timedelta(days=k, hours=12)  # noqa: E731
    rows, eid = [], 0
    for k in range(4):
        rows.append((eid, day(k), 0, "view", 10.0, "{}")); eid += 1
        rows.append((eid, day(k), 1, "view", 10.0 + 2.0 * k, "{}")); eid += 1
    rows.append((eid, day(40), 0, "view", 1.0, "{}")); eid += 1
    _write(spark, tmp_path, "events", rows, _EV_SCHEMA)
    [r] = eng.queries()["agg_parallel_trends"](spark, str(tmp_path)).collect()
    assert r["gap_slope_per_day"] == 2.0
    assert r["trend_t_stat"] is None
    assert r["parallel_ok"] is False
