"""Differential tests for ``util.global_running_sum`` — the two-phase
prefix-sum idiom that replaced every un-partitioned running-sum window
(round-5 rework; see PLANS.md).  Each case compares against an
independently computed Python prefix sum over the sorted input, across
edge shapes the fixture queries never exercise: negatives, zeros, a
single row, more partitions than rows, duplicate order keys, and an
all-ties input that range-partitions into one partition.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nedp_etl_spark.util import global_running_sum


def _check_unique_keys(spark, pairs, num_partitions):
    """pairs: [(key, value)] with UNIQUE keys — row-wise exact comparison."""
    df = spark.createDataFrame(pairs, "k bigint, v bigint")
    out = {
        r["k"]: r["cum"]
        for r in global_running_sum(
            df, ["k"], F.col("v"), "cum", num_partitions=num_partitions
        ).collect()
    }
    running = 0
    for k, v in sorted(pairs):
        running += v
        assert out[k] == running, (k, out[k], running)
    assert len(out) == len(pairs)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_part", [1, 8, 64])
def test_random_unique_keys(spark, seed, n_part):
    rng = random.Random(seed)
    n = rng.randint(1, 500)
    keys = rng.sample(range(-(10**9), 10**9), n)
    pairs = [(k, rng.randint(-(10**6), 10**6)) for k in keys]
    _check_unique_keys(spark, pairs, n_part)


def test_single_row_and_more_partitions_than_rows(spark):
    _check_unique_keys(spark, [(42, -7)], 32)


def test_duplicate_keys_group_boundaries_exact(spark):
    # Intra-group row order is unspecified (true in any engine), but range
    # partitioning keeps equal keys together, so the cumulative value at
    # each full key-group boundary is deterministic.  Values are kept
    # non-negative so cum is monotone within a group and max(cum) observes
    # the group-end value (with mixed signs the boundary value is still
    # deterministic, but no aggregate of the output can pick out the
    # group's final row to observe it).
    rng = random.Random(7)
    pairs = [(rng.randint(0, 20), rng.randint(0, 100)) for _ in range(400)]
    df = spark.createDataFrame(pairs, "k bigint, v bigint")
    got = (
        global_running_sum(df, ["k"], F.col("v"), "cum", num_partitions=8)
        .groupBy("k")
        .agg(F.max("cum").alias("group_end"))
        .collect()
    )
    got_map = {r["k"]: r["group_end"] for r in got}
    running = 0
    per_key: dict[int, int] = {}
    for k, v in sorted(pairs):
        running += v
        per_key[k] = running  # last write per key = group-end cumulative
    assert got_map == per_key


def test_all_ties_single_group(spark):
    # Worst-case skew: every row shares the order key.  Range partitioning
    # degrades to one partition (correctly — ties may not split), and the
    # group-end cumulative must equal the exact total.
    df = spark.createDataFrame([(1, i) for i in range(1000)], "k bigint, v bigint")
    out = global_running_sum(df, ["k"], F.col("v"), "cum", num_partitions=8)
    assert out.agg(F.max("cum")).collect()[0][0] == sum(range(1000))
    assert out.count() == 1000


def test_row_number_mode(spark):
    # value = lit(1) turns the helper into a scalable global row_number.
    pairs = [(k, 0) for k in range(0, 300, 3)]
    df = spark.createDataFrame(pairs, "k bigint, v bigint")
    out = global_running_sum(df, ["k"], F.lit(1), "rn", num_partitions=16)
    got = sorted((r["k"], r["rn"]) for r in out.collect())
    assert got == [(k, i + 1) for i, k in enumerate(sorted(k for k, _ in pairs))]


def test_multi_column_matches_sequential_single_calls(spark):
    # global_running_sums must equal two independent single-column passes
    # exactly — the multi-column form only shares the shuffle/checkpoint,
    # never changes the arithmetic.
    from nedp_etl_spark.util import global_running_sums

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 9), rng.randint(0, 9)) for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, a bigint, b bigint")
    multi = {
        r["k"]: (r["ca"], r["cb"])
        for r in global_running_sums(
            df, ["k"], [(F.col("a"), "ca"), (F.col("b"), "cb")], num_partitions=7
        ).collect()
    }
    single_a = {
        r["k"]: r["ca"]
        for r in global_running_sum(df, ["k"], F.col("a"), "ca", 7).collect()
    }
    single_b = {
        r["k"]: r["cb"]
        for r in global_running_sum(df, ["k"], F.col("b"), "cb", 7).collect()
    }
    assert len(multi) == 500
    assert all(multi[k] == (single_a[k], single_b[k]) for k in multi)
