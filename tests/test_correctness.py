"""Every oracle-backed query key must hash-match its DuckDB oracle (the t2
gate), and every rows-only key must at least run and return a sane frame."""

from __future__ import annotations

import pytest

import nedp_etl_spark as eng
from tests.oracle import compare


def _exact_keys():
    return sorted(eng.oracle_sql().keys())


def _rows_only_keys():
    return sorted(set(eng.queries()) - set(eng.oracle_sql()))


@pytest.mark.parametrize("name", _exact_keys())
def test_exact_vs_oracle(spark, sf_dir, name):
    compare(spark, name, sf_dir)


@pytest.mark.parametrize("name", _rows_only_keys())
def test_rows_only_runs(spark, sf_dir, name):
    df = eng.queries()[name](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() >= 0
