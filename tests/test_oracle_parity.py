"""The local replica of the driver's t2 gate: every registered query
must match its DuckDB oracle on the smoke scale factor."""

from __future__ import annotations

import pytest

from hyperion_history_api_spark import registry

from .oracle_check import compare, duck_connection

SPEC_NAMES = sorted(registry.all_specs())


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", SPEC_NAMES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = registry.all_specs()[name]
    sdf = spec.spark_fn(spark, sf_dir)
    if spec.oracle is None:
        assert sdf.count() >= 0  # rows-only check (non-SQL-expressible)
        return
    odf = duck.execute(spec.oracle).df()
    errs = compare(sdf, odf)
    assert not errs, f"{name}: " + "; ".join(errs)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
