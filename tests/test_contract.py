"""Driver-contract meta-tests: the surfaces the external harness calls."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    """Mirrors the driver's smoke check: entry(spark) runs on a vanilla
    session and yields rows with a stable schema."""
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert {"orderkey", "revenue", "grade"} <= set(df.columns)


def test_every_oracle_has_a_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    orphans = set(oracles) - set(qs)
    assert not orphans, f"oracles without queries: {orphans}"


def test_registry_sizes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # The driver's correctness gate checks a bounded window (50 in round
    # 2): every registered query must fit inside it, or the tail gets no
    # CORRECTNESS row at all.
    assert len(qs) <= 50, f"registry exceeds the driver's check window: {len(qs)}"
    assert len(qs) == 50  # consolidated surface — update deliberately
    # the only rows-only query is iterative IVF (k-means fitting has no
    # SQL mirror); MinHash/SimHash check via the 'poly' hash family and
    # the hyperplane-LSH ops via literal plane arrays in the oracle
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"ns_ann_ivf"}


def test_no_oracle_queries_register_last():
    """A bounded driver check window must always cover every
    oracle-bearing query before any rows-only one."""
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    first_no_oracle = min(i for i, n in enumerate(qs) if n not in oracles)
    assert all(n not in oracles for n in qs[first_no_oracle:])


def test_query_callables_are_unique():
    qs = entrymod.queries()
    names = [fn.__name__ for fn in qs.values()]
    assert len(names) == len(set(names))
