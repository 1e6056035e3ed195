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
    # EVERY registered query is value-hash-checked: the approximate ops
    # manufacture their randomness (poly hash family, sha256-literal
    # hyperplanes, affine-permutation centroid sampling) so their DuckDB
    # oracles reproduce even the candidate generation bit-for-bit.
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_no_oracle_queries_register_last():
    """A bounded driver check window must always cover every
    oracle-bearing query before any rows-only one. (Currently vacuous —
    every query has an oracle — but kept so a future rows-only addition
    can't silently land mid-registry.)"""
    qs = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    no_oracle_idx = [i for i, n in enumerate(qs) if n not in oracles]
    if no_oracle_idx:
        assert all(n not in oracles for n in qs[no_oracle_idx[0]:])


def test_query_callables_are_unique():
    qs = entrymod.queries()
    names = [fn.__name__ for fn in qs.values()]
    assert len(names) == len(set(names))
