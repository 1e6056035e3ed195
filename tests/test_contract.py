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
    assert len(qs) >= 60
    # the only rows-only queries are the documented approximate ops
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "ns_minhash_neardup",
        "ns_simhash_neardup",
        "ns_ann_lsh",
        "ns_ann_ivf",
        "ns_emb_neardup",
    }


def test_query_callables_are_unique():
    qs = entrymod.queries()
    names = [fn.__name__ for fn in qs.values()]
    assert len(names) == len(set(names))
