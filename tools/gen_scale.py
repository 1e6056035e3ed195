"""Scale-curve data generator: synthesize sf{factor/10} tables from the
driver's sf0.1 parquet by key-offset replication, for BENCH_SCALE runs.

    python tools/gen_scale.py <out_dir> <factor>

The driver testdata is read-only and stops at sf0.1; the 100 TB claims
need at least one measured scale step, so this builds sfN = N x sf0.1
with the reference data's own distributions:

- facts (customer/orders/lineitem/supplier/part/events): `factor`
  copies with every key offset by copy_i x (max_key + 1), preserving
  referential integrity, per-key fan-outs, and value distributions.
  Copy 0 is byte-identical to the source rows.
- region/nation: constant dims, copied as-is (as at any real scale).
- documents: every word in copy i > 0 gets a per-copy suffix, so ALL
  shingles differ across copies — near-dup structure scales linearly
  (the within-copy dup pairs x factor) instead of exploding
  quadratically from `factor` identical corpus replicas.
- embeddings: copy i rotates each vector by i positions — norms and
  within-copy geometry are preserved exactly, cross-copy cosine is
  uncorrelated, so LSH bucket sizes scale linearly too.

Everything is written with DuckDB's default row-group size, so unlike
the single-row-group driver files the output scans SPLIT — generate the
factor=1 control with the same writer and compare gen-to-gen for a
layout-fair curve.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

# table -> columns needing a per-copy offset of (max+1 of the named base)
OFFSETS = {
    "customer": {"c_custkey": "c_custkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {
        "l_orderkey": "o_orderkey",
        "l_partkey": "p_partkey",
        "l_suppkey": "s_suppkey",
    },
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
}
BASES = {
    "c_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "p_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}
COPY_AS_IS = ("region", "nation")


def generate(out_dir: str, factor: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    spans = {
        k: con.execute(
            f"SELECT MAX({col}) + 1 FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        for k, (t, col) in BASES.items()
    }

    def write(table: str, select_sql: str) -> None:
        con.execute(
            f"COPY ({select_sql}) TO '{out_dir}/{table}.parquet' "
            f"(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{out_dir}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    for t in COPY_AS_IS:
        write(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    for t, offs in OFFSETS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + cp.i * {spans[offs[c]]} AS {c}" if c in offs else c
            for c in cols
        )
        write(
            t,
            f"SELECT {sel} FROM '{SRC}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS i) cp",
        )

    # documents: per-copy word suffix => disjoint shingle spaces.
    # (Offsets computed MAX+1 like the fact tables — a non-default
    # SPARK_GRAFT_SCALE_SRC must not silently collide ids; empty text
    # stays empty in every copy, guarded in BOTH branches.)
    doc_span = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM '{SRC}/documents.parquet'"
    ).fetchone()[0]
    suffixed = (
        "list_aggregate(list_transform(string_split(text, ' '), "
        "w -> w || 'x' || CAST(cp.i AS VARCHAR)), 'string_agg', ' ')"
    )
    write(
        "documents",
        f"""
        SELECT doc_id + cp.i * {doc_span} AS doc_id,
               CASE WHEN cp.i = 0 OR text = '' OR text IS NULL THEN text
                    ELSE {suffixed} END AS text,
               lang, source,
               CASE WHEN cp.i = 0 OR text = '' OR text IS NULL THEN n_chars
                    ELSE length({suffixed}) END AS n_chars
        FROM '{SRC}/documents.parquet'
        CROSS JOIN (SELECT unnest(range({factor})) AS i) cp
        """,
    )

    # embeddings: copy i rotates the vector by i slots
    vec_span = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM '{SRC}/embeddings.parquet'"
    ).fetchone()[0]
    write(
        "embeddings",
        f"""
        SELECT vec_id + cp.i * {vec_span} AS vec_id,
               CAST(list_concat(embedding[cp.i + 1:], embedding[:cp.i])
                    AS FLOAT[]) AS embedding,
               label
        FROM '{SRC}/embeddings.parquet'
        CROSS JOIN (SELECT unnest(range({factor})) AS i) cp
        """,
    )
    con.close()


if __name__ == "__main__":
    out = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    generate(out, factor)
