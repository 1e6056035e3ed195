"""Corpus mixing (mix_corpora) — determinism, weights, epoch logic."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from clickhouse_etl_spark.catalog import load_table
from clickhouse_etl_spark.operators.sampling import mix_corpora

SF_DIR = "/root/testdata/sf0.001"


def _sources(spark):
    docs = load_table(spark, SF_DIR, "documents")
    # Split the corpus into two pseudo-sources of unequal size.
    web = docs.filter(F.col("doc_id") % 5 != 0)   # ~400 docs
    books = docs.filter(F.col("doc_id") % 5 == 0)  # ~100 docs
    return {"web": web, "books": books}


def test_mixture_hits_weights(spark):
    srcs = _sources(spark)
    out = mix_corpora(srcs, {"web": 0.5, "books": 0.5}, ["doc_id"], max_epochs=4)
    counts = {r.source_name: r.n for r in
              out.groupBy("source_name").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    # books (100 docs) binds at 4 epochs: T = min(400*4/.5, 100*4/.5) = 800.
    assert total == pytest.approx(800, rel=0.05)
    assert counts["books"] == pytest.approx(total / 2, rel=0.1)
    assert counts["web"] == pytest.approx(total / 2, rel=0.1)


def test_no_upsample_binds_on_smallest(spark):
    srcs = _sources(spark)
    out = mix_corpora(srcs, {"web": 0.8, "books": 0.2}, ["doc_id"])
    # max_epochs=1: every row appears at most once, epoch is always 1.
    per_key = out.groupBy("source_name", "doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_key.filter(F.col("n") > 1).count() == 0
    assert out.select(F.max("epoch")).first()[0] == 1
    # web binds: T = min(400/0.8, 100/0.2) = 500 -> web fully consumed.
    n_web = out.filter(F.col("source_name") == "web").count()
    assert n_web == pytest.approx(400, rel=0.05)


def test_epoch_multiplicity_exact(spark):
    """Full epochs repeat every row exactly; only the fractional epoch
    is sampled."""
    srcs = _sources(spark)
    out = mix_corpora(srcs, {"web": 0.2, "books": 0.8}, ["doc_id"],
                      total=500, max_epochs=5)
    # books needs 400 of 100 docs -> exactly 4 full epochs, no fraction.
    books = out.filter(F.col("source_name") == "books")
    per_doc = books.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    assert {r.n for r in per_doc.collect()} == {4}
    assert books.count() == 400


def test_deterministic_across_runs(spark):
    srcs = _sources(spark)
    kw = dict(weights={"web": 0.6, "books": 0.4}, key_cols=["doc_id"], max_epochs=3)
    a = {tuple(r) for r in
         mix_corpora(srcs, **kw).select("source_name", "doc_id", "epoch").collect()}
    b = {tuple(r) for r in
         mix_corpora(srcs, **kw).select("source_name", "doc_id", "epoch").collect()}
    assert a == b and a


def test_infeasible_demand_raises(spark):
    srcs = _sources(spark)
    with pytest.raises(ValueError, match="raise max_epochs"):
        mix_corpora(srcs, {"web": 0.1, "books": 0.9}, ["doc_id"],
                    total=5000, max_epochs=2)
    with pytest.raises(ValueError, match="sum to 1.0"):
        mix_corpora(srcs, {"web": 0.5, "books": 0.2}, ["doc_id"])


def test_stratified_threshold_rounds_not_truncates(spark):
    """fraction*1e6 that lands on x.9999... must round UP (0.3 -> bucket
    threshold 300000, matching DuckDB CAST and the driver-side round)."""
    from clickhouse_etl_spark.operators.sampling import (
        stratified_deterministic_sample,
    )

    df = spark.range(1_000_000).selectExpr(
        "id", "'s' AS grp", "CAST(id AS BIGINT) AS bucket"
    )
    out = stratified_deterministic_sample(
        df,
        strata_col="grp",
        fractions={"s": 0.3},
        key_cols=["id"],
        bucket_expr=F.col("bucket"),
    )
    # bucket values are 0..999999 directly: exact count proves threshold.
    assert out.count() == 300_000


def test_write_shards_layout(spark, tmp_path):
    """One parquet file per shard dir, rows inside sorted by id, and
    the written corpus reads back complete with correct shard routing."""
    import glob

    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.text.packing import write_shards

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "shards")
    plan = write_shards(docs, out, tokens_per_shard=4096)
    shard_ids = sorted(r.shard for r in plan.select("shard").distinct().collect())
    assert shard_ids == list(range(len(shard_ids)))  # dense from 0
    for s in shard_ids:
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert len(files) == 1, f"shard {s}: {len(files)} files"
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # routing matches the plan
    got = {r.doc_id: r.shard for r in back.select("doc_id", "shard").collect()}
    want = {r.doc_id: r.shard for r in plan.collect()}
    assert got == want
    # in-file order is the stream order
    import pyarrow.parquet as pq

    f = glob.glob(f"{out}/shard={shard_ids[0]}/*.parquet")[0]
    ids = pq.read_table(f, columns=["doc_id"]).column("doc_id").to_pylist()
    assert ids == sorted(ids)
