"""End-to-end entity resolution — the record-linkage family as one
program over the driver's ``customer`` table.

Manufacture a dirty feed (substitution typos, dropped characters,
verbatim duplicates) → exact dedup by normalized key → within-table
near-miss pairs (``fuzzy_self_pairs``, q-gram blocking with the
saturation guard) → cross-table linkage against the canonical
dimension (``fuzzy_join``) → survivorship (keep the canonical id per
matched cluster, last-write-wins for the rest through
``merge_upsert``). Every stage is an engine API; this file is the
composed recipe with a per-stage report.

Run: ``python examples/entity_resolution.py [sf_dir]``. Smoke-covered
in ``tests/test_examples.py``.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str) -> dict:
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.operators.fuzzy import (
        fuzzy_join,
        fuzzy_self_pairs,
    )
    from clickhouse_etl_spark.sinks.upsert import merge_upsert

    customer = load_table(spark, sf_dir, "customer")
    report: dict = {"canonical": customer.count()}

    # 1. Canonical dimension: gram-selective 12-hex keys (md5 of the
    #    business key — stands in for real entity names; the padded
    #    synthetic c_name has constant-prefix grams, see the
    #    ext_fuzzy_pairs fixture note).
    key_str = F.col("c_custkey").cast("string")
    canonical = customer.select(
        F.col("c_custkey").alias("entity_id"),
        F.substring(F.md5(F.encode(key_str, "UTF-8")), 1, 12).alias("name"),
        F.col("c_acctbal").alias("balance"),
    )

    # 2. A dirty inbound feed: every 4th entity re-arrives — half with
    #    a substitution typo, half verbatim; ids are feed-local (no
    #    shared key with the dimension, which is WHY linkage is fuzzy).
    feed = customer.filter(F.col("c_custkey") % 4 == 0).select(
        (F.col("c_custkey") + 10_000_000).alias("feed_id"),
        F.when(
            F.col("c_custkey") % 8 == 0,
            F.concat(
                F.lit("z"),
                F.substring(F.md5(F.encode(key_str, "UTF-8")), 2, 11),
            ),
        )
        .otherwise(F.substring(F.md5(F.encode(key_str, "UTF-8")), 1, 12))
        .alias("name"),
        F.col("c_acctbal").alias("balance"),
        F.col("c_custkey").alias("true_source"),  # ground truth, report only
    )
    report["feed"] = feed.count()

    # 3. Within-feed near-miss audit: typo'd re-arrivals that ALSO
    #    nearly collide with each other (data-quality signal, not
    #    linkage). q='auto' sizes the gram space to the corpus; the
    #    guard would refuse a saturated configuration loudly.
    self_pairs = fuzzy_self_pairs(
        feed, "name", max_distance=1, id_col="feed_id", q="auto"
    ).filter(F.col("distance") > 0)
    report["feed_near_pairs"] = self_pairs.count()

    # 4. Cross-table linkage: feed → canonical within one edit. One
    #    gram-keyed hash join; both sides fact-sized, nothing
    #    broadcast, nothing collected.
    links = fuzzy_join(
        feed,
        canonical,
        "name",
        max_distance=1,
        left_id="feed_id",
        right_id="entity_id",
        q="auto",
    )
    # Best match per feed row: smallest distance, ties to the lowest
    # canonical id (deterministic survivorship).
    best = (
        links.groupBy("id_l")
        .agg(F.min(F.struct("distance", "id_r")).alias("b"))
        .select(
            F.col("id_l").alias("feed_id"),
            F.col("b.id_r").alias("entity_id"),
            F.col("b.distance").alias("distance"),
        )
    )
    matched = best.count()
    report["linked"] = matched
    # Ground-truth precision (the feed knows its true source): how many
    # best-matches point at the row that actually produced the entry.
    truth = feed.select("feed_id", "true_source")
    correct = (
        best.join(truth, "feed_id")
        .filter(F.col("entity_id") == F.col("true_source"))
        .count()
    )
    report["link_precision"] = round(correct / matched, 4) if matched else None

    # 5. Survivorship: matched feed rows update their canonical entity
    #    (feed wins — it is newer); a keyed merge, ONE shuffle.
    updates = (
        best.join(feed, "feed_id")
        .select("entity_id", "name", "balance", F.lit(1).alias("ver"))
    )
    merged = merge_upsert(
        canonical.withColumn("ver", F.lit(0)),
        updates,
        keys=["entity_id"],
        order_col="ver",
    )
    report["merged"] = merged.count()
    return report


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from clickhouse_etl_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = run(get_spark(master="local[8]"), sf)
    print(out)
