"""Generate PLANS.md — formatted physical plans for the headline queries.

Evidence artifact for plan-quality review: shows which joins broadcast,
where filters/projections reach the scans, and that no Python appears in
relational paths. Regenerate after plan-affecting changes:

    python tools/plan_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

HEADLINERS = {
    "q1_pricing_summary": "filter → single hash agg; pushdown + codegen",
    "flagship_wide_fact": "fact⨝fact shuffle join once; constant dims "
    "broadcast by hint, growing dim (customer) left to AQE",
    "p3_latest_event_per_user": "single shuffle on the dedup key; "
    "projection trimmed before the window",
    "a5_hierarchical_rollup": "fact aggregated once; leveled tree walk, "
    "single lazy plan",
    "j9_semi_customers_with_orders": "key-set semi join (broadcast), no "
    "fact shuffle",
    "pl_monthly_subject_fact": "full reference lifecycle: persisted "
    "shared intermediates, fused avg+rep+JSON aggregations, ONE "
    "full-outer precedence SMJ, AQE on growing dims",
    "pl_transcript_details": "transcript chain (A2+A4) + 18-field tuple "
    "exploded; per-(student, structure) grouping",
    "ns_minhash_neardup": "banded LSH self-join; candidates verified "
    "against semi-joined shingle sets only",
    "ns_emb_neardup": "ids-only hyperplane bucket self-join; deduped "
    "pair list joins straight back to the corpus (AQE-elective "
    "broadcast), vectors never ride a shuffle (r5 de-staging)",
    "ext_scd2_lookup": "one window over the change log + interval "
    "equi-join on the key; at most one match per fact is structural",
    # round-7 registry promotions (ns_cosine_topk demoted with its twin
    # oracle; the IVFADC row inherits its exact re-rank machinery)
    "ns_pq_ivfadc": "ONE fused map-only corpus pass (cell argmin + code "
    "argmins as literals); query cells + LUTs broadcast; shuffles only "
    "the two per-query top-k windows over shortlisted rows",
    # round-8 rotation-4 promotions
    "ext_linreg_fit": "per-group OLS: the p(p+3)/2 moment upper-triangle "
    "folds as plain JVM sums (map-side combinable, ONE shuffle on the "
    "group key); the p×p solve runs on the k-row moment table only",
    "ns_curate_corpus": "the composed curation chain: digest-keyed exact "
    "dedup, banded MinHash + min-label closure, span islands, quality "
    "gate — each stage consumes the previous lazily; no stage adds an "
    "exchange beyond its own operator's",
    "ns_semantic_dedup": "cells prune the pair search; per-cell BLAS "
    "GEMM kernel (applyInPandas) scores pairs — sub-threshold "
    "candidates never exist as rows; min-label closure over pair ids, "
    "anti-join keep-set",
    "stream_session_30m": "built-in session_window merge (batch form)",
    "ext_running_revenue": "single window sort per customer partition",
    "ext_range_join_windows": "binned range equi-join; aggregation pushed "
    "below the outer join (interval dim re-attaches on aggregate rows)",
    # round-6 registry promotions
    "ns_url_dedup": "map-side canonicalization (regex/array exprs only) "
    "then ONE shuffle on the canonical key; unparsed rows union back",
    "ns_shard_plan": "two-level distributed prefix sum — partition "
    "partials to the driver (bounded), offsets re-broadcast; no global "
    "window",
    "ns_frequent_terms": "mapInPandas partition summaries (bounded) → "
    "broadcast semi-join → exact counts; corpus never shuffles raw rows",
    "ext_window_funnel": "anchor aggregate + one user-keyed join per "
    "step; each join shuffles only the user key",
}


def _extra_plans(spark, sf_dir):
    """Library operators outside the 50-query registry whose plans are
    part of the scale-design evidence."""
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.operators.events import sessionize, window_funnel
    from clickhouse_etl_spark.sinks.zorder import zorder_value
    from clickhouse_etl_spark.text.pq import (
        init_codebooks,
        ivf_pq_topk,
    )
    from clickhouse_etl_spark.text.similarity import semantic_cluster_pairs
    from clickhouse_etl_spark.text.spans import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    emb = load_table(spark, sf_dir, "embeddings")
    books = init_codebooks(emb, m=4, ksub=8)
    cents = [
        [float(x) for x in r.embedding]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    return {
        "lib:ivf_pq_topk": (
            ivf_pq_topk(
                emb, emb.limit(3), cents, books, k=5, nprobe=2
            ),
            "IVFADC: ONE fused map-only cells+codes projection (no "
            "corpus join), broadcast query→cell and query→LUT sides, "
            "shuffles only the two per-query top-k windows",
        ),
        "lib:semantic_cluster_pairs": (
            semantic_cluster_pairs(emb, cents, threshold=0.35),
            "SemDeDup: ids+cell-only self-join, vectors re-attach to "
            "the collision-bounded pair list (AQE-elective)",
        ),
        "lib:duplicated_spans": (
            duplicated_spans(docs, k=8),
            "shingle inverted index → dup-set join; islands merge + final "
            "agg share ONE exchange on doc_id",
        ),
        "lib:window_funnel": (
            window_funnel(
                events,
                ["event_type = 'signup'", "event_type = 'view'",
                 "event_type = 'purchase'"],
                86400,
            ),
            "one user-keyed join per funnel step; no event-table self-"
            "cartesian",
        ),
        "lib:sessionize": (
            sessionize(events),
            "single user-keyed window pass, codegen throughout",
        ),
        "lib:zorder_value": (
            zorder_value(
                orders, ["o_custkey", "o_totalprice"], bits=4,
                boundaries={
                    "o_custkey": [float(c) for c in range(100, 1600, 100)],
                    "o_totalprice": [float(p) for p in range(20000, 320000, 20000)],
                },
            ),
            "bucket fold + Morton unroll as pure projection — no shuffle "
            "until the final range partition",
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("plan_report")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from clickhouse_etl_spark.queries import QUERIES

    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode

    out = [
        "# PLANS — formatted physical plans for the headline queries",
        "",
        f"Auto-generated by `tools/plan_report.py` at sf_dir=`{sf_dir}`.",
        "Shows the *initial* AQE plan (final plans may further coalesce/"
        "convert joins at runtime).",
        "",
    ]
    items = [
        (name, QUERIES[name](spark, sf_dir), note)
        for name, note in HEADLINERS.items()
    ] + [
        (name, df, note)
        for name, (df, note) in _extra_plans(spark, sf_dir).items()
    ]
    for name, df, note in items:
        plan = df._jdf.queryExecution().explainString(
            jvm_mode.fromString("formatted")
        )
        # keep the operator tree + the scan details; drop the long
        # per-node field dumps except scans (PushedFilters/ReadSchema).
        lines = plan.splitlines()
        tree_end = next(
            (i for i, l in enumerate(lines) if not l.strip()), len(lines)
        )
        tree = lines[:tree_end]
        scan_details = [
            l
            for l in lines[tree_end:]
            if any(k in l for k in ("Scan parquet", "PushedFilters", "ReadSchema", "(1) "))
        ]
        out += [f"## {name}", "", f"*{note}*", "", "```"]
        out += tree
        if scan_details:
            out += ["", "-- scan details --"] + scan_details[:12]
        out += ["```", ""]

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(items)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
