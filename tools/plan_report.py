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
    # --- round-9 completion: every remaining registry row gets a plan
    # (r8 verdict #4 generalized: "every registry row represented") ---
    "s7_incremental_watermark": "watermark predicate reaches the scan "
    "(PushedFilters); one max-of-batch aggregate commits the new mark",
    "f2_grade_distribution": "pure projection ladder + one hash agg",
    "a7_nested_order_lines": "single groupBy; sort_array(collect_list) "
    "builds the nested details map-side partial first",
    "ext_asof_last_purchase": "right side deduped per (user, ts) then "
    "ONE user-keyed sort-merge as-of (binned range equi-join)",
    "f_scalar_suite": "map-only scalar battery — zero exchanges",
    "pl_copy_students": "scrub + normalize projection over one scan; "
    "runs through the pipeline graph (G1-G3) unchanged",
    "pl_transcript_totals": "A6 credit/GPA totals: one student-keyed "
    "aggregation over the persisted transcript intermediate",
    "ext_rollup_part_stats": "ROLLUP grouping sets in one aggregation "
    "pass (partial→final, no per-level re-scan)",
    "ext_pivot_status_by_region": "pivot = one groupBy with literal "
    "pivot columns; no per-status scan",
    "ext_hypertable_rollup": "time_bucket projection then one hash agg "
    "on (bucket, user)",
    "ext_bm25_topk": "corpus stats as broadcast scalars; postings "
    "capped; one topk window over scored docs",
    "ext_summing_merge": "two incremental batches fold through the "
    "same keyed aggregate; map-side partials do the summing",
    "ext_collapsing_merge": "ONE aggregation shuffle on the key: "
    "map-side partial folds the ±1 counts; max_by picks the surviving "
    "+1 payload; net<=0 keys filtered post-agg (r9 promotion)",
    # round-10 rotation, batch 6
    "ext_snapshot_diff": "ONE full-outer hash join on the key; change "
    "classification + unchanged-row filter ride the join projection — "
    "both sides fact-sized, nothing broadcast (r10 promotion)",
    "ext_funnel_strict_order": "per-user window sort + LEAD chain — one "
    "user-keyed exchange, zero joins; strictness is the consecutive-"
    "event predicate on the LEADs (r10 promotion)",
    "ext_fuzzy_pairs": "length-split q-gram candidate self-join "
    "(provable completeness bound) + JVM levenshtein verify; short "
    "strings pair at the distinct-VALUE level, never row×row (r10 "
    "promotion)",
    "ext_fill_time_gaps": "per-key span aggregate + sequence() explode "
    "— gap rows are GENERATED, not joined against a calendar table",
    "ext_cramers_v": "one contingency aggregation per pair; the "
    "chi-square fold runs on the bounded contingency table",
    "ext_quantiles_weighted": "single pass: weighted quantile states "
    "fold map-side; driver sees 3 state rows",
    "ext_rank_corr": "per-cell rank windows feed one covariance "
    "aggregate (the r7-adjudicated cell-rebuild trade, exp 0.06)",
    "ns_fingerprint": "map-only md5 + rolling-hash projection",
    "ns_chunk_documents": "map-only token-window explode (1 doc → N "
    "chunks); no shuffle",
    "ns_mm_pipeline": "Arrow mapInPandas decode/resize/frame-sample "
    "seams; binary payloads never shuffle",
    "ns_ann_lsh": "fused bounded probe (dims+floor, one job) then "
    "ids-only hyperplane bucket join; Arrow GEMM verify",
    "ns_ann_ivf": "coarse-cell prune (nprobe cells broadcast); exact "
    "re-rank only inside probed cells",
    "ns_gopher_quality": "one narrow pass: stopword/punct/repetition "
    "columns as JVM expressions, no Python",
    "ns_duplicated_spans": "xxhash64 gram keys → dup-set join-back; "
    "islands merge + final agg share ONE doc_id exchange",
    # round-11 rotation, batch 7
    "ext_window_funnel_dedup": "step flags precomputed JVM-side, ONE "
    "user-key shuffle + Tungsten sort, then a single mapInPandas pass "
    "per partition (O(1) automaton state per user, state carried "
    "across Arrow batches) — the interrupt-on-repeat automaton no "
    "LEAD ladder can express (r11 promotion + perf pass)",
    "ext_sequence_count": "same single user-key shuffle + Tungsten sort + "
    "one mapInPandas pass per partition; O(k) candidate-chain state "
    "per user, max-anchor dominance (r11 promotion + perf pass)",
    # round-12 rotation, batch 8
    "ext_quality_gate": "six expectation rules: the four row-level "
    "violation counts fold in ONE aggregate pass over the scan; the "
    "unique rule is one distinct-count job; rule rows assemble "
    "driver-side from k scalars (r12 promotion)",
    "ext_zorder_layout": "map-only Morton encoding — literal boundary "
    "cuts become a CASE ladder + bit-interleave expressions, zero "
    "exchanges; the write path range-partitions on the emitted zval "
    "(r12 promotion)",
}

# Iterative / driver-coordinated rows: a single final-result plan is
# unrepresentative (the work happens in per-step jobs whose plans are
# identical in shape), so PLANS.md carries a job-level profile instead
# — what runs per step, what is broadcast, what shuffles (r8 verdict
# #4). The final-result plan is still printed under the profile.
PROFILES = {
    "ext_logreg_fit": (
        "Newton/IRLS, one JVM aggregation JOB per step (max_iter=25 "
        "cap): the k-models × (p+1) coefficient table is BROADCAST-"
        "joined onto the rows each step; mu/weights are JVM column "
        "math; the per-group Hessian upper triangle (p(p+3)/2 sums) "
        "and gradient fold map-side and SHUFFLE only the group key; "
        "the driver receives k rows of moments per step and solves "
        "p×p updates in numpy. Converged groups drop out of later "
        "passes. Cardinality guard = ONE limit(max_groups+1) collect "
        "before the loop; the filtered base is persisted once and "
        "re-scanned per step (at 100 TB: max_iter scans of the "
        "projected base, the textbook IRLS cost). Final plan below is "
        "the assembled coefficient table (LocalTableScan) — the "
        "per-step aggregation plans are the workload."
    ),
    "ns_dsir_select": (
        "Three bounded stages, each one job-chain: (1) featurize+fit — "
        "hashed n-gram buckets explode map-side, per-bucket counts "
        "SHUFFLE the bucket key only (num_buckets rows out), smoothed "
        "log-ratios computed driver-side on the bounded bucket table "
        "and re-BROADCAST; (2) score — per-doc sum of broadcast "
        "ratios, ONE shuffle on doc_id for the score aggregation; "
        "(3) Gumbel top-n — deterministic affine-permutation noise as "
        "a projection, TakeOrdered(n) (no global sort), then the "
        "picked ids join back to the raw rows (AQE-elective "
        "broadcast: n rows). Corpus text never rides a shuffle."
    ),
    "ns_train_bpe": (
        "Driver-coordinated merge loop (canonical BPE, batch_size=1, "
        "8 merges): ONE corpus-scale word_counts pass up front (explode "
        "+ groupBy word), then per merge round one vocab-scale job — "
        "adjacent-pair counts fold map-side, orderBy+limit(1) is a "
        "TakeOrdered argmax (driver sees ONE (a,b) pair per round, "
        "never data) — and the merge applies as a map-only array fold. "
        "Lineage is cut every 8 folds (materialize_every) so Catalyst "
        "re-analysis can't grow per round. At 100 TB the corpus pass "
        "dominates; rounds run at vocabulary scale (capped via "
        "sample_vocabulary in the full recipe). Final plan below is "
        "the last fold over the materialized symbol table."
    ),
    "ext_matview_incremental": (
        "Materialized-view maintenance replay (r11 promotion): one "
        "refresh_full + two refresh_incremental calls, each ONE keyed "
        "aggregation job — the incremental deltas' watermark predicate "
        "reaches the source scan (PushedFilters), the summing merge "
        "shuffles only (status, priority) keys, and each publish "
        "writes a 15-row snapshot. At 100 TB the delta scan is "
        "O(new data) and the merge is O(delta + touched keys); the "
        "final-result plan below is just the published-snapshot read."
    ),
    "ns_cluster_assign": (
        "k-means: train iterates one GEMM-assignment + centroid-mean "
        "job per round over a persisted sample (driver holds k×dims "
        "floats only); the registered row then assigns the full corpus "
        "in ONE Arrow mapInPandas pass with the trained centroids "
        "broadcast. No corpus shuffle in either phase."
    ),
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
    # Every registry row gets an entry: the curated HEADLINERS first,
    # then the remaining registered rows in registry order, then the
    # library-operator extras. Iterative rows additionally carry their
    # PROFILES paragraph (their final-result plan alone is
    # unrepresentative).
    rest = [
        (n, "registry row — plan recorded for full-inventory coverage")
        for n in QUERIES
        if n not in HEADLINERS
    ]
    items = [
        (name, QUERIES[name](spark, sf_dir), note)
        for name, note in list(HEADLINERS.items()) + rest
        if name in QUERIES
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
        out += [f"## {name}", "", f"*{note}*", ""]
        if name in PROFILES:
            out += ["**Job profile** (iterative/driver-coordinated row — "
                    "the per-step jobs are the workload):", "",
                    PROFILES[name], ""]
        out += ["```"]
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
