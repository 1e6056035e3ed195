"""The examples are executable documentation — smoke-run both and
assert the reports they return are sane (a broken example is worse
than none: it documents an API that doesn't exist)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"


def test_reference_warehouse_example(spark, tmp_path):
    from examples.reference_warehouse import run

    r = run(spark, SF_DIR, str(tmp_path / "wh"))
    assert r["students"] > 0
    assert r["fact_rows"] > 0 and r["fact_cols"] >= 35
    assert r["transcript_rows"] > 0
    # the gate runs; fixtures are clean on the hard rules
    assert r["violations"]["not_null(studentId)"] == 0
    assert r["violations"]["unique(subjectEvaluationId, studentId)"] == 0
    assert r["view_schools"] >= 1
    assert isinstance(r["retention_deleted"], list)


def test_cohort_analytics_example(spark):
    from examples.cohort_analytics import run

    r = run(spark, SF_DIR)
    assert r["input"] == 1000
    for name in ["student", "welch", "mwu", "ks"]:
        assert 0.0 <= r[f"{name}_min_p"] <= 1.0
        assert r[f"{name}_groups"] >= 2
    assert r["anova_f"] is not None and 0.0 <= r["anova_p"] <= 1.0
    assert r["iv_total"] >= 0.0
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["propensity_converged"]
    assert len(r["propensity_coefs"]) == 2
    assert r["engaged_users"] > 0
    assert r["lttb_points"] <= min(50, r["daily_points"])


def test_training_corpus_example(spark):
    from examples.training_corpus import run

    r = run(spark, SF_DIR)
    assert r["input"] == 500
    assert 0 < r["post_screens"] <= r["input"]
    assert r["bm25_probe_rows"] == 5
    assert r["packed_docs"] == r["post_screens"]
    assert 0.8 < r["train_frac"] <= 1.0
    # crawl layer ran: blocklist + canonical-URL dedup counts precede
    # the text stages, and the shard writer landed >= 1 shard
    assert r["domain_filter"] < r["input"]
    assert r["url_dedup"] <= r["domain_filter"]
    assert r["n_shards"] >= 1


def test_entity_resolution_example(spark):
    from examples.entity_resolution import run

    r = run(spark, SF_DIR)
    assert r["canonical"] > 0 and r["feed"] > 0
    # every feed row is within distance 1 of its true source, so
    # linkage must cover the whole feed and point mostly at the truth
    assert r["linked"] == r["feed"]
    assert r["link_precision"] is not None and r["link_precision"] > 0.95
    # survivorship merges on the canonical key: row count is unchanged
    assert r["merged"] == r["canonical"]


def test_streaming_sessions_example(spark, tmp_path):
    from examples.streaming_sessions import run

    r = run(spark, SF_DIR, str(tmp_path / "stream_ex"))
    assert r["hourly_windows"] > 0 and r["sessions"] > 0
    assert r["mean_session_events"] >= 1.0
    # funnel levels are 1..3 and at least one user anchored
    assert r["funnel_levels"] and set(r["funnel_levels"]) <= {1, 2, 3}
    # the upsert snapshot holds exactly the distinct users in the zone
    assert r["snapshot_users"] > 0
