"""End-to-end cohort analytics — the statistical aggregate family as
one program over the driver's ``events`` table.

Deterministic A/B split → parametric tests (Student/Welch) with their
nonparametric confirmations (Mann-Whitney, Kolmogorov-Smirnov) → one-way
ANOVA across event types → feature screening (WoE/IV, Cramér's V) →
propensity model (logistic fit on time-of-day features) → per-user
decayed engagement score → dashboard series (moving average + LTTB
downsample). Every stage is an engine API; this file is the composed
recipe with a per-stage report.

Run: ``python examples/cohort_analytics.py [sf_dir]``. Smoke-covered in
``tests/test_examples.py``.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F


def run(spark: SparkSession, sf_dir: str) -> dict:
    from clickhouse_etl_spark.catalog import load_table
    from clickhouse_etl_spark.operators.regression import (
        categorical_information_value,
        logistic_regression_fit,
    )
    from clickhouse_etl_spark.operators.stats import (
        cramers_v,
        exponential_time_decayed_sum,
        quantile_exact_weighted,
    )
    from clickhouse_etl_spark.operators.stattests import (
        kolmogorov_smirnov_test,
        mann_whitney_u_test,
        one_way_anova,
        student_t_test,
        welch_t_test,
    )
    from clickhouse_etl_spark.operators.timeseries import (
        lttb_downsample,
        moving_avg,
    )

    events = load_table(spark, sf_dir, "events")
    report: dict = {"input": events.count()}

    # 1. Deterministic A/B split (hash of the user key — reproducible
    #    across retries, no RNG) and the test battery per event type.
    ab = events.select(
        F.col("event_type").alias("cohort_key"),
        "value",
        (F.xxhash64("user_id") % 2 == 0).cast("int").alias("ab"),
        "user_id",
        "event_id",
        "ts",
    )
    tests = {
        "student": student_t_test(ab, ["cohort_key"], "value", "ab"),
        "welch": welch_t_test(ab, ["cohort_key"], "value", "ab"),
        "mwu": mann_whitney_u_test(ab, ["cohort_key"], "value", "ab"),
        "ks": kolmogorov_smirnov_test(ab, ["cohort_key"], "value", "ab"),
    }
    for name, df in tests.items():
        rows = df.collect()
        ps = [r["p_value"] for r in rows if r["p_value"] is not None]
        # every-p-NULL means no cohort had both samples populated —
        # report the degenerate input instead of crashing on min([])
        report[f"{name}_min_p"] = min(ps) if ps else None
        report[f"{name}_groups"] = len(rows)

    # 2. Does mean value differ across event types at all? (one-way
    #    ANOVA with the type as the category.)
    aov = one_way_anova(events, [], "value", "event_type").collect()[0]
    report["anova_f"] = aov["f_stat"]
    report["anova_p"] = aov["p_value"]

    # 3. Feature screening for "high-value event": WoE/IV of the event
    #    type, and its association with a user bucket (Cramér's V).
    med = quantile_exact_weighted(
        events.withColumn("one", F.lit(1)), [], "value", "one", 0.5
    ).collect()[0]["quantile"]
    flagged = events.withColumn(
        "hi", (F.col("value") > F.lit(med)).cast("int")
    )
    iv = categorical_information_value(flagged, [], "event_type", "hi")
    report["iv_total"] = iv.agg(F.sum("iv")).first()[0]
    cv = cramers_v(
        flagged.withColumn("bucket", (F.col("user_id") % 4).cast("string")),
        [],
        "event_type",
        "bucket",
    ).collect()[0]
    report["cramers_v"] = cv["cramers_v"]

    # 4. Propensity model: P(high-value | time-of-day features), one
    #    global fit — each Newton pass is a single scan.
    feats = flagged.select(
        F.hour("ts").cast("double").alias("hour"),
        F.dayofweek("ts").cast("double").alias("dow"),
        F.col("hi").cast("double").alias("y"),
    )
    fit = logistic_regression_fit(feats, [], ["hour", "dow"], "y").collect()[0]
    report["propensity_converged"] = bool(fit["converged"])
    report["propensity_coefs"] = fit["coefs"]

    # 5. Per-user decayed engagement (tau = 7 days over epoch seconds):
    #    the latest row per user carries the current score.
    scored = exponential_time_decayed_sum(
        events.select(
            "user_id",
            F.unix_timestamp("ts").cast("double").alias("t"),
            "value",
        ),
        ["user_id"],
        "t",
        "value",
        tau=7 * 86400.0,
    )
    latest = (
        scored.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.col("t").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", F.col("decayed_sum").alias("engagement"))
    )
    report["engaged_users"] = latest.count()

    # 6. Dashboard series: daily event counts -> 7-day moving average,
    #    then LTTB down to 50 visually-representative points.
    daily = events.groupBy(
        F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    smoothed = moving_avg(
        daily.withColumn("g", F.lit(1)), ["g"], "day", "n", 7
    )
    report["daily_points"] = smoothed.count()
    down = lttb_downsample(
        smoothed.withColumn("x", F.unix_timestamp("day").cast("double")),
        "x",
        "moving_avg",
        n_out=50,
        group_cols=["g"],
    )
    report["lttb_points"] = down.count()
    return report


if __name__ == "__main__":
    sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))
    from clickhouse_etl_spark import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in run(spark, sf).items():
        print(f"{k}: {v}")
