"""Relational operator layer (SURVEY.md §2.3-2.8)."""

from clickhouse_etl_spark.operators.dedup import (  # noqa: F401
    latest_row_per_key,
    last_write_wins,
    scrub_invalid_keys,
    exact_distinct,
)
from clickhouse_etl_spark.operators.joins import (  # noqa: F401
    broadcast_dim_join,
    semi_join_pushdown,
    anti_join,
    hierarchy_parent_join,
)
from clickhouse_etl_spark.operators.aggregates import (  # noqa: F401
    avg_null_dropped,
    avg_null_as_zero,
    weighted_average,
    avg_of_avgs,
    credit_totals,
    nested_details,
    json_details,
    sum_map,
)
from clickhouse_etl_spark.operators.rollup import (  # noqa: F401
    hierarchical_rollup,
    hierarchical_rollup_by_level,
)
from clickhouse_etl_spark.operators.skew import (  # noqa: F401
    salted_join,
    salted_sum_count,
)
from clickhouse_etl_spark.operators.sampling import (  # noqa: F401
    assign_splits,
    mix_corpora,
    stratified_deterministic_sample,
)
from clickhouse_etl_spark.operators.sketches import frequent_items  # noqa: F401
from clickhouse_etl_spark.operators.grouped import (  # noqa: F401
    histogram_fixed,
    mad_outliers_jvm,
    top_k_per_group,
)
from clickhouse_etl_spark.operators.events import (  # noqa: F401
    interval_length_sum,
    max_intersections,
    retention_flags,
    retention_summary,
    sequence_match,
    sessionize,
    window_funnel,
)
from clickhouse_etl_spark.operators.fuzzy import fuzzy_self_pairs  # noqa: F401
from clickhouse_etl_spark.operators.timeseries import (  # noqa: F401
    delta_sum,
    lttb_downsample,
)
from clickhouse_etl_spark.operators.stats import (  # noqa: F401
    bounding_ratio,
    contingency,
    corr_matrix,
    covar_matrix,
    cramers_v,
    entropy,
    exponential_moving_average,
    exponential_time_decayed_avg,
    exponential_time_decayed_sum,
    group_array_sample,
    moments_suite,
    quantile_exact_weighted,
    quantiles_exact_weighted,
    simple_linear_regression,
    theils_u,
    uniq_up_to,
)
from clickhouse_etl_spark.operators.stattests import (  # noqa: F401
    kolmogorov_smirnov_test,
    mann_whitney_u_test,
    mean_z_test,
    min_sample_size_continuous,
    min_sample_size_conversion,
    one_way_anova,
    proportions_z_test,
    spearman_rank_corr,
    student_t_test,
    welch_t_test,
)
from clickhouse_etl_spark.operators.regression import (  # noqa: F401
    categorical_information_value,
    linear_regression_fit,
    logistic_regression_fit,
)
