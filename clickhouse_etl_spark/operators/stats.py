"""Statistical aggregate operators — the ClickHouse analytic-aggregate
family (``simpleLinearRegression``, ``boundingRatio``, ``entropy``,
``cramersV``, ``uniqUpTo``, ``exponentialTimeDecayed*``,
``quantileExactWeighted``) re-expressed as grouped DataFrame plans.

Every operator here is pure JVM column algebra — no Python UDFs, no
collects — and each aggregation is a hash shuffle on the group keys
with map-side partial aggregation, so the plans hold at cluster scale.

reference: the reference ETL (RothaSAMON/clickhouse_etl) targets
ClickHouse tables, whose users lean on these aggregates for analytics
on the loaded data (e.g. score-vs-credit trends over the transcript
facts built by apps/airflow/dags/student/*.py); this module provides
the Spark-side equivalents so those follow-on queries run in-engine.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def simple_linear_regression(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    slope_out: str = "slope",
    intercept_out: str = "intercept",
) -> DataFrame:
    """ClickHouse ``simpleLinearRegression(x, y)``: per-group ordinary
    least squares over the (x, y) pairs, returning ``(slope,
    intercept)`` of the fitted line ``y = slope*x + intercept``.

    Built on Spark's native ``regr_slope`` / ``regr_intercept``
    aggregates (JVM, one hash aggregation, map-side partials) — the
    moment sums (Σx, Σy, Σxy, Σx²) combine associatively, so this is a
    single shuffle on the group keys at any scale.

    Semantics: rows where either coordinate is NULL are ignored (SQL
    ``REGR_*`` semantics, matching ClickHouse's NULL-skipping
    aggregates). A group with < 2 distinct x values has an undefined
    slope and yields NULL for both outputs (ClickHouse returns
    ``nan``; NULL is the engine-native encoding of the same
    "no line fits" signal).
    """
    return df.groupBy(*keys).agg(
        F.regr_slope(F.col(y_col), F.col(x_col)).alias(slope_out),
        F.regr_intercept(F.col(y_col), F.col(x_col)).alias(intercept_out),
    )


def bounding_ratio(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    out: str = "bounding_ratio",
) -> DataFrame:
    """ClickHouse ``boundingRatio(x, y)``: per group, the slope of the
    chord between the leftmost and rightmost points —
    ``(y_at_max_x - y_at_min_x) / (max_x - min_x)``. The cheap
    "overall rate of change" summary for a time series (x = time,
    y = cumulative counter).

    One hash aggregation: ``min_by``/``max_by`` pick the y endpoints,
    ``min``/``max`` the x extent — all associative, all map-side
    combinable. Groups whose x extent is zero (a single point, or all
    x equal) yield NULL (ClickHouse divides to ``inf``/``nan``; NULL
    is the engine-native encoding). Rows with a NULL x are ignored; a
    NULL y at an endpoint propagates NULL, matching the "no data"
    reading.
    """
    x, y = F.col(x_col), F.col(y_col)
    lo, hi = F.min(x), F.max(x)
    ratio = F.when(
        hi != lo, (F.max_by(y, x) - F.min_by(y, x)) / (hi - lo)
    )
    return df.groupBy(*keys).agg(ratio.alias(out))


def entropy(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out: str = "entropy",
) -> DataFrame:
    """ClickHouse ``entropy(x)``: Shannon entropy (base 2) of the value
    distribution within each group, ``-sum p_i * log2(p_i)`` with
    ``p_i = count(v_i) / count(*)``.

    Two hash aggregations, both map-side combinable: the first counts
    each distinct ``(keys, value)`` cell, the second folds the cells
    into the entropy sum. The second shuffle carries at most one row
    per distinct value — already the compressed representation — so
    the plan is a textbook two-level rollup that scales with the
    number of distinct values, not the number of rows. NULL values
    count as a regular category (ClickHouse hashes NULL like any other
    key); an empty group never appears (no rows, no group).
    """
    cells = df.groupBy(*keys, F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    n = F.sum("__c")
    # -sum(c*log2(c))/n + log2(n) is sum(p*log2(1/p)) refactored so a
    # single pass over the cells needs no pre-computed group total.
    ent = F.log2(n) - F.sum(F.col("__c") * F.log2("__c")) / n
    return cells.groupBy(*keys).agg(ent.alias(out))


def uniq_up_to(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n: int,
    out: str = "uniq_up_to",
) -> DataFrame:
    """ClickHouse ``uniqUpTo(N)(x)``: exact distinct count if the group
    has at most ``N`` distinct values, else ``N + 1`` ("more than N").

    Spark has no early-stopping distinct sketch, but the contract only
    needs ``least(count_distinct, N+1)``: Catalyst expands
    ``count_distinct`` into the standard two-phase distinct aggregate
    (partial dedup map-side, exact count after the key shuffle), and
    the ``least`` is a free projection. NULLs are ignored by
    ``count_distinct`` — ClickHouse's ``uniq*`` family likewise skips
    NULL for the non-Nullable path; callers who need NULL counted as a
    value should coalesce to a sentinel first.
    """
    if n < 1:
        raise ValueError(f"uniq_up_to needs n >= 1, got {n}")
    return df.groupBy(*keys).agg(
        F.least(F.count_distinct(F.col(value_col)), F.lit(n + 1)).alias(out)
    )


def cramers_v(
    df: DataFrame,
    keys: Sequence[str],
    a_col: str,
    b_col: str,
    out: str = "cramers_v",
    bias_corrected: bool = False,
) -> DataFrame:
    """ClickHouse ``cramersV(a, b)``: association strength between two
    categorical columns per group — ``sqrt((chi2/n) / (min(r,c) - 1))``
    where ``chi2`` is the Pearson chi-squared statistic of the a×b
    contingency table, ``n`` the row count, ``r``/``c`` the distinct
    category counts.

    Plan: one hash aggregation builds the contingency cells
    ``(keys, a, b, count)``; two window sums over the cells (partitions
    ``keys×a`` and ``keys×b``) attach the marginals — each window is a
    shuffle of the *cells*, not the rows, so cost tracks distinct
    category pairs; a final hash aggregation folds chi2. Rows where
    either column is NULL are dropped (ClickHouse requires
    non-Nullable args). Groups where either column is constant
    (``min(r,c) = 1``) have an undefined statistic and yield NULL
    (ClickHouse returns ``nan``).

    ``bias_corrected=True`` is ClickHouse ``cramersVBiasCorrected``:
    the Bergsma correction —
    ``phi2' = max(0, chi2/n - (r-1)(c-1)/(n-1))``,
    ``r' = r - (r-1)^2/(n-1)``, ``c' = c - (c-1)^2/(n-1)``,
    ``V = sqrt(phi2' / min(r'-1, c'-1))`` — removing the upward bias V
    shows on small samples with many categories.
    """
    cells = _contingency_cells(df, keys, a_col, b_col)
    n = F.first("__n")
    r = F.count_distinct(F.col("__a"))
    c = F.count_distinct(F.col("__b"))
    if bias_corrected:
        phi2c = F.greatest(
            _chi2_agg() / n - (r - 1) * (c - 1) / (n - 1), F.lit(0.0)
        )
        rc = r - (r - 1) * (r - 1) / (n - 1)
        cc = c - (c - 1) * (c - 1) / (n - 1)
        dof = F.least(rc, cc) - F.lit(1.0)
        v = F.when((F.least(r, c) > 1) & (dof > 0), F.sqrt(phi2c / dof))
    else:
        dof = F.least(r, c) - F.lit(1)
        v = F.when(dof > 0, F.sqrt(_chi2_agg() / n / dof))
    return cells.groupBy(*keys).agg(v.alias(out))


def _contingency_cells(
    df: DataFrame, keys: Sequence[str], a_col: str, b_col: str
) -> DataFrame:
    """Contingency cells ``(keys, __a, __b, __c)`` with the row/column/
    total marginals attached (``__ra``, ``__cb``, ``__n``). One hash
    aggregation over the rows, then three windows over the *cells* —
    cost tracks distinct category pairs, not rows. NULL in either
    column drops the row.
    """
    a, b = F.col(a_col), F.col(b_col)
    cells = (
        df.where(a.isNotNull() & b.isNotNull())
        .groupBy(*keys, a.alias("__a"), b.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return cells.select(
        *keys,
        "__a",
        "__b",
        "__c",
        F.sum("__c").over(Window.partitionBy(*keys, "__a")).alias("__ra"),
        F.sum("__c").over(Window.partitionBy(*keys, "__b")).alias("__cb"),
        F.sum("__c").over(Window.partitionBy(*keys)).alias("__n"),
    )


def _chi2_agg() -> Column:
    """Pearson chi-squared over marginal-attached contingency cells:
    the observed-cell sum plus the correction for the zero cells that
    never materialize — the sum over ALL (a, b) of e_ij equals n, so
    ``chi2 = sum_obs((o-e)^2/e) + (n - sum_obs(e))`` without ever
    densifying the table.
    """
    e = F.col("__ra") * F.col("__cb") / F.col("__n")
    chi2_obs = F.sum((F.col("__c") - e) * (F.col("__c") - e) / e)
    return chi2_obs + (F.first("__n") - F.sum(e))


def contingency(
    df: DataFrame,
    keys: Sequence[str],
    a_col: str,
    b_col: str,
    out: str = "contingency",
) -> DataFrame:
    """ClickHouse ``contingency(a, b)``: Pearson's contingency
    coefficient ``sqrt(chi2 / (chi2 + n))`` — the [0, 1) association
    measure that, unlike Cramér's V, needs no dof normalization. Same
    cell-level plan as :func:`cramers_v`.
    """
    cells = _contingency_cells(df, keys, a_col, b_col)
    chi2 = _chi2_agg()
    return cells.groupBy(*keys).agg(
        F.sqrt(chi2 / (chi2 + F.first("__n"))).alias(out)
    )


def theils_u(
    df: DataFrame,
    keys: Sequence[str],
    a_col: str,
    b_col: str,
    out: str = "theils_u",
) -> DataFrame:
    """ClickHouse ``theilsU(a, b)``: the uncertainty coefficient
    ``U(a|b) = (H(a) - H(a|b)) / H(a)`` — the asymmetric "how much does
    knowing b tell us about a" measure in [0, 1].

    Folds both entropies from the same marginal-attached cells in one
    aggregation pass using ``sum_b c = ra``:
    ``H(a) = ln n - sum_cells(c*ln ra)/n`` and
    ``H(a|b) = (sum_cells(c*ln cb) - sum_cells(c*ln c))/n``. Natural
    log throughout (the ratio is base-invariant). Groups where a is
    constant (``H(a) = 0``) yield NULL (ClickHouse nan).

    Note the ClickHouse/conventional argument-order trap: this returns
    U(a|b) — how predictable *a* is from b — not the reverse.
    """
    cells = _contingency_cells(df, keys, a_col, b_col)
    c = F.col("__c")
    n = F.first("__n")
    h_a = F.log(n) - F.sum(c * F.log("__ra")) / n
    h_a_given_b = (F.sum(c * F.log("__cb")) - F.sum(c * F.log("__c"))) / n
    # tolerance, not > 0: for a constant `a` the two H(a) terms are the
    # same quantity summed in different float orders, so h_a can land a
    # few ulp either side of zero.
    u = F.when(h_a > 1e-12, (h_a - h_a_given_b) / h_a)
    return cells.groupBy(*keys).agg(u.alias(out))


def moments_suite(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    out_prefix: str = "",
) -> DataFrame:
    """ClickHouse ``skewPop`` / ``skewSamp`` / ``kurtPop`` /
    ``kurtSamp`` in one aggregation: population skewness and EXCESS
    population kurtosis come straight from Spark's built-in moment
    aggregates; the sample (bias-corrected) variants follow from the
    standard closed-form identities —
    ``G1 = g1 * sqrt(n(n-1))/(n-2)`` and
    ``G2 = ((n+1) g2 + 6) (n-1)/((n-2)(n-3))`` — so everything is one
    JVM hash aggregation plus a projection. Note ClickHouse's
    ``kurtPop`` is the RAW kurtosis (no -3); this returns the excess
    convention both Spark and DuckDB use, with the raw value one +3
    away. Sample variants are NULL below their minimum group size
    (n < 3 for skewness, n < 4 for kurtosis), where the corrections
    divide by zero. ``out_prefix`` renames the five outputs
    (``{p}skew_pop``, ``{p}skew_samp``, ``{p}kurt_pop``,
    ``{p}kurt_samp``, ``{p}n``) so callers whose key columns collide
    with the bare names (a group key called ``n``) can avoid the
    ambiguity.
    """
    p = out_prefix
    v = F.col(value_col)
    agg = df.groupBy(*keys).agg(
        F.count(v).alias("__n"),
        F.skewness(v).alias("__g1"),
        F.kurtosis(v).alias("__g2"),
    )
    n = F.col("__n").cast("double")
    g1, g2 = F.col("__g1"), F.col("__g2")
    skew_samp = F.when(
        n >= 3, g1 * F.sqrt(n * (n - 1)) / (n - 2)
    )
    kurt_samp = F.when(
        n >= 4, ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
    )
    return agg.select(
        *keys,
        g1.alias(f"{p}skew_pop"),
        skew_samp.alias(f"{p}skew_samp"),
        g2.alias(f"{p}kurt_pop"),
        kurt_samp.alias(f"{p}kurt_samp"),
        F.col("__n").alias(f"{p}n"),
    )


def group_array_sample(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: int,
    id_col: str,
    seed: int = 0,
    out: str = "sample",
) -> DataFrame:
    """ClickHouse ``groupArraySample(k[, seed])(x)``: a uniform
    without-replacement sample of up to ``k`` values per group, as an
    array — deterministic for a given seed, so retries and
    re-partitions reproduce the same sample (ClickHouse's own is
    merge-order-dependent; hash-ranking is the distributed-stable
    form).

    ``id_col`` must identify rows uniquely within a group: the ranking
    hashes ``(id, seed)``, which makes every ROW equally likely.
    Hashing the value instead would be wrong — duplicate values would
    share a rank, so the top-k degenerates to k copies of the
    lowest-hash value on low-cardinality columns (caught by driving
    the operator on l_quantity).

    One ranking window, then the usual collect over ≤ k rows per
    group. NULL values are excluded (they carry no sample information
    and ClickHouse skips them too). A NULL id fails loudly in-pass
    (``assert_true``): NULL ids all share one sort key, which would
    silently make the selection partition-order dependent — the exact
    nondeterminism this operator exists to rule out. Duplicate ids
    within a group likewise tie and must not occur (documented
    contract; checking uniqueness would cost an extra shuffle).
    """
    if k < 1:
        raise ValueError(f"group_array_sample needs k >= 1, got {k}")
    id_ok = F.assert_true(
        F.col(id_col).isNotNull(),
        F.lit(
            f"group_array_sample: NULL {id_col!r} on a row — NULL ids "
            "share a sort key and make the sample partition-order "
            "dependent; supply a non-NULL unique row id"
        ),
    )
    w = Window.partitionBy(*keys).orderBy(
        F.xxhash64(F.col("__id"), F.lit(int(seed))).asc(), F.col("__id").asc()
    )
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .select(
            *keys,
            F.col(value_col).alias("__v"),
            F.when(id_ok.isNull(), F.col(id_col)).alias("__id"),
        )
        .withColumn("__rn", F.row_number().over(w))
    )
    return (
        ranked.where(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.collect_list("__v").alias(out))
    )


def corr_matrix(
    df: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    out: str = "matrix",
) -> DataFrame:
    """ClickHouse ``corrMatrix(x1, ..., xn)``: the pairwise Pearson
    correlation matrix of the given columns per group, as
    ``array<array<double>>`` in ``cols`` order.

    One hash aggregation — Catalyst folds all p(p+1)/2 ``corr``
    aggregates in a single pass over the rows (each maintains its own
    co-moment state, all map-side combinable), then the nested array is
    a free projection. Entries are SQL ``corr`` semantics: each pair
    uses the rows where BOTH of its columns are non-NULL (pairwise
    deletion), and a constant column yields NULL against everything —
    including itself, which keeps "no variance" distinguishable from a
    true diagonal 1.
    """
    return _pairwise_matrix(df, keys, cols, F.corr, out, "corr_matrix")


def covar_matrix(
    df: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    sample: bool = True,
    out: str = "matrix",
) -> DataFrame:
    """ClickHouse ``covarSampMatrix`` / ``covarPopMatrix``: the pairwise
    covariance matrix per group — same single-pass plan and pairwise-
    deletion NULL semantics as :func:`corr_matrix`, with the sample
    (n-1) or population (n) normalization chosen by ``sample``.
    """
    fn = F.covar_samp if sample else F.covar_pop
    return _pairwise_matrix(df, keys, cols, fn, out, "covar_matrix")


def _pairwise_matrix(
    df: DataFrame,
    keys: Sequence[str],
    cols: Sequence[str],
    pair_fn,
    out: str,
    op_name: str,
) -> DataFrame:
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"{op_name} needs at least two columns")
    aggs = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            if i <= j:
                aggs.append(
                    pair_fn(F.col(a), F.col(b)).alias(f"__c{i}_{j}")
                )
    mom = df.groupBy(*keys).agg(*aggs)
    rows = [
        F.array(
            *[
                F.col(f"__c{min(i, j)}_{max(i, j)}")
                for j in range(len(cols))
            ]
        )
        for i in range(len(cols))
    ]
    return mom.select(*keys, F.array(*rows).alias(out))


def exponential_time_decayed_sum(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tau: float,
    out: str = "decayed_sum",
) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedSum(tau)(v, t)`` as a window
    function: for every row, ``sum over prior-or-equal rows i of
    v_i * exp(-(t - t_i) / tau)`` — the exponentially-decayed running
    total used for rate/EWMA analytics over event streams.

    The naive form is O(n^2) per group; the factored identity
    ``exp(-t/tau) * running_sum(v_i * exp(t_i/tau))`` makes it a single
    ordered window (one sort shuffle per group, same cost as any
    cumulative sum). To keep ``exp(t_i/tau)`` in double range the
    timestamps are re-based against the group's minimum — decay
    depends only on deltas, so the basis cancels exactly. ``ts_col``
    must be numeric (epoch seconds, not a TIMESTAMP); the factoring
    stays in double range while the group's time span is under ~700
    tau — beyond that, pre-bucket the stream (the decayed contribution
    across >700 tau is below double epsilon anyway).

    Input rows with a NULL timestamp or value are dropped (they have
    no place on the time axis). Ties in ``t`` are summed in full on
    both sides of the identity, matching ClickHouse's
    't equal -> both contribute undecayed' behavior; output rows keep
    (keys, t, decayed) one row per input row.
    """
    if tau <= 0:
        raise ValueError(f"exponential_time_decayed_sum needs tau > 0, got {tau}")
    t, v = F.col(ts_col), F.col(value_col)
    base = Window.partitionBy(*keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rebased = t - F.min(t).over(base)
    return (
        df.where(t.isNotNull() & v.isNotNull())
        .withColumn("__w", v * F.exp(rebased / F.lit(float(tau))))
        .withColumn("__rb", rebased)
        .withColumn(
            out, F.exp(-F.col("__rb") / F.lit(float(tau))) * F.sum("__w").over(w)
        )
        .drop("__w", "__rb")
    )


def exponential_time_decayed_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tau: float,
    out: str = "decayed_avg",
) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedAvg(tau)(v, t)``: the decayed
    sum of values divided by the decayed sum of weights (1 per row) —
    an EWMA whose smoothing follows event time, not row count.

    Same single-ordered-window factoring as
    :func:`exponential_time_decayed_sum`; the numerator and denominator
    share one sort because both cumulative sums ride the same window
    spec (Catalyst evaluates them in one Window operator).
    """
    if tau <= 0:
        raise ValueError(f"exponential_time_decayed_avg needs tau > 0, got {tau}")
    t, v = F.col(ts_col), F.col(value_col)
    base = Window.partitionBy(*keys)
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rebased = t - F.min(t).over(base)
    decay = F.exp(rebased / F.lit(float(tau)))
    return (
        df.where(t.isNotNull() & v.isNotNull())
        .withColumn("__wv", v * decay)
        .withColumn("__w1", decay)
        .withColumn(out, F.sum("__wv").over(w) / F.sum("__w1").over(w))
        .drop("__wv", "__w1")
    )


def exponential_moving_average(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    halflife: float,
    out: str = "ema",
) -> DataFrame:
    """ClickHouse ``exponentialMovingAverage(halflife)(v, t)``: the
    event-time EMA where a point's weight halves every ``halflife``
    time units. Exactly :func:`exponential_time_decayed_avg` with
    ``tau = halflife / ln 2`` (``2^(-dt/h) = e^(-dt/(h/ln2))``) — the
    wrapper exists so the ClickHouse name and parameterization resolve
    directly.
    """
    if halflife <= 0:
        raise ValueError(f"exponential_moving_average needs halflife > 0, got {halflife}")
    return exponential_time_decayed_avg(
        df, keys, ts_col, value_col, tau=halflife / math.log(2.0), out=out
    )


def quantile_exact_weighted(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    q: float,
    out: str = "quantile",
) -> DataFrame:
    """ClickHouse ``quantileExactWeighted(q)(x, w)``: the exact
    q-quantile of values where each row counts ``w`` times — the
    smallest value whose cumulative weight reaches ``q * total_weight``
    (lower-interpolation / type-1 quantile, which is what ClickHouse's
    exact-weighted variant returns for integer weights).

    Plan: collapse to one row per distinct ``(keys, value)`` with its
    summed weight (hash aggregation, map-side combinable — the shuffle
    carries distinct values, not rows), one ordered window for the
    cumulative weight, then a conditional min over the qualifying rows
    picks the answer per group. No driver collect, no full sort of the
    raw rows. Rows with NULL value or non-positive/NULL weight are
    dropped (ClickHouse ignores zero-weight entries; negative weights
    are undefined there and rejected here by the filter).

    Delegates to :func:`quantiles_exact_weighted` with one q so the
    single- and multi-quantile operators can never drift apart.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"quantile_exact_weighted needs 0 <= q <= 1, got {q}")
    multi = quantiles_exact_weighted(
        df, keys, value_col, weight_col, [q], out="__qs"
    )
    return multi.select(*keys, F.col("__qs")[0].alias(out))


def quantiles_exact_weighted(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    qs: Sequence[float],
    out: str = "quantiles",
) -> DataFrame:
    """ClickHouse ``quantilesExactWeighted(q1, ..., qn)(x, w)``: all the
    requested quantiles in ONE pass — same distinct-value weight cells
    and single cumulative window as :func:`quantile_exact_weighted`,
    with one conditional-min aggregate per q folded in the same final
    hash aggregation. Returns ``array<...>`` in ``qs`` order.
    """
    qs = [float(q) for q in qs]
    if not qs:
        raise ValueError("quantiles_exact_weighted needs at least one q")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"each q must be in [0, 1], got {q}")
    v, w = F.col(value_col), F.col(weight_col)
    cells = (
        df.where(v.isNotNull() & w.isNotNull() & (w > 0))
        .groupBy(*keys, v.alias("__v"))
        .agg(F.sum(w).alias("__w"))
    )
    cum = Window.partitionBy(*keys).orderBy("__v").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = Window.partitionBy(*keys)
    ranked = cells.select(
        *keys,
        "__v",
        F.sum("__w").over(cum).alias("__cum"),
        F.sum("__w").over(total).alias("__tot"),
    )
    picks = [
        F.min(
            F.when(F.col("__cum") >= F.lit(q) * F.col("__tot"), F.col("__v"))
        ).alias(f"__q{i}")
        for i, q in enumerate(qs)
    ]
    agg = ranked.groupBy(*keys).agg(*picks)
    return agg.select(
        *keys, F.array(*[F.col(f"__q{i}") for i in range(len(qs))]).alias(out)
    )
