"""Multi-feature regression fitting — the batch-correct answer to
ClickHouse's ``stochasticLinearRegression`` (and the multi-feature big
sibling of ``simpleLinearRegression``): ordinary least squares /
ridge via normal equations, fitted per group in ONE aggregation pass.

Scale shape: the per-row work folds the moment matrix — the p(p+1)/2
upper triangle of X'X plus X'y, y'y, Σy, n — as plain JVM ``sum``
aggregates (map-side combinable, one hash shuffle on the group keys),
which is the sufficient statistic for OLS at ANY row count. The only
Python is the p×p solve, run by an Arrow-batched pandas UDF over the
one-row-per-group moment vectors. ClickHouse reaches the same fit by
SGD because its aggregate states must stream; a Spark batch engine
can use the exact closed form.

reference: the reference ETL (RothaSAMON/clickhouse_etl) loads scored
facts (apps/airflow/dags/student/*.py) whose downstream analytics —
score-vs-credit-vs-attendance trend fitting — are what ClickHouse
users reach for stochasticLinearRegression for.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

__all__ = [
    "linear_regression_fit",
    "logistic_regression_fit",
    "categorical_information_value",
]


def linear_regression_fit(
    df: DataFrame,
    keys: Sequence[str],
    x_cols: Sequence[str],
    y_col: str,
    ridge: float = 0.0,
    intercept: bool = True,
) -> DataFrame:
    """Per-group OLS (or ridge, ``ridge > 0``) of ``y`` on ``x_cols``.

    Returns one row per group: ``coefs`` (array<double>, in ``x_cols``
    order), ``intercept`` (NULL when ``intercept=False``), ``r2``, and
    ``n``. Rows with a NULL in y or any feature are dropped (complete-
    case, matching SQL REGR_* semantics). Groups whose moment matrix
    is singular (fewer rows than features, or collinear features)
    yield NULL coefs — ridge with any positive lambda removes the
    singularity. The ridge penalty is NOT applied to the intercept
    (the standard convention).

    p features cost p(p+1)/2 + p + 3 JVM sum-aggregates — fine for the
    tens-of-features regime this targets; past that you want SGD/LBFGS
    (Spark MLlib), not normal equations.
    """
    x_cols = list(x_cols)
    p = len(x_cols)
    if p == 0:
        raise ValueError("linear_regression_fit needs at least one feature")
    if ridge < 0:
        raise ValueError(f"ridge must be >= 0, got {ridge}")
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = y.isNotNull()
    for x in xs:
        cond = cond & x.isNotNull()
    base = df.where(cond)

    aggs = [F.count(F.lit(1)).alias("__n"), F.sum(y).alias("__sy"),
            F.sum(y * y).alias("__syy")]
    for i in range(p):
        aggs.append(F.sum(xs[i]).alias(f"__sx{i}"))
        aggs.append(F.sum(xs[i] * y).alias(f"__sxy{i}"))
        for j in range(i, p):
            aggs.append(F.sum(xs[i] * xs[j]).alias(f"__sxx{i}_{j}"))
    mom = base.groupBy(*keys).agg(*aggs)

    # flatten the moments into one array column for the solver UDF
    moment_cols = ["__n", "__sy", "__syy"]
    moment_cols += [f"__sx{i}" for i in range(p)]
    moment_cols += [f"__sxy{i}" for i in range(p)]
    moment_cols += [f"__sxx{i}_{j}" for i in range(p) for j in range(i, p)]
    packed = mom.withColumn(
        "__m", F.array(*[F.col(c).cast("double") for c in moment_cols])
    )

    use_icpt = bool(intercept)
    lam = float(ridge)

    @pandas_udf("struct<coefs:array<double>,intercept:double,r2:double>")
    def solve(m: pd.Series) -> pd.DataFrame:
        out = []
        for vec in m:
            a = np.asarray(vec, dtype=np.float64)
            n, sy, syy = a[0], a[1], a[2]
            sx = a[3 : 3 + p]
            sxy = a[3 + p : 3 + 2 * p]
            tri = a[3 + 2 * p :]
            xtx = np.zeros((p, p))
            t = 0
            for i in range(p):
                for j in range(i, p):
                    xtx[i, j] = xtx[j, i] = tri[t]
                    t += 1
            if use_icpt:
                # augment: [[X'X, X'1], [1'X, n]] b = [X'y, 1'y]
                A = np.zeros((p + 1, p + 1))
                A[:p, :p] = xtx
                A[:p, p] = sx
                A[p, :p] = sx
                A[p, p] = n
                b = np.concatenate([sxy, [sy]])
                if lam > 0:
                    A[np.arange(p), np.arange(p)] += lam  # not the intercept
            else:
                A = xtx.copy()
                b = sxy.copy()
                if lam > 0:
                    A[np.arange(p), np.arange(p)] += lam
            # cond guard, not just LinAlgError: NUMERICALLY collinear
            # features (x2 = 2*x1 built from float data) leave a
            # nonzero pivot and solve() would return garbage silently
            if not np.all(np.isfinite(A)) or np.linalg.cond(A) > 1e12:
                out.append((None, None, None))
                continue
            try:
                beta = np.linalg.solve(A, b)
            except np.linalg.LinAlgError:
                out.append((None, None, None))
                continue
            coefs = beta[:p]
            icpt = float(beta[p]) if use_icpt else None
            # SSE = y'y - 2 b'[X'y] + b'A0 b with A0 the UNpenalized
            # moment matrix (SSE measures fit, not the penalty)
            if use_icpt:
                A0 = A.copy()
                A0[np.arange(p), np.arange(p)] -= lam
            else:
                A0 = xtx
            sse = float(syy - 2 * beta @ b + beta @ A0 @ beta)
            sst = float(syy - sy * sy / n) if use_icpt else float(syy)
            r2 = 1.0 - sse / sst if sst > 0 else None
            if r2 is not None and not math.isfinite(r2):
                r2 = None
            out.append(([float(c) for c in coefs], icpt, r2))
        return pd.DataFrame(out, columns=["coefs", "intercept", "r2"])

    fitted = packed.withColumn("__fit", solve(F.col("__m")))
    return fitted.select(
        *keys,
        F.col("__fit.coefs").alias("coefs"),
        F.col("__fit.intercept").alias("intercept"),
        F.col("__fit.r2").alias("r2"),
        F.col("__n").alias("n"),
    )


def logistic_regression_fit(
    df: DataFrame,
    keys: Sequence[str],
    x_cols: Sequence[str],
    y_col: str,
    max_iter: int = 25,
    tol: float = 1e-8,
    ridge: float = 0.0,
    max_groups: int = 10_000,
) -> DataFrame:
    """Per-group logistic regression — the batch-correct
    ``stochasticLogisticRegression``: Newton/IRLS where EVERY iteration
    is one JVM aggregation pass over the data with the current
    coefficients broadcast in.

    Scale shape: the data is never collected and never reshaped — each
    Newton step broadcast-joins the k-models-×-p coefficient table onto
    the rows, computes ``mu``/weights as JVM column math, and folds the
    per-group Hessian (X'WX upper triangle) and gradient as plain sum
    aggregates; the driver sees k rows of p(p+3)/2 floats per step (the
    MODELS, not the data) and solves the p×p updates in numpy. A 100 TB
    single group costs max_iter scans; groups converge independently
    and drop out of later passes. This is the same iteration MLlib's
    LogisticRegression runs — provided here as a DataFrame-native
    operator so a fit is one call away from the rest of the engine.

    The driver-side footprint is k·(p+1) floats of coefficients — fine
    for thousands of groups, NOT for millions. ``max_groups`` (default
    10 000) makes that boundary loud: the distinct group-key count is
    checked (one cheap aggregate) before anything is collected, and a
    higher-cardinality key raises with guidance instead of silently
    OOM-ing the driver mid-fit. For per-entity models at that scale use
    ``linear_regression_fit``'s packed one-row-per-group Arrow path, or
    coarsen the key.

    Rows with NULL y/feature, or y outside {0, 1}, are ignored.
    Returns ``coefs`` (x_cols order), ``intercept``, ``n_iter``, and
    ``converged`` per group. Perfectly separable groups cannot converge
    (the MLE is at infinity — the math, not a bug): they stop at
    ``max_iter`` with ``converged=false``; any ``ridge > 0`` restores a
    finite optimum. The ridge penalty skips the intercept.
    """
    x_cols = list(x_cols)
    p = len(x_cols)
    if p == 0:
        raise ValueError("logistic_regression_fit needs at least one feature")
    if ridge < 0 or max_iter < 1:
        raise ValueError("need ridge >= 0 and max_iter >= 1")
    if max_groups < 1:
        raise ValueError("need max_groups >= 1")
    keys = list(keys)
    spark = df.sparkSession
    y = F.col(y_col).cast("double")
    xs = [F.col(c).cast("double") for c in x_cols]
    cond = y.isin(0.0, 1.0)
    for x in xs:
        cond = cond & x.isNotNull()
    # keys=[] fits one global model: run the same machinery over an
    # internal constant group and drop it at the end
    global_fit = not keys
    if global_fit:
        keys = ["__g"]
        key_cols: list = [F.lit(1).alias("__g")]
    else:
        key_cols = list(keys)
    base = df.where(cond).select(
        *key_cols,
        *[x.alias(f"__x{i}") for i, x in enumerate(xs)],
        y.alias("__y"),
    )
    base = base.persist()
    try:
        out_schema = (
            base.select(*keys).schema
            .add("coefs", T.ArrayType(T.DoubleType()))
            .add("intercept", T.DoubleType())
            .add("n_iter", T.IntegerType())
            .add("converged", T.BooleanType())
        )

        def stats_for(cur, eta) -> list:
            """One Newton-step aggregation pass: per-group gradient and
            Hessian upper triangle under the given linear predictor."""
            mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            mu = F.least(F.greatest(mu, F.lit(eps)), F.lit(1.0 - eps))
            w = mu * (1.0 - mu)
            r = F.col("__y") - mu
            aggs = []
            feats = [F.col(f"__x{i}") for i in range(p)] + [F.lit(1.0)]
            for i in range(p + 1):
                aggs.append(F.sum(r * feats[i]).alias(f"__g{i}"))
                for j in range(i, p + 1):
                    aggs.append(
                        F.sum(w * feats[i] * feats[j]).alias(f"__h{i}_{j}")
                    )
            # limit(max_groups+1) keeps the cardinality guard's bound on
            # what the driver ever holds, without a separate distinct job.
            return cur.groupBy(*keys).agg(*aggs).limit(max_groups + 1).collect()

        groups: list[tuple] = []
        beta: dict[tuple, np.ndarray] = {}
        done: dict[tuple, tuple[int, bool]] = {}
        eps = 1e-12
        # Literal-model iterations stay worthwhile while the CASE chain
        # is small; past this the broadcast join is the better plan.
        max_literal_groups = 256

        for it in range(1, max_iter + 1):
            if it == 1:
                # Every model starts at beta = 0, so the first Newton
                # pass needs NO model attachment at all — eta is the
                # zero literal and the aggregation's own group rows ARE
                # the group list (no separate distinct-groups job).
                cur = base
                eta = F.lit(0.0)
            else:
                active = [g for g in groups if g not in done]
                if not active:
                    break
                if len(keys) == 1 and len(active) <= max_literal_groups:
                    # Attach the k active models as literal CASE chains
                    # keyed on the single group column: no per-iteration
                    # createDataFrame, no broadcast build, no join —
                    # the aggregation reads base (cached) directly.
                    # eqNullSafe conditions keep NULL-key groups fitted.
                    kc = F.col(keys[0])
                    match = None
                    for g in active:
                        c = kc.eqNullSafe(F.lit(g[0]))
                        match = c if match is None else match | c
                    cur = base.filter(match)

                    def beta_j(j: int):
                        e = None
                        for g in active:
                            c = kc.eqNullSafe(F.lit(g[0]))
                            v = F.lit(float(beta[g][j]))
                            e = F.when(c, v) if e is None else e.when(c, v)
                        return e

                    eta = beta_j(p)
                    for i in range(p):
                        eta = eta + beta_j(i) * F.col(f"__x{i}")
                else:
                    # broadcast the current models onto the rows
                    brows = [
                        (*g, [float(v) for v in beta[g]]) for g in active
                    ]
                    bschema = base.select(*keys).schema.add(
                        "__beta", T.ArrayType(T.DoubleType())
                    )
                    bdf = F.broadcast(spark.createDataFrame(brows, bschema))
                    # eqNullSafe join: a NULL key value is a legitimate
                    # group (groupBy semantics); a plain equi-join would
                    # silently drop it and report an unfitted all-zero
                    # model
                    b, m = base.alias("__b"), bdf.alias("__m")
                    jc = F.lit(True)
                    for k in keys:
                        jc = jc & F.col(f"__b.{k}").eqNullSafe(F.col(f"__m.{k}"))
                    cur = b.join(m, jc, "inner").select(
                        *[F.col(f"__b.{c}") for c in base.columns],
                        F.col("__m.__beta").alias("__beta"),
                    )
                    eta = F.col("__beta")[p]
                    for i in range(p):
                        eta = eta + F.col("__beta")[i] * F.col(f"__x{i}")

            stats = stats_for(cur, eta)

            if it == 1:
                # Loud cardinality guard (see stats_for's limit): an
                # over-full first-pass result proves the cap exceeded.
                if len(stats) > max_groups:
                    raise ValueError(
                        f"logistic_regression_fit: more than {max_groups} "
                        f"distinct groups for keys {keys} — the Newton "
                        "driver state is k·(p+1) coefficients and this "
                        "key would overwhelm it. Coarsen the key, fit a "
                        "global model (keys=[]), or raise max_groups "
                        "explicitly if you know k·p fits in driver "
                        "memory."
                    )
                groups = [tuple(row[k] for k in keys) for row in stats]
                if not groups:
                    return spark.createDataFrame([], out_schema)
                beta = {g: np.zeros(p + 1) for g in groups}
                active = list(groups)

            for row in stats:
                g = tuple(row[k] for k in keys)
                grad = np.array([row[f"__g{i}"] for i in range(p + 1)])
                H = np.zeros((p + 1, p + 1))
                for i in range(p + 1):
                    for j in range(i, p + 1):
                        H[i, j] = H[j, i] = row[f"__h{i}_{j}"]
                if ridge > 0:  # penalty on coefs, not the intercept
                    grad[:p] -= ridge * beta[g][:p]
                    H[np.arange(p), np.arange(p)] += ridge
                try:
                    step = np.linalg.solve(H, grad)
                except np.linalg.LinAlgError:
                    done[g] = (it, False)
                    continue
                beta[g] = beta[g] + step
                if float(np.max(np.abs(step))) < tol:
                    done[g] = (it, True)
            # pure guard: every active group has rows by construction
            # (groups came from base itself), so this only fires if the
            # aggregation lost a group — mark it failed rather than
            # looping to max_iter on a model that never updates
            seen = {tuple(row[k] for k in keys) for row in stats}
            for g in active:
                if g not in seen:
                    done[g] = (it, False)
    finally:
        base.unpersist()

    out_rows = []
    for g in groups:
        it, conv = done.get(g, (max_iter, False))
        out_rows.append(
            (
                *g,
                [float(v) for v in beta[g][:p]],
                float(beta[g][p]),
                it,
                conv,
            )
        )
    result = spark.createDataFrame(out_rows, out_schema)
    return result.drop("__g") if global_fit else result


def categorical_information_value(
    df: DataFrame,
    keys: Sequence[str],
    feature_col: str,
    target_col: str,
    smoothing: float = 0.5,
) -> DataFrame:
    """ClickHouse ``categoricalInformationValue(cat, target)``: per
    category of ``feature_col``, the weight of evidence against the
    binary ``target_col`` (0/1), and the category's information-value
    contribution — the standard feature-screening statistic
    ``IV = sum_cat (p_pos_cat - p_neg_cat) * WoE_cat`` with
    ``WoE = ln(p_pos_cat / p_neg_cat)`` (shares of the group's
    positives / negatives falling in the category).

    One hash aggregation builds the per-category positive/negative
    counts; one cell-level window attaches the group totals — cost
    tracks distinct categories. ``smoothing`` (default 0.5, additive /
    half-a-count) keeps empty cells finite, the conventional fix for
    the log-of-zero problem; pass 0 for the raw definition (categories
    pure in either class then produce infinite WoE, as the math says).
    Sum ``iv`` over categories for the feature's total IV. Rows with
    NULL feature or target are ignored; target must be 0/1.
    """
    if smoothing < 0:
        raise ValueError(f"smoothing must be >= 0, got {smoothing}")
    f_, t = F.col(feature_col), F.col(target_col)
    cells = (
        df.where(f_.isNotNull() & t.isin(0, 1))
        .groupBy(*keys, f_.alias("category"))
        .agg(
            F.sum(t.cast("double")).alias("__pos"),
            F.sum(F.lit(1.0) - t.cast("double")).alias("__neg"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(*keys)
    s = F.lit(float(smoothing))
    n_cat = F.count(F.lit(1)).over(w)
    tot_pos = F.sum("__pos").over(w) + s * n_cat
    tot_neg = F.sum("__neg").over(w) + s * n_cat
    p_pos = (F.col("__pos") + s) / tot_pos
    p_neg = (F.col("__neg") + s) / tot_neg
    # explicit infinities for pure cells under smoothing=0: Spark's
    # log() returns NULL for non-positive input (non-ANSI), which would
    # silently DROP the strongest categories from the summed IV
    woe = (
        F.when(p_neg == 0, F.lit(float("inf")))
        .when(p_pos == 0, F.lit(float("-inf")))
        .otherwise(F.log(p_pos / p_neg))
    )
    return cells.select(
        *keys,
        "category",
        F.col("__pos").alias("n_pos"),
        F.col("__neg").alias("n_neg"),
        woe.alias("woe"),
        ((p_pos - p_neg) * woe).alias("iv"),
    )
