"""Model-based document scoring — the batch-inference seam.

Modern corpus curation filters with learned models (fastText-style
quality classifiers, perplexity scorers, reward models), not just
heuristics. The model itself is an external artifact; what the ENGINE
owns is the inference plumbing, and that is what this module makes real:

- Arrow-batched ``mapInPandas`` (one Python call per batch, never per
  row), schema pinned, input columns pruned to what the model reads;
- the model rides to executors inside the serialized closure (the
  pattern for real weights is a broadcast variable or executor-local
  file load — seam documented on :func:`score_documents`);
- scores append to the row (id + score out), so the filter/weight
  decision composes downstream exactly like the heuristic
  ``corpus_quality_filter``.

The DEFAULT model is a deterministic logistic over two cheap text
features — fake as a quality model, but exactly reproducible in SQL, so
the whole path (batching, schema, ordering, null handling) is value-hash
checked against a DuckDB oracle rather than smoke-tested. Inject a real
``model_fn`` to replace it; the Spark-side contract is identical.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The default (stub) classifier lives as a nested function inside
# score_documents (cloudpickle ships nested functions BY VALUE, so bare
# executors don't need this package importable — a module-level default
# would pickle by reference and break there). Its contract:
#   logit = -1.5 + 0.02 * min(n_tokens, 256) + -2.0 * upper_fraction
#   score = sigmoid(logit);  null text scores as empty text
# Deterministic and SQL-expressible on purpose — the DuckDB oracle in
# tests/test_scoring.py mirrors exactly these literals.


def score_documents(
    df: DataFrame,
    model_fn: Callable[[pd.Series], pd.Series] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "score",
) -> DataFrame:
    """Append a model score per document via Arrow-batched inference.

    ``model_fn`` maps a pandas Series of texts to a pandas Series of
    float scores, called once per Arrow batch. For real weights, load
    them OUTSIDE the per-batch loop (module/closure scope) so the cost
    is paid once per task, not per batch — or distribute them with
    ``SparkContext.broadcast`` / an executor-local artifact path when
    they exceed closure-pickling sizes.

    Only (id, text) flow into Python — the scan is pruned to two
    columns regardless of the source schema; join the score back on the
    id for the full row. Output: ``(id_col, score_col)``.
    """
    if model_fn is None:
        # Nested on purpose — see the module-level note on pickling.
        def model_fn(texts: pd.Series) -> pd.Series:
            texts = texts.fillna("")  # null text scores as empty text
            n_tok = texts.str.split(" ").map(len).clip(upper=256)
            n_char = texts.str.len()
            n_upper = texts.str.count(r"[A-Z]")
            upper_frac = (n_upper / n_char.where(n_char > 0)).fillna(0.0)
            logit = -1.5 + 0.02 * n_tok + -2.0 * upper_frac
            return 1.0 / (1.0 + (-logit).map(math.exp))

    model = model_fn
    out_schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField(score_col, T.DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    score_col: model(pdf[text_col]).astype(float),
                }
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema=out_schema)


def filter_by_score(
    df: DataFrame,
    threshold: float,
    model_fn: Callable[[pd.Series], pd.Series] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents whose model score clears ``threshold``.

    The score join is on the id key; at 100 TB both sides are the same
    corpus partitioned the same way, so AQE plans it as a co-located
    join (or broadcast of the surviving-id set after a harsh cut)."""
    keep = score_documents(df, model_fn, id_col=id_col, text_col=text_col).filter(
        F.col("score") >= threshold
    )
    return df.join(keep.select(id_col), on=id_col, how="left_semi")
