"""Text normalization — the canonical-form stage dedup keys hang off.

Fingerprints, shingles, MinHash signatures and exact-dedup keys are all
byte-functions of the text, so corpora normalize FIRST (CCNet and the
dedup literature lowercase + NFC + whitespace-fold before hashing;
the reference's own scrubbing analog is the null/"undefined" cleanup in
its copy DAGs). This module is that stage as one composable operator.

Everything except Unicode normalization is JVM column expressions with
DuckDB-bit-mirrorable regexes (same discipline as ``text.web``:
explicit character classes, no engine-specific shorthands — Java's
``\\s`` includes ``\\x0B``, RE2's does not, so the class is spelled
out). Unicode NFC/NFKC has no Spark built-in, so it is the module's
one Arrow-batched step — a vectorized pandas Series.map over
``unicodedata.normalize``, opt-in via ``unicode_form`` (default None
keeps the operator fully JVM-side and shuffle-free end to end).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# explicit classes — identical byte semantics in Java regex and RE2
_CONTROL = "[\\x00-\\x08\\x0E-\\x1F\\x7F]"  # keeps \t\n\x0B\f\r for the ws fold
_WHITESPACE = "[ \\t\\n\\x0B\\f\\r]+"


def normalize_text_col(
    text: Column,
    lowercase: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
) -> Column:
    """The JVM-side normalization pipeline as a single column
    expression: strip control characters, fold whitespace runs (tabs,
    newlines, vertical tab, form feed) to single spaces, trim, and
    lowercase. Order matters: control chars go first (so a stripped
    ``\\x1F`` can't glue two words), whitespace fold before trim."""
    out = text
    if strip_control:
        out = F.regexp_replace(out, _CONTROL, "")
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, _WHITESPACE, " "))
    if lowercase:
        out = F.lower(out)
    return out


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    lowercase: bool = True,
    strip_control: bool = True,
    collapse_whitespace: bool = True,
    unicode_form: str | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` in canonical form; every other column passes
    through unchanged. Map-only — zero shuffle.

    ``unicode_form``: ``None`` (default, fully JVM), ``'NFC'`` or
    ``'NFKC'`` — applied FIRST (canonicalization before any byte-level
    rule) through one Arrow-batched pandas pass. NFC is bit-mirrored
    against DuckDB's ``nfc_normalize`` in tests; NFKC additionally
    folds compatibility forms (ﬁ → fi, ² → 2), which is what search
    and dedup keys usually want.
    """
    if unicode_form not in (None, "NFC", "NFKC"):
        raise ValueError(
            f"unicode_form must be None, 'NFC' or 'NFKC', got {unicode_form!r}"
        )
    src = F.col(text_col)
    if unicode_form is not None:
        form = unicode_form

        @F.pandas_udf("string")
        def _unicode_norm(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(
                lambda x: unicodedata.normalize(form, x)
                if x is not None
                else None
            )

        src = _unicode_norm(src)
    out_col = normalize_text_col(
        src,
        lowercase=lowercase,
        strip_control=strip_control,
        collapse_whitespace=collapse_whitespace,
    )
    return df.select(
        *[
            out_col.alias(text_col) if c == text_col else F.col(c)
            for c in df.columns
        ]
    )


__all__ = ["normalize_text", "normalize_text_col"]
