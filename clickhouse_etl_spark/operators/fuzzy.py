"""Fuzzy (bounded-edit-distance) matching — entity resolution at scale.

Deduplicating customer/supplier/name tables ("Jon Smith" vs "John
Smith") needs pairs within Levenshtein distance k. The naive form is an
n² cross join; the scalable form here is q-gram candidate filtering with
an exact verify — the same candidates-then-verify shape as the MinHash
tier, with a PROVABLE completeness bound instead of a probabilistic one:

    One edit (insert/delete/substitute) destroys at most q of a
    string's overlapping q-grams. A string of length L has L - q + 1
    grams, so two strings within distance k share at least
    max(La, Lb) - q + 1 - k*q grams. That is >= 1 whenever
    max(La, Lb) >= q * (k + 1) — LONG strings within distance k are
    guaranteed to collide on at least one exact q-gram.

So the plan splits by length:

- LONG strings (len >= q*(k+1)): explode distinct q-grams, self-join on
  the gram (one shuffle; cost ∝ gram collisions, never n²), length
  prefilter |La - Lb| <= k, then exact ``levenshtein(a, b) <= k``.
- SHORT strings (len <= q*(k+1) + k - 1): too few grams for the
  guarantee — they pair inside a single bounded bucket (a length-k
  neighborhood of the q-gram floor; at web scale this bucket is the
  distinct short strings, a set bounded by the alphabet, not the
  corpus). Strings long enough to pair with a long string are in BOTH
  paths; pairs dedupe at the end.

Why q matters at scale (measured, BENCH_SCALE.md r11/r12): the gram
self-join's cost is the in-bucket pair count. Once the corpus carries
more gram occurrences than the gram space ``alphabet**q`` can hold,
buckets saturate and candidates grow ~N² (birthday growth) — measured
as a gen10→gen30 segment exponent of 1.39 at q=5 on 12-hex-char keys,
restored to 0.84 by stepping to q=6. Hence:

- ``q='auto'`` derives q from one bounded stats pass over the corpus
  (a length histogram + a sampled alphabet): the largest q permitted
  by the completeness bound ``q*(k+1) <= min_len`` whose gram space
  clears the expected gram occupancy — computed ONLY over the strings
  the floor admits to the gram join, since shorter strings pair at the
  value level and must neither fake nor mask saturation. When min_len
  itself clears the floor the short path is provably EMPTY and is
  skipped entirely.
- an explicit occupancy guard (``saturation='warn'|'raise'``) estimates
  grams-per-bucket before the join and refuses (or warns loudly) to run
  a saturated N² candidate join — including the dead corner where every
  string lands in the short path (len <= q*(k+1)+k-1) and the
  distinct-VALUE pairing would itself be a runaway cross join.

Spark's built-in ``levenshtein`` does the verify JVM-side; DuckDB's
``levenshtein`` lets the whole operator be value-hash checked against a
brute-force n² oracle (tests/test_fuzzy.py).
"""

from __future__ import annotations

import logging
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

#: Soft cap for auto-selected q: beyond this, grams stop getting more
#: selective in practice while shuffle keys get longer. Raised
#: automatically (up to the completeness bound) if occupancy demands it.
_AUTO_Q_SOFT_CAP = 16


class GramSaturationError(ValueError):
    """Raised (``saturation='raise'``) when no safe configuration exists:
    either the q-gram space is saturated at every q the completeness
    bound allows, or the short-string value space is large enough that
    the distinct-value pairing would be a runaway cross join."""


#: Rows the alphabet probe chars-explodes, max. A FULL char-explode
#: pass is linear in corpus bytes — real money at 100 TB — and the
#: alphabet only feeds the occupancy ESTIMATE, so a bounded
#: deterministic sample suffices. Error direction is conservative:
#: missing ultra-rare chars UNDERestimates the alphabet, which
#: OVERestimates occupancy — the guard warns earlier, never later.
_ALPHABET_SAMPLE_ROWS = 100_000

#: Length-histogram clip: lengths above this collapse into one bucket.
#: Bounds the driver-side histogram at 64k rows no matter the corpus;
#: the only loss is over-counting grams of ultra-long strings by at
#: most (q-1) each — noise at any realistic q, conservative direction.
_LEN_HISTOGRAM_CAP = 65_536


def _corpus_stats(base: DataFrame) -> dict:
    """One narrow length-histogram job + one bounded distinct for the
    stats that drive q selection and the saturation guard. The
    histogram groups ONE int column (driver receives ≤ min(max_len,
    64k) rows), so occupancy can later be computed EXACTLY over the
    strings a given floor admits to the gram join — a whole-corpus sum
    would let a sea of below-floor short strings (which route to the
    value-level path) fake saturation, or negative (len - q + 1) terms
    mask it. The alphabet probe chars-explodes at most
    ``~_ALPHABET_SAMPLE_ROWS`` rows (deterministic xxhash64 thinning,
    so runs reproduce) and its output is bounded by the character set."""
    hist = [
        (int(r["__l"]), int(r["c"]), int(r["s"]))
        for r in base.groupBy(
            F.least(F.col("__len"), F.lit(_LEN_HISTOGRAM_CAP)).alias("__l")
        )
        .agg(F.count("*").alias("c"), F.sum("__len").alias("s"))
        .collect()
    ]
    if not hist:
        return {"n": 0, "min_len": 0, "max_len": 0, "hist": [], "alphabet": 1}
    n = sum(c for _, c, _ in hist)
    sampled = base
    stride = -(-n // _ALPHABET_SAMPLE_ROWS)  # ceil: honors the row cap
    if stride > 1:
        sampled = base.filter(
            F.pmod(F.xxhash64("__id", "__s"), F.lit(stride)) == 0
        )
    alphabet = (
        sampled.select(F.explode(F.split("__s", "")).alias("__c"))
        .filter(F.col("__c") != "")
        .distinct()
        .count()
    )
    return {
        "n": n,
        "min_len": min(l for l, _, _ in hist),
        "max_len": max(l for l, _, _ in hist),  # clipped at the cap
        "hist": hist,
        "alphabet": max(int(alphabet), 1),
    }


def _occupancy(stats: dict, q: int, k: int) -> float:
    """Expected gram occurrences per gram-space slot, counting ONLY the
    strings the completeness floor ``q*(k+1)`` admits to the gram join
    (shorter strings never reach it — they pair at the value level).
    > ~1 means buckets saturate and in-bucket candidate pairs grow
    quadratically."""
    floor = q * (k + 1)
    occurrences = sum(
        s - c * (q - 1) for l, c, s in stats["hist"] if l >= floor
    )
    return occurrences / float(stats["alphabet"] ** q)


def _choose_q(stats: dict, k: int, max_occupancy: float) -> int:
    """Largest q compatible with the completeness bound whose gram space
    clears ``max_occupancy``; prefers the soft cap when occupancy allows
    (shorter shuffle keys), stepping up toward the hard bound only when
    the space is too small. See module doc for the measured rationale."""
    hard_bound = stats["min_len"] // (k + 1)
    if hard_bound < 2:
        return 2  # short path unavoidable; guard handles the runaway
    q = min(hard_bound, _AUTO_Q_SOFT_CAP)
    while q < hard_bound and _occupancy(stats, q, k) > max_occupancy:
        q += 1
    return q


def _saturation_report(
    stats: dict, q: int, k: int, short_distinct: int | None,
    max_occupancy: float, max_short_values: int,
) -> list[str]:
    problems = []
    occ = _occupancy(stats, q, k)
    if occ > max_occupancy:
        problems.append(
            f"q-gram space saturated at q={q}: expected occupancy "
            f"{occ:.2f} grams/slot over alphabet^q = "
            f"{stats['alphabet']}^{q} slots (threshold "
            f"{max_occupancy}); in-bucket candidates grow ~N^2 past "
            f"~1.0. Raise q (valid while q*(k+1) <= min string length "
            f"= {stats['min_len']}) or pass q='auto'."
        )
    if short_distinct is not None and short_distinct > max_short_values:
        problems.append(
            f"short-string path would pair {short_distinct} distinct "
            f"values (> {max_short_values}) below the q-gram floor "
            f"q*(k+1) = {q * (k + 1)} — a runaway distinct-value cross "
            f"join. Lower q so these strings qualify for the gram path, "
            f"or pass q='auto'."
        )
    return problems


def _validate_fuzzy_args(max_distance: int, q, saturation: str) -> bool:
    """Shared argument contract for the pair/join forms; returns
    ``auto_q``."""
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0, got {max_distance}")
    if saturation not in ("ignore", "warn", "raise"):
        raise ValueError(
            f"saturation must be ignore|warn|raise, got {saturation!r}"
        )
    auto_q = isinstance(q, str)
    if auto_q and q != "auto":
        raise ValueError(f"q must be an int or 'auto', got {q!r}")
    if auto_q and saturation == "ignore":
        raise ValueError(
            "q='auto' needs the stats pass; use saturation='warn'|'raise'"
        )
    if not auto_q and q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    return auto_q


def _saturation_guard(
    base: DataFrame,
    op_name: str,
    q,
    auto_q: bool,
    k: int,
    saturation: str,
    max_gram_occupancy: float,
    max_short_values: int,
) -> tuple[int, bool]:
    """The shared stats pass + guard: derive q when ``auto_q``, prove
    the short path empty when the corpus minimum length allows, and
    warn/raise on either saturation mode. Returns ``(q, skip_short)``.
    ``base`` is the (union of the) operand(s) with ``__id``/``__s``/
    ``__len`` columns — both fuzzy forms share one bucket space, so one
    combined corpus is the right scope for both decisions."""
    stats = _corpus_stats(base)
    if auto_q:
        q = _choose_q(stats, k, max_gram_occupancy)
    long_floor = q * (k + 1)
    # min_len >= floor proves the short path EMPTY: every pair then has
    # max(La, Lb) >= q*(k+1), so the gram bound covers it.
    skip_short = stats["n"] == 0 or stats["min_len"] >= long_floor
    short_distinct = None
    if not skip_short:
        short_ceil = long_floor + k - 1 if k > 0 else long_floor - 1
        short_distinct = (
            base.filter(F.col("__len") <= short_ceil)
            .select("__s")
            .distinct()
            .count()
        )
    if stats["n"]:
        problems = _saturation_report(
            stats, q, k, short_distinct, max_gram_occupancy, max_short_values
        )
        if problems:
            msg = (
                f"{op_name}(q={q}, k={k}) will not scale on this corpus "
                f"(n={stats['n']}, len {stats['min_len']}.."
                f"{stats['max_len']}, alphabet {stats['alphabet']}): "
                + " | ".join(problems)
            )
            if saturation == "raise":
                raise GramSaturationError(msg)
            warnings.warn(msg, RuntimeWarning, stacklevel=3)
            logger.warning(msg)
    return q, skip_short


def fuzzy_self_pairs(
    df: DataFrame,
    col: str,
    max_distance: int = 1,
    id_col: str = "doc_id",
    q: int | str = 3,
    saturation: str = "warn",
    max_gram_occupancy: float = 1.0,
    max_short_values: int = 100_000,
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``col`` values are within
    Levenshtein distance ``max_distance``.

    Output: ``(id_a, id_b, <col>_a, <col>_b, distance)``. Identical
    values also pair (distance 0) — filter ``distance > 0`` for
    near-miss-only matching.

    ``q`` is the gram width (int) or ``'auto'`` to derive it from corpus
    length/alphabet stats (module doc). ``saturation`` controls the
    scale guard: ``'warn'`` (default) runs a cheap stats pass, warns
    loudly on a saturated gram space or a runaway short-value path, and
    skips the short path entirely when the corpus minimum length proves
    it empty; ``'raise'`` turns those warnings into
    :class:`GramSaturationError`; ``'ignore'`` skips the stats pass and
    plans both paths lazily (exactly the pre-r12 plan — only safe when
    the caller has sized q to the corpus, q='auto' not allowed).
    """
    auto_q = _validate_fuzzy_args(max_distance, q, saturation)

    k = max_distance
    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(col).alias("__s"),
        F.length(col).alias("__len"),
    ).filter(F.col("__s").isNotNull())

    skip_short = False
    if saturation != "ignore":
        q, skip_short = _saturation_guard(
            base, "fuzzy_self_pairs", q, auto_q, k, saturation,
            max_gram_occupancy, max_short_values,
        )

    long_floor = q * (k + 1)  # completeness bound: see module doc
    short_ceil = long_floor + k - 1 if k > 0 else long_floor - 1

    # LONG path: distinct q-grams -> gram self-join.
    longs = base.filter(F.col("__len") >= long_floor)
    grams = longs.select(
        "__id",
        "__s",
        "__len",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(__len - {q} + 1, 1)),"
                    f" i -> substring(__s, i, {q}))"
                )
            )
        ).alias("__g"),
    )
    g2 = grams.select(
        F.col("__id").alias("__id_b"),
        F.col("__s").alias("__s_b"),
        F.col("__len").alias("__len_b"),
        F.col("__g"),
    )
    long_cand = (
        grams.join(g2, on="__g")
        .filter(
            (F.col("__id") < F.col("__id_b"))
            & (F.abs(F.col("__len") - F.col("__len_b")) <= k)
        )
        .select("__id", "__s", "__id_b", "__s_b")
        .distinct()
    )

    if skip_short:
        cand = long_cand
    else:
        # SHORT path: too few grams for the bound — pair at the VALUE
        # level (the distinct short strings, a set bounded by
        # alphabet^length, not by corpus rows), verify levenshtein
        # there, then join the surviving value pairs back to ids. A
        # million rows of "Jo" cost ONE distinct value in the cross
        # join, not 10^12 crossed rows. Includes the boundary band
        # [long_floor, short_ceil] so short-vs-long pairs (length gap
        # <= k) are covered by one path or the other.
        shorts = base.filter(F.col("__len") <= short_ceil)
        vals = shorts.select("__s", "__len").distinct()
        v2 = vals.select(
            F.col("__s").alias("__s_b"), F.col("__len").alias("__len_b")
        )
        val_pairs = (
            vals.crossJoin(v2)
            .filter(
                (F.col("__s") <= F.col("__s_b"))
                & (F.abs(F.col("__len") - F.col("__len_b")) <= k)
                & (F.levenshtein("__s", "__s_b") <= k)
            )
            .select("__s", "__s_b")
        )
        ids_a = shorts.select(F.col("__id").alias("__ia"), F.col("__s").alias("__va"))
        ids_b = shorts.select(F.col("__id").alias("__ib"), F.col("__s").alias("__vb"))
        a_first = F.col("__ia") < F.col("__ib")
        short_cand = (
            val_pairs.join(ids_a, val_pairs["__s"] == ids_a["__va"])
            .join(ids_b, val_pairs["__s_b"] == ids_b["__vb"])
            .filter(F.col("__ia") != F.col("__ib"))
            .select(
                F.when(a_first, F.col("__ia")).otherwise(F.col("__ib")).alias("__id"),
                F.when(a_first, F.col("__va")).otherwise(F.col("__vb")).alias("__s"),
                F.when(a_first, F.col("__ib")).otherwise(F.col("__ia")).alias("__id_b"),
                F.when(a_first, F.col("__vb")).otherwise(F.col("__va")).alias("__s_b"),
            )
        )
        cand = long_cand.unionByName(short_cand).distinct()

    return (
        cand.withColumn("distance", F.levenshtein("__s", "__s_b"))
        .filter(F.col("distance") <= k)
        .select(
            F.col("__id").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            F.col("__s").alias(f"{col}_a"),
            F.col("__s_b").alias(f"{col}_b"),
            "distance",
        )
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    col: str,
    max_distance: int = 1,
    left_id: str = "doc_id",
    right_id: str = "doc_id",
    right_col: str | None = None,
    q: int | str = 3,
    saturation: str = "warn",
    max_gram_occupancy: float = 1.0,
    max_short_values: int = 100_000,
) -> DataFrame:
    """Two-table fuzzy equi-join: every (left row, right row) pair whose
    string values are within Levenshtein distance ``max_distance`` —
    the cross-dataset form of :func:`fuzzy_self_pairs` (link a dirty
    feed against a canonical dimension, reconcile two extracts of the
    same entity table). Same q-gram candidate machinery, completeness
    bound, ``q='auto'`` derivation, and saturation guard; the corpus
    stats and the occupancy estimate run over BOTH sides combined
    (their grams share one bucket space, so combined occupancy is the
    saturation knob), and the short-path guard bounds the distinct
    short values of the union (the value-level pairing is a
    left-distinct × right-distinct cross join).

    Output: ``(id_l, id_r, <col>_l, <col>_r, distance)`` — one row per
    matching pair, including exact matches (distance 0). ``right_col``
    defaults to ``col``; ``id_l``/``id_r`` come from ``left_id``/
    ``right_id``. Plan: one gram-keyed hash join between the two
    exploded gram sets (both sides fact-sized, nothing broadcast,
    nothing collected) + JVM levenshtein verify; short strings pair at
    the distinct-VALUE level exactly like the self form.
    """
    auto_q = _validate_fuzzy_args(max_distance, q, saturation)

    k = max_distance
    rcol = right_col or col
    base_l = left.select(
        F.col(left_id).alias("__id"),
        F.col(col).alias("__s"),
        F.length(col).alias("__len"),
    ).filter(F.col("__s").isNotNull())
    base_r = right.select(
        F.col(right_id).alias("__id"),
        F.col(rcol).alias("__s"),
        F.length(rcol).alias("__len"),
    ).filter(F.col("__s").isNotNull())

    skip_short = False
    if saturation != "ignore":
        q, skip_short = _saturation_guard(
            base_l.unionByName(base_r), "fuzzy_join", q, auto_q, k,
            saturation, max_gram_occupancy, max_short_values,
        )

    long_floor = q * (k + 1)  # completeness bound: see module doc
    short_ceil = long_floor + k - 1 if k > 0 else long_floor - 1

    def grams_of(base: DataFrame) -> DataFrame:
        return base.filter(F.col("__len") >= long_floor).select(
            "__id",
            "__s",
            "__len",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, greatest(__len - {q} + 1, 1)),"
                        f" i -> substring(__s, i, {q}))"
                    )
                )
            ).alias("__g"),
        )

    gl = grams_of(base_l)
    gr = grams_of(base_r).select(
        F.col("__id").alias("__id_r"),
        F.col("__s").alias("__s_r"),
        F.col("__len").alias("__len_r"),
        "__g",
    )
    long_cand = (
        gl.join(gr, on="__g")
        .filter(F.abs(F.col("__len") - F.col("__len_r")) <= k)
        .select("__id", "__s", "__id_r", "__s_r")
        .distinct()
    )

    if skip_short:
        cand = long_cand
    else:
        # Value-level short path, two-sided: distinct short values of
        # EACH side cross-pair (bounded by the value spaces, not the
        # row counts), verify levenshtein there, join each side's ids
        # back. Boundary band [long_floor, short_ceil] included on both
        # sides so short-vs-long pairs are covered by one path.
        shorts_l = base_l.filter(F.col("__len") <= short_ceil)
        shorts_r = base_r.filter(F.col("__len") <= short_ceil)
        vals_l = shorts_l.select("__s", "__len").distinct()
        vals_r = shorts_r.select(
            F.col("__s").alias("__s_r"), F.col("__len").alias("__len_r")
        ).distinct()
        val_pairs = (
            vals_l.crossJoin(vals_r)
            .filter(
                (F.abs(F.col("__len") - F.col("__len_r")) <= k)
                & (F.levenshtein("__s", "__s_r") <= k)
            )
            .select("__s", "__s_r")
        )
        ids_l = shorts_l.select(
            F.col("__id").alias("__il"), F.col("__s").alias("__vl")
        )
        ids_r = shorts_r.select(
            F.col("__id").alias("__ir"), F.col("__s").alias("__vr")
        )
        short_cand = (
            val_pairs.join(ids_l, val_pairs["__s"] == ids_l["__vl"])
            .join(ids_r, val_pairs["__s_r"] == ids_r["__vr"])
            .select(
                F.col("__il").alias("__id"),
                F.col("__vl").alias("__s"),
                F.col("__ir").alias("__id_r"),
                F.col("__vr").alias("__s_r"),
            )
        )
        cand = long_cand.unionByName(short_cand).distinct()

    return (
        cand.withColumn("distance", F.levenshtein("__s", "__s_r"))
        .filter(F.col("distance") <= k)
        .select(
            F.col("__id").alias("id_l"),
            F.col("__id_r").alias("id_r"),
            F.col("__s").alias(f"{col}_l"),
            F.col("__s_r").alias(f"{rcol}_r"),
            "distance",
        )
    )
