"""Text vectorization primitives — pure Column expressions (JVM-side,
whole-stage-codegen'd; no Python UDFs in the hot path).

Semantics pinned to the reference (see SURVEY.md §1.4):

* character 3-grams over the raw string (reference ``src/cossim.rs:43``);
* deduplicated → binary presence weights (``src/cossim.rs:49``);
* only trigrams matching ``[a-z]{3}`` survive — the reference keeps only
  tokens present in its fixed lowercase 26³ vocabulary
  (``src/cossim.rs:14-25,50``), so any trigram containing an uppercase
  letter, digit, space or punctuation is dropped entirely;
* strings with < 3 chars (or no in-vocab trigram) vectorize to the empty
  set and can never match;
* null strings → empty set (deliberate deviation: the reference panics on
  null keys, ``src/cossim.rs:42``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def let_col(value: Column, body) -> Column:
    """Bind ``value`` to a lambda variable and return ``body(var)`` — a
    let-binding for Column expressions.

    Spark's higher-order functions INLINE captured expressions into the
    lambda body, so a lambda over ``sequence(...)`` that references a
    computed expression (a ``split``, a ``regexp_replace``) re-evaluates
    it for EVERY array element — measured 5-6× on shingle vectorization
    at sf0.1. Wrapping the expression in a 1-element array and going
    through ``transform`` forces one evaluation into a
    ``NamedLambdaVariable``; every use inside ``body`` then reads the
    bound value. Same semantics for null/deterministic expressions
    (``body(NULL)`` ≡ inlined-on-NULL), one array allocation of overhead.
    """
    return F.element_at(F.transform(F.array(value), body), 1)


def normalize_string_col(s: Column | str) -> Column:
    """Reference P2 (``join.py:6-12``): strip non-alphanumerics, lowercase."""
    return F.lower(F.regexp_replace(_as_col(s), "[^a-zA-Z0-9]", ""))


def trigram_tokens(s: Column | str) -> Column:
    """Distinct in-vocab character trigrams of ``s`` as ``array<string>``.

    Reference ``transform`` (``src/cossim.rs:27-60``) re-expressed as a
    declarative expression: sliding ``substring`` windows → regex vocab
    filter → ``array_distinct``. Null / short strings yield an empty array.
    """
    def body(sv: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.length(sv) - F.lit(2)),
            lambda i: F.substring(sv, i, F.lit(3)),
        )
        toks = F.array_distinct(F.filter(grams, lambda g: g.rlike("^[a-z]{3}$")))
        empty = F.array().cast("array<string>")
        return F.when(F.length(sv) >= F.lit(3), toks).otherwise(empty)

    # let-bound: callers pass computed strings (the word-normalized path
    # lower+regexp_replace's the key) and inlining would re-run that per
    # character position.
    return let_col(_as_col(s), body)


def trigram_id(g: Column) -> Column:
    """Dense id of an ``[a-z]{3}`` trigram in the fixed 26³ vocabulary.

    The reference builds a ``HashMap`` once (``src/cossim.rs:14-25``); the
    same mapping is pure arithmetic on char codes, so no dictionary or
    fitting step is needed: ``id = (c0-97)*676 + (c1-97)*26 + (c2-97)``.
    """
    c0 = F.ascii(F.substring(g, 1, 1)) - F.lit(97)
    c1 = F.ascii(F.substring(g, 2, 1)) - F.lit(97)
    c2 = F.ascii(F.substring(g, 3, 1)) - F.lit(97)
    return (c0 * F.lit(676) + c1 * F.lit(26) + c2).cast("long")


def trigram_token_ids(s: Column | str) -> Column:
    """Distinct in-vocab trigram ids of ``s`` as ``array<long>`` (0..17575)."""
    return F.transform(trigram_tokens(s), trigram_id)


def word_shingles(s: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``s`` as ``array<string>``.

    Not in the reference (its unit is the character trigram); used by the
    document-level dedup operators (MinHash / Jaccard) where word shingles
    are the standard unit. Lowercases and splits on whitespace.
    """
    def body(words: Column) -> Column:
        k = F.size(words) - F.lit(n - 1)
        sh = F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
        empty = F.array().cast("array<string>")
        return F.when(k >= F.lit(1), F.array_distinct(sh)).otherwise(empty)

    # let-bound: inlined, the split+trim+lower re-runs once PER SHINGLE
    # POSITION (measured 5-6× slower on the documents corpus at sf0.1).
    return let_col(F.split(F.trim(F.lower(_as_col(s))), r"\s+"), body)
