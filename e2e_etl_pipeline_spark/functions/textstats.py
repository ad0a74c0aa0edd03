"""Text-analysis column expressions for the LLM-data-pipeline surface
(north star, /root/repo/BASELINE.json:6): token counting, quality scoring,
language-ID features, document fingerprinting.

All built-in expressions (split / filter / aggregate / regexp_extract_all):
at 100 TB these run inside the parquet scan stage, no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny English function-word list for the language-ID heuristic. On the
# synthetic corpus the signal is the mechanics, not linguistics.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

# BPE-ish tokenizer: letter runs, digit runs, or single non-alnum-non-space
# symbols — the classic pre-tokenization split (public GPT-2 style).
# Whitespace is the EXPLICIT Java-\s class [ \t\n\x0B\f\r], never the \s
# shorthand: RE2 (DuckDB oracles) excludes \x0B from \s while Java includes
# it, so shorthand classes silently diverge between engines on a \v byte.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def words(col: Column | str) -> Column:
    """Whitespace tokenization → array<string> (empty tokens removed).
    Splits on the explicit [ \\t\\n\\x0B\\f\\r]+ class (== Java \\s, which
    RE2 oracles cannot express as \\s — see BPE_ISH_PATTERN note)."""
    return F.filter(F.split(_c(col), r"[ \t\n\x0B\f\r]+"), lambda w: w != "")


def words_sql(expr: str) -> str:
    """The DuckDB-side twin of ``words()`` for oracle f-strings: the SAME
    whitespace class, empty tokens removed. One definition so an oracle
    cannot drift from the engine tokenizer (round-7 review; several
    pre-round-7 oracles still carry the fragment verbatim — byte-identical
    to this rendering, safe to migrate opportunistically)."""
    return (
        "list_filter(regexp_split_to_array("
        + expr
        + ", '[ \\t\\n\\x0B\\f\\r]+'), w -> w <> '')"
    )


def whitespace_tokens(col: Column | str) -> Column:
    """Token count under whitespace tokenization."""
    return F.size(words(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """Token count under the BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_PATTERN), 0))


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of words that are English function words ∈ [0,1]; NULL for
    empty documents. The core feature of the language-ID heuristic."""
    ws = words(col)
    n = F.size(ws)
    hits = F.size(F.filter(ws, lambda w: F.lower(w).isin(*EN_STOPWORDS)))
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        hits.cast("double") / n.cast("double")
    )


def mean_word_length(col: Column | str) -> Column:
    ws = words(col)
    n = F.size(ws)
    total = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        total.cast("double") / n.cast("double")
    )


def punct_ratio(col: Column | str) -> Column:
    """Punctuation characters / total characters; NULL for empty text."""
    c = _c(col)
    total = F.length(c)
    punct = F.length(c) - F.length(
        F.regexp_replace(c, r"[^\w \t\n\x0B\f\r]", "")
    )
    return F.when(total == 0, F.lit(None).cast("double")).otherwise(
        punct.cast("double") / total.cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite document-quality heuristic ∈ [0,1].

    Rewards: length in a healthy band, low punctuation density, a stopword
    ratio typical of natural text, words of plausible length. A deliberately
    simple, fully-deterministic rational-arithmetic formula so the DuckDB
    oracle reproduces it bit-for-bit.
    """
    c = _c(col)
    n_chars = F.length(c).cast("double")
    len_component = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    sw = F.coalesce(stopword_ratio(c), F.lit(0.0))
    sw_component = F.least(sw * F.lit(4.0), F.lit(1.0))
    pr = F.coalesce(punct_ratio(c), F.lit(1.0))
    punct_component = F.greatest(F.lit(1.0) - pr * F.lit(5.0), F.lit(0.0))
    mwl = F.coalesce(mean_word_length(c), F.lit(0.0))
    mwl_component = F.when((mwl >= 2.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        len_component * F.lit(0.4)
        + sw_component * F.lit(0.2)
        + punct_component * F.lit(0.2)
        + mwl_component * F.lit(0.2)
    )


def word_fingerprint(col: Column | str) -> Column:
    """Order-sensitive rolling (polynomial) hash over the word sequence:
    fp = Σ (fp*31 + len(word)+first_char_code) mod 1e9+7 — a content-defined
    document fingerprint computable identically in any engine with integer
    arithmetic (no engine-specific hash function involved)."""
    ws = words(col)
    step = lambda acc, w: (  # noqa: E731
        acc * FINGERPRINT_BASE + F.length(w) + F.ascii(w)
    ) % FINGERPRINT_MOD
    return F.aggregate(ws, F.lit(0).cast("long"), step)
