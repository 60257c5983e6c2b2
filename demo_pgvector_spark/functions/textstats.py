"""Text-analysis scalar functions for the LLM-training-data pipeline
surface (extension pillar: language ID, quality scoring, token counting,
document fingerprinting — none exist in the reference, whose only text
analytics is the per-text word frequency inside the embedder,
src/lib/embedding.py:88-107).

Everything is a pure Catalyst expression over the text column — codegen,
shuffle-free, linear in input size; nothing leaves the JVM. At 100 TB
these run as map-side projections fused into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker-word profiles for the n-gram/stopword language heuristic. Small
# on purpose: the operator contract is a deterministic argmax over
# profile-hit counts with alphabetical tie-break, not a production
# classifier (which would be a fastText-style model in a pandas_udf).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "los", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不"),
}

STOPWORDS = LANG_PROFILES["en"]

FINGERPRINT_MULT = 31
FINGERPRINT_P = 4_294_967_311  # prime > 2^32; acc*31 stays well under 2^63


def _tokens(c: Column) -> Column:
    return F.split(F.lower(c), " ")


def lang_scores(c: Column, toks: Column | None = None) -> dict[str, Column]:
    """Per-language profile-hit counts. Pass ``toks`` pre-projected on
    hot paths — inlined, each language's filter re-splits the text
    (lambda-bearing trees are opaque to codegen CSE)."""
    if toks is None:
        toks = _tokens(c)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in sorted(LANG_PROFILES.items())
    }


def lang_pred(scores: dict[str, Column]) -> Column:
    """Argmax of per-language scores, alphabetical tie-break, 'unknown'
    when no profile word appears. Feed it PROJECTED score columns: the
    argmax references every score ~3× (greatest + each branch), so
    inlined score expressions multiply their own cost."""
    m = F.greatest(*scores.values())
    out = F.lit("unknown")
    expr = None
    for lang in sorted(scores):
        cond = scores[lang] == m
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return F.when(m > 0, expr.otherwise(out)).otherwise(out)


def lang_id(c: Column) -> Column:
    """Predicted language (one-shot convenience form; the registry row
    stages tokens → hit columns → argmax instead — see lang_pred)."""
    return lang_pred(lang_scores(c))


def token_counts(c: Column) -> tuple[Column, Column, Column]:
    """(whitespace tokens, BPE-ish regex tokens, ~4-chars-per-token
    subword estimate). The regex token stream is words plus isolated
    punctuation — the classic pre-tokenizer approximation."""
    ws = F.size(F.split(F.trim(c), r"\s+"))
    bpe = F.regexp_count(c, F.lit(r"\w+|[^\w\s]"))
    est = F.ceil(F.length(c) / 4).cast("int")
    return ws, bpe, est


def quality_components(c: Column, toks: Column | None = None) -> dict[str, Column]:
    """Raw quality signals: length, token count, mean token length,
    stopword ratio, punctuation ratio. Pass ``toks`` pre-projected on
    hot paths (see lang_scores)."""
    if toks is None:
        toks = _tokens(c)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    # greatest(...,1) guards the empty-text row: ANSI mode makes /0 throw
    n_tok_safe = F.greatest(n_tokens, F.lit(1))
    n_chr_safe = F.greatest(n_chars, F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (n_chars - (n_tokens - 1)) / n_tok_safe,
        "stopword_ratio": stop_hits / n_tok_safe,
        "punct_ratio": punct / n_chr_safe,
    }


def quality_score_from(q: dict[str, Column]) -> Column:
    """Composite [0,1] quality score from (ideally projected) component
    columns: rewards reasonable length and stopword presence, penalizes
    punctuation soup — the standard heuristic-filter shape."""
    length_term = F.least(q["n_tokens"] / 50.0, F.lit(1.0))
    stop_term = F.least(q["stopword_ratio"] * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(q["punct_ratio"] * 4.0, F.lit(1.0))
    return 0.4 * length_term + 0.3 * stop_term + 0.3 * punct_term


def quality_score(c: Column) -> Column:
    """One-shot convenience form of quality_score_from (the registry row
    stages components first)."""
    return quality_score_from(quality_components(c))


def _ngrams(toks: Column, n: int) -> Column:
    """Word n-grams as joined strings; empty array when the doc has
    fewer than n tokens (``sequence(0, size-n)`` would otherwise build a
    DESCENDING range). Linear per row (sequence + transform + slice — no
    self-product), so the projection stays scan-fused at 100 TB."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def repetition_components(
    c: Column, toks: Column | None = None, lines: Column | None = None
) -> dict[str, Column]:
    """Repetition signals in the Gopher/MassiveText filter family: the
    fraction of duplicated unigrams / bigrams / trigrams in the word
    stream, and of duplicated lines. High values mark boilerplate,
    keyword stuffing, and template spam — the pathology class the
    length/stopword signals in ``quality_components`` cannot see.
    (Document-level screens; corpus-level near-dup lives in
    operators/dedup.py.)

    Cost shape: each gram array is constructed exactly ONCE, inside its
    ``array_distinct`` — higher-order-function lambdas defeat codegen's
    subexpression elimination, so a second textual use of the array
    (e.g. ``size(grams)`` for the denominator) would rebuild every gram
    string per row. Totals instead come from arithmetic on
    ``size(tokens)`` (an n-token doc has n−k+1 k-grams), which halved
    the measured cost at 10× scale.

    Pass ``toks``/``lines`` as PRE-PROJECTED columns to also tokenize
    once: inlined, the split runs inside each of the three gram lambdas
    (plus the line split) — four tokenizations per row for the same
    reason the gram arrays needed single construction. The registry row
    projects both and measured another ~1.6× at sf0.1."""
    if toks is None:
        toks = _tokens(c)
    if lines is None:
        lines = F.split(c, "\n")
    n_tok = F.size(toks)
    out: dict[str, Column] = {}
    for n, name in ((1, "dup_unigram_frac"), (2, "dup_bigram_frac"), (3, "dup_trigram_frac")):
        grams = toks if n == 1 else _ngrams(toks, n)
        total = (
            n_tok
            if n == 1
            else F.when(n_tok >= n, n_tok - (n - 1)).otherwise(F.lit(0))
        )
        distinct = F.size(F.array_distinct(grams))
        out[name] = (total - distinct) / F.greatest(total, F.lit(1))
    out["dup_line_frac"] = (F.size(lines) - F.size(F.array_distinct(lines))) / F.greatest(
        F.size(lines), F.lit(1)
    )
    return out


def repetition_flag(
    c: Column,
    max_dup_unigram: float = 0.3,
    max_dup_bigram: float = 0.2,
    max_dup_line: float = 0.3,
) -> Column:
    """Boolean screen: true when any repetition fraction exceeds its
    threshold (defaults in the range the Gopher rules popularized)."""
    r = repetition_components(c)
    return (
        (r["dup_unigram_frac"] > max_dup_unigram)
        | (r["dup_bigram_frac"] > max_dup_bigram)
        | (r["dup_line_frac"] > max_dup_line)
    )


# The Gopher rules' stop list (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", table A1):
# a document must contain at least 2 DISTINCT words from this list.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def gopher_components(
    c: Column, toks: Column | None = None, lines: Column | None = None
) -> dict[str, Column]:
    """Raw counts behind the Gopher document-quality rules (Rae et al.
    2021 table A1 — the MassiveText screen later adopted by RefinedWeb
    and Dolma). Counts only, every one BIGINT: the rule thresholds are
    ratios (symbol/word ≤ 0.1, bullet lines ≤ 90%, …), but comparing
    cross-multiplied integers (``10·sym ≤ n_words``) instead of float
    ratios makes every verdict bit-identical on any engine — the same
    per-mille discipline as sample_stratified. Pass ``toks``/``lines``
    pre-projected on hot paths (lambda trees are opaque to codegen CSE;
    see repetition_components).

    Unlike quality_components' single-space split, words here are
    ``\\s+`` tokens of the trimmed text — the Gopher rules reason about
    lines too, so newlines must separate words, not embed in them."""
    if toks is None:
        toks = F.split(F.trim(F.lower(c)), r"\s+")
    if lines is None:
        lines = F.split(c, "\n")
    n_words = F.size(toks).cast("bigint")
    # Σ length(word): whole-word character mass for the mean-word-length
    # rule (3 ≤ mean ≤ 10 becomes 3·n ≤ chars ≤ 10·n).
    word_chars = F.aggregate(
        F.transform(toks, F.length),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    sym_hits = (
        F.regexp_count(c, F.lit("#")) + F.regexp_count(c, F.lit(r"\.\.\."))
    ).cast("bigint")
    n_lines = F.size(lines).cast("bigint")
    bullet_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))
    ).cast("bigint")
    ellipsis_lines = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("bigint")
    alpha_words = F.size(
        F.filter(toks, lambda t: t.rlike("[a-z]"))
    ).cast("bigint")
    # DISTINCT stop-list hits: iterate the 8-word list, not the doc
    # (array_contains scans the token array once per stop word).
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains(toks, w),
        )
    ).cast("bigint")
    return {
        "n_words": n_words,
        "word_chars": word_chars,
        "sym_hits": sym_hits,
        "n_lines": n_lines,
        "bullet_lines": bullet_lines,
        "ellipsis_lines": ellipsis_lines,
        "alpha_words": alpha_words,
        "stop_hits": stop_hits,
    }


def gopher_flags(g: dict[str, Column]) -> dict[str, Column]:
    """Per-rule boolean verdicts from (ideally projected) gopher
    component columns — integer cross-multiplication only, no float
    division anywhere. A document is kept iff every flag is true."""
    return {
        "ok_words": (g["n_words"] >= GOPHER_MIN_WORDS)
        & (g["n_words"] <= GOPHER_MAX_WORDS),
        # 3 ≤ word_chars / n_words ≤ 10
        "ok_mean_len": (g["word_chars"] >= 3 * g["n_words"])
        & (g["word_chars"] <= 10 * g["n_words"]),
        # symbol-to-word ratio ≤ 0.1
        "ok_symbol": 10 * g["sym_hits"] <= g["n_words"],
        # ≤ 90% of lines start with a bullet
        "ok_bullet": 10 * g["bullet_lines"] <= 9 * g["n_lines"],
        # ≤ 30% of lines end with an ellipsis
        "ok_ellipsis": 10 * g["ellipsis_lines"] <= 3 * g["n_lines"],
        # ≥ 80% of words contain an alphabetic character
        "ok_alpha": 5 * g["alpha_words"] >= 4 * g["n_words"],
        # ≥ 2 distinct stop words present
        "ok_stop": g["stop_hits"] >= 2,
    }


def fingerprint(c: Column) -> Column:
    """Order-sensitive polynomial rolling hash over the word stream:
    h_i = (31·h_{i-1} + hash32(w_i)) mod p. Same text → same value;
    any insertion/deletion/reorder changes it (unlike the bag-of-words
    MinHash family in operators/dedup.py)."""
    return F.aggregate(
        F.transform(
            F.split(F.lower(c), " "),
            lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * FINGERPRINT_MULT + x) % FINGERPRINT_P,
    )
