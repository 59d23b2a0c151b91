"""Text analysis operators: token counting, quality scoring, language
ID, document fingerprinting.  Everything is built-in-function SQL
(split/filter/regexp/md5) so it stays inside whole-stage codegen and is
mirrorable 1:1 in the DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword lists for the n-gram/stopword-hit language
# heuristic.  Deterministic and mirrored verbatim in oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}

# A BPE-ish token pattern: runs of letters, runs of digits, or a single
# non-space symbol — the shape subword tokenizers pre-split on.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def word_count(text: Column) -> Column:
    """Whitespace token count: the number of ``\\S+`` runs, counted
    directly by ``regexp_count`` — no token-array materialization.
    Exactly equivalent to the r12 split+filter form (split on ``\\s+``
    of the trimmed text yields one element per non-space run, and the
    ``!= ''`` filter discarded the empty artifacts for empty /
    whitespace-only docs, which ``regexp_count`` never produces), and
    measured ~35% cheaper per corpus pass at sf0.1 — one regex scan
    per row vs split-allocate-filter-size (r13; the win is
    per-row, so it holds at any scale).  Empty / whitespace-only text
    counts 0; NULL stays NULL."""
    return F.regexp_count(text, F.lit(r"\S+"))


def token_count(text: Column) -> Column:
    """BPE-ish token count via regexp occurrences (JVM regexp_count)."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-alphanumeric, non-space characters.  Empty text
    → 0.0 (nullif guard: under ANSI mode — Spark 4's default — a bare
    /0 raises DIVIDE_BY_ZERO and kills the job on one empty row); NULL
    text stays NULL (ADVICE r4: an unguarded coalesce scored a missing
    document as perfectly clean in standalone quality screens)."""
    # Count the punctuation chars via translate-delete: strip every
    # alphanumeric/whitespace char (an explicit 68-char list — the
    # complement of the oracle's [^A-Za-z0-9\s] class, with \s spelled
    # out as Java regex defines it) and measure what is left.
    # translate is a flat per-char table lookup; measured 4.6x faster
    # than regexp_count of the negated class and ~5x faster than the
    # r12 regexp_replace+length-diff form at sf1 (BASELINE.md r13),
    # value-identical on every fixture (pinned by the oracle-parity
    # suite, whose DuckDB mirror keeps the regex form).
    _ALNUM_WS = (
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
        "0123456789 \t\n\x0b\x0c\r"
    )
    return F.when(
        text.isNotNull(),
        F.coalesce(
            F.length(F.translate(text, _ALNUM_WS, ""))
            / F.nullif(F.length(text), F.lit(0)),
            F.lit(0.0),
        ),
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopword share of the whitespace tokens; empty text → 0.0 (same
    ANSI /0 guard as punct_ratio), NULL text → NULL (same ADVICE r4
    guard).  Tokenization and the match rule live in
    :func:`stopword_hits` / :func:`word_count` — one definition for the
    engine and its oracle mirror to track."""
    return F.when(
        text.isNotNull(),
        F.coalesce(
            stopword_hits(text, lang)
            / F.nullif(word_count(F.lower(text)), F.lit(0)),
            F.lit(0.0),
        ),
    )


def quality_score(text: Column) -> Column:
    """Heuristic quality score in [0, 1]: rewards mid-length docs and
    moderate punctuation, penalizes very short fragments.  The exact
    formula is arbitrary; its value is being cheap, deterministic and
    SQL-mirrorable."""
    wc = word_count(text).cast("double")
    length_term = F.least(wc / F.lit(100.0), F.lit(1.0))
    punct_term = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(5.0)
    )
    return F.round(length_term * F.lit(0.7) + punct_term * F.lit(0.3), 6)


def stopword_hits(text: Column, lang: str) -> Column:
    words = F.split(F.lower(text), r"\s+")
    return F.size(
        F.filter(
            words, lambda w: w.isin(*[F.lit(s) for s in STOPWORDS[lang]])
        )
    )


def lang_id(text: Column) -> Column:
    """Stopword-hit language heuristic: argmax of per-language hit
    counts, ties resolved in fixed key order (en, de, es, fr).

    Single pass: one split, one ``aggregate`` carrying all per-language
    counters, argmax via a packed ``hits*n + tie_priority`` score so no
    subexpression is referenced (and re-evaluated) more than once.  The
    naive formulation — a nested WHEN chain over per-language
    ``size(filter(split(...)))`` columns — duplicates the split/filter
    subtree ~2^langs times in the plan and ran ~25x slower."""
    langs = list(STOPWORDS)
    n = len(langs)
    words = F.split(F.lower(text), r"\s+")

    def step(acc: Column, w: Column) -> Column:
        return F.array(
            *[
                acc[i]
                + F.when(
                    w.isin(*[F.lit(s) for s in STOPWORDS[lang]]), F.lit(1)
                ).otherwise(F.lit(0))
                for i, lang in enumerate(langs)
            ]
        )

    hits = F.aggregate(words, F.array(*[F.lit(0)] * n), step)
    # pack hit count with tie priority (earlier language wins ties)
    scores = F.transform(hits, lambda h, i: h * n + (F.lit(n - 1) - i))
    best = F.array_max(scores)
    idx = F.lit(n - 1) - (best % n)  # 0-based language index
    return F.element_at(
        F.array(*[F.lit(lang) for lang in langs]), (idx + 1).cast("int")
    )


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: lowercase, strip punctuation, collapse
    whitespace, sort word set, md5.  Two documents that differ only in
    case/punctuation/word order collide — the standard cheap canonical
    form for fuzzy-exact dedup."""
    norm = F.lower(text)
    norm = F.regexp_replace(norm, r"[^a-z0-9\s]", "")
    words = F.filter(
        F.split(norm, r"\s+"), lambda w: F.length(w) > 0
    )
    canon = F.array_join(F.array_sort(F.array_distinct(words)), " ")
    return F.md5(canon.cast("binary"))
