"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §2.11 extensions; no reference equivalent — the reference
stops at ingestion, seghouse/jobs/send_to_warehouse.py).

Everything here is pure Column expressions (JVM, codegen'd) so it
scales linearly with executors — no Python in the hot path. Each
builder has an exactly-equivalent DuckDB SQL formulation used by the
oracle entries in plans/ext.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | single digits | single
# non-alnum marks (GPT-2-style pre-tokenization, simplified to be
# regex-portable between Spark (Java regex) and DuckDB (RE2)).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Small ASCII stopword sets per supported language (top function
# words). Shared literal lists with the oracle SQL — keep in sync via
# sql_stopword_list().
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "en": ("the", "a", "of", "and", "is", "not", "to", "in", "it", "that"),
    "es": ("el", "la", "de", "y", "es", "no", "un", "con", "por", "que"),
    "fr": ("le", "la", "de", "et", "est", "pas", "un", "avec", "pour", "que"),
    "zh": ("de", "shi", "bu", "le", "zai", "you", "he", "wo", "ta", "men"),
}
LANGS = tuple(sorted(STOPWORDS))  # deterministic priority order


def words(text: Column) -> Column:
    """Whitespace tokenization; empty text -> empty array."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def lang_score(text: Column, lang: str) -> Column:
    """# distinct stopwords of `lang` present in the text."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(words(F.lower(text)), sw))


def lang_id(text: Column) -> Column:
    """Predicted language = argmax stopword score, ties broken by
    alphabetical language order; all-zero scores -> 'und'
    (undetermined, BCP-47 convention)."""
    scores = {lang: lang_score(text, lang) for lang in LANGS}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build right-to-left so earlier langs win ties
    for lang in reversed(LANGS):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopword tokens / total tokens (counts repeats, unlike
    lang_score)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    ws = words(F.lower(text))
    hits = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    n = F.size(ws)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits / n)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: rewards mid-length docs
    and normal word length, penalizes punctuation soup. Formula is
    fixed and mirrored in the oracle SQL — weights are heuristic, the
    contract is determinism."""
    n_chars = F.length(text)
    n_words = token_count_ws(text)
    avg_wlen = F.when(n_words == 0, F.lit(0.0)).otherwise(
        n_chars.cast("double") / n_words
    )
    len_term = F.least(n_words.cast("double") / F.lit(100.0), F.lit(1.0))
    wlen_term = F.when((avg_wlen >= 3) & (avg_wlen <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 4, F.lit(1.0))
    return F.round(0.4 * len_term + 0.3 * wlen_term + 0.3 * punct_term, 4)


def _ngrams(ws: Column, n: int) -> Column:
    """Non-distinct word n-grams (space-joined); < n words -> empty.
    Pure projection (sequence + element_at), same shape as the
    dedup shingle builder but keeping multiplicity — repetition
    metrics need occurrence counts, not sets."""
    idx = F.sequence(F.lit(1), F.size(ws) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(n)]),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def mean_word_len(text: Column) -> Column:
    """Average word length = non-whitespace chars / word count
    (words are maximal non-space runs, so the two are equivalent —
    and this form needs no per-word fold)."""
    n = token_count_ws(text)
    chars = F.length(F.regexp_replace(text, r"\s+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(chars.cast("double") / n)


def top_ngram_frac(text: Column, n: int = 2) -> Column:
    """Fraction of n-gram occurrences taken by the single most
    frequent n-gram (Rae et al., Gopher repetition filter — public).
    Per-doc O(distinct² ) via filter-count over the gram array: fine
    for document-sized inputs, and entirely JVM-side."""
    g = _ngrams(words(F.lower(text)), n)
    cnt = F.size(g)
    top = F.array_max(
        F.transform(
            F.array_distinct(g), lambda b: F.size(F.filter(g, lambda x: x == b))
        )
    )
    return F.when(cnt == 0, F.lit(0.0)).otherwise(top.cast("double") / cnt)


def dup_ngram_frac(text: Column, n: int = 3) -> Column:
    """Fraction of n-gram occurrences that are repeats
    (1 - distinct/total): the duplicate-n-gram Gopher signal."""
    g = _ngrams(words(F.lower(text)), n)
    cnt = F.size(g)
    return F.when(cnt == 0, F.lit(0.0)).otherwise(
        (cnt - F.size(F.array_distinct(g))).cast("double") / cnt
    )


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lower, strip non-alnum to
    spaces, collapse whitespace, trim."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9]+", " ")
    return F.trim(t)


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))


def fingerprint_rolling(
    text: Column,
    base: int = 31,
    word_base: int = 131,
    mod: int = 1_000_000_007,
) -> Column:
    """Polynomial rolling hash over normalized words:
    h = fold(h*base + word_hash(w)) mod m, where word_hash is itself a
    polynomial fold over the word's codepoints. Order-sensitive
    (unlike a set hash) — catches reorderings md5-of-sorted-words
    would miss. Expressed with nested F.aggregate: one pass, JVM-side.

    The codepoint-polynomial word hash (rather than crc32) keeps the
    whole fingerprint portable to the DuckDB oracle (list_reduce /
    list_transform twin in plans/ext.py), so it's value-checked
    cross-engine, not just rows-only."""
    ws = words(normalized_text(text))

    def word_hash(w: Column) -> Column:
        return F.aggregate(
            F.split(w, ""),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * word_base + F.ascii(c)) % mod,
        )

    return F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * base + word_hash(w)) % mod,
    )


# ---------------------------------------------------------------------------
# DuckDB-side mirrors (used by plans/ext.py oracles)
# ---------------------------------------------------------------------------


def sql_stopword_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"


SQL_WORDS = "regexp_split_to_array(trim({t}), '\\s+')"


def sql_token_count_ws(t: str) -> str:
    return f"CASE WHEN length(trim({t})) = 0 THEN 0 ELSE len({SQL_WORDS.format(t=t)}) END"


def sql_lang_score(t: str, lang: str) -> str:
    return (
        f"len(list_intersect(list_distinct({SQL_WORDS.format(t=f'lower({t})')}), "
        f"{sql_stopword_list(lang)}))"
    )


def sql_ngrams(ws: str, n: int) -> str:
    """DuckDB twin of _ngrams over an already-built word array `ws`.
    range(a, b) is exclusive of b, so the index set matches Spark's
    inclusive sequence(1, size - (n-1))."""
    joined = " || ' ' || ".join(
        f"{ws}[i]" if j == 0 else f"{ws}[i+{j}]" for j in range(n)
    )
    return (
        f"CASE WHEN len({ws}) >= {n} "
        f"THEN list_transform(range(1, len({ws}) - {n - 2}), i -> {joined}) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )
