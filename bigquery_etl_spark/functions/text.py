"""Text-analysis functions for training-data pipelines (charter Tier C):
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All built-in-function compositions — JVM-side, codegen,
no UDFs — so they run at full scan speed over 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword-ratio
# language heuristic. Public knowledge (most-frequent function words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "no", "un", "una"],
}

# A BPE-ish tokenizer regex (public GPT-2-style pattern, simplified to
# RE2/Java compatible): word pieces, numbers, punctuation runs.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def ws_tokens(text: str | Column) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def bpe_ish_tokens(text: str | Column) -> Column:
    """Regex sub-word-ish tokenization: letter runs, digit runs, punct runs."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def lang_id_score(text: str | Column, lang: str) -> Column:
    """Fraction of whitespace tokens that are marker stopwords of `lang`."""
    toks = ws_tokens(text)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(markers, F.lower(t))))
    return hits / F.greatest(F.size(toks), F.lit(1))


def lang_id(text: str | Column) -> Column:
    """argmax over LANG_MARKERS of lang_id_score; 'und' if no marker hits."""
    scores = [(lang, lang_id_score(text, lang)) for lang in LANG_MARKERS]
    best_score = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    for lang, s in scores:  # first-wins on ties via reversed fold
        result = F.when((s == best_score) & (best_score > 0), F.lit(lang)).otherwise(result)
    return result


def quality_gate(
    text: str | Column = "text", min_tokens: int = 10, max_tokens: int = 100_000
) -> Column:
    """Integer-exact corpus quality predicate shared by
    ``q_pretrain_corpus`` and ``pipeline.corpus.CorpusBuilder`` (one
    definition, or the two corpora silently diverge): whitespace token
    count within bounds AND distinct-token ratio >= 1/5 (``distinct*5 >=
    n`` — exact, no float division)."""
    t = ws_tokens(text)
    n = F.size(t)
    return (
        (n >= min_tokens)
        & (n <= max_tokens)
        & (F.size(F.array_distinct(t)) * 5 >= n)
    )


def quality_features(text: str | Column) -> dict[str, Column]:
    """Quality-scoring features: length, token stats, punct/digit/upper
    ratios, stopword ratio — the usual pre-training filter inputs."""
    c = F.col(text) if isinstance(text, str) else text
    toks = ws_tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": (
            F.aggregate(toks, F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)).cast("double")
            / F.greatest(n_tokens, F.lit(1))
        ),
        "punct_ratio": (n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))) / safe_chars,
        "digit_ratio": (n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))) / safe_chars,
        "upper_ratio": (n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))) / safe_chars,
        "stopword_ratio": lang_id_score(c, "en"),
    }


def doc_fingerprint(text: str | Column) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token set — stable under token reordering, cheap exact near-dup key."""
    toks = F.array_sort(F.array_distinct(ws_tokens(text)))
    return F.md5(F.concat_ws("|", toks))
