"""Text-analysis expressions (LLM-pipeline extension, SURVEY.md §2.12):
tokenization, quality scoring, language-ID heuristic, content fingerprint.

All built-in expressions (split / higher-order array fns / hash) — these run
inside whole-stage codegen and need no shuffle, so they stream over 100 TB of
documents at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small function-word lists per language for the n-gram/marker heuristic.
# Real deployments would swap in a trained model (fastText etc.) behind the
# same column signature; the heuristic keeps everything JVM-side.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "es": ("el", "la", "y", "los", "es", "un", "una", "que"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}

# Generic stopword list used by the quality score (matches the fixture vocab
# closely enough to exercise the ratio math).
STOPWORDS: tuple[str, ...] = ("the", "a", "an", "and", "or", "of", "to", "is", "in", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization → array<string> (dask.bag ``str.split`` demos).

    Trims first and drops empty tokens so ``""`` → ``[]`` (plain
    ``split('', '\\s+')`` yields ``['']`` and leading whitespace yields a
    leading empty token, which would skew counts, fingerprints, and simhash
    signatures downstream)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(col), r"\s+"), lambda w: w != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def avg_word_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0.0), lambda acc, w: acc + F.length(w))
    return total / F.size(toks)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    # greatest(.., 1) guard: a zero-token doc must yield 0.0 on BOTH engines
    # (unguarded, Spark gives NULL but DuckDB's IEEE float division gives NaN,
    # which would poison any avg() over the ratio). Oracle twins mirror this.
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.greatest(F.length(col), F.lit(1))


# GPT-2-style pre-tokenizer shape, restricted to constructs Java regex and
# RE2 (the DuckDB oracle) interpret identically: contractions, letter runs
# (with optional leading space), digit runs, punctuation runs.
BPE_PRETOKEN_RE = r"'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_pre_tokens(text: Column | str) -> Column:
    """BPE-style pre-tokenization (the unit a BPE tokenizer would merge
    within): regexp_extract_all with a GPT-2-shaped pattern. Stays JVM-side;
    the count approximates LLM token counts far better than whitespace."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(BPE_PRETOKEN_RE), 0)


def bpe_token_count(text: Column | str) -> Column:
    return F.size(bpe_pre_tokens(text))


def rolling_fingerprint(text: Column | str, base: int = 1000003) -> Column:
    """Order-SENSITIVE document fingerprint via a polynomial rolling hash
    over per-token xxhash64 values: h = (h*base + hash(tok)) mod (2³¹−1).
    The explicit Mersenne modulus keeps every intermediate < 2⁵², so the
    fold is ANSI-safe (no long overflow) and portable. Unlike
    doc_fingerprint (bag-of-words), swapped tokens change the value;
    computed in one JVM fold per doc — the cheap shard-stable dedup key for
    ordered content at scale."""
    p = F.lit(2147483647).cast("long")  # 2^31 - 1
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(acc * F.lit(base).cast("long") + F.pmod(F.xxhash64(t), p), p),
    )


# Explicit whitespace class for normalize_for_dedup, shared with the DuckDB
# oracle twin. A bare \s diverges cross-engine (Java includes \x0B, RE2 does
# not) and misses Unicode space separators entirely — NBSP would fall into
# the stripped class, so 'foo bar' canonicalized to 'foobar' instead of
# 'foo bar' and an NBSP spacing variant failed to collapse with its
# space-separated twin. Written with \x{...} escapes that Java regex and RE2
# parse identically: ASCII controls + the Unicode Zs separators + LS/PS.
WS_CLASS = (
    r" \t\n\x{0B}\f\r\x{85}\x{A0}\x{1680}\x{2000}-\x{200A}"
    r"\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}"
)


def normalize_for_dedup(text: Column | str) -> Column:
    """Canonical text form for normalization-aware dedup (the C4/RefinedWeb
    pre-hash step): strip everything but letters/digits/whitespace, collapse
    whitespace runs (including NBSP and other Unicode spaces — see
    ``WS_CLASS``) to single spaces, trim, lowercase. Case, punctuation, and
    spacing variants of the same passage then hash identically. Pure codegen
    expressions (regexp_replace + lower + trim); the DuckDB twin applies the
    identical explicit-class patterns in the same order."""
    col = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(col, rf"[^\p{{L}}\p{{N}}{WS_CLASS}]", "")
    collapsed = F.regexp_replace(stripped, rf"[{WS_CLASS}]+", " ")
    return F.lower(F.trim(collapsed))


def doc_fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Two documents with the same bag of words collide — the classic
    cheap near-dup prefilter before MinHash."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    return F.md5(canon)


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    # real closure, NOT a default-arg lambda: a 2-param lambda would be read
    # by F.filter as (element, index) and the marker tuple would get bound to
    # the index Column.
    return F.size(F.filter(toks, lambda w: w.isin(*markers)))


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Marker-word hit count per candidate language."""
    toks = tokens(text)
    return {lang: _marker_hits(toks, markers) for lang, markers in LANG_MARKERS.items()}


#: The language-ID swap-in contract: any callable mapping a text Column to a
#: language-code Column (string). A trained model — e.g. a fastText scorer
#: wrapped in a pandas_udf — satisfies it as-is; so does the built-in marker
#: heuristic. Exercised by tests/test_textops.py::test_predict_lang_model_seam.
LangModel = "Callable[[Column], Column]"


def predict_lang(text: Column | str, model=None) -> Column:
    """Language ID: argmax of marker-word hits; deterministic tie-break by
    language code (max over structs compares score first, then lang
    lexicographically).

    ``model`` is the declared swap-in seam (``LangModel``): pass any
    text-Column → lang-Column callable (a fastText pandas_udf in a real
    deployment) and it replaces the heuristic without touching any caller —
    the catalog query, quality gates, and CCNet banding all flow through
    this one function. Proven swappable by
    tests/test_textops.py::test_predict_lang_model_seam."""
    col = F.col(text) if isinstance(text, str) else text
    if model is not None:
        return model(col)
    scores = lang_scores(col)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in scores.items()]
    )
    return F.array_max(pairs)["lang"]
