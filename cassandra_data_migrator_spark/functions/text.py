"""Text-analysis functions for the LLM-data-pipeline extensions (SURVEY.md §2b
E4/E5 and the training-data operator set): tokenization, language-ID heuristic,
quality scoring, token counting, document fingerprinting.

Everything here is a JVM-side Column expression (split/regexp/md5/aggregate) so
it stays inside whole-stage codegen — no Python UDFs in the hot path. Each
function has a deterministic ANSI-SQL twin used by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization

TOKEN_SPLIT_RE = r"\s+"


def tokens(c: Column | str) -> Column:
    """Lowercased whitespace tokens, empty strings removed."""
    c = F.col(c) if isinstance(c, str) else c
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def token_count_ws(c: Column | str) -> Column:
    return F.size(tokens(c)).cast("bigint")


# --- script-aware tokenization (r09, verdict #3) -------------------------
# Whitespace tokenization silently collapses no-whitespace scripts (CJK,
# Thai) to one token per run, skewing every token-count-derived statistic
# on multilingual crawls. The script-aware path emits each Han / Hiragana /
# Katakana / Thai character as its own token (the char-segmentation
# baseline real BPE tokenizers approximate) and keeps whitespace-delimited
# chunks for everything else. Two regex dialects, one semantics: Java
# (Spark) needs the Is prefix on script properties; RE2 (DuckDB) takes the
# bare script name — cross-engine agreement is pinned by the
# tokenizer_cjk_fertility oracle and tests/test_text_functions.py.
CJK_CLASS_JAVA = r"\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsThai}"
CJK_CLASS_RE2 = r"\p{Han}\p{Hiragana}\p{Katakana}\p{Thai}"
SCRIPT_TOKEN_RE_JAVA = f"([{CJK_CLASS_JAVA}]|[^\\s{CJK_CLASS_JAVA}]+)"
SCRIPT_TOKEN_RE_RE2 = f"([{CJK_CLASS_RE2}]|[^\\s{CJK_CLASS_RE2}]+)"
CJK_SINGLE_RE_JAVA = f"^[{CJK_CLASS_JAVA}]$"
CJK_SINGLE_RE_RE2 = f"^[{CJK_CLASS_RE2}]$"


def tokens_script(c: Column | str) -> Column:
    """Lowercased script-aware tokens: one token per CJK/Thai character,
    whitespace-delimited runs elsewhere. A JVM regexp_extract_all — stays
    inside codegen like tokens()."""
    c = F.col(c) if isinstance(c, str) else c
    return F.regexp_extract_all(F.lower(c), F.lit(SCRIPT_TOKEN_RE_JAVA), 1)


def token_count_script(c: Column | str) -> Column:
    return F.size(tokens_script(c)).cast("bigint")


WORD_CHUNK_RE = "[A-Za-z0-9]+"
PUNCT_RE = "[^A-Za-z0-9 ]"


def token_count_bpe_ish(c: Column | str) -> Column:
    """A BPE-ish proxy: alphanumeric chunks + each punctuation mark counts as
    one token (regex is RE2/Java-compatible so DuckDB matches)."""
    c = F.col(c) if isinstance(c, str) else c
    return (F.regexp_count(c, F.lit(WORD_CHUNK_RE)) + F.regexp_count(c, F.lit(PUNCT_RE))).cast("bigint")


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
#
# Deterministic marker-word vote: count occurrences of per-language stopword
# markers in the token stream; argmax with a fixed precedence order. The DuckDB
# oracle re-states the identical CASE expression, so the check verifies the
# engine computes the declared heuristic exactly.

LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "y", "es"],
}


def _marker_count(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(words))).cast("bigint")


def lang_scores(c: Column | str) -> dict[str, Column]:
    toks = tokens(c)
    return {lang: _marker_count(toks, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(c: Column | str) -> Column:
    """Argmax over marker counts; ties and zero-evidence → 'und'. Precedence
    order en > de > fr > es for exact ties (documented, deterministic)."""
    s = lang_scores(c)
    best = F.greatest(*s.values())
    expr = F.lit("und")
    # build reverse so earlier langs win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (s[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_sql(text_expr: str) -> str:
    """DuckDB twin of lang_id(); len(list_filter(tokens, ...)) per language."""
    toks = f"list_filter(string_split_regex(lower({text_expr}), '\\s+'), t -> t <> '')"
    counts = {
        lang: f"len(list_filter({toks}, t -> t IN ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in LANG_MARKERS.items()
    }
    best = f"greatest({', '.join(counts.values())})"
    branches = " ".join(
        f"WHEN {best} > 0 AND {counts[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"(CASE {branches} ELSE 'und' END)"


# ---------------------------------------------------------------------------
# quality scoring

STOPWORDS = ["the", "a", "of", "and", "is", "to", "in"]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword features + a composite quality score in
    [0,1] (rounded to 4dp for cross-engine determinism)."""
    toks = tokens(text_col)
    n_tokens = F.size(toks).cast("bigint")
    n_punct = F.regexp_count(F.col(text_col), F.lit(PUNCT_RE)).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("bigint")
    n_bytes = F.octet_length(F.col(text_col)).cast("bigint")
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    length_score = F.least(F.lit(1.0), n_tokens / F.lit(100.0))
    punct_penalty = F.least(F.lit(1.0), n_punct / F.lit(50.0))
    score = F.round(
        length_score * F.lit(0.5) + stop_ratio * F.lit(0.5) - punct_penalty * F.lit(0.25), 4
    )
    return df.select(
        F.col("doc_id"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        n_bytes.alias("n_bytes"),
        score.alias("quality"),
    )


# ---------------------------------------------------------------------------
# fingerprinting

NORMALIZE_RE = r"[^a-z0-9 ]"


def normalized_text(c: Column | str) -> Column:
    """Canonical form: lowercase, strip non-alphanumerics, collapse whitespace."""
    c = F.col(c) if isinstance(c, str) else c
    collapsed = F.regexp_replace(F.regexp_replace(F.lower(c), NORMALIZE_RE, ""), r"\s+", " ")
    return F.trim(collapsed)


def fingerprint(c: Column | str) -> Column:
    """Deterministic document fingerprint = md5 of the normalized text (hex,
    lowercase — identical in DuckDB)."""
    return F.md5(normalized_text(c))


FINGERPRINT_SQL = (
    "md5(trim(regexp_replace(regexp_replace(lower({col}), '[^a-z0-9 ]', '', 'g'),"
    " '\\s+', ' ', 'g')))"
)


# ---------------------------------------------------------------------------
# shingles (shared by n-gram Jaccard + MinHash dedup)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED token array
    column. Callers must project the token array first (``.withColumn``/
    ``select``): if ``toks`` were the tokenization expression itself, every
    per-element ``slice`` in the lambda would re-run the regex split —
    O(tokens²) work per row (measured 40× slowdown on the documents table)."""
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - F.lit(n), F.lit(0)))
    shingled = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(k >= n, F.array_distinct(shingled)).otherwise(F.array())


def word_shingles(c: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string> (convenience form —
    for hot paths prefer projecting tokens() first, see shingles_from_tokens)."""
    return shingles_from_tokens(tokens(c), n)
