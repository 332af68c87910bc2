"""Text analysis expression builders (JVM-side; no Python in the hot path).

Covers the web-pipeline scalar surface the reference lacks (SURVEY.md §2.8
"rebuild adds"): tokenization, n-gram shingling, language-ID heuristic,
quality scoring, token counting, document fingerprinting. Every builder
returns a pyspark Column composed only of built-in functions so the whole
expression stays inside WholeStageCodegen; equivalent DuckDB SQL fragments
live next to the builders for the oracle queries.

Mention/triple extraction grammar: the synthetic corpus is a bag of a
small fixed vocabulary; entity mentions are noun tokens, relations are
verb tokens, and a triple is the trigram pattern "<ENT> <REL> <ENT>"
matched leftmost non-overlapping — semantics identical between Java regex
(Spark) and RE2 (DuckDB) because every alternative is a single word and
the alternatives are anchored by explicit spaces/word boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# extraction grammar (shared Spark/DuckDB)
# ---------------------------------------------------------------------------

ENTITY_WORDS = (
    "customer part line table row column key value data vector "
    "order window batch stream query spark".split()
)
RELATION_WORDS = "join merge filter sort scan hash".split()

_ENT_ALT = "|".join(ENTITY_WORDS)
_REL_ALT = "|".join(RELATION_WORDS)
# leftmost, non-overlapping trigram "ENT REL ENT"
TRIPLE_PATTERN = rf"\b({_ENT_ALT}) ({_REL_ALT}) ({_ENT_ALT})\b"


def tokens(col: Column) -> Column:
    """Whitespace tokenization (collapsing runs of spaces)."""
    return F.split(F.trim(col), " +")


def tokens_sql(expr: str) -> str:
    """DuckDB fragment equivalent to :func:`tokens`."""
    return f"regexp_split_to_array(trim({expr}), ' +')"


def shingles_of(df_tokens_col_name: str, n: int = 3) -> Column:
    """Positional word n-grams joined by a single space (list, with dups),
    over a *named* array column.

    Built with ``transform`` (0-based index) + array indexing so the whole
    thing is one codegen'd expression — no explode needed to produce the
    list; callers explode when they want rows.
    """
    c = df_tokens_col_name
    idx_parts = ", ".join(f"{c}[i + {j}]" for j in range(n))
    return F.expr(
        f"filter(transform({c}, (t, i) -> "
        f"IF(i <= size({c}) - {n}, concat_ws(' ', {idx_parts}), NULL)"
        "), s -> s IS NOT NULL)"
    )


def token_count(col: Column) -> Column:
    """Whitespace token count; 0 for empty/blank strings."""
    return (
        F.when(F.length(F.trim(col)) == 0, F.lit(0))
        .otherwise(F.size(tokens(col)))
        .cast("long")
    )


def token_count_sql(expr: str) -> str:
    return (
        f"CAST(CASE WHEN length(trim({expr})) = 0 THEN 0 "
        f"ELSE len(regexp_split_to_array(trim({expr}), ' +')) END AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# language identification (stopword-profile heuristic)
# ---------------------------------------------------------------------------

# Fixed per-language function-word profiles (the classic cheap lang-ID
# signal; at real web scale the same shape runs with char-n-gram profiles).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "and", "of", "is", "not"),
    "es": ("el", "los", "y", "que", "es", "no"),
    "fr": ("le", "la", "les", "et", "est", "pas"),
}


def lang_scores(text_col: Column) -> dict[str, Column]:
    """Per-language stopword hit counts (long)."""
    toks = tokens(text_col)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in LANG_PROFILES.items()
    }


def lang_pred(scores: dict[str, Column]) -> Column:
    """Argmax language with alphabetical tie-break (deterministic)."""
    best = F.greatest(*scores.values())
    expr = None
    for lang in sorted(scores):
        cond = scores[lang] == best
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr


def lang_scores_sql(text_expr: str) -> dict[str, str]:
    toks = tokens_sql(text_expr)
    return {
        lang: (
            f"CAST(len(list_filter({toks}, t -> t IN "
            f"({', '.join(repr(w) for w in words)}))) AS BIGINT)"
        )
        for lang, words in LANG_PROFILES.items()
    }


# BPE-ish piece pattern: letter runs | digit runs | single other symbol
PIECE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def quality_features(text_col: Column) -> dict[str, Column]:
    """Quality-scoring features: n_chars, n_tokens, distinct-token ratio
    (lexical diversity), stopword ratio ('the'/'a')."""
    toks = tokens(text_col)
    n_tok = F.size(toks).cast("long")
    n_chars = F.length(text_col).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin("the", "a"))).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "distinct_ratio": F.round(n_distinct / n_tok, 6),
        "stopword_ratio": F.round(n_stop / n_tok, 6),
    }
