"""Text analysis operators: stats, quality, language-ID, fingerprinting.

All pure ``pyspark.sql.functions`` column expressions — no UDFs, fully
inside whole-stage codegen, trivially scalable: each operator is a narrow
map over the documents table (no shuffle at all until an aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword language heuristic
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "in"],
    "es": ["el", "la", "los", "que", "y"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "les", "des", "et", "une"],
}

#: BPE-ish word/number/symbol tokenization (lowercase corpus)
TOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (the corpus is single-space separated)."""
    return F.split(col, " ")


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: lengths, token counts, lexical diversity.

    ``quality_uniq_ratio`` (type-token ratio) is the standard cheap
    repetition-quality signal for corpus filtering.
    """
    t = tokens(text_col)
    n_tok = F.size(t)
    n_uniq = F.size(F.array_distinct(t))
    n_chars = F.length(text_col)
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        F.round(n_uniq / n_tok, 6).alias("quality_uniq_ratio"),
        # total token chars = chars minus the (n_tokens - 1) separators
        F.round((n_chars - (n_tok - F.lit(1))) / n_tok, 6).alias("avg_token_len"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '{TOKEN_RE}', 0)")).alias(
            "n_bpe_ish_tokens"
        ),
    )


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language heuristic.

    Score per language = number of *distinct* stopwords present; the guess
    takes the max score with a lexicographic tie-break (deterministic).
    """
    t = F.array_distinct(tokens(text_col))
    score_cols = {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    out = docs.select("doc_id", *[c.alias(f"score_{lang}") for lang, c in score_cols.items()])
    # max-score with 'lang asc' tie-break, as a fold over the sorted langs
    guess = F.lit(None).cast("string")
    best = F.lit(-1)
    for lang in sorted(STOPWORDS):
        cur = F.col(f"score_{lang}")
        guess = F.when(cur > best, F.lit(lang)).otherwise(guess)
        best = F.when(cur > best, cur).otherwise(best)
    return out.withColumn("lang_guess", guess)


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical-form document fingerprint: md5 of the lower-cased,
    whitespace-collapsed text. The cheap first stage of any dedup DAG."""
    normalized = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return docs.select("doc_id", F.md5(normalized.cast("binary")).alias("fingerprint"))


def sql_lang_scores() -> str:
    """DuckDB oracle for :func:`lang_scores` (shared CASE-chain tie-break)."""
    score_exprs = ",\n       ".join(
        f"len(list_intersect(list_distinct(string_split(text, ' ')), "
        f"{STOPWORDS[lang]!r})) AS score_{lang}"
        for lang in STOPWORDS
    )
    langs = sorted(STOPWORDS)
    guess, best = "NULL", "-1"
    for lang in langs:
        guess = f"CASE WHEN score_{lang} > {best} THEN '{lang}' ELSE {guess} END"
        best = f"CASE WHEN score_{lang} > {best} THEN score_{lang} ELSE {best} END"
    return f"""
WITH scored AS (
  SELECT doc_id,
       {score_exprs}
  FROM documents)
SELECT doc_id, score_en, score_es, score_de, score_fr,
       {guess} AS lang_guess
FROM scored
"""
