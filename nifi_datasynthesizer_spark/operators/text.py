"""Text-analysis operators for training-data pipelines.

Language ID, quality scoring, token counting, fingerprinting — each a
pure column expression over the ``documents`` table, designed so the
whole corpus pass is one narrow codegen stage (no shuffle until the
caller aggregates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# stopword beacons per language — tiny, high-precision function-word sets
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "es": ["el", "la", "los", "las", "que", "de", "una"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "it": ["il", "la", "che", "di", "un", "per", "con"],
    "pt": ["o", "os", "uma", "que", "de", "para", "com"],
}


def _word_array(col):
    return F.split(F.lower(F.trim(col)), r"\s+")


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = count of marker stopwords per
    language; argmax wins, 'und' (undetermined) when no marker hits.
    One pass, no shuffle; markers are plan literals."""
    words = _word_array(F.col(text_col))
    scores = [
        F.size(F.filter(words, lambda w: w.isin(*marks))).alias(f"score_{lang}")
        for lang, marks in _LANG_MARKERS.items()
    ]
    scored = docs.select("*", *scores)
    pairs = F.array(*[
        F.struct(F.col(f"score_{lang}").alias("s"), F.lit(lang).alias("l"))
        for lang in _LANG_MARKERS
    ])
    best = F.array_max(pairs)
    return (scored
            .withColumn("pred_lang",
                        F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und")))
            .withColumn("lang_score", best["s"])
            .drop(*[f"score_{lang}" for lang in _LANG_MARKERS]))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style quality signals, all engine-side:

    - n_chars, n_words, mean word length
    - alpha ratio (letters / chars), punct ratio, digit ratio
    - stopword ratio (English beacons)
    - max single-word repetition fraction
    plus a blended 0..1 `quality` score."""
    text = F.col(text_col)
    words = _word_array(text)
    n_chars = F.length(text)
    n_words = F.size(words)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    punct = F.length(F.regexp_replace(text, r"[^.,;:!?'\"()]", ""))
    stop = F.size(F.filter(words, lambda w: w.isin(*_LANG_MARKERS["en"])))
    uniq = F.size(F.array_distinct(words))
    # NOTE: ratios are raw IEEE doubles, NOT rounded — int/int division
    # is bit-identical across engines, but round() of a double is not
    # (JVM rounds the shortest decimal repr, DuckDB rounds the binary)
    out = docs.select(
        "*",
        n_chars.alias("q_n_chars"),
        n_words.alias("q_n_words"),
        (n_chars / F.greatest(n_words, F.lit(1))).alias("q_mean_word_len"),
        (alpha / F.greatest(n_chars, F.lit(1)).cast("double")).alias("q_alpha_ratio"),
        (digits / F.greatest(n_chars, F.lit(1)).cast("double")).alias("q_digit_ratio"),
        (punct / F.greatest(n_chars, F.lit(1)).cast("double")).alias("q_punct_ratio"),
        (stop / F.greatest(n_words, F.lit(1)).cast("double")).alias("q_stopword_ratio"),
        (uniq / F.greatest(n_words, F.lit(1)).cast("double")).alias("q_distinct_ratio"),
    )
    quality = (
        F.when(F.col("q_n_words") < 5, 0.0)
        .otherwise(
            F.least(F.lit(1.0),
                    F.col("q_alpha_ratio") * 0.5
                    + F.col("q_distinct_ratio") * 0.3
                    + F.least(F.col("q_stopword_ratio") * 4.0, F.lit(1.0)) * 0.2))
    )
    return out.withColumn("quality", quality)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token statistics: whitespace tokens and a BPE-ish sub-word count
    (regexp over letter-runs/digit-runs/punct, ~GPT-2 pre-tokenizer
    shape), plus a chars/4 estimate — the three standard budgeting
    signals for LLM corpus sizing."""
    text = F.col(text_col)
    ws = F.size(_word_array(text))
    bpe_ish = F.size(F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]|\s+"), 0))
    return docs.select(
        "*",
        ws.alias("tok_whitespace"),
        bpe_ish.alias("tok_bpe_ish"),
        F.ceil(F.length(text) / 4.0).cast("long").alias("tok_chars_div4"),
    )


def hash_embed(docs: DataFrame, dim: int = 16,
               text_col: str = "text") -> DataFrame:
    """Feature-hashing text embedding: ``embedding`` = length-``dim``
    array of token counts bucketed by h60(token) mod dim — the classic
    hashing-trick vectorizer, producing input for the ANN/embedding
    operators without any model.

    Counts stay INTEGER (no normalization here — ann_* operators
    l2-normalize on the way in), which keeps the column exactly
    replayable in SQL with zero float-formatting concerns.  Tokens are
    hashed ONCE into a materialized bucket array; the per-bucket counts
    then scan that small int array `dim` times (cheap compares), not
    the md5 pass.
    """
    from ..phash import h60
    from .dedup import normalize_text

    toks = F.split(normalize_text(F.col(text_col)), " ")
    hs_expr = F.transform(toks, lambda s: h60(s) % dim)

    # bind the hashed buckets ONCE via the 1-element-array transform
    # (an alias referenced once gets inlined by CollapseProject and the
    # md5 pass would re-run per output lane — see dedup._shingles)
    def body(hb):
        return F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda k: F.size(F.filter(hb, lambda h: h == k)).cast("long"))

    counts = F.element_at(F.transform(F.array(hs_expr), body), 1)
    return docs.select("*", counts.alias("embedding"))


def fingerprint(docs: DataFrame, text_col: str = "text",
                ngram: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: min and max h60 over word
    8-grams plus full-document hash — the winnowing-style sketch used
    for fast containment checks (cheaper than MinHash when only a few
    hashes are needed).  h60 (portable md5-derived hash, phash.py)
    keeps the sketch replayable in the DuckDB oracle."""
    from ..phash import h60
    from .dedup import _shingles, normalize_text

    from .dedup import ensure_parallelism
    docs = ensure_parallelism(docs)
    grams = _shingles(F.col(text_col), ngram)
    # hash the grams once into a materialized column; min and max then
    # read the same array (two references to a non-cheap alias keep
    # CollapseProject from inlining the md5 pass twice)
    hashed = docs.select(
        "*", F.transform(grams, lambda g: h60(g)).alias("__fp_hs"))
    return hashed.select(
        "*",
        h60(normalize_text(F.col(text_col))).alias("fp_full"),
        F.array_min("__fp_hs").alias("fp_min"),
        F.array_max("__fp_hs").alias("fp_max"),
    ).drop("__fp_hs")
