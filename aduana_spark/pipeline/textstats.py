"""Text analysis for corpus curation — all hot paths are native
Column expressions (JVM, whole-stage codegen); nothing per-row Python.

- token counting: whitespace split + a BPE-ish regex tokenizer,
- quality scoring: length / punctuation / stopword ratios
  (Gopher-style heuristics),
- language ID: stopword-hit-rate heuristic over small built-in lists,
- document fingerprinting: xxhash64 over normalized shingles →
  min-hash fingerprint (rolling-hash flavored),
- keyword scorer: min(1, matches/20), the reference's example content
  scorer (/root/reference/examples/keywords/scorer.py:10-21) — the
  content-score source feeding personalized PageRank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish word/number/punct pieces
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": "the of and to in a is that it for on with as was at by this".split(),
    "de": "der die das und ist von zu mit den nicht ein eine auf für".split(),
    "fr": "le la les de des et un une est dans que pour sur avec pas".split(),
    "es": "el la los de y que en un una es no por con para del".split(),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def token_count_col(text: Column | str, mode: str = "whitespace") -> Column:
    """Token count. ``whitespace``: split on runs of whitespace;
    ``bpeish``: regex pieces (letters / digits / single punct)."""
    text = _c(text)
    if mode == "whitespace":
        trimmed = F.trim(text)
        return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
            F.size(F.split(trimmed, r"\s+"))
        )
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_RE), F.lit(0)))


def _count_matches(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-signal columns: n_chars, n_tokens, punct_ratio,
    stopword_ratio, mean_token_len, quality_score ∈ [0,1]."""
    text = _c(text_col)
    n_chars = F.length(text)
    n_tokens = token_count_col(text)
    n_punct = _count_matches(text, r"[^\w\s]")
    n_alpha = _count_matches(text, r"[A-Za-z]")
    sw = "|".join(_STOPWORDS["en"])
    n_stop = F.size(
        F.regexp_extract_all(F.lower(text), F.lit(rf"\b(?:{sw})\b"), F.lit(0))
    )
    out = (
        df.withColumn("n_chars", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_token_len",
            F.when(n_tokens > 0, n_alpha / n_tokens).otherwise(F.lit(0.0)),
        )
    )
    # Gopher-flavored composite: in-range length, sane punctuation,
    # non-trivial stopword presence
    len_ok = F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.0)
    punct_ok = F.when(F.col("punct_ratio") <= 0.3, 1.0).otherwise(0.0)
    stop_ok = F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
    return out.withColumn(
        "quality_score", (len_ok + punct_ok + stop_ok) / 3.0
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``lang_pred``: argmax stopword hit rate over built-in
    lists, 'und' when nothing matches. Pure Column expressions —
    a greatest(struct(hits, lang)) argmax."""
    text = F.lower(_c(text_col))
    structs = []
    for lang, words in _STOPWORDS.items():
        pat = rf"\b(?:{'|'.join(words)})\b"
        hits = F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        structs.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*structs)
    return df.withColumn(
        "lang_pred", F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def keyword_score_col(text: Column | str, keywords: list[str]) -> Column:
    """X10 (examples/keywords/scorer.py:10-21): score =
    min(1, matches/20) over a keyword list."""
    import re as _re

    # escape terms: a keyword like 'c++' must match literally, not
    # blow up the alternation (an oracle comparing this column must
    # apply the same escaping; plain-word terms are unchanged)
    pat = rf"(?i)\b(?:{'|'.join(_re.escape(k) for k in keywords)})\b"
    matches = F.size(F.regexp_extract_all(_c(text), F.lit(pat), F.lit(0)))
    return F.least(matches / F.lit(20.0), F.lit(1.0))


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals: for each token n-gram size in
    ``ns``, the fraction of n-gram occurrences that are repeats of an
    earlier n-gram in the same document —
    ``dup_{n}gram_frac = 1 − distinct/total``. Boilerplate and
    spam-generated pages score high; clean prose scores near 0. All
    native Column expressions (split/transform/array_distinct), one
    narrow projection per document — no shuffle, no Python."""
    text = _c(text_col)
    toks = F.split(F.trim(F.lower(F.regexp_replace(text, r"\s+", " "))), " ")

    def _grams(n: int) -> Column:
        # NB: a two-arg lambda (even with a default) would be treated
        # by transform() as the (element, index) form — bind n here
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))

    cols = [F.col(id_col)]
    for n in ns:
        grams = _grams(n)
        total = F.size(grams)
        frac = F.when(
            total > 0,
            F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
        ).otherwise(F.lit(0.0))
        cols.append(total.alias(f"total_{n}grams"))
        cols.append(frac.alias(f"dup_{n}gram_frac"))
    return df.select(*cols)


def triangle_score_col(density: Column | str, peak: float) -> Column:
    """X11 — the locations example's ``triangle(a)`` scorer
    (examples/locations/locations/spiders/locations.py:18-26): score
    peaks at 1.0 when the density equals ``peak`` and falls off
    linearly to 0 at density 0 and density 1."""
    x = _c(density)
    return F.when(
        x <= peak, F.lit(1.0) - (F.lit(peak) - x) / F.lit(peak)
    ).otherwise(F.lit(1.0) - (x - F.lit(peak)) / F.lit(1.0 - peak))


def entity_density_score(
    df: DataFrame,
    terms: list[str],
    peak: float = 0.005,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The locations example's scoring pipeline (locations.py:33-58)
    with the gazetteer as a term list: count word-bounded matches of
    any term, divide by text length (entity density — the example's
    ``Σ gid_count / len(text)``), and score with the triangle scorer.
    The reference tags entities with a GeoNames gazetteer (external
    data, not shipped); any term dictionary plugs in here — the
    matching is one JVM-side regexp over the alternation, no Python.

    Returns (id, n_entities, density, entity_score)."""
    import re as _re

    text = _c(text_col)
    # gazetteer terms like 'st. louis' must match literally (escaped);
    # plain-word terms produce the identical pattern as before
    pat = rf"(?i)\b(?:{'|'.join(_re.escape(t) for t in terms)})\b"
    hits = F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
    density = F.when(
        F.length(text) > 0, hits.cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        hits.alias("n_entities"),
        density.alias("density"),
        triangle_score_col(density, peak).alias("entity_score"),
    )


def document_fingerprint(
    df: DataFrame, text_col: str = "text", shingle_k: int = 3
) -> DataFrame:
    """Append a 64-bit ``fingerprint``: min over xxhash64 of k-token
    shingles of the normalized text (rolling-hash style content
    fingerprint; identical for reordered whitespace / case).
    Shingles are built with native sequence/transform — no Python."""
    toks = F.split(F.trim(F.lower(F.regexp_replace(_c(text_col), r"\s+", " "))), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - shingle_k, F.lit(0)))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, shingle_k))
    )
    fp = F.array_min(F.transform(shingles, lambda s: F.xxhash64(s)))
    return df.withColumn("fingerprint", fp)
