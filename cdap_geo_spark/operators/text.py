"""Text-analysis operators for training-data pipelines.

These run over the relational ``documents`` table (doc_id, text, lang,
source, n_chars) and over the interleaved-docs text spans. Everything
here is NATIVE Catalyst expressions (whole-stage codegen, no Python)
except the winnowing fingerprint, which is an Arrow PUDF.

Counting idioms are chosen to be bit-identical in ANSI SQL (the DuckDB
oracle): exact-string ``replace`` counting instead of regex classes
(Java regex vs RE2 differ at the edges), integer outputs instead of
rounded doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

#: marker words per language for the n-gram/stopword-vote heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "la", "et"],
    "es": ["el", "que", "los"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish splitting is `tokens_bpeish`)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(text), r"\s+")))


def _count_occurrences(text: Column, needle: str) -> Column:
    """Exact-substring occurrence count via length difference —
    identical semantics in every SQL engine (no regex)."""
    return ((F.length(text) - F.length(F.replace(text, F.lit(needle))))
            / len(needle)).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / whitespace / digit counts + token count —
    the standard cheap quality signals, all codegen'd."""
    t = F.col(text_col)
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    return df.withColumns({
        "n_chars_q": F.length(t).cast("long"),
        "n_tokens": token_count(t).cast("long"),
        "n_commas": _count_occurrences(t, ","),
        "n_periods": _count_occurrences(t, "."),
        "n_spaces": _count_occurrences(t, " "),
        "n_the": _count_occurrences(padded, " the "),
    })


def lang_votes(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word vote counts per language + argmax prediction.

    The stopword-vote heuristic: count ' <marker> ' substrings in the
    lower-cased text, sum per language, predict the max (ties broken
    by language-code order); 'und' (unknown) when all votes are 0.
    """
    t = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    out = df
    for lang, words in LANG_MARKERS.items():
        vote = None
        for w in words:
            c = _count_occurrences(t, f" {w} ")
            vote = c if vote is None else vote + c
        out = out.withColumn(f"votes_{lang}", vote)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"votes_{la}") for la in langs])
    pred = F.lit("und")
    for la in reversed(langs):  # earlier lang wins ties
        pred = F.when(F.col(f"votes_{la}") == best, F.lit(la)).otherwise(pred)
    out = out.withColumn("lang_pred", F.when(best > 0, pred)
                         .otherwise(F.lit("und")))
    return out


def doc_digest(text: Column) -> Column:
    """Normalized exact-dup digest: md5(lower(trim(text)))."""
    return F.md5(F.lower(F.trim(text)))


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct character k-grams of the lower-cased text — native
    sequence+transform, no Python.

    Guard: Spark's ``sequence(1, n)`` yields a DESCENDING sequence when
    n < 1, so short texts must short-circuit to an empty array.
    """
    t = F.lower(text)
    n = F.length(t) - F.lit(k - 1)
    grams = F.array_distinct(
        F.transform(F.sequence(F.lit(1), n),
                    lambda i: F.substring(t, i, k)))
    return F.when(n >= 1, grams) \
            .otherwise(F.array().cast(T.ArrayType(T.StringType())))


def winnow_fingerprints(k: int = 5, window: int = 4,
                        gram_hash: str = "md5"):
    """Arrow PUDF: winnowing document fingerprints (Schleimer et al.,
    SIGMOD'03): hash char k-grams, keep the min hash of every `window`
    consecutive positions -> array<long> of distinct selected
    fingerprints. The scale path for plagiarism-style overlap
    detection.

    ``gram_hash='md5'`` (default) uses the 60-bit md5-prefix gram hash,
    which the DuckDB oracle recomputes exactly (window min + distinct
    are plain SQL); ``'poly'`` keeps the faster rolling polynomial.
    """
    import hashlib

    B = np.uint64(1000003)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for txt in texts:
            if txt is None or len(txt) < k:
                out.append([])
                continue
            t = txt.lower()
            if gram_hash == "md5":
                n = len(t) - k + 1
                hs = np.fromiter(
                    (int(hashlib.md5(t[i:i + k].encode("utf-8", "ignore"))
                         .hexdigest()[:15], 16) for i in range(n)),
                    np.uint64, count=n)
            else:
                data = np.frombuffer(t.encode("utf-8", "ignore"),
                                     dtype=np.uint8).astype(np.uint64)
                n = len(data) - k + 1
                if n <= 0:
                    out.append([])
                    continue
                # rolling hash via cumulative powers (vectorized)
                with np.errstate(over="ignore"):
                    hs = np.zeros(n, np.uint64)
                    for j in range(k):  # k is tiny (5): k vector ops
                        hs = hs * B + data[j:j + n]
            mask = (np.uint64(0x7FFFFFFFFFFFFFFF) if gram_hash != "md5"
                    else np.uint64((1 << 63) - 1))
            if n <= window:
                out.append([int(hs.min() & mask)])
                continue
            sw = np.lib.stride_tricks.sliding_window_view(hs, window)
            mins = sw.min(axis=1)
            sel = np.unique(mins & mask)
            out.append([int(v) for v in sel])
        return pd.Series(out)
    return _fp


# ---------------------------------------------------------------------------
# corpus sampling / vocabulary (training-data pipeline staples)
# ---------------------------------------------------------------------------

def stratified_sample(df, fractions: dict, *, strata_col: str = "lang",
                      id_col: str = "doc_id", seed: int = 17,
                      default_fraction: float = 0.0):
    """Deterministic per-stratum sampling — the language/source quota
    pass every training-data pipeline runs before tokenization.

    Row keep-test: ``md5(id || ':' || seed)``'s 60-bit prefix compared
    against ``fraction * 2^60`` — a pure map-side filter (no shuffle,
    no RNG state, stable under retries/resume, exactly recomputable by
    the SQL oracle). Unlike ``df.sample``'s per-partition RNG, the
    decision rides the ROW (id), so repartitioning, AQE re-plans or
    task retries can never change the sample — the property a
    resumable 100 TB pipeline needs.

    ``fractions`` maps stratum value -> fraction in [0, 1]; strata not
    in the map get ``default_fraction``.
    """
    scale = 1 << 60
    h = F.conv(F.substring(
        F.md5(F.encode(F.concat_ws(":", F.col(id_col).cast("string"),
                                   F.lit(str(seed))), "UTF-8")),
        1, 15), 16, 10).cast("long")
    thr = None
    for stratum, frac in fractions.items():
        t = F.lit(int(frac * scale))
        thr = F.when(F.col(strata_col) == stratum, t) if thr is None \
            else thr.when(F.col(strata_col) == stratum, t)
    thr = (thr.otherwise(F.lit(int(default_fraction * scale)))
           if thr is not None
           else F.lit(int(default_fraction * scale)))
    return df.filter(h < thr)


def vocab_topk(df, *, k: int = 100, text_col: str = "text",
               min_count: int = 1):
    """(token, count, rank): the exact top-k whitespace tokens by
    corpus frequency, ties broken by token — the vocabulary-building
    pass. explode -> hash-groupBy (map-side partial aggregation: the
    shuffle carries one (token, partial_count) row per token per map
    partition, bounded by vocabulary not corpus) -> one final
    window rank over the token-count relation (vocab-sized)."""
    from pyspark.sql import Window
    toks = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
        .alias("token")).filter(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count("*").alias("count")) \
                 .filter(F.col("count") >= min_count)
    # orderBy+limit compiles to TakeOrderedAndProject — a DISTRIBUTED
    # top-k (per-partition bounded heaps merged at the driver), never
    # a full sort or a single-partition exchange over the vocabulary.
    top = counts.orderBy(F.desc("count"), F.asc("token")).limit(k)
    # rank assignment runs on the k-row result only
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w))
