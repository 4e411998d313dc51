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


#: GPT-2-style pretokenizer, restricted to the Java∩RE2 subset (no
#: lookahead — the real GPT-2 pattern's trailing `\s+(?!\S)` is RE2-
#: incompatible): contraction suffixes, space-prefixed letter runs,
#: digit runs, punctuation runs. Leftmost-first alternation order is
#: identical in both engines, so counts hash-match the oracle.
BPEISH_PATTERN = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def tokens_bpeish(text: Column) -> Column:
    """BPE-ish pretoken count (``BPEISH_PATTERN`` matches — the number
    of byte-pair-encoder INPUT chunks, the standard proxy for token
    cost before a real vocabulary is applied). Native ``regexp_count``:
    whole-stage codegen, no Python."""
    return F.regexp_count(text, F.lit(BPEISH_PATTERN))


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


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Array of space-joined word n-grams over whitespace tokens —
    native zip_with (n=2) or sequence+transform+slice, no Python.
    Docs with fewer than n tokens yield an empty array (the guard
    matters twice: ``sequence(1, m)`` DESCENDS when m < 1 — same trap
    as :func:`shingles` — and ``split('')`` yields ``['']``, which
    would count one phantom token on empty text)."""
    toks = F.split(F.trim(text), r"\s+")
    if n == 2:      # two aligned slices beat per-index slicing
        grams = F.zip_with(
            F.slice(toks, F.lit(1), F.size(toks) - 1),
            F.slice(toks, F.lit(2), F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b))
    else:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when((F.length(F.trim(text)) > 0) & (F.size(toks) >= n),
                  grams) \
            .otherwise(F.array().cast(T.ArrayType(T.StringType())))


def word_2grams(text: Column) -> Column:
    """Array of space-joined word 2-grams (``word_ngrams(text, 2)``)."""
    return word_ngrams(text, 2)


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        how: str = "explode") -> DataFrame:
    """Gopher-style intra-document repetition signals over word
    2-grams (Rae et al. 2021 §A1.1 use duplicate-n-gram fractions as
    a core quality filter; cdap_geo has no text ops — this extends the
    engine for training-data pipelines): per doc,

    - ``n_2grams``            total 2-gram instances,
    - ``n_distinct_2grams``   distinct 2-grams,
    - ``max_2gram_count``     occurrences of the most repeated 2-gram,
    - ``n_dup_2gram_instances`` instances of 2-grams occurring > once.

    All integers (bit-comparable to the SQL oracle). Docs with < 2
    tokens produce no row on either engine.

    Two plans, identical outputs (pytest-pinned):

    - ``how='explode'`` (default): explode → groupBy(doc, gram) →
      groupBy(doc). Scale story: a doc's grams arrive in one input
      partition, so map-side partial aggregation collapses the first
      shuffle to one row per (doc, DISTINCT gram) — the same bounded
      relation every dedup operator here shuffles — and the second
      groupBy is one row per doc.
    - ``how='mapside'``: ZERO shuffle — sort the gram array per row
      and fold one ``F.aggregate`` run-length pass over it inside
      whole-stage codegen. The per-row cost is the array_sort; at
      100 TB this is the plan that never exchanges anything.
    """
    grams = word_2grams(F.col(text_col))
    if how == "mapside":
        def _merge(acc, x):
            run_done = acc["dup"] + F.when(acc["run"] > 1,
                                           acc["run"]).otherwise(F.lit(0))
            return (
                F.when(acc["run"] == 0,                  # first element
                       F.struct(x.alias("prev"),
                                F.lit(1).cast("long").alias("run"),
                                F.lit(1).cast("long").alias("nd"),
                                acc["mx"].alias("mx"),
                                acc["dup"].alias("dup")))
                 .when(x == acc["prev"],                 # run continues
                       F.struct(acc["prev"].alias("prev"),
                                (acc["run"] + 1).alias("run"),
                                acc["nd"].alias("nd"),
                                acc["mx"].alias("mx"),
                                acc["dup"].alias("dup")))
                 .otherwise(                             # run ends
                       F.struct(x.alias("prev"),
                                F.lit(1).cast("long").alias("run"),
                                (acc["nd"] + 1).alias("nd"),
                                F.greatest(acc["mx"], acc["run"])
                                 .alias("mx"),
                                run_done.alias("dup"))))

        def _finish(acc):
            return F.struct(
                acc["nd"].alias("nd"),
                F.greatest(acc["mx"], acc["run"]).alias("mx"),
                (acc["dup"] + F.when(acc["run"] > 1, acc["run"])
                               .otherwise(F.lit(0))).alias("dup"))

        # NOT lit(None).cast(struct).withField(...): withField on a
        # NULL struct stays NULL and the fold would never start
        zero = F.struct(F.lit(None).cast("string").alias("prev"),
                        F.lit(0).cast("long").alias("run"),
                        F.lit(0).cast("long").alias("nd"),
                        F.lit(0).cast("long").alias("mx"),
                        F.lit(0).cast("long").alias("dup"))
        st = F.aggregate(F.array_sort(grams), zero, _merge, _finish)
        return (df.select(F.col(id_col),
                          F.size(grams).cast("long").alias("n_2grams"),
                          st.alias("_st"))
                  .filter(F.col("n_2grams") >= 1)
                  .select(id_col, "n_2grams",
                          F.col("_st.nd").alias("n_distinct_2grams"),
                          F.col("_st.mx").alias("max_2gram_count"),
                          F.col("_st.dup").alias("n_dup_2gram_instances")))
    g = df.select(F.col(id_col), F.explode(grams).alias("_g"))
    c = g.groupBy(id_col, "_g").agg(F.count("*").alias("_cnt"))
    return c.groupBy(id_col).agg(
        F.sum("_cnt").cast("long").alias("n_2grams"),
        F.count("*").cast("long").alias("n_distinct_2grams"),
        F.max("_cnt").cast("long").alias("max_2gram_count"),
        F.sum(F.when(F.col("_cnt") > 1, F.col("_cnt")).otherwise(0))
         .cast("long").alias("n_dup_2gram_instances"))


def contamination_scores(corpus: DataFrame, probe: DataFrame, *,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         n: int = 2) -> DataFrame:
    """Eval-set decontamination scores: for every corpus doc, how many
    of its DISTINCT word n-grams appear anywhere in the probe corpus
    (the benchmark/eval set being protected). The standard n-gram
    decontamination pass of LLM training pipelines (production passes
    use n of 8-13), reduced to two relational facts per doc —
    ``n_distinct_ngrams`` and ``n_probe_ngrams`` — so the caller picks
    its own threshold (e.g. drop when ``100 * n_probe >= 80 *
    n_distinct``).

    Zero-hit and gram-less docs keep their row (left join), so the
    output is exactly one row per corpus doc.

    Scale story: the probe side is reduced to DISTINCT grams — an
    eval set is tiny relative to a 100 TB corpus, so AQE broadcasts
    it under the hit join, degrading to a shuffle equi-join when it
    is not. The corpus side is one row per (doc, distinct gram) —
    the same bounded relation the dedup operators shuffle — and the
    hit count is a grouped agg with map-side partials. Never
    all-pairs, no Python anywhere.
    """
    grams = F.array_distinct(word_ngrams(F.col(text_col), n))
    pg = probe.select(F.explode(grams).alias("_g")).distinct()
    cg = corpus.select(F.col(id_col), F.explode(grams).alias("_g"))
    sizes = corpus.select(
        F.col(id_col), F.size(grams).cast("long").alias("n_distinct_ngrams"))
    hits = cg.join(pg, "_g").groupBy(id_col) \
             .agg(F.count("*").alias("_hits"))
    return (sizes.join(hits, id_col, "left")
                 .select(id_col, "n_distinct_ngrams",
                         F.coalesce(F.col("_hits"), F.lit(0))
                          .cast("long").alias("n_probe_ngrams")))


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


def hash_split_cuts(splits: dict) -> list:
    """The exact integer cut points :func:`hash_split` compares the
    60-bit hash against — exposed so a SQL twin can embed the SAME
    Python ints (cumulative float addition is not associative; both
    engines must share one accumulation)."""
    scale = 1 << 60
    cuts, acc = [], 0.0
    for lbl in list(splits)[:-1]:
        acc += splits[lbl]
        cuts.append(int(acc * scale))
    cuts.append(scale)  # last bucket catches everything
    return cuts


def hash_split(df, splits: dict, *, id_col: str = "doc_id",
               seed: int = 17, label_col: str = "split"):
    """Deterministic train/val/test assignment — the split every ML
    pipeline runs before training, made retry/resume/engine-stable the
    :func:`stratified_sample` way: the row's ``md5(id || ':' || seed)``
    60-bit prefix lands in cumulative-fraction buckets, so the
    assignment rides the ROW (repartitioning, task retries, AQE
    re-plans, or a different engine recomputing the split can never
    move a document between train and test — the leakage-safety
    property). Pure map-side: no shuffle, no RNG state, no sort.

    ``splits`` maps label -> fraction; fractions must sum to 1 (±1e-9).
    The LAST bucket's threshold is pinned to exactly 2^60 so float
    accumulation error cannot leave a row unlabelled. Cut-points are
    computed once in Python ints — embed the same ints in any SQL twin
    for bit-identical assignment.
    """
    if not splits:
        raise ValueError("hash_split: splits must be non-empty")
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"hash_split: fractions sum to {total}, not 1")
    h = F.conv(F.substring(
        F.md5(F.encode(F.concat_ws(":", F.col(id_col).cast("string"),
                                   F.lit(str(seed))), "UTF-8")),
        1, 15), 16, 10).cast("long")
    labels = list(splits)
    cuts = hash_split_cuts(splits)
    expr = None
    for lbl, cut in zip(labels, cuts):
        expr = (F.when(h < cut, F.lit(lbl)) if expr is None
                else expr.when(h < cut, F.lit(lbl)))
    return df.withColumn(label_col, expr)


def source_cap(df, *, cap: int, source_col: str = "source",
               id_col: str = "doc_id") -> "DataFrame":
    """C4/CCNet-style per-source quota: keep at most ``cap`` documents
    per source (host/domain/shard), chosen deterministically as the
    lowest ``id_col`` values — stable under retries, repartitioning
    and resume, and exactly recomputable by a SQL oracle (no RNG).

    Scale design: the rank window runs over the NARROW
    (source, id) projection only — the wide document payload (text,
    media spans) never rides the per-source shuffle; survivors come
    back via a semi-join on the id. Skew note: one pathological source
    with 10^9 docs makes one hot window partition; cap enforcement
    only needs the ``cap`` smallest ids per source, so partial
    aggregation bounds what the exchange carries when AQE splits the
    skewed partition. Reference analogue: none (beyond-parity
    pipeline operator).
    """
    if cap < 0:
        raise ValueError("source_cap: cap must be >= 0")
    from pyspark.sql import Window
    w = Window.partitionBy(source_col).orderBy(F.col(id_col).asc())
    keep = (df.select(source_col, id_col)
              .withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= cap)
              .select(id_col))
    return df.join(keep, on=id_col, how="left_semi")


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


def tfidf_topk(df: DataFrame, *, k: int = 5, text_col: str = "text",
               id_col: str = "doc_id", round_dp: int = 6) -> DataFrame:
    """Per-document top-``k`` terms by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``, the scikit-learn smoothing) —
    the keyword-extraction / relevance pass of a text pipeline.

    Scale design: the only corpus-sized relation is (doc, token, tf)
    — one row per DISTINCT doc-token pair after map-side partial
    aggregation. Document frequency reduces that relation to one row
    per vocabulary token (AQE broadcasts it back onto the tf side);
    ``N`` is a 1-row aggregate cross-joined in (broadcast). The
    final top-k window partitions by document, so no global sort and
    no single-partition exchange anywhere. Scores are rounded to
    ``round_dp`` BEFORE ranking and ties break by token, so the
    ranking itself is deterministic and cross-engine hashable (a
    last-ulp ``ln`` difference cannot flip an order the rounding has
    already collapsed). Reference analogue: none (beyond-parity
    pipeline operator).
    """
    from pyspark.sql import Window
    toks = (df.where(F.col(text_col).isNotNull())
              .select(F.col(id_col),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        r"\s+")).alias("token"))
              .filter(F.col("token") != ""))
    tf = toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"))
    n_docs = tf.select(
        F.countDistinct(id_col).cast("double").alias("_n"))
    scored = (tf.join(docfreq, "token")
                .crossJoin(F.broadcast(n_docs))
                .withColumn("score", F.round(
                    F.col("tf") * (F.log((F.col("_n") + 1.0)
                                         / (F.col("df") + 1.0)) + 1.0),
                    round_dp)))
    w = (Window.partitionBy(id_col)
               .orderBy(F.desc("score"), F.asc("token")))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(id_col, "token", F.col("tf").cast("long"),
                          "score", F.col("rank").cast("int")))


def shared_ngram_stats(df: DataFrame, *, n: int = 2, min_docs: int = 2,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Cross-document duplicate-n-gram signal (the corpus-level twin of
    :func:`repetition_features`'s intra-document counts; Lee et al.
    2022 "Deduplicating Training Data Makes Language Models Better"
    motivates the measure — cdap_geo has no text ops, this extends the
    engine for training-data pipelines): per document,

    - ``n_distinct_ngrams``  distinct word n-grams in the doc,
    - ``n_shared_ngrams``    of those, how many occur in >=
      ``min_docs`` DISTINCT documents corpus-wide.

    Docs with fewer than ``n`` tokens yield no row (no grams — same
    contract as ``repetition_features``).

    Plan: the only relations shuffled are (a) one row per (doc,
    DISTINCT gram) — the bounded relation every dedup operator here
    uses — grouped by gram with map-side partials to get document
    frequencies, and (b) the same relation equi-joined back to the
    frequency table (AQE handles hot grams via skew-split; the
    frequency side is one row per DISTINCT gram, usually broadcast).
    Never all-pairs: cost is linear in total distinct doc-grams.
    """
    grams = F.array_distinct(word_ngrams(F.col(text_col), n))
    dg = (df.select(F.col(id_col), F.explode(grams).alias("_g")))
    freq = dg.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    shared = (dg.join(freq.filter(F.col("_df") >= min_docs), "_g")
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).cast("long")
                      .alias("n_shared_ngrams")))
    per_doc = (dg.groupBy(id_col)
                 .agg(F.count(F.lit(1)).cast("long")
                       .alias("n_distinct_ngrams")))
    return (per_doc.join(shared, id_col, "left")
            .select(F.col(id_col), "n_distinct_ngrams",
                    F.coalesce(F.col("n_shared_ngrams"), F.lit(0))
                     .cast("long").alias("n_shared_ngrams")))


def pack_sequences(df: DataFrame, *, budget: int,
                   id_col: str = "doc_id", size_col: str = "n_tokens",
                   num_shards: int | None = None) -> DataFrame:
    """Sequence packing for LLM pretraining (concat-and-chunk): lay the
    corpus out as one token stream in ``id_col`` order and chunk it
    into fixed ``budget``-token training sequences. Per row, emits

    * ``tok_offset``     — the document's first-token position in the
      global stream = EXCLUSIVE prefix sum of ``size_col`` over
      ``ORDER BY id_col`` (the oracle's
      ``SUM(...) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING → -1)``);
    * ``bin_id``         — ``tok_offset // budget``: the training
      sequence the document STARTS in (documents may straddle bins —
      the GPT-style chunking rule; the writer splits at boundaries);
    * ``offset_in_bin``  — ``tok_offset % budget``.

    A naive Spark window for the global prefix sum plans ONE
    SinglePartition sort — the classic scale-killer. This is instead a
    distributed two-pass scan:

    1. shard deterministically by id range (``(id - min) // width``,
       integer arithmetic — no sampling, so both passes agree without
       a checkpoint);
    2. per-shard token totals (map-side partial agg; the exchange
       carries ``num_shards`` rows), exclusive-prefix-summed on the
       driver (bounded collect) and broadcast back as a 2-column
       offsets table;
    3. per-shard EXCLUSIVE running sum in a ``partitionBy(_shard)``
       window (JVM-side, spillable — group size never has to fit in
       Python memory) plus the shard's offset.

    Shards are balanced when ids are dense (snapshot exports); for
    pathological id spacing pass ``num_shards`` larger, or pre-map ids.
    Run it on the NARROW ``(id, size)`` projection and join results
    back by id if the full rows are wide — the scan then never carries
    the payload. Reference analogue: none (beyond-parity training-
    pipeline operator; rule follows the public concat-and-chunk
    recipe, e.g. GPT-2/3 data layouts).
    """
    from pyspark.sql.window import Window

    if budget <= 0:
        raise ValueError("pack_sequences: budget must be positive")
    spark = df.sparkSession
    n = int(num_shards or spark.sparkContext.defaultParallelism)
    lo_hi = df.agg(F.min(id_col).alias("lo"), F.max(id_col).alias("hi")) \
              .first()
    if lo_hi is None or lo_hi["lo"] is None:
        return (df.withColumn("tok_offset", F.lit(0).cast("long"))
                  .withColumn("bin_id", F.lit(0).cast("long"))
                  .withColumn("offset_in_bin", F.lit(0).cast("long")))
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    width = max(1, -(-(hi - lo + 1) // n))          # ceil, >= 1
    shard = ((F.col(id_col) - F.lit(lo)) / F.lit(width)) \
        .cast("long").alias("_shard")

    d = df.withColumn("_shard", shard)
    totals = {int(r["_shard"]): int(r["t"])
              for r in d.groupBy("_shard")
                        .agg(F.sum(size_col).alias("t")).collect()}
    acc, offs = 0, []
    for s in range(n):                               # dense shard walk
        offs.append((s, acc))
        acc += totals.get(s, 0)
    offs_df = spark.createDataFrame(offs, "_shard long, _shard_off long")

    w = (Window.partitionBy("_shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    tok = (F.coalesce(F.sum(size_col).over(w), F.lit(0))
           + F.col("_shard_off")).cast("long")
    return (d.join(F.broadcast(offs_df), "_shard")
             .withColumn("tok_offset", tok)
             .withColumn("bin_id", F.floor(F.col("tok_offset") / budget)
                          .cast("long"))
             .withColumn("offset_in_bin",
                         (F.col("tok_offset") % budget).cast("long"))
             .drop("_shard", "_shard_off"))


#: (name, regex, replacement) — patterns restricted to the syntax
#: subset where Java regex (Spark) and RE2 (DuckDB oracle) agree:
#: literal classes, \d, \b, bounded repetition; no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b0\d{7,12}\b", "<PHONE>"),
]


def pii_scrub(df: DataFrame, *, text_col: str = "text",
              patterns=None) -> DataFrame:
    """PII redaction for training corpora: per row, count each pattern
    on the ORIGINAL text (``n_<name>`` columns), then emit ``scrubbed``
    with the patterns replaced by their placeholder tokens in list
    order (order matters — emails are consumed before their digit runs
    can match the looser patterns).

    Entirely native ``regexp_count`` / ``regexp_replace`` — the whole
    row stays inside whole-stage codegen, no Python, no shuffle: at
    100 TB this is a pure map over the scan. Patterns must stay inside
    the Java∩RE2 regex subset (see ``PII_PATTERNS``) so the DuckDB
    oracle executes the SAME automaton. Reference analogue: none
    (beyond-parity training-pipeline operator, public C4/CCNet-style
    scrubbing recipe).
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    for name, rx, _ in pats:
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(F.col(text_col), F.lit(rx))
                             .cast("long"))
    scrubbed = F.col(text_col)
    for _, rx, repl in pats:
        scrubbed = F.regexp_replace(scrubbed, rx, repl)
    return out.withColumn("scrubbed", scrubbed)


def bm25_topk(df: DataFrame, queries: DataFrame, *, k: int = 10,
              text_col: str = "text", id_col: str = "doc_id",
              query_id_col: str = "query_id",
              query_text_col: str = "query_text") -> DataFrame:
    """Top-``k`` documents per query under BM25 (k1 = 1.2, b = 0.75,
    Robertson idf, query-term frequency treated as 1) — the retrieval
    ranking pass of a search / RAG pipeline.

    Cross-engine exactness (how a float ranking can be value-hashed):
    with k1 = 6/5 and b = 3/4 the tf-saturation factor is RATIONAL —
    ``tf·(k1+1) / (tf + k1(1-b+b·dl/avgdl)) = 44·L·tf / (20·L·tf +
    6·L + 18·dl·N)`` for corpus token total ``L`` and doc count ``N``
    — so each term's contribution needs exactly ONE transcendental
    (the idf log) times one exact integer ratio, evaluated in the same
    literal expression shape in both engines, rounded to micro-units
    and summed as BIGINT. Integer sums are order-independent, so the
    distributed aggregation cannot disagree with the single-node twin
    at any schedule. Magnitude contract: ``20·L·tf`` must fit int64 —
    L < ~4.6e14 for tf ≤ 1000; beyond that shard the corpus and merge
    per-shard scores (they are exact integers).

    Scale shape: the only corpus-sized relations are (doc, token, tf)
    and (doc, dl), both one keyed aggregation with map-side partials;
    the query-token relation is broadcast onto tf; df / N / L are
    token-dimension or 1-row broadcasts; the (query, doc) sum
    shuffles only matching pairs; top-k is a per-query window (no
    global sort). Returns ``(query_id, doc_id, score_u, rank)`` with
    ``score_u`` the exact micro-unit BIGINT score; ties rank by
    ``doc_id`` ascending.
    """
    toks = (df.where(F.col(text_col).isNotNull())
              .select(F.col(id_col),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        r"\s+")).alias("token"))
              .filter(F.col("token") != ""))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    docfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    glob = toks.agg(
        F.countDistinct(id_col).alias("_n"),
        F.count(F.lit(1)).alias("_l"))
    qtok = (queries.select(F.col(query_id_col),
                           F.explode(F.split(F.lower(F.trim(
                               F.col(query_text_col))), r"\s+"))
                           .alias("token"))
            .filter(F.col("token") != "").distinct())
    num = (44 * F.col("_l") * F.col("tf")).cast("double")
    den = (20 * F.col("_l") * F.col("tf") + 6 * F.col("_l")
           + 18 * F.col("dl") * F.col("_n")).cast("double")
    idf = F.log((F.col("_n") + 1.0) / (F.col("df") + 0.5))
    contrib = F.round(idf * (num / den) * 1000000.0).cast("long")
    scored = (tf.join(F.broadcast(qtok), "token")
                .join(docfreq, "token")
                .join(dl, id_col)
                .crossJoin(F.broadcast(glob))
                .groupBy(query_id_col, id_col)
                .agg(F.sum(contrib).alias("score_u")))
    from pyspark.sql import Window
    w = (Window.partitionBy(query_id_col)
               .orderBy(F.desc("score_u"), F.asc(id_col)))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(query_id_col, id_col, "score_u",
                          F.col("rank").cast("int")))


def bm25_oracle_sql(*, docs_sql: str, queries_sql: str,
                    k: int = 10) -> str:
    """DuckDB twin of :func:`bm25_topk` — the same literal expression
    shape for the one float per term (LN times exact integer ratio,
    rounded to micro-units), then exact BIGINT sums and the same
    (score desc, doc_id) ranking. ``docs_sql`` yields (doc_id, text);
    ``queries_sql`` yields (query_id, query_text)."""
    return f"""
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS token
        FROM ({docs_sql}) WHERE text IS NOT NULL
      ), tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
      ), dl AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
        FROM tok GROUP BY doc_id
      ), docfreq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY token
      ), gl AS (
        SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS l
        FROM tok
      ), qtok AS (
        SELECT DISTINCT query_id, unnest(list_filter(
                 regexp_split_to_array(lower(trim(query_text)), '\\s+'),
                 x -> x <> '')) AS token
        FROM ({queries_sql})
      ), sc AS (
        SELECT q.query_id, tf.doc_id,
               CAST(SUM(CAST(ROUND(
                 LN((g.n + 1.0) / (docfreq.df + 0.5))
                 * (CAST(44 * g.l * tf.tf AS DOUBLE)
                    / CAST(20 * g.l * tf.tf + 6 * g.l
                           + 18 * dl.dl * g.n AS DOUBLE))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS score_u
        FROM tf JOIN qtok q USING (token)
                JOIN docfreq USING (token)
                JOIN dl ON tf.doc_id = dl.doc_id
                CROSS JOIN gl g
        GROUP BY q.query_id, tf.doc_id
      ), rk AS (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY score_u DESC, doc_id) AS rank
        FROM sc
      )
      SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id, score_u,
             CAST(rank AS INT) AS rank
      FROM rk WHERE rank <= {k}
    """


def pmi_pairs(df: DataFrame, *, min_count: int = 5, k: int = 50,
              text_col: str = "text", id_col: str = "doc_id",
              round_dp: int = 6) -> DataFrame:
    """Top-``k`` token pairs by pointwise mutual information —
    ``PMI(x, y) = ln(N·c_xy / (c_x·c_y))`` over document-level
    co-occurrence (presence, not counts) — the association-mining /
    collocation pass of a corpus analysis pipeline.

    Exactness: every count is an exact BIGINT; the PMI is ONE log of
    one exact integer ratio, written with the identical expression
    shape in both engines and rounded to ``round_dp`` BEFORE the
    (pmi desc, x, y) ranking — so the top-k is deterministic and
    value-hashable (the :func:`bm25_topk` discipline).

    Scale: the corpus-sized relation is the DISTINCT (doc, token)
    presence relation (one keyed agg); pair generation is a per-doc
    self-join under ``x < y`` — shuffle keyed by doc, per-doc cost
    quadratic in UNIQUE tokens per doc (inherent to co-occurrence;
    cap upstream with a per-doc vocab filter when documents are
    unbounded); token marginals are a token-dimension broadcast; the
    final top-k is a TakeOrdered (no global sort materialization).
    """
    toks = (df.where(F.col(text_col).isNotNull())
              .select(F.col(id_col).alias("_d"),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        r"\s+")).alias("token"))
              .filter(F.col("token") != "")
              .distinct())
    n_docs = toks.agg(F.countDistinct("_d").alias("_n"))
    marg = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    a = toks.select("_d", F.col("token").alias("x"))
    b = toks.select("_d", F.col("token").alias("y"))
    pairs = (a.join(b, "_d").where(F.col("x") < F.col("y"))
             .groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
             .where(F.col("n_xy") >= min_count))
    mx = marg.select(F.col("token").alias("x"), F.col("c").alias("cx"))
    my = marg.select(F.col("token").alias("y"), F.col("c").alias("cy"))
    pmi = F.round(F.log((F.col("_n") * F.col("n_xy")).cast("double")
                        / (F.col("cx") * F.col("cy")).cast("double")),
                  round_dp)
    return (pairs.join(F.broadcast(mx), "x").join(F.broadcast(my), "y")
            .crossJoin(F.broadcast(n_docs))
            .select("x", "y", "n_xy", pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), "x", "y")
            .limit(k))


def pmi_oracle_sql(docs_sql: str, *, min_count: int = 5, k: int = 50,
                   round_dp: int = 6) -> str:
    """DuckDB twin of :func:`pmi_pairs` (same expression shape, same
    rounding-before-ranking)."""
    return f"""
      WITH tok AS (
        SELECT DISTINCT doc_id AS d, unnest(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS token
        FROM ({docs_sql}) WHERE text IS NOT NULL
      ), n AS (SELECT CAST(COUNT(DISTINCT d) AS BIGINT) AS n FROM tok),
      marg AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY token
      ), pr AS (
        SELECT a.token AS x, b.token AS y,
               CAST(COUNT(*) AS BIGINT) AS n_xy
        FROM tok a JOIN tok b ON a.d = b.d AND a.token < b.token
        GROUP BY a.token, b.token
        HAVING COUNT(*) >= {min_count}
      )
      SELECT pr.x, pr.y, pr.n_xy,
             ROUND(LN(CAST(n.n * pr.n_xy AS DOUBLE)
                      / CAST(mx.c * my.c AS DOUBLE)), {round_dp}) AS pmi
      FROM pr JOIN marg mx ON pr.x = mx.token
              JOIN marg my ON pr.y = my.token
              CROSS JOIN n
      ORDER BY pmi DESC, pr.x, pr.y
      LIMIT {k}
    """


def char_entropy(df: DataFrame, *, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document character-distribution entropy (nats) — the
    compressibility / gibberish quality signal: near-zero for
    single-character spam, near ln(alphabet) for uniform noise.

    Exactness (the sketch-family discipline): entropy is
    ``ln(n) - (Σ c·ln c)/n`` over character counts; a distributed
    float Σ is schedule-dependent, so each character's term is rounded
    to MICRO-NATS and summed as BIGINT (order-independent), and the
    two outer float ops run on identical exact integers in both
    engines. Emitted as ``entropy_micro`` (BIGINT micro-nats) plus
    ``n_chars``.

    Scale: characters explode map-side but the exchange carries only
    the partially-aggregated DISTINCT (doc, char) pairs — bounded by
    docs × alphabet, not corpus characters; the per-doc sum is a
    second keyed agg. Empty / NULL texts are excluded (entropy of
    nothing is undefined).
    """
    chars = (df.where(F.col(text_col).isNotNull())
               .select(F.col(id_col),
                       F.explode(F.split(F.lower(F.col(text_col)), ""))
                       .alias("ch"))
               .filter(F.col("ch") != ""))
    counts = chars.groupBy(id_col, "ch").agg(
        F.count(F.lit(1)).alias("c"))
    term = F.round(F.col("c").cast("double")
                   * F.log(F.col("c").cast("double"))
                   * 1000000.0).cast("long")
    per_doc = counts.groupBy(id_col).agg(
        F.sum("c").alias("n_chars"),
        F.sum(term).alias("_s"))
    h = F.round((F.log(F.col("n_chars").cast("double"))
                 - F.col("_s").cast("double") / 1000000.0
                   / F.col("n_chars").cast("double")) * 1000000.0) \
        .cast("long")
    return per_doc.select(id_col, F.col("n_chars").cast("long"),
                          h.alias("entropy_micro"))


def char_entropy_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`char_entropy` (same per-term micro-nat
    rounding, same outer expression shape; chars via per-position
    substr over a generated index)."""
    return f"""
      WITH d AS (SELECT doc_id, lower(text) AS t FROM ({docs_sql})
                 WHERE text IS NOT NULL),
      ch AS (
        SELECT doc_id, substr(t, i, 1) AS ch
        FROM d, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
        WHERE len(t) > 0
      ), cnt AS (
        SELECT doc_id, ch, CAST(COUNT(*) AS BIGINT) AS c
        FROM ch GROUP BY doc_id, ch
      ), pd AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
               CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE)
                                   * LN(CAST(c AS DOUBLE))
                                   * 1000000.0) AS BIGINT)) AS BIGINT)
                 AS s
        FROM cnt GROUP BY doc_id
      )
      SELECT doc_id, n_chars,
             CAST(ROUND((LN(CAST(n_chars AS DOUBLE))
                         - CAST(s AS DOUBLE) / 1000000.0
                           / CAST(n_chars AS DOUBLE)) * 1000000.0)
                  AS BIGINT) AS entropy_micro
      FROM pd
    """


def weighted_sample(df: DataFrame, *, k: int, weight_col: str,
                    key_col: str = "doc_id",
                    seed: str = "ws0") -> DataFrame:
    """Weighted sample WITHOUT replacement of ``k`` rows — the
    Efraimidis–Spirakis A-ES scheme: each row draws priority
    ``u^(1/w)`` (equivalently ``ln(u)/w``, the monotone form used
    here) for a uniform ``u`` and the top-``k`` priorities win, giving
    exact sequential weighted sampling probabilities.

    Deterministic and cross-engine reproducible (the property random
    sampling normally destroys): ``u`` comes from the repo-wide 60-bit
    md5-prefix hash of ``(seed, key)`` — the sampling decision rides
    the row, so resumed / re-run / re-partitioned jobs pick the SAME
    sample, and the DuckDB twin picks it too (identical float
    expression shape; ties broken by key). Rows with weight <= 0 or
    NULL are excluded.

    Plan: priorities are map-side expressions; top-k is a TakeOrdered
    (per-partition heaps + driver merge of k candidates), never a full
    global sort.
    """
    if k <= 0:
        raise ValueError("weighted_sample: k must be > 0")
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(seed),
                                             F.col(key_col)
                                             .cast("string"))),
                           1, 15), 16, 10).cast("long")
    u = (h.cast("double") + 1.0) / 1152921504606846976.0
    pri = F.log(u) / F.col(weight_col).cast("double")
    return (df.where(F.col(weight_col).isNotNull()
                     & (F.col(weight_col) > 0))
            .withColumn("priority", pri)
            .orderBy(F.desc("priority"), F.asc(key_col))
            .limit(k))


def weighted_sample_oracle_sql(rows_sql: str, *, k: int,
                               weight_col: str = "w",
                               key_col: str = "doc_id",
                               seed: str = "ws0") -> str:
    """DuckDB twin of :func:`weighted_sample` (same hash, same float
    shape, same tie rule). ``rows_sql`` must yield ``key_col`` and
    ``weight_col`` (other columns pass through)."""
    return f"""
      SELECT *,
             LN((CAST(concat('0x', substr(md5(concat('{seed}', ':',
                   CAST({key_col} AS VARCHAR))), 1, 15)) AS BIGINT)
                 * 1.0 + 1.0) / 1152921504606846976.0)
             / CAST({weight_col} AS DOUBLE) AS priority
      FROM ({rows_sql})
      WHERE {weight_col} IS NOT NULL AND {weight_col} > 0
      ORDER BY priority DESC, {key_col}
      LIMIT {k}
    """


def unigram_logloss(df: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Per-document cross-entropy under the corpus's own unigram
    language model — the CCNet-style LM quality filter (low = typical
    of the corpus, high = outlier/gibberish relative to it):
    ``H(doc) = Σ_t tf_t · ln(L / c_t) / dl`` (nats per token) for
    corpus token count ``c_t`` and total ``L``.

    Exactness: each distinct (doc, token)'s term is ``tf ×
    round(ln(L/c_t)·1e6)`` — ONE log of an exact integer ratio,
    micro-rounded, times an exact count — summed as BIGINT; the final
    per-token normalization is one double over two exact integers.

    Plan: the corpus-sized relation is (doc, token, tf) once (shared
    shape with bm25/tfidf); token log-costs are a token-dimension
    aggregate joined back (AQE broadcast); per-doc reduction is a
    keyed agg with map-side partials. Magnitude: ln(L/c)·1e6 < 4e7,
    × tf ≤ 1e4 × terms/doc — int64-safe past billions of tokens.
    """
    toks = (df.where(F.col(text_col).isNotNull())
              .select(F.col(id_col),
                      F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        r"\s+")).alias("token"))
              .filter(F.col("token") != ""))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    ctok = tf.groupBy("token").agg(F.sum("tf").alias("c"))
    tot = tf.agg(F.sum("tf").alias("_l"))
    cost = F.round(F.log(F.col("_l").cast("double")
                         / F.col("c").cast("double")) * 1000000.0) \
        .cast("long")
    per_doc = (tf.join(ctok, "token")
               .crossJoin(F.broadcast(tot))
               .groupBy(id_col)
               .agg(F.sum(F.col("tf") * cost).alias("_s"),
                    F.sum("tf").alias("dl")))
    h = F.round(F.col("_s").cast("double") / F.col("dl").cast("double")) \
        .cast("long")
    return per_doc.select(id_col, F.col("dl").cast("long"),
                          h.alias("h_micro"))


def unigram_logloss_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`unigram_logloss` (same expression
    shapes)."""
    return f"""
      WITH tok AS (
        SELECT doc_id, unnest(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS token
        FROM ({docs_sql}) WHERE text IS NOT NULL
      ), tf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
      ), ct AS (
        SELECT token, CAST(SUM(tf) AS BIGINT) AS c FROM tf
        GROUP BY token
      ), tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS l FROM tf),
      pd AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf * CAST(ROUND(
                 LN(CAST(t.l AS DOUBLE) / CAST(ct.c AS DOUBLE))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(tf.tf) AS BIGINT) AS dl
        FROM tf JOIN ct USING (token) CROSS JOIN tot t
        GROUP BY tf.doc_id
      )
      SELECT doc_id, dl,
             CAST(ROUND(CAST(s AS DOUBLE) / CAST(dl AS DOUBLE))
                  AS BIGINT) AS h_micro
      FROM pd
    """


def zipf_slope(df: DataFrame, *, text_col: str = "text",
               log_scale: int = 1000) -> DataFrame:
    """Zipf power-law fit of the corpus vocabulary: OLS slope of
    ``ln(freq)`` on ``ln(rank)`` over all distinct tokens (healthy
    natural-language corpora sit near −1; the classic corpus-level
    diagnostic). Returns one row ``(n_vocab, sx, sy, sxy, sxx,
    slope)``.

    Exactness (the grouped_ols discipline applied to floats): each
    token's ``ln(rank)`` / ``ln(freq)`` is one log of an exact
    integer, rounded to ``log_scale`` units (milli-nats by default),
    and the five OLS Σs then run in exact BIGINT — order-independent.
    Magnitude contract: milli-scale keeps Σ(lx·ly) inside int64 to
    ~1e8 vocabulary; raise ``log_scale`` only for small vocabularies.

    Plan: one corpus-sized token aggregation to vocabulary counts;
    ranking is a window over the VOCABULARY relation (ties broken by
    token for determinism); the fit is a single 1-row aggregate.
    """
    from pyspark.sql import Window
    toks = (df.where(F.col(text_col).isNotNull())
              .select(F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                        r"\s+")).alias("token"))
              .filter(F.col("token") != ""))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("c"), F.asc("token"))
    ranked = vocab.withColumn("r", F.row_number().over(w))
    s = float(log_scale)
    lx = F.round(F.log(F.col("r").cast("double")) * s).cast("long")
    ly = F.round(F.log(F.col("c").cast("double")) * s).cast("long")
    agg = (ranked.select(lx.alias("_x"), ly.alias("_y"))
           .agg(F.count(F.lit(1)).alias("n_vocab"),
                F.sum("_x").alias("sx"), F.sum("_y").alias("sy"),
                F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
                F.sum(F.col("_x") * F.col("_x")).alias("sxx")))
    det = (F.col("n_vocab") * F.col("sxx") - F.col("sx") * F.col("sx"))
    num = (F.col("n_vocab") * F.col("sxy") - F.col("sx") * F.col("sy"))
    slope = F.when(det != 0, F.round(num.cast("double")
                                     / det.cast("double"), 6))
    return agg.select(F.col("n_vocab").cast("long"), "sx", "sy",
                      "sxy", "sxx", slope.alias("slope"))


def zipf_oracle_sql(docs_sql: str, *, log_scale: int = 1000) -> str:
    """DuckDB twin of :func:`zipf_slope` (same rounding, same ranking
    tie rule, same closed form)."""
    s = float(log_scale)
    return f"""
      WITH tok AS (
        SELECT unnest(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS token
        FROM ({docs_sql}) WHERE text IS NOT NULL
      ), vocab AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY token
      ), ranked AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, token) AS r
        FROM vocab
      ), xy AS (
        SELECT CAST(ROUND(LN(CAST(r AS DOUBLE)) * {s}) AS BIGINT) AS x,
               CAST(ROUND(LN(CAST(c AS DOUBLE)) * {s}) AS BIGINT) AS y
        FROM ranked
      ), a AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM xy
      )
      SELECT n_vocab, sx, sy, sxy, sxx,
             CASE WHEN n_vocab * sxx - sx * sx <> 0 THEN
               ROUND(CAST(n_vocab * sxy - sx * sy AS DOUBLE)
                     / CAST(n_vocab * sxx - sx * sx AS DOUBLE), 6)
             END AS slope
      FROM a
    """


def fuzzy_join(left: DataFrame, right: DataFrame, *, max_dist: int,
               left_id: str = "doc_id", left_str: str = "text",
               right_id: str = "doc_id", right_str: str = "text"
               ) -> DataFrame:
    """Edit-distance (Levenshtein) join: every pair ``(left, right)``
    with ``levenshtein(ls, rs) <= max_dist`` — the record-linkage /
    entity-resolution primitive. Returns ``(left_id, right_id, dist)``
    with ``dist`` an exact BIGINT, so the relation is cross-engine
    value-hashable (DuckDB's ``levenshtein`` computes the same unit-cost
    edit distance as Spark's).

    A raw formulation is a quadratic theta-join (Spark would plan
    BroadcastNestedLoopJoin); the plan here is the classic LOSSLESS
    q-gram blocking (Gravano et al. 2001, q=2):

    * **length filter** — ``ed(a,b) <= d`` implies ``|len(a)-len(b)| <= d``;
    * **count filter + prefix filter** — each edit destroys at most q
      of a string's overlapping q-grams, so the MULTISET gram
      intersection obeys ``inter >= T = max(m_a, m_b) - q*d`` (with
      ``m = len - q + 1`` grams per string). Candidates therefore come
      from PREFIX filtering (Chaudhuri et al. 2006 / Xiao et al.
      PPJoin, lifted to multisets): gram OCCURRENCES ``(gram, k)``,
      ``k = 1..tf``, are a SET whose intersection size equals the
      multiset intersection; under any fixed global total order, two
      sets with ``|A ∩ B| >= T`` must share an element within the
      first ``|A|-T+1`` / ``|B|-T+1`` elements — so each string
      contributes only its ``q*d + 1`` RAREST gram occurrences
      (corpus-frequency order, unseen grams rarest) and candidates are
      the prefix equi-join on ``(gram, k)``. Never a false negative;
      and unlike a plain gram count-join, ubiquitous grams
      ("Brand#…") never explode the join — they sort to the END of
      the order and stay out of prefixes (measured on the sf0.1 part
      labels: 23.1 s -> ~3 s, identical output);
    * **short-string band** — a pair needs ``max(la,lb) > B =
      q*d + q - 1`` for the required overlap T to be >= 1; when BOTH
      lengths are ``<= B`` rows join by an exploded ``[len-d, len+d]``
      length-key equi-join instead (bounded: 2d+1 keys per row over
      the short stratum only). With the length filter, a pair with
      ``max > B`` always has >= 1 gram occurrence on each side, so
      the two paths are exhaustive.

    Verification is native ``F.levenshtein`` in whole-stage codegen,
    behind a residual length filter. Only ``(id, string)`` projections
    ride the gram shuffle; at corpus scale the exchange carries the
    gram-occurrence relations (Σ len rows) and the candidate relation,
    never an all-pairs product. Self-join callers pass the same
    relation twice and filter ``l < r`` afterwards.
    """
    if max_dist < 0:
        raise ValueError("fuzzy_join: max_dist must be >= 0")
    q = 2
    band = q * max_dist + q - 1
    l = (left.select(F.col(left_id).alias("_lid"),
                     F.col(left_str).alias("_ls"))
         .where(F.col("_ls").isNotNull())
         .withColumn("_ll", F.length("_ls")))
    r = (right.select(F.col(right_id).alias("_rid"),
                      F.col(right_str).alias("_rs"))
          .where(F.col("_rs").isNotNull())
          .withColumn("_rl", F.length("_rs")))

    def grams(df, idc, sc, lc):
        g = df.select(
            idc,
            F.explode(F.expr(
                f"transform(sequence(1, greatest({lc} - 1, 0)), "
                f"i -> substring({sc}, i, 2))")).alias("_g"))
        return g.groupBy(idc, "_g").agg(F.count(F.lit(1)).alias("_tf"))

    lg = grams(l, "_lid", "_ls", "_ll")
    rg = grams(r, "_rid", "_rs", "_rl")
    # global gram order: corpus frequency asc (rare first), unseen
    # grams rarest — any FIXED total order keeps the prefix lemma
    # valid; rarity just makes prefixes selective
    freq = rg.groupBy("_g").agg(F.sum("_tf").alias("_f"))
    plen = q * max_dist + 1

    def prefix(g, idc):
        occ = (g.join(freq, "_g", "left")
               .select(idc, "_g",
                       F.coalesce("_f", F.lit(0)).alias("_f"),
                       F.explode(F.expr("sequence(1, _tf)")).alias("_k")))
        return (occ.groupBy(idc)
                .agg(F.slice(F.array_sort(F.collect_list(
                    F.struct("_f", "_g", "_k"))), 1, plen).alias("_p"))
                .select(idc, F.explode("_p").alias("_o"))
                .select(idc, F.col("_o._g").alias("_g"),
                        F.col("_o._k").alias("_k")))

    cand_gram = (prefix(lg, "_lid").join(prefix(rg, "_rid"),
                                         ["_g", "_k"])
                 .select("_lid", "_rid"))
    short = (l.where(F.col("_ll") <= band)
             .select("_lid", F.explode(F.sequence(
                 F.col("_ll") - max_dist, F.col("_ll") + max_dist))
                 .alias("_k"))
             .join(r.where(F.col("_rl") <= band)
                    .select("_rid", F.col("_rl").alias("_k")), "_k")
             .select("_lid", "_rid"))
    cands = cand_gram.unionByName(short).dropDuplicates(["_lid", "_rid"])
    out = (cands.join(l.select("_lid", "_ls", "_ll"), "_lid")
           .join(r.select("_rid", "_rs", "_rl"), "_rid")
           .where(F.abs(F.col("_ll") - F.col("_rl")) <= max_dist)
           .withColumn("dist", F.levenshtein("_ls", "_rs").cast("long"))
           .where(F.col("dist") <= max_dist)
           .select(F.col("_lid").alias(
                       left_id + "_l" if left_id == right_id else left_id),
                   F.col("_rid").alias(
                       right_id + "_r" if left_id == right_id else right_id),
                   "dist"))
    return out


def bigram_logloss(df: DataFrame, *, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-one
    smoothed BIGRAM language model — the context-aware upgrade of
    :func:`unigram_logloss` (a doc can be made of common words in
    impossible orders; only a bigram model sees that):
    ``H(doc) = Σ_bg tf_bg · ln((c1(w1) + V) / (c12(bg) + 1)) / n_bg``
    where ``c12`` is the corpus count of the bigram, ``c1`` the corpus
    count of its CONTEXT (bigram instances starting with ``w1``) and
    ``V`` the vocabulary size. Docs with < 2 tokens have no bigrams
    and are excluded (H undefined).

    Exactness (the :func:`unigram_logloss` discipline): each distinct
    (doc, bigram)'s term is ``tf × round(ln((c1+V)/(c12+1))·1e6)`` —
    one log of an exact integer ratio, micro-rounded — summed as
    BIGINT; the final normalization is one double over two exact ints.

    Plan: the corpus-sized relation is (doc, bigram, tf) once; bigram
    and context counts are gram-/token-dimension aggregates of IT
    (joined back — AQE broadcast at vocabulary scale); V is a 1-row
    broadcast. Per-doc reduction is a keyed agg with map-side
    partials. Nothing shuffles the raw token stream twice.
    """
    bg = (df.where(F.col(text_col).isNotNull())
          .select(F.col(id_col),
                  F.explode(word_2grams(F.col(text_col))).alias("gram")))
    tf = bg.groupBy(id_col, "gram").agg(F.count(F.lit(1)).alias("tf"))
    c12 = tf.groupBy("gram").agg(F.sum("tf").alias("c12"))
    c1 = (c12.groupBy(F.split(F.col("gram"), " ")[0].alias("w1"))
          .agg(F.sum("c12").alias("c1")))
    toks = (df.where(F.col(text_col).isNotNull())
            .select(F.explode(F.split(F.trim(F.col(text_col)),
                                      r"\s+")).alias("tok"))
            .where(F.col("tok") != ""))
    vocab = toks.agg(F.count_distinct("tok").alias("_v"))
    cost = F.round(F.log((F.col("c1") + F.col("_v")).cast("double")
                         / (F.col("c12") + 1).cast("double"))
                   * 1000000.0).cast("long")
    per_doc = (tf.join(c12, "gram")
               .withColumn("w1", F.split(F.col("gram"), " ")[0])
               .join(c1, "w1")
               .crossJoin(F.broadcast(vocab))
               .groupBy(id_col)
               .agg(F.sum(F.col("tf") * cost).alias("_s"),
                    F.sum("tf").alias("n_bigrams")))
    h = F.round(F.col("_s").cast("double")
                / F.col("n_bigrams").cast("double")).cast("long")
    return per_doc.select(id_col, F.col("n_bigrams").cast("long"),
                          h.alias("h_micro"))


def bigram_logloss_oracle_sql(docs_sql: str) -> str:
    """DuckDB twin of :func:`bigram_logloss` (same expression
    shapes; 2-grams by the repetition-oracle idiom)."""
    return f"""
      WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(trim(text), '\\s+') AS toks
        FROM ({docs_sql}) WHERE text IS NOT NULL
      ), g AS (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(1, len(toks) - 1),
                 i -> toks[i] || ' ' || toks[i+1])) AS gram
        FROM t
      ), tf AS (
        SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS tf
        FROM g GROUP BY 1, 2
      ), c12 AS (
        SELECT gram, CAST(SUM(tf) AS BIGINT) AS c12 FROM tf GROUP BY 1
      ), c1 AS (
        SELECT split_part(gram, ' ', 1) AS w1,
               CAST(SUM(c12) AS BIGINT) AS c1
        FROM c12 GROUP BY 1
      ), v AS (
        SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM (
          SELECT unnest(list_filter(
                   regexp_split_to_array(trim(text), '\\s+'),
                   x -> x <> '')) AS tok
          FROM ({docs_sql}) WHERE text IS NOT NULL)
      ), pd AS (
        SELECT tf.doc_id,
               CAST(SUM(tf.tf * CAST(ROUND(
                 LN(CAST(c1.c1 + v.v AS DOUBLE)
                    / CAST(c12.c12 + 1 AS DOUBLE))
                 * 1000000.0) AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(tf.tf) AS BIGINT) AS n_bigrams
        FROM tf
        JOIN c12 USING (gram)
        JOIN c1 ON c1.w1 = split_part(tf.gram, ' ', 1)
        CROSS JOIN v
        GROUP BY tf.doc_id
      )
      SELECT doc_id, n_bigrams,
             CAST(ROUND(CAST(s AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
                  AS BIGINT) AS h_micro
      FROM pd
    """


def tfidf_cosine_topk(df: DataFrame, queries: DataFrame, *, k: int = 10,
                      text_col: str = "text", id_col: str = "doc_id",
                      query_id_col: str = "query_id",
                      query_text_col: str = "query_text") -> DataFrame:
    """Top-``k`` documents per query by SPARSE TF-IDF COSINE similarity
    — the vector-space retrieval twin of :func:`bm25_topk` (BM25 is the
    probabilistic ranking; cosine is the geometric one a RAG pipeline
    uses for lexical recall). Queries are scored as documents of their
    own text.

    Cross-engine exactness: each component weight is the exact BIGINT
    ``w(doc,t) = tf × round(idf_t · 1e3)`` with the smoothed idf
    ``ln((N+1)/(df+1)) + 1`` (the :func:`tfidf_topk` convention) —
    one transcendental per vocabulary TOKEN, milli-rounded once, so
    dot products ``Σ w_q·w_d`` and squared norms ``Σ w²`` are exact
    integer sums (order-independent); the cosine is ONE double
    ``dot / sqrt(nq·nd)`` over exact ints, micro-rounded BEFORE
    ranking with ties by doc id — a last-ulp sqrt difference cannot
    flip an order the rounding already collapsed. Magnitude contract:
    ``Σ w_q·w_d < 2^63`` — with milli idf (≤ ~4e4 for N ≤ 1e14) and
    tf ≤ 1e3 each product is ≤ ~1.6e15, safe past 5,000 shared terms
    per pair; shard queries beyond that.

    Scale shape (the inverted-index discipline): the ONLY corpus-sized
    relations are (doc, token, tf) and the per-doc norm — both one
    keyed aggregation with map-side partials; idf is a token-dimension
    aggregate joined back (AQE broadcast at vocabulary scale); the
    (query, doc) dot product shuffles only pairs sharing a token
    (never all-pairs); top-k is a per-query window.
    """
    if k < 1:
        raise ValueError("tfidf_cosine_topk: k must be >= 1")

    def _tf(rel, idc, txt):
        t = (rel.where(F.col(txt).isNotNull())
             .select(F.col(idc),
                     F.explode(F.split(F.lower(F.trim(F.col(txt))),
                                       r"\s+")).alias("token"))
             .filter(F.col("token") != ""))
        return t.groupBy(idc, "token").agg(F.count(F.lit(1)).alias("tf"))

    dtf = _tf(df, id_col, text_col)
    qtf = _tf(queries, query_id_col, query_text_col)
    docfreq = dtf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = dtf.select(id_col).distinct() \
        .agg(F.count(F.lit(1)).alias("_n"))
    idf_m = F.round((F.log((F.col("_n") + 1).cast("double")
                           / (F.col("df") + 1).cast("double")) + 1.0)
                    * 1000.0).cast("long")
    widf = (docfreq.crossJoin(F.broadcast(n))
            .select("token", idf_m.alias("idf_m")))
    dw = (dtf.join(widf, "token")
          .select(id_col, "token",
                  (F.col("tf") * F.col("idf_m")).alias("w")))
    # query vectors use the CORPUS idf; query-only tokens (df=0) carry
    # no corpus match and cannot contribute to any dot product — the
    # inner join drops them, which also keeps norms consistent with
    # the match-only semantics (documented: norms cover corpus-vocab
    # components only, identical in both engines)
    qw = (qtf.join(widf, "token")
          .select(query_id_col, "token",
                  (F.col("tf") * F.col("idf_m")).alias("w")))
    dn = dw.groupBy(id_col).agg(F.sum(F.col("w") * F.col("w"))
                                .alias("n2d"))
    qn = qw.groupBy(query_id_col).agg(F.sum(F.col("w") * F.col("w"))
                                      .alias("n2q"))
    dots = (qw.withColumnRenamed("w", "wq")
            .join(dw.withColumnRenamed("w", "wd"), "token")
            .groupBy(query_id_col, id_col)
            .agg(F.sum(F.col("wq") * F.col("wd")).alias("dot")))
    score = F.round(F.col("dot").cast("double")
                    / F.sqrt((F.col("n2q") * F.col("n2d"))
                             .cast("double")) * 1000000.0).cast("long")
    scored = (dots.join(qn, query_id_col).join(dn, id_col)
              .select(query_id_col, id_col, score.alias("cos_u")))
    from pyspark.sql import Window
    w = (Window.partitionBy(query_id_col)
         .orderBy(F.desc("cos_u"), F.asc(id_col)))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id_col, id_col, "cos_u",
                    F.col("rank").cast("int")))


def tfidf_cosine_oracle_sql(*, docs_sql: str, queries_sql: str,
                            k: int = 10) -> str:
    """DuckDB twin of :func:`tfidf_cosine_topk` (same expression
    shapes, same milli/micro rounding, same tie rule)."""
    return f"""
      WITH dt AS (
        SELECT doc_id, unnest(list_filter(
                 regexp_split_to_array(lower(trim(text)), '\\s+'),
                 x -> x <> '')) AS token
        FROM ({docs_sql}) WHERE text IS NOT NULL
      ), dtf AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM dt GROUP BY 1, 2
      ), qt AS (
        SELECT query_id, unnest(list_filter(
                 regexp_split_to_array(lower(trim(query_text)), '\\s+'),
                 x -> x <> '')) AS token
        FROM ({queries_sql}) WHERE query_text IS NOT NULL
      ), qtf AS (
        SELECT query_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM qt GROUP BY 1, 2
      ), n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n
               FROM dtf),
      widf AS (
        SELECT token,
               CAST(ROUND((LN(CAST(n.n + 1 AS DOUBLE)
                              / CAST(COUNT(*) + 1 AS DOUBLE)) + 1.0)
                          * 1000.0) AS BIGINT) AS idf_m
        FROM dtf CROSS JOIN n GROUP BY token, n.n
      ), dw AS (
        SELECT doc_id, token, CAST(tf * idf_m AS BIGINT) AS w
        FROM dtf JOIN widf USING (token)
      ), qw AS (
        SELECT query_id, token, CAST(tf * idf_m AS BIGINT) AS w
        FROM qtf JOIN widf USING (token)
      ), dn AS (
        SELECT doc_id, CAST(SUM(w * w) AS BIGINT) AS n2d
        FROM dw GROUP BY 1
      ), qn AS (
        SELECT query_id, CAST(SUM(w * w) AS BIGINT) AS n2q
        FROM qw GROUP BY 1
      ), dots AS (
        SELECT qw.query_id, dw.doc_id,
               CAST(SUM(qw.w * dw.w) AS BIGINT) AS dot
        FROM qw JOIN dw USING (token)
        GROUP BY 1, 2
      ), scored AS (
        SELECT d.query_id, d.doc_id,
               CAST(ROUND(CAST(d.dot AS DOUBLE)
                    / SQRT(CAST(qn.n2q * dn.n2d AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS cos_u
        FROM dots d JOIN qn USING (query_id) JOIN dn USING (doc_id)
      ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos_u DESC, doc_id ASC)
                  AS rank
        FROM scored
      )
      SELECT query_id, doc_id, cos_u, CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= {k}
    """


def path_topk(events: DataFrame, *, key_col: str = "user_id",
              ts_col: str = "ts", step_col: str = "event_type",
              tie_col: str = "event_id", n: int = 3,
              k: int = 25) -> DataFrame:
    """Top-``k`` most frequent length-``n`` event PATHS (consecutive
    step sequences under each key's event-time order) — the n-step
    generalization of the Markov ``transition_counts`` matrix, the
    clickstream-mining staple. Returns ``(path, cnt, rank)`` with
    ``path`` the ' > '-joined step sequence, counts exact BIGINTs and
    ties ranked by path string, so the ranking hash-matches
    cross-engine.

    Plan: ONE keyed exchange carries all ``n-1`` LAG windows (same
    (key, ts, tie) clustered order — Catalyst plans a single sort /
    exchange for the stacked windows); path counting collapses
    map-side to the distinct-path relation; top-k is a bounded
    TakeOrdered, never a global sort.
    """
    if n < 2:
        raise ValueError("path_topk: n must be >= 2")
    if k < 1:
        raise ValueError("path_topk: k must be >= 1")
    from pyspark.sql import Window
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    steps = [F.lag(F.col(step_col), n - 1 - i).over(w)
             for i in range(n - 1)] + [F.col(step_col)]
    path = F.concat_ws(" > ", *steps)
    full = steps[0].isNotNull()  # lag(n-1) non-null => all shorter too
    paths = (events
             .select(key_col, ts_col, tie_col, step_col)
             .withColumn("_p", F.when(full, path))
             .where(F.col("_p").isNotNull())
             .groupBy(F.col("_p").alias("path"))
             .agg(F.count(F.lit(1)).alias("cnt")))
    return (paths.orderBy(F.desc("cnt"), "path").limit(k)
            .select("path", "cnt",
                    F.row_number().over(
                        Window.orderBy(F.desc("cnt"), "path"))
                    .cast("int").alias("rank")))


def doc_chunks(df: DataFrame, *, size: int, overlap: int = 0,
               id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Overlapping token-window chunking — the training-data prep
    step between cleaning and packing (:func:`pack_sequences`): each
    document splits into windows of ``size`` whitespace tokens with
    ``overlap`` tokens shared between consecutive windows (stride =
    size − overlap). Returns one row per chunk: ``(doc_id, chunk_id,
    start_tok, n_tok, chunk_text)``.

    Chunk-count rule (deterministic, coverage-exact): ``m = 1`` if
    ``n ≤ size`` else ``1 + ceil((n − size) / stride)`` — every chunk
    except the last has exactly ``size`` tokens, the last covers the
    tail (never a fully-redundant trailing window), starts are
    ``c·stride``. All index arithmetic is exact integers; chunk text
    re-joins the sliced token array with single spaces (original
    whitespace is collapsed — the documented normalization).

    Plan: split + per-row sequence explode are all map-side (ONE
    narrow projection, no shuffle at all); the fanout is bounded by
    total-tokens/stride. Zero-token documents produce zero chunks.
    """
    if size < 1 or overlap < 0 or overlap >= size:
        raise ValueError("doc_chunks: need size >= 1 and "
                         "0 <= overlap < size")
    stride = size - overlap
    base = (df.where(F.col(text_col).isNotNull()
                     & (F.length(F.trim(F.col(text_col))) > 0))
            .select(F.col(id_col),
                    F.split(F.trim(F.col(text_col)), r"\s+")
                    .alias("_toks")))
    base = base.select(id_col, "_toks",
                       F.size("_toks").cast("long").alias("_n"))
    m = (F.when(F.col("_n") <= size, F.lit(1))
         .otherwise(F.lit(1) + F.expr(
             f"(_n - {size} + {stride} - 1) DIV {stride}")))
    rows = base.select(id_col, "_toks", "_n", m.alias("_m")) \
        .select(id_col, "_toks", "_n",
                F.explode(F.sequence(F.lit(0).cast("long"),
                                     F.col("_m") - 1)).alias("chunk_id"))
    start = (F.col("chunk_id") * stride).cast("long")
    ln = F.least(F.lit(size).cast("long"), F.col("_n") - start)
    return rows.select(
        id_col, F.col("chunk_id").cast("long"),
        start.alias("start_tok"), ln.alias("n_tok"),
        F.array_join(F.slice("_toks", (start + 1).cast("int"),
                             ln.cast("int")), " ").alias("chunk_text"))


def filter_funnel(df: DataFrame, *, min_tokens: int = 5,
                  max_chars: int = 20_000, min_mwl: int = 2,
                  max_mwl: int = 12, max_symbol_pct: int = 30,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """C4-style quality-filter funnel with FIRST-MATCH drop
    attribution — the cleaning-stage diagnostic every corpus pipeline
    needs: each document is attributed to the first rule it fails
    (rule order is the funnel's contract) and the output is the per-
    rule drop census ``(rule, n_docs)`` including ``'kept'``. Rules,
    in order: ``empty`` (null/whitespace-only), ``too_short``
    (< min_tokens whitespace tokens), ``too_long`` (> max_chars
    chars), ``word_len`` (mean word length outside [min_mwl,
    max_mwl]), ``symbol_ratio`` (non-alphanumeric-non-space share >
    max_symbol_pct %).

    Every rule is an EXACT integer predicate — ratios become integer
    cross-multiplications (mean word length bounds:
    ``n_alpha < min·n_tok`` / ``n_alpha > max·n_tok``; symbol share:
    ``100·n_sym > pct·n_chars``) — so attribution is bit-stable
    across engines and partitionings.

    Plan: one narrow map-side projection (token/char/symbol counts
    are native expressions, no UDF), ONE tiny rule-keyed aggregate.
    At 10^12 docs this is scan throughput plus a 6-row exchange.
    """
    t = F.col(text_col)
    trimmed = F.trim(t)
    n_tok = F.when(F.length(trimmed) == 0, F.lit(0)) \
             .otherwise(F.size(F.split(trimmed, r"\s+")))
    n_chars = F.length(t)
    # chars that are neither alphanumeric nor whitespace
    n_sym = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    # mean-word-length numerator: non-space characters
    n_alpha = F.length(F.regexp_replace(t, r"\s", ""))
    rule = (F.when(t.isNull() | (F.length(trimmed) == 0), "empty")
            .when(n_tok < min_tokens, "too_short")
            .when(n_chars > max_chars, "too_long")
            .when((n_alpha < min_mwl * n_tok)
                  | (n_alpha > max_mwl * n_tok), "word_len")
            .when(100 * n_sym > max_symbol_pct * n_chars,
                  "symbol_ratio")
            .otherwise("kept"))
    return (df.select(rule.alias("rule"))
            .groupBy("rule")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
