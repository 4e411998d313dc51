"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The scale story (the reason each exists):

* **exact**: one hash-groupBy — always the first pass at 100 TB; the
  digest is computed map-side, the shuffle carries (digest, id) only.
* **ngram-jaccard**: exact set similarity via the inverted-index
  pattern — explode distinct shingles, self-equi-join on shingle,
  count co-occurrences. No O(n²) cross join: pairs sharing no shingle
  are never materialized. Document-frequency filtering drops stopword
  shingles that would otherwise quadratically blow up dense corpora.
* **MinHash+LSH**: the sub-quadratic path — signatures map-side
  (Arrow PUDF, vectorized), banded bucket join generates candidates,
  exact verification keeps precision at 1.
* **SimHash**: constant-size fingerprint; candidates via 16-bit band
  tables (hamming<=3 over 64 bits guarantees one equal band of 4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

from cdap_geo_spark.operators.text import doc_digest, shingles


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(digest, keeper_id, n_dupes): groups of byte-identical
    (normalized) texts; keeper = min id. Survivors = keepers."""
    return (df.select(doc_digest(F.col(text_col)).alias("digest"),
                      F.col(id_col))
            .groupBy("digest")
            .agg(F.min(id_col).alias("keeper"),
                 F.count("*").alias("n_docs")))


def exact_survivors(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    k = exact_dedup(df, text_col, id_col).select(
        F.col("keeper").alias(id_col))
    return df.join(k, id_col, "left_semi")


# ---------------------------------------------------------------------------
# exact n-gram jaccard (inverted index, no cross join)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, *, k: int = 3,
                        threshold_pct: int = 40,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_df: int | None = None) -> DataFrame:
    """(id_a, id_b, inter, uni) for pairs with jaccard >= threshold_pct/100
    over distinct character k-grams; id_a < id_b.

    Pure integer outputs and an integer threshold comparison
    (100*inter >= pct*uni) keep the result bit-comparable to the SQL
    oracle. ``max_df`` drops shingles occurring in more than that many
    docs (stopword-shingle guard for dense corpora at scale).
    """
    sh = df.select(F.col(id_col).alias("_id"),
                   F.explode(shingles(F.col(text_col), k)).alias("sh"))
    sizes = sh.groupBy("_id").agg(F.count("*").alias("sz"))
    if max_df is not None:
        keep = sh.groupBy("sh").count().filter(F.col("count") <= max_df) \
                 .select("sh")
        sh = sh.join(F.broadcast(keep), "sh")
    # repartition by shingle: (a) co-partitions the self-join, (b) breaks
    # the single-input-file trap where the join + partial aggregate of
    # the full pair blowup would otherwise run in ONE task (a 1-file
    # parquet scan is 1 partition; common shingles make the join output
    # quadratic, so that task is hours of CPU at scale)
    sh = sh.repartition(F.col("sh"))
    a = sh.toDF("ida", "sh")
    b = sh.toDF("idb", "sh")
    inter = (a.join(b, "sh")
             .filter(F.col("ida") < F.col("idb"))
             .groupBy("ida", "idb").agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.toDF("ida", "sza"), "ida")
           .join(sizes.toDF("idb", "szb"), "idb")
           .select(F.col("ida").alias("id_a"), F.col("idb").alias("id_b"),
                   "inter",
                   (F.col("sza") + F.col("szb") - F.col("inter"))
                   .alias("uni")))
    return out.filter(F.lit(100) * F.col("inter")
                      >= F.lit(threshold_pct) * F.col("uni"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _hash_shingles_np(text: str, k: int) -> np.ndarray:
    """Distinct k-gram polynomial hashes of one text (uint64)."""
    data = np.frombuffer(text.lower().encode("utf-8", "ignore"),
                         dtype=np.uint8).astype(np.uint64)
    n = len(data) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    with np.errstate(over="ignore"):
        hs = np.zeros(n, np.uint64)
        for j in range(k):
            hs = hs * np.uint64(1000003) + data[j:j + n]
    return np.unique(hs)


def minhash_signature_udf(num_perm: int = 64, k: int = 5, seed: int = 7):
    """Arrow PUDF: text -> array<long> MinHash signature.

    Permutations are the classic (a*x + b) mod p family with
    deterministic a, b derived from ``seed`` — identical across
    executors, no broadcast needed.
    """
    p = np.uint64((1 << 61) - 1)
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, num_perm).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 1 << 31, num_perm).astype(np.uint64)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for txt in texts:
                if txt is None:
                    out.append(None)
                    continue
                hs = _hash_shingles_np(txt, k)
                if len(hs) == 0:
                    out.append([0] * num_perm)
                    continue
                # (num_perm, n) — min over shingles per permutation
                vals = (a[:, None] * hs[None, :] + b[:, None]) % p
                out.append([int(v) for v in vals.min(axis=1)])
        return pd.Series(out)
    return _sig


def minhash_lsh_pairs(df: DataFrame, *, num_perm: int = 64, bands: int = 16,
                      k: int = 5, threshold: float = 0.5,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Near-dup pairs via banded MinHash LSH + exact verification.

    rows/bands = 4 -> candidate recall kicks in around jaccard ~0.5.
    Verification recomputes EXACT jaccard over shingle-hash sets in an
    Arrow PUDF, so precision is 1 (against the k-gram jaccard measure).
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sig = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"),
                    minhash_signature_udf(num_perm, k)(F.col(text_col))
                    .alias("_sig"))
    sig = sig.persist()
    # band key = hash of the band's slice
    bands_df = sig.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.hash(F.slice("_sig", i * rows_per_band + 1,
                                    rows_per_band)).alias("bkey"))
            for i in range(bands)])).alias("b"))
    bands_df = bands_df.select("_id", "b.band", "b.bkey")
    cand = (bands_df.toDF("ida", "band", "bkey")
            .join(bands_df.toDF("idb", "band", "bkey"), ["band", "bkey"])
            .filter(F.col("ida") < F.col("idb"))
            .select("ida", "idb").dropDuplicates(["ida", "idb"]))
    # exact verify
    withtext = cand \
        .join(sig.select(F.col("_id").alias("ida"), F.col("_t").alias("ta")),
              "ida") \
        .join(sig.select(F.col("_id").alias("idb"), F.col("_t").alias("tb")),
              "idb")

    @pandas_udf(T.DoubleType())
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.zeros(len(ta))
        for i, (x, y) in enumerate(zip(ta, tb)):
            if x is None or y is None:
                continue
            sa = _hash_shingles_np(x, k)
            sb = _hash_shingles_np(y, k)
            if len(sa) == 0 and len(sb) == 0:
                out[i] = 1.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            out[i] = inter / (len(sa) + len(sb) - inter)
        return pd.Series(out)

    return (withtext.withColumn("jaccard", _jac("ta", "tb"))
            .filter(F.col("jaccard") >= threshold)
            .select(F.col("ida").alias("id_a"), F.col("idb").alias("id_b"),
                    "jaccard"))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_udf(seed: int = 11):
    """Arrow PUDF: text -> int64 SimHash of whitespace tokens (64-bit
    splitmix token hashes, sign-vote per bit)."""
    @pandas_udf(T.LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), np.int64)
        with np.errstate(over="ignore"):
            for i, txt in enumerate(texts):
                if txt is None:
                    continue
                toks = txt.lower().split()
                if not toks:
                    continue
                hs = np.fromiter(
                    (hash_token(t, seed) for t in toks), np.uint64,
                    count=len(toks))
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                        & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                v = np.uint64(0)
                for bidx in np.flatnonzero(votes > 0):
                    v |= np.uint64(1) << np.uint64(bidx)
                out[i] = np.int64(v)
        return pd.Series(out)
    return _sh


def hash_token(tok: str, seed: int) -> np.uint64:
    with np.errstate(over="ignore"):
        z = np.uint64(seed)
        for ch in tok.encode("utf-8", "ignore"):
            z = (z ^ np.uint64(ch)) * np.uint64(0x100000001B3)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def simhash_pairs(df: DataFrame, *, max_hamming: int = 3,
                  id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id_a, id_b, hamming<=max) via 16-bit band candidates + verify.

    With 4 bands of 16 bits, any pair within hamming 3 shares at least
    one identical band (pigeonhole) — candidate recall is exact.
    """
    sh = df.select(F.col(id_col).alias("_id"),
                   simhash_udf()(F.col(text_col)).alias("sh"))
    sh = sh.persist()
    bands_df = sh.select("_id", F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("sh", i * 16)
                 .bitwiseAND(F.lit(0xFFFF)).alias("bkey"))
        for i in range(4)])).alias("b")).select("_id", "b.band", "b.bkey")
    cand = (bands_df.toDF("ida", "band", "bkey")
            .join(bands_df.toDF("idb", "band", "bkey"), ["band", "bkey"])
            .filter(F.col("ida") < F.col("idb"))
            .select("ida", "idb").dropDuplicates(["ida", "idb"]))
    j = cand \
        .join(sh.toDF("ida", "sha"), "ida") \
        .join(sh.toDF("idb", "shb"), "idb")
    ham = F.bit_count(F.col("sha").bitwiseXOR(F.col("shb")))
    return (j.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select(F.col("ida").alias("id_a"),
                    F.col("idb").alias("id_b"), "hamming"))
