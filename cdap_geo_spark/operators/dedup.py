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
                        max_df: int | None = None,
                        prefix_filter: bool = True) -> DataFrame:
    """(id_a, id_b, inter, uni) for pairs with jaccard >= threshold_pct/100
    over distinct character k-grams; id_a < id_b.

    Candidate generation uses LOSSLESS prefix filtering (the All-Pairs /
    PPJoin principle, Bayardo et al. WWW'07): under any global shingle
    order, a pair with J >= t must share a shingle within the first
    ``sz - ceil(t*sz) + 1`` shingles of EACH side. Ordering shingles by
    ascending document frequency keeps stopword shingles out of every
    prefix, so no single hot shingle can produce a quadratic join
    partition — the round-1 scale killer. Candidates are then verified
    EXACTLY with native ``array_intersect`` over each doc's full
    distinct-shingle set, so the output is identical to the naive
    inverted-index join (same rows as the SQL oracle).

    Pure integer outputs and an integer threshold comparison
    (100*inter >= pct*uni) keep the result bit-comparable to the SQL
    oracle. ``max_df`` additionally drops shingles occurring in more
    than that many docs (changes semantics; off by default).
    ``prefix_filter=False`` falls back to the plain inverted-index
    count (useful for tiny inputs / property tests).
    """
    from pyspark.sql import Window

    sh = df.select(F.col(id_col).alias("_id"),
                   F.explode(shingles(F.col(text_col), k)).alias("sh"))
    if max_df is not None:
        keep = sh.groupBy("sh").count().filter(F.col("count") <= max_df) \
                 .select("sh")
        sh = sh.join(F.broadcast(keep), "sh")
    sizes = sh.groupBy("_id").agg(F.count("*").alias("sz"))

    if not prefix_filter:
        # plain inverted-index join; repartition by shingle breaks the
        # single-input-file trap (1-file parquet scan = 1 task)
        shp = sh.repartition(F.col("sh"))
        a = shp.toDF("ida", "sh")
        b = shp.toDF("idb", "sh")
        inter = (a.join(b, "sh")
                 .filter(F.col("ida") < F.col("idb"))
                 .groupBy("ida", "idb").agg(F.count("*").alias("inter")))
        out = (inter
               .join(sizes.toDF("ida", "sza"), "ida")
               .join(sizes.toDF("idb", "szb"), "idb")
               .select(F.col("ida").alias("id_a"),
                       F.col("idb").alias("id_b"), "inter",
                       (F.col("sza") + F.col("szb") - F.col("inter"))
                       .alias("uni")))
        return out.filter(F.lit(100) * F.col("inter")
                          >= F.lit(threshold_pct) * F.col("uni"))

    # global order = (document frequency asc, shingle asc): rare first,
    # so stopword shingles sit at the END of every doc's ordering and
    # never enter a prefix. Shingles are dictionary-encoded to dense
    # int ids in that order (the distinct-shingle relation is tiny), so
    # joins/arrays carry 8-byte ids instead of UTF8 strings.
    wg = Window.orderBy("_df", "sh")
    dfreq = (sh.groupBy("sh").agg(F.count("*").alias("_df"))
             .withColumn("sid", F.row_number().over(wg)))
    ranked = sh.join(F.broadcast(dfreq.select("sh", "sid")), "sh")
    w = Window.partitionBy("_id").orderBy("sid")
    # prefix length = sz - ceil(pct*sz/100) + 1 (integer ceil)
    plen = (F.col("sz")
            - F.floor((F.col("sz") * threshold_pct + 99) / 100) + 1)
    pos = ranked.withColumn("_pos", F.row_number().over(w)) \
                .join(sizes, "_id")
    pref = pos.filter(F.col("_pos") <= plen) \
              .select("_id", "sid", "_pos", "sz") \
              .repartition(F.col("sid"))
    a = pref.toDF("ida", "sid", "pa", "sza")
    b = pref.toDF("idb", "sid", "pb", "szb")
    pct = F.lit(threshold_pct)
    # PPJoin filters evaluated INSIDE the join stage (codegen'd, before
    # any shuffle): length filter (min sz >= t * max sz) and positional
    # filter (inter <= min(sz - pos) + 1, which must still satisfy
    # (100+pct)*inter >= pct*(sza+szb); the loosest — first — match of
    # any qualifying pair passes, so no true pair is lost)
    ub = F.least(F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")) + 1
    matches = (a.join(b, "sid")
               .filter((F.col("ida") < F.col("idb"))
                       & (F.lit(100) * F.col("sza") >= pct * F.col("szb"))
                       & (F.lit(100) * F.col("szb") >= pct * F.col("sza"))
                       & ((F.lit(100) + pct) * ub
                          >= pct * (F.col("sza") + F.col("szb")))))
    # distinct pairs (map-side partial agg keeps the shuffle narrow)
    cand = matches.select("ida", "idb").dropDuplicates(["ida", "idb"])
    # exact verify over full distinct-shingle ID sets — native
    # array_intersect on int arrays, no Python. The sets relation is
    # docs-sized (tiny next to the pair set), so it broadcasts: the
    # verify is map-side and the arrays never cross a shuffle.
    sets = (ranked.groupBy("_id")
            .agg(F.collect_list("sid").alias("arr"),
                 F.count("*").alias("sz")))
    sa = F.broadcast(sets.toDF("ida", "arr_a", "sza"))
    sb = F.broadcast(sets.toDF("idb", "arr_b", "szb"))
    out = (cand.join(sa, "ida").join(sb, "idb")
           .select(F.col("ida").alias("id_a"), F.col("idb").alias("id_b"),
                   F.size(F.array_intersect("arr_a", "arr_b"))
                   .cast("long").alias("inter"),
                   (F.col("sza") + F.col("szb")).alias("tot"))
           .withColumn("uni", F.col("tot") - F.col("inter"))
           .drop("tot"))
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


#: per-worker-process gram -> hash memo. The k-gram space of lowered
#: text saturates quickly across a corpus (k=5 over [a-z0-9 .,…]), so
#: after warm-up almost every gram is a dict hit instead of a Python
#: hashlib round-trip — measured ~20x fewer md5 calls on the bench
#: corpus. Cleared wholesale at the cap: the memo refills within one
#: batch and a bounded dict beats an LRU's per-op bookkeeping here.
_GRAM_MEMO: dict = {}
_GRAM_MEMO_CAP = 1_500_000


def _md5_shingles(text: str, k: int) -> np.ndarray:
    """Distinct k-gram md5-prefix hashes (60-bit uint64) of one text.

    md5 is the one hash Spark and DuckDB share, which makes every
    operator built on these shingle hashes EXACTLY recomputable by the
    SQL oracle: x = int(md5(gram)[:15 hex], 16).
    """
    import hashlib
    t = text.lower()
    n = len(t) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    grams = {t[i:i + k] for i in range(n)}
    memo = _GRAM_MEMO
    missing = [g for g in grams if g not in memo]
    if missing:
        if len(memo) + len(missing) > _GRAM_MEMO_CAP:
            memo.clear()
        for g in missing:
            memo[g] = int(hashlib.md5(g.encode("utf-8", "ignore"))
                          .hexdigest()[:15], 16)
    return np.fromiter((memo[g] for g in grams), np.uint64,
                       count=len(grams))


MINHASH_PRIME = (1 << 61) - 1
_U64 = 1 << 64


def minhash_params(num_perm: int = 64, seed: int = 7):
    """The deterministic (a, b) permutation constants — shared by the
    Spark kernel and the generated SQL oracle (embedded as literals)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, num_perm).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 1 << 31, num_perm).astype(np.uint64)
    return a, b


def minhash_signature_udf(num_perm: int = 64, k: int = 5, seed: int = 7):
    """Arrow PUDF: text -> array<long> MinHash signature.

    Shingle hashes are md5-prefix (``_md5_shingles``); permutations are
    ``((a*x mod 2^64) + b mod 2^64) mod p`` with deterministic a, b
    from ``seed`` — identical across executors (no broadcast) AND
    exactly recomputable in DuckDB HUGEINT arithmetic, which is what
    gives this operator a full value-level SQL oracle.
    """
    p = np.uint64(MINHASH_PRIME)
    a, b = minhash_params(num_perm, seed)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for txt in texts:
                if txt is None:
                    out.append(None)
                    continue
                hs = _md5_shingles(txt, k)
                if len(hs) == 0:
                    out.append([0] * num_perm)
                    continue
                # (num_perm, n) — min over shingles per permutation;
                # uint64 wrap-around is part of the (documented) family
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
    # band key = md5 of the comma-joined band slice (NOT F.hash: md5 is
    # the engine-independent choice the SQL oracle can recompute)
    def _bkey(i):
        vals = [F.element_at("_sig", i * rows_per_band + j + 1)
                .cast("string") for j in range(rows_per_band)]
        return F.md5(F.concat_ws(",", *vals))

    bands_df = sig.select(
        "_id",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"), _bkey(i).alias("bkey"))
            for i in range(bands)])).alias("b"))
    bands_df = bands_df.select("_id", "b.band", "b.bkey")
    cand = (bands_df.toDF("ida", "band", "bkey")
            .join(bands_df.toDF("idb", "band", "bkey"), ["band", "bkey"])
            .filter(F.col("ida") < F.col("idb"))
            .select("ida", "idb").dropDuplicates(["ida", "idb"]))
    # exact verify — integer threshold test (2*inter >= uni for 0.5)
    # so the pass/fail decision is FP-free and oracle-identical
    withtext = cand \
        .join(sig.select(F.col("_id").alias("ida"), F.col("_t").alias("ta")),
              "ida") \
        .join(sig.select(F.col("_id").alias("idb"), F.col("_t").alias("tb")),
              "idb")

    @pandas_udf("inter long, uni long")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.DataFrame:
        inter = np.zeros(len(ta), np.int64)
        uni = np.zeros(len(ta), np.int64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            if x is None or y is None:
                continue
            sa = _md5_shingles(x, k)
            sb = _md5_shingles(y, k)
            both = len(np.intersect1d(sa, sb))
            inter[i] = both
            uni[i] = len(sa) + len(sb) - both
        return pd.DataFrame({"inter": inter, "uni": uni})

    thr_num, thr_den = float(threshold).as_integer_ratio()
    return (withtext.withColumn("_j", _jac("ta", "tb"))
            .filter(F.col("_j.inter") * thr_den >= F.col("_j.uni") * thr_num)
            .select(F.col("ida").alias("id_a"), F.col("idb").alias("id_b"),
                    F.col("_j.inter").alias("inter"),
                    F.col("_j.uni").alias("uni")))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_udf(token_hash: str = "md5", seed: int = 11):
    """Arrow PUDF: text -> int64 SimHash of whitespace tokens
    (sign-vote per bit over 64-bit token hashes, MSB-first packing).

    ``token_hash='md5'`` (default) hashes each token as the first 16
    hex digits of md5 — slower than splitmix but recomputable by the
    DuckDB oracle bit for bit; ``'splitmix'`` keeps the round-1 fast
    path for pipelines that don't need SQL checkability.
    """
    import hashlib

    @pandas_udf(T.LongType())
    def _sh(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), np.int64)
        shifts = np.uint64(63) - np.arange(64, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i, txt in enumerate(texts):
                if txt is None:
                    continue
                toks = txt.lower().split()
                if not toks:
                    continue
                if token_hash == "md5":
                    hs = np.fromiter(
                        (int(hashlib.md5(t.encode("utf-8", "ignore"))
                             .hexdigest()[:16], 16) for t in toks),
                        np.uint64, count=len(toks))
                else:
                    hs = np.fromiter(
                        (hash_token(t, seed) for t in toks), np.uint64,
                        count=len(toks))
                bits = ((hs[:, None] >> shifts[None, :])
                        & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                v = np.uint64(0)
                for bidx in np.flatnonzero(votes > 0):
                    v |= np.uint64(1) << shifts[bidx]
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
                  id_col: str = "doc_id", text_col: str = "text",
                  token_hash: str = "md5") -> DataFrame:
    """(id_a, id_b, hamming<=max) via 16-bit band candidates + verify.

    With 4 bands of 16 bits, any pair within hamming 3 shares at least
    one identical band (pigeonhole) — candidate recall is exact.
    Band i = bits [16i, 16i+16) MSB-first, matching the SQL oracle.
    """
    sh = df.select(F.col(id_col).alias("_id"),
                   simhash_udf(token_hash)(F.col(text_col)).alias("sh"))
    sh = sh.persist()
    bands_df = sh.select("_id", F.explode(F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned("sh", 48 - i * 16)
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
