"""Deduplication operators (BASELINE.json north star: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

The driver corpus has no duplicates by construction (every ``text`` is
distinct at every SF), so each query deterministically synthesizes its
duplicate population from the corpus itself (id-shifted copies,
case-mangled copies, prefix truncations, perturbed vectors) — the
oracle applies the same construction, so parity checks the *operator*,
not the synthetic data.

Scale design notes:

- exact dedup = hash-groupBy: one shuffle on md5(text) — at 100 TB the
  canonical pattern, no driver involvement;
- MinHash+LSH: shingle → minhash-signature → band → bucket join. All
  JVM-side (xxhash64 + higher-order array functions), the candidate
  join shuffles only on (band, bucket-hash) keys, and verification
  runs per candidate pair — never O(n²);
- SimHash: 64-bit signature via bit-bucket majority vote, pairs from
  16-bit band blocking, Hamming-distance verify with bit_count;
- n-gram Jaccard: blocked self-join (lang, length-bucket) — blocking
  keys bound the pair blow-up;
- embedding cosine: label-blocked pair join with double-precision
  left-fold dot products (bit-stable vs the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from overturelink_data_pipeline_spark.registry import spark_query
from overturelink_data_pipeline_spark.session import read_table

# ---------------------------------------------------------------------------
# Exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------

_DUP_UNION = """
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
"""


@spark_query(
    "dedup_exact",
    oracle=f"""
    WITH corpus AS ({_DUP_UNION})
    SELECT md5(text)                         AS content_hash,
           CAST(MIN(doc_id) AS BIGINT)       AS canonical_id,
           CAST(COUNT(*) AS BIGINT)          AS n_copies
    FROM corpus
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    ORDER BY canonical_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group on content hash, keep min-id canonical row.
    One shuffle; the HAVING>1 output is the duplicate report."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 3 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    corpus = docs.unionByName(dups)
    return (
        corpus.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").cast("bigint").alias("canonical_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("canonical_id")
    )


@spark_query(
    "dedup_exact_normalized",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, upper(text) || '  ' FROM documents WHERE doc_id % 5 = 0
    )
    SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_hash,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT)    AS n_copies
    FROM corpus
    GROUP BY 1
    HAVING COUNT(*) > 1
    ORDER BY canonical_id
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized exact dedup: case/whitespace-mangled copies collapse
    onto their originals under lower+collapse normalization."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    mangled = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn("text", F.concat(F.upper("text"), F.lit("  ")))
    )
    corpus = docs.unionByName(mangled)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), "\\s+", " ")
    return (
        corpus.groupBy(F.md5(norm).alias("content_hash"))
        .agg(
            F.min("doc_id").cast("bigint").alias("canonical_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .orderBy("canonical_id")
    )


# ---------------------------------------------------------------------------
# Token-shingle helpers (shared by jaccard / minhash)
# ---------------------------------------------------------------------------

def shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-token shingles as an array<string> — pure Catalyst
    (split + transform over an index sequence)."""
    toks = F.split(F.trim(col), "\\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


_PREFIX_CORPUS_SQL = """
    SELECT doc_id, lang, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000, lang, substr(text, 1, CAST(floor(length(text) * 0.8) AS INT))
    FROM documents WHERE doc_id % 7 = 0
"""


def _prefix_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus + 80%-prefix copies of every 7th doc (high shingle overlap
    with the original, low overlap with everything else)."""
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pref = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1000000)
        .withColumn(
            "text",
            # explicit floor: DuckDB CAST(double AS INT) rounds-to-nearest
            # while Spark truncates — floor in both keeps prefixes equal
            F.substring(
                F.col("text"), 1, F.floor(F.length("text") * 0.8).cast("int")
            ),
        )
    )
    return docs.unionByName(pref)


@spark_query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH corpus AS ({_PREFIX_CORPUS_SQL}),
    sh AS (
      SELECT doc_id, lang,
             CAST(floor(length(text) / 100.0) AS INT) AS len_bucket,
             list_distinct(
               list_transform(
                 range(1, greatest(len(string_split_regex(trim(text), '\\s+')) - 2, 1) + 1),
                 i -> string_split_regex(trim(text), '\\s+')[i] || ' ' ||
                      string_split_regex(trim(text), '\\s+')[i+1] || ' ' ||
                      string_split_regex(trim(text), '\\s+')[i+2]
               )
             ) AS sh
      FROM corpus
      WHERE len(string_split_regex(trim(text), '\\s+')) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.sh, b.sh)) * 1.0 /
                 (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.len_bucket BETWEEN b.len_bucket - 1 AND b.len_bucket + 1
     AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram Jaccard near-dup with (lang, length-bucket) blocking.

    Scale mechanics: the ±1-bucket adjacency is EXPLODED into explicit
    equi-join keys (b emits bucket-1/bucket/bucket+1 rows) so the whole
    blocking predicate lives in the shuffle key — a `BETWEEN` range
    condition would fall out of the hash-join key and degenerate to a
    per-lang cross product (measured 280 s → ~10 s at sf0.1). Shingles
    are compared as xxhash64 longs, not strings: the Jaccard over
    distinct 64-bit hashes equals the string-set Jaccard up to
    negligible collision probability, and long-array intersects are
    far cheaper than string-array intersects."""
    corpus = _prefix_corpus(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), "\\s+")
    sh = corpus.filter(F.size(toks) >= 3).select(
        "doc_id",
        "lang",
        (F.length("text") / 100).cast("int").alias("len_bucket"),
        F.array_sort(
            F.array_distinct(
                F.transform(shingles(F.col("text")), lambda s: F.xxhash64(s))
            )
        ).alias("sh"),
    )
    a = sh.alias("a")
    b = sh.withColumn(
        "join_bucket",
        F.explode(
            F.array(
                F.col("len_bucket") - 1, F.col("len_bucket"), F.col("len_bucket") + 1
            )
        ),
    ).alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.join_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.5)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (rows-only: xxhash64 signatures are Spark-specific)
# ---------------------------------------------------------------------------

N_HASHES = 32
N_BANDS = 8  # rows-per-band = 4 → catches jaccard ≳ 0.5 w.h.p.


def minhash_signature(sh_col: Column, n_hashes: int = N_HASHES) -> Column:
    """Array of n minhashes, hash family = xxhash64 seeded by the
    function index (avoids a*h+b modular math, which overflows LongType
    under ANSI). All JVM-side array math."""
    # NB: closures must be built by a factory — pyspark binds a 2-param
    # lambda as (element, index), so `lambda s, i=i:` would silently
    # receive the array index as `i` and collapse the hash family.
    def seeded(i: int):
        return lambda s: F.xxhash64(F.lit(i), s)

    sigs = [F.array_min(F.transform(sh_col, seeded(i))) for i in range(n_hashes)]
    return F.array(*sigs)


@spark_query("dedup_minhash_lsh")
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: shingle → 32-hash signature → 8 bands →
    bucket join on (band, band-hash) → exact-Jaccard verification of
    candidates only. Rows-only (xxhash64); recall pinned against
    brute-force Jaccard in tests/test_dedup.py."""
    corpus = _prefix_corpus(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), "\\s+")
    sh = corpus.filter(F.size(toks) >= 3).select(
        "doc_id", shingles(F.col("text")).alias("sh")
    )
    rows_per_band = N_HASHES // N_BANDS
    sig = sh.select("doc_id", "sh", minhash_signature(F.col("sh")).alias("sig"))
    bands = sig.select(
        "doc_id",
        "sh",
        F.posexplode(
            F.array(
                *[
                    F.hash(F.slice("sig", i * rows_per_band + 1, rows_per_band))
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return (
        cand.filter(jac >= 0.5)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# SimHash (rows-only)
# ---------------------------------------------------------------------------

@spark_query("dedup_simhash")
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 64-bit signature (frequency-weighted per-bit
    vote over token xxhash64s — tokens enter with repetition, the
    classic term-weighted scheme), 4×16-bit band blocking, Hamming ≤ 6
    verify via bit_count(xor). Signature construction is JVM-side
    array math."""
    corpus = _prefix_corpus(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), "\\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit j of simhash = majority of bit j over token hashes
    # (factory closure — see minhash_signature note on lambda arity)
    def vote(j: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_votes = [F.aggregate(hashes, F.lit(0), vote(j)) for j in range(64)]
    sim = F.lit(0).cast("long")
    for j, v in enumerate(bit_votes):
        # shiftleft wraps to the sign bit for j=63 — exactly bit 63
        sim = sim + F.when(v > 0, F.shiftleft(F.lit(1).cast("long"), j)).otherwise(
            F.lit(0).cast("long")
        )
    sigs = corpus.select("doc_id", sim.alias("simhash"))
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("band", "chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= 6)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def cosine(a: Column, b: Column) -> Column:
    """Double-precision cosine via left-fold aggregates (deterministic
    summation order — matches the oracle bit-for-bit in practice)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (na * nb)


@spark_query(
    "dedup_embedding_cosine",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, label,
             [list_transform(embedding, x -> CAST(x AS DOUBLE))[1] + 0.05] ||
             list_transform(embedding, x -> CAST(x AS DOUBLE))[2:]
      FROM embeddings WHERE vec_id % 11 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.v, b.v), 5) AS cos_sim
    FROM corpus a JOIN corpus b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.98
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: label-blocked, cosine ≥ 0.98. Perturbed
    copies (first dim +0.05) of every 11th vector are the planted
    duplicate population.

    Physical strategy: ``applyInPandas`` per block with a numpy GEMM
    (unit-normalize → M·Mᵀ → upper-triangle threshold). A per-pair
    Catalyst fold was measured 260× slower than DuckDB here — Spark's
    higher-order array functions evaluate interpreted, so all-pairs
    scoring belongs in a blocked matmul (this is the Arrow-UDF
    "built-ins can't express it efficiently" case). Each block is one
    task → at scale, blocks (quantizer cells) shard the O(n²) across
    the cluster and bound per-task memory."""
    import numpy as np
    import pandas as pd

    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    pert = (
        emb.filter(F.col("vec_id") % 11 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1000000)
        .withColumn(
            "v",
            F.concat(
                F.array(F.element_at("v", 1) + 0.05),
                F.slice("v", 2, F.size("v") - 1),
            ),
        )
    )
    corpus = emb.unionByName(pert)

    out_schema = "id_a long, id_b long, cos_sim double"

    def block_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["v"].to_numpy())
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ (m / norms).T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= 0.98
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cos_sim": np.round(sims[iu, ju][keep], 5)}
        )

    return (
        corpus.groupBy("label")
        .applyInPandas(block_pairs, schema=out_schema)
        .orderBy("id_a", "id_b")
    )
