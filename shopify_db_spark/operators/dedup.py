"""Deduplication operator family for document corpora.

The operators a training-data pipeline runs before anything else,
each expressed as shuffled-join/aggregation DataFrame plans (no
Python in the loop) so they scale to billions of documents:

* :func:`exact_dedup` — hash-groupBy on a normalized-text
  fingerprint; one shuffle.
* :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — min-wise
  signatures over word shingles, banded LSH bucketing, candidate
  pairs verified by signature agreement. The min-hash uses md5
  *string* minima, which is engine-portable (no cross-engine 64-bit
  hash exists), an unusual but valid min-wise family: any fixed
  injective mapping to a totally ordered space works.
* :func:`simhash` / :func:`simhash_pairs` — 32-bit charge-vector
  sketch from per-token md5 bits; near-dups differ in few bits.
* :func:`ngram_jaccard_pairs` — exact Jaccard over shingle sets for
  candidate pairs inside a blocking key (the verify step after LSH,
  or standalone for small blocks).
* embedding near-dup lives in :mod:`operators.similarity`
  (cosine-threshold pairs).

Scale notes: every operator keys its shuffles on doc/shingle/bucket
ids; LSH bands bound the candidate set (vs. the O(n²) naive pair
join); skewed shingle buckets (boilerplate text) are the classic
hot-key hazard — cap band-bucket size with ``max_bucket`` to drop
degenerate buckets, as production dedup pipelines do.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shopify_db_spark.functions.text import fingerprint, word_shingles

DEFAULT_SEEDS = 8
DEFAULT_BAND_SIZE = 2


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id document per normalized-text fingerprint.
    Returns (fingerprint, keep_id, n_dups)."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    ).distinct()


def minhash_signatures(
    shingles: DataFrame, n_seeds: int = DEFAULT_SEEDS
) -> DataFrame:
    """Per-(doc, seed) min-wise hash: min over md5(seed || shingle).
    One exploded join with a seed range, one groupBy shuffle."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_seeds - 1))).alias("seed")
    salted = shingles.select("doc_id", "shingle", seeds).select(
        "doc_id",
        "seed",
        F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle"))).alias("h"),
    )
    return salted.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_seeds: int = DEFAULT_SEEDS,
    band_size: int = DEFAULT_BAND_SIZE,
    max_bucket: int = 50,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH, scored by the
    fraction of agreeing signature positions (estimates Jaccard).

    Returns (doc_a, doc_b, est_jaccard) with doc_a < doc_b.
    """
    sig = minhash_signatures(
        doc_shingles(docs, id_col, text_col), n_seeds
    ).cache()
    bands = (
        sig.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(F.md5(F.concat_ws("|", F.array_sort(F.collect_list(
            F.concat_ws(":", F.col("seed"), F.col("minhash"))
        )))).alias("band_key"))
    )
    # degenerate-bucket guard: boilerplate shingles put thousands of
    # docs in one bucket → quadratic pair blowup; cap and drop.
    bucket_sizes = bands.groupBy("band", "band_key").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    bands = bands.join(
        bucket_sizes.filter(F.col("bucket_n") <= max_bucket),
        ["band", "band_key"],
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "seed", F.col("minhash").alias("mh_a")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "seed", F.col("minhash").alias("mh_b")
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            (
                F.sum(F.when(F.col("mh_a") == F.col("mh_b"), 1).otherwise(0))
                / F.lit(float(n_seeds))
            ).alias("est_jaccard")
        )
    )


def _md5_bit(h: Column, bit: int) -> Column:
    """Bit ``bit`` (0..31) of the md5 hex prefix, as ±1 charge."""
    nibble = F.conv(F.substring(h, bit // 4 + 1, 1), 16, 10).cast("int")
    on = F.shiftright(nibble, 3 - (bit % 4)).bitwiseAND(F.lit(1))
    return F.when(on == 1, F.lit(1)).otherwise(F.lit(-1))


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 32) -> DataFrame:
    """32-bit SimHash: sum per-token md5-bit charges, take signs.
    Returns (doc_id, simhash_bits array<int>), all JVM-side."""
    toks = doc_shingles(docs, id_col, text_col, n=1)
    h = F.md5(F.col("shingle"))
    charges = toks.select(
        "doc_id", *[_md5_bit(h, i).alias(f"b{i}") for i in range(bits)]
    )
    summed = charges.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"b{i}") for i in range(bits)]
    )
    sign_bits = F.array(
        *[F.when(F.col(f"b{i}") > 0, 1).otherwise(0) for i in range(bits)]
    )
    return summed.select("doc_id", sign_bits.alias("simhash_bits"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 4,
    bits: int = 32,
    n_blocks: int = 8,
) -> DataFrame:
    """Near-dup pairs whose SimHash differs in ≤ ``max_hamming``
    bits. Multi-block banding bounds the pair join: the signature
    splits into ``n_blocks`` equal blocks and candidates must agree
    on at least one (block_idx, block_bits) key — by pigeonhole this
    guarantees full recall whenever ``max_hamming < n_blocks``
    (the standard permutation-table scheme specialised to disjoint
    blocks). One exploded self-join on the block key instead of an
    O(n²) cross join."""
    width = bits // n_blocks
    sh = simhash(docs, id_col, text_col, bits)
    blocks = sh.select(
        "doc_id",
        "simhash_bits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block_idx"),
                        F.concat_ws(
                            "", F.slice(F.col("simhash_bits"), i * width + 1, width)
                        ).alias("block_bits"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("blk"),
    ).select("doc_id", "simhash_bits", "blk.block_idx", "blk.block_bits")
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.block_idx") == F.col("b.block_idx"))
            & (F.col("a.block_bits") == F.col("b.block_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash_bits").alias("bits_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash_bits").alias("bits_b"),
        )
        .distinct()
    )
    hamming = F.size(
        F.filter(
            F.zip_with(
                F.col("bits_a"), F.col("bits_b"), lambda x, y: (x != y).cast("int")
            ),
            lambda d: d == 1,
        )
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs sharing a blocking key.
    Returns (doc_a, doc_b, jaccard ≥ threshold). The shingle join is
    keyed on (block, shingle) so only same-block docs ever meet."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in block_cols],
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    block_eq = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in block_cols]
    inter = (
        a.join(b, functools.reduce(lambda x, y: x & y, block_eq))
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle"))
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
