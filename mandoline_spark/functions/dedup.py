"""Document deduplication operators: exact, n-gram Jaccard, MinHash-LSH,
SimHash.  All hot-path expressions are JVM-side (split/transform/
xxhash64/bitwise aggregates) — no Python in any per-token loop.

Scale shapes:
- exact: groupBy(md5) — one shuffle of (hash, id).
- n-gram Jaccard: inverted-index self-join on shingle (each gram is a
  blocking key); `max_df` drops stop-shingles so hot keys can't explode
  the join (the classic skew guard).
- MinHash-LSH: k permutation-min signatures per doc (one groupBy), then
  banding — candidate pairs only need to agree on one band, so the join
  key is (band_id, band_hash) and cost is O(collisions), not O(n²).
  Candidates are verified with exact Jaccard before reporting.
- SimHash: 64 bitwise-majority aggregates per doc; near-dup = small
  hamming distance, banded the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Prime just under 2^31 (the one Spark MLlib's MinHashLSH uses): keeps
# every affine-map product under 2^62, so the arithmetic stays in int64
# under ANSI mode with no overflow.
_PRIME = 2038074743


def shingles(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles per document, entirely JVM-side:
    split → sliding window via transform(sequence) → explode."""
    words = F.split(F.col(text_col), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("gram"))
        .where(F.length("gram") > 0)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_df: int | None = None,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (a < b, jac ≥ threshold) via
    an inverted-index self-join on shingles.  ``max_df`` (drop shingles
    occurring in more than max_df docs) bounds join fan-out at scale
    without affecting high-similarity pairs."""
    g = shingles(df, text_col, id_col, n)
    if max_df is not None:
        hot = (
            g.groupBy("gram")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("gram")
        )
        g = g.join(hot, "gram", "left_anti")
    sizes = g.groupBy("id").agg(F.count("*").alias("ng"))
    a = g.select(F.col("id").alias("a"), "gram")
    b = g.select(F.col("id").alias("b"), "gram")
    common = (
        a.join(b, "gram")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    na = sizes.select(F.col("id").alias("a"), F.col("ng").alias("na"))
    nb = sizes.select(F.col("id").alias("b"), F.col("ng").alias("nb"))
    jac = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    out = (
        common.join(na, "a")
        .join(nb, "b")
        .withColumn("_jac", jac)
        .filter(F.col("_jac") >= threshold)
        .select(
            "a",
            "b",
            (
                F.round("_jac", round_to)
                if round_to is not None
                else F.col("_jac")
            ).alias("jac"),
        )
    )
    return out.orderBy("a", "b")


def _perm_params(k: int, seed: int) -> list[tuple[int, int]]:
    """Deterministic affine permutation parameters (a, b) — derivable on
    any executor with no driver state."""
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _PRIME, size=k, dtype=np.int64)
    b = rng.integers(0, _PRIME, size=k, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    seed: int = 42,
) -> DataFrame:
    """k-permutation MinHash signature per document: one xxhash64 per
    distinct shingle, then k affine-map minima in a single groupBy
    (k JVM min-aggregates; no Python)."""
    g = shingles(df, text_col, id_col, n)
    # xxhash64 can be negative; fold into [0, _PRIME) so every
    # a*h+b product stays below 2^62 (no int64 overflow under ANSI)
    h = (F.xxhash64("gram") % F.lit(_PRIME) + F.lit(_PRIME)) % F.lit(_PRIME)
    g = g.select("id", h.alias("h"))
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % F.lit(_PRIME)).alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(_perm_params(k, seed))
    ]
    return g.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    seed: int = 42,
    round_to: int | None = 6,
) -> DataFrame:
    """Near-dup pairs by MinHash banding + exact-Jaccard verification.

    Banding: signature split into ``bands`` groups of k/bands rows; docs
    colliding on any band become candidates (join key = band id + band
    hash).  Candidates are then verified with exact n-gram Jaccard, so
    the output is a subset of the exact ≥-threshold pairs with recall
    1-(1-s^r)^b (≈1 for s ≥ 0.8 at 16×4)."""
    sigs = minhash_signatures(df, text_col, id_col, n, k, seed)
    r = k // bands
    band_cols = [
        F.xxhash64(*[F.col(f"mh{band * r + j}") for j in range(r)]).alias(
            f"band{band}"
        )
        for band in range(bands)
    ]
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"), c.alias("band_hash")
                    )
                    for i, c in enumerate(band_cols)
                ]
            )
        ).alias("b"),
    ).select("id", "b.band_id", "b.band_hash")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_id", "band_hash"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(
        df, threshold, text_col, id_col, n, round_to=round_to
    )
    return exact.join(cand, ["a", "b"], "left_semi").orderBy("a", "b")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document: per-shingle xxhash64, bitwise
    majority vote across shingles (``bits`` conditional-sum aggregates,
    all JVM-side).  Near-dups have small hamming distance."""
    g = shingles(df, text_col, id_col, n)
    h = F.xxhash64("gram")
    votes = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = g.groupBy("id").agg(*votes)
    sig = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return agg.select("id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs with hamming(simhash) ≤ max_hamming.
    Banding on 16-bit slices: any pair within hamming ≤ bands-1 shares
    at least one exact band (pigeonhole), so the join key is a band
    slice, not the full n² cross product."""
    s = simhash(df, text_col, id_col, n)
    width = 64 // bands
    mask = (1 << width) - 1
    banded = s.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.shiftright("simhash", i * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", "b.band_id", "b.band_val")
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_id", "band_val"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("a"),
            F.col("y.id").alias("b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
    )
