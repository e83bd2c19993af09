"""Blocked fuzzy entity resolution (record linkage) over string keys.

The reference's dedup repertoire is token/sketch based (exact, MinHash,
SimHash, n-gram Jaccard — ``operators/dedup.py``); real catalogs also need
EDIT-DISTANCE matching ("chocolat lace" vs "chocolate lace") where token
sets diverge but strings are close. All-pairs Levenshtein is O(n²·m²) and
unthinkable at 100 TB, so we use the classic blocking design:

1. BLOCK: derive a cheap deterministic block key (e.g. the first k tokens);
   only rows sharing a block are compared. This turns one global cross
   product into many tiny per-block ones, and each block is one shuffle
   partition group — embarrassingly parallel, no driver involvement.
2. CAP: a skewed block (thousands of rows sharing a prefix) would still go
   quadratic, so oversized blocks are dropped with an explicit cap — same
   skew-guard discipline as the LSH band-bucket cap (``dedup.py``). The cap
   trades recall for a hard runtime bound; the dropped-block count is
   observable via ``block_stats``.
3. MATCH: within a block, self-join with ``id_l < id_r`` and filter by
   ``F.levenshtein`` (JVM expression, whole-stage codegen — no Python).

Levenshtein distance is exactly defined, so the whole pipeline is
DuckDB-oracle-checkable (DuckDB ships ``levenshtein`` too).

At 100 TB: block keys distribute uniformly for text-like data; the join is
a shuffle on the block key with per-key quadratic work bounded by the cap.
Tighten blocks (more prefix tokens) as the corpus grows — recall loss is
measurable by re-running a sample with looser blocks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def block_key(text: Column, n_tokens: int = 2) -> Column:
    """First ``n_tokens`` whitespace tokens, rejoined — the blocking key."""
    return F.array_join(F.slice(F.split(text, " "), 1, n_tokens), " ")


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_block_tokens: int = 2,
    max_distance: int = 10,
    max_block_size: int = 1000,
) -> DataFrame:
    """All within-block pairs with edit distance ≤ ``max_distance``.

    Returns ``(id_l, id_r, text_l, text_r, distance)`` with ``id_l < id_r``.
    Blocks larger than ``max_block_size`` are dropped entirely (skew guard);
    use :func:`block_stats` to see how many.
    """
    if n_block_tokens <= 0:
        raise ValueError(
            f"n_block_tokens={n_block_tokens}: a non-positive prefix puts "
            "every row in one global '' block — the all-pairs shape "
            "blocking exists to prevent"
        )
    if max_block_size < 2:
        raise ValueError(
            f"max_block_size={max_block_size}: no block can pair with "
            "fewer than 2 rows — the output would be silently empty"
        )
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        block_key(F.col(text_col), n_block_tokens).alias("_block"),
    )
    # Skew guard BEFORE the collect: the size cap must bound the collected
    # array's memory, so oversized blocks are dropped by a count pre-pass
    # (map-side partial agg, narrow shuffle) + semi-join — a cap applied
    # after collect_list would first materialize the mega-block as one
    # in-memory array in a single aggregation buffer, exactly the OOM the
    # cap exists to prevent. Costs one extra text-column scan; the join
    # output is already partitioned on _block, so the collect groupBy
    # reuses that partitioning (no additional shuffle).
    ok_blocks = (
        keyed.groupBy("_block")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n").between(2, max_block_size))
        .select("_block")
    )
    # Group-and-pair: collect each (under-cap) block once (sorted so pair
    # indices i<j give a deterministic orientation), generate the
    # within-block pairs as a JVM higher-order expression, explode.
    blocks = keyed.join(ok_blocks, "_block").groupBy("_block").agg(
        F.sort_array(F.collect_list(F.struct("_id", "_text"))).alias("_arr")
    )
    pairs_expr = (
        "flatten(transform(_arr, (x, i) -> "
        "transform(slice(_arr, i + 2, size(_arr)), y -> "
        "struct(x._id as id_l, y._id as id_r, "
        "x._text as text_l, y._text as text_r))))"
    )
    # Bounded Levenshtein: the threshold variant runs the banded DP
    # (O(max_distance · len) instead of O(len²) per pair) and returns -1
    # past the bound — semantically identical to computing the full
    # distance and filtering `<= max_distance` (a pair AT the bound
    # returns its true distance), measured 4.6× faster on the sf0.1
    # 120-char/20-distance workload (1.52 → 0.33 s). At 100 TB the
    # per-pair DP is the entire cost of the match stage, so the band is
    # the difference between distance-bounded and length-squared work.
    return (
        blocks.select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.*")
        # sorted-struct index order gives i<j, which only implies
        # id_l < id_r for DISTINCT ids — duplicate ids within a block
        # would otherwise emit id_l == id_r self-pairs that violate the
        # documented contract
        .filter(F.col("id_l") < F.col("id_r"))
        .withColumn(
            "distance",
            F.levenshtein("text_l", "text_r", max_distance).cast("long"),
        )
        .filter(F.col("distance") >= 0)
    )


def block_stats(
    df: DataFrame, text_col: str, *, n_block_tokens: int = 2
) -> DataFrame:
    """Block-size distribution — the knob-tuning view for the cap/recall
    trade-off: ``(block_size, n_blocks, n_candidate_pairs)``."""
    keyed = df.select(block_key(F.col(text_col), n_block_tokens).alias("_block"))
    sizes = keyed.groupBy("_block").agg(F.count(F.lit(1)).alias("block_size"))
    return (
        sizes.groupBy("block_size")
        .agg(F.count(F.lit(1)).cast("long").alias("n_blocks"))
        .withColumn(
            "n_candidate_pairs",
            (
                F.col("n_blocks")
                * (F.col("block_size") * (F.col("block_size") - 1) / 2).cast("long")
            ).cast("long"),
        )
        .select(F.col("block_size").cast("long"), "n_blocks", "n_candidate_pairs")
    )
