"""Edit-distance (fuzzy) string join — entity resolution at corpus
scale: near-identical titles, author strings, product names, URLs.

Beyond-reference training-data-pipeline operator (the reference
deduplicates only on exact keys, services/api/src/repository.ts; the
near-dup family here covers token-level similarity — this operator
covers CHARACTER-level edits, the complement for short strings where
one typo flips every shingle).

Spark-first shape (Gravano et al., VLDB 2001 — approximate string
joins in a relational engine):

1. **q-gram signature**: each padded string of length L yields
   L + q − 1 positional character q-grams (pad ``q−1`` sentinel chars
   on both ends). Pure column expressions: ``sequence`` + ``substring``
   inside a ``transform`` — no UDF.
2. **count-filtered candidates**: ``ed(s, t) ≤ d`` implies the padded
   q-gram multisets share ≥ max(Ls, Lt) + q − 1 − d·q grams. Explode →
   equi-join on ``xxhash64(gram)`` → count matches per pair → keep
   pairs meeting the bound. One shuffle on the gram hash, one on the
   pair key; both narrow.
3. **exact rescore**: ``levenshtein(s, t) ≤ d`` — Spark's built-in
   (JVM codegen, no Python) makes false positives free to kill.

Recall: exact whenever the count bound is positive, i.e.
``max(Ls, Lt) + q − 1 > d·q`` (e.g. q=3, d=2: strings of length ≥ 4).
Below that, two strings can share zero q-grams yet be within d edits —
such ultra-short outliers are the documented exclusion (join them
exactly, or with a smaller q). The bound — not just "some overlap" —
is what keeps candidate volume near-linear at 100 TB: a high-frequency
gram ('ing') alone cannot qualify a pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Sentinel padding characters (outside normal text alphabets).
_PAD_L = "\x01"
_PAD_R = "\x02"


def qgram_array(col: Column, q: int = 3) -> Column:
    """Array of the padded positional q-grams of ``col`` (lowercased).
    A string of length L yields exactly L + q − 1 grams."""
    padded = F.concat(
        F.lit(_PAD_L * (q - 1)), F.lower(col), F.lit(_PAD_R * (q - 1))
    )
    n = F.length(padded) - (q - 1)
    return F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(q)))


def _grams(df: DataFrame, id_col: str, on: str, q: int, side: str) -> DataFrame:
    s = F.lower(F.col(on))
    padded = F.concat(F.lit(_PAD_L * (q - 1)), s, F.lit(_PAD_R * (q - 1)))
    return (
        df.select(
            F.col(id_col).alias(f"{side}_id"),
            s.alias(f"{side}_s"),
            F.length(s).alias(f"{side}_len"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(padded) - (q - 1)),
                    lambda i: padded.substr(i, F.lit(q)),
                )
            ).alias("gram"),
        )
        # multiset semantics via per-string occurrence rank: the k-th
        # copy of a gram on one side can only match the k-th copy on
        # the other, so shared-gram COUNTS are true multiset
        # intersections (plain distinct would overcount repeats)
        .groupBy(f"{side}_id", f"{side}_s", f"{side}_len", "gram")
        .agg(F.count("*").alias(f"{side}_n"))
        .withColumn("gh", F.xxhash64("gram"))
        .drop("gram")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_dist: int = 2,
    q: int = 3,
    left_id: str = "l_id",
    right_id: str = "r_id",
) -> DataFrame:
    """Pairs (l_id, r_id, l_val, r_val, edit_distance) with
    ``levenshtein ≤ max_dist``, candidate-filtered by the q-gram count
    bound so the exact rescore never sees the cross product. Both
    inputs need a unique id column (``left_id`` / ``right_id``) and the
    join string in ``on``. Self-join: pass the same frame twice and
    drop the diagonal downstream."""
    lg = _grams(left, left_id, on, q, "l")
    rg = _grams(right, right_id, on, q, "r")
    shared = (
        lg.join(rg, "gh")
        .withColumn("m", F.least("l_n", "r_n"))
        .groupBy("l_id", "r_id", "l_s", "r_s", "l_len", "r_len")
        .agg(F.sum("m").alias("shared"))
    )
    bound = F.greatest("l_len", "r_len") + F.lit(q - 1) - F.lit(max_dist * q)
    cands = shared.filter(F.col("shared") >= F.greatest(F.lit(1), bound))
    return (
        cands.withColumn("edit_distance", F.levenshtein("l_s", "r_s"))
        .filter(F.col("edit_distance") <= max_dist)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            F.col("l_s").alias("l_val"),
            F.col("r_s").alias("r_val"),
            "edit_distance",
        )
    )


def fuzzy_dedup_keys(
    df: DataFrame, on: str, id_col: str, max_dist: int = 2, q: int = 3
) -> DataFrame:
    """Self fuzzy-join as canonical (a < b) near-duplicate KEY pairs —
    the character-level complement of the MinHash document pairs;
    feed into components.connected_components for cluster collapse."""
    lhs = df.select(F.col(id_col).alias("__fza"), on)
    rhs = df.select(F.col(id_col).alias("__fzb"), on)
    pairs = fuzzy_join(
        lhs, rhs, on, max_dist=max_dist, q=q, left_id="__fza", right_id="__fzb"
    )
    # the self-join emits both orientations plus the diagonal: keep a < b
    return pairs.filter(F.col("__fza") < F.col("__fzb")).select(
        F.col("__fza").alias("a"), F.col("__fzb").alias("b"), "edit_distance"
    )
