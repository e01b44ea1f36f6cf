"""Range / interval join — the classic operator Spark lacks natively
(SparkSQL compiles ``point BETWEEN start AND end`` joins to
BroadcastNestedLoop or a cartesian filter; both die at scale).

Re-expressed Spark-first as a *bucketized equi-join*: quantize the join
domain into fixed-width buckets, explode each interval to every bucket
it overlaps, map each point to its single bucket, equi-join on bucket
id, then refine with the exact range predicate. The join shuffles on an
8-byte bucket key — linear in points + interval-bucket expansions,
never quadratic — and Catalyst treats it as an ordinary equi-join (AQE,
skew splitting, broadcast-if-small all apply).

Cost model: each interval produces ``len/bucket_width + 1`` rows, each
point exactly 1, and every matching (point, interval) pair meets in
exactly one bucket (the point's), so no post-join dedup is needed.
Pick ``bucket_width`` near the median interval length: too small blows
up the interval expansion, too large turns the refine filter into the
real join. An interval 1000× the width still only costs 1001 expansion
rows — degradation is linear and local, not a hot key.

Reference counterpart: none (the reference has no range join); this is
part of the beyond-reference training/analytics surface, same family as
operators/asof.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
    closed: str = "both",
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Join each row of ``points`` to every row of ``intervals`` whose
    [start, end] range contains the point (containment sense set by
    ``closed``: 'both' ⇒ start ≤ p ≤ end, 'left' ⇒ start ≤ p < end,
    'right' ⇒ start < p ≤ end, 'neither' ⇒ strict both sides).

    ``how`` is 'inner' or 'left' ('left' keeps pointless points with
    NULL interval columns — the enrichment shape). For ``how='inner'``
    the three join columns may share names across the frames (the
    refine predicate binds to each source DataFrame, so lineage
    disambiguates; the output then carries both same-named columns and
    the caller disambiguates downstream). Any OTHER overlap, and ANY
    overlap under ``how='left'`` (whose union-by-name rebuild needs
    unique names), is rejected with a clear error — alias before
    joining.

    Numeric and timestamp domains are both supported; timestamps are
    quantized on epoch microseconds, so ``bucket_width`` is then in
    MICROSECONDS (e.g. 3_600_000_000 for 1-hour buckets).

    Set ``broadcast_intervals=True`` for the common enrichment shape —
    a huge point table against a small interval table: the exploded
    interval side then broadcasts and the points never shuffle at all.
    Without the hint Catalyst sizes both sides itself, which is right
    when the two tables are comparable, but an interval frame built
    from an in-memory relation has unknown stats and can make the
    planner broadcast the POINTS side instead (measured 4× slower on a
    100k-event probe).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed={closed!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")

    overlap = set(points.columns) & set(intervals.columns)
    join_cols = {point_col, start_col, end_col}
    if how == "left" and overlap:
        raise ValueError(
            f"how='left' needs disjoint column names (shared: {sorted(overlap)}) "
            "— alias before joining"
        )
    if overlap - join_cols:
        raise ValueError(
            f"non-join columns shared between frames: {sorted(overlap - join_cols)} "
            "— alias before joining"
        )

    def num(df: DataFrame, name: str) -> Column:
        # bind to the source DataFrame (not F.col(name)): with
        # point/interval column names colliding, a name-based reference
        # in the post-join refine predicate raises AMBIGUOUS_REFERENCE,
        # while lineage-bound attributes resolve (round-4 advice)
        c = df[name]
        if str(df.schema[name].dataType).lower().startswith("timestamp"):
            return F.unix_micros(c).cast("double")
        return c.cast("double")

    p_num = num(points, point_col)
    s_num = num(intervals, start_col)
    e_num = num(intervals, end_col)
    w = float(bucket_width)

    pts = points.withColumn(_BUCKET, F.floor(p_num / w).cast("long"))
    ivs = intervals.withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(s_num / w).cast("long"), F.floor(e_num / w).cast("long")
            )
        ),
    )

    if broadcast_intervals:
        ivs = F.broadcast(ivs)
    lo_ok = s_num <= p_num if closed in ("both", "left") else s_num < p_num
    hi_ok = p_num <= e_num if closed in ("both", "right") else p_num < e_num
    # the refine predicate references start/end/point by name; the
    # equi-join key keeps the pair-up linear, the predicate keeps it exact
    joined = pts.join(ivs, [_BUCKET], "inner").filter(lo_ok & hi_ok).drop(_BUCKET)
    if how == "inner":
        return joined
    # left: anti-join the matched points back in with NULL right columns
    matched_keys = joined.select(*points.columns)
    unmatched = pts.drop(_BUCKET).exceptAll(matched_keys)
    for c in ivs.columns:
        if c != _BUCKET and c not in points.columns:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(ivs.schema[c].dataType)
            )
    return joined.unionByName(unmatched)
