"""Temporal joins Spark lacks natively: as-of join and range join.

Both named in the engine's custom-operator contract (as-of joins for
re-crawl attribution / snapshot lookups over ``warc_ts``; range joins
for interval containment) and both implemented as compositions of
existing DataFrame ops — no Python in the hot path, no per-key loops.

As-of join, the scalable shape
------------------------------
The naive plans are all wrong at scale: an inequality theta-join
explodes to a broadcast-nested-loop cartesian; a per-key
``applyInPandas`` ships both tables to Python. The right plan is the
UNION + WINDOW trick: tag both inputs, union them (schema-aligned
structs), and take ``last(payload, ignorenulls=True)`` over a window
partitioned by key and ordered by (ts, side) — every left row sees
exactly the latest right row at or before it. ONE shuffle on the join
key, linear in |left| + |right|, and Catalyst handles skew via AQE like
any other window. This is the classic log-merge formulation of as-of
(what kdb/Flink/QuestDB do natively), expressed in vanilla Spark.

Range join, the scalable shape
------------------------------
Intervals and points are both mapped to fixed-width buckets (intervals
explode to every bucket they touch); the join becomes an EQUI-join on
bucket id with an exact residual filter. Bucket width trades replication
(long intervals touch many buckets) against bucket selectivity — pick it
near the median interval length. Never a cartesian, never an inequality
join.
"""
from __future__ import annotations

from typing import List, Union

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["asof_join", "range_join", "time_rollup", "GRANULARITY_CHAIN"]


def asof_join(left: DataFrame, right: DataFrame,
              on: Union[str, List[str]],
              left_ts: str = "ts", right_ts: str = "ts",
              direction: str = "backward",
              tolerance: str = None,
              tiebreak: str = None,
              rsuffix: str = "_right",
              hub_bucket_width: float = None) -> DataFrame:
    """For every left row, the single matching right row per key:
    ``direction='backward'`` -> latest right with right_ts <= left_ts;
    ``'forward'`` -> earliest right with right_ts >= left_ts.

    Left-join semantics: unmatched left rows keep NULL right columns.
    ``tolerance`` (an SQL interval string, e.g. ``'30 minutes'``) voids
    matches farther than that from the left timestamp. ``tiebreak``
    names a right column deciding ties among equal right_ts rows per key
    (max wins backward, min wins forward); without it ties are broken
    arbitrarily (Spark sort instability), so pass one whenever right_ts
    is not unique per key. Right columns (except the keys) come back
    suffixed with ``rsuffix`` when they collide with left names.

    Plan shape: one Exchange on the key columns + one window sort — see
    module docstring. Equal timestamps match inclusively (the right row
    sorts before the left row at the same instant).

    Skew ceiling (measured, BENCH/SKEW.md): AQE splits skewed JOIN
    partitions but NOT window partitions, so by default a hub key's
    whole timeline sorts serially in one task (90%-one-key = 2.5x
    uniform wall at 2M rows).

    ``hub_bucket_width`` (opt-in, round-6) is the mitigation: with a
    width W in the timestamp's own units (timestamps are cast to epoch
    seconds), the window partitions by (key, floor(ts/W)) — a hub key's
    timeline splits across its time buckets and sorts in parallel. A
    left row missing an in-bucket match takes the carry-in: the best
    right payload of any EARLIER bucket (later for forward), computed
    over per-(key, bucket) summary rows — bucket-count-sized, never
    timeline-sized — and attached by an ordinary (key, bucket) join
    (which AQE *can* skew-split). Results are identical to the default
    path (equality-tested incl. ties and unmatched rows) with one
    caveat: with ``direction='forward'`` a NULL-valued ``tiebreak``
    column is not supported under bucketing (the carry aggregate cannot
    reproduce desc_nulls_first ordering); pass a non-null tiebreak.
    Pick W near the span that holds a few thousand rows of the hottest
    key.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', "
                         f"got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} missing from an input")

    pay_cols = [c for c in right.columns if c not in keys]
    out_names = {c: (c + rsuffix if c in left.columns else c)
                 for c in pay_cols}

    asc = direction == "backward"
    tb = (F.col(tiebreak) if tiebreak is not None
          else F.lit(0))
    # SQL join semantics: equality never matches NULL keys. The window
    # partitions NULL keys together, so NULL-key right rows must be
    # dropped (NULL-key left rows then sit in a right-free partition and
    # come back unmatched, as a left join would return them).
    for k in keys:
        right = right.filter(F.col(k).isNotNull())
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        tb.alias("_tb"),
        F.lit(1).alias("_is_right"),
        F.struct(*[F.col(c).alias(c) for c in pay_cols]).alias("_pay"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{f.name}`:{f.dataType.simpleString()}"
                for f in left.schema.fields) + ">").alias("_lrow"))
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(r_side.schema["_tb"].dataType).alias("_tb"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r_side.schema["_pay"].dataType).alias("_pay"),
        F.struct(*[F.col(c).alias(c) for c in left.columns]).alias("_lrow"))

    # sort so that, scanning toward the left row, the BEST right row is
    # the last non-null payload: backward = ts asc (ties: right first =
    # inclusive match, bigger tiebreak later = wins); forward = mirror
    order = ([F.col("_ts").asc(), F.col("_is_right").desc(),
              F.col("_tb").asc_nulls_first()] if asc else
             [F.col("_ts").desc(), F.col("_is_right").desc(),
              F.col("_tb").desc_nulls_first()])
    u = r_side.unionByName(l_side)
    if hub_bucket_width is None:
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = (u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w))
               .filter(F.col("_is_right") == 0))
    else:
        if hub_bucket_width <= 0:
            raise ValueError(f"hub_bucket_width must be > 0, "
                             f"got {hub_bucket_width}")
        u = u.withColumn(
            "_bkt", F.floor(F.col("_ts").cast("double")
                            / F.lit(float(hub_bucket_width))).cast("long"))
        # in-bucket pass: same window, partitioned by (key, BUCKET) —
        # a hub key's timeline now sorts in parallel across its buckets
        wb = (Window.partitionBy(*keys, "_bkt").orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        lefts = (u.withColumn("_m0", F.last("_pay", ignorenulls=True)
                              .over(wb))
                 .filter(F.col("_is_right") == 0))
        # carry-in: one summary row per (key, bucket) holding the
        # bucket's best right payload; markers for every left bucket
        # sort BEFORE their bucket's summary so the running carry sees
        # strictly-earlier buckets only
        best = (F.max_by("_pay", F.struct("_ts", "_tb")) if asc
                else F.min_by("_pay", F.struct("_ts", "_tb")))
        per_b = (u.filter(F.col("_is_right") == 1)
                 .groupBy(*keys, "_bkt")
                 .agg(best.alias("_blast"))
                 .withColumn("_is_sum", F.lit(1)))
        markers = (lefts.select(*keys, "_bkt").distinct()
                   .withColumn("_blast",
                               F.lit(None).cast(per_b.schema["_blast"]
                                                .dataType))
                   .withColumn("_is_sum", F.lit(0)))
        bkt_ord = F.col("_bkt").asc() if asc else F.col("_bkt").desc()
        wc = (Window.partitionBy(*keys)
              .orderBy(bkt_ord, F.col("_is_sum").asc())
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = (per_b.unionByName(markers)
                 .withColumn("_carry",
                             F.last("_blast", ignorenulls=True).over(wc))
                 .filter(F.col("_is_sum") == 0)
                 .select(*keys, "_bkt", "_carry"))
        out = (lefts.join(carry, keys + ["_bkt"], "left")
               .withColumn("_m", F.coalesce("_m0", "_carry")))
    if tolerance is not None:
        bound = (F.col("_ts") - F.expr(f"INTERVAL {tolerance}") if asc
                 else F.col("_ts") + F.expr(f"INTERVAL {tolerance}"))
        in_tol = (F.col("_m")[right_ts] >= bound if asc
                  else F.col("_m")[right_ts] <= bound)
        out = out.withColumn(
            "_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_m")[c].alias(out_names[c]) for c in pay_cols])


def range_join(points: DataFrame, intervals: DataFrame,
               point_col: str, start_col: str, end_col: str,
               bucket_width: int,
               keys: Union[str, List[str]] = None,
               how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point < end`` (numeric or epoch-seconds columns) — and
    equal ``keys``, when given — as an equi-join on (keys, fixed-width
    bucket) plus an exact residual filter.

    ``bucket_width`` is in the columns' own units; intervals explode to
    ``(end - start) / bucket_width + 1`` bucket rows (pick the width near
    the median interval length — see module docstring). ``how='inner'``
    keeps matches only; ``'left'`` keeps point rows without any interval
    too (NULL interval columns). Output: all point columns + the
    interval columns not shared as keys (caller disambiguates other
    name collisions beforehand).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = ([keys] if isinstance(keys, str) else list(keys or []))
    p_bkt = F.floor(F.col(point_col) / bucket_width)
    i_first = F.floor(F.col(start_col) / bucket_width)
    # end is exclusive: the last touched bucket is the one holding the
    # greatest value < end
    i_last = F.floor((F.col(end_col) - F.lit(1)) / bucket_width)
    ival_cols = [c for c in intervals.columns if c not in keys]
    # explicit aliases: points and intervals may derive from the SAME scan
    # (self-join), where bare df[col] references collapse to trivially-true
    # predicates after Spark's relation deduplication
    ivals = (intervals
             .filter(F.col(end_col) > F.col(start_col))
             .withColumn("_bkt", F.explode(F.sequence(i_first, i_last)))
             .alias("_iv"))
    pts = points.withColumn("_bkt", p_bkt.cast("long")).alias("_pt")
    cond = (F.col("_pt._bkt") == F.col("_iv._bkt"))
    for k in keys:
        cond = cond & (F.col(f"_pt.{k}") == F.col(f"_iv.{k}"))
    cond = (cond & (F.col(f"_iv.{start_col}") <= F.col(f"_pt.{point_col}"))
            & (F.col(f"_pt.{point_col}") < F.col(f"_iv.{end_col}")))
    # 'left' is ONE left outer join on the same condition (NULL-padded
    # misses for free) rather than inner + left_anti, which would scan
    # and shuffle both sides — incl. the exploded interval buckets —
    # twice. No dedup needed: a point maps to exactly one bucket, so
    # each (point, interval) pair meets at most once.
    joined = pts.join(ivals, cond, how)
    return joined.select(*[F.col(f"_pt.{c}") for c in points.columns],
                         *[F.col(f"_iv.{c}") for c in ival_cols])


GRANULARITY_CHAIN = ("minute", "hour", "day", "week", "month", "year")


def time_rollup(df: DataFrame, ts_col: str, value_col: str,
                granularities=("minute", "hour", "day"),
                persist: bool = True) -> DataFrame:
    """Hypertable-style continuous aggregate: (granularity, bucket_ts,
    n_rows, sum_val) at every requested granularity in one pass.

    The scale shape is HIERARCHICAL REUSE — the corpus is scanned and
    shuffled ONCE into finest-granularity partials; every coarser level
    re-aggregates the previous level's partials (minute -> hour rolls up
    60 rows per bucket, not the raw corpus). A 100 TB event table pays
    one wide shuffle; the rollup chain afterwards is dimension-sized.
    This is exactly how TimescaleDB continuous aggregates / Druid rollup
    segments maintain multi-resolution views.

    Reuse must be PHYSICAL, not just structural: Spark does not dedupe
    common subplans across the output union's branches, so each level is
    persisted (``persist=False`` to opt out and recompute — only sane
    when the input itself is a cached/cheap relation). The cached
    partials are bucket-count-sized, not corpus-sized. The alternative
    single-pass shape (grouping sets over the raw table) shuffles
    len(granularities) x the corpus through one exchange — strictly
    worse whenever the input is bigger than the finest bucket count.

    ``value_col`` must be integer-valued (cents-style): integer partial
    sums re-aggregate exactly at every level on any engine, where double
    sums would drift by summation order. ``granularities`` must be a
    strictly-coarsening subsequence of ``GRANULARITY_CHAIN``.
    """
    gran = list(granularities)
    chain_pos = [GRANULARITY_CHAIN.index(g) for g in gran
                 if g in GRANULARITY_CHAIN]
    if len(chain_pos) != len(gran) or sorted(chain_pos) != chain_pos \
            or len(set(chain_pos)) != len(chain_pos) or not gran:
        raise ValueError(
            f"granularities must be a strictly-coarsening subsequence of "
            f"{GRANULARITY_CHAIN}, got {tuple(gran)}")
    if "week" in gran[:-1]:
        # ISO weeks do NOT nest inside months/years: date_trunc('month')
        # of a week bucket attributes boundary weeks to the wrong month
        # (e.g. Sun 2026-02-01 lives in the week of Mon 2026-01-26, which
        # a week->month rollup would count into January)
        raise ValueError(
            "granularities: 'week' must be the last level — weeks do not "
            "nest inside coarser calendar units, so rolling week partials "
            "up to month/year misattributes boundary weeks")

    level = (df.groupBy(F.date_trunc(gran[0], F.col(ts_col))
                        .alias("bucket_ts"))
             .agg(F.count("*").cast("long").alias("n_rows"),
                  F.sum(value_col).cast("long").alias("sum_val")))
    if persist and len(gran) > 1:
        level = level.persist()
    out = level.select(F.lit(gran[0]).alias("granularity"),
                       "bucket_ts", "n_rows", "sum_val")
    for i, g in enumerate(gran[1:], start=1):
        level = (level.groupBy(F.date_trunc(g, F.col("bucket_ts"))
                               .alias("bucket_ts"))
                 .agg(F.sum("n_rows").cast("long").alias("n_rows"),
                      F.sum("sum_val").cast("long").alias("sum_val")))
        if persist and i < len(gran) - 1:
            level = level.persist()
        out = out.unionByName(
            level.select(F.lit(g).alias("granularity"),
                         "bucket_ts", "n_rows", "sum_val"))
    return out
