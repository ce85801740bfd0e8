"""As-of join + range join: equality with pandas.merge_asof (the
de-facto reference implementation) and brute-force inequality joins."""
import pandas as pd
import pyspark.sql.functions as F
import pytest

from pysemanticcomplexity_spark import plans
from pysemanticcomplexity_spark.operators.temporal import asof_join, range_join

LEFT = [  # (lid, key, ts)
    (1, "a", 10.0), (2, "a", 20.0), (3, "a", 35.0),
    (4, "b", 5.0), (5, "b", 50.0),
    (6, "c", 7.0),                       # key with no right rows
]
RIGHT = [  # (rid, key, ts, payload)
    (100, "a", 8.0, 1.5), (101, "a", 20.0, 2.5), (102, "a", 30.0, 3.5),
    (103, "b", 40.0, 4.5),
    (104, "d", 1.0, 9.9),                # key with no left rows
]


def _dfs(spark):
    l = spark.createDataFrame(LEFT, "lid long, key string, ts double")
    r = spark.createDataFrame(
        RIGHT, "rid long, key string, ts double, payload double")
    return l, r


def _merge_asof(direction, tolerance=None):
    lp = pd.DataFrame(LEFT, columns=["lid", "key", "ts"]).sort_values("ts")
    rp = pd.DataFrame(
        RIGHT, columns=["rid", "key", "ts", "payload"]).sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="key", direction=direction,
                      tolerance=tolerance, suffixes=("", "_right"))
    return {int(row.lid): (None if pd.isna(row.rid) else int(row.rid),
                           None if pd.isna(row.payload) else row.payload)
            for row in m.itertuples()}


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas_merge_asof(spark, direction):
    l, r = _dfs(spark)
    got = {row["lid"]: (row["rid"], row["payload"])
           for row in asof_join(l, r, on="key",
                                direction=direction).collect()}
    assert got == _merge_asof(direction)
    # exact-timestamp rows match inclusively in both directions
    assert got[2][0] == 101


def test_asof_tolerance_timestamps(spark):
    l = spark.createDataFrame(
        [(1, "a", "2024-01-01 10:00:00"), (2, "a", "2024-01-01 12:00:00")],
        "lid long, key string, ts string").withColumn(
            "ts", F.to_timestamp("ts"))
    r = spark.createDataFrame(
        [(100, "a", "2024-01-01 09:50:00", 1.0)],
        "rid long, key string, ts string, payload double").withColumn(
            "ts", F.to_timestamp("ts"))
    got = {row["lid"]: row["rid"]
           for row in asof_join(l, r, on="key",
                                tolerance="30 minutes").collect()}
    assert got == {1: 100, 2: None}      # 12:00 is 130 min past the click


def test_asof_tiebreak_deterministic(spark):
    l = spark.createDataFrame([(1, "a", 10.0)],
                              "lid long, key string, ts double")
    r = spark.createDataFrame(
        [(100, "a", 10.0, 1.0), (102, "a", 10.0, 3.0), (101, "a", 10.0, 2.0)],
        "rid long, key string, ts double, payload double")
    for _ in range(3):
        row = asof_join(l, r.repartition(5), on="key",
                        tiebreak="rid").collect()[0]
        assert (row["rid"], row["payload"]) == (102, 3.0)   # max rid wins


def test_asof_collision_suffix_and_one_shuffle(spark):
    l, r = _dfs(spark)
    out = asof_join(l, r, on="key")
    assert out.columns == ["lid", "key", "ts", "rid", "ts_right", "payload"]
    assert plans.count_shuffles(out) == 1          # ONE exchange on the key
    assert "CartesianProduct" not in plans.executed_plan(out)


def test_asof_validates(spark):
    l, r = _dfs(spark)
    with pytest.raises(ValueError, match="direction"):
        asof_join(l, r, on="key", direction="sideways")
    with pytest.raises(ValueError, match="missing"):
        asof_join(l, r, on="nope")


# ---------------------------------------------------------------------------
# range join
# ---------------------------------------------------------------------------

POINTS = [(i, "u" if i % 2 else "v", float(i * 3)) for i in range(20)]
IVALS = [(200, "u", 5.0, 20.0), (201, "v", 18.0, 19.0),
         (202, "u", 40.0, 41.0), (203, "w", 0.0, 100.0),
         (204, "v", 30.0, 30.0)]        # empty interval -> never matches


def _brute(keys):
    out = set()
    for pid, pk, p in POINTS:
        for iid, ik, s, e in IVALS:
            if keys and pk != ik:
                continue
            if s <= p < e:
                out.add((pid, iid))
    return out


@pytest.mark.parametrize("width", [1, 7, 1000])
@pytest.mark.parametrize("use_keys", [False, True])
def test_range_join_equals_bruteforce(spark, width, use_keys):
    p = spark.createDataFrame(POINTS, "pid long, key string, p double")
    iv = spark.createDataFrame(IVALS, "iid long, key string, s double, e double")
    if not use_keys:
        iv = iv.drop("key")
    got = {(r["pid"], r["iid"]) for r in
           range_join(p, iv, "p", "s", "e", width,
                      keys="key" if use_keys else None).collect()}
    assert got == _brute(use_keys), (width, use_keys)


def test_range_join_left_keeps_unmatched(spark):
    p = spark.createDataFrame(POINTS, "pid long, key string, p double")
    iv = spark.createDataFrame(
        IVALS, "iid long, key string, s double, e double")
    out = range_join(p, iv, "p", "s", "e", 10, keys="key", how="left")
    rows = out.collect()
    matched = {(r["pid"], r["iid"]) for r in rows if r["iid"] is not None}
    assert matched == _brute(True)
    assert {r["pid"] for r in rows} == {p[0] for p in POINTS}   # all points


def test_range_join_no_cartesian(spark):
    p = spark.createDataFrame(POINTS, "pid long, key string, p double")
    iv = spark.createDataFrame(
        IVALS, "iid long, key string, s double, e double")
    plan = plans.executed_plan(range_join(p, iv, "p", "s", "e", 10,
                                          keys="key"))
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_range_join_validates(spark):
    p = spark.createDataFrame(POINTS, "pid long, key string, p double")
    iv = spark.createDataFrame(
        IVALS, "iid long, key string, s double, e double")
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(p, iv, "p", "s", "e", 0)
    with pytest.raises(ValueError, match="how"):
        range_join(p, iv, "p", "s", "e", 5, how="outer")


# ---------------------------------------------------------------------------
# time rollup
# ---------------------------------------------------------------------------

EVENTS = [
    (1, "2024-01-01 10:00:10", 100), (2, "2024-01-01 10:00:50", 200),
    (3, "2024-01-01 10:59:59", 300), (4, "2024-01-01 11:00:00", 400),
    (5, "2024-01-02 23:30:00", 500),
]


def _events_df(spark):
    from pysemanticcomplexity_spark.operators.temporal import time_rollup
    df = spark.createDataFrame(EVENTS, "id long, ts string, cents long") \
        .withColumn("ts", F.to_timestamp("ts"))
    return time_rollup(df, "ts", "cents")


def test_time_rollup_levels_consistent(spark):
    rows = _events_df(spark).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["granularity"], {})[r["bucket_ts"]] = \
            (r["n_rows"], r["sum_val"])
    # direct expectations
    assert len(by_g["minute"]) == 4           # 10:00 has two events
    assert by_g["minute"][min(by_g["minute"])] == (2, 300)
    assert len(by_g["hour"]) == 3 and len(by_g["day"]) == 2
    # every level re-aggregates to the same totals
    for g, buckets in by_g.items():
        assert sum(n for n, _ in buckets.values()) == len(EVENTS), g
        assert sum(s for _, s in buckets.values()) == 1500, g


def test_time_rollup_hierarchical_reuse_single_wide_shuffle(spark):
    """The raw table is shuffled once (minute level); hour/day aggregate
    the PREVIOUS level's cached partials — one hash exchange per level.
    Cached plans are re-rendered inside every InMemoryRelation block, so
    count DISTINCT exchange plan ids, not string occurrences."""
    import re
    out = _events_df(spark)
    plan = plans.executed_plan(out)
    assert "InMemoryTableScan" in plan        # physical reuse, not recompute
    ids = set(re.findall(r"Exchange hashpartitioning\(.*\[plan_id=(\d+)\]",
                         plan))
    assert len(ids) == 3                      # one per granularity level


def test_time_rollup_validates(spark):
    from pysemanticcomplexity_spark.operators.temporal import time_rollup
    df = spark.createDataFrame(EVENTS, "id long, ts string, cents long")
    for bad in [("hour", "minute"), ("minute", "minute"), (), ("fortnight",)]:
        with pytest.raises(ValueError, match="granularities"):
            time_rollup(df, "ts", "cents", bad)


def test_asof_null_keys_never_match(spark):
    """SQL join semantics: equality never matches NULL keys (the window
    would otherwise group NULL-key rows together and hand the left row a
    NULL-key right payload, diverging from any ASOF JOIN oracle)."""
    l = spark.createDataFrame([(1, None, 10.0), (2, "a", 10.0)],
                              "lid long, key string, ts double")
    r = spark.createDataFrame([(100, None, 5.0, 1.0), (101, "a", 5.0, 2.0)],
                              "rid long, key string, ts double, payload double")
    got = {row["lid"]: row["rid"] for row in asof_join(l, r, on="key").collect()}
    assert got == {1: None, 2: 101}


def test_time_rollup_rejects_week_before_coarser(spark):
    """ISO weeks don't nest in months/years — week must be terminal."""
    from pysemanticcomplexity_spark.operators.temporal import time_rollup
    df = spark.createDataFrame(EVENTS, "id long, ts string, cents long") \
        .withColumn("ts", F.to_timestamp("ts"))
    for bad in [("week", "month"), ("day", "week", "year")]:
        with pytest.raises(ValueError, match="week"):
            time_rollup(df, "ts", "cents", bad)
    # week as the LAST level is fine
    rows = time_rollup(df, "ts", "cents", ("day", "week")).collect()
    assert {r["granularity"] for r in rows} == {"day", "week"}


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_randomized_vs_merge_asof(spark, seed, direction):
    """Randomized differential test: unique-timestamp random tables must
    match pandas.merge_asof exactly in both directions."""
    import numpy as np
    rng = np.random.RandomState(seed)
    keys = ["a", "b", "c", "d"]
    lts = rng.choice(20000, size=120, replace=False)
    rts = rng.choice(20000, size=80, replace=False)
    lrows = [(i, keys[rng.randint(4)], float(lts[i])) for i in range(120)]
    rrows = [(1000 + j, keys[rng.randint(4)], float(rts[j]), float(j))
             for j in range(80)]
    l = spark.createDataFrame(lrows, "lid long, key string, ts double")
    r = spark.createDataFrame(
        rrows, "rid long, key string, ts double, payload double")
    got = {row["lid"]: row["rid"]
           for row in asof_join(l, r, on="key",
                                direction=direction).collect()}

    lp = pd.DataFrame(lrows, columns=["lid", "key", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["rid", "key", "ts", "payload"]) \
        .sort_values("ts")
    m = pd.merge_asof(lp, rp, on="ts", by="key", direction=direction,
                      suffixes=("", "_right"))
    want = {int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
            for row in m.itertuples()}
    assert got == want


def test_asof_hub_bucketed_equals_default(spark):
    """hub_bucket_width (the round-6 skew mitigation) must reproduce the
    default path exactly: matches, ties, unmatched rows, tolerance —
    both directions, several widths (incl. widths splitting mid-run)."""
    import random
    rng = random.Random(11)
    lrows = [(i, f"k{rng.randrange(4)}", float(rng.randrange(0, 300)))
             for i in range(400)]
    rrows = [(1000 + i, f"k{rng.randrange(4)}",
              float(rng.randrange(0, 300)), float(i))
             for i in range(300)]
    left = spark.createDataFrame(lrows, "lid long, key string, ts double")
    right = spark.createDataFrame(
        rrows, "rid long, key string, ts double, payload double")
    for direction in ("backward", "forward"):
        base = asof_join(left, right, on="key", direction=direction,
                         tiebreak="rid").collect()
        want = sorted(map(tuple, base))
        for width in (7.0, 50.0, 1000.0):
            got = asof_join(left, right, on="key", direction=direction,
                            tiebreak="rid",
                            hub_bucket_width=width).collect()
            assert sorted(map(tuple, got)) == want, (direction, width)


def test_asof_hub_bucketed_rejects_bad_width(spark):
    left = spark.createDataFrame([(1, "a", 1.0)],
                                 "lid long, key string, ts double")
    right = spark.createDataFrame([(2, "a", 0.5, 9.0)],
                                  "rid long, key string, ts double, v double")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="hub_bucket_width"):
        asof_join(left, right, on="key", hub_bucket_width=0)
