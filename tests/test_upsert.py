"""Changelog-application laws: python-fold oracle equality on randomized
changelogs, idempotence, composition, delete semantics, SCD2 interval
integrity + point-in-time snapshots, single-shuffle plan."""
import random

from pyspark.sql import functions as F

from transmogrifai_spark.sources.upsert import (
    apply_changes, merge_upsert, scd2_history, snapshot_at)

SCHEMA = "k int, v string, ver long, op string"


def _random_changelog(seed, n=300, keys=25):
    rng = random.Random(seed)
    rows = []
    for ver in range(1, n + 1):
        k = rng.randrange(keys)
        op = "D" if rng.random() < 0.15 else rng.choice(["I", "U"])
        rows.append((k, f"v{ver}", ver, op))
    return rows


def _fold(base_rows, change_rows):
    """Driver-side oracle: fold the changelog over a dict in version order."""
    state = {k: (v, ver) for k, v, ver, _ in base_rows}
    for k, v, ver, op in sorted(change_rows, key=lambda r: r[2]):
        cur = state.get(k)
        if cur is not None and cur[1] > ver:
            continue  # stale change loses to a newer base/state version
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = (v, ver)
    return sorted((k, v, ver) for k, (v, ver) in state.items())


def test_apply_changes_matches_fold_oracle(spark):
    for seed in [1, 2, 3]:
        changes = _random_changelog(seed)
        base_rows = [(k, f"b{k}", 0, "U") for k in range(10)]
        base = spark.createDataFrame(base_rows, SCHEMA).drop("op")
        ch = spark.createDataFrame(changes, SCHEMA)
        got = sorted(tuple(r) for r in
                     apply_changes(base, ch, ["k"], "ver", "op").collect())
        assert got == _fold(base_rows, changes), seed


def test_apply_changes_is_idempotent(spark):
    changes = _random_changelog(7)
    base = spark.createDataFrame([(k, f"b{k}", 0, "U") for k in range(10)],
                                 SCHEMA).drop("op")
    ch = spark.createDataFrame(changes, SCHEMA)
    once = apply_changes(base, ch, ["k"], "ver", "op")
    twice = apply_changes(once, ch, ["k"], "ver", "op")
    assert sorted(map(tuple, once.collect())) == \
        sorted(map(tuple, twice.collect()))


def test_apply_changes_composes(spark):
    changes = _random_changelog(11, n=400)
    c1, c2 = changes[:200], changes[200:]
    base = spark.createDataFrame([(k, f"b{k}", 0, "U") for k in range(10)],
                                 SCHEMA).drop("op")
    mk = lambda rows: spark.createDataFrame(rows, SCHEMA)
    stepwise = apply_changes(
        apply_changes(base, mk(c1), ["k"], "ver", "op"),
        mk(c2), ["k"], "ver", "op")
    allatonce = apply_changes(base, mk(changes), ["k"], "ver", "op")
    assert sorted(map(tuple, stepwise.collect())) == \
        sorted(map(tuple, allatonce.collect()))


def test_merge_upsert_no_op_column(spark):
    base = spark.createDataFrame([(1, "a", 1), (2, "b", 1)], "k int, v string, ver long")
    upd = spark.createDataFrame([(2, "b2", 5), (3, "c", 2)], "k int, v string, ver long")
    got = sorted(map(tuple, merge_upsert(base, upd, ["k"], "ver").collect()))
    assert got == [(1, "a", 1), (2, "b2", 5), (3, "c", 2)]


def test_apply_changes_single_shuffle(spark):
    base = spark.createDataFrame([(1, "a", 1)], "k int, v string, ver long")
    ch = spark.createDataFrame([(1, "a2", 2, "U")], SCHEMA)
    plan = apply_changes(base, ch, ["k"], "ver", "op") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_scd2_intervals_and_snapshot(spark):
    rows = [
        (1, "a1", 10, "I"), (1, "a2", 20, "U"), (1, "gone", 30, "D"),
        (1, "a3", 40, "I"),
        (2, "b1", 15, "I"), (2, "b2", 25, "U"),
    ]
    hist = scd2_history(spark.createDataFrame(rows, SCHEMA),
                        ["k"], "ver", "op")
    h = {(r["k"], r["v"]): (r["valid_from"], r["valid_to"], r["is_current"])
         for r in hist.collect()}
    assert h[(1, "a1")] == (10, 20, False)
    assert h[(1, "a2")] == (20, 30, False)          # closed by the delete
    assert h[(1, "a3")][0] == 40 and h[(1, "a3")][2] is True
    assert h[(2, "b2")][2] is True
    assert ("gone" not in {v for _, v in h})        # deletes emit no row
    # every interval is non-empty and half-open
    for vf, vt, _ in h.values():
        assert vf < vt
    # point-in-time views
    at25 = sorted((r["k"], r["v"]) for r in
                  snapshot_at(hist, 25).collect())
    assert at25 == [(1, "a2"), (2, "b2")]
    at35 = sorted((r["k"], r["v"]) for r in
                  snapshot_at(hist, 35).collect())
    assert at35 == [(2, "b2")]                      # key 1 deleted at 30


def test_scd2_snapshot_matches_apply_changes(spark):
    """Time-travel consistency: snapshot_at(history, t) == apply_changes of
    the prefix of the changelog up to t (on a keyless base)."""
    changes = _random_changelog(13, n=200)
    ch = spark.createDataFrame(changes, SCHEMA)
    empty = spark.createDataFrame([], "k int, v string, ver long")
    hist = scd2_history(ch, ["k"], "ver", "op")
    for t in [50, 120, 200]:
        via_hist = sorted((r["k"], r["v"]) for r in
                          snapshot_at(hist, t).collect())
        prefix = ch.filter(F.col("ver") <= t)
        via_apply = sorted((r["k"], r["v"]) for r in
                           apply_changes(empty, prefix, ["k"], "ver", "op")
                           .collect())
        assert via_hist == via_apply, t


def test_snapshot_diff_roundtrip_and_ops(spark):
    from transmogrifai_spark.sources.upsert import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 2), (4, "d", 2)],
        "k int, v string, ver long")
    new = spark.createDataFrame(
        [(1, "a", 1),            # unchanged -> no row
         (2, "b2", 5),           # updated
         (4, "d", 2),            # unchanged
         (5, "e", 3)],           # inserted; 3 deleted
        "k int, v string, ver long")
    diff = snapshot_diff(old, new, ["k"], "ver")
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 3: "D", 5: "I"}
    # delete row carries old's ver, payload nulled
    d3 = diff.filter("k = 3").collect()[0]
    assert d3["ver"] == 2 and d3["v"] is None
    # roundtrip law: apply the diff to old -> exactly new
    got = sorted(map(tuple, apply_changes(old, diff, ["k"], "ver", "op")
                 .collect()))
    want = sorted(map(tuple, new.collect()))
    assert got == want


def test_snapshot_diff_roundtrip_randomized(spark):
    from transmogrifai_spark.sources.upsert import snapshot_diff

    for seed in [21, 22]:
        ch = _random_changelog(seed, n=250)
        empty = spark.createDataFrame([], "k int, v string, ver long")
        mk = lambda rows: spark.createDataFrame(rows, SCHEMA)
        s1 = apply_changes(empty, mk(ch[:125]), ["k"], "ver", "op")
        s2 = apply_changes(s1, mk(ch[125:]), ["k"], "ver", "op")
        diff = snapshot_diff(s1, s2, ["k"], "ver")
        got = sorted(map(tuple,
                         apply_changes(s1, diff, ["k"], "ver", "op")
                         .collect()))
        assert got == sorted(map(tuple, s2.collect())), seed


def test_apply_changes_schema_evolution(spark):
    base = spark.createDataFrame([(1, "a", 1), (2, "b", 2)],
                                 "k int, v string, ver long")
    # changelog adds a 'score' column
    ch = spark.createDataFrame([(2, "b2", 5, 0.9, "U"), (3, "c", 6, 0.5, "I")],
                               "k int, v string, ver long, score double, op string")
    got = sorted(map(tuple, apply_changes(
        base, ch, ["k"], "ver", "op", allow_schema_evolution=True)
        .collect()))
    assert got == [(1, "a", 1, None), (2, "b2", 5, 0.9), (3, "c", 6, 0.5)]
    # without the flag, unknown columns in changes are simply not selected
    got2 = sorted(map(tuple, apply_changes(base, ch, ["k"], "ver", "op")
                  .collect()))
    assert got2 == [(1, "a", 1), (2, "b2", 5), (3, "c", 6)]
