"""PassJoin edit-distance join laws: completeness + exactness vs a
brute-force Python DP oracle (random small-alphabet strings incl. empty and
short ones, so the SHORT block and every segment split are exercised),
hot-segment cap subset law, and the no-cartesian plan shape the blocking
exists to guarantee."""
import itertools
import random

import pytest
from pyspark.sql import functions as F

from transmogrifai_spark.sources.similarity_join import (edit_distance_join,
                                                         edit_distance_self_join)
from transmogrifai_spark.util import plan_audit


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _rand_rows(seed, n, alphabet="ab", max_len=8, base=0):
    rng = random.Random(seed)
    return [(base + i, "".join(rng.choice(alphabet)
                               for _ in range(rng.randint(0, max_len))))
            for i in range(n)]


@pytest.mark.parametrize("d", [1, 2, 3])
def test_self_join_equals_brute_force(spark, d):
    rows = _rand_rows(7, 60)
    df = spark.createDataFrame(rows, "id long, txt string")
    got = {(r.id1, r.id2, r.dist)
           for r in edit_distance_self_join(df, "id", "txt", d).collect()}
    want = {(i, j, _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= d}
    assert got == want


@pytest.mark.parametrize("d", [1, 2])
def test_two_table_join_equals_brute_force(spark, d):
    rows = _rand_rows(11, 50)
    right = _rand_rows(13, 40, base=1000)
    ldf = spark.createDataFrame(rows, "id long, txt string")
    rdf = spark.createDataFrame(right, "rid long, rtxt string")
    got = {(r["id"], r["rid"], r["dist"])
           for r in edit_distance_join(ldf, rdf, "id", "txt",
                                       "rid", "rtxt", d).collect()}
    want = {(i, j, _lev(a, b)) for (i, a) in rows for (j, b) in right
            if _lev(a, b) <= d}
    assert got == want


def test_unicode_multibyte_chars(spark):
    # char-based (not byte-based) segmentation and distance
    rows = [(0, "héllo"), (1, "hällo"), (2, "hello"), (3, "héllo!"),
            (4, "日本語のテスト"), (5, "日本語のテスロ")]
    df = spark.createDataFrame(rows, "id long, txt string")
    got = {(r.id1, r.id2, r.dist)
           for r in edit_distance_self_join(df, "id", "txt", 1).collect()}
    want = {(i, j, _lev(a, b)) for (i, a), (j, b) in
            itertools.combinations(rows, 2) if _lev(a, b) <= 1}
    assert got == want


def test_hot_segment_cap_yields_subset(spark):
    # constant prefix makes segment 0 hot for equal lengths; the cap must
    # only ever DROP pairs, never invent or mis-score them
    rows = [(i, "PFX" + s) for i, s in _rand_rows(17, 80, max_len=5)]
    df = spark.createDataFrame(rows, "id long, txt string")
    full = {(r.id1, r.id2, r.dist)
            for r in edit_distance_self_join(df, "id", "txt", 2).collect()}
    capped = {(r.id1, r.id2, r.dist)
              for r in edit_distance_self_join(df, "id", "txt", 2,
                                               max_seg_freq=5).collect()}
    assert capped <= full
    assert len(capped) < len(full)  # the cap actually bit on this fixture
    want = {(i, j, _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= 2}
    assert full == want


def test_nulls_ignored_and_bad_dist_rejected(spark):
    df = spark.createDataFrame([(0, "abc"), (1, None), (2, "abd")],
                               "id long, txt string")
    got = edit_distance_self_join(df, "id", "txt", 1).collect()
    assert {(r.id1, r.id2, r.dist) for r in got} == {(0, 2, 1)}
    with pytest.raises(ValueError):
        edit_distance_self_join(df, "id", "txt", 0)


def test_plan_has_no_cartesian_join(spark):
    df = spark.createDataFrame(_rand_rows(23, 30), "id long, txt string")
    out = edit_distance_self_join(df, "id", "txt", 2)
    bad = [f for f in plan_audit(out)
           if f["rule"] in ("cartesian", "python_udf")]
    assert bad == []
