"""Driver-contract smoke: entry() runs, every queries() entry has a callable,
every oracle key has a matching query (the inverse of the driver's check)."""
import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "spark_entry", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "__spark_entry__.py"))
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(o) >= 20  # oracle coverage floor


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"key", "prediction"} <= set(df.columns)


def test_every_registry_query_runs(spark, sf_dir):
    """Round-3's lesson: driver rows can break while unit tests stay green.
    Execute EVERY queries() entry at sf0.001 — each must build its plan,
    produce a materializable result (count, not collect — cheap), and keep
    Python out of the executed plan (no BatchEvalPython/ArrowEvalPython:
    the whole registry is JVM-side column expressions)."""
    from transmogrifai_spark.util import plan_audit
    # 1-row aggregate-attachment crossJoins (a broadcast of ONE reduced row,
    # the engine's documented pattern for attaching global stats) read as
    # 'cartesian' to the linter; everything else must audit clean of errors
    allowed = {"correlation_stats": {"cartesian"},
               "binary_eval": {"cartesian"},
               # brute-force top-k IS a broadcast nested loop by design:
               # the (tiny) query side broadcasts, the corpus scans once
               "similarity_topk": {"cartesian"},
               # r7: the RRF arm fuses bm25 with brute_force_topk over a
               # 3-query broadcast side — same documented pattern
               "retrieval_indexed": {"cartesian"}}
    failures = {}
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            assert df.count() >= 0
            errs = [f for f in plan_audit(df) if f["severity"] == "error"
                    and f["rule"] not in allowed.get(name, set())]
            assert not errs, f"{name}: {errs}"
        except Exception as e:  # collect all failures, report once
            failures[name] = f"{type(e).__name__}: {str(e)[:300]}"
    assert not failures, failures


def test_bench_headline_queries_resolvable():
    """bench.py is the driver's perf artifact: every HEADLINE name must
    resolve to a registry query or a bench-local override, so a registry
    rename can never turn the bench into a DNF silently."""
    import importlib.util as iu
    spec = iu.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = iu.module_from_spec(spec)
    spec.loader.exec_module(bench)
    # bench-local base-form overrides (BASELINE-comparable shapes; the r9
    # registry re-seat merged conditional_reader/model_selection away, so
    # the bench measures their base functions directly)
    overrides = {"dedup_near_ngram_capped", "similarity_topk",
                 "conditional_reader"}
    q = set(entry_mod.queries())
    for name in bench.HEADLINE:
        assert name in q or name in overrides, name


def test_registry_inside_driver_cap():
    """r8 regression guard: the driver gates only the FIRST 50 registry
    entries; a hash-gated query past position 50 (or a registry past 50 at
    all) silently loses its correctness row. driver_queries raises at
    import time; this pins the contract from the driver's side too."""
    q = list(entry_mod.queries())
    o = set(entry_mod.oracle_sql())
    assert len(q) <= 50, f"registry has {len(q)} entries; driver caps at 50"
    past_cap = [k for i, k in enumerate(q) if i >= 50 and k in o]
    assert not past_cap, f"oracle-gated queries past the cap: {past_cap}"
    # previously-regressed rows must be present and inside the window
    for must in ("loco_insights", "mime_detector"):
        assert must in q[:50] and must in o, must
