"""Shard export laws: deterministic assignment/order, lossless round-trip,
manifest integrity (and that verify_shards actually catches corruption),
directory-level pruning for single-shard reads."""
import glob
import os

from pyspark.sql import functions as F

from transmogrifai_spark.sources.shard_export import (export_shards,
                                                      load_manifest,
                                                      read_shards,
                                                      shard_assignment,
                                                      verify_shards)


def _docs(spark, n=500):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 7 + 1).alias("n_tokens"))


def _bucket(i, seed=42):
    return ((i % 1_000_000 + seed) * 2654435761) % 1_000_000


def test_assignment_matches_python_rule(spark):
    rows = shard_assignment(_docs(spark), "doc_id", 8).collect()
    per_shard = {}
    for r in rows:
        assert r["_shard"] == _bucket(r["doc_id"]) % 8
        per_shard.setdefault(r["_shard"], []).append(r)
    for sid, rs in per_shard.items():
        rs.sort(key=lambda r: r["_rank"])
        assert [r["_rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(_bucket(r["doc_id"]), r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


def test_export_roundtrip_and_manifest(spark, tmp_path):
    path = str(tmp_path / "shards")
    docs = _docs(spark)
    manifest = export_shards(docs, "doc_id", path, 8, token_col="n_tokens")
    back = read_shards(spark, path)
    assert back.count() == 500
    assert {r.doc_id for r in back.select("doc_id").collect()} == set(range(500))
    # manifest counts match both the sidecar and a recount
    assert load_manifest(path) == manifest
    assert sum(s["n_rows"] for s in manifest["shards"].values()) == 500
    assert sum(s["n_tokens"] for s in manifest["shards"].values()) == \
        sum((i % 7) + 1 for i in range(500))
    assert verify_shards(spark, path) == []
    # determinism: a second export elsewhere produces identical triples
    path2 = str(tmp_path / "shards2")
    export_shards(docs, "doc_id", path2, 8, token_col="n_tokens")
    t1 = {(r.doc_id, r["_shard"], r["_rank"]) for r in back.collect()}
    t2 = {(r.doc_id, r["_shard"], r["_rank"])
          for r in read_shards(spark, path2).collect()}
    assert t1 == t2


def test_verify_catches_lost_file(spark, tmp_path):
    path = str(tmp_path / "shards")
    export_shards(_docs(spark), "doc_id", path, 4)
    victim = sorted(glob.glob(os.path.join(path, "_shard=2", "*.parquet")))[0]
    os.remove(victim)
    problems = verify_shards(spark, path)
    assert problems and all("shard 2" in p for p in problems)


def test_single_shard_read_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "shards")
    export_shards(_docs(spark), "doc_id", path, 8)
    one = read_shards(spark, path, shards=[3])
    # inputFiles() lists pre-pruning candidates; the executed plan's scan
    # node must carry the _shard partition filter (directory pruning)...
    plan = one._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("PartitionFilters"):]
    assert "_shard" in scan.split("]")[0]
    # ...and the files physically read all live under _shard=3/
    files = {r["f"] for r in
             one.select(F.input_file_name().alias("f")).distinct().collect()}
    assert files and all("_shard=3" in f for f in files)
    assert one.count() == load_manifest(path)["shards"]["3"]["n_rows"]


def test_files_are_rank_sorted_for_rowgroup_pruning(spark, tmp_path):
    path = str(tmp_path / "shards")
    export_shards(_docs(spark), "doc_id", path, 4)
    import pyarrow.parquet as pq
    for f in glob.glob(os.path.join(path, "_shard=*", "*.parquet")):
        ranks = pq.read_table(f, columns=["_rank"])["_rank"].to_pylist()
        assert ranks == sorted(ranks), f
