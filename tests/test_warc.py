"""WARC datasource: split-parallel roundtrips, gzip members, HTTP layer,
embedded-magic adversary, truncation regrowth, end-to-end with llm/web."""
from pyspark.sql import functions as F

from transmogrifai_spark.sources.warc import (build_warc_bytes,
                                              parse_warc_buffer, read_warc)


def _mk_records(n, payload=lambda i: f"<html><body><p>doc {i} body text"
                f"</p></body></html>".encode()):
    return [{"warc_type": "response", "payload": payload(i),
             "target_uri": f"https://site{i % 7}.com/p/{i}",
             "record_id": f"<urn:uuid:{i:032x}>",
             "http": {"status": 200 if i % 5 else 404,
                      "content_type": "text/html; charset=utf-8"}}
            for i in range(n)]


def _write(tmp_path, name, blob):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(blob)
    return p


def test_plain_warc_split_parallel_roundtrip(spark, tmp_path):
    recs = _mk_records(200, payload=lambda i: (f"padpad {i} " * 200).encode())
    path = _write(tmp_path, "a.warc", build_warc_bytes(recs))
    df = read_warc(spark, path, split_mb=0.01)  # ~10 KB splits
    assert df.rdd.getNumPartitions() > 5  # really split-parallel
    rows = df.orderBy("offset").collect()
    assert len(rows) == 200
    assert [r["record_id"] for r in rows] == \
        [r["record_id"] for r in _mk_records(200)]
    assert all(r["warc_type"] == "response" for r in rows)
    offs = [r["offset"] for r in rows]
    assert offs == sorted(offs) and len(set(offs)) == 200


def test_gz_multimember_roundtrip_and_http_columns(spark, tmp_path):
    recs = _mk_records(30)
    path = _write(tmp_path, "b.warc.gz",
                  build_warc_bytes(recs, gzip_per_record=True))
    rows = read_warc(spark, path).orderBy("offset").collect()
    assert len(rows) == 30
    for i, r in enumerate(rows):
        assert r["http_status"] == (200 if i % 5 else 404)
        assert r["http_content_type"] == "text/html; charset=utf-8"
        assert bytes(r["body"]).decode() == \
            f"<html><body><p>doc {i} body text</p></body></html>"
        assert r["target_uri"] == f"https://site{i % 7}.com/p/{i}"


def test_embedded_magic_is_not_a_record_boundary(spark, tmp_path):
    evil = b"x\r\n\r\nWARC/1.0\r\nfake: not a record\r\n\r\nmore"
    recs = [{"warc_type": "resource", "payload": evil,
             "record_id": f"<urn:uuid:{i:032x}>"} for i in range(40)]
    path = _write(tmp_path, "c.warc", build_warc_bytes(recs))
    df = read_warc(spark, path, split_mb=0.0005)  # splits land mid-payload
    rows = df.collect()
    assert len(rows) == 40
    assert all(bytes(r["body"]) == evil for r in rows)


def test_truncation_regrowth_record_larger_than_tail(spark, tmp_path):
    big = b"A" * (3 << 20)
    recs = [{"warc_type": "resource", "payload": b"small one"},
            {"warc_type": "resource", "payload": big},
            {"warc_type": "resource", "payload": b"after the big one"}]
    path = _write(tmp_path, "d.warc", build_warc_bytes(recs))
    rows = read_warc(spark, path, split_mb=0.5).orderBy("offset").collect()
    assert [len(bytes(r["body"])) for r in rows] == [9, 3 << 20, 17]


def test_buffer_parser_exactly_once_across_split_grid():
    recs = _mk_records(25)
    blob = build_warc_bytes(recs)
    # chop the byte range into arbitrary grids: union over splits must be
    # exactly the record set, regardless of where boundaries fall
    for step in (97, 1003, 4999):
        got = []
        for s in range(0, len(blob), step):
            got += [r["offset"] for r in
                    parse_warc_buffer(blob, s, min(s + step, len(blob)))]
        # offsets of records starting in each window, deduped by contract
        assert sorted(got) == sorted(set(got))
        one_shot = [r["offset"] for r in parse_warc_buffer(blob)]
        assert sorted(got) == one_shot


def test_warc_to_web_pipeline_end_to_end(spark, sf_dir, tmp_path):
    from transmogrifai_spark.llm.web import extract_html_text
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").orderBy("doc_id").limit(50).collect()
    recs = [{"warc_type": "response",
             "payload": f"<html><body><p>{r['text']}</p></body></html>"
             .encode(),
             "target_uri": f"https://corpus.org/{r['doc_id']}",
             "http": {"status": 200, "content_type": "text/html"}}
            for r in docs]
    path = _write(tmp_path, "e.warc.gz",
                  build_warc_bytes(recs, gzip_per_record=True))
    out = (read_warc(spark, path)
           .where(F.col("http_status") == 200)
           .select(F.regexp_extract("target_uri", r"(\d+)$", 1)
                   .cast("long").alias("doc_id"),
                   extract_html_text(F.col("body").cast("string"))
                   .alias("clean"))
           .orderBy("doc_id").collect())
    assert [(r["doc_id"], r["clean"]) for r in out] == \
        [(r["doc_id"], r["text"]) for r in docs]


def test_warc_streaming_matches_batch(spark, tmp_path):
    import uuid
    d = tmp_path / "landing"
    d.mkdir()
    for fi in range(3):
        recs = _mk_records(10, payload=lambda i, fi=fi:
                           f"<p>file {fi} rec {i}</p>".encode())
        blob = build_warc_bytes(
            [dict(r, record_id=f"<urn:uuid:{fi:02x}{i:030x}>")
             for i, r in enumerate(recs)], gzip_per_record=(fi == 1))
        name = f"f{fi}.warc" + (".gz" if fi == 1 else "")
        with open(d / name, "wb") as f:
            f.write(blob)
    from transmogrifai_spark.sources.warc import register_warc
    register_warc(spark)
    sink = f"warc_{uuid.uuid4().hex[:8]}"
    q = (spark.readStream.format("warc").option("split_mb", "0.001")
         .load(str(d))
         .writeStream.format("memory").queryName(sink)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    streamed = {(r["path"], r["record_id"])
                for r in spark.table(sink).collect()}
    batch = {(r["path"], r["record_id"])
             for r in read_warc(spark, str(d), split_mb=0.001).collect()}
    assert streamed == batch and len(streamed) == 30


def test_warc_write_read_roundtrip(spark, tmp_path):
    """Distributed export: df -> write.format('warc') -> read back == df
    (record identity, http layer, bodies), one part file per partition."""
    recs = _mk_records(40)
    src = _write(tmp_path, "src.warc", build_warc_bytes(recs))
    df = read_warc(spark, src).repartition(3)
    out = str(tmp_path / "export")
    df.write.format("warc").mode("overwrite").save(out)
    import glob
    parts = glob.glob(out + "/part-*.warc.gz")
    assert len(parts) == 3
    back = read_warc(spark, out)
    key = lambda rows: sorted(
        (r["record_id"], r["warc_type"], r["target_uri"], r["http_status"],
         r["http_content_type"], bytes(r["body"])) for r in rows)
    assert key(back.collect()) == key(df.collect())
