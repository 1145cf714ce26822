"""WARC (Web ARChive, ISO 28500) source — the container format web crawls
ship in (CommonCrawl, Heritrix, wget --warc): the entry point of the
crawl -> extract (llm/web) -> curate (llm/pipeline) chain.

Registered as a Spark Python Data Source (same machinery as
sources/avro_source.py's ``pyavro``):

    register_warc(spark)
    df = spark.read.format("warc").load("/crawl/segment/")   # .warc / .warc.gz

Reference surface: TransmogrifAI reads CSV/Avro/Parquet business records
(readers/src/main/scala/com/salesforce/op/readers/DataReaders.scala); it has
no crawl-format layer. This reader is built from the PUBLIC WARC/1.x spec
(ISO 28500 / IIPC warc-specifications), from scratch.

Scale design (100 TB of crawl):

* **Plain ``.warc``** files fan out as HADOOP-STYLE BYTE-RANGE SPLITS
  (``split_mb`` per task): each task scans forward from its split start to
  the first record boundary (``WARC/`` version line at file start or
  preceded by the ``\\r\\n\\r\\n`` record terminator, VALIDATED by a full
  header parse — a payload that embeds the magic but fails header/length
  parsing is skipped) and owns every record STARTING inside its range —
  the standard split contract, so one 1 GB file decodes across the
  cluster.
* **``.warc.gz``** is one split per FILE. CommonCrawl gzips one member per
  record, which permits member-boundary splitting, but locating member
  boundaries requires a compressed-stream scan with false-positive risk;
  production crawls are ~1 GB/file and arrive thousands-per-segment, so
  file-level parallelism is already the production shape (documented
  delta).
* Record parsing is stdlib-only Python inside the datasource's Arrow
  channel (block-batched, no per-row py4j); the HTTP layer of ``response``
  records is parsed into typed columns so downstream extraction
  (llm/web.extract_html_text over ``body``) is a pure-expression scan.

``build_warc_bytes`` writes spec-conformant records (optionally one gzip
member per record, the CommonCrawl layout) — the fixture path for tests and
the export path for round-tripping curated corpora back to WARC.
"""
from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, DataSourceWriter,
                                    InputPartition, WriterCommitMessage)

DEFAULT_SPLIT_MB = 32
_CRLF = b"\r\n"
_MAGIC = b"WARC/"

WARC_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),
    T.StructField("offset", T.LongType()),
    T.StructField("warc_type", T.StringType()),
    T.StructField("record_id", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("warc_date", T.StringType()),
    T.StructField("content_type", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("http_content_type", T.StringType()),
    T.StructField("body", T.BinaryType()),
])


def _parse_headers(block: bytes) -> dict:
    """WARC named fields: ``Name: value`` lines, case-insensitive names
    (spec §4); continuation lines (SP/TAB) folded per RFC 5322."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last:
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        if b":" not in line:
            raise ValueError("malformed WARC header line")
        k, v = line.split(b":", 1)
        last = k.strip().decode("ascii", "replace").lower()
        headers[last] = v.strip().decode("utf-8", "replace")
    return headers


def _parse_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP message payload into (status, content-type, body).
    Non-HTTP payloads come back as (None, None, payload)."""
    if not payload[:5] == b"HTTP/":
        return None, None, payload
    head, sep, body = payload.partition(_CRLF + _CRLF)
    if not sep:
        return None, None, payload
    lines = head.split(_CRLF)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in lines[1:]:
        if line.lower().startswith(b"content-type:"):
            ctype = line.split(b":", 1)[1].strip().decode("utf-8", "replace")
            break
    return status, ctype, body


def _record_at(buf: bytes, pos: int):
    """Parse one record starting at ``pos``; returns (record dict, next
    position) or raises ValueError if ``pos`` is not a record start."""
    if buf[pos:pos + len(_MAGIC)] != _MAGIC:
        raise ValueError("not a record start")
    eol = buf.index(_CRLF, pos)
    version = buf[pos:eol].decode("ascii", "replace")
    if not version.startswith("WARC/1") and not version.startswith("WARC/0"):
        raise ValueError(f"unsupported WARC version {version!r}")
    hdr_end = buf.index(_CRLF + _CRLF, eol)
    headers = _parse_headers(buf[eol + 2:hdr_end])
    length = int(headers["content-length"])
    payload_start = hdr_end + 4
    payload = buf[payload_start:payload_start + length]
    if len(payload) != length:
        raise ValueError("truncated record")
    nxt = payload_start + length
    # spec: two CRLFs terminate a record
    if buf[nxt:nxt + 4] == _CRLF + _CRLF:
        nxt += 4
    return {"headers": headers, "payload": payload, "offset": pos}, nxt


class Truncated(ValueError):
    """A record starting inside the split extends past the buffer — the
    split reader reacts by re-reading with a larger tail."""


def parse_warc_buffer(buf: bytes, start: int = 0, end: int | None = None,
                      at_eof: bool = True):
    """Yield records whose START offset lies in ``[start, end)``. From a
    nonzero ``start``, scans forward to the first VALIDATED record
    boundary (magic at 0 or after CRLFCRLF, and headers + length parse).
    With ``at_eof=False`` a parse failure raises ``Truncated`` instead of
    being tolerated as trailing garbage (the buffer does not reach the
    file end, so 'garbage' may just be a cut-off record)."""
    end = len(buf) if end is None else end
    pos = start
    if pos != 0:
        while True:
            # max(0, …): a negative start would make bytes.find search
            # from the END of the buffer
            hit = buf.find(_CRLF + _CRLF + _MAGIC, max(0, pos - 4), end + 4)
            if hit < 0:
                return
            cand = hit + 4
            try:
                _record_at(buf, cand)
                pos = cand
                break
            except (ValueError, KeyError, IndexError):
                if not at_eof and cand < end:
                    raise Truncated("boundary candidate cut off")
                pos = hit + 5
    while pos < end and pos < len(buf):
        try:
            rec, pos = _record_at(buf, pos)
        except (ValueError, KeyError, IndexError):
            if not at_eof:
                raise Truncated("record cut off at buffer end")
            # tolerate trailing garbage / padding after the last record
            return
        yield rec


def _row(path: str, rec: dict):
    h = rec["headers"]
    ctype = h.get("content-type", "")
    payload = rec["payload"]
    if ctype.startswith("application/http"):
        status, http_ctype, body = _parse_http(payload)
    else:
        status, http_ctype, body = None, None, payload
    return (path, rec["offset"], h.get("warc-type"), h.get("warc-record-id"),
            h.get("warc-target-uri"), h.get("warc-date"), ctype or None,
            int(h["content-length"]), status, http_ctype, bytes(body))


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        out = sorted(f for ext in ("*.warc", "*.warc.gz")
                     for f in _glob.glob(os.path.join(path, ext)))
        if not out:
            raise FileNotFoundError(f"no .warc[.gz] files under {path}")
        return out
    if "*" in path:
        out = sorted(_glob.glob(path))
        if not out:
            raise FileNotFoundError(f"no files match {path}")
        return out
    return [path]


@dataclass
class WarcSplit(InputPartition):
    path: str
    start: int
    end: int
    whole_gz: bool


class WarcBatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc requires a path")
        self.split_bytes = int(
            float(options.get("split_mb", DEFAULT_SPLIT_MB)) * (1 << 20))

    def partitions(self):
        splits = []
        for path in _list_files(self.path):
            size = os.path.getsize(path)
            if path.endswith(".gz"):
                splits.append(WarcSplit(path, 0, size, True))
                continue
            start = 0
            while start < size:
                end = min(start + self.split_bytes, size)
                splits.append(WarcSplit(path, start, end, False))
                start = end
        return splits

    def read(self, partition: WarcSplit):
        if partition.whole_gz:
            # gzip.decompress handles multi-member streams (one member per
            # record, the CommonCrawl layout) as well as whole-file gzip
            with open(partition.path, "rb") as f:
                buf = gzip.decompress(f.read())
            for rec in parse_warc_buffer(buf):
                yield _row(partition.path, rec)
            return
        # records owned by this split START inside [start, end); the last
        # one may extend past end. Read split + 1 MB tail, and on a
        # Truncated signal re-read with a doubled tail — memory stays
        # O(split + longest record), never O(file).
        size = os.path.getsize(partition.path)
        base = max(0, partition.start - 4)
        want = partition.end - base + (1 << 20)
        while True:
            with open(partition.path, "rb") as f:
                f.seek(base)
                buf = f.read(want)
            try:
                recs = list(parse_warc_buffer(
                    buf, partition.start - base, partition.end - base,
                    at_eof=base + len(buf) >= size))
                break
            except Truncated:
                want *= 2
        for rec in recs:
            rec["offset"] += base
            yield _row(partition.path, rec)


class WarcStreamReader(DataSourceStreamReader):
    """Streaming over a crawl landing directory (the way CommonCrawl-style
    segments arrive: whole files, append-only, never rewritten). Offsets
    are the processed-file set; each micro-batch fans its NEW files out as
    the same splits as the batch reader, so a 1 GB segment decodes across
    the cluster within its first micro-batch. ``max_files_per_trigger``
    bounds a backfill batch."""

    def __init__(self, options):
        self._batch = WarcBatchReader(options)
        self.max_files = int(options.get("max_files_per_trigger", 0)) or None

    def _current_files(self):
        try:
            return _list_files(self._batch.path)
        except FileNotFoundError:
            return []

    def initialOffset(self):
        return {"files": []}

    def latestOffset(self):
        seen = getattr(self, "_last_files", [])
        new = [f for f in self._current_files() if f not in set(seen)]
        if self.max_files:
            new = new[:self.max_files]
        self._last_files = seen + new
        return {"files": self._last_files}

    def partitions(self, start, end):
        new = [f for f in end["files"] if f not in set(start["files"])]
        splits = []
        for path in new:
            size = os.path.getsize(path)
            if path.endswith(".gz"):
                splits.append(WarcSplit(path, 0, size, True))
                continue
            s = 0
            while s < size:
                e = min(s + self._batch.split_bytes, size)
                splits.append(WarcSplit(path, s, e, False))
                s = e
        # an empty batch still needs one (empty) partition
        return splits or [WarcSplit("", 0, 0, False)]

    def read(self, partition: WarcSplit):
        if not partition.path:
            return iter(())
        return self._batch.read(partition)

    def commit(self, end):
        pass


@dataclass
class WarcCommit(WriterCommitMessage):
    file: str


class WarcDataWriter(DataSourceWriter):
    """Distributed WARC export: each partition writes one
    ``part-NNNNN.warc[.gz]`` (gzip = one member per record, the
    CommonCrawl layout, so the output is split-readable by this module's
    own reader and by standard tooling). Input rows follow WARC_SCHEMA;
    rows with an ``http_status`` are re-wrapped as HTTP responses."""

    def __init__(self, options, schema: T.StructType, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc requires a path")
        self.gz = options.get("compression", "gzip") == "gzip"
        if overwrite and os.path.isdir(self.path):
            for ext in ("*.warc", "*.warc.gz"):
                for f in _glob.glob(os.path.join(self.path, ext)):
                    os.remove(f)

    def write(self, iterator):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(
            self.path, f"part-{pid:05d}.warc" + (".gz" if self.gz else ""))
        with open(out, "wb") as f:
            for row in iterator:
                d = row.asDict()
                http = None
                if d.get("http_status") is not None:
                    http = {"status": d["http_status"],
                            "content_type": d.get("http_content_type")
                            or "text/html"}
                blob = build_warc_record(
                    warc_type=d.get("warc_type") or "resource",
                    payload=bytes(d.get("body") or b""),
                    target_uri=d.get("target_uri"),
                    record_id=d.get("record_id"),
                    date=d.get("warc_date") or "2024-01-01T00:00:00Z",
                    http=http)
                f.write(gzip.compress(blob) if self.gz else blob)
        return WarcCommit(file=out)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class WarcDataSource(DataSource):
    @classmethod
    def name(cls):
        return "warc"

    def schema(self):
        return WARC_SCHEMA

    def reader(self, schema):
        return WarcBatchReader(self.options)

    def streamReader(self, schema):
        return WarcStreamReader(self.options)

    def writer(self, schema, overwrite):
        return WarcDataWriter(self.options, schema, overwrite)


def register_warc(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def read_warc(spark, path: str, split_mb: int = DEFAULT_SPLIT_MB):
    """Convenience: register + load. Returns the typed record DataFrame."""
    register_warc(spark)
    return (spark.read.format("warc")
            .option("split_mb", str(split_mb)).load(path))


# ---------------------------------------------------------------------------
# writer / fixture path
# ---------------------------------------------------------------------------


def build_warc_record(warc_type: str, payload: bytes,
                      target_uri: str | None = None,
                      record_id: str | None = None,
                      date: str = "2024-01-01T00:00:00Z",
                      http: dict | None = None) -> bytes:
    """One spec-conformant WARC/1.0 record. ``http={'status': 200,
    'content_type': 'text/html'}`` wraps the payload as an HTTP response
    (record content-type ``application/http;msgtype=response``)."""
    if http is not None:
        status = http.get("status", 200)
        lines = [f"HTTP/1.1 {status} OK".encode(),
                 b"Content-Type: " + http.get(
                     "content_type", "text/html").encode(),
                 b"Content-Length: " + str(len(payload)).encode()]
        payload = _CRLF.join(lines) + _CRLF + _CRLF + payload
        ctype = "application/http;msgtype=response"
    else:
        ctype = "application/octet-stream"
    if record_id is None:
        # deterministic default (hash() is process-salted)
        import hashlib
        digest = hashlib.md5(
            f"{warc_type}|{target_uri}|{len(payload)}".encode()).hexdigest()
        record_id = f"<urn:uuid:{digest}>"
    rid = record_id
    head = [b"WARC/1.0",
            b"WARC-Type: " + warc_type.encode(),
            b"WARC-Record-ID: " + rid.encode(),
            b"WARC-Date: " + date.encode()]
    if target_uri:
        head.append(b"WARC-Target-URI: " + target_uri.encode())
    head.append(b"Content-Type: " + ctype.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return _CRLF.join(head) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_warc_bytes(records: list[dict], gzip_per_record: bool = False) \
        -> bytes:
    """Concatenate records (see build_warc_record kwargs); with
    ``gzip_per_record`` each record is its own gzip member — the
    CommonCrawl ``.warc.gz`` layout."""
    out = io.BytesIO()
    for r in records:
        blob = build_warc_record(**r)
        out.write(gzip.compress(blob) if gzip_per_record else blob)
    return out.getvalue()
