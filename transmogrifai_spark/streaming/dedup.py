"""Streaming deduplication — exactly-once-ish ingestion for training-data
pipelines.

A 100 TB/day ingest re-delivers records (at-least-once sources, retried
batches); the scale-safe fix is dedup AT INGEST with bounded state:

  * ``dedup_stream(keys=[...])``: drop re-deliveries of the same key.
    With ``within`` set it uses ``dropDuplicatesWithinWatermark`` — state
    for a key is dropped once the watermark passes it, so memory is bounded
    by (arrival-rate x window), not by stream length. Without ``within``
    it falls back to exact ``dropDuplicates`` (unbounded state — backfill/
    batch use only).
  * ``dedup_stream_by_digest``: content-level dedup — key is a digest of
    the payload columns (the streaming form of llm.dedup.exact_duplicates),
    so re-sent bodies dedup even when ids differ.

On batch frames both degrade to plain distinct-by-key, which is how the
tests pin stream == batch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(df: DataFrame, keys: list[str], time_col: str | None = None,
                 within: str | None = None) -> DataFrame:
    """Keep the first arrival per key.

    ``within`` (e.g. "1 hour") bounds state via the watermark on
    ``time_col``: duplicates arriving later than the watermark delay are NOT
    caught (they are also the ones a bounded-memory system cannot catch) —
    choose the window from the source's redelivery horizon."""
    if df.isStreaming and within:
        if not time_col:
            raise ValueError("within requires time_col (the watermark column)")
        return df.withWatermark(time_col, within) \
            .dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def dedup_stream_by_digest(df: DataFrame, content_cols: list[str],
                           time_col: str | None = None,
                           within: str | None = None,
                           digest_col: str = "_digest") -> DataFrame:
    """Content-digest dedup: identical payloads collapse even under
    differing ids (llm/dedup.py exact path, streaming form). The digest is
    sha2 over the null-tagged concatenation of the content columns."""
    tagged = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
              for c in content_cols]
    with_digest = df.withColumn(
        digest_col, F.sha2(F.concat_ws("\x01", *tagged), 256))
    return dedup_stream(with_digest, [digest_col], time_col, within)
