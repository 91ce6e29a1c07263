"""Streaming corpus preparation: the q89 batch pipeline on a document
stream (quality filter → cross-batch content dedup → deterministic
split), with an explicit state contract.

This is how a 100 TB corpus is actually built — documents arrive
continuously and the dedup state must span micro-batches and restarts.
The reference's analog is the insertId-based effectively-once window on
its warehouse writes (``BQRowWithInsertId.java:9-12``); a corpus
pipeline needs the same idea at CONTENT granularity.

State contract (the 100-TB question is "how big does state get?"):

* ``retention=None`` — ``dropDuplicates``: first arrival wins FOREVER.
  One state entry per distinct fingerprint ever seen; state grows with
  corpus cardinality. Deliberately unbounded — exact global dedup needs
  it — and therefore only safe on the RocksDB state store
  (``session.get_spark`` wires ``RocksDBStateStoreProvider`` +
  changelog checkpointing as the engine default), where state is
  disk-backed and checkpoint uploads are per-batch deltas, not
  heap-resident snapshots.
* ``retention="N days"`` — ``dropDuplicatesWithinWatermark``: a
  duplicate is dropped only if it arrives within the watermark delay of
  the first copy; state is evicted as the watermark passes, so it is
  bounded by O(keys per retention window) regardless of stream
  lifetime. The right mode when near-window re-crawls are the dup
  source and an occasional long-separated re-ingest is acceptable (it
  lands as a new row and the periodic BATCH dedup — q30/q36 — catches
  it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beast_spark.functions.hashing import md5_long
from beast_spark.functions.text import fingerprint, token_count, unique_ratio

__all__ = ["corpus_prep_stream"]


def corpus_prep_stream(
    stream: DataFrame,
    min_tokens: int = 3,
    max_tokens: int = 100,
    min_unique_ratio: float = 0.5,
    retention: str | None = None,
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """q89's stages on a stream: filter → fingerprint-dedup → split.

    ``retention`` selects the state mode documented above; when set,
    ``ts_col`` must be the event-time column the watermark rides on.
    Split assignment is the q88 deterministic md5 bucket — identical to
    the batch operator, so a doc gets the same split whether it arrived
    through the stream or a backfill.
    """
    n = token_count("text")
    kept = stream.filter(
        n.between(min_tokens, max_tokens) & (unique_ratio("text") >= min_unique_ratio)
    )
    bucket = md5_long(F.col("doc_id").cast("string")) % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    fp = kept.withColumn("fp", fingerprint("text"))
    if retention is None:
        deduped = fp.dropDuplicates(["fp"])
    else:
        deduped = fp.withWatermark(ts_col, retention).dropDuplicatesWithinWatermark(["fp"])
    return deduped.withColumn("split", split).withColumn("n_tokens", n)
