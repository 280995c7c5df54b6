"""Streaming front-end for the incremental corpus: each micro-batch of
new documents ingests as one corpus WAVE through
operators.corpus_incremental.ingest_corpus_wave — the "new crawl dump
arrives" workflow as a live Structured Streaming query instead of a
scheduled batch call.

Exactly-once composition: foreachBatch epoch ids are the wave ids.
A replayed micro-batch (restart from the same checkpoint) hits the
wave layer's committed-wave no-op; a crashed wave's dirs are invisible
until its manifest commit and are deterministically redone by the
replay. A FRESH checkpoint replays epoch ids from 0 — which the wave
layer would silently swallow as committed replays (batch CONTENT is
ignored on replay, i.e. data loss) — so, exactly like the events-mart
twin (marts._check_or_stamp_ident), the corpus records the checkpoint
identity at first ingest and refuses a different one loudly.

Scale: identical to the batch wave path (that IS the implementation);
the stream only supplies arrival batching + restart bookkeeping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.corpus_incremental import ingest_corpus_wave
from ..sources.fsutil import qualified, read_json, write_json

_IDENT_FILE = "_stream_ident.json"


def _check_or_stamp_ident(
    spark: SparkSession, corpus_path: str, checkpoint_path: str
) -> None:
    from ..operators.corpus_incremental import corpus_waves_manifest

    ident = {"checkpoint": qualified(spark, checkpoint_path)}
    marker = os.path.join(corpus_path, _IDENT_FILE)
    existing = read_json(spark, marker)
    if existing is not None:
        if existing.get("checkpoint") != ident["checkpoint"]:
            raise ValueError(
                f"streaming_corpus_ingest: corpus {corpus_path!r} was fed "
                f"from checkpoint {existing.get('checkpoint')!r}; this query "
                f"uses {ident['checkpoint']!r}. A fresh checkpoint replays "
                "wave ids from 0 and its batches would be silently dropped "
                "as committed replays. Use the original checkpoint or a "
                "fresh corpus_path."
            )
        return
    if corpus_waves_manifest(spark, corpus_path)["waves"]:
        # committed waves but no stream marker: the corpus was built by
        # manual ingest_corpus_wave calls (or an unknown writer). A new
        # stream's epoch ids restart at 0 and would be silently
        # swallowed as committed-wave replays — refuse, don't stamp.
        raise ValueError(
            f"streaming_corpus_ingest: corpus {corpus_path!r} already has "
            "committed waves but no stream identity marker — it was built "
            "by direct ingest_corpus_wave calls. A new stream's epoch ids "
            "would collide with the existing wave ids; continue it with "
            "ingest_corpus_wave, or stream into a fresh corpus_path."
        )
    write_json(spark, marker, ident)


def streaming_corpus_ingest(
    stream_docs: DataFrame,
    corpus_path: str,
    checkpoint_path: str,
    **wave_knobs,
):
    """Start the ingest stream (returns the StreamingQuery): every
    micro-batch becomes one committed corpus wave with ``wave_knobs``
    forwarded to ingest_corpus_wave (the config-freeze, monotone-id,
    and parity contracts are the wave layer's). Read the live corpus
    with corpus_incremental.read_corpus as usual."""
    spark = stream_docs.sparkSession
    _check_or_stamp_ident(spark, corpus_path, checkpoint_path)

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        ingest_corpus_wave(
            batch_df.sparkSession,
            batch_df,
            corpus_path,
            wave_id=int(epoch_id),
            **wave_knobs,
        )

    return (
        stream_docs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
