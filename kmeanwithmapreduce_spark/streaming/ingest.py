"""Streaming corpus ingestion with continuous near-dup detection: each
micro-batch of documents is checked against the persisted MinHash band
index (operators.dedup.incremental_neardup_pairs) and then appended to
it. The accumulated pair set is EXACTLY the batch d03 result over
everything ingested so far (associativity pinned in
tests/test_dedup_incremental.py) — previously ingested text is never
rescanned or re-signed.

Exactly-once: every sink write lands in an epoch-keyed subdirectory
with overwrite mode, so a replayed micro-batch (foreachBatch is
at-least-once under retry) rewrites its own epoch instead of
duplicating rows — the standard idempotent-foreachBatch recipe.

Scale: per micro-batch cost is O(batch) signature work plus a join
pruned to matching band keys; the index grows ~_LSH_BANDS small rows
per document and would be partitioned by hash(band, key) on a real
cluster so each batch join touches only its buckets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_INDEX_SCHEMA = "doc_id bigint, band int, key string"


def read_band_index(spark, index_path: str) -> DataFrame:
    """All epochs of the persisted band index (empty frame if nothing
    has been ingested yet)."""
    try:
        return spark.read.schema(_INDEX_SCHEMA).parquet(
            os.path.join(index_path, "*")
        ).select("doc_id", "band", "key")
    except Exception:
        return spark.createDataFrame([], _INDEX_SCHEMA)


def streaming_neardup_ingest(
    stream_docs: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_path: str,
):
    """Start the ingest stream; returns the StreamingQuery. Read the
    accumulated pairs with ``spark.read.parquet(pairs_path + "/*")``
    (epoch subdirs) and the live index with ``read_band_index``."""
    from ..operators.dedup import incremental_neardup_pairs, minhash_bands

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        idx = read_band_index(spark, index_path)
        # pairs BEFORE appending this batch's bands (the batch's intra
        # pairs are produced by incremental_neardup_pairs itself)
        pairs = incremental_neardup_pairs(batch_df, idx)
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_path, f"epoch={epoch_id}")
        )
        minhash_bands(batch_df).select("doc_id", "band", "key").write.mode(
            "overwrite"
        ).parquet(os.path.join(index_path, f"epoch={epoch_id}"))

    return (
        stream_docs.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_accumulated_pairs(spark, pairs_path: str) -> DataFrame:
    try:
        return spark.read.schema("doc_a bigint, doc_b bigint").parquet(
            os.path.join(pairs_path, "*")
        ).select("doc_a", "doc_b").distinct()
    except Exception:
        return spark.createDataFrame([], "doc_a bigint, doc_b bigint")


__all__ = [
    "read_band_index",
    "read_accumulated_pairs",
    "streaming_neardup_ingest",
]


# --------------------------------------------------------------------------
# streaming count-min-sketch accumulation

_SKETCH_SCHEMA = "row int, bucket bigint, cnt bigint"


def streaming_cms_ingest(
    stream_items: DataFrame,
    item_col: str,
    sketch_path: str,
    checkpoint_path: str,
    *,
    depth: int = 4,
    width: int = 1024,
    salt: str = "cms",
):
    """Accumulate a count-min sketch over a stream: each micro-batch
    writes ITS OWN grid (<= depth*width rows) into an epoch-keyed
    subdirectory, and the accumulated sketch is the cell-wise sum of
    all epochs (read_accumulated_sketch). Correct because CMS grids
    are mergeable — sketch(A ∪ B) == sketch(A) + sketch(B) cell-wise,
    the property pinned in tests/test_sketch.py — and exactly-once
    because a replayed epoch overwrites itself (the
    streaming_neardup_ingest recipe). State per epoch is bounded by
    the grid, never by stream volume."""
    from ..operators.sketch import count_min_sketch

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        count_min_sketch(
            batch_df, item_col, depth=depth, width=width, salt=salt
        ).write.mode("overwrite").parquet(
            os.path.join(sketch_path, f"epoch={epoch_id}")
        )

    return (
        stream_items.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_accumulated_sketch(spark, sketch_path: str) -> DataFrame:
    """Cell-wise sum of every ingested epoch's grid — the CMS of
    everything streamed so far (empty grid before the first epoch)."""
    try:
        epochs = spark.read.schema(_SKETCH_SCHEMA).parquet(
            os.path.join(sketch_path, "*")
        )
    except Exception:
        return spark.createDataFrame([], _SKETCH_SCHEMA)
    from pyspark.sql import functions as F

    return epochs.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


# --------------------------------------------------------------------------
# streaming HLL accumulation — the cardinality twin of the CMS path
# above: per-micro-batch per-(key, shard) DataSketches HLL sketches
# land in epoch-keyed subdirs; the accumulated estimate is the union
# over all epochs. Correct because HLL union is register-wise max
# (associative/commutative/estimate-lossless — pinned in
# tests/test_sketch.py), so replayed values and cross-epoch duplicates
# never double-count; exactly-once because a replayed epoch overwrites
# its own subdir. State per epoch: #keys x n_shards sketches of
# 2^lg_k registers, never stream volume.


def streaming_hll_ingest(
    stream_items: DataFrame,
    key_cols: list[str],
    value_col: str,
    sketch_path: str,
    checkpoint_path: str,
    *,
    n_shards: int = 16,
    lg_k: int = 12,
):
    from ..operators.sketch import hll_shard_sketches

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        hll_shard_sketches(
            batch_df, key_cols, value_col, n_shards=n_shards, lg_k=lg_k
        ).write.mode("overwrite").parquet(
            os.path.join(sketch_path, f"epoch={epoch_id}")
        )

    return (
        stream_items.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_accumulated_hll(spark, key_cols: list[str], sketch_path: str) -> DataFrame:
    """Union every ingested epoch's sketches per key and estimate — the
    distinct count of everything streamed so far."""
    from pyspark.sql import functions as F

    from ..operators.sketch import hll_merge_estimate

    try:
        epochs = spark.read.parquet(os.path.join(sketch_path, "*"))
    except Exception:
        schema = ", ".join(f"{c} string" for c in key_cols)
        return spark.createDataFrame([], f"{schema}, n_distinct_est bigint")
    return hll_merge_estimate(epochs, key_cols)


# --------------------------------------------------------------------------
# streaming SCD2 — change-data-capture apply: each micro-batch of
# change rows folds into a versioned dimension via operators/scd.py's
# scd2_apply. SCD2 is a left FOLD, not a merge — unlike the CMS/HLL
# paths above there is no commutative shortcut — so epochs must apply
# in order, which availableNow + checkpointing guarantees.
#
# Snapshot-chain commit protocol: each epoch writes a FULL dimension
# snapshot to epoch=N/ and parquet's own _SUCCESS marker is the
# commit. Readers (and the next epoch) take the highest COMMITTED
# epoch; a replayed epoch that already committed is skipped, and one
# that died mid-write has no _SUCCESS, so the replay's overwrite
# redoes it cleanly — exactly-once with no pointer-swap crash window
# (a "promote current" step would lose the update if the job died
# between marking the epoch done and swapping the pointer). Dimension
# snapshots are tiny relative to the fact data they describe; a chain
# of them is the SCD2 analog of the epoch-keyed sketch dirs above,
# and old epochs are trivially GC-able (keep-last-K).
#
# Multi-change batches pre-aggregate to the LATEST change per key
# (max_by over change_ts) before applying — scd2_apply's documented
# one-change-per-key contract.


def _committed_epochs(spark, dim_path: str) -> list[int]:
    # read-only probes via fsutil: local fast path (one os.listdir +
    # one os.path.exists per epoch) when the table is on the local FS,
    # Hadoop FS otherwise — round 14, the per-entry metadata fan-out
    from ..sources.fsutil import fs_exists, fs_list_names

    out = []
    for name in fs_list_names(spark, dim_path):
        if name.startswith("epoch=") and fs_exists(
            spark, os.path.join(dim_path, name, "_SUCCESS")
        ):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def read_scd2_dim(spark, dim_path: str) -> DataFrame:
    """The current dimension: highest committed epoch snapshot, or the
    caller-written ``base`` bootstrap snapshot before any epoch."""
    epochs = _committed_epochs(spark, dim_path)
    sub = f"epoch={epochs[-1]}" if epochs else "base"
    return spark.read.parquet(os.path.join(dim_path, sub))


def streaming_scd2_ingest(
    stream_changes: DataFrame,
    dim_path: str,
    checkpoint_path: str,
    key: str,
    attr_cols: list[str],
    change_ts_col: str = "change_ts",
):
    """Fold a change stream into the SCD2 dimension chain at
    ``dim_path`` (bootstrap: caller writes the initial snapshot to
    ``<dim_path>/base`` first). Read the result with read_scd2_dim."""
    from pyspark.sql import functions as F

    from ..operators.scd import scd2_apply

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        done = _committed_epochs(spark, dim_path)
        if epoch_id in done:  # replayed, already committed
            return
        latest = (
            batch_df.groupBy(key)
            .agg(
                F.max_by(
                    F.struct(*attr_cols, change_ts_col), F.col(change_ts_col)
                ).alias("_c")
            )
            .select(key, "_c.*")
        )
        merged = scd2_apply(
            read_scd2_dim(spark, dim_path), latest, key, attr_cols, change_ts_col
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(dim_path, f"epoch={epoch_id}")
        )

    return (
        stream_changes.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


# --------------------------------------------------------------------------
# streaming transition matrix: the q37 sequence operator as continuous
# ingest. Per epoch: transitions INSIDE the batch plus the boundary
# pair from each user's stored last event into their first batch event
# — computed by running the batch operator (transition_matrix) over
# (state snapshot UNION batch), which is exactly right because every
# state user contributes one row (no state-state pairs) and lag spans
# the boundary. Correctness contract: per-user in-order delivery
# across batches — the property a user-keyed Kafka topic gives
# (sources/kafka.py's partition-by-key wire model); late cross-batch
# events would need watermarked re-sort upstream.
#
# Exactly-once: increment grids land in epoch-keyed subdirs (additive,
# like the CMS), and the per-user state snapshot chain's _SUCCESS is
# the commit marker (the SCD2 recipe) — a replayed epoch recomputes
# the IDENTICAL increments (prior state + batch rows are both
# deterministic) and overwrites its own subdirs. State per epoch is
# one row per user ever seen: bounded by user cardinality, the same
# budget as the SCD2 dimension chain.

_TRANS_STATE_SCHEMA = (
    "user_id bigint, event_id bigint, event_type string, ts timestamp"
)


def streaming_transition_ingest(
    stream_events: DataFrame,
    out_path: str,
    checkpoint_path: str,
    on_late: str = "error",
):
    """foreachBatch ingest maintaining <out_path>/increments (epoch
    transition counts) and <out_path>/state (per-user last event
    chain). Read the accumulated matrix with read_transition_matrix.

    ``on_late`` enforces the per-user in-order delivery contract
    instead of assuming it: a batch event at or before the user's
    stored last (ts, event_id) would silently corrupt the boundary
    pair, so ``"error"`` (default) fails the query loudly — the
    correct behavior for a keyed-topic source where out-of-order means
    a broken upstream, not a data property. ``"permissive"`` skips the
    check (callers that re-sort upstream with their own watermark)."""
    from pyspark.sql import functions as F

    from ..operators.sequences import transition_matrix

    if on_late not in ("error", "permissive"):
        raise ValueError(f"on_late must be 'error' or 'permissive', got {on_late!r}")

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        state_path = os.path.join(out_path, "state")
        done = _committed_epochs(spark, state_path)
        if epoch_id in done:  # replayed, already committed
            return
        prior = [ep for ep in done if ep < epoch_id]
        if prior:
            state = spark.read.schema(_TRANS_STATE_SCHEMA).parquet(
                os.path.join(state_path, f"epoch={prior[-1]}")
            )
        else:
            state = spark.createDataFrame([], _TRANS_STATE_SCHEMA)
        # persist the batch (it feeds the late check, the union, and
        # the user list — one source read, not three) and the PRUNED
        # state (only state rows for users PRESENT in the batch can
        # form a boundary pair or be late — the semi join keeps every
        # per-epoch computation bounded by the BATCH's users, not every
        # user ever seen, and persisting it means the state snapshot is
        # scanned exactly twice per epoch: once here, once for the
        # carry-forward anti join — same as before the late check
        # existed).
        batch = batch_df.select("user_id", "event_id", "event_type", "ts").persist()
        batch_users = batch.select("user_id").distinct()
        pruned = state.join(batch_users, "user_id", "semi").persist()
        try:
            if on_late == "error":
                firsts = batch.groupBy("user_id").agg(
                    F.min(F.struct("ts", "event_id")).alias("_first")
                )
                n_late = (
                    firsts.join(pruned, "user_id")
                    .where(F.col("_first") <= F.struct("ts", "event_id"))
                    .count()
                )
                if n_late:
                    raise RuntimeError(
                        f"streaming_transition_ingest epoch {epoch_id}: "
                        f"{n_late} user(s) delivered events at or before "
                        "their committed last event — per-user in-order "
                        "contract violated (on_late='error')"
                    )
            touched = pruned.unionByName(batch)
            transition_matrix(touched).write.mode("overwrite").parquet(
                os.path.join(out_path, "increments", f"epoch={epoch_id}")
            )
            # state snapshot LAST: its _SUCCESS is the epoch's commit
            # marker. Untouched users carry forward verbatim (anti
            # join); touched users take their latest (ts, event_id) row.
            new_state = (
                touched.groupBy("user_id")
                .agg(
                    F.max_by(
                        F.struct("event_id", "event_type", "ts"),
                        F.struct("ts", "event_id"),
                    ).alias("_s")
                )
                .select("user_id", "_s.*")
            )
            carried = state.join(batch_users, "user_id", "anti")
            carried.unionByName(new_state).write.mode("overwrite").parquet(
                os.path.join(state_path, f"epoch={epoch_id}")
            )
        finally:
            pruned.unpersist()
            batch.unpersist()

    return (
        stream_events.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_transition_matrix(spark, out_path: str) -> DataFrame:
    """Sum of every epoch's increment grid — the transition matrix of
    everything streamed so far (equals batch transition_matrix over the
    full stream; pinned in test_sequences). An increment epoch whose
    state commit died mid-write is safe to include: the replay
    recomputes the identical grid into the same subdir."""
    from pyspark.sql import functions as F

    try:
        inc = spark.read.schema(
            "from_type string, to_type string, n bigint"
        ).parquet(os.path.join(out_path, "increments", "*"))
    except Exception:
        return spark.createDataFrame([], "from_type string, to_type string, n bigint")
    return inc.groupBy("from_type", "to_type").agg(
        F.sum("n").cast("bigint").alias("n")
    )


# --------------------------------------------------------------------------
# streaming Bloom-filter accumulation — the membership twin of the CMS/
# HLL paths: per-micro-batch sparse bitmaps land in epoch-keyed subdirs
# and the accumulated filter is the word-wise bit_or over all epochs.
# Correct because Bloom union is bitwise OR (associative/commutative/
# idempotent — pinned merged==direct in tests/test_sketch.py), so
# unlike the CMS's additive grid a REPLAYED or even double-counted
# epoch cannot corrupt the filter; the epoch-overwrite is still kept
# for tidiness. No false negative can ever appear for a committed key.

_BLOOM_SCHEMA = "word bigint, bits bigint"


def streaming_bloom_ingest(
    stream_keys: DataFrame,
    key_col: str,
    filter_path: str,
    checkpoint_path: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 5,
    salt: str = "bloom",
):
    """Accumulate a Bloom membership filter over a stream of keys:
    each micro-batch writes its own sparse bitmap (<= n_bits/32 rows)
    into epoch=<id>/; read_accumulated_bloom folds them. Feed the
    result to operators.sketch.bloom_probe for membership checks (e.g.
    "was this doc_id ever ingested?" without rescanning the corpus)."""
    from ..operators.sketch import bloom_build

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        bloom_build(
            batch_df, key_col, n_bits=n_bits, n_hashes=n_hashes, salt=salt
        ).write.mode("overwrite").parquet(
            os.path.join(filter_path, f"epoch={epoch_id}")
        )

    return (
        stream_keys.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_accumulated_bloom(spark, filter_path: str) -> DataFrame:
    """Word-wise OR of every ingested epoch's bitmap — the Bloom filter
    of everything streamed so far (empty before the first epoch)."""
    from pyspark.sql import functions as F

    try:
        epochs = spark.read.schema(_BLOOM_SCHEMA).parquet(
            os.path.join(filter_path, "*")
        )
    except Exception:
        return spark.createDataFrame([], _BLOOM_SCHEMA)
    return epochs.groupBy("word").agg(F.bit_or("bits").alias("bits"))


# --------------------------------------------------------------------------
# streaming ANN ingest — foreachBatch micro-batches of (vec_id,
# embedding) appended to a persisted AnnIndex (operators/ann_index.py)
# as codes epochs, under the FROZEN quantizers (the FAISS add
# contract; encoding is a pure function of the saved parameters, which
# is what makes replays recompute bit-identical codes).
#
# Epoch identity: add_batch numbers codes epochs max-committed+1, so
# the stream epoch id cannot name the codes dir directly (a compaction
# between batches renumbers the tail — the collision the marts'
# name-by-stream-epoch recipe cannot survive here). Instead each
# stream epoch commits through a CLAIM + LEDGER pair, the table
# layer's stage->claim->commit discipline applied to the index:
#
#   1. ledger `_ingest_log/epoch=<stream>/` committed  => replay, no-op
#   2. `_ingest_claim.json` put-if-absent maps stream epoch -> the
#      codes epoch chosen NOW (max committed + 1)
#   3. encode + write codes/epoch=<claimed> (parquet _SUCCESS commit)
#   4. write the one-row ledger epoch — ITS _SUCCESS is the stream
#      epoch's commit
#   5. drop the claim
#
# Every crash window replays deterministically: before (2) nothing
# happened; between (2) and (3) the replay adopts the claim and
# redoes the overwrite; between (3) and (4) the replay adopts the
# claim, sees the codes epoch committed, and only writes the ledger
# (re-validating would spuriously trip the duplicate-id check against
# the batch's own committed rows); between (4) and (5) the replay
# no-ops on the ledger and sweeps the consumed claim. Manual mutations
# (add_batch/delete_ids/compact_codes) refuse while a claim is
# PENDING (AnnIndex._check_no_pending_ingest) — a compaction folding
# into the claimed slot would make the restarted stream skip its
# encode as already-committed, silent data loss.
#
# Identity guard: `_ingest_ident.json` stamps the checkpoint location
# (the marts/corpus_stream discipline) — a FRESH checkpoint replays
# stream epoch ids from 0, which the ledger would silently swallow as
# committed replays; the guard refuses loudly instead.

_ANN_IDENT_FILE = "_ingest_ident.json"
_ANN_LEDGER_SCHEMA = "stream_epoch bigint, codes_epoch bigint, n_rows bigint"


def _ann_ledger_path(index_path: str) -> str:
    from ..operators.ann_index import _INGEST_LEDGER

    return os.path.join(index_path, _INGEST_LEDGER)


def _check_or_stamp_ann_ident(spark, index_path: str, checkpoint_path: str) -> None:
    from ..sources.fsutil import qualified, read_json, write_json

    ident = {"checkpoint": qualified(spark, checkpoint_path)}
    marker = os.path.join(index_path, _ANN_IDENT_FILE)
    existing = read_json(spark, marker)
    if existing is not None:
        if existing.get("checkpoint") != ident["checkpoint"]:
            raise ValueError(
                f"streaming_ann_ingest: index at {index_path!r} was "
                f"ingested under checkpoint={existing.get('checkpoint')!r}, "
                f"this ingest uses {ident['checkpoint']!r}. A new "
                "checkpoint replays stream epoch ids from 0 and the "
                "ledger would silently swallow its batches as committed "
                "replays; resume the original checkpoint or rebuild the "
                "index."
            )
        return
    if _committed_epochs(spark, _ann_ledger_path(index_path)):
        raise ValueError(
            f"streaming_ann_ingest: index at {index_path!r} has committed "
            "ingest epochs but no _ingest_ident.json marker — it was fed "
            "by an unknown query; refusing to mix epoch id spaces."
        )
    write_json(spark, marker, ident)


def ann_ingest_batch(batch_df: DataFrame, epoch_id: int, index_path: str):
    """Apply ONE micro-batch of (vec_id, embedding) rows to the index —
    the foreachBatch body, module-level so the crash-window and replay
    tests can drive it directly. Returns the codes epoch the batch
    committed to, or None for a replayed/empty batch."""
    from ..operators.ann_index import AnnIndex
    from ..sources.fsutil import hadoop, read_json
    from ..sources.table import _put_if_absent_json

    spark = batch_df.sparkSession
    ledger_path = _ann_ledger_path(index_path)
    idx = AnnIndex.load(spark, index_path)
    claim_path = idx._ingest_claim_path()

    def _drop_claim() -> None:
        jvm, jp, fs = hadoop(spark, claim_path)
        fs.delete(jp, False)

    done_ledger = _committed_epochs(spark, ledger_path)
    claim = read_json(spark, claim_path)
    if epoch_id in done_ledger:
        # replayed, already committed; a claim left by a crash between
        # the ledger commit and the claim drop is consumed now
        if claim is not None and claim["stream_epoch"] == epoch_id:
            _drop_claim()
        return None
    if claim is not None and claim["stream_epoch"] != epoch_id:
        if claim["stream_epoch"] in done_ledger:
            _drop_claim()  # consumed (crash after its ledger commit)
            claim = None
        else:
            raise RuntimeError(
                f"streaming_ann_ingest epoch {epoch_id}: found a pending "
                f"claim for stream epoch {claim['stream_epoch']} with no "
                "committed ledger entry — epoch ids should replay in "
                "order; refusing to guess."
            )
    idx._complete_compaction()  # finish a dead compactor's work first
    batch = batch_df.select("vec_id", "embedding").persist()
    try:
        n = batch.count()
        if n == 0:
            return None  # empty micro-batch: nothing to claim or commit
        if claim is None:
            done = _committed_epochs(spark, idx._codes_path())
            payload = {
                "stream_epoch": int(epoch_id),
                "codes_epoch": int(done[-1] + 1) if done else 0,
            }
            if not _put_if_absent_json(spark, claim_path, payload):
                raise RuntimeError(
                    f"streaming_ann_ingest epoch {epoch_id}: lost the "
                    "claim race — a second maintainer is mutating "
                    f"{index_path}; the single-maintainer contract is "
                    "violated."
                )
            claim = payload
        codes_epoch = int(claim["codes_epoch"])
        if codes_epoch not in _committed_epochs(spark, idx._codes_path()):
            idx._validate_new_batch(batch, op="streaming_ann_ingest")
            idx._encode(batch).write.mode("overwrite").parquet(
                os.path.join(idx._codes_path(), f"epoch={codes_epoch}")
            )
        # the one-row ledger epoch is the stream epoch's commit marker
        spark.createDataFrame(
            [(int(epoch_id), codes_epoch, int(n))], _ANN_LEDGER_SCHEMA
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(ledger_path, f"epoch={epoch_id}")
        )
        _drop_claim()
        return codes_epoch
    finally:
        batch.unpersist()


def streaming_ann_ingest(
    stream_vectors: DataFrame,
    index_path: str,
    checkpoint_path: str,
):
    """Continuously append a stream of (vec_id, embedding) rows to the
    persisted ANN index at ``index_path`` (built beforehand with
    build_ann_index — quantizers are frozen; re-index deliberately via
    AnnIndex.rebuild). Exactly-once per the claim+ledger protocol
    above; the accumulated index is pinned equal — codes AND search
    results, bit-for-bit — to a one-shot build+add over the same rows
    in tests/test_ann_stream.py. Returns the StreamingQuery."""
    spark = stream_vectors.sparkSession
    _check_or_stamp_ann_ident(spark, index_path, checkpoint_path)

    def _ingest(batch_df: DataFrame, epoch_id: int) -> None:
        ann_ingest_batch(batch_df, epoch_id, index_path)

    return (
        stream_vectors.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def read_ann_ingest_log(spark, index_path: str) -> DataFrame:
    """The committed ledger: one row per applied stream epoch
    (stream_epoch, codes_epoch, n_rows) — empty before any ingest."""
    done = _committed_epochs(spark, _ann_ledger_path(index_path))
    if not done:
        return spark.createDataFrame([], _ANN_LEDGER_SCHEMA)
    return spark.read.schema(_ANN_LEDGER_SCHEMA).parquet(
        *[
            os.path.join(_ann_ledger_path(index_path), f"epoch={ep}")
            for ep in done
        ]
    )
