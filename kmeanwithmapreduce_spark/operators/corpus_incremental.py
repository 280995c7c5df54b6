"""Incremental training-corpus ingest: new crawl waves dedup against
the PERSISTED MinHash band index — never re-reading or re-signing prior
waves' text — flow through the same per-document filter chain as the
batch pipeline (corpus.apply_doc_filters, ONE shared implementation),
and append as committed wave directories whose union is pinned
row-for-row equal to a batch prepare_training_corpus run over the
union of all waves.

This is the most common real operation on a living 100 TB corpus: a
new dump arrives, and re-running the full batch pipeline would cost
O(corpus) when the new work is O(wave).

State layout under ``corpus_path``::

    band_index/wave=N/   minhash_bands rows of wave N's docs, PLUS the
                         cluster id each doc resolved to at ingest —
                         (doc_id, band, key, cid). ~16 small rows per
                         document: the only thing future waves read
                         about this wave.
    docs/wave=N/         full rows of wave N's surviving documents
                         (canonical at ingest AND passing the filter
                         chain), hash-sharded by doc_id.
    remap/wave=N/        the FULL retro-merge closure as of wave N:
                         (old_cid, new_cid) pairs mapping RETIRED
                         cluster canonicals to their current canonical.
                         O(total merges) rows — tiny.
    _corpus_waves.json   the chained manifest: per-wave funnel stats +
                         the pipeline config (knobs are frozen at wave
                         0; a drifted re-ingest is refused) — THE
                         commit record. Readers and subsequent waves
                         key on it, so partially-written wave dirs from
                         a crash are invisible until the wave commits.

Incremental-dedup exactness (pinned by tests/test_corpus_incremental):
candidate pairs are LSH band-key collisions, exactly d03's rule. A new
wave contributes (a) intra-wave pairs and (b) cross pairs against the
stored index. For connected components, each cross partner is replaced
by its CURRENT canonical (its stored ``cid`` resolved through the remap
closure): two old clusters bridged by a new doc merge exactly as they
would in the batch union graph, because a cluster's canonical IS its
component-minimum. When a merge demotes a previously-canonical doc, the
retirement is recorded in the remap closure — the read path drops
exported docs whose id appears on the closure's ``old_cid`` side, so a
retro-merged duplicate disappears from the corpus without rewriting any
wave directory (exported wave dirs are immutable).

Crash/restart discipline (the streaming-ingest epoch recipe): all wave
dirs are written mode=overwrite keyed by wave id, the manifest update
is the atomic commit (fsutil.write_json tmp+rename), and re-ingesting
an already-committed wave id is a recorded no-op — so a redo of a
crashed wave rewrites the same dirs deterministically and commits once.

Scale: per-wave work is O(wave text) for signatures + filters, one
(band, key) equi-join of the wave's bands against the stored index
(index side is ~16 metadata rows/doc — at 100 TB of text this is the
1-2% sidecar scan, not a corpus re-read; AQE's skew split handles hot
buckets exactly as in d03), and connected components over a node set of
wave docs + touched canonicals only. The remap closure stays
driver-broadcastable (one row per retired cluster, forever).

Reference parity: no reference analog (the reference is a single
K-Means job, SURVEY §2 Part A); training-data-pipeline extension.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fsutil import read_json, write_json
from .corpus import apply_doc_filters, connected_components, release_components
from .dedup import band_collisions, lsh_candidate_pairs, minhash_bands
from .textops import quality_score_frame

_MANIFEST = "_corpus_waves.json"
_BAND_SCHEMA = "doc_id bigint, band int, key string, cid bigint"
_REMAP_SCHEMA = "old_cid bigint, new_cid bigint"
# bumped whenever the frozen-config key set or any wave-visible rule
# changes; continuing a corpus across versions is refused loudly
# (version 2: span_dedup_tokens removed from the wave surface,
# reference-frame fingerprints added to the freeze)
_FORMAT_VERSION = 2

# knobs frozen at wave 0 — a wave ingested under different rules would
# silently break the waves==batch determinism story
_CONFIG_KEYS = (
    "quality_threshold",
    "lang_rates",
    "decontamination_threshold",
    "repetition_thresholds",
    "scrub_pii",
    "lm_logprob_min",
    "n_shards",
    "decontaminate_fp",
    "lm_reference_fp",
)


def _frame_fingerprint(df: DataFrame | None) -> list | None:
    """Cheap content identity of a reference frame: row count + an
    order-independent decimal sum of per-row xxhash64 over all columns
    (one small agg; reference corpora are eval-benchmark-sized)."""
    if df is None:
        return None
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).first()
    return [int(row.n), str(row.h)]


def corpus_waves_manifest(spark: SparkSession, corpus_path: str) -> dict:
    """The chained wave manifest ({"waves": [...], "config": {...},
    "max_doc_id": int|None}); an empty skeleton before the first wave."""
    m = read_json(spark, os.path.join(corpus_path, _MANIFEST))
    return m if m is not None else {"waves": [], "config": None, "max_doc_id": None}


def _wave_dir(corpus_path: str, sub: str, wave: int) -> str:
    return os.path.join(corpus_path, sub, f"wave={wave}")


def _columns_ddl(schema) -> str:
    """The manifest's frozen column rendering — also a valid DDL schema
    string (read_corpus passes it as the explicit union read schema)."""
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


def _read_remap(spark: SparkSession, corpus_path: str, waves: list[int]) -> DataFrame:
    """The current retro-merge closure = the LAST committed wave's full
    snapshot (each wave rewrites the whole, tiny, closure)."""
    if not waves:
        return spark.createDataFrame([], _REMAP_SCHEMA)
    return spark.read.schema(_REMAP_SCHEMA).parquet(
        _wave_dir(corpus_path, "remap", waves[-1])
    )


def _read_band_index(
    spark: SparkSession, corpus_path: str, waves: list[int]
) -> DataFrame:
    if not waves:
        return spark.createDataFrame([], _BAND_SCHEMA)
    return spark.read.schema(_BAND_SCHEMA).parquet(
        *[_wave_dir(corpus_path, "band_index", w) for w in waves]
    )


def read_corpus(spark: SparkSession, corpus_path: str) -> DataFrame:
    """The CURRENT corpus: the union of every committed wave's exported
    documents, minus retro-merged duplicates (docs whose id appears on
    the remap closure's old_cid side — they were canonical when
    exported, and a later wave merged their cluster into a smaller
    canonical). Wave dirs are immutable; the anti-join against the tiny
    closure (broadcast) is the entire retro-drop cost."""
    m = corpus_waves_manifest(spark, corpus_path)
    waves = [w["wave"] for w in m["waves"]]
    if not waves:
        raise FileNotFoundError(f"no committed corpus waves at {corpus_path}")
    live = [w["wave"] for w in m["waves"] if w["n_kept"] > 0]
    if not live:
        return spark.createDataFrame([], m["config"]["columns"])
    # explicit schema: the union must never infer-and-NULL-pad a wave
    # written under a drifted shape (the ingest refuses drift, but the
    # read side enforces the frozen columns independently)
    docs = spark.read.schema(m["config"]["columns"]).parquet(
        *[_wave_dir(corpus_path, "docs", w) for w in live]
    )
    retired = _read_remap(spark, corpus_path, waves).select(
        F.col("old_cid").alias("doc_id")
    )
    return docs.join(F.broadcast(retired), "doc_id", "left_anti")


def corpus_keep_list(spark: SparkSession, corpus_path: str) -> DataFrame:
    """(doc_id) of every document currently in the corpus."""
    return read_corpus(spark, corpus_path).select("doc_id")


def release_corpus(
    spark: SparkSession,
    corpus_path: str,
    release_path: str,
    *,
    mixture_weights: dict[str, int] | None = None,
    span_dedup_tokens: int | None = None,
    tokenizer=None,
    writer: str | None = None,
) -> dict:
    """The RELEASE pass closing the incremental loop: the two
    deliberately wave-excluded, corpus-GLOBAL curation knobs —
    ``mixture_weights`` (token shares over the WHOLE corpus) and
    ``span_dedup_tokens`` (span ownership = min doc_id over the WHOLE
    corpus) — run over ``read_corpus`` output, and the result commits
    as the next epoch of a versioned snapshot table at ``release_path``
    (sources/table.py: claim-protocol commit, time travel across
    releases, rollback, gc_table). The stages are the batch pipeline's
    own implementations (corpus.mixture_stage / span_dedup_stage), so
    release == batch is structural.

    Parity contract (pinned in tests): waves 1..N + release over the
    union == batch ``prepare_training_corpus`` with the same knobs,
    EXACTLY, whenever the wave-level knobs don't interleave with the
    global ones — i.e. ``lang_rates`` unset when ``mixture_weights`` is
    used (batch mixes BEFORE language sampling) and ``scrub_pii`` unset
    when ``span_dedup_tokens`` is used (batch owns spans over pre-scrub
    text). Outside that envelope the release is still deterministic and
    correct-by-its-own-order; the ordering difference is inherent to
    running global passes after per-wave ones and is disclosed here
    rather than papered over.

    Lineage: ``_release_manifest_epoch=N.json`` lands next to the
    release table's epochs, chaining {corpus location, wave ids +
    funnels, the frozen wave config, the release knobs, funnel counts}
    to the release epoch — a consumer can verify exactly which waves
    and rules produced the bytes it trains on. Returns the funnel stats
    plus ``epoch``.

    Scale: one corpus read (the wave union + tiny retro anti-join), the
    two global stages (broadcast vocab / shingle window — the c06/c07
    shapes), one snapshot write. O(corpus) by necessity — these knobs
    are global; everything per-document already happened per-wave."""
    from pyspark.sql import Observation

    from ..sources.fsutil import qualified
    from ..sources.table import write_snapshot
    from .corpus import mixture_stage, span_dedup_stage

    m = corpus_waves_manifest(spark, corpus_path)
    if not m["waves"]:
        raise FileNotFoundError(f"no committed corpus waves at {corpus_path}")

    obs: dict[str, Observation] = {}

    def _tap(df: DataFrame, stage: str) -> DataFrame:
        obs[stage] = Observation(f"release_{stage}")
        return df.observe(obs[stage], F.count(F.lit(1)).alias("n"))

    kept = _tap(read_corpus(spark, corpus_path), "corpus")
    if mixture_weights is not None:
        kept = _tap(
            mixture_stage(kept, mixture_weights, tokenizer=tokenizer),
            "after_mixture",
        )
    if span_dedup_tokens is not None:
        kept = _tap(span_dedup_stage(kept, span_dedup_tokens), "after_span_dedup")

    # a release may legitimately change shape (span dedup refreshes
    # n_chars only; mixture drops whole rows) — but successive releases
    # of the same corpus share one schema, so the snapshot table's own
    # drift check stays meaningful with the default allow=False
    epoch = write_snapshot(kept, release_path, writer=writer)
    stats = {stage: o.get["n"] for stage, o in obs.items()}
    stats["epoch"] = epoch
    write_json(
        spark,
        os.path.join(release_path, f"_release_manifest_epoch={epoch}.json"),
        {
            "corpus_path": qualified(spark, corpus_path),
            "waves": m["waves"],
            "wave_config": m["config"],
            "mixture_weights": mixture_weights,
            "span_dedup_tokens": span_dedup_tokens,
            "tokenizer": "custom" if tokenizer is not None else None,
            "funnel": {k: v for k, v in stats.items() if k != "epoch"},
            "epoch": epoch,
        },
    )
    return stats


def ingest_corpus_wave(
    spark: SparkSession,
    new_docs: DataFrame,
    corpus_path: str,
    wave_id: int | None = None,
    *,
    quality_threshold: float = 0.5,
    lang_rates: dict[str, float] | None = None,
    decontaminate_against: DataFrame | None = None,
    decontamination_threshold: float = 0.3,
    repetition_thresholds: tuple[float, float] | None = None,
    scrub_pii: bool = False,
    lm_reference: DataFrame | None = None,
    lm_logprob_min: float = -10.0,
    n_shards: int = 8,
    checkpoint: str = "local",
    enforce_monotone_ids: bool = True,
) -> dict:
    """Ingest one wave of new documents into the corpus at
    ``corpus_path``; returns the wave's funnel stats (plus
    ``retro_dropped``: previously-exported docs this wave's merges
    retired). Re-invoking a committed ``wave_id`` is a no-op returning
    the recorded stats (restart exactly-once); ``wave_id=None``
    auto-assigns the next wave.

    Parity contract (pinned): with per-doc-deterministic knobs only —
    there is deliberately NO ``mixture_weights`` (corpus-global token
    shares) and NO ``span_dedup_tokens`` (span ownership is the MINIMUM
    doc_id over the WHOLE corpus, so a per-wave pass would let spans
    repeated across waves survive); run those globally over
    ``read_corpus`` output instead — and ``read_corpus`` after waves
    1..N equals the batch prepare_training_corpus keep-set over the
    union of the waves. Reference frames (``decontaminate_against``,
    ``lm_reference``) are content-fingerprinted into the frozen config,
    so a wave cleaned against a different benchmark is refused.

    ``enforce_monotone_ids`` requires each wave's doc_ids to be strictly
    above every previously-ingested id (an O(1) manifest check). That is
    how doc_id UNIQUENESS across waves — the actual correctness
    precondition — is enforced cheaply; pass False only when the caller
    guarantees global uniqueness some other way (parity and retro-merge
    bookkeeping stay exact either way, id REUSE is what corrupts).
    """
    from pyspark.sql import Observation

    m = corpus_waves_manifest(spark, corpus_path)
    committed = {w["wave"]: w for w in m["waves"]}
    next_wave = (max(committed) + 1) if committed else 0
    if wave_id is None:
        wave_id = next_wave
    if wave_id in committed:
        return dict(committed[wave_id]["funnel"])  # replay: already done
    if wave_id != next_wave:
        raise ValueError(
            f"ingest_corpus_wave: wave_id {wave_id} out of sequence at "
            f"{corpus_path} (committed: {sorted(committed)}; next: {next_wave})"
        )

    config = {
        "format_version": _FORMAT_VERSION,
        "quality_threshold": quality_threshold,
        "lang_rates": lang_rates,
        "decontamination_threshold": decontamination_threshold,
        "repetition_thresholds": list(repetition_thresholds)
        if repetition_thresholds
        else None,
        "scrub_pii": scrub_pii,
        "lm_logprob_min": lm_logprob_min if lm_reference is not None else None,
        "n_shards": n_shards,
        # reference-corpus content fingerprints: the drift freeze must
        # cover WHICH eval/reference corpus the waves were cleaned
        # against, not just the scalar thresholds — a wave decontaminated
        # against a different benchmark silently breaks the
        # corpus-is-a-pure-function-of-(docs, config) determinism
        "decontaminate_fp": _frame_fingerprint(decontaminate_against),
        "lm_reference_fp": _frame_fingerprint(lm_reference),
    }
    if m["config"] is not None:
        # version gate BEFORE the key-by-key compare: a manifest written
        # by a different pipeline version may freeze rules this version
        # no longer implements (or lack fingerprints this one requires)
        # — comparing only the keys we know would silently un-freeze
        # them. Refuse loudly instead of guessing.
        stored_ver = m["config"].get("format_version")
        if stored_ver != _FORMAT_VERSION:
            raise ValueError(
                f"ingest_corpus_wave: corpus at {corpus_path} was built by "
                f"pipeline format_version {stored_ver!r}, this build writes "
                f"{_FORMAT_VERSION}. Continue it with the matching build, "
                "or rebuild into a fresh corpus_path."
            )
        prior_cfg = {k: m["config"].get(k) for k in _CONFIG_KEYS}
        this_cfg = {k: config.get(k) for k in _CONFIG_KEYS}
        if prior_cfg != this_cfg:
            raise ValueError(
                f"ingest_corpus_wave: pipeline config drift at {corpus_path}: "
                f"corpus was built with {prior_cfg}, this wave passes "
                f"{this_cfg}. The corpus is a pure function of (docs, "
                "config); re-ingest into a fresh corpus_path to change rules."
            )
        # SCHEMA freeze (same refuse-loudly contract as the knob freeze):
        # the wave-allowed filter chain is schema-preserving, so the
        # incoming docs must match the columns recorded at wave 0 —
        # otherwise read_corpus's union would serve NULLs for the
        # drifted wave's rows (silent corruption, not a loud refusal).
        want = m["config"]["columns"]
        got = _columns_ddl(new_docs.schema)
        if got != want:
            raise ValueError(
                f"ingest_corpus_wave: wave schema drift at {corpus_path}: "
                f"corpus columns are ({want}) but this wave has ({got}). "
                "Waves must carry the exact column set and types frozen "
                "at wave 0; rebuild into a fresh corpus_path to evolve."
            )

    obs: dict[str, Observation] = {}

    def _tap(df: DataFrame, stage: str) -> DataFrame:
        obs[stage] = Observation(f"wave{wave_id}_{stage}")
        return df.observe(obs[stage], F.count(F.lit(1)).alias("n"))

    docs = _tap(new_docs, "input").persist()
    nb = None
    try:
        bounds = docs.agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("doc_id").isNull().cast("int")).alias("n_null"),
            (F.count_distinct("doc_id")).alias("n_ids"),
        ).first()
        if bounds.n and bounds.n_null:
            raise ValueError(
                f"wave {wave_id}: {bounds.n_null} document(s) with NULL "
                "doc_id — the corpus is keyed by doc_id"
            )
        if bounds.n and bounds.n_ids != bounds.n:
            raise ValueError(
                f"wave {wave_id}: duplicate doc_ids within the wave "
                f"({bounds.n} rows, {bounds.n_ids} distinct ids)"
            )
        if (
            enforce_monotone_ids
            and bounds.n
            and m["max_doc_id"] is not None
            and bounds.lo <= m["max_doc_id"]
        ):
            raise ValueError(
                f"wave {wave_id}: doc_id {bounds.lo} is not above the "
                f"corpus's max ingested id {m['max_doc_id']} — waves must "
                "carry strictly increasing id ranges (this is how cross-"
                "wave id uniqueness is enforced; see enforce_monotone_ids)"
            )

        prior_waves = sorted(committed)
        nb = minhash_bands(docs).persist()
        remap = _read_remap(spark, corpus_path, prior_waves)
        prior_idx = _read_band_index(spark, corpus_path, prior_waves)
        # cross edges: new doc -> CURRENT canonical of the prior partner
        # (stored at-ingest cid resolved through the broadcast closure);
        # the collision rule itself is dedup.band_collisions — shared
        # verbatim with incremental_neardup_pairs
        resolved_idx = prior_idx.join(
            F.broadcast(remap), prior_idx.cid == remap.old_cid, "left"
        ).select(
            "band",
            "key",
            F.coalesce("new_cid", "cid").alias("rep"),
        )
        # inner distincts skipped: connected_components' symmetrize
        # applies one distinct over the whole edge set anyway
        cross = band_collisions(nb, resolved_idx, distinct=False).select(
            F.col("new_doc").alias("u"), F.col("rep").alias("v")
        )
        intra = lsh_candidate_pairs(nb, distinct=False).select(
            F.col("doc_a").alias("u"), F.col("doc_b").alias("v")
        )
        edges = intra.unionByName(cross)
        comp = connected_components(edges, src="u", dst="v", checkpoint=checkpoint)
        try:
            mem = (
                docs.select("doc_id")
                .join(comp, docs["doc_id"] == comp["node"], "left")
                .select(
                    "doc_id",
                    F.coalesce("component", "doc_id").alias("cid"),
                )
            )
            # retired canonicals: touched prior reps whose component got a
            # smaller minimum this wave. comp rows exist for every node in
            # `edges`, so every touched rep is covered.
            prior_reps = cross.select(F.col("v").alias("node")).distinct()
            retro = (
                comp.join(prior_reps, "node")
                .where(F.col("component") != F.col("node"))
                .select(
                    F.col("node").alias("old_cid"),
                    F.col("component").alias("new_cid"),
                )
            )
            retro_rows = [(r.old_cid, r.new_cid) for r in retro.collect()]

            canon = mem.where(F.col("cid") == F.col("doc_id")).select("doc_id")
            kept = _tap(docs.join(canon, "doc_id", "left_semi"), "after_dedup")
            kept = apply_doc_filters(
                kept,
                _tap,
                quality_scores=quality_score_frame(kept),
                quality_threshold=quality_threshold,
                decontaminate_against=decontaminate_against,
                decontamination_threshold=decontamination_threshold,
                repetition_thresholds=repetition_thresholds,
                lm_reference=lm_reference,
                lm_logprob_min=lm_logprob_min,
                lang_rates=lang_rates,
                scrub_pii=scrub_pii,
                obs=obs,
            )

            # ---- writes (all overwrite-by-wave-id; manifest commits) ----
            kept.repartition(n_shards, F.col("doc_id")).write.mode(
                "overwrite"
            ).parquet(_wave_dir(corpus_path, "docs", wave_id))
            nb.join(mem, "doc_id").select(
                "doc_id", "band", "key", "cid"
            ).write.mode("overwrite").parquet(
                _wave_dir(corpus_path, "band_index", wave_id)
            )
        finally:
            release_components(comp)

        # compose the closure: re-point old entries whose target was
        # retired this wave, then add this wave's retirements (driver-
        # side — the closure is O(total merges) rows by construction)
        retro_map = dict(retro_rows)
        old_closure = [
            (r.old_cid, retro_map.get(r.new_cid, r.new_cid))
            for r in remap.collect()
        ]
        closure = old_closure + retro_rows
        spark.createDataFrame(closure, _REMAP_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(_wave_dir(corpus_path, "remap", wave_id))

        stats = {stage: o.get["n"] for stage, o in obs.items()}
        stats["retro_dropped"] = len(retro_rows)
        # the export count = the LAST filter-funnel stage (taps run in
        # chain order; pii_redactions is a sum, not a stage count)
        last_stage = [k for k in obs if k != "pii_redactions"][-1]
        if m["config"] is None:
            config["columns"] = _columns_ddl(kept.schema)
            m["config"] = config
        m["waves"].append(
            {
                "wave": wave_id,
                "funnel": stats,
                "n_kept": stats[last_stage],
            }
        )
        if bounds.n:
            prev = m["max_doc_id"]
            m["max_doc_id"] = bounds.hi if prev is None else max(prev, bounds.hi)
        write_json(spark, os.path.join(corpus_path, _MANIFEST), m)
        return stats
    finally:
        if nb is not None:
            nb.unpersist()
        docs.unpersist()
