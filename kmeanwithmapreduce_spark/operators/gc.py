"""One GC entry point for a corpus tree: "what do I delete safely?"
has ONE answer.

A living training-corpus directory accumulates several epoch-keeped
state layouts, each with its own (already-tested) GC discipline:

- snapshot versioned tables (``epoch=N`` + parquet ``_SUCCESS``) —
  ``sources.table.gc_table`` keep-last-K with the log-ahead
  ``_gc_log.json``;
- bucketed upsert tables (``_table_meta.json``) —
  ``sources.table.gc_bucketed_table`` floor-exact window GC;
- streaming events-mart state (``sessions_state``/``funnel_state``
  chains) — ``streaming.marts.gc_mart_state`` superseded-bucket
  pruning;
- incremental corpus waves (``_corpus_waves.json``) — the remap
  closure is rewritten in FULL every wave, so all but the newest
  ``keep`` ``remap/wave=N`` snapshots are superseded and deletable;
  ``docs/`` and ``band_index/`` wave dirs are the corpus itself and
  its dedup memory — never GC'd here.

``gc_corpus`` walks one directory tree, recognizes each layout by its
markers, applies the matching GC with one ``keep`` policy, and returns
what it deleted per layout. Reads that the per-layout contracts keep
valid (latest + in-window as_of, mart reads, corpus reads, resumed
ingest) stay valid — pinned in tests/test_gc_corpus.py.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..sources.fsutil import hadoop, read_json
from ..sources.table import (
    _META_FILE,
    gc_bucketed_table,
    gc_table,
    table_epochs,
)
from .corpus_incremental import _MANIFEST, corpus_waves_manifest


def _children(spark: SparkSession, path: str) -> list[str]:
    jvm, jpath, fs = hadoop(spark, path)
    if not fs.exists(jpath):
        return []
    return [
        os.path.join(path, st.getPath().getName())
        for st in fs.listStatus(jpath)
        if st.isDirectory()
    ]


def _gc_corpus_waves(spark: SparkSession, path: str, keep: int) -> list[str]:
    """Delete superseded remap-closure snapshots (each wave rewrites the
    FULL closure; only the newest matters, ``keep`` kept as a margin for
    concurrent readers that resolved their manifest just before GC)."""
    m = corpus_waves_manifest(spark, path)
    waves = sorted(w["wave"] for w in m["waves"])
    victims = waves[:-keep] if len(waves) > keep else []
    deleted = []
    jvm, _, fs = hadoop(spark, path)
    for w in victims:
        rdir = os.path.join(path, "remap", f"wave={w}")
        jb = jvm.org.apache.hadoop.fs.Path(rdir)
        if fs.exists(jb):
            fs.delete(jb, True)
            deleted.append(rdir)
    return deleted


def gc_corpus(
    spark: SparkSession, path: str, keep: int = 2
) -> dict[str, list[str]]:
    """Apply every applicable GC discipline under ``path`` (the dir
    itself and one level of children) with a single keep-last-``keep``
    policy. Returns {layout: [deleted paths]}. Safe by construction:
    each underlying GC preserves latest reads, in-window time travel,
    replay/commit markers, and in-flight writers; unknown layouts are
    left untouched."""
    if keep < 1:
        raise ValueError("gc_corpus: keep must be >= 1")
    from ..streaming.marts import gc_mart_state

    out: dict[str, list[str]] = {}
    for p in [path] + _children(spark, path):
        name = os.path.relpath(p, path) if p != path else "."
        if read_json(spark, os.path.join(p, _MANIFEST)) is not None:
            got = _gc_corpus_waves(spark, p, keep)
            if got:
                out[f"{name}:corpus_waves"] = got
            continue
        if read_json(spark, os.path.join(p, _META_FILE)) is not None:
            got = gc_bucketed_table(spark, p, keep)
            if got:
                out[f"{name}:bucketed_table"] = got
            continue
        jvm, _, fs = hadoop(spark, p)
        is_mart = fs.exists(
            jvm.org.apache.hadoop.fs.Path(os.path.join(p, "sessions_state"))
        ) and fs.exists(
            jvm.org.apache.hadoop.fs.Path(os.path.join(p, "funnel_state"))
        )
        if is_mart:
            got = gc_mart_state(spark, p, keep_epochs=keep)
            if got:
                out[f"{name}:mart_state"] = got
            continue
        if table_epochs(spark, p):
            got = [
                os.path.join(p, f"epoch={e}")
                for e in gc_table(spark, p, keep)
            ]
            if got:
                out[f"{name}:snapshot_table"] = got
    return out
