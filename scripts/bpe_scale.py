"""Production-vocab BPE measurement (round-7 task): train + apply at
8k and 32k merges, print one JSON line per config. Feeds the SCALE.md
"BPE at production vocab" rows.

Two corpora:

- the given sf dir's documents table (the registry input). NOTE: the
  driver-generated synthetic corpus holds only ~31 distinct words, so
  BPE training runs dry after ~100 merges there — it cannot exercise a
  production vocabulary by construction.
- ``--synthetic``: a seeded Zipf corpus with a REALISTIC vocabulary
  (default 500k distinct pseudo-words, lengths 3-14 chars, Zipf ranks)
  — this is what actually stresses the driver merge loop (pair-index
  size grows with the word table) and the per-task encode cache
  (distinct-word count >> BoundedCache cap exercises clear-at-cap).

Usage:
  python scripts/bpe_scale.py [sf_dir] [n_merges ...]
  python scripts/bpe_scale.py --synthetic [n_merges ...]
  python scripts/bpe_scale.py --synthetic --byte 8192   (byte-level mode)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SEED = 42
_N_VOCAB = 500_000
_N_DOCS = 50_000
_WORDS_PER_DOC = 300


def _synthetic_corpus(spark):
    """Seeded Zipf corpus: ~15M word tokens over a 500k-word vocab."""
    import numpy as np

    rng = np.random.default_rng(_SEED)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lengths = rng.integers(3, 15, size=_N_VOCAB)
    flat = rng.integers(0, 26, size=int(lengths.sum()))
    vocab, pos = [], 0
    for ln in lengths:
        vocab.append("".join(letters[flat[pos : pos + ln]]))
        pos += ln
    vocab = np.array(vocab)
    # Zipf draw: P(rank r) ~ 1/(r+1); inverse-CDF over the harmonic sum
    probs = 1.0 / np.arange(1, _N_VOCAB + 1)
    probs /= probs.sum()
    draws = rng.choice(_N_VOCAB, size=_N_DOCS * _WORDS_PER_DOC, p=probs)
    words = vocab[draws].reshape(_N_DOCS, _WORDS_PER_DOC)
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": range(_N_DOCS), "text": [" ".join(r) for r in words]}
    )
    return spark.createDataFrame(pdf).repartition(32).cache()


def main() -> int:
    args = sys.argv[1:]
    synthetic = "--synthetic" in args
    mode = "byte" if "--byte" in args else "char"
    args = [a for a in args if a not in ("--synthetic", "--byte")]
    sf_dir = (
        args[0]
        if args and not args[0].isdigit()
        else "/root/testdata/sf0.1"
    )
    merge_counts = [int(a) for a in args if a.isdigit()] or [8192, 32768]

    from kmeanwithmapreduce_spark.functions.bpe import (
        _CACHE_MAX_WORDS,
        BPETokenizer,
        bpe_count_col,
        train_merges,
        word_frequencies,
    )
    from kmeanwithmapreduce_spark.session import get_spark
    from kmeanwithmapreduce_spark.sources.readers import load_table

    spark = get_spark("bpe_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if synthetic:
        docs = _synthetic_corpus(spark)
        corpus = f"synthetic-zipf(vocab={_N_VOCAB},docs={_N_DOCS})"
    else:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        corpus = sf_dir
    n_docs = docs.count()
    total_chars = docs.selectExpr("sum(length(text))").first()[0]
    n_distinct_words = (
        docs.selectExpr("explode(split(text, '\\\\s+')) AS w")
        .where("w <> ''")
        .selectExpr("count(DISTINCT w)")
        .first()[0]
    )

    for n_merges in merge_counts:
        top_words = 8 * n_merges
        t0 = time.monotonic()
        wf = word_frequencies(docs, top_words=top_words)
        t_wordtable = time.monotonic() - t0

        t0 = time.monotonic()
        merges = train_merges(wf, n_merges=n_merges, min_count=2, mode=mode)
        t_train = time.monotonic() - t0

        tok = BPETokenizer(merges, mode)
        t0 = time.monotonic()
        bpe_count_col(docs, tok).write.format("noop").mode("overwrite").save()
        t_apply_cold = time.monotonic() - t0
        t0 = time.monotonic()
        total_tokens = (
            bpe_count_col(docs, tok).selectExpr("sum(n_tokens)").first()[0]
        )
        t_apply_warm = time.monotonic() - t0

        merge_table_bytes = sum(len(a) + len(b) for a, b in merges)
        print(
            json.dumps(
                {
                    "corpus": corpus,
                    "mode": mode,
                    "n_docs": n_docs,
                    "total_chars": int(total_chars),
                    "n_distinct_words": int(n_distinct_words),
                    "cache_cap_words": _CACHE_MAX_WORDS,
                    "n_merges_requested": n_merges,
                    "n_merges_trained": len(merges),
                    "top_words": top_words,
                    "word_table_rows": len(wf),
                    "t_word_table_s": round(t_wordtable, 2),
                    "t_merge_loop_s": round(t_train, 2),
                    "t_apply_cold_s": round(t_apply_cold, 2),
                    "t_apply_warm_s": round(t_apply_warm, 2),
                    "total_tokens": int(total_tokens),
                    "tokens_per_s_warm": int(total_tokens / t_apply_warm),
                    "merge_table_kb": merge_table_bytes // 1024,
                    "load_start_1m": round(os.getloadavg()[0], 2),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
