"""Unigram-LM trainer/apply measurement (round-11 task): train + apply
at production-ish vocab sizes, print one JSON line per config. Feeds
the SCALE.md "unigram-LM at production vocab" rows.

Same two corpora as bpe_scale.py:

- the given sf dir's documents table (the t14 registry input — tiny
  31-word vocabulary, trivially small EM by construction);
- ``--synthetic``: a seeded Zipf corpus with a REALISTIC vocabulary
  (500k distinct pseudo-words) — what actually stresses the
  distributed E-step (20k-word lattices per iteration, 64k-piece
  seed) and the Viterbi apply cache.

Usage:
  python scripts/unigram_scale.py [sf_dir] [vocab_size ...]
  python scripts/unigram_scale.py --synthetic [vocab_size ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bpe_scale import _synthetic_corpus  # noqa: E402 (same seeded corpus)


def main() -> int:
    args = sys.argv[1:]
    synthetic = "--synthetic" in args
    args = [a for a in args if a != "--synthetic"]
    sf_dir = (
        args[0]
        if args and not args[0].isdigit()
        else "/root/testdata/sf0.1"
    )
    vocab_sizes = [int(a) for a in args if a.isdigit()] or [8192]

    from kmeanwithmapreduce_spark.functions.unigram import train_unigram
    from kmeanwithmapreduce_spark.session import get_spark
    from kmeanwithmapreduce_spark.sources.readers import load_table

    spark = get_spark("unigram_scale")
    spark.sparkContext.setLogLevel("ERROR")
    if synthetic:
        docs = _synthetic_corpus(spark)
        corpus = "synthetic-zipf(vocab=500000,docs=50000)"
    else:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        corpus = sf_dir
    n_docs = docs.count()
    total_chars = docs.selectExpr("sum(length(text))").first()[0]

    for vocab_size in vocab_sizes:
        seed_size = 8 * vocab_size
        t0 = time.monotonic()
        tok = train_unigram(
            docs,
            vocab_size=vocab_size,
            top_words=20_000,
            seed_size=seed_size,
            max_piece_len=8,
        )
        t_train = time.monotonic() - t0

        t0 = time.monotonic()
        tok.count_col(docs).write.format("noop").mode("overwrite").save()
        t_apply_cold = time.monotonic() - t0
        t0 = time.monotonic()
        total_tokens = (
            tok.count_col(docs).selectExpr("sum(n_tokens)").first()[0]
        )
        t_apply_warm = time.monotonic() - t0

        print(
            json.dumps(
                {
                    "corpus": corpus,
                    "n_docs": n_docs,
                    "total_chars": int(total_chars),
                    "vocab_size_requested": vocab_size,
                    "vocab_size_final": len(tok.pieces_counts),
                    "seed_size": seed_size,
                    "train_sec": round(t_train, 1),
                    "apply_cold_sec": round(t_apply_cold, 1),
                    "apply_warm_sec": round(t_apply_warm, 1),
                    "total_tokens": int(total_tokens),
                    "load": tuple(round(v, 2) for v in os.getloadavg()),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
