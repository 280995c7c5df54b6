"""Production-vocab BPE measurement (round-7 task): train + apply at
8k and 32k merges over a given sf dir's documents table, print one JSON
line per config. Feeds the SCALE.md "BPE at production vocab" rows.

Usage: python scripts/bpe_scale.py [sf_dir] [n_merges ...]
Defaults: /root/testdata/sf0.1, merges 8192 and 32768, top_words 8x the
merge count (the word table must be big enough that the merge loop
doesn't run dry; production trainers size it the same way).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    merge_counts = [int(a) for a in sys.argv[2:]] or [8192, 32768]

    from kmeanwithmapreduce_spark.functions.bpe import (
        BPETokenizer,
        bpe_count_col,
        train_merges,
        word_frequencies,
    )
    from kmeanwithmapreduce_spark.session import get_spark
    from kmeanwithmapreduce_spark.sources.readers import load_table

    spark = get_spark("bpe_scale")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    total_chars = docs.selectExpr("sum(length(text))").first()[0]

    for n_merges in merge_counts:
        top_words = 8 * n_merges
        t0 = time.monotonic()
        wf = word_frequencies(docs, top_words=top_words)
        t_wordtable = time.monotonic() - t0

        t0 = time.monotonic()
        merges = train_merges(wf, n_merges=n_merges, min_count=2)
        t_train = time.monotonic() - t0

        tok = BPETokenizer(merges)
        t0 = time.monotonic()
        bpe_count_col(docs, tok).write.format("noop").mode("overwrite").save()
        t_apply_cold = time.monotonic() - t0
        t0 = time.monotonic()
        total_tokens = (
            bpe_count_col(docs, tok).selectExpr("sum(n_tokens)").first()[0]
        )
        t_apply_warm = time.monotonic() - t0

        # driver-side closure cost: what each task rebuilds
        merge_table_bytes = sum(len(a) + len(b) for a, b in merges)
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_docs": n_docs,
                    "total_chars": int(total_chars),
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
            )
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
