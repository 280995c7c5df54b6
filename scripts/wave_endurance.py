"""10-wave incremental-ingest endurance run (round-9 SCALE evidence).

Drives ingest_corpus_wave through N waves of synthetic documents with
three deliberately mixed populations per wave:

- FILLER: unique random-word docs (the normal crawl body);
- EXACT DUPS: a slice of wave-0 filler repeated verbatim under new ids
  (cross-wave duplicates — dropped, never retired, since monotone ids
  keep the old canonical minimal);
- BRIDGES: per word-family i, wave 0 emits two moderately-overlapping
  docs A_i and D_i; a later wave emits B_i overlapping both. For the
  families where MinHash banding separates A/D initially but collides
  B with each, the bridge MERGES two existing clusters and RETIRES the
  larger canonical — the remap-closure growth path. (Which families
  fire is hash luck by design; the run reports the measured count.)

Mid-run, gc_corpus prunes superseded remap snapshots; the run then
continues ingesting and finishes with a read_corpus validity check —
the long-lived-corpus story (growth + retirement + GC + resume)
measured end-to-end.

Prints one JSON line per wave {wave, wall_s, input, kept,
retro_dropped, closure_rows} and a final summary line. Protocol per
the repo's measurement rules: check the load stamps before treating
the walls as evidence.

Usage: python scripts/wave_endurance.py [--waves 10] [--docs 20000]
       [--families 400] [--gc-at 5] [--corpus /tmp/wave_endurance]
"""

from __future__ import annotations

import argparse
import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _family_words(i: int) -> list[str]:
    return [f"f{i}w{j}" for j in range(26)]


def _texts(i: int) -> tuple[str, str, str]:
    w = _family_words(i)
    return (
        " ".join(w[0:18]),   # A_i
        " ".join(w[8:26]),   # D_i
        " ".join(w[4:22]),   # B_i
    )


def _filler(rng: random.Random, doc_id: int) -> str:
    n = rng.randint(25, 60)
    return " ".join(f"v{rng.randint(0, 200000)}" for _ in range(n))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=10)
    ap.add_argument("--docs", type=int, default=20000, help="filler docs/wave")
    ap.add_argument("--families", type=int, default=400)
    ap.add_argument("--gc-at", type=int, default=5)
    ap.add_argument("--corpus", default="/tmp/wave_endurance")
    args = ap.parse_args()

    from kmeanwithmapreduce_spark.operators.corpus_incremental import (
        corpus_waves_manifest,
        ingest_corpus_wave,
        read_corpus,
    )
    from kmeanwithmapreduce_spark.operators.gc import gc_corpus
    from kmeanwithmapreduce_spark.session import get_spark

    shutil.rmtree(args.corpus, ignore_errors=True)
    spark = get_spark("wave_endurance")
    spark.sparkContext.setLogLevel("ERROR")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    wave0_filler: list[str] = []
    print(json.dumps({"load_start": os.getloadavg(), "t": time.time()}))
    per_wave = []
    for k in range(args.waves):
        rng = random.Random(1000 + k)
        base = (k + 1) * 10_000_000
        rows = []
        # filler (plus the stored copies from wave 0 for later dup reuse)
        for j in range(args.docs):
            t = _filler(rng, base + j)
            if k == 0 and j < args.docs // 10:
                wave0_filler.append(t)
            rows.append((base + j, t, "en", f"src{j % 20}", len(t)))
        nxt = base + args.docs
        if k == 0:
            for i in range(args.families):
                a, d, _b = _texts(i)
                rows.append((nxt, a, "en", "fam", len(a))); nxt += 1
                rows.append((nxt, d, "en", "fam", len(d))); nxt += 1
        else:
            # 10% exact cross-wave duplicates of wave-0 filler
            for t in wave0_filler[: args.docs // 10]:
                rows.append((nxt, t, "en", "dup", len(t))); nxt += 1
            # this wave's bridge slice
            fam_lo = (k - 1) * args.families // max(1, args.waves - 1)
            fam_hi = k * args.families // max(1, args.waves - 1)
            for i in range(fam_lo, fam_hi):
                _a, _d, b = _texts(i)
                rows.append((nxt, b, "en", "fam", len(b))); nxt += 1
        df = spark.createDataFrame(rows, schema)
        t0 = time.monotonic()
        stats = ingest_corpus_wave(spark, df, args.corpus, k, quality_threshold=0.0)
        wall = round(time.monotonic() - t0, 2)
        m = corpus_waves_manifest(spark, args.corpus)
        closure = spark.read.parquet(
            os.path.join(args.corpus, "remap", f"wave={k}")
        ).count()
        line = {
            "wave": k,
            "wall_s": wall,
            "input": stats["input"],
            "kept": m["waves"][-1]["n_kept"],
            "retro_dropped": stats["retro_dropped"],
            "closure_rows": closure,
        }
        per_wave.append(line)
        print(json.dumps(line))
        if k == args.gc_at:
            deleted = gc_corpus(spark, args.corpus, keep=2)
            print(json.dumps({"gc_at_wave": k, "deleted": sum(len(v) for v in deleted.values())}))
    n_final = read_corpus(spark, args.corpus).count()
    print(json.dumps({
        "final_corpus_docs": n_final,
        "total_retired": sum(w["retro_dropped"] for w in per_wave),
        "final_closure_rows": per_wave[-1]["closure_rows"],
        "walls": [w["wall_s"] for w in per_wave],
        "load_end": os.getloadavg(),
    }))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
