"""CLI mirroring the reference job runner (Main.java:256-286).

Same flags, same defaults: in / out / result / k=3 / thresh=0.001 /
lines (accepted for parity; the distributed sampler doesn't need a
pre-counted line count) / maxloop=50 / NumReduceTask=1 (mapped to
shuffle partitions). Prints Loop / Time / DBI like Main.java:362-364.

Usage:
    python -m kmeanwithmapreduce_spark.kmeans.cli \
        --in data.csv --dim 7 --out outdir --k 3 --thresh 0.001 --maxloop 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="PySpark K-Means (reference-compatible)")
    p.add_argument("--in", dest="input", required=True, help="header-less CSV of points")
    p.add_argument("--dim", type=int, required=True, help="point arity (explicit schema)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--result", default="result.txt", help="final centroids file name")
    p.add_argument("--k", type=int, default=3)
    p.add_argument("--thresh", type=float, default=0.001)
    p.add_argument("--lines", type=int, default=None, help="accepted for reference parity; unused")
    p.add_argument("--maxloop", type=int, default=50)
    p.add_argument("--NumReduceTask", type=int, default=1)
    p.add_argument("--mode", choices=["compat", "native", "mllib"], default="compat")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--trace",
        action="store_true",
        help="per-iteration centroid/movement dump (reference console tracing)",
    )
    p.add_argument(
        "--init",
        choices=["random", "k-means||"],
        default="random",
        help="native-mode init: reference-parity random sampling or "
        "Bahmani k-means|| (core.init_kmeans_parallel)",
    )
    p.add_argument(
        "--strict-dbi",
        action="store_true",
        help="reproduce the reference's -Infinity empty-cluster DBI "
        "artifact (Main.java:93-111) instead of the default NaN",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from ..session import get_spark
    from ..sources.readers import load_points_csv
    from . import core

    # NumReduceTask maps to shuffle partitions (the reference's reducer
    # count, Main.java:266); default 1 reducer like the reference — the
    # combiner makes that tolerable there and partial aggregation does
    # here. Values >1 parallelize the per-iteration aggregation.
    spark = get_spark(
        "kmeans-cli",
        shuffle_partitions=max(args.NumReduceTask, 1),
    )
    df = load_points_csv(spark, args.input, dim=args.dim)

    if args.mode == "mllib":
        from .mllib import mllib_kmeans

        model, labeled = mllib_kmeans(df, k=args.k, seed=args.seed or 42, max_iter=args.maxloop)
        centroids = [list(map(float, c)) for c in model.clusterCenters()]
        import time

        t0 = time.monotonic()
        dbi = core.davies_bouldin_index(
            labeled, centroids, strict_compat=args.strict_dbi
        )
        n_iter, seconds = model.summary.numIter, time.monotonic() - t0
    else:
        params = core.KMeansParams(
            k=args.k, thresh=args.thresh, max_loop=args.maxloop,
            seed=args.seed, mode=args.mode, init=args.init,
        )
        res = core.lloyd(df, params, trace=args.trace)
        centroids, n_iter, seconds = res.centroids, res.n_iter, res.seconds
        labeled = core.label(df, centroids)
        dbi = core.davies_bouldin_index(
            labeled, centroids, strict_compat=args.strict_dbi
        )

    os.makedirs(args.out, exist_ok=True)
    # compat mode: shortest-float32 formatting, matching the reference's
    # Float.toString sink output textually
    core.write_centroids_text(
        centroids,
        os.path.join(args.out, args.result),
        float32=(args.mode == "compat"),
    )
    print(f"Loop: {n_iter}")
    print(f"Time: {seconds * 1000.0:.0f}")
    print(f"DBI: {dbi}")
    print(json.dumps({"loop": n_iter, "ms": seconds * 1000.0, "dbi": dbi}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
