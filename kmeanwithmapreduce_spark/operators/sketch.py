"""Count-min sketch + heavy hitters — the bounded-memory frequency
structure a 100 TB corpus pass needs (Cormode & Muthukrishnan, "An
improved data stream summary: the count-min sketch and its
applications", J. Algorithms 2005).

Exact n-gram counting keeps one counter per DISTINCT gram — state that
grows with the corpus (web-scale 5-gram spaces run to billions). The
CMS keeps a FIXED depth × width counter grid: every occurrence
increments one counter per row (bucket = row-salted hash of the gram),
and an estimate is the MIN over rows — an overestimate with error
≤ ε·N at probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉. Two
properties make it the right Spark citizen:

- the grid is a pure sum over occurrences → map-side combinable
  (partial aggregation collapses each input split to ≤ depth·width
  rows before the shuffle), and MERGEABLE: sketches of micro-batches /
  shards add cell-wise, so streaming accumulation is a trivial
  foreachBatch upsert;
- everything is exact integer arithmetic over md5-derived buckets
  (the engine's cross-engine hash pattern), so a DuckDB twin computes
  the identical grid and the oracle check is exact, not statistical.

``heavy_hitters`` is the classic two-pass: CMS-filter candidate grams
(estimate ≥ threshold — no false negatives, since estimates only
overestimate), then verify the small candidate set EXACTLY with one
more aggregation. At scale the first pass bounds state at depth·width
and the second pass counts only candidates (semi-join pruned), never
the full gram space.

No reference-repo counterpart (SURVEY §2 Part A is one K-Means job);
extension per the training-pipeline brief ("a novel sketch"). The t08
registry wrapper sits past the frozen 50-entry driver window and is
verified by the in-repo parity sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

_DEPTH = 4
_WIDTH = 1024


def _bucket(col, row: int, width: int, salt: str):
    """Row-salted md5 bucket in [0, width) — the shared cross-engine
    pattern (functions.hashing); DuckDB twin takes '% width' on the
    same u32."""
    from ..functions.hashing import md5_prefix_u32

    return (
        md5_prefix_u32(F.concat_ws(":", F.lit(salt), F.lit(row), col)) % width
    )


def count_min_sketch(
    items: DataFrame,
    item_col: str,
    *,
    depth: int = _DEPTH,
    width: int = _WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Build the CMS grid over every row of ``items`` (one occurrence
    per row; pre-explode n-grams upstream). Returns the SPARSE grid —
    (row, bucket, cnt) for non-empty cells, ≤ depth·width rows however
    large the input.

    Plan: one generate (depth rows per occurrence) → one
    map-side-combined groupBy. Shuffle volume is ≤ depth·width rows per
    input split, NOT per occurrence — the partial aggregation is the
    whole point of the structure.

    NULL items are excluded (a NULL is "no item", not a countable
    value) — without the filter Spark's concat_ws would silently skip
    the NULL and hash the bare salt, a bucket the DuckDB twin ('..' ||
    item → NULL) can never reproduce.
    """
    items = items.where(F.col(item_col).isNotNull())
    rows = items.select(
        F.posexplode(
            F.array(
                *[
                    _bucket(F.col(item_col), i, width, salt)
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket")
    )
    return rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    *,
    depth: int = _DEPTH,
    width: int = _WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Point-query the sketch for every DISTINCT candidate item: the
    min over depth rows of that item's counter (missing cell = 0 —
    only possible when the item never occurred). Returns
    (item_col, est). The sketch side is ≤ depth·width rows →
    broadcast; candidates stay distributed. NULL candidates are
    excluded (count_min_sketch never counted them)."""
    c = (
        candidates.select(item_col)
        .where(F.col(item_col).isNotNull())
        .distinct()
    )
    probes = c.select(
        item_col,
        F.posexplode(
            F.array(
                *[
                    _bucket(F.col(item_col), i, width, salt)
                    for i in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def heavy_hitters(
    items: DataFrame,
    item_col: str,
    threshold: int,
    *,
    depth: int = _DEPTH,
    width: int = _WIDTH,
    salt: str = "cms",
) -> DataFrame:
    """Items occurring ≥ ``threshold`` times, found CMS-first: pass 1
    builds the grid and keeps candidates with estimate ≥ threshold
    (CMS never underestimates → no false negatives); pass 2 counts the
    surviving candidates EXACTLY via a broadcast semi-join and drops
    the false positives. Returns (item_col, est, exact_cnt) for the
    true heavy hitters only.

    At 100 TB: pass-1 state is depth·width counters; pass-2 aggregates
    only rows whose item survived the filter — the full distinct-gram
    space is never keyed. The three passes each re-evaluate ``items``
    (lazy lineage); when the item stream is expensive to produce
    (an n-gram explode over raw text), persist it before calling —
    the operator deliberately leaves caching policy to the caller
    rather than pinning executor memory itself."""
    sketch = count_min_sketch(
        items, item_col, depth=depth, width=width, salt=salt
    )
    cand = cms_estimate(
        sketch, items, item_col, depth=depth, width=width, salt=salt
    ).where(F.col("est") >= threshold)
    exact = (
        items.join(F.broadcast(cand.select(item_col)), item_col, "semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return (
        cand.join(exact, item_col)
        .where(F.col("exact_cnt") >= threshold)
        .select(item_col, "est", "exact_cnt")
    )


def t08_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter 2-grams of the documents corpus (threshold 30,
    deliberately small width=256 so CMS collisions actually occur and
    the exact second pass visibly prunes overestimates)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = d.select(
        F.explode(
            F.when(
                F.size(toks) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram")
    )
    return heavy_hitters(grams, "gram", 30, width=256)


T08_SQL = """
WITH grams AS (
  SELECT g.gram
  FROM (SELECT string_split(text, ' ') AS toks FROM documents) t,
  LATERAL (
    SELECT array_to_string(toks[i:i+1], ' ') AS gram
    FROM UNNEST(range(1, len(toks))) AS u(i)
  ) g
  WHERE len(t.toks) >= 2
), cells AS (
  SELECT r.row_id AS row,
         (CAST(('0x' || substr(md5('cms:' || r.row_id || ':' || gram), 1, 8))
               AS BIGINT) % 256) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM grams, (SELECT UNNEST(range(0, 4)) AS row_id) r
  GROUP BY 1, 2
), probes AS (
  SELECT p.gram, r.row_id AS row,
         (CAST(('0x' || substr(md5('cms:' || r.row_id || ':' || p.gram), 1, 8))
               AS BIGINT) % 256) AS bucket
  FROM (SELECT DISTINCT gram FROM grams) p,
       (SELECT UNNEST(range(0, 4)) AS row_id) r
), est AS (
  SELECT probes.gram, min(coalesce(cells.cnt, 0)) AS est
  FROM probes
  LEFT JOIN cells ON cells.row = probes.row AND cells.bucket = probes.bucket
  GROUP BY probes.gram
), cand AS (
  SELECT gram, est FROM est WHERE est >= 30
), exact AS (
  SELECT g.gram, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM grams g JOIN cand ON g.gram = cand.gram
  GROUP BY g.gram
)
SELECT cand.gram, CAST(cand.est AS BIGINT) AS est, exact.exact_cnt
FROM cand JOIN exact ON cand.gram = exact.gram
WHERE exact.exact_cnt >= 30
"""


# --------------------------------------------------------------------------
# t09 — mergeable HyperLogLog sketches (Spark 4's Apache DataSketches
# HLL surface: hll_sketch_agg / hll_union_agg / hll_sketch_estimate).
# The CMS above answers "how OFTEN"; HLL answers "how MANY distinct"
# in lg_k * ~1 byte registers per key — the structure behind
# incremental distinct-user counts over a sharded / streamed corpus.
# HLL union is register-wise max: associative, commutative, LOSSLESS
# with respect to the final estimate, so per-shard sketches persisted
# today union with tomorrow's batch to the exact same estimate a full
# recount would give — no corpus rescan (the minhash_bands /
# streaming_cms_ingest accumulation pattern, applied to cardinality).
#
# Oracle discipline is j03/j05's: the estimate itself is
# engine-specific, so the compared columns are the exact count plus
# semantic booleans each engine must satisfy — Spark genuinely computes
# merged-equals-direct over its sketch lattice; DuckDB asserts its own
# HLL (approx_count_distinct) sits inside the same accuracy band.


def hll_shard_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    n_shards: int = 16,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch per (key, shard): the persistable unit of an
    incremental distinct-count index. Sharding is md5-based (layout-
    independent) so the SAME value always lands in the same shard —
    re-ingesting a duplicate value touches a sketch that already
    contains it, keeping accumulated estimates duplicate-proof."""
    from ..functions.hashing import md5_prefix_u32

    return (
        df.withColumn(
            "_shard", (md5_prefix_u32(F.col(value_col).cast("string")) % n_shards)
        )
        .groupBy(*key_cols, "_shard")
        .agg(F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("hll_sketch"))
    )


def hll_merge_estimate(sketches: DataFrame, key_cols: list[str]) -> DataFrame:
    """Union per-shard (or per-batch) sketches and estimate: the read
    side of the incremental index. Input column ``hll_sketch`` is the
    binary sketch column hll_shard_sketches emits (parquet-storable)."""
    return sketches.groupBy(*key_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias("n_distinct_est")
    )


def t09_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: exact distinct users, a boolean pinning that the
    16-shard merged estimate equals the direct whole-relation estimate
    (HLL union losslessness — the property that licenses incremental
    accumulation), and a 5% accuracy band vs the exact count."""
    e = load_table(spark, sf_dir, "events")
    direct = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("_d"),
    )
    merged = hll_merge_estimate(
        hll_shard_sketches(e, ["event_type"], "user_id"), ["event_type"]
    )
    return (
        direct.join(merged, "event_type")
        .select(
            "event_type",
            "n_exact",
            (F.col("n_distinct_est") == F.col("_d")).alias("merged_equals_direct"),
            (
                F.abs(F.col("_d") - F.col("n_exact")) <= 0.05 * F.col("n_exact")
            ).alias("hll_within_5pct"),
        )
    )


T09_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS merged_equals_direct,
       abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
         <= 0.05 * count(DISTINCT user_id) AS hll_within_5pct
FROM events
GROUP BY event_type
"""


# t09 registers separately in operators/__init__.py (appended at the
# END of EXTRA_QUERIES — registry positions are append-only so the
# documented positions of earlier entries never shift).
SKETCH_QUERIES = {
    "t08_cms_heavy_hitters": (t08_cms_heavy_hitters, T08_SQL),
}
