"""Deterministic scale-factor data generator for local scale testing.

The driver's /root/testdata ships sf0.001/0.01/0.1 (read-only); proving
the scale story needs bigger corpora than the driver provides. This
script regenerates the same table shapes at any multiple of sf0.1 —
matching row-count ratios, key cardinalities, join fan-out, value
domains, date ranges, categorical distributions, text vocabulary +
length + near-dup rate, and event-per-user density sampled from the
real sf0.1 — so per-query time ratios between sf0.1 and the generated
sf are a faithful scaling signal.

All columns are pure functions of (row id, salt) via xxhash64 — no
rand(), so the corpus is bit-identical across runs, partitionings, and
cluster layouts (the same determinism discipline as the engine's
samplers). Generation is fully distributed: spark.range -> expressions,
one write per table, no driver-side data.

Usage:
  python scripts/gen_sf.py --out /tmp/sf1 --scale 10   # sf1 = 10x sf0.1
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# sf0.1 row counts; --scale multiplies these
BASE = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
    "event_users": 1_500,
}

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
PADJ = ["large", "hot", "blue", "old", "cold", "small", "dim", "plated"]
PNOUN = ["ring", "bolt", "plate", "screw", "washer", "nut"]
ETYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = [("en", 0.41), ("de", 0.15), ("es", 0.15), ("fr", 0.14), ("zh", 0.15)]
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]


def _u(salt: str, *cols) -> F.Column:
    """Deterministic uniform in [0, 1): xxhash64 of (salt, cols...)."""
    return (
        F.pmod(F.xxhash64(F.lit(salt), *cols), F.lit(1_000_000)) / 1_000_000.0
    )


def _pick(salt: str, values: list[str], *cols) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(
        arr, (F.pmod(F.xxhash64(F.lit(salt), *cols), F.lit(len(values))) + 1).cast("int")
    )


def _write(df: DataFrame, out: str, name: str) -> None:
    df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
    print(f"wrote {name}")


def gen(
    spark: SparkSession, out: str, scale: float,
    tables: set[str] | None = None,
) -> None:
    n = {k: int(v * scale) for k, v in BASE.items()}
    oid = F.col("id")

    def _want(name: str) -> bool:
        return tables is None or name in tables

    region = spark.createDataFrame(
        list(enumerate(REGIONS)), "r_regionkey int, r_name string"
    )
    if _want("region"):
        _write(region, out, "region")

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("n_regionkey"),
    )
    if _want("nation"):
        _write(nation, out, "nation")

    customer = spark.range(n["customer"]).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias(
            "c_name"
        ),
        F.pmod(F.xxhash64(F.lit("cnat"), oid), F.lit(25)).cast("int").alias(
            "c_nationkey"
        ),
        F.round(_u("cbal", oid) * 11000.0 - 1000.0, 2).alias("c_acctbal"),
        _pick("cseg", SEGMENTS, oid).alias("c_mktsegment"),
    )
    if _want("customer"):
        _write(customer, out, "customer")

    supplier = spark.range(n["supplier"]).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id").cast("string"), 9, "0")).alias(
            "s_name"
        ),
        F.pmod(F.xxhash64(F.lit("snat"), oid), F.lit(25)).cast("int").alias(
            "s_nationkey"
        ),
        F.round(_u("sbal", oid) * 9000.0 + 1000.0, 2).alias("s_acctbal"),
    )
    if _want("supplier"):
        _write(supplier, out, "supplier")

    part = spark.range(n["part"]).select(
        F.col("id").alias("p_partkey"),
        F.concat_ws(" ", _pick("padj", PADJ, oid), _pick("pnoun", PNOUN, oid)).alias(
            "p_name"
        ),
        F.concat(
            F.lit("Brand#"),
            F.pmod(F.xxhash64(F.lit("pbrand"), oid), F.lit(25)).cast("string"),
        ).alias("p_brand"),
        _pick("ptype", PTYPES, oid).alias("p_type"),
        (F.pmod(F.xxhash64(F.lit("psize"), oid), F.lit(50)) + 1).cast("int").alias(
            "p_size"
        ),
        F.round(F.lit(900.0) + _u("pprice", oid) * 100.0, 2).alias("p_retailprice"),
    )
    if _want("part"):
        _write(part, out, "part")

    orders = spark.range(n["orders"]).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64(F.lit("ocust"), oid), F.lit(n["customer"])).alias(
            "o_custkey"
        ),
        _pick("ostat", ["O", "P", "F"], oid).alias("o_orderstatus"),
        F.round(F.lit(1000.0) + _u("ototal", oid) * 499000.0, 2).alias("o_totalprice"),
        (
            F.lit("1995-01-01").cast("timestamp")
            + F.make_interval(
                days=F.pmod(F.xxhash64(F.lit("odate"), oid), F.lit(2404)).cast("int")
            )
        ).alias("o_orderdate"),
        _pick("oprio", PRIORITIES, oid).alias("o_orderpriority"),
    )
    if _want("orders"):
        _write(orders, out, "orders")

    # lineitem: explode each order into 1..7 lines (uniform, avg 4 —
    # matches sf0.1's 4.08 fan-out); line columns keyed on (order, line)
    li_base = orders.select(
        "o_orderkey", "o_orderdate",
        F.explode(
            F.sequence(
                F.lit(0),
                F.pmod(F.xxhash64(F.lit("nlines"), F.col("o_orderkey")), F.lit(7)).cast(
                    "int"
                ),
            )
        ).alias("ln"),
    )
    lk = [F.col("o_orderkey"), F.col("ln")]
    lineitem = li_base.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.pmod(F.xxhash64(F.lit("lpart"), *lk), F.lit(n["part"])).alias("l_partkey"),
        F.pmod(F.xxhash64(F.lit("lsupp"), *lk), F.lit(n["supplier"])).alias(
            "l_suppkey"
        ),
        (F.col("ln") + 1).cast("int").alias("l_linenumber"),
        (F.pmod(F.xxhash64(F.lit("lqty"), *lk), F.lit(50)) + 1).cast("double").alias(
            "l_quantity"
        ),
        F.round(F.lit(900.0) + _u("lprice", *lk) * 104100.0, 2).alias(
            "l_extendedprice"
        ),
        (
            F.pmod(F.xxhash64(F.lit("ldisc"), *lk), F.lit(11)).cast("double") / 100.0
        ).alias("l_discount"),
        (
            F.pmod(F.xxhash64(F.lit("ltax"), *lk), F.lit(9)).cast("double") / 100.0
        ).alias("l_tax"),
        _pick("lret", ["A", "N", "R"], *lk).alias("l_returnflag"),
        _pick("lstat", ["F", "O"], *lk).alias("l_linestatus"),
        (
            F.col("o_orderdate")
            + F.make_interval(
                days=(F.pmod(F.xxhash64(F.lit("lship"), *lk), F.lit(95)) + 1).cast(
                    "int"
                )
            )
        ).alias("l_shipdate"),
    )
    if _want("lineitem"):
        _write(lineitem, out, "lineitem")

    eid = F.col("id")
    events = spark.range(n["events"]).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01").cast("timestamp")
            + F.make_interval(
                secs=F.pmod(F.xxhash64(F.lit("ets"), eid), F.lit(30 * 86400 * 1000))
                / 1000.0
            )
        ).alias("ts"),
        F.pmod(F.xxhash64(F.lit("euser"), eid), F.lit(n["event_users"])).alias(
            "user_id"
        ),
        _pick("etype", ETYPES, eid).alias("event_type"),
        F.round(_u("evalue", eid) * 560.0 * _u("evalue2", eid), 2).alias("value"),
        F.concat(
            F.lit('{"k": '),
            F.pmod(F.xxhash64(F.lit("eprops"), eid), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )
    if _want("events"):
        _write(events, out, "events")

    # documents: word sequence is a pure function of (doc id, position),
    # so a near-dup can regenerate its base doc's sequence and perturb
    # one position — same mechanism class as the driver corpus (~5%
    # near-dups + a few exact copies), giving d02/d03/components real
    # work at every scale.
    did = F.col("id")
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    is_dup = (_u("isdup", did) < 0.05) & (did >= 50)
    base_id = F.when(
        is_dup, did - 1 - F.pmod(F.xxhash64(F.lit("dbase"), did), F.lit(50))
    ).otherwise(did)
    n_words = (
        F.pmod(F.xxhash64(F.lit("dlen"), base_id), F.lit(91)) + 10
    ).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab_arr,
            (
                F.pmod(F.xxhash64(F.lit("dword"), base_id, i), F.lit(len(VOCAB))) + 1
            ).cast("int"),
        ),
    )
    # perturb ONE position for near-dups (exact copies when the swapped
    # word happens to equal the original — a few per corpus, as in sf0.1)
    perturb_pos = (F.pmod(F.xxhash64(F.lit("dpos"), did), n_words.cast("bigint")) + 1)
    words = F.when(
        is_dup,
        F.transform(
            words,
            lambda w, i: F.when(
                (i + 1) == perturb_pos,
                F.element_at(
                    vocab_arr,
                    (
                        F.pmod(F.xxhash64(F.lit("dswap"), did), F.lit(len(VOCAB))) + 1
                    ).cast("int"),
                ),
            ).otherwise(w),
        ),
    ).otherwise(words)
    lang_expr = F.lit("en")
    acc = 0.0
    u_lang = _u("dlang", did)
    for code, w in LANGS[1:]:
        lang_expr = F.when(
            (u_lang >= acc) & (u_lang < acc + w), F.lit(code)
        ).otherwise(lang_expr)
        acc += w
    documents = spark.range(n["documents"]).select(
        did.alias("doc_id"),
        F.concat_ws(" ", words).alias("text"),
        lang_expr.alias("lang"),
        F.concat(
            F.lit("src"),
            F.pmod(F.xxhash64(F.lit("dsrc"), did), F.lit(20)).cast("string"),
        ).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    if _want("documents"):
        _write(documents, out, "documents")

    # embeddings: 10 well-separated hash-derived centers + per-point
    # noise, 64-d float — same cluster structure/value scale as sf0.1
    vid = F.col("id")
    dims = F.sequence(F.lit(0), F.lit(63))
    label = F.pmod(F.xxhash64(F.lit("elabel"), vid), F.lit(10))
    center = F.transform(
        dims,
        lambda d: (
            F.pmod(F.xxhash64(F.lit("ecenter"), label, d), F.lit(1000)) / 1000.0 * 0.6
            - 0.3
        ),
    )
    noise = F.transform(
        dims,
        lambda d: (
            F.pmod(F.xxhash64(F.lit("enoise"), vid, d), F.lit(1000)) / 1000.0 * 0.1
            - 0.05
        ),
    )
    embeddings = spark.range(n["embeddings"]).select(
        vid.alias("vec_id"),
        F.zip_with(center, noise, lambda c, z: (c + z).cast("float")).alias(
            "embedding"
        ),
        label.cast("int").alias("label"),
    )
    if _want("embeddings"):
        _write(embeddings, out, "embeddings")


def main() -> int:
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--scale", type=float, default=10.0, help="multiple of sf0.1 (10 => sf1)"
    )
    ap.add_argument(
        "--tables", default=None,
        help="comma list of tables to generate (default: all) — big-scale "
        "rehearsals that need only documents/embeddings skip the 600M-row "
        "lineitem build",
    )
    args = ap.parse_args()

    from kmeanwithmapreduce_spark.session import get_spark

    spark = get_spark("gen_sf")
    spark.sparkContext.setLogLevel("ERROR")
    tables = set(args.tables.split(",")) if args.tables else None
    gen(spark, args.out, args.scale, tables=tables)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
