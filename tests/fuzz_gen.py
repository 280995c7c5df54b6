"""Seeded random query generator for differential testing vs DuckDB.

Composes the engine's relational surface — filters, join chains along
the FK graph, aggregations (with HAVING and per-aggregate FILTER
clauses), correlated [NOT] EXISTS with subquery-side filters, window
functions, set ops — over the TESTDATA tables, emitting each query
BOTH as a PySpark
DataFrame chain (the engine's native form, not spark.sql) and as the
equivalent ANSI SQL for DuckDB. test_fuzz_parity.py sweeps N seeded
queries per run and value-compares the result sets; a failure prints
the seed and the SQL so the exact query replays.

This is the class of test that catches the next cross-engine semantic
drift (the round-3 TIMESTAMP_NTZ regression shape) anywhere in the
surface, not just at the 50 frozen registry queries.

Determinism rules baked into the grammar:
- window ORDER BY always ends with the relation's unique key, so
  ranking/lag/frames are total-order deterministic; every ORDER BY
  column pins NULLS placement explicitly (engine defaults differ);
- per-row double arithmetic only (both engines do IEEE double ops
  bit-equal); no sample-stddev in the hot set;
- sum/avg/running-sum are GRID aggregates (cents-integer sums, the
  registry's own discipline): raw double accumulation carries
  merge-order ulp noise which the rel=1e-9 VALUE compare tolerates but
  which can flip row-sort alignment (the seed-99991 regression —
  _normalize now also sorts floats by a rounded key as second defense).
  round() inside the grid is safe: inputs sit on value grids, so both
  engines round the identical double far from any .5 boundary.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# catalog: columns by kind, unique keys, FK join graph

TABLES: dict[str, dict[str, list[str]]] = {
    "region": {"key": ["r_regionkey"], "num": [], "cat": ["r_name"], "ts": []},
    "nation": {
        "key": ["n_nationkey", "n_regionkey"],
        "num": [],
        "cat": ["n_name"],
        "ts": [],
    },
    "customer": {
        "key": ["c_custkey", "c_nationkey"],
        "num": ["c_acctbal"],
        "cat": ["c_mktsegment"],
        "ts": [],
    },
    "supplier": {
        "key": ["s_suppkey", "s_nationkey"],
        "num": ["s_acctbal"],
        "cat": [],
        "ts": [],
    },
    "part": {
        "key": ["p_partkey", "p_size"],
        "num": ["p_retailprice"],
        "cat": ["p_brand", "p_type"],
        "ts": [],
    },
    "orders": {
        "key": ["o_orderkey", "o_custkey"],
        "num": ["o_totalprice"],
        "cat": ["o_orderstatus", "o_orderpriority"],
        "ts": ["o_orderdate"],
    },
    "lineitem": {
        "key": ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"],
        "num": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "cat": ["l_returnflag", "l_linestatus"],
        "ts": ["l_shipdate"],
    },
    "events": {
        "key": ["event_id", "user_id"],
        "num": ["value"],
        "cat": ["event_type"],
        "ts": ["ts"],
    },
    "documents": {
        "key": ["doc_id", "n_chars"],
        "num": [],
        "cat": ["lang", "source"],
        "ts": [],
    },
}

UNIQUE_KEY: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
}

# (left_table, right_table, left_col, right_col); chains start at a fact
JOIN_GRAPH: list[tuple[str, str, str, str]] = [
    ("lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem", "part", "l_partkey", "p_partkey"),
    ("lineitem", "supplier", "l_suppkey", "s_suppkey"),
    ("orders", "customer", "o_custkey", "c_custkey"),
    ("customer", "nation", "c_nationkey", "n_nationkey"),
    ("supplier", "nation", "s_nationkey", "n_nationkey"),
    ("nation", "region", "n_regionkey", "r_regionkey"),
]


def load_domains(duck) -> dict:
    """Per-column literal domains sampled once from the actual data (so
    the generator tracks whatever corpus the driver wrote): numeric/key/
    ts min-max, categorical distinct values. Deterministic given data."""
    dom: dict[tuple[str, str], object] = {}
    for t, kinds in TABLES.items():
        for c in kinds["key"] + kinds["num"] + kinds["ts"]:
            lo, hi = duck.execute(f"SELECT min({c}), max({c}) FROM {t}").fetchone()
            dom[(t, c)] = (lo, hi)
        for c in kinds["cat"]:
            vals = [
                r[0]
                for r in duck.execute(
                    f"SELECT DISTINCT {c} FROM {t} ORDER BY {c} LIMIT 40"
                ).fetchall()
                if r[0] is not None
            ]
            dom[(t, c)] = vals
    return dom


# --------------------------------------------------------------------------
# expression nodes: each renders to a pyspark Column and a SQL string


@dataclass
class Ex:
    spark: object  # pyspark Column
    sql: str


def col(name: str) -> Ex:
    return Ex(F.col(name), name)


def num_lit(v: float) -> Ex:
    return Ex(F.lit(float(v)), repr(float(v)))


def int_lit(v: int) -> Ex:
    return Ex(F.lit(int(v)), str(int(v)))


def str_lit(v: str) -> Ex:
    esc = v.replace("'", "''")
    return Ex(F.lit(v), f"'{esc}'")


def ts_lit(iso: str) -> Ex:
    return Ex(F.lit(iso).cast("timestamp"), f"TIMESTAMP '{iso}'")


def binop(op: str, a: Ex, b: Ex) -> Ex:
    return Ex(
        {
            "+": a.spark + b.spark,
            "-": a.spark - b.spark,
            "*": a.spark * b.spark,
            "<": a.spark < b.spark,
            "<=": a.spark <= b.spark,
            ">": a.spark > b.spark,
            ">=": a.spark >= b.spark,
            "=": a.spark == b.spark,
            "<>": a.spark != b.spark,
            "AND": a.spark & b.spark,
            "OR": a.spark | b.spark,
        }[op],
        f"({a.sql} {op} {b.sql})",
    )


def fn(name: str, a: Ex, *extra: Ex) -> Ex:
    sparks = {
        "year": lambda: F.year(a.spark),
        "month": lambda: F.month(a.spark),
        "day": lambda: F.dayofmonth(a.spark),
        "upper": lambda: F.upper(a.spark),
        "lower": lambda: F.lower(a.spark),
        "length": lambda: F.length(a.spark),
        "abs": lambda: F.abs(a.spark),
        "floor": lambda: F.floor(a.spark),
        "ceil": lambda: F.ceil(a.spark),
        "substr": lambda: F.substring(a.spark, int(extra[0].sql), int(extra[1].sql)),
    }
    args = ", ".join([a.sql] + [e.sql for e in extra])
    return Ex(sparks[name](), f"{name}({args})")


def like(a: Ex, pattern: str) -> Ex:
    return Ex(a.spark.like(pattern), f"({a.sql} LIKE '{pattern}')")


def isin(a: Ex, lits: list[Ex]) -> Ex:
    return Ex(
        a.spark.isin([l.spark for l in lits]),
        f"({a.sql} IN ({', '.join(l.sql for l in lits)}))",
    )


# --------------------------------------------------------------------------
# relation: a base table or join chain, with table-qualified SQL FROM


@dataclass
class Relation:
    tables: list[str]
    joins: list[tuple[str, str, str, str, str]]  # (how, right, lcol, rcol, ltab)
    filters: list[Ex] = field(default_factory=list)

    def columns(self, kinds=("key", "num", "cat", "ts")) -> list[tuple[str, str]]:
        out = []
        for t in self.tables:
            for k in kinds:
                out.extend((t, c) for c in TABLES[t][k])
        return out

    def unique_key(self) -> list[str]:
        return [c for t in self.tables for c in UNIQUE_KEY[t]]

    def build(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        from kmeanwithmapreduce_spark.sources.readers import load_table

        df = load_table(spark, sf_dir, self.tables[0])
        for how, right, lcol, rcol, _ltab in self.joins:
            rdf = load_table(spark, sf_dir, right)
            df = df.join(rdf, F.col(lcol) == F.col(rcol), how)
        for f in self.filters:
            df = df.where(f.spark)
        return df

    def from_sql(self) -> str:
        sql = self.tables[0]
        kw = {"inner": "JOIN", "left": "LEFT JOIN", "semi": "SEMI JOIN",
              "anti": "ANTI JOIN"}
        for how, right, lcol, rcol, _ltab in self.joins:
            sql += f" {kw[how]} {right} ON {lcol} = {rcol}"
        return sql

    def where_sql(self) -> str:
        if not self.filters:
            return ""
        return " WHERE " + " AND ".join(f.sql for f in self.filters)


# --------------------------------------------------------------------------
# generator


class FuzzGen:
    def __init__(self, seed: int, domains: dict):
        self.rng = random.Random(seed)
        self.dom = domains

    # -- literals from the sampled domains
    def _lit_for(self, t: str, c: str, kind: str) -> Ex:
        r = self.rng
        d = self.dom[(t, c)]
        if kind == "cat":
            return str_lit(r.choice(d)) if d else str_lit("x")
        lo, hi = d
        if kind == "ts":
            if lo is None:
                return ts_lit("1995-01-01 00:00:00")
            span = (hi - lo).total_seconds() or 1.0
            pick = lo + __import__("datetime").timedelta(
                seconds=r.uniform(0.1, 0.9) * span
            )
            return ts_lit(pick.strftime("%Y-%m-%d %H:%M:%S"))
        if kind == "key":
            lo_i, hi_i = int(lo or 0), int(hi or 1)
            return int_lit(r.randint(lo_i, max(lo_i, hi_i)))
        lo_f, hi_f = float(lo or 0.0), float(hi or 1.0)
        v = r.uniform(lo_f, hi_f)
        return num_lit(float(f"{v:.6g}"))

    def _filter(self, rel: Relation) -> Ex | None:
        r = self.rng
        candidates = rel.columns()
        if not candidates:
            return None
        t, c = r.choice(candidates)
        kind = next(k for k in ("key", "num", "cat", "ts") if c in TABLES[t][k])
        if kind == "cat":
            d = self.dom[(t, c)]
            if not d:
                return None
            shape = r.random()
            if shape < 0.4:
                return binop(r.choice(["=", "<>"]), col(c), str_lit(r.choice(d)))
            if shape < 0.7:
                picks = r.sample(d, min(len(d), r.randint(1, 3)))
                return isin(col(c), [str_lit(v) for v in picks])
            v = r.choice(d)
            return like(col(c), v[: max(1, len(v) // 2)].replace("'", "''") + "%")
        op = r.choice(["<", "<=", ">", ">=", "="] if kind == "key" else
                      ["<", "<=", ">", ">="])
        return binop(op, col(c), self._lit_for(t, c, kind))

    def _relation(self) -> Relation:
        r = self.rng
        shape = r.random()
        if shape < 0.55:
            rel = Relation([r.choice(list(TABLES))], [])
        else:
            start = r.choice(["lineitem", "orders", "customer", "supplier"])
            rel = Relation([start], [])
            hops = r.randint(1, 2)
            for _ in range(hops):
                opts = [e for e in JOIN_GRAPH
                        if e[0] in rel.tables and e[1] not in rel.tables]
                if not opts:
                    break
                lt, rt, lc, rc = r.choice(opts)
                how = r.choices(["inner", "left", "semi", "anti"],
                                weights=[6, 2, 1, 1])[0]
                rel.joins.append((how, rt, lc, rc, lt))
                if how in ("inner", "left"):
                    rel.tables.append(rt)
        for _ in range(r.randint(0, 2)):
            f = self._filter(rel)
            if f is not None:
                rel.filters.append(f)
        return rel

    def _scalar_expr(self, rel: Relation) -> tuple[Ex, str]:
        """A computed projection column over the relation; returns
        (expr, alias)."""
        r = self.rng
        nums = rel.columns(("num",))
        cats = rel.columns(("cat",))
        tss = rel.columns(("ts",))
        choices = []
        if nums:
            choices += ["arith", "mathfn", "case", "coalesce"]
        if cats:
            choices += ["strfn"]
        if tss:
            choices += ["datefn"]
        if not choices:
            t, c = r.choice(rel.columns(("key",)))
            return col(c), f"x_{c}"
        kind = r.choice(choices)
        if kind == "arith":
            (t1, c1) = r.choice(nums)
            if len(nums) > 1 and r.random() < 0.5:
                (t2, c2) = r.choice(nums)
                e = binop(r.choice(["+", "-", "*"]), col(c1), col(c2))
            else:
                e = binop(r.choice(["+", "-", "*"]), col(c1),
                          self._lit_for(t1, c1, "num"))
            return e, f"x_{c1}"
        if kind == "mathfn":
            t, c = r.choice(nums)
            return fn(r.choice(["abs", "floor", "ceil"]), col(c)), f"x_{c}"
        if kind == "coalesce":
            # null semantics drift class: under a left join's unmatched
            # rows the num col is NULL and the fallback must fire
            t, c = r.choice(nums)
            v = self._lit_for(t, c, "num")
            return (
                Ex(
                    F.coalesce(F.col(c), v.spark),
                    f"coalesce({c}, {v.sql})",
                ),
                f"x_{c}",
            )
        if kind == "case":
            t, c = r.choice(nums)
            a_ = self._lit_for(t, c, "num")
            b_ = self._lit_for(t, c, "num")
            lo, hi = sorted([float(a_.sql), float(b_.sql)])
            e = Ex(
                F.when(F.col(c) < lo, F.lit("lo"))
                .when(F.col(c) < hi, F.lit("mid"))
                .otherwise(F.lit("hi")),
                f"(CASE WHEN {c} < {lo!r} THEN 'lo' "
                f"WHEN {c} < {hi!r} THEN 'mid' ELSE 'hi' END)",
            )
            return e, f"x_{c}"
        if kind == "strfn":
            t, c = r.choice(cats)
            f_ = r.choice(["upper", "lower", "length"])
            if r.random() < 0.3:
                return fn("substr", col(c), int_lit(1), int_lit(3)), f"x_{c}"
            return fn(f_, col(c)), f"x_{c}"
        t, c = r.choice(tss)
        return fn(r.choice(["year", "month", "day"]), col(c)), f"x_{c}"

    # -- query shapes; each returns (build_fn, sql)

    def _q_aggregation(self, rel: Relation):
        r = self.rng
        group_pool = rel.columns(("cat",)) + [
            (t, c) for t, c in rel.columns(("key",)) if c.endswith("key")
        ]
        n_keys = r.randint(0, min(2, len(group_pool)))
        keys = [c for _t, c in r.sample(group_pool, n_keys)] if n_keys else []
        # sometimes a ROLLUP over the plain column keys (grouping-set
        # expansion + NULL total rows — its own cross-engine drift class).
        # CHARACTERIZED DIVERGENCE (found by the 400-query sweep,
        # idx 309): on EMPTY input Spark's Expand-based rollup returns 0
        # rows while DuckDB (standard semantics, like PostgreSQL) emits
        # the grand-total grouping set as one count-0 row. Both sides get
        # HAVING count(*) > 0 — a no-op on any non-empty grouping set —
        # so the sweep compares the shared semantics and the divergence
        # stays documented here instead of flaking the harness.
        # SECOND CHARACTERIZED DIVERGENCE (seed 95959, idx 125): when two
        # rollup keys are linked by a join equality (ROLLUP(o_orderkey,
        # l_orderkey) over lineitem JOIN orders ON l_orderkey =
        # o_orderkey), DuckDB 1.0.0 propagates the equivalence INTO the
        # grouping-set NULL-extension and fills the rolled-away key with
        # its join partner's value; Spark (standard semantics — the
        # non-grouped key is NULL in subtotal rows, that's what
        # GROUPING() exists for) emits NULL. Pinned executable in
        # tests/test_fuzz_parity.py::test_duckdb_rollup_join_equivalence_divergence;
        # the grammar avoids drawing rollup keys from the same join
        # equivalence class (transitive, via union-find over join edges).
        eq = {}

        def _find(x):
            while eq.get(x, x) != x:
                eq[x] = eq.get(eq[x], eq[x])
                x = eq[x]
            return x

        for _how, _rt, lc, rc, _lt in rel.joins:
            eq.setdefault(lc, lc)
            eq.setdefault(rc, rc)
            eq[_find(lc)] = _find(rc)
        rollup_safe = len({_find(k) for k in keys}) == len(keys)
        use_rollup = bool(keys) and rollup_safe and r.random() < 0.2
        # ts-derived group key sometimes: year() or a date_trunc bucket
        if rel.columns(("ts",)) and r.random() < 0.3:
            t, c = r.choice(rel.columns(("ts",)))
            if r.random() < 0.5:
                keys_ex = [(fn("year", col(c)), f"y_{c}")]
            else:
                keys_ex = [(
                    Ex(
                        F.date_trunc("month", F.col(c)),
                        f"date_trunc('month', {c})",
                    ),
                    f"m_{c}",
                )]
        else:
            keys_ex = []
        nums = rel.columns(("num",))
        # (op, expr, alias, domain) — domain feeds value-HAVING thresholds
        aggs: list[tuple[str, Ex | None, str, tuple | None]] = [
            ("count", None, "cnt", None)
        ]
        for i in range(r.randint(1, 3)):
            if nums and r.random() < 0.8:
                t, c = r.choice(nums)
                op = r.choice(["sum", "avg", "min", "max"])
                aggs.append((op, col(c), f"a{i}_{op}_{c}", self.dom[(t, c)]))
            else:
                t, c = r.choice(rel.columns(("key", "cat")))
                aggs.append(("count_distinct", col(c), f"a{i}_cd_{c}", None))
        # FILTER-clause conditional aggregation: one sum/min/max gets a
        # per-aggregate predicate (ANSI `agg(x) FILTER (WHERE p)`;
        # Spark expresses it as agg(CASE WHEN p THEN x END)). Groups
        # where the predicate never fires yield NULL on both engines —
        # the null-propagation corner this shape exists to sweep.
        filt_idx, filt_pred = None, None
        if r.random() < 0.3:
            eligible = [
                i for i, a in enumerate(aggs) if a[0] in ("sum", "min", "max")
            ]
            p = self._filter(rel)
            if eligible and p is not None:
                filt_idx, filt_pred = r.choice(eligible), p
        having = None
        if r.random() < 0.35:
            # HAVING on the row count, or on a value aggregate (avg/min/
            # max thresholds drawn from the column's real domain so the
            # predicate is selective, not vacuous); sum(x) scales with
            # group size, so only the size-independent aggs get one
            # the FILTERed agg is excluded: HAVING must repeat the
            # aggregate expression (alias refs aren't portable ANSI) and
            # a FILTER clause inside HAVING is itself non-portable
            value_aggs = [
                a
                for i, a in enumerate(aggs)
                if i > 0 and a[0] in ("avg", "min", "max") and a[3]
                and i != filt_idx
            ]
            if value_aggs and r.random() < 0.5:
                op, _e, alias, (lo, hi) = r.choice(value_aggs)
                lo_f, hi_f = float(lo or 0.0), float(hi or 1.0)
                thr = float(f"{r.uniform(lo_f, hi_f):.6g}")
                having = (alias, r.choice([">", ">="]), thr)
            else:
                having = ("cnt", r.choice([">", ">="]), r.randint(1, 5))

        def build(spark, sf_dir):
            df = rel.build(spark, sf_dir)
            gcols = [F.col(k) for k in keys] + [
                e.spark.alias(a) for e, a in keys_ex
            ]
            agg_cols = []
            for i, (op, e, alias, _dom) in enumerate(aggs):
                arg = e.spark if e is not None else None
                if i == filt_idx:
                    arg = F.when(filt_pred.spark, arg)
                if op == "count":
                    agg_cols.append(F.count(F.lit(1)).alias(alias))
                elif op == "count_distinct":
                    agg_cols.append(F.countDistinct(arg).alias(alias))
                elif op == "sum":
                    # grid-sum (registry discipline): cents-integer sums
                    # are bit-identical across engines; raw double sums
                    # carry merge-order ulp noise (seed-99991 regression)
                    agg_cols.append(
                        (
                            F.sum(F.round(arg * 100).cast("long")) / 100.0
                        ).alias(alias)
                    )
                elif op == "avg":
                    agg_cols.append(
                        (
                            F.sum(F.round(e.spark * 100).cast("long"))
                            * 1.0
                            / F.count(F.lit(1))
                            / 100.0
                        ).alias(alias)
                    )
                else:
                    agg_cols.append(getattr(F, op)(arg).alias(alias))
            if use_rollup and not keys_ex:
                out = df.rollup(*gcols).agg(*agg_cols).where(F.col("cnt") > 0)
            elif keys or keys_ex:
                out = df.groupBy(*gcols).agg(*agg_cols)
            else:
                out = df.agg(*agg_cols)
            if having:
                out = out.where(F.col(having[0]) > having[2]
                                if having[1] == ">" else
                                F.col(having[0]) >= having[2])
            return out

        sel = list(keys) + [f"{e.sql} AS {a}" for e, a in keys_ex]
        agg_sql: dict[str, str] = {}
        for i, (op, e, alias, _dom) in enumerate(aggs):
            flt = f" FILTER (WHERE {filt_pred.sql})" if i == filt_idx else ""
            if op == "count":
                agg_sql[alias] = "count(*)"
            elif op == "count_distinct":
                agg_sql[alias] = f"count(DISTINCT {e.sql})"
            elif op == "sum":
                agg_sql[alias] = (
                    f"(sum(CAST(round(({e.sql}) * 100) AS BIGINT)){flt}"
                    f" / 100.0)"
                )
            elif op == "avg":
                agg_sql[alias] = (
                    f"(sum(CAST(round(({e.sql}) * 100) AS BIGINT)) * 1.0"
                    f" / count(*) / 100.0)"
                )
            else:
                agg_sql[alias] = f"{op}({e.sql}){flt}"
            sel.append(f"{agg_sql[alias]} AS {alias}")
        sql = f"SELECT {', '.join(sel)} FROM {rel.from_sql()}{rel.where_sql()}"
        gb = list(keys) + [e.sql for e, _a in keys_ex]
        if use_rollup and not keys_ex:
            sql += " GROUP BY ROLLUP (" + ", ".join(keys) + ")"
        elif gb:
            sql += " GROUP BY " + ", ".join(gb)
        hav = []
        if having:
            # HAVING by the aggregate's own expression (alias references
            # in HAVING are a DuckDB extension, not portable ANSI)
            hav.append(f"{agg_sql[having[0]]} {having[1]} {having[2]!r}")
        if use_rollup and not keys_ex:
            hav.append("count(*) > 0")  # see divergence note above
        if hav:
            sql += " HAVING " + " AND ".join(hav)
        return build, sql

    def _q_projection(self, rel: Relation):
        r = self.rng
        base_cols = [c for _t, c in r.sample(rel.columns(), min(3, len(rel.columns())))]
        exprs = []
        for _ in range(r.randint(1, 2)):
            e, a = self._scalar_expr(rel)
            if a not in [x[1] for x in exprs]:
                exprs.append((e, a))
        distinct = r.random() < 0.25

        def build(spark, sf_dir):
            df = rel.build(spark, sf_dir)
            out = df.select(
                *[F.col(c) for c in base_cols],
                *[e.spark.alias(a) for e, a in exprs],
            )
            return out.distinct() if distinct else out

        sel = base_cols + [f"{e.sql} AS {a}" for e, a in exprs]
        kw = "SELECT DISTINCT" if distinct else "SELECT"
        sql = f"{kw} {', '.join(sel)} FROM {rel.from_sql()}{rel.where_sql()}"
        return build, sql

    def _q_window(self, rel: Relation):
        r = self.rng
        parts = rel.columns(("cat",)) or rel.columns(("key",))
        pt, pc = r.choice(parts)
        nums = rel.columns(("num",)) or rel.columns(("key",))
        ot, oc = r.choice(nums)
        uk = rel.unique_key()
        order_cols = [oc] + [k for k in uk if k != oc]
        wf = r.choice(
            ["row_number", "rank", "dense_rank", "lag", "running_sum", "range_sum",
             "ntile", "percent_rank", "cume_dist"]
        )
        ntile_n = r.choice([2, 3, 7])
        # range_sum: RANGE frame over a cents-integer key (the q35 frame
        # class). Value-distance peers make it deterministic without a
        # unique-key tiebreak; NULL keys (left-join unmatched rows) are
        # coalesced to a sentinel so both engines agree on their peer
        # group instead of falling into engine-specific NULL-frame rules.
        range_bound = r.choice([100, 5000, 250000])

        def build(spark, sf_dir):
            df = rel.build(spark, sf_dir)
            w = Window.partitionBy(pc).orderBy(*[F.col(c) for c in order_cols])
            if wf == "row_number":
                e = F.row_number().over(w)
            elif wf == "rank":
                e = F.rank().over(w)
            elif wf == "dense_rank":
                e = F.dense_rank().over(w)
            elif wf == "lag":
                e = F.lag(F.col(oc), 1).over(w)
            elif wf == "ntile":
                e = F.ntile(ntile_n).over(w)
            elif wf == "percent_rank":
                # exact ratio of BIGINTs — both engines compute
                # (rank-1)/(n-1) in IEEE double, bit-equal
                e = F.percent_rank().over(w)
            elif wf == "cume_dist":
                e = F.cume_dist().over(w)
            elif wf == "range_sum":
                key = F.coalesce(
                    F.round(F.col(oc) * 100).cast("long"),
                    F.lit(-(10**15)),
                )
                wr = (
                    Window.partitionBy(pc)
                    .orderBy(key)
                    .rangeBetween(-range_bound, 0)
                )
                e = (
                    F.sum(F.round(F.col(oc) * 100).cast("long")).over(wr)
                    / 100.0
                )
            else:
                # grid the running sum: ordered prefix sums of doubles
                # need not associate identically across engines
                e = (
                    F.sum(F.round(F.col(oc) * 100).cast("long")).over(
                        w.rowsBetween(
                            Window.unboundedPreceding, Window.currentRow
                        )
                    )
                    / 100.0
                )
            cols_ = uk + ([pc] if pc not in uk else [])
            return df.select(*[F.col(k) for k in cols_], e.alias("wv"))

        # Spark ASC defaults to NULLS FIRST, DuckDB to NULLS LAST — pin
        # it (order cols can be NULL under a left join's unmatched rows)
        ob = ", ".join(f"{c} NULLS FIRST" for c in order_cols)
        if wf in ("row_number", "rank", "dense_rank", "percent_rank", "cume_dist"):
            we = f"{wf}() OVER (PARTITION BY {pc} ORDER BY {ob})"
        elif wf == "ntile":
            we = f"ntile({ntile_n}) OVER (PARTITION BY {pc} ORDER BY {ob})"
        elif wf == "lag":
            we = f"lag({oc}, 1) OVER (PARTITION BY {pc} ORDER BY {ob})"
        elif wf == "range_sum":
            key_sql = (
                f"coalesce(CAST(round(({oc}) * 100) AS BIGINT), "
                f"-1000000000000000)"
            )
            we = (
                f"(sum(CAST(round(({oc}) * 100) AS BIGINT)) OVER "
                f"(PARTITION BY {pc} ORDER BY {key_sql} "
                f"RANGE BETWEEN {range_bound} PRECEDING AND CURRENT ROW) "
                "/ 100.0)"
            )
        else:
            we = (
                f"(sum(CAST(round(({oc}) * 100) AS BIGINT)) OVER "
                f"(PARTITION BY {pc} ORDER BY {ob} "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0)"
            )
        sel = ", ".join(
            uk + ([pc] if pc not in uk else []) + [f"{we} AS wv"]
        )
        sql = f"SELECT {sel} FROM {rel.from_sql()}{rel.where_sql()}"
        return build, sql

    def _q_topk(self, rel: Relation):
        """Deterministic top-k: optionally lead with a numeric column
        (explicit NULLS pinning — Spark desc defaults NULLS LAST where
        DuckDB defaults NULLS FIRST, a real cross-engine drift class),
        then ALWAYS tiebreak by the relation's unique key so LIMIT is a
        total order. Exercises TakeOrderedAndProject."""
        r = self.rng
        uk = rel.unique_key()
        desc = r.random() < 0.5
        m = r.choice([5, 20, 100])
        nums = rel.columns(("num",))
        lead = r.choice(nums)[1] if nums and r.random() < 0.5 else None
        carry = [c for _t, c in r.sample(rel.columns(), min(2, len(rel.columns())))
                 if c not in uk and c != lead]

        def build(spark, sf_dir):
            df = rel.build(spark, sf_dir)
            order = []
            if lead is not None:
                order.append(
                    F.col(lead).desc_nulls_last()
                    if desc
                    else F.col(lead).asc_nulls_first()
                )
            order += [F.col(c).desc() if desc else F.col(c).asc() for c in uk]
            cols_ = ([lead] if lead is not None else []) + uk + carry
            return df.select(*[F.col(c) for c in cols_]).orderBy(*order).limit(m)

        # pin EVERY order col's null placement to Spark's defaults
        # (desc = NULLS LAST, asc = NULLS FIRST); DuckDB's defaults are
        # the opposite, and uk cols of a left join's right table CAN be
        # NULL on unmatched rows
        direction = "DESC NULLS LAST" if desc else "ASC NULLS FIRST"
        ob_parts = []
        if lead is not None:
            ob_parts.append(f"{lead} {direction}")
        ob_parts += [f"{c} {direction}" for c in uk]
        sel_cols = ([lead] if lead is not None else []) + uk + carry
        sql = (
            f"SELECT {', '.join(sel_cols)} FROM {rel.from_sql()}"
            f"{rel.where_sql()} ORDER BY {', '.join(ob_parts)} LIMIT {m}"
        )
        return build, sql

    def _q_setop(self):
        r = self.rng
        t = r.choice(["lineitem", "orders", "customer", "events", "documents"])
        rel_a = Relation([t], [])
        rel_b = Relation([t], [])
        for rel in (rel_a, rel_b):
            f = self._filter(rel)
            if f is not None:
                rel.filters.append(f)
        cols_ = UNIQUE_KEY[t] + [c for c in TABLES[t]["cat"][:1]]
        op = r.choice(["union_all", "union", "intersect", "except"])

        def build(spark, sf_dir):
            a = rel_a.build(spark, sf_dir).select(*cols_)
            b = rel_b.build(spark, sf_dir).select(*cols_)
            if op == "union_all":
                return a.unionAll(b)
            if op == "union":
                return a.union(b).distinct()
            if op == "intersect":
                return a.intersect(b)
            return a.subtract(b)

        kw = {"union_all": "UNION ALL", "union": "UNION",
              "intersect": "INTERSECT", "except": "EXCEPT"}[op]
        sel = ", ".join(cols_)
        sql = (
            f"SELECT {sel} FROM {rel_a.from_sql()}{rel_a.where_sql()} "
            f"{kw} "
            f"SELECT {sel} FROM {rel_b.from_sql()}{rel_b.where_sql()}"
        )
        return build, sql

    def _q_exists(self):
        """Correlated [NOT] EXISTS with a filter INSIDE the subquery —
        the decorrelation shape _relation's semi/anti joins never reach
        (those attach filters only to outer-visible tables). Spark plans
        it as a Left[Semi|Anti] join against the pre-filtered build
        side; DuckDB runs the textbook correlated subquery."""
        r = self.rng
        lt, rt, lc, rc = r.choice(JOIN_GRAPH)
        negate = r.random() < 0.4
        rel = Relation([lt], [])
        for _ in range(r.randint(0, 2)):
            f = self._filter(rel)
            if f is not None:
                rel.filters.append(f)
        sub_f = self._filter(Relation([rt], []))
        cols = list(UNIQUE_KEY[lt]) + [
            c for _t, c in rel.columns(("num", "cat"))
        ][:2]

        def build(spark, sf_dir):
            from kmeanwithmapreduce_spark.sources.readers import load_table

            df = load_table(spark, sf_dir, lt)
            for f in rel.filters:
                df = df.where(f.spark)
            sub = load_table(spark, sf_dir, rt)
            if sub_f is not None:
                sub = sub.where(sub_f.spark)
            df = df.join(
                sub, F.col(lc) == F.col(rc), "anti" if negate else "semi"
            )
            return df.select(*cols)

        kw = "NOT EXISTS" if negate else "EXISTS"
        sub_where = f" AND {sub_f.sql}" if sub_f is not None else ""
        preds = [f.sql for f in rel.filters] + [
            f"{kw} (SELECT 1 FROM {rt} WHERE {rc} = {lt}.{lc}{sub_where})"
        ]
        sql = (
            f"SELECT {', '.join(cols)} FROM {lt}"
            f" WHERE {' AND '.join(preds)}"
        )
        return build, sql

    def _q_agg_join(self):
        """Aggregate-then-join: the child fact rolls up by its FK, and
        the PARENT left-joins the rollup — the shape that exercises
        join-on-aggregate-output semantics (unmatched parents NULL-
        extend the agg columns; NULL child FKs group but never match).
        Distinct from _relation's join chains, which only ever join raw
        tables, and from _q_union_agg, which aggregates after a union.
        Grid-exact sums (the running grammar rule)."""
        r = self.rng
        edges = [
            (lt, rt, lc, rc)
            for lt, rt, lc, rc in JOIN_GRAPH
            if TABLES[lt]["num"]
        ]
        lt, rt, lc, rc = r.choice(edges)
        num = r.choice(TABLES[lt]["num"])
        child_rel = Relation([lt], [])
        child_f = self._filter(child_rel)
        pk = UNIQUE_KEY[rt][0]

        def build(spark, sf_dir):
            from kmeanwithmapreduce_spark.sources.readers import load_table

            child = load_table(spark, sf_dir, lt)
            if child_f is not None:
                child = child.where(child_f.spark)
            agg = child.groupBy(F.col(lc).alias("k")).agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                (
                    F.sum(F.round(F.col(num) * 100).cast("long")) / 100.0
                ).alias("sx"),
            )
            parent = load_table(spark, sf_dir, rt)
            return parent.join(
                agg, F.col(rc) == F.col("k"), "left"
            ).select(
                pk,
                F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("cnt"),
                F.coalesce(F.col("sx"), F.lit(0.0)).alias("sx"),
            )

        wh = f" WHERE {child_f.sql}" if child_f is not None else ""
        sql = (
            f"SELECT {pk}, CAST(coalesce(a.cnt, 0) AS BIGINT) AS cnt,"
            " coalesce(a.sx, 0.0) AS sx"
            f" FROM {rt} LEFT JOIN ("
            f"SELECT {lc} AS k, CAST(count(*) AS BIGINT) AS cnt,"
            f" (sum(CAST(round(({num}) * 100) AS BIGINT)) / 100.0) AS sx"
            f" FROM {lt}{wh} GROUP BY {lc}"
            f") a ON {rc} = a.k"
        )
        return build, sql

    def _q_union_agg(self):
        """UNION ALL of two differently-filtered branches of one table,
        then a grouped aggregate over the union — the composition where
        union column resolution / duplicate preservation drift would
        surface (plain _q_setop aggregates nothing downstream)."""
        r = self.rng
        t = r.choice(
            [tb for tb in TABLES if TABLES[tb]["num"] and TABLES[tb]["cat"]]
        )
        branches = []
        for _ in range(2):
            rel = Relation([t], [])
            f = self._filter(rel)
            if f is not None:
                rel.filters.append(f)
            branches.append(rel)
        _t, num = r.choice([(t, c) for c in TABLES[t]["num"]])
        cat = r.choice(TABLES[t]["cat"])

        def build(spark, sf_dir):
            from kmeanwithmapreduce_spark.sources.readers import load_table

            parts = []
            for rel in branches:
                df = load_table(spark, sf_dir, t)
                for f in rel.filters:
                    df = df.where(f.spark)
                parts.append(
                    df.select(F.col(cat).alias("g"), F.col(num).alias("x"))
                )
            return (
                parts[0]
                .unionByName(parts[1])
                .groupBy("g")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    (
                        F.sum(F.round(F.col("x") * 100).cast("long")) / 100.0
                    ).alias("sx"),
                )
            )

        branch_sql = " UNION ALL ".join(
            f"SELECT {cat} AS g, {num} AS x FROM {t}{rel.where_sql()}"
            for rel in branches
        )
        sql = (
            "SELECT g, count(*) AS cnt,"
            " (sum(CAST(round((x) * 100) AS BIGINT)) / 100.0) AS sx"
            f" FROM ({branch_sql}) u GROUP BY g"
        )
        return build, sql

    def query(self):
        """One random (build_fn, sql) pair."""
        r = self.rng
        shape = r.random()
        if shape < 0.10:
            return self._q_setop()
        if shape < 0.17:
            return self._q_exists()
        if shape < 0.22:
            return self._q_union_agg()
        if shape < 0.27:
            return self._q_agg_join()
        rel = self._relation()
        if shape < 0.52:
            return self._q_aggregation(rel)
        if shape < 0.74:
            return self._q_projection(rel)
        if shape < 0.84:
            return self._q_topk(rel)
        return self._q_window(rel)
