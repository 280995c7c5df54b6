"""File-level data skipping: per-file min/max column statistics in a
``_file_stats.json`` sidecar, consulted at PLAN time to drop whole
files before the scan — the Delta/Iceberg data-skipping design,
completing layout.py's Z-order work (Z-order tightens per-file value
ranges; parquet row-group stats already skip WITHIN an opened file,
but only a file-level sidecar lets the planner avoid listing a file
in the scan at all — at 100 TB the difference between touching every
footer of a million files and touching a JSON the driver already
holds).

Design:

- ``write_file_stats`` computes min/max (+ null/row counts) per file
  with ONE distributed aggregation over the just-written directory
  (``input_file_name()`` group keys — no driver-side footer walking,
  works on any Hadoop FS) and writes the sidecar atomically
  (fsutil.write_json tmp+rename). Called on a STAGED epoch dir by the
  table layer, the sidecar rides the commit rename in atomically with
  the data.
- ``pruned_files`` intersects a ``[lower, upper]`` predicate with each
  file's ``[min, max]``; files missing from the sidecar, files with an
  all-NULL column, and columns the sidecar doesn't carry are KEPT
  (skipping is an optimization, never a correctness gate).
- ``scan_table`` / ``scan_bucketed_table`` are the pruned read paths
  for the two table formats: resolve the epoch exactly like
  read_table / read_bucketed_table, prune per epoch-dir sidecar, read
  only the survivors, and re-apply the predicate (pruning is
  file-granular; the residual filter still pushes down to the
  surviving parquet row groups).

Stats are OPT-IN per write (``stats_columns=[...]``). Since round 11
they are FOLDED INTO THE WRITE: ``write_file_stats`` harvests the
min/max/null-count the parquet writer already computed into every
file's FOOTER (``harvest_file_stats`` — O(files) metadata reads,
distributed over executors above a small file count, ZERO extra
passes over the data), the moral equivalent of Delta collecting stats
inside the write task. Columns the footers cannot serve (no stats
written, unsupported physical encoding, non-local filesystem) fall
back per-column to the original one-pass distributed aggregation
(``collect_file_stats``) — the sidecar format and the read path are
identical either way, and a column is NEVER silently dropped from the
requested set.

Footer-harvest safety: parquet min/max statistics are either exact or
valid WIDER bounds (parquet-mr truncates long values conservatively
and omits stats entirely above the size cap or when NaN poisons the
ordering), and absent stats make the column fall back to the scan —
so harvested pruning can only keep extra files, never lose rows.

Value encoding in JSON: numbers stay native (ints round-trip exactly;
floats are IEEE doubles both sides), strings stay native, date/
timestamp serialize as ISO-8601 strings — zero-padded, so
lexicographic comparison equals temporal comparison. ``_comparable``
normalizes predicate bounds the same way.

Reference parity: no reference analog (the reference is a single
K-Means job, SURVEY §2 Part A); training-data-pipeline extension.
"""

from __future__ import annotations

import datetime
import decimal
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import quote_ident
from .fsutil import hadoop, qualified, read_json, write_json

STATS_FILE = "_file_stats.json"

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def eligible_columns(df: DataFrame) -> list[str]:
    """Columns min/max skipping can serve: atomic orderable types.
    Nested/binary/map/array columns are excluded (no useful total
    order for range predicates)."""
    out = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        if t in _NUMERIC or t == "string" or t == "date" or t.startswith(
            "timestamp"
        ) or t.startswith("decimal"):
            out.append(f.name)
    return out


def _path_of(uri: str) -> str:
    """The path component of a file URI — ``input_file_name()`` emits
    ``file:///p`` while Hadoop's makeQualified emits ``file:/p``; both
    (and bare paths) normalize to ``/p`` so dir-relative sidecar keys
    match regardless of which side produced the string."""
    from urllib.parse import urlparse

    return urlparse(uri).path or uri


def _rel_to(dir_path: str, file_uri: str) -> str:
    base = _path_of(dir_path).rstrip("/") + "/"
    p = _path_of(file_uri)
    return p[len(base):] if p.startswith(base) else p


def _jsonable(v):
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def _comparable(v, col_type: str):
    """Normalize a predicate bound or a sidecar value into the single
    comparable domain used for pruning decisions — BY THE SIDECAR
    COLUMN'S TYPE, not the bound's Python type (round-10 ADVICE): a
    ``date`` column's sidecar max ``'1997-01-05'`` compares
    lexicographically LESS THAN a datetime bound's
    ``'1997-01-05T00:00:00'``, so mixed-shape ISO strings would prune a
    file whose boundary-date rows DO match the residual Spark filter
    (where the date coerces to a midnight timestamp). Date columns
    therefore truncate datetime bounds to their date (conservative for
    a lower bound — Spark's ``date >= ts`` with a time-of-day admits
    one day fewer — and exact for an upper bound); timestamp columns
    expand date bounds to midnight, matching Spark's coercion."""
    if v is None:
        return None
    if col_type == "date":
        if isinstance(v, datetime.datetime):  # datetime IS-A date: first
            return v.date().isoformat()
        if isinstance(v, datetime.date):
            return v.isoformat()
        if isinstance(v, str):
            return v[:10]  # ISO datetime string -> its date part
        return v
    if col_type.startswith("timestamp"):
        if isinstance(v, datetime.datetime):
            return v.isoformat()
        if isinstance(v, datetime.date):
            return datetime.datetime(v.year, v.month, v.day).isoformat()
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if col_type.startswith("decimal"):
        return decimal.Decimal(str(v))
    return v


def collect_file_stats(
    spark: SparkSession, dir_path: str, columns: list[str] | None = None
) -> dict:
    """Per-file stats for the parquet files under ``dir_path`` (any
    depth — bucket partition subdirs included), one distributed agg:
    {"columns": {col: type}, "files": {relpath: {"rows": n,
    col: [min, max, n_null]}}}. File keys are dir-relative so the
    sidecar survives a staged-dir rename."""
    df = spark.read.parquet(dir_path)
    cols, types = _resolve_stat_types(df, dir_path, columns)
    aggs = [F.count(F.lit(1)).alias("_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"_min_{c}"),
            F.max(c).alias(f"_max_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"_null_{c}"),
        ]
    rows = (
        df.groupBy(F.input_file_name().alias("_f")).agg(*aggs).collect()
    )
    qdir = qualified(spark, dir_path)
    files = {}
    for r in rows:
        rel = _rel_to(qdir, r["_f"])
        entry = {"rows": int(r["_rows"])}
        for c in cols:
            entry[c] = [
                _jsonable(r[f"_min_{c}"]),
                _jsonable(r[f"_max_{c}"]),
                int(r[f"_null_{c}"] or 0),
            ]
        files[rel] = entry
    return {"columns": types, "files": files}


def _resolve_stat_types(
    df: DataFrame, dir_path: str, columns: list[str] | None
) -> tuple[list[str], dict]:
    cols = columns if columns is not None else eligible_columns(df)
    types = {
        f.name: f.dataType.simpleString()
        for f in df.schema.fields
        if f.name in cols
    }
    missing = [c for c in cols if c not in types]
    if missing:
        raise ValueError(
            f"file stats: column(s) {missing} not in {dir_path} "
            f"(has: {[f.name for f in df.schema.fields]})"
        )
    return cols, types


def _list_parquet(spark: SparkSession, dir_path: str) -> list[str]:
    """Qualified URIs of the parquet data files under ``dir_path``
    (any depth), hidden/underscore names excluded."""
    jvm, _, fs = hadoop(spark, dir_path)
    out = []
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(dir_path), True)
    while it.hasNext():
        p = it.next().getPath().toString()
        name = p.rsplit("/", 1)[1]
        if name.startswith(("_", ".")) or not p.endswith(".parquet"):
            continue
        out.append(p)
    return out


def _from_footer(v, col_type: str):
    """A footer statistics value mapped toward the sidecar's value
    domain, or None when the encoding can't be trusted — the caller
    then falls back to the scan for that column. tz-aware timestamps
    stay TZ-AWARE here (absolute instants compare correctly for the
    min/max folds on the executors); ``_to_collect_domain`` converts
    them on the DRIVER, because the collect domain is driver-OS-local
    naive, not session-tz naive (round-11 ADVICE: PySpark's
    ``TimestampType.fromInternal`` uses ``fromtimestamp`` — the OS
    zone — and naive predicate literals go through ``toInternal``'s
    ``mktime``, also the OS zone; normalizing footers to
    ``spark.sql.session.timeZone`` instead would offset min/max by the
    OS-vs-session delta and wrongly prune matching files)."""
    if v is None or isinstance(v, bytes):
        return None
    if isinstance(v, float) and v != v:  # NaN ordering differs from Spark's
        return None
    return v


def _to_collect_domain(v):
    """Driver-side: a tz-aware footer timestamp → the naive OS-local
    datetime ``collect()`` would have produced for the same instant.
    Runs on the DRIVER ONLY (collect_file_stats collects on the
    driver, so the driver's OS zone defines the sidecar domain; an
    executor with a different OS zone must not bake its own in)."""
    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone().replace(tzinfo=None)
    return v


def _footer_stats_one(path: str, cols: list[str], types: dict) -> dict:
    """One file's sidecar entry from its parquet FOOTER only: columns
    the footer can't serve exactly are OMITTED from the entry (the
    caller scans just those), never guessed."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx: dict[str, int] = {}
    if md.num_row_groups:
        rg0 = md.row_group(0)
        idx = {
            rg0.column(i).path_in_schema: i for i in range(rg0.num_columns)
        }
    entry = {"rows": int(md.num_rows)}
    for c in cols:
        i = idx.get(c)
        if i is None and md.num_rows:
            continue  # column not flat in this file: scan fallback
        mn = mx = None
        nulls = 0
        ok = True
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            if rg.num_rows == 0:
                continue
            st = rg.column(i).statistics
            if st is None or st.null_count is None:
                ok = False
                break
            nulls += int(st.null_count)
            if not st.has_min_max:
                if st.null_count == rg.num_rows:
                    continue  # all-null row group: no min/max to add
                ok = False
                break
            vmn = _from_footer(st.min, types[c])
            vmx = _from_footer(st.max, types[c])
            if vmn is None or vmx is None:
                ok = False
                break
            mn = vmn if mn is None or vmn < mn else mn
            mx = vmx if mx is None or vmx > mx else mx
        if ok:
            # raw values (tz-aware datetimes included) — the DRIVER
            # converts to the collect domain and JSON-encodes
            entry[c] = [mn, mx, int(nulls)]
    return entry


def harvest_file_stats(
    spark: SparkSession, dir_path: str, columns: list[str] | None = None
) -> dict | None:
    """Per-file stats harvested from the parquet FOOTERS the write
    already produced — no pass over the data, O(files) metadata reads,
    run as a Spark job over the file list when it is large. Returns
    None when the directory is not on a locally-readable filesystem
    (the caller falls back to the distributed scan); individual
    columns a footer can't serve are omitted from that file's entry."""
    df = spark.read.parquet(dir_path)
    cols, types = _resolve_stat_types(df, dir_path, columns)
    uris = _list_parquet(spark, dir_path)
    paths = []
    for u in uris:
        if "://" in u and not u.startswith("file:"):
            return None  # non-local FS: footers need an FS client here
        paths.append(_path_of(u))
    if len(paths) > 32:
        # a million-file epoch reads footers on the executors; only the
        # tiny per-file entries come back to the driver
        rows = (
            spark.sparkContext.parallelize(paths, max(2, len(paths) // 32))
            .map(lambda p: (p, _footer_stats_one(p, cols, types)))
            .collect()
        )
    else:
        rows = [(p, _footer_stats_one(p, cols, types)) for p in paths]
    qdir = qualified(spark, dir_path)
    files = {}
    for p, entry in rows:
        out = {"rows": entry["rows"]}
        for c in cols:
            if c in entry:
                mn, mx, nulls = entry[c]
                out[c] = [
                    _jsonable(_to_collect_domain(mn)),
                    _jsonable(_to_collect_domain(mx)),
                    nulls,
                ]
        files[_rel_to(qdir, p)] = out
    return {"columns": types, "files": files}


def write_file_stats(
    spark: SparkSession,
    dir_path: str,
    columns: list[str] | None = None,
    method: str = "auto",
) -> dict:
    """Collect and persist the sidecar into ``dir_path`` (atomic
    tmp+rename; the leading underscore keeps parquet readers away).
    ``method="auto"`` harvests the parquet footers (no data pass) and
    scans ONLY the columns the footers couldn't serve; ``"scan"``
    forces the original one-pass aggregation. Returns the stats
    written."""
    if method not in ("auto", "scan", "footer"):
        raise ValueError(f"write_file_stats: unknown method {method!r}")
    stats = None
    if method != "scan":
        stats = harvest_file_stats(spark, dir_path, columns)
    if stats is None:
        stats = collect_file_stats(spark, dir_path, columns)
    else:
        short = sorted(
            c
            for c in stats["columns"]
            if any(c not in e for e in stats["files"].values())
        )
        if short and method == "footer":
            raise ValueError(
                f"write_file_stats(method='footer'): footers cannot "
                f"serve column(s) {short} under {dir_path}"
            )
        if short:
            scanned = collect_file_stats(spark, dir_path, short)
            for rel, e in scanned["files"].items():
                tgt = stats["files"].setdefault(rel, {"rows": e["rows"]})
                for c in short:
                    if c in e:
                        tgt[c] = e[c]
    write_json(spark, os.path.join(dir_path, STATS_FILE), stats)
    return stats


def read_file_stats(spark: SparkSession, dir_path: str) -> dict | None:
    return read_json(spark, os.path.join(dir_path, STATS_FILE))


def _norm_predicates(
    column: str | None, lower, upper, predicates: dict | None
) -> dict:
    """One predicate dict {col: spec} from the single-column sugar
    and/or the multi-column ``predicates`` form. Accepted per-column
    spec shapes:

    - ``(lo, hi)`` — inclusive range, either side None for unbounded;
    - ``{"lower": lo, "upper": hi, "in": [...], "not_in": [...]}`` —
      any subset of keys, ANDed together. ``in`` is the IN-list fast
      path (prunes every file whose [min, max] contains none of the
      values); ``not_in`` prunes files that are provably CONSTANT at
      an excluded value (min == max ∈ list) — the only thing min/max
      stats can prove for a negation.

    Specs normalize to the dict form; empty specs (nothing bounded —
    their trivial TRUE residual keeps NULL rows) drop out. A None
    inside ``in`` drops out (``x IN (..., NULL)`` never matches on
    NULL); a None inside ``not_in`` makes the predicate vacuously
    false (three-valued logic: ``x NOT IN (..., NULL)`` is never
    TRUE), encoded as ``{"never": True}`` — every file prunes and the
    residual filter returns no rows, consistently."""
    raw = dict(predicates or {})
    if column is not None:
        raw[column] = (lower, upper)
    out = {}
    for c, spec in raw.items():
        if isinstance(spec, dict):
            unknown = set(spec) - {"lower", "upper", "in", "not_in"}
            if unknown:
                raise ValueError(
                    f"predicate for {c!r}: unknown key(s) {sorted(unknown)}"
                )
            norm = {}
            if spec.get("lower") is not None:
                norm["lower"] = spec["lower"]
            if spec.get("upper") is not None:
                norm["upper"] = spec["upper"]
            if spec.get("in") is not None:
                vals = list(spec["in"])
                norm["in"] = [v for v in vals if v is not None]
            if spec.get("not_in") is not None:
                vals = list(spec["not_in"])
                if any(v is None for v in vals):
                    norm = {"never": True}
                elif vals:
                    norm["not_in"] = vals
        else:
            lo, hi = spec
            norm = {}
            if lo is not None:
                norm["lower"] = lo
            if hi is not None:
                norm["upper"] = hi
        if norm:
            out[c] = norm
    return out


def pruned_files(
    spark: SparkSession,
    dir_path: str,
    column: str | None = None,
    lower=None,
    upper=None,
    predicates: dict | None = None,
) -> tuple[list[str], int]:
    """(surviving parquet file paths under ``dir_path``, total file
    count). A file survives when EVERY bounded predicate's [lo, hi]
    intersects its [min, max] (the multi-column AND — the Z-order box
    shape); files with missing stats for a column, unknown files, or
    an absent sidecar are KEPT — skipping never loses rows, it only
    avoids provably-irrelevant files."""
    all_files = _list_parquet(spark, dir_path)
    qdir = qualified(spark, dir_path)
    preds = _norm_predicates(column, lower, upper, predicates)
    if not preds:
        return all_files, len(all_files)
    stats = read_file_stats(spark, dir_path)
    if stats is None:
        return all_files, len(all_files)
    keep = []
    for p in all_files:
        entry = stats["files"].get(_rel_to(qdir, p))
        if entry is None:
            keep.append(p)  # unknown file: never skip blind
            continue
        survives = True
        for col, spec in preds.items():
            if spec.get("never"):
                survives = False  # vacuously-false predicate (NOT IN
                break  # with a NULL): nothing can match anywhere
            ctype = stats["columns"].get(col)
            if ctype is None or col not in entry:
                continue  # no stats for this column: cannot prune on it
            fmin, fmax, _nnull = entry[col]
            if fmin is None or fmax is None:
                # min/max NULL => every value NULL; no bounded / IN /
                # NOT-IN predicate ever matches NULL — prune
                survives = False
                break
            fmin = _comparable(fmin, ctype)
            fmax = _comparable(fmax, ctype)
            lo = _comparable(spec.get("lower"), ctype)
            hi = _comparable(spec.get("upper"), ctype)
            if (lo is not None and fmax < lo) or (
                hi is not None and fmin > hi
            ):
                survives = False
                break
            if "in" in spec:
                vals = [_comparable(v, ctype) for v in spec["in"]]
                # a file survives only if SOME listed value could be
                # present, i.e. falls inside [min, max]
                if not any(fmin <= v <= fmax for v in vals):
                    survives = False
                    break
            if "not_in" in spec and fmin == fmax:
                # constant file: min/max can PROVE exclusion
                vals = [_comparable(v, ctype) for v in spec["not_in"]]
                if fmin in vals:
                    survives = False
                    break
        if survives:
            keep.append(p)
    return keep, len(all_files)


def _bounded_filter(
    column: str | None, lower, upper, predicates: dict | None = None
):
    """The residual Spark filter matching the pruning predicate exactly
    — reapplied to the surviving files (pruning is file-granular; this
    still pushes down into the surviving row groups)."""
    cond = F.lit(True)
    for col, spec in _norm_predicates(
        column, lower, upper, predicates
    ).items():
        if spec.get("never"):
            cond = cond & F.lit(False)
            continue
        if "lower" in spec:
            cond = cond & (F.col(col) >= F.lit(spec["lower"]))
        if "upper" in spec:
            cond = cond & (F.col(col) <= F.lit(spec["upper"]))
        if "in" in spec:
            cond = cond & F.col(col).isin(spec["in"])
        if "not_in" in spec:
            cond = cond & ~F.col(col).isin(spec["not_in"])
    return cond


def scan_table(
    spark: SparkSession,
    table_path: str,
    column: str | None = None,
    lower=None,
    upper=None,
    as_of: int | None = None,
    predicates: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Pruned range scan of a SNAPSHOT table (sources/table.py): the
    epoch resolves exactly like read_table, the epoch dir's sidecar
    prunes files, survivors are read with the residual predicate
    applied (it still pushes down into the surviving row groups).
    Returns (df, report) with report = {"files_total", "files_scanned",
    "must_scan_fraction"} — the plan-pin observable."""
    from .table import read_table

    full = read_table(spark, table_path, as_of=as_of)
    done_dir = None
    for f in full.inputFiles():
        done_dir = f.rsplit("/", 1)[0]
        break
    if done_dir is None:  # empty epoch
        return full.where(
            _bounded_filter(column, lower, upper, predicates)
        ), {
            "files_total": 0,
            "files_scanned": 0,
            "must_scan_fraction": 0.0,
        }
    # inputFiles of a snapshot epoch all share the epoch dir
    epoch_dir = done_dir
    keep, total = pruned_files(
        spark, epoch_dir, column, lower, upper, predicates
    )
    report = {
        "files_total": total,
        "files_scanned": len(keep),
        "must_scan_fraction": (len(keep) / total) if total else 0.0,
    }
    if not keep:
        empty = spark.createDataFrame([], full.schema)
        return empty, report
    df = spark.read.schema(full.schema).parquet(*sorted(keep))
    return df.where(_bounded_filter(column, lower, upper, predicates)), report


def scan_bucketed_table(
    spark: SparkSession,
    table_path: str,
    column: str | None = None,
    lower=None,
    upper=None,
    as_of: int | None = None,
    predicates: dict | None = None,
) -> tuple[DataFrame, dict]:
    """Pruned range scan of a BUCKETED table: buckets resolve exactly
    like read_bucketed_table (same era slicing and empty-bucket
    semantics), then each surviving bucket dir is pruned against ITS
    epoch's sidecar. Bucket resolution and file skipping compose —
    a key-equality read would prune by bucket, a range read prunes by
    stats, and both prune epochs by time travel."""
    from .table import (
        _bucketed_epochs,
        _bucketed_gc_log,
        _era_epochs,
        _resolve_buckets,
        _schema_at,
        _table_meta,
    )

    meta = _table_meta(spark, table_path)
    done = _bucketed_epochs(spark, table_path)
    if not done:
        raise FileNotFoundError(f"no committed epochs at {table_path}")
    if as_of is None:
        as_of = done[-1]
    floor = _bucketed_gc_log(spark, table_path)["floor"]
    if as_of not in done or (floor is not None and as_of < floor):
        raise ValueError(
            f"epoch {as_of} is not readable at {table_path} "
            f"(committed: {done}, gc floor: {floor})"
        )
    resolved = _resolve_buckets(
        spark, table_path, _era_epochs(meta, [e for e in done if e <= as_of])
    )
    # the schema IN EFFECT at as_of (sources/table.py schema history):
    # files older than an added column NULL-fill it under the explicit
    # read schema, exactly like read_bucketed_table
    schema = ", ".join(f"{quote_ident(n)} {t}" for n, t in _schema_at(meta, as_of))
    keep: list[str] = []
    total = 0
    by_epoch: dict[int, list[str]] = {}
    for b, (ep, bdir) in resolved.items():
        if bdir is not None:
            by_epoch.setdefault(ep, []).append(bdir)
    for ep, bdirs in by_epoch.items():
        ep_dir = os.path.join(table_path, f"epoch={ep}")
        files, n = pruned_files(
            spark, ep_dir, column, lower, upper, predicates
        )
        prefixes = tuple(_path_of(bd).rstrip("/") + "/" for bd in bdirs)
        wanted = [f for f in files if _path_of(f).startswith(prefixes)]
        # total counts only files under RESOLVED buckets of this epoch
        all_ep, _ = pruned_files(spark, ep_dir)
        total += sum(1 for f in all_ep if _path_of(f).startswith(prefixes))
        keep.extend(wanted)
    report = {
        "files_total": total,
        "files_scanned": len(keep),
        "must_scan_fraction": (len(keep) / total) if total else 0.0,
    }
    if not keep:
        empty = spark.createDataFrame([], schema)
        return empty.where(
            _bounded_filter(column, lower, upper, predicates)
        ), report
    df = spark.read.schema(schema).parquet(*sorted(keep))
    return df.where(_bounded_filter(column, lower, upper, predicates)), report
