"""Product-quantization (PQ) compressed-domain similarity search —
the memory half of the 100 TB ANN story (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011; the
FAISS IndexIVFPQ design).

s02 (LSH) and s03 (IVF) bound the CANDIDATE set; PQ bounds the BYTES:
a d=64 float32 embedding (256 B) becomes m=4 one-byte codes (4 B, 64x
smaller), and distances are evaluated against the codes via
asymmetric distance computation (ADC) — the query stays exact, the
corpus is quantized. At 100 TB of raw embeddings the PQ-coded corpus
fits a much smaller cluster, and the ADC scan reads only
codes + a broadcast lookup table.

Division of labor (why this scales the FAISS way):

- **Codebook training is sample-based by design.** FAISS trains PQ
  codebooks on a bounded sample (~100k vectors) regardless of corpus
  size; here a driver-local NumPy Lloyd runs on a content-hash-ordered
  bounded sample, so training cost and driver footprint are
  corpus-size-independent and the books are deterministic.
- **Encoding is the full-corpus pass and is ZERO-shuffle:** per-row
  argmin against plan-literal codebooks (the A5 centroid-broadcast
  pattern), one narrow projection.
- **Search is a broadcast-probe ADC scan:** per-query lookup tables
  (m × k_codes doubles) are computed on the driver from the same
  books and broadcast as a literal (query_id, cell, lut) frame; the
  corpus side reads codes only. With IVF coarse cells on top (this
  module's ``ivfpq_search``), the scan touches n_probe/n_cells of the
  corpus. Both FAISS modes are implemented: ``by_residual=false``
  (codes quantize raw vectors — the s04 registry entry, golden-row
  frozen) and ``by_residual=true`` (codes quantize the residual to
  the coarse centroid — the FAISS default; measured 0.20 → 0.42
  recall@10 at the same 16-bit budget here).

Determinism: the coarse quantizer is s03's compat-mode engine Lloyd
with injected lowest-vec_id init, codebooks are a pure function of
the hash-ordered sample, every ADC term is a fixed-order double sum,
and the emitted distance is floored to the 1e-4 grid — so the search
result is a fixed table per corpus and the registry entry (s04)
carries a golden-row VALUES oracle exactly like s03. No reference-repo counterpart (SURVEY §2 Part A is one K-Means
job); extension per the training-pipeline brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# vector helpers imported inside pq_encode (zip_with form; see docstring)
from ..sources.readers import load_table
from .similarity import _EMB_DIM, _N_QUERIES, _TOP_K, _train_ivf

_M_SUB = 4  # subspaces (dsub = 64/4 = 16 dims each)
_K_CODES = 16  # codebook entries per subspace -> 4 bits/code


def train_pq_codebooks(
    spark: SparkSession,
    sf_dir: str,
    *,
    m: int = _M_SUB,
    k_codes: int = _K_CODES,
    d: int = _EMB_DIM,
    sample: int = 2048,
    iters: int = 8,
    residual_centroids: list[list[float]] | None = None,
    embeddings: DataFrame | None = None,
    sample_rows: list | None = None,
) -> list[list[list[float]]]:
    """m per-subspace codebooks, each k_codes × (d/m), trained by a
    driver-local NumPy Lloyd on a bounded content-hash-ordered sample.

    Sample-based training is the PUBLISHED design, not a shortcut:
    FAISS trains PQ codebooks on a capped sample (~100k vectors)
    whatever the corpus size, because k·m tiny centroids need no more
    evidence. So the distributed work here is exactly one bounded
    TakeOrdered (the same O(sample) driver footprint as every centroid
    collect in kmeans/core); corpus size only ever touches the
    encode/search passes. Determinism: the sample is md5-hash-ordered
    (partitioning-invariant, the k01 _hash_order_init argument), init
    is its first k_codes rows per subspace, NumPy argmin takes the
    first minimum (the engine's strict-< tie-break), and float64 means
    over a fixed row order are reproducible bit-for-bit.

    An engine-Lloyd variant (m sequential core.lloyd fits) was
    measured 5-10x slower here for zero quality gain: at codebook
    scale the cost is whole-stage codegen COMPILATION of m·k literal
    distance expressions, not data.
    """
    if d % m:
        raise ValueError(f"d={d} not divisible by m={m}")
    import numpy as np

    # ``embeddings`` lets the ANN-index layer train on an arbitrary
    # (vec_id, embedding) frame; default stays the sf_dir table so the
    # frozen s04/s05 golden oracles are untouched
    e = embeddings if embeddings is not None else load_table(
        spark, sf_dir, "embeddings"
    )
    # ``sample_rows`` lets a caller that already collected the SAME
    # md5-ordered sample (build_ann_index shares it with the
    # train_error metric) skip a second TakeOrdered pass over the
    # corpus — rows must come from the exact recipe below
    rows = sample_rows if sample_rows is not None else (
        e.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(sample)
        .collect()
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    if len(X) < k_codes:
        raise ValueError(f"sample of {len(X)} rows < k_codes={k_codes}")
    if residual_centroids is not None:
        # by_residual training (FAISS IVFPQ default): codebooks model
        # the residual to the nearest coarse centroid, which has far
        # less variance than the raw vector — at the same bit budget
        # the quantization error (and recall) improves. Assignment here
        # is NumPy first-min argmin; the encode side uses the engine's
        # own cell assignment (codebooks are parameters — a boundary
        # row landing in a neighbor cell changes nothing structural).
        C = np.array(residual_centroids, dtype=np.float64)
        a = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        X = X - C[a]
    dsub = d // m
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[:k_codes].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # first-min: strict-< tie-break
            for c in range(k_codes):
                pts = S[a == c]
                if len(pts):  # empty cell keeps its old centroid (A11)
                    C[c] = pts.mean(axis=0)
        books.append([[float(v) for v in row] for row in C])
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    code_col: str = "codes",
    residual_centroids: list[list[float]] | None = None,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Append an array<int> of per-subspace code ids: for each subspace,
    the argmin code centroid for that slice of ``vec_col`` (strict-<
    lowest-index tie-break, like every assign in the engine). Codebooks
    are plan literals — zero shuffle, whole-corpus narrow pass.

    Distances use the zip_with/aggregate form, NOT the per-dimension
    unrolled form vector.py prefers for small d: with m·k_codes
    expressions in one projection, unrolling was measured 5x slower
    end-to-end (12.7 s vs 2.4 s at m=4, k=16, dsub=16) because janino
    compile time scales with the unrolled term count while the lambda
    machinery compiles once per expression shape. Same codes either
    way (equality-checked); both stay whole-stage JVM.

    With ``residual_centroids``, the encoded vector is the RESIDUAL to
    the row's coarse centroid (selected by ``cluster_col``): one
    zip_with subtraction against a plan-literal k_cells × d centroid
    table, still zero-shuffle.

    The whole m x k_codes literal tree is rendered as ONE SQL string
    and parsed JVM-side (F.expr) — the Column-API construction cost
    ~3 s of pure py4j round-trips per encode plan at the default
    geometry (round-13 measurement); the parsed Catalyst tree is
    identical (same functions, same repr-exact double literals), so
    codes are bit-for-bit unchanged (s04/s05/s07 goldens pin it)."""
    from ..functions.vector import (
        _centroid_sql,
        quote_ident,
        squared_euclidean_sql,
    )

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    base = quote_ident(vec_col)
    if residual_centroids is not None:
        cents = (
            "array("
            + ",".join(_centroid_sql(c) for c in residual_centroids)
            + ")"
        )
        base = (
            f"zip_with({base}, element_at({cents}, "
            f"{quote_ident(cluster_col)} + 1), "
            "(x, y) -> cast(x as double) - y)"
        )

    def _argmin_code(j: int) -> str:
        sl = f"slice({base}, {j * dsub + 1}, {dsub})"
        darr = (
            "array("
            + ",".join(
                squared_euclidean_sql(sl, c) for c in codebooks[j]
            )
            + ")"
        )
        return (
            f"cast((array_position({darr}, array_min({darr})) - 1) as int)"
        )

    codes = F.expr(
        "array(" + ",".join(_argmin_code(j) for j in range(m)) + ")"
    )
    return df.withColumn(code_col, codes)


def _adc_expr(lut_col: str, code_col: str, m: int):
    """Fixed-order sum over subspaces of lut[j][code_j] — the ADC
    distance. A Python-side loop builds one left-to-right double-add
    chain, so accumulation order is pinned in the plan (golden-row
    determinism)."""
    terms = [
        F.element_at(
            F.element_at(F.col(lut_col), j + 1),
            F.element_at(F.col(code_col), j + 1) + 1,
        )
        for j in range(m)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def ivfpq_search(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = _M_SUB,
    k_codes: int = _K_CODES,
    top_k: int = _TOP_K,
    by_residual: bool = False,
) -> DataFrame:
    """IVF-PQ (FAISS IVFADC): coarse cells bound the candidate set, PQ
    codes bound the bytes, ADC scores candidates.

    Plan: corpus side = cells ∩ probed cells, reading only
    (vec_id, cluster, codes); query side = n_probe nearest coarse cells
    per query plus the per-(query, cell) LUT — an m × k_codes
    array<array<double>> computed on the driver from the same books —
    broadcast into the candidate join. Returns (query_id, vec_id, adc)
    with adc floored to the 1e-4 grid, top_k per query by
    (adc asc, vec_id asc).

    ``by_residual=True`` is the FAISS IVFPQ default: codes quantize
    the residual to the coarse centroid and the LUT for a probed cell
    is built from (query − that cell's centroid). Residuals have far
    less variance than raw vectors, so recall at the same bit budget
    improves (measured 0.20 → 0.42 recall@10 at m=4, k=16 on the
    synthetic corpus); the plan shape is unchanged — the probe frame
    already carries one LUT per (query, cell) row. The s04 registry
    entry stays by_residual=False to keep its frozen golden oracle.
    """
    cells, centroids = _train_ivf(spark, sf_dir, n_cells)
    books = train_pq_codebooks(
        spark,
        sf_dir,
        m=m,
        k_codes=k_codes,
        residual_centroids=centroids if by_residual else None,
    )
    dsub = len(books[0][0])
    coded = pq_encode(
        cells.where(F.col("vec_id") >= _N_QUERIES),
        books,
        vec_col="features",
        residual_centroids=centroids if by_residual else None,
    ).select("vec_id", "cluster", "codes")
    # Query side on the DRIVER: Q is query-batch-sized (the same tiny
    # collect every assign/centroid step makes), and materializing the
    # Q × n_probe probe rows + Q LUTs as a literal DataFrame keeps the
    # m·k_codes·dsub distance arithmetic OUT of the plan — expressed as
    # expressions it exceeds janino's 64 KB method limit and the whole
    # stage falls back to interpreted eval. Fixed left-to-right Python
    # double sums mirror the unrolled expression exactly.
    qvecs = [
        (int(r["vec_id"]), [float(v) for v in r["features"]])
        for r in cells.where(F.col("vec_id") < _N_QUERIES)
        .select("vec_id", "features")
        .orderBy("vec_id")
        .collect()
    ]
    return search_encoded(
        coded,
        centroids,
        books,
        qvecs,
        n_probe=n_probe,
        top_k=top_k,
        by_residual=by_residual,
    )


def _sqd(q, c, lo, n):
    out = 0.0
    for i in range(n):
        out = out + (float(q[lo + i]) - float(c[i])) ** 2
    return out


def search_encoded(
    coded: DataFrame,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    qvecs: list[tuple[int, list[float]]],
    *,
    n_probe: int,
    top_k: int,
    by_residual: bool,
) -> DataFrame:
    """The IVF-PQ query side over an ALREADY-ENCODED corpus frame
    (vec_id, cluster, codes) — shared verbatim by the train-and-search
    entries (s04/s05, golden-pinned) and the persisted-index path
    (operators/ann_index.py), so loaded-index search is structurally
    identical to freshly-trained search. ``qvecs`` is the driver-side
    query batch [(query_id, vector)]."""
    spark = coded.sparkSession
    m = len(books)
    dsub = len(books[0][0])
    probe_rows = []
    for qid, q in qvecs:
        d2 = sorted(
            (_sqd(q, c, 0, len(c)), cell) for cell, c in enumerate(centroids)
        )
        for _d, cell in d2[:n_probe]:
            if by_residual:
                qq = [q[i] - float(centroids[cell][i]) for i in range(len(q))]
            else:
                qq = q
            lut = [
                [_sqd(qq, c, j * dsub, dsub) for c in books[j]]
                for j in range(m)
            ]
            probe_rows.append((int(qid), int(cell), lut))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cell int, lut array<array<double>>"
    )
    return _adc_topk(coded, probes, m, top_k)


def _adc_topk(coded: DataFrame, probes: DataFrame, m: int, top_k: int) -> DataFrame:
    """The BROADCAST ADC scoring tail of the driver-literal probe path
    (search_encoded — s04/s05's golden-pinned shape): probes (query_id,
    cell, lut) broadcast, every candidate scored through the
    plan-pinned ``_adc_expr`` chain. The corpus-scale kNN-JOIN tail
    lives in ``_adc_topk_qq`` (round 12 — probes carry the query
    vector, not the LUT)."""
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    adc = (
        F.floor(_adc_expr("lut", "codes", m) * 10000.0) / 10000.0
    ).alias("adc")
    joined = coded.join(F.broadcast(probes), coded.cluster == probes.cell)
    return (
        joined.select("query_id", "vec_id", adc)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= top_k)
        .select("query_id", "vec_id", "adc", "rk")
    )


def _adc_topk_qq(
    coded: DataFrame,
    probes: DataFrame,
    books: list[list[list[float]]],
    top_k: int,
    *,
    salt: int | None = None,
    plan: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """The corpus-scale kNN-JOIN scoring tail
    (ann_index.AnnIndex.search_join). ``probes`` is (query_id, cell,
    qq) where qq is the float64 (residualized) QUERY VECTOR — round 12
    replaced the old per-probe LUT column (m x k_codes = 1024 doubles)
    with the d=64-double vector, ~16x smaller probe rows; the kernel
    rebuilds the LUT inside each cogroup with the identical
    per-element float64 sequence, so values stay BIT-EQUAL to
    ``search`` (pinned by s07/s09 and tests).

    The join is 2D-salted: the group key is (cell, _qs, _cs) where
    probes partition by query-id hash into ``qs`` slices (replicated
    over the ``cs`` candidate slices) and codes partition by vec-id
    hash into ``cs`` slices (replicated over the ``qs`` query slices).
    Each group scores its Q_g x N_g block — distributed GEMM blocking.
    Exact under ANY (qs, cs): a query's global per-cell top-k is
    contained in the union of its cs per-group top-k under the same
    (adc, vec_id) total order. Two calling shapes:

    - ``salt=S`` (legacy uniform knob, the pinned salt-invariance
      surface): qs=1, cs=S for every cell — plain literals, no plan
      join;
    - ``plan=[(cell, qs, cs), ...]`` (the data-dependent default from
      search_join): per-cell splits sized from measured probe counts
      and cell sizes, broadcast-joined to both sides. The plan MUST
      cover every non-empty cell (search_join derives it from the
      codes-side cluster census, so it does by construction) — the
      inner join prunes unprobed cells' codes before the shuffle.

    The kernel accumulates float64 elementwise adds left-to-right —
    dim-by-dim inside each subspace for the LUT, subspace-by-subspace
    for the ADC — the exact IEEE sequence the serving path's _sqd /
    _adc_expr chain produces; never a NumPy reduction (pairwise
    summation would shift ulps across the 1e-4 floor)."""
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    if (salt is None) == (plan is None):
        raise ValueError("_adc_topk_qq: pass exactly one of salt / plan")
    if salt is not None:
        if salt < 1:
            raise ValueError("_adc_topk_qq: salt must be >= 1")
        salted = coded.withColumn(
            "_cs", F.pmod(F.xxhash64("vec_id"), F.lit(salt)).cast("int")
        ).withColumn("_qs", F.lit(0))
        fanned = probes.withColumn("_qs", F.lit(0)).withColumn(
            "_cs", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
    else:
        if not plan:
            return coded.sparkSession.createDataFrame(
                [], "query_id long, vec_id bigint, adc double, rk int"
            )
        spark = coded.sparkSession
        pdf = spark.createDataFrame(plan, "cell int, qs int, cs int")
        salted = (
            coded.join(F.broadcast(pdf), coded.cluster == pdf.cell)
            .withColumn(
                "_cs", F.pmod(F.xxhash64("vec_id"), F.col("cs")).cast("int")
            )
            .withColumn(
                "_qs", F.explode(F.sequence(F.lit(0), F.col("qs") - 1))
            )
            .select("cluster", "vec_id", "codes", "_qs", "_cs")
        )
        fanned = (
            probes.join(F.broadcast(pdf), "cell")
            .withColumn(
                "_qs", F.pmod(F.xxhash64("query_id"), F.col("qs")).cast("int")
            )
            .withColumn(
                "_cs", F.explode(F.sequence(F.lit(0), F.col("cs") - 1))
            )
            .select("cell", "query_id", "qq", "_qs", "_cs")
        )
    scored = _adc_score_cogroup_qq(salted, fanned, books, top_k)
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= top_k)
        .select("query_id", "vec_id", "adc", "rk")
    )


def _adc_score_cogroup_qq(
    salted: DataFrame,
    fanned: DataFrame,
    books: list[list[list[float]]],
    top_k: int,
) -> DataFrame:
    """Per-(cell, _qs, _cs) cogroup NumPy ADC scorer emitting each
    group's top_k per query — exact and bit-equal to the serving path
    (see _adc_topk_qq). The LUT is built INSIDE the kernel from the
    group's query vectors (round 12): dim-by-dim float64 accumulation
    within each subspace — the same elementwise sequence the old
    probe-side kernel produced, just computed after the shuffle
    instead of before it."""
    m = len(books)

    def score(codes_pdf, probes_pdf):
        import numpy as np
        import pandas as pd

        if len(codes_pdf) == 0 or len(probes_pdf) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "vec_id": pd.Series([], dtype="int64"),
                    "adc": pd.Series([], dtype="float64"),
                }
            )
        B = np.array(books, dtype=np.float64)  # (m, k, dsub)
        dsub = B.shape[2]
        C = np.stack(codes_pdf["codes"].to_numpy())  # (N, m) codes
        vids = codes_pdf["vec_id"].to_numpy().astype(np.int64)
        QQ = np.stack(probes_pdf["qq"].to_numpy())  # (Q, d) float64
        qids = probes_pdf["query_id"].to_numpy().astype(np.int64)
        # LUTs: (Q, m, k), accumulated dim-by-dim within each subspace
        # — the _sqd left-to-right order the serving path pins
        S = QQ.reshape(len(QQ), m, dsub)
        L = np.zeros((len(QQ), m, B.shape[1]), dtype=np.float64)
        for i in range(dsub):
            L += (S[:, :, i : i + 1] - B[None, :, :, i]) ** 2
        # left-to-right over subspaces: acc starts at term 0 and adds
        # each next term in order — the _adc_expr IEEE sequence
        acc = L[:, 0, :][:, C[:, 0]].copy()  # (Q, N)
        for j in range(1, m):
            acc += L[:, j, :][:, C[:, j]]
        adc = np.floor(acc * 10000.0) / 10000.0
        k = min(top_k, adc.shape[1])
        order = np.lexsort(
            (np.broadcast_to(vids, adc.shape), adc), axis=-1
        )[:, :k]
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, k),
                "vec_id": vids[order].ravel(),
                "adc": np.take_along_axis(adc, order, axis=1).ravel(),
            }
        )

    return (
        salted.groupBy("cluster", "_qs", "_cs")
        .cogroup(fanned.groupBy("cell", "_qs", "_cs"))
        .applyInPandas(score, "query_id long, vec_id bigint, adc double")
    )


def s04_ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry wrapper: 8 coarse cells, 2 probes, 4 subspaces × 16
    codes over the 64-dim embeddings — golden-row VALUES oracle
    (S04_SQL), same recipe as s03."""
    return ivfpq_search(spark, sf_dir)


def s05_ivfpq_residual_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry wrapper for the by_residual mode (the FAISS IVFPQ
    default; 2x the recall of s04 at the same 16-bit budget on this
    corpus) — own golden-row VALUES oracle (S05_SQL)."""
    return ivfpq_search(spark, sf_dir, by_residual=True)


# Golden-row oracle (the s03/K01 recipe): the whole pipeline — coarse
# quantizer, sample-trained codebooks, encode argmins, fixed-order ADC
# sums, 1e-4 floor — is a pure function of corpus content, verified
# identical across the engine session, a vanilla local[4]
# America/New_York session, and double runs at every sf. Branches keyed
# on lineitem count (embeddings row count ties at 500 for
# sf0.001/sf0.01).
S04_SQL = """
WITH nrows AS (SELECT count(*) AS c FROM lineitem)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(adc AS DOUBLE) AS adc,
       CAST(rk AS INT) AS rk
FROM (
  SELECT * FROM (VALUES
    (0, 12, 0.9667, 5), (0, 26, 1.0019, 10),
    (0, 155, 0.9582, 4), (0, 177, 0.9496, 3),
    (0, 214, 0.9755, 9), (0, 273, 0.9712, 7),
    (0, 306, 0.9738, 8), (0, 423, 0.9383, 2),
    (0, 424, 0.9682, 6), (0, 497, 0.8923, 1),
    (1, 116, 0.9241, 2), (1, 129, 0.9683, 5),
    (1, 237, 0.9853, 6), (1, 247, 0.8807, 1),
    (1, 260, 1.0037, 9), (1, 296, 0.9535, 4),
    (1, 308, 1.013, 10), (1, 332, 0.9983, 8),
    (1, 378, 0.9319, 3), (1, 412, 0.9883, 7),
    (2, 57, 1.0904, 8), (2, 58, 1.1036, 9),
    (2, 79, 0.8757, 1), (2, 90, 1.0901, 7),
    (2, 125, 0.9916, 3), (2, 132, 0.9556, 2),
    (2, 153, 1.1046, 10), (2, 302, 1.0889, 6),
    (2, 318, 1.028, 4), (2, 456, 1.0882, 5),
    (3, 37, 0.888, 2), (3, 72, 0.9904, 6),
    (3, 84, 0.8496, 1), (3, 92, 1.0443, 10),
    (3, 105, 0.9662, 5), (3, 156, 1.0005, 8),
    (3, 223, 0.9603, 4), (3, 278, 0.9306, 3),
    (3, 426, 0.9972, 7), (3, 499, 1.0221, 9),
    (4, 167, 1.005, 6), (4, 209, 0.9804, 5),
    (4, 238, 0.9729, 4), (4, 256, 0.8759, 1),
    (4, 275, 1.0169, 8), (4, 339, 1.0168, 7),
    (4, 413, 1.0296, 10), (4, 425, 0.8885, 2),
    (4, 464, 0.9635, 3), (4, 472, 1.024, 9)
  ) v(query_id, vec_id, adc, rk)
  WHERE (SELECT c FROM nrows) = 6000
  UNION ALL
  SELECT * FROM (VALUES
    (0, 29, 0.9668, 3), (0, 137, 1.0208, 10),
    (0, 165, 0.9523, 2), (0, 229, 0.9168, 1),
    (0, 264, 1.0174, 9), (0, 271, 1.0103, 6),
    (0, 345, 1.0064, 5), (0, 365, 1.0147, 8),
    (0, 412, 1.0137, 7), (0, 415, 0.9751, 4),
    (1, 64, 0.8897, 4), (1, 166, 0.9978, 10),
    (1, 191, 0.9161, 5), (1, 195, 0.8594, 2),
    (1, 222, 0.8817, 3), (1, 336, 0.9427, 6),
    (1, 353, 0.991, 9), (1, 380, 0.9459, 7),
    (1, 386, 0.9623, 8), (1, 477, 0.8578, 1),
    (2, 68, 0.9764, 3), (2, 128, 0.9467, 2),
    (2, 186, 1.0471, 9), (2, 187, 0.9052, 1),
    (2, 197, 1.0551, 10), (2, 244, 1.0155, 7),
    (2, 291, 1.0209, 8), (2, 375, 0.9838, 6),
    (2, 395, 0.9806, 5), (2, 440, 0.98, 4),
    (3, 51, 1.0403, 7), (3, 140, 1.0081, 2),
    (3, 205, 1.0484, 9), (3, 207, 0.9895, 1),
    (3, 218, 1.0513, 10), (3, 343, 1.0214, 4),
    (3, 372, 1.0445, 8), (3, 421, 1.0373, 6),
    (3, 437, 1.0115, 3), (3, 449, 1.023, 5),
    (4, 81, 0.8747, 1), (4, 122, 0.9646, 5),
    (4, 163, 1.0199, 9), (4, 237, 0.9385, 4),
    (4, 306, 1.0074, 8), (4, 344, 0.9725, 6),
    (4, 366, 1.0306, 10), (4, 408, 0.9999, 7),
    (4, 428, 0.9068, 3), (4, 496, 0.8873, 2)
  ) v(query_id, vec_id, adc, rk)
  WHERE (SELECT c FROM nrows) = 60000
  UNION ALL
  SELECT * FROM (VALUES
    (0, 63, 0.8218, 2), (0, 66, 0.8933, 4),
    (0, 121, 0.8865, 3), (0, 231, 0.9179, 9),
    (0, 462, 0.8031, 1), (0, 1510, 0.9006, 6),
    (0, 1590, 0.8984, 5), (0, 1622, 0.9148, 8),
    (0, 1748, 0.9202, 10), (0, 1999, 0.9025, 7),
    (1, 156, 0.9038, 4), (1, 543, 0.8873, 3),
    (1, 659, 0.9272, 8), (1, 844, 0.8824, 2),
    (1, 1069, 0.9181, 6), (1, 1117, 0.9142, 5),
    (1, 1336, 0.9357, 10), (1, 1461, 0.8762, 1),
    (1, 1524, 0.9345, 9), (1, 1608, 0.9234, 7),
    (2, 16, 0.9093, 4), (2, 620, 0.9228, 7),
    (2, 790, 0.9235, 8), (2, 1109, 0.8843, 3),
    (2, 1158, 0.9359, 10), (2, 1203, 0.9273, 9),
    (2, 1395, 0.8457, 1), (2, 1615, 0.9199, 5),
    (2, 1652, 0.9215, 6), (2, 1838, 0.883, 2),
    (3, 176, 0.8317, 3), (3, 263, 0.7952, 1),
    (3, 485, 0.8237, 2), (3, 801, 0.9207, 10),
    (3, 1199, 0.8873, 7), (3, 1447, 0.8906, 8),
    (3, 1502, 0.8596, 5), (3, 1515, 0.9195, 9),
    (3, 1567, 0.8468, 4), (3, 1617, 0.8802, 6),
    (4, 263, 0.9472, 8), (4, 381, 0.8577, 1),
    (4, 822, 0.9531, 9), (4, 1122, 0.8978, 3),
    (4, 1612, 0.93, 5), (4, 1692, 0.9138, 4),
    (4, 1769, 0.9394, 7), (4, 1812, 0.9308, 6),
    (4, 1887, 0.8754, 2), (4, 1897, 0.9532, 10)
  ) v(query_id, vec_id, adc, rk)
  WHERE (SELECT c FROM nrows) = 600000
)
"""


# s05 golden rows: same protocol as S04_SQL (engine + vanilla session,
# double runs, three sfs) for the by_residual pipeline.
S05_SQL = """
WITH nrows AS (SELECT count(*) AS c FROM lineitem)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(vec_id AS BIGINT) AS vec_id,
       CAST(adc AS DOUBLE) AS adc,
       CAST(rk AS INT) AS rk
FROM (
  SELECT * FROM (VALUES
    (0, 12, 0.8065, 4), (0, 155, 0.8371, 8),
    (0, 212, 0.8231, 6), (0, 282, 0.8227, 5),
    (0, 349, 0.7634, 2), (0, 350, 0.8441, 9),
    (0, 393, 0.8292, 7), (0, 394, 0.8441, 10),
    (0, 402, 0.7994, 3), (0, 497, 0.6118, 1),
    (1, 75, 0.8747, 6), (1, 129, 0.8335, 2),
    (1, 197, 0.8836, 7), (1, 247, 0.8339, 3),
    (1, 248, 0.8969, 9), (1, 257, 0.8988, 10),
    (1, 260, 0.8683, 4), (1, 314, 0.8856, 8),
    (1, 440, 0.8709, 5), (1, 455, 0.74, 1),
    (2, 79, 0.9329, 7), (2, 90, 0.8149, 1),
    (2, 132, 0.8568, 3), (2, 185, 0.893, 6),
    (2, 217, 0.8734, 4), (2, 291, 0.9429, 9),
    (2, 302, 0.8856, 5), (2, 441, 0.9383, 8),
    (2, 453, 0.8236, 2), (2, 459, 0.9437, 10),
    (3, 32, 0.8541, 4), (3, 72, 0.8091, 3),
    (3, 84, 0.8944, 9), (3, 107, 0.877, 6),
    (3, 156, 0.7806, 2), (3, 278, 0.8558, 5),
    (3, 301, 0.8813, 7), (3, 317, 0.8919, 8),
    (3, 374, 0.9011, 10), (3, 426, 0.7753, 1),
    (4, 40, 0.8131, 5), (4, 98, 0.8279, 7),
    (4, 100, 0.8501, 10), (4, 143, 0.7932, 2),
    (4, 186, 0.7873, 1), (4, 193, 0.7997, 4),
    (4, 195, 0.8398, 9), (4, 240, 0.7954, 3),
    (4, 425, 0.8276, 6), (4, 464, 0.8347, 8)
  ) v(query_id, vec_id, adc, rk)
  WHERE (SELECT c FROM nrows) = 6000
  UNION ALL
  SELECT * FROM (VALUES
    (0, 36, 0.8111, 4), (0, 84, 0.8166, 5),
    (0, 131, 0.8233, 6), (0, 165, 0.6728, 1),
    (0, 229, 0.801, 3), (0, 320, 0.8815, 10),
    (0, 345, 0.8332, 7), (0, 365, 0.7836, 2),
    (0, 478, 0.8373, 8), (0, 498, 0.8382, 9),
    (1, 27, 0.7061, 1), (1, 34, 0.8116, 9),
    (1, 64, 0.7805, 5), (1, 124, 0.8133, 10),
    (1, 166, 0.729, 2), (1, 195, 0.7465, 4),
    (1, 268, 0.7916, 6), (1, 353, 0.7933, 7),
    (1, 414, 0.7935, 8), (1, 477, 0.7406, 3),
    (2, 68, 0.9359, 9), (2, 71, 0.9326, 7),
    (2, 100, 0.8198, 3), (2, 193, 0.8784, 4),
    (2, 244, 0.7244, 1), (2, 248, 0.9461, 10),
    (2, 395, 0.7472, 2), (2, 418, 0.9255, 5),
    (2, 426, 0.9352, 8), (2, 440, 0.9272, 6),
    (3, 129, 0.8425, 10), (3, 192, 0.84, 9),
    (3, 283, 0.7947, 4), (3, 341, 0.7862, 1),
    (3, 343, 0.8142, 7), (3, 377, 0.8345, 8),
    (3, 396, 0.7945, 3), (3, 421, 0.8057, 6),
    (3, 437, 0.7909, 2), (3, 449, 0.8044, 5),
    (4, 14, 0.9477, 9), (4, 81, 0.9215, 7),
    (4, 212, 0.9007, 6), (4, 237, 0.8537, 3),
    (4, 247, 0.9258, 8), (4, 346, 0.8418, 2),
    (4, 366, 0.8991, 4), (4, 384, 0.9497, 10),
    (4, 408, 0.9001, 5), (4, 496, 0.8287, 1)
  ) v(query_id, vec_id, adc, rk)
  WHERE (SELECT c FROM nrows) = 60000
  UNION ALL
  SELECT * FROM (VALUES
    (0, 66, 0.7116, 1), (0, 488, 0.7586, 4),
    (0, 947, 0.7749, 7), (0, 1119, 0.7453, 2),
    (0, 1120, 0.754, 3), (0, 1576, 0.7834, 10),
    (0, 1591, 0.7661, 6), (0, 1775, 0.78, 9),
    (0, 1817, 0.7625, 5), (0, 1966, 0.7751, 8),
    (1, 300, 0.7631, 9), (1, 514, 0.7529, 7),
    (1, 659, 0.7135, 1), (1, 692, 0.7319, 5),
    (1, 914, 0.718, 3), (1, 1159, 0.761, 8),
    (1, 1175, 0.7666, 10), (1, 1364, 0.7288, 4),
    (1, 1580, 0.7426, 6), (1, 1711, 0.7143, 2),
    (2, 95, 0.791, 9), (2, 169, 0.7792, 7),
    (2, 494, 0.7532, 3), (2, 1026, 0.7638, 5),
    (2, 1053, 0.7605, 4), (2, 1158, 0.7665, 6),
    (2, 1203, 0.789, 8), (2, 1303, 0.7352, 1),
    (2, 1395, 0.7961, 10), (2, 1592, 0.7469, 2),
    (3, 214, 0.7479, 10), (3, 263, 0.6618, 1),
    (3, 271, 0.7384, 6), (3, 376, 0.742, 7),
    (3, 551, 0.7154, 2), (3, 778, 0.747, 9),
    (3, 1001, 0.7158, 3), (3, 1124, 0.7326, 5),
    (3, 1567, 0.7438, 8), (3, 1617, 0.7216, 4),
    (4, 76, 0.7171, 2), (4, 492, 0.7744, 5),
    (4, 526, 0.7835, 9), (4, 662, 0.784, 10),
    (4, 924, 0.7523, 3), (4, 1370, 0.7659, 4),
    (4, 1423, 0.7762, 6), (4, 1762, 0.7126, 1),
    (4, 1826, 0.7789, 7), (4, 1988, 0.783, 8)
  ) v(query_id, vec_id, adc, rk)
  WHERE (SELECT c FROM nrows) = 600000
)
"""
