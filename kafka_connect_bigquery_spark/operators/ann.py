"""Similarity search over embedding columns (array<float>).

Two paths:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  One shuffle-free broadcast of the query set against the corpus scan;
  per-pair work is a codegen'd zip_with/aggregate (no Python).
- ``lsh_ann_topk``: random-hyperplane LSH buckets as the scale path —
  candidates share a bucket, exact cosine only within buckets. At
  100 TB the bucket id is the shuffle/partition key and the corpus is
  written bucketed by it, so a query touches ~1/2^planes of the data.

Determinism: cosines are computed over integer-quantized products
(floor(x*y*1e8 + .5) summed as exact integers) so the result is
bit-identical across engines, partitionings, and runs — see
``quantized_dot``. Hyperplane weights are a deterministic arithmetic
function of (plane, dim), not an RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QE = 100_000_000  # 1e8 quantization for per-element products


def quantized_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product: sum of floor(x*y*QE + 0.5) as long.

    Every step (float->double widening, double multiply, floor) is
    IEEE-deterministic; integer summation is order-independent."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * QE + F.lit(0.5)).cast(
            "long"
        ),
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def quantized_norm_sq(a: Column) -> Column:
    return quantized_dot(a, a)


def cosine_from_quantized(dot_q: Column, norm_a_q: Column, norm_b_q: Column) -> Column:
    """cosine = (dot/QE) / (sqrt(na/QE) * sqrt(nb/QE)) — the exact
    expression the oracle mirrors."""
    qe = F.lit(float(QE))
    return (dot_q / qe) / (
        F.sqrt(norm_a_q / qe) * F.sqrt(norm_b_q / qe)
    )


def with_norm(df: DataFrame, vec_col: str, out_col: str = "__norm_q") -> DataFrame:
    """Precompute per-vector quantized norms once (reused across queries
    — at corpus scale this column is stored with the table)."""
    return df.withColumn(out_col, quantized_norm_sq(F.col(vec_col)))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    exclude_self: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k of corpus for each query vector.

    Returns (query_id, neighbor_id, cosine, rank). The query side is
    broadcast (queries << corpus); ranking windows partition by query.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("__norm_q").alias("qn"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("__norm_q").alias("cn"),
    )
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "cosine",
        cosine_from_quantized(
            quantized_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) scale path: k-means coarse quantizer
# --------------------------------------------------------------------------

QD = 1_000_000  # distance quantization (smaller than QE: 64 squared
# diffs of |v|<=2 sum to ~1e15, safely inside int64)


def _dlit_array(values: list[float]) -> Column:
    """A double-array literal built with ONE py4j/SQL-parse round trip.

    ``F.array(*[F.lit(x) ...])`` costs one py4j call per element; a
    64-dim centroid × 8 lists was ~520 driver round trips ≈ 1.2 s of
    DataFrame CONSTRUCTION per dedup_semantic build (profiled; the
    execution itself is 0.45 s). ``repr(float)`` is the shortest
    round-trip decimal, and Spark's CAST(string AS DOUBLE) parses it
    back to the identical IEEE double, so the resulting literal is
    bit-for-bit the same as the per-element form."""
    body = ",".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in values)
    return F.expr(f"array({body})")


def _sq_dist_to(vec_col: Column, centroid: list[float]) -> Column:
    """Quantized squared L2 distance to a fixed centroid — exact integer
    arithmetic, so argmin assignment is partitioning-independent."""
    cent = _dlit_array(centroid)
    diffs = F.zip_with(
        vec_col,
        cent,
        lambda x, c: F.floor(x.cast("double") * QD + F.lit(0.5)).cast("long")
        - F.floor(c.cast("double") * QD + F.lit(0.5)).cast("long"),
    )
    return F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, d: acc + d * d)


def assign_list(vec_col: Column | str, centroids: list[list[float]]) -> Column:
    """0-based id of the nearest centroid (ties -> lowest id).

    Pass the vector column by NAME when you can: the string path builds
    the whole k-way distance argmin as ONE parsed SQL expression, where
    the Column path pays a py4j round trip per lambda/literal — ~0.5 s
    of driver-side DataFrame construction per call at k=8, dim=64
    (profiled on dedup_semantic; the JVM parse is ~ms). Both paths
    produce the identical expression: the per-dimension centroid
    quantization FLOOR(c*QD + 0.5) is pre-folded in Python for the
    string path, which is exactly the constant folding Catalyst applies
    to the literal subtrees of the Column path."""
    if isinstance(vec_col, str):
        dists_sql = _sq_dists_sql(vec_col, centroids)
        return F.expr(
            f"CAST(array_position({dists_sql}, array_min({dists_sql})) - 1 AS INT)"
        )
    dists = F.array(*[_sq_dist_to(vec_col, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _sq_dists_sql(vec_name: str, centroids: list[list[float]]) -> str:
    """SQL text of the per-centroid quantized squared-distance array —
    the shared builder behind assign_list's string fast path and the
    probe-ranking paths. Semantics identical to
    ``array(*[_sq_dist_to(col, c) ...])`` with the centroid
    quantization pre-folded in Python (same IEEE ops Catalyst folds)."""
    import math

    terms = []
    for c in centroids:
        # Explicit precondition (the Column path silently yields
        # NaN->null distances for degenerate centroids; the pre-fold
        # would raise an opaque ValueError/OverflowError instead):
        if not all(math.isfinite(float(x)) for x in c):
            raise ValueError(
                "non-finite centroid component in _sq_dists_sql; "
                "degenerate kmeans centroid — fix the fit or use the "
                "Column path"
            )
        cq = [int(math.floor(float(x) * QD + 0.5)) for x in c]
        arr = f"array({','.join(f'{q}L' for q in cq)})"
        terms.append(
            f"aggregate(zip_with(`{vec_name}`, {arr}, "
            f"(x, cq) -> CAST(FLOOR(CAST(x AS DOUBLE) * {QD} + 0.5D) AS BIGINT) - cq), "
            f"CAST(0 AS BIGINT), (acc, d) -> acc + d * d)"
        )
    return f"array({','.join(terms)})"


def seed_centroids(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> list[list[float]]:
    """The k-means *init* centroids alone: the k vectors with smallest
    ids. No Lloyd iterations, so the whole IVF pipeline (assignment,
    probing, ranking) is a closed-form function of the input and can be
    mirrored exactly by a SQL oracle. ``kmeans_fit`` refines these when
    recall matters more than checkability."""
    return [
        [float(x) for x in r[vec_col]]
        for r in df.orderBy(id_col).limit(k).select(vec_col).collect()
    ]


def kmeans_fit(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 5,
) -> list[list[float]]:
    """Deterministic Lloyd k-means for the IVF coarse quantizer.

    Init = the k vectors with smallest ids; per-dimension means are
    computed from quantized integer sums, so every iteration — and
    therefore the final centroid set — is bit-identical across runs and
    partitionings. Centroids (k x dim doubles) live on the driver, as
    in any IVF index build; the data never leaves executors.
    """
    cents = [
        [float(x) for x in r[vec_col]]
        for r in df.orderBy(id_col).limit(k).select(vec_col).collect()
    ]
    for _ in range(iters):
        assigned = df.select(
            assign_list(F.col(vec_col), cents).alias("list_id"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        sums = (
            assigned.groupBy("list_id", "pos")
            .agg(
                F.sum(
                    F.floor(F.col("x").cast("double") * QD + F.lit(0.5)).cast("long")
                ).alias("sq"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = {}
        for r in sums:
            new.setdefault(r["list_id"], {})[r["pos"]] = (r["sq"] / r["n"]) / QD
        cents = [
            [new[li][p] for p in sorted(new[li])] if li in new else cents[li]
            for li in range(k)
        ]
    return cents


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: exact cosine only within the ``n_probe``
    inverted lists nearest to each query.

    At corpus scale the list id is the partition key (the corpus is
    written clustered by it); a query touches n_probe/k_lists of the
    data. ``n_probe = len(centroids)`` degrades to exact brute force.
    """
    n_lists = len(centroids)
    dists = F.expr(_sq_dists_sql(vec_col, centroids))
    # the n_probe nearest lists per query: argsort via (dist, idx) structs
    ranked = F.transform(
        F.array_sort(
            F.zip_with(
                dists,
                F.sequence(F.lit(0), F.lit(n_lists - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        ),
        lambda s: s["i"],
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("__norm_q").alias("qn"),
        F.explode(F.slice(ranked, 1, n_probe)).alias("list_id"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("__norm_q").alias("cn"),
        assign_list(F.col(vec_col), centroids).alias("list_id"),
    )
    joined = c.join(F.broadcast(q), "list_id")
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "cosine",
        cosine_from_quantized(
            quantized_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# IVF-PQ (inverted file + residual product quantization, ADC scoring)
# --------------------------------------------------------------------------

def _qvec(xs: list[float]) -> list[int]:
    """Python twin of the engine's per-element quantization
    floor(x*QD + 0.5) — IEEE double ops, bit-identical to the SQL."""
    import math

    return [math.floor(float(x) * QD + 0.5) for x in xs]


def pq_codebooks(
    df: DataFrame,
    centroids: list[list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
) -> list[list[list[int]]]:
    """Seeded PQ codebooks over coarse-quantizer *residuals*.

    Codebook entry j of subspace s is the s-th sub-slice of the
    integer-quantized residual (vector minus its nearest coarse
    centroid) of the j-th-smallest-id vector — the k-means++-style init
    alone, no Lloyd refinement, so encoding is a closed-form function
    of the input (same design as ``seed_centroids``). Returns
    ``[m][ksub][dsub]`` ints; like any PQ index the codebooks
    (m*ksub*dsub ints) live on the driver/broadcast side.
    """
    rows = df.orderBy(id_col).limit(ksub).select(vec_col).collect()
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    d = len(vecs[0])
    dsub = d // m
    cents_q = [_qvec(c) for c in centroids]
    books: list[list[list[int]]] = [[] for _ in range(m)]
    for v in vecs:
        vq = _qvec(v)
        # nearest coarse centroid, ties -> lowest id (matches assign_list)
        dists = [
            sum((a - b) * (a - b) for a, b in zip(vq, cq)) for cq in cents_q
        ]
        cq = cents_q[dists.index(min(dists))]
        resid = [a - b for a, b in zip(vq, cq)]
        for s in range(m):
            books[s].append(resid[s * dsub : (s + 1) * dsub])
    return books


def _resid_col(vec_col: Column, cents_q_lit: Column, list_col: Column) -> Column:
    """Integer residual array: quantized vector minus the quantized
    coarse centroid of its list."""
    return F.zip_with(
        vec_col,
        F.element_at(cents_q_lit, list_col + 1),
        lambda x, c: F.floor(x.cast("double") * QD + F.lit(0.5)).cast("long") - c,
    )


def _int_sql(v: int) -> str:
    """SQL integer literal with the same type F.lit(int) infers:
    INT when it fits, BIGINT (L suffix) otherwise — so swapping the
    py4j literal builders for parsed SQL never changes a schema."""
    v = int(v)
    return str(v) if -(2**31) <= v < 2**31 else f"{v}L"


def _ilit_matrix(rows: list[list[int]]) -> Column:
    """array<array<int>> literal in ONE py4j/SQL-parse round trip
    (k x dim py4j calls otherwise — see _dlit_array)."""
    body = ",".join(
        "array(" + ",".join(_int_sql(v) for v in r) + ")" for r in rows
    )
    return F.expr(f"array({body})")


def _cb_literal(codebooks: list[list[list[int]]]) -> Column:
    """The full codebook as one array<array<array<int>>> literal
    (m x ksub x dsub), parsed in ONE round trip — the per-element
    F.lit form was ~1,160 py4j calls at m=8, ksub=16, dsub=8."""
    body = ",".join(
        "array("
        + ",".join(
            "array(" + ",".join(_int_sql(c) for c in cv) + ")" for cv in book
        )
        + ")"
        for book in codebooks
    )
    return F.expr(f"array({body})")


def _sub_dists(resid: Column, cb_s: Column, s: Column, dsub: int) -> Column:
    """Distances of residual subspace ``s`` to every entry of its
    codebook: transform over the codebook array, so the expression tree
    stays O(1) in ksub (a per-entry column loop makes Catalyst analysis
    itself the bottleneck — measured 16x slower to plan)."""
    sub = F.slice(resid, s * dsub + 1, dsub)
    return F.transform(
        cb_s,
        lambda cbvec: F.aggregate(
            F.zip_with(sub, cbvec, lambda r, c: r - c),
            F.lit(0).cast("long"),
            lambda acc, d: acc + d * d,
        ),
    )


def _pq_codes(resid: Column, cb_lit: Column, m: int, dsub: int) -> Column:
    """PQ code array (m ints): per subspace, the argmin codebook entry.
    Ties break to the lowest code id via lexicographic struct-min."""
    return F.zip_with(
        cb_lit,
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda cb_s, s: F.array_min(
            F.zip_with(
                _sub_dists(resid, cb_s, s, dsub),
                F.sequence(F.lit(0), F.size(cb_s) - 1),
                lambda d, j: F.struct(d.alias("d"), j.alias("j")),
            )
        )["j"].cast("int"),
    )


def _pq_tabs(resid: Column, cb_lit: Column, m: int, dsub: int) -> Column:
    """ADC lookup tables (m x ksub longs): per subspace, distance of the
    residual sub-vector to every codebook entry."""
    return F.zip_with(
        cb_lit,
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda cb_s, s: _sub_dists(resid, cb_s, s, dsub),
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[int]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 2,
    shortlist: int = 20,
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-ADC: approximate top-k via inverted lists + residual product
    quantization, with exact re-ranking of the ADC shortlist.

    Pipeline (the classic IVFADC index, as a declarative plan):
    corpus vectors are coarse-assigned to inverted lists and
    PQ-encoded (m codes of log2(ksub) bits — the 100 TB story: the
    scan reads m bytes/vector instead of the full embedding); each
    query probes its ``n_probe`` nearest lists, scores candidates by
    asymmetric distance (sum of per-subspace lookup-table entries,
    exact integer arithmetic), keeps a ``shortlist``, and re-ranks it
    by exact cosine. Returns (query_id, neighbor_id, adc_dist, cosine,
    rank<=k).

    Scale: candidates flow through an equi-join on list_id (no
    cartesian); codebooks/centroids are literal broadcast arrays; the
    only full-vector reads are the shortlist re-rank.
    """
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    n_lists = len(centroids)
    cents_q_lit = _ilit_matrix([_qvec(cent) for cent in centroids])
    cb_lit = _cb_literal(codebooks)

    # ---- corpus side: list assignment + PQ codes ----
    enc = with_norm(corpus, vec_col).withColumn(
        "list_id", assign_list(vec_col, centroids)
    )
    resid = _resid_col(F.col(vec_col), cents_q_lit, F.col("list_id"))
    # materialize the encoded corpus once — it is THE index (at corpus
    # scale codes/list_id live in a stored table, written bucketed by
    # list_id); without this the shortlist/re-rank stages re-derive the
    # encode expression per downstream reference
    c = enc.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("__norm_q").alias("cn"),
        "list_id",
        _pq_codes(resid, cb_lit, m, dsub).alias("codes"),
    ).localCheckpoint(eager=True)

    # ---- query side: probe lists + per-list ADC lookup tables ----
    dists_all = F.expr(_sq_dists_sql(vec_col, centroids))
    ranked = F.transform(
        F.array_sort(
            F.zip_with(
                dists_all,
                F.sequence(F.lit(0), F.lit(n_lists - 1)),
                lambda d, i: F.struct(d.alias("d"), i.alias("i")),
            )
        ),
        lambda st: st["i"],
    )
    q_probe = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("__norm_q").alias("qn"),
        F.explode(F.slice(ranked, 1, n_probe)).alias("list_id"),
    )
    q_resid = _resid_col(F.col("qv"), cents_q_lit, F.col("list_id"))
    q = q_probe.withColumn("tabs", _pq_tabs(q_resid, cb_lit, m, dsub))

    # ---- ADC scoring within probed lists, shortlist, exact re-rank ----
    joined = c.join(F.broadcast(q), "list_id")
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("tabs"),
            lambda code, tab: F.element_at(tab, code + 1),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = joined.withColumn("adc_q", adc)
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc_q"), F.asc("neighbor_id"))
    short = scored.withColumn("adc_rank", F.row_number().over(w_adc)).filter(
        F.col("adc_rank") <= shortlist
    )
    reranked = short.withColumn(
        "cosine",
        cosine_from_quantized(
            quantized_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
    )
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w_cos))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.col("adc_q") / F.lit(float(QD) * QD)).alias("adc_dist"),
            "cosine",
            "rank",
        )
    )


# --------------------------------------------------------------------------
# LSH (random hyperplanes) scale path
# --------------------------------------------------------------------------

def hyperplane_weight(plane: Column, dim: Column) -> Column:
    """Deterministic pseudo-random +-1 weight for (plane, dim): an
    arithmetic hash both engines compute identically (integer ops only)."""
    h = (plane * 1009 + dim * 9176 + 2027) % 7
    return F.when(h < 3, F.lit(-1)).otherwise(F.lit(1))


def lsh_bucket(vec_col: Column, *, n_planes: int = 8) -> Column:
    """Sign-of-projection bucket id in [0, 2^n_planes): bit p set iff
    hyperplane_p . v > 0. Elements are quantized to integers *before*
    the signed sum so the sign is summation-order-independent (a raw
    double sum would be engine/partitioning-dependent near zero)."""
    def plane_bit(p: int) -> Column:
        proj_q = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.size(vec_col) - 1),
                lambda x, d: F.floor(x.cast("double") * QE + F.lit(0.5)).cast("long")
                * hyperplane_weight(F.lit(p), d),
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        return F.when(proj_q > 0, F.lit(2**p)).otherwise(F.lit(0))

    out = F.lit(0)
    for p in range(n_planes):
        out = out + plane_bit(p)
    return out


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: exact cosine only within the query's LSH bucket.

    Recall < 1 by construction (that's the trade); the bucket column is
    the partition key at scale. Returns (query_id, neighbor_id, cosine,
    rank) like cosine_topk.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("__norm_q").alias("qn"),
        lsh_bucket(F.col(vec_col), n_planes=n_planes).alias("bucket"),
    )
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.col("__norm_q").alias("cn"),
        lsh_bucket(F.col(vec_col), n_planes=n_planes).alias("bucket_c"),
    )
    joined = c.join(F.broadcast(q), F.col("bucket") == F.col("bucket_c"))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn(
        "cosine",
        cosine_from_quantized(
            quantized_dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def random_projection(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 16,
    q: int = QD,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: project each
    vector onto ``out_dim`` deterministic ±1 hyperplanes (the Achlioptas
    sparse-sign construction, weights from the same integer hash as the
    LSH planes) — pairwise distances survive to within the JL bound at
    a fraction of the storage/compute, the standard pre-step before a
    dense index gets built at 100 TB.

    Components are quantized sums of ±vq (exact BIGINTs), emitted both
    raw (``proj_q`` array) and as doubles scaled back; a narrow
    projection with no UDF, no shuffle — the projection matrix never
    materializes anywhere (it IS the hash). Signs come from md5 of
    (plane, dim) — unbiased and independent across planes, unlike the
    small-modulus LSH bucket hash (whose planes repeat with period 7
    and lean +1/7; fine for coarse bucketing, fatal for JL geometry)."""

    def sign(p: int, d: Column) -> Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"rp{p}:"), d.cast("string"))), 1, 2
            ),
            16,
            10,
        ).cast("int")
        return F.when(h % 2 == 0, F.lit(-1)).otherwise(F.lit(1))

    vq = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * q + F.lit(0.5)).cast("long"),
    )
    comps = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vq,
                    F.transform(
                        F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                        lambda d: sign(p, d),
                    ),
                    lambda x, w: x * w,
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            for p in range(out_dim)
        ]
    )
    return df.select(
        F.col(id_col),
        comps.alias("proj_q"),
        F.transform(comps, lambda c: c.cast("double") / q).alias("projection"),
    )
