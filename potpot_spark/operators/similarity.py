"""Similarity search over embeddings (SURVEY.md §2.10: E36).

Brute-force cosine top-k is the exact baseline: broadcast the (small)
query set against the embedding corpus — a map-side nested loop with
NO shuffle of the corpus, then a per-query top-k window.  At 100 TB
corpus scale the same plan holds: queries broadcast, corpus streams.

The approximate scale path is sign-LSH (random-hyperplane) bucketing:
corpus and queries hash to sign-bit buckets, probe joins only its
bucket.  Deterministic hyperplanes -> deterministic output
(rows-only check; recall vs brute force bounded in tests).

All arithmetic is double (`float` inputs upcast first) so Spark and
the DuckDB oracle perform identical IEEE operations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import phash60_expr
from potpot_spark.registry import query

N_QUERIES = 5
TOP_K = 10


def as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(queries_df: DataFrame, corpus: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact cosine top-k: broadcast queries x streamed corpus."""
    q = F.broadcast(
        queries_df.select(F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("q_emb"))
    )
    c = corpus.select(F.col("vec_id"), as_double(F.col("embedding")).alias("c_emb"))
    scored = q.crossJoin(c).select(
        "query_id",
        "vec_id",
        cosine(F.col("q_emb"), F.col("c_emb")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cosine"), "rnk")
    )


@query(
    "sim_search_topk_cosine",
    oracle=f"""
        WITH q AS (
            SELECT vec_id, embedding FROM embeddings WHERE vec_id < {N_QUERIES}
        ),
        prod AS (
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   UNNEST(q.embedding)::DOUBLE AS qx,
                   UNNEST(e.embedding)::DOUBLE AS ex
            FROM q, embeddings e
        ),
        sims AS (
            SELECT query_id, vec_id,
                   SUM(qx * ex) / (SQRT(SUM(qx * qx)) * SQRT(SUM(ex * ex))) AS cos
            FROM prod GROUP BY query_id, vec_id
        )
        SELECT query_id, vec_id, ROUND(cos, 6) AS cosine, rnk
        FROM (
            SELECT query_id, vec_id, cos,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rnk
            FROM sims
        )
        WHERE rnk <= {TOP_K}
    """,
    tags=("E36",),
)
def sim_search_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E36 — exact cosine top-{TOP_K} for {N_QUERIES} query vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < N_QUERIES)
    return brute_force_topk(queries_df, emb, TOP_K)


# --- sign-LSH approximate path ------------------------------------------

N_PLANES = 6  # 2^6 = 64 buckets per table
N_TABLES = 4  # OR-construction: candidate if bucket-equal in ANY table


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane (no RNG: a fixed integer
    hash mix per (plane, coordinate), mapped to [-1, 1])."""
    coords = []
    for j in range(dim):
        h = (plane * 1_000_003 + j * 7_919 + 12_345) * 2_654_435_761 % (2**32)
        coords.append((h / 2**31) - 1.0)
    return coords


def _planes_lit(dim: int) -> Column:
    """All N_TABLES x N_PLANES hyperplanes as ONE literal array<array>."""
    return F.array(
        *[
            F.array(*[F.lit(c) for c in _hyperplane(dim, t * N_PLANES + p)])
            for t in range(N_TABLES)
            for p in range(N_PLANES)
        ]
    )


def _with_table_buckets(df: DataFrame, id_col: str, emb_col: str, dim: int) -> DataFrame:
    """Explode each vector into its (table, bucket) postings — the L-way
    replication of a multi-table LSH index (standard recall/cost
    trade: corpus storage x L, probe cost corpus/2^planes x L).

    All 24 plane projections evaluate through ONE ``transform`` over a
    literal plane matrix (identical zip_with/left-fold arithmetic per
    plane, so sign bits are bit-equal to the unrolled form and to the
    DuckDB oracle), then each table packs its 6 sign bits.  A/B at
    sf0.1: 4.27 s unrolled (24 independent aggregate trees — codegen
    size, not data, was the cost) -> 3.29 s one-pass."""
    projs = F.transform(
        _planes_lit(dim),
        lambda pl: F.aggregate(
            F.zip_with(F.col(emb_col), pl, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    d = df.select(id_col, emb_col, projs.alias("_projs"))
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                sum(
                    (
                        F.when(
                            F.col("_projs")[t * N_PLANES + p] > 0, F.lit(1 << p)
                        ).otherwise(F.lit(0))
                    )
                    for p in range(N_PLANES)
                ).alias("bucket"),
            )
            for t in range(N_TABLES)
        ]
    )
    return d.select(id_col, emb_col, F.explode(entries).alias("e")).select(
        id_col, emb_col, F.col("e.tbl").alias("tbl"), F.col("e.bucket").alias("bucket")
    )


def _fold_sql(products: str) -> str:
    """DuckDB left fold matching Spark's F.aggregate(…, 0.0, acc+x)
    bit-for-bit: same element order, same IEEE additions."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {products}), (a, x) -> a + x)"
    )


def _lsh_oracle_sql(dim: int = 64) -> str:
    """Full value oracle for the multi-table sign-LSH search.  The
    hyperplanes are fixed literals (no RNG), and every float reduction
    — projections, dot, norms — is reproduced as the IDENTICAL
    left fold via list_reduce, so sign bits, buckets, candidates and
    rerank order are all bit-equal to the Spark side."""
    plane_rows = ",\n                ".join(
        f"({t}, {p}, [{', '.join(repr(c) for c in _hyperplane(dim, t * N_PLANES + p))}])"
        for t in range(N_TABLES)
        for p in range(N_PLANES)
    )
    prod = f"list_transform(range({dim}), j -> ve.e[j+1] * plv.coefs[j+1])"
    dot_qc = f"list_transform(range({dim}), j -> qe.e[j+1] * ce.e[j+1])"
    qq = f"list_transform(range({dim}), j -> qe.e[j+1] * qe.e[j+1])"
    cc = f"list_transform(range({dim}), j -> ce.e[j+1] * ce.e[j+1])"
    return f"""
        WITH ve AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        plv AS (
            SELECT * FROM (VALUES
                {plane_rows}
            ) AS t(tbl, p, coefs)
        ),
        proj AS (
            SELECT ve.vec_id, plv.tbl, plv.p,
                   {_fold_sql(prod)} AS pr
            FROM ve CROSS JOIN plv
        ),
        buckets AS MATERIALIZED (
            SELECT vec_id, tbl,
                   CAST(SUM(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
            FROM proj GROUP BY vec_id, tbl
        ),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id
            FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
            WHERE q.vec_id < {N_QUERIES}
        ),
        scored AS (
            SELECT cand.query_id, cand.vec_id,
                   {_fold_sql(dot_qc)}
                   / (SQRT({_fold_sql(qq)}) * SQRT({_fold_sql(cc)})) AS cos
            FROM cand
            JOIN ve qe ON qe.vec_id = cand.query_id
            JOIN ve ce ON ce.vec_id = cand.vec_id
        )
        SELECT query_id, vec_id, ROUND(cos, 6) AS cosine, rnk
        FROM (
            SELECT query_id, vec_id, cos,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY cos DESC, vec_id
                   ) AS INT) AS rnk
            FROM scored
        )
        WHERE rnk <= {TOP_K}
    """


@query("sim_search_lsh_bucketed", oracle=_lsh_oracle_sql(), tags=("E36",))
def sim_search_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E36 (scale path) — multi-table sign-LSH ANN: 4 tables x 6
    hyperplanes; a vector is a candidate if it shares a bucket with the
    query in ANY table (OR-construction), candidates are reranked with
    exact cosine.  Per-query probe cost is ~L/2^planes of the corpus
    instead of a full scan.  Fully oracle-checked (previously
    rows-only): the hyperplanes are fixed literals and the DuckDB twin
    reproduces every float reduction as the identical left fold, so
    buckets, candidates and the reranked top-k match bit-for-bit;
    recall is additionally measured in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    # (no spread() here: the corpus is 2 k vectors at sf0.1 — an A/B
    # showed the repartition's shuffle + scheduling cost EXCEEDS the
    # single-task HOF compute at this cardinality; at real corpus
    # scale the scan arrives multi-split anyway)
    corpus = _with_table_buckets(
        emb.select("vec_id", as_double(F.col("embedding")).alias("c_emb")), "vec_id", "c_emb", dim
    )
    queries_df = F.broadcast(
        _with_table_buckets(
            emb.where(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("q_emb")
            ),
            "query_id",
            "q_emb",
            dim,
        )
    )
    candidates = (
        queries_df.join(corpus, ["tbl", "bucket"])
        .select("query_id", "q_emb", "vec_id", "c_emb")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = candidates.select(
        "query_id", "vec_id", cosine(F.col("q_emb"), F.col("c_emb")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cosine"), "rnk")
    )


# Pair-graph CTE shared between the pairs query and the semantic-keeper
# clustering oracle (one source string so they cannot drift apart —
# the graph.py _EDGE_SQL discipline applied to embedding space).
_EMB_PAIRS_CTE = """
        prod AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   UNNEST(a.embedding)::DOUBLE AS ax,
                   UNNEST(b.embedding)::DOUBLE AS bx
            FROM embeddings a
            JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
        ),
        pairs AS (
            SELECT vec_a, vec_b, ROUND(cos, 6) AS cosine
            FROM (
                SELECT vec_a, vec_b,
                       SUM(ax * bx) / (SQRT(SUM(ax * ax)) * SQRT(SUM(bx * bx))) AS cos
                FROM prod GROUP BY vec_a, vec_b
            )
            WHERE cos >= 0.35
        )
"""


@query(
    "dedup_embedding_cosine",
    oracle=f"""
        WITH {_EMB_PAIRS_CTE}
        SELECT vec_a, vec_b, cosine FROM pairs
    """,
    tags=("E36", "E35"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (>= 0.35; the synthetic
    embeddings top out at ~0.45 intra-label cosine, so the threshold is
    set where the operator has work to do) blocked by label — the
    embedding-space member of the dedup family.  Blocking bounds the
    pair count; the label key stands in for a coarse quantizer (IVF
    cell) at real scale.

    Execution: ``applyInPandas`` per (label, sub-block) cell — Arrow
    batches, pairwise cosine as ONE BLAS matrix product (normalize
    rows, ``S = A @ B.T``), threshold scan.  This is the declared
    Pandas-UDF exception (SURVEY.md §2.10): a self-join + per-pair
    64-step fold in JVM expressions does O(P·d) scalar work where the
    matrix product does it vectorized — measured ~4x faster at sf0.1,
    and the gap widens with cell size.  The driver-visible numbers
    still match the SQL oracle at the 1e-6 rounding grain
    (summation-order double drift is ~1e-15 relative).

    SKEW BOUND (the 100 TB property): a hot label must not become one
    unbounded Arrow batch, so labels larger than EMB_BLOCK_CAP are
    SALTED into ceil(n/cap) hash sub-blocks and every unordered pair
    is routed to exactly ONE (sub_a ≤ sub_b) cell — the triangle
    blocking recipe of join_range_banded applied to a quantizer cell.
    Each vector fans out to nsub cells (bounded replication, the price
    of bounded memory); max batch size is ≤ 2·cap rows regardless of
    label skew (property-tested with a deliberately hot label in
    tests/test_properties.py).  A label beyond EMB_BLOCK_CAP x
    EMB_NSUB_MAX escalates from hash salt to IVF-cell routing with an
    exact triangle-inequality cell-pair prune (_cosine_pairs_celled,
    r4 verdict #4): candidate volume then tracks cluster structure,
    not label-size squared.  The oracle is unchanged — blocking (and
    the prune, which only discards provably sub-threshold cell
    pairs) is pure execution strategy."""
    return _embedding_pairs_shared(spark, sf_dir)


EMB_BLOCK_CAP = 4096


def _embedding_pairs_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded intra-label cosine pair graph — a SHARED
    MATERIALIZED INTERMEDIATE (potpot_spark.materialize): the pairs
    query and the semantic-keeper clustering both read it, exactly as
    the n-gram pair graph is shared on the text side."""
    from potpot_spark.materialize import shared_intermediate

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "label", as_double(F.col("embedding")).alias("emb")
        )
        return _cosine_pairs_blocked(emb, threshold=0.35, cap=EMB_BLOCK_CAP)

    return shared_intermediate(spark, sf_dir, "embedding_cosine_pairs", build)


@query(
    "dedup_semantic_keeper",
    oracle=f"""
        WITH RECURSIVE {_EMB_PAIRS_CTE},
        edges AS (
            SELECT vec_a AS src, vec_b AS dst FROM pairs
            UNION
            SELECT vec_b, vec_a FROM pairs
        ),
        reach AS (
            SELECT vec_id AS node, vec_id AS label FROM embeddings
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.label < e.dst
        ),
        comp AS (
            SELECT node, MIN(label) AS component FROM reach GROUP BY node
        )
        SELECT component AS keeper_vec_id,
               CAST(COUNT(*) AS BIGINT) AS cluster_size
        FROM comp GROUP BY component
    """,
    tags=("E35", "E36"),
)
def dedup_semantic_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup (the SemDeDup recipe): cluster the embedding
    near-duplicate pair graph (cosine >= 0.35 within label blocks) by
    connected components and keep ONE canonical representative — the
    minimum vec_id — per cluster; singletons keep themselves.  This is
    pairs -> clusters -> keeper applied to embedding space, the
    third clustering consumer of the min-label-propagation kernel
    (after text CC and label propagation), and it reads the SAME
    shared pair graph as dedup_embedding_cosine — at 100 TB both live
    off one materialized pair table per corpus snapshot.

    Output: (keeper_vec_id, cluster_size) per cluster; oracle is the
    recursive-CTE min-reachable-id twin over the shared pair CTE."""
    from potpot_spark.operators.graph import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = _embedding_pairs_shared(spark, sf_dir).select(
        F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
    )
    nodes = emb.select(F.col("vec_id").alias("node"))
    comp = connected_components(nodes, pairs)
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    ).select(F.col("component").alias("keeper_vec_id"), "cluster_size")


# Hash-salt ceiling: a label bigger than cap * EMB_NSUB_MAX stops
# hash-salting (which still evaluates ALL intra-label pairs) and
# routes through per-corpus IVF cells with exact cell-pair pruning —
# the r4 verdict #4 scale path, coded in _cosine_pairs_celled.
EMB_NSUB_MAX = 8
# Side-id encoding for two-level (cell, salt) routing keys.
_SALT_BASE = 1 << 20

_PAIRS_SCHEMA = "vec_a bigint, vec_b bigint, cosine double"


def _pairs_kernel(threshold: float):
    """The BLAS pair kernel shared by both routing strategies: within
    a group keyed (label, side_a, side_b), normalize rows, one matrix
    product, threshold scan.  side_a == side_b is the triangle case
    (ids ascending so vec_a < vec_b); otherwise the cross-rectangle."""
    import numpy as np
    import pandas as pd

    def cell_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _, cell_a, cell_b = key

        def side(sub: int) -> tuple[np.ndarray, np.ndarray]:
            part = pdf[pdf["sub"] == sub].sort_values("vec_id")
            ids = part["vec_id"].to_numpy()
            if len(ids) == 0:  # a hash sub-block can be empty for tiny cells
                return ids, np.empty((0, 1))
            m = np.stack(part["emb"].to_numpy()).astype(np.float64)
            m /= np.linalg.norm(m, axis=1, keepdims=True)
            return ids, m

        if cell_a == cell_b:
            ids, m = side(cell_a)
            sims = m @ m.T
            ia, ib = np.triu_indices(len(ids), k=1)  # ids asc -> vec_a < vec_b
            keep = sims[ia, ib] >= threshold
            va, vb, cs = ids[ia[keep]], ids[ib[keep]], sims[ia[keep], ib[keep]]
        else:
            ids_a, ma = side(cell_a)
            ids_b, mb = side(cell_b)
            if len(ids_a) == 0 or len(ids_b) == 0:
                va = vb = np.empty(0, dtype=np.int64)
                cs = np.empty(0)
            else:
                sims = ma @ mb.T
                ia, ib = np.nonzero(sims >= threshold)
                ra, rb = ids_a[ia], ids_b[ib]
                va, vb = np.minimum(ra, rb), np.maximum(ra, rb)
                cs = sims[ia, ib]
        return pd.DataFrame(
            {"vec_a": va, "vec_b": vb, "cosine": np.round(cs, 6)}
        )

    return cell_pairs


def _cosine_pairs_blocked(
    emb: DataFrame, threshold: float, cap: int, nsub_max: int = EMB_NSUB_MAX
) -> DataFrame:
    """All intra-label vector pairs with cosine >= threshold.

    Dispatch (r4 verdict #4): labels up to ``cap * nsub_max`` vectors
    use hash-salted triangle cells (_cosine_pairs_salted — bounded
    batches, but still all intra-label pairs); a label beyond that is
    HOT, and hash salting would keep candidate volume quadratic in the
    label size, so hot labels route through IVF coarse cells with an
    exact geometric prune instead (_cosine_pairs_celled).  Only ONE
    scalar (the hot-label count) reaches the driver — it decides
    whether the hot branch exists in the plan at all; the row split
    itself is a broadcast semi/anti join against the aggregate-scale
    hot directory, never a collect+isin literal (r5 ADVICE)."""
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("_n"))
    hot_dir = sizes.where(F.col("_n") > cap * nsub_max).select("label")
    if hot_dir.count() == 0:
        return _cosine_pairs_salted(emb, threshold, cap)
    cold_pairs = _cosine_pairs_salted(
        emb.join(F.broadcast(hot_dir), "label", "left_anti"), threshold, cap
    )
    hot_pairs = _cosine_pairs_celled(
        emb.join(F.broadcast(hot_dir), "label", "left_semi"), threshold, cap
    )
    return cold_pairs.unionByName(hot_pairs)


def _cosine_pairs_salted(emb: DataFrame, threshold: float, cap: int) -> DataFrame:
    """Hash-salted triangle routing, cells of at most 2*cap rows.

    Routing: vector v gets sub = xxhash64(vec_id) mod nsub(label);
    the unordered pair {u, v} is evaluated only in the cell
    (min(sub_u, sub_v), max(sub_u, sub_v)), which both u and v reach
    because each vector replicates into every cell touching its
    sub-block.  nsub == 1 (the common case) degenerates to one batch
    per label with zero replication."""
    sizes = emb.groupBy("label").agg(
        F.ceil(F.count(F.lit(1)) / cap).cast("int").alias("nsub")
    )
    # label cardinality is aggregate-scale (it IS the blocking key);
    # at 100 TB this broadcast is the coarse-quantizer cell directory
    salted = emb.join(F.broadcast(sizes), "label").select(
        "label", "vec_id", "emb", "nsub",
        F.pmod(F.xxhash64("vec_id"), F.col("nsub")).cast("int").alias("sub"),
    )
    routed = salted.select(
        "label", "vec_id", "emb", "sub",
        F.explode(F.sequence(F.lit(0), F.col("nsub") - 1)).alias("other"),
    ).select(
        "label", "vec_id", "emb", "sub",
        F.least("sub", "other").alias("cell_a"),
        F.greatest("sub", "other").alias("cell_b"),
    )
    # (min(s,t), max(s,t)) over t = 0..nsub-1 yields nsub DISTINCT cells
    # per vector — no dedup pass (and its shuffle) needed.
    return routed.groupBy("label", "cell_a", "cell_b").applyInPandas(
        _pairs_kernel(threshold), _PAIRS_SCHEMA
    )


def _celled_routed(hot: DataFrame, threshold: float, cap: int) -> DataFrame:
    """IVF-cell routing for HOT labels — bounds the candidate set
    semantically, not just the task size (r4 verdict #4, the coded
    form of the 100 TB plan the r3/r4 docstrings promised).

    Geometry: on unit vectors, cosine(u,v) >= t  <=>  ||u - v|| <=
    sqrt(2(1-t)).  Assign each vector to its nearest k-means centroid
    (the corpus quantizer from ivf.train_ivf_centroids, trained here
    on the hot labels), record per-(label, cell) radius r = max
    distance to the centroid, and per centroid pair the distance
    D_ij.  By the triangle inequality every u in cell i, v in cell j
    satisfy ||u - v|| >= D_ij - r_i - r_j, so a cell pair with
    D_ij - r_i - r_j > sqrt(2(1-t)) (+1e-6 float slack) provably
    contains NO qualifying pair and is never routed — candidate
    volume tracks the cluster structure (sum of surviving-cell-pair
    rectangles) instead of the label-size square; the property test
    in tests/test_properties.py pins the sublinear bound with one
    giant clustered label.  Surviving cells still hash-salt into
    sub-blocks of <= cap rows, so the Arrow batch bound is unchanged.

    Every unordered pair reaches exactly ONE group: cells (ci <= cj)
    survive or are pruned as a pair, and within a surviving pair the
    (salt_i, salt_j) rectangle partition covers each (u, v) once —
    the same triangle discipline as the salted path, applied to
    composite side ids ``cell * _SALT_BASE + salt``."""
    import math

    from potpot_spark.operators.ivf import sq_dist, train_ivf_centroids

    # normalize once (cosine is scale-invariant; the prune bound and
    # the radii need unit vectors)
    unit = hot.select(
        "label", "vec_id", F.col("emb").alias("_raw"), norm(F.col("emb")).alias("_nrm")
    ).select(
        "label", "vec_id",
        F.transform("_raw", lambda x: x / F.col("_nrm")).alias("emb"),
    )
    n_max = unit.groupBy("label").count().agg(F.max("count")).first()[0] or 0
    k = max(2, min(64, -(-int(n_max) // cap)))
    cents = train_ivf_centroids(unit.select("vec_id", "emb"), k=k, iters=3)
    scored = unit.crossJoin(F.broadcast(cents)).select(
        "label", "vec_id", "emb", "cell_id",
        sq_dist(F.col("emb"), F.col("centroid")).alias("d2"),
    )
    assigned = (
        scored.groupBy("label", "vec_id")
        .agg(F.min(F.struct("d2", "cell_id")).alias("_b"), F.first("emb").alias("emb"))
        .select(
            "label", "vec_id", "emb",
            F.col("_b.cell_id").alias("cell"), F.col("_b.d2").alias("d2"),
        )
    )
    cellstats = (
        assigned.groupBy("label", "cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sqrt(F.max("d2")).alias("r"))
        .withColumn("nsub", F.ceil(F.col("n") / cap).cast("int"))
    )
    cd = cents.alias("i").crossJoin(cents.alias("j")).select(
        F.col("i.cell_id").alias("ci"),
        F.col("j.cell_id").alias("cj"),
        F.sqrt(sq_dist(F.col("i.centroid"), F.col("j.centroid"))).alias("dij"),
    )
    lim = math.sqrt(max(0.0, 2.0 * (1.0 - threshold))) + 1e-6
    si = cellstats.select(
        "label", F.col("cell").alias("ci"), F.col("r").alias("ri"),
        F.col("nsub").alias("nsi"),
    )
    sj = cellstats.select(
        "label", F.col("cell").alias("cj"), F.col("r").alias("rj"),
        F.col("nsub").alias("nsj"),
    )
    surv = (
        si.join(sj, "label")
        .where(F.col("ci") <= F.col("cj"))
        .join(F.broadcast(cd), ["ci", "cj"])
        .where(
            (F.col("ci") == F.col("cj"))
            | (F.col("dij") - F.col("ri") - F.col("rj") <= F.lit(lim))
        )
    )
    routes = (
        surv.select(
            "label", "ci", "cj", "nsj",
            F.explode(F.sequence(F.lit(0), F.col("nsi") - 1)).alias("si"),
        )
        .select(
            "label", "ci", "cj", "si",
            F.explode(F.sequence(F.lit(0), F.col("nsj") - 1)).alias("sj"),
        )
        .select(
            "label",
            (F.col("ci").cast("bigint") * _SALT_BASE + F.col("si")).alias("ga"),
            (F.col("cj").cast("bigint") * _SALT_BASE + F.col("sj")).alias("gb"),
        )
        .where(F.col("ga") <= F.col("gb"))
    )
    vec = assigned.join(
        F.broadcast(cellstats.select("label", "cell", "nsub")), ["label", "cell"]
    ).select(
        "label", "vec_id", "emb",
        (
            F.col("cell").cast("bigint") * _SALT_BASE
            + F.pmod(F.xxhash64("vec_id"), F.col("nsub"))
        ).alias("sub"),
    )
    # both route joins are two-key broadcast HASH joins (label, side):
    # sub == ga / sub == gb ride in the join key, so no per-label route
    # fan-out ever materializes pre-filter
    cross_routes = routes.where(F.col("ga") != F.col("gb"))
    ra = vec.join(
        F.broadcast(routes),
        [vec["label"] == routes["label"], vec["sub"] == routes["ga"]],
    ).select(vec["label"], "vec_id", "emb", "sub", "ga", "gb")
    rb = vec.join(
        F.broadcast(cross_routes),
        [vec["label"] == cross_routes["label"], vec["sub"] == cross_routes["gb"]],
    ).select(vec["label"], "vec_id", "emb", "sub", "ga", "gb")
    return ra.unionByName(rb).select(
        "label", "vec_id", "emb", "sub",
        F.col("ga").alias("cell_a"), F.col("gb").alias("cell_b"),
    )


def _cosine_pairs_celled(hot: DataFrame, threshold: float, cap: int) -> DataFrame:
    """Kernel application over the celled routing (split out so the
    property test can measure candidate volume on the routed frame)."""
    routed = _celled_routed(hot, threshold, cap)
    return routed.groupBy("label", "cell_a", "cell_b").applyInPandas(
        _pairs_kernel(threshold), _PAIRS_SCHEMA
    )


# 2^24: float32 has a 24-bit significand, so x * 2^24 recovers integer
# mantissa bits for |x| >= 0.5 and a deterministic truncation below.
_FIXED_POINT = float(1 << 24)


@query(
    "embedding_centroid_per_label",
    oracle=f"""
        WITH comps AS (
            SELECT label,
                   generate_subscripts(embedding, 1) - 1 AS dim,
                   unnest(embedding) AS comp
            FROM embeddings
        )
        SELECT label, dim,
               CAST(SUM(CAST(FLOOR(CAST(comp AS DOUBLE) * {_FIXED_POINT}) AS BIGINT)) AS DOUBLE)
                 / (COUNT(*) * {_FIXED_POINT}) AS centroid,
               COUNT(*) AS n
        FROM comps GROUP BY label, dim
    """,
    tags=("E36", "E47"),
)
def embedding_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors — the distributed
    vector-mean kernel under k-means/IVF training and class-prototype
    construction, in (label, dim, centroid) long form.

    Summing floats in parallel is order-dependent, so a naive mean
    drifts between runs and cluster sizes.  The engine sums FIXED-POINT
    components instead: ``floor(x · 2²⁴)`` maps each float32 exactly
    (multiplying by a power of two is lossless; floor deterministically
    truncates sub-integer bits for |x| < 0.5) onto integers whose sum
    is exact and associative — the same reproducibility contract the
    decimal money path (functions/numeric.py) gives TPC-H aggregates,
    chosen per dtype.  Plan: posexplode → one hash aggregate on
    (label, dim) with map-side partials; 64 dims × labels rows out."""
    e = load_table(spark, sf_dir, "embeddings")
    comps = e.select(
        "label", F.posexplode("embedding").alias("dim", "comp")
    )
    fx = F.floor(F.col("comp").cast("double") * F.lit(_FIXED_POINT)).cast("bigint")
    return (
        comps.groupBy("label", "dim")
        .agg(F.sum(fx).alias("fxsum"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "dim",
            (F.col("fxsum").cast("double") / (F.col("n") * F.lit(_FIXED_POINT))).alias(
                "centroid"
            ),
            "n",
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
        WITH q AS (
            SELECT vec_id,
                   list_min(embedding) AS mn,
                   list_max(embedding) AS mx
            FROM embeddings
        ),
        codes AS (
            SELECT e.vec_id,
                   list_transform(
                       e.embedding,
                       x -> LEAST(CAST(FLOOR((CAST(x AS DOUBLE) - CAST(q.mn AS DOUBLE))
                                             / (CAST(q.mx AS DOUBLE) - CAST(q.mn AS DOUBLE))
                                             * 255.0) AS BIGINT), 255)
                   ) AS c
            FROM embeddings e JOIN q USING (vec_id)
        )
        SELECT vec_id,
               CAST(list_aggregate(c, 'sum') AS BIGINT) AS code_sum,
               CAST(list_aggregate(c, 'min') AS BIGINT) AS code_min,
               CAST(list_aggregate(c, 'max') AS BIGINT) AS code_max
        FROM codes
    """,
    tags=("E36", "E38"),
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector scalar quantization to int8 codes — the standard 4×
    memory reduction before ANN indexing (float32 → uint8 per
    component, per-vector min/max calibration):
    ``code = min(floor((x - mn)/(mx - mn) · 255), 255)``.

    The whole transform is row-local array algebra (array_min/max +
    transform) inside codegen — no shuffle, no UDF; at 100 TB
    quantization cost is scan cost.  The clamp handles the x = mx
    endpoint.  Parity is exact because the formula uses only
    correctly-rounded IEEE ops and integer floor, identically
    parenthesized on both sides; outputs are integer code summaries
    (sum/min/max per vector) to keep the comparison scalar."""
    e = load_table(spark, sf_dir, "embeddings")
    mn = F.array_min("embedding").cast("double")
    mx = F.array_max("embedding").cast("double")
    codes = F.transform(
        "embedding",
        lambda x: F.least(
            F.floor((x.cast("double") - mn) / (mx - mn) * 255.0).cast("bigint"),
            F.lit(255).cast("bigint"),
        ),
    )
    return e.select(
        "vec_id",
        F.aggregate(codes, F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("code_sum"),
        F.array_min(codes).alias("code_min"),
        F.array_max(codes).alias("code_max"),
    )


MRL_DIM = 16


@query(
    "embedding_matryoshka_truncate",
    oracle=f"""
        WITH per_vec AS (
            SELECT label,
                   list_sum(list_transform(embedding[1:{MRL_DIM}],
                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                     AS trunc_ss,
                   list_sum(list_transform(embedding,
                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
                     AS full_ss
            FROM embeddings
        )
        SELECT label,
               COUNT(*) AS n_vecs,
               CAST(SUM(CAST(ROUND(trunc_ss / full_ss, 6) AS DECIMAL(12,6))) AS DOUBLE)
                 / COUNT(*) AS avg_energy_retained
        FROM per_vec
        GROUP BY label
    """,
    tags=("E36", "E38"),
)
def embedding_matryoshka_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: keep only the first 16 of 64
    embedding dimensions and measure the retained L2 energy
    (‖v[:16]‖² / ‖v‖²) per label — the calibration run behind
    truncate-then-rerank ANN serving (search the cheap 16-d prefix,
    rerank survivors at full width; 4× less memory and bandwidth,
    same recall if the energy holds up — the same trade
    embedding_quantize_int8 makes in amplitude instead of width).

    All math is row-local: two sequential squared-sum folds over the
    array (identical left-to-right order in both engines), one
    division, rounded at 1e-6 like the cosine ops; the per-label mean
    then rides the exact-decimal path.  No shuffle until the final
    |labels|-row aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    per_vec = emb.select(
        "label",
        sq_sum(F.slice("embedding", 1, MRL_DIM)).alias("trunc_ss"),
        sq_sum(F.col("embedding")).alias("full_ss"),
    )
    ratio = F.round(F.col("trunc_ss") / F.col("full_ss"), 6).cast("decimal(12,6)")
    return per_vec.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        (F.sum(ratio).cast("double") / F.count(F.lit(1))).alias("avg_energy_retained"),
    )


COV_DIMS = 8


@query(
    "embedding_covariance_matrix",
    oracle=f"""
        WITH pos AS (
            SELECT vec_id,
                   CAST(unnest(range(1, {COV_DIMS} + 1)) AS INT) AS i
            FROM embeddings
        ),
        vals AS (
            SELECT p.vec_id, p.i,
                   CAST(e.embedding[p.i] AS DOUBLE) AS x
            FROM pos p JOIN embeddings e ON e.vec_id = p.vec_id
        ),
        pairs AS (
            SELECT a.i AS di, b.i AS dj,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(a.x, 9) AS DECIMAL(14,9))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(ROUND(b.x, 9) AS DECIMAL(14,9))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(ROUND(a.x * b.x, 12) AS DECIMAL(18,12))) AS DOUBLE)
                     AS sxy
            FROM vals a JOIN vals b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        )
        SELECT di, dj,
               ROUND((sxy - sx * sy / n) / (n - 1), 9) AS cov
        FROM pairs
        ORDER BY di, dj
    """,
    tags=("E36", "E43"),
)
def embedding_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariance matrix of the first 8 embedding dimensions (upper
    triangle) — the embedding-space diagnostic behind PCA/whitening
    decisions and collapsed-dimension detection (a near-zero variance
    row means the encoder wastes capacity; large off-diagonals mean
    the basis is redundant).

    Distributed shape: ONE pass accumulates (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ) per
    (i≤j) pair as exact decimals (products rounded to 12 dp first —
    the established order-independence idiom), then one division per
    cell.  The d²/2 pair fan-out rides a per-vector explode+self-join
    on vec_id (row-local, no shuffle until the 36-group aggregate);
    at production d the same pass runs on matrix-blocked pairs.  The
    d×d result feeds a driver-side eigensolver for PCA — the correct
    split of labor (data pass distributed, d² algebra local)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, COV_DIMS)).alias(
            "i0", "x"
        ),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "x")
    a = vals.select("vec_id", F.col("i").alias("di"), F.col("x").alias("xa"))
    b = vals.select("vec_id", F.col("i").alias("dj"), F.col("x").alias("xb"))
    pairs = (
        a.join(b, "vec_id")
        .where(F.col("di") <= F.col("dj"))
        .groupBy("di", "dj")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("xa"), 9).cast("decimal(14,9)")).cast("double").alias("sx"),
            F.sum(F.round(F.col("xb"), 9).cast("decimal(14,9)")).cast("double").alias("sy"),
            F.sum(F.round(F.col("xa") * F.col("xb"), 12).cast("decimal(18,12)"))
            .cast("double")
            .alias("sxy"),
        )
    )
    return (
        pairs.select(
            "di", "dj",
            F.round(
                (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n"))
                / (F.col("n") - 1),
                9,
            ).alias("cov"),
        )
        .orderBy("di", "dj")
    )


@query(
    "embedding_norm_audit",
    oracle=f"""
        WITH normed AS (
            SELECT vec_id, label,
                   ROUND(SQRT({_fold_sql("list_transform(e, x -> x * x)")}), 9) AS nrm
            FROM (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
                FROM embeddings
            ) ve
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_vecs,
               ROUND(MIN(nrm), 9) AS min_norm,
               ROUND(MAX(nrm), 9) AS max_norm,
               CAST(SUM(CAST(nrm AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS mean_norm,
               CAST(SUM(CASE WHEN nrm < 1e-9 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_degenerate
        FROM normed GROUP BY label
    """,
    tags=("E36", "E42"),
)
def embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding NORM audit per label: min/max/mean L2 norms and the
    count of degenerate (near-zero) vectors — the pre-flight check
    before any cosine pipeline, since a zero vector makes cosine
    undefined and a norm collapse means the encoder upstream broke.
    Norms compute as the identical left fold both engines use for the
    LSH/cosine oracles, round to 9 dp, and re-enter EXACT DECIMAL for
    the order-free mean (the established discipline end to end).
    One narrow map pass + one grouped aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    ve = emb.select("vec_id", "label", as_double(F.col("embedding")).alias("e"))
    nrm = F.round(norm(F.col("e")), 9)
    normed = ve.select("label", nrm.alias("nrm"))
    return normed.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.min("nrm"), 9).alias("min_norm"),
        F.round(F.max("nrm"), 9).alias("max_norm"),
        (F.sum(F.col("nrm").cast("decimal(18,9)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_norm"
        ),
        F.sum(F.when(F.col("nrm") < 1e-9, 1).otherwise(0)).cast("bigint").alias(
            "n_degenerate"
        ),
    )


HUB_K = 5       # kNN-graph out-degree
HUB_NPROBE = 3  # probed coarse cells per src on the hot-label path


def _knn_celled_candidates(
    v: DataFrame, cap: int = EMB_BLOCK_CAP, nprobe: int = HUB_NPROBE
) -> DataFrame:
    """kNN candidate generation for HOT labels via IVF-cell routing
    (r5 verdict #4 — the nprobe-nearest-cells union the hubness
    docstring promised, as code): train a coarse quantizer on the hot
    labels, assign every vector to its nearest cell, and have each
    src probe only the union of its ``nprobe`` nearest cells — the
    sim_search_ivf discipline applied to graph construction.  Per-src
    candidate count is bounded by the rows in its nprobe cells (the
    property test pins this on a skewed clustered corpus), where hash
    salting alone stays quadratic in the label size.

    Like IVF search, the hot-label kNN edges are nprobe-approximate
    (a true neighbor hiding in an unprobed cell is missed); the cold
    path and every test-scale corpus remain exact — a label must
    exceed cap * EMB_NSUB_MAX (32k rows at defaults) to route here.

    Cells bigger than ``cap`` hash-salt into sub-blocks exactly like
    the exact path, so the equi-join task size stays bounded by cap
    regardless of cell skew.  Input frame: (label, vec_id, e, nrm);
    output: (label, src, dst, ea, na, eb, nb) candidate rows, each
    unordered (src, dst) pair at most once per direction (dst lives
    in exactly one (cell, sub); src probes distinct cells)."""
    from potpot_spark.operators.ivf import assign_cells, train_ivf_centroids

    unit = v.select(
        "label", "vec_id", "e", "nrm",
        F.transform("e", lambda x: x / F.col("nrm")).alias("emb"),
    )
    n_max = unit.groupBy("label").count().agg(F.max("count")).first()[0] or 0
    k = max(2, min(64, -(-int(n_max) // cap)))
    cents = train_ivf_centroids(unit.select("vec_id", "emb"), k=k, iters=3)
    assigned = assign_cells(unit, cents)
    cellstats = assigned.groupBy("label", "cell_id").agg(
        F.ceil(F.count(F.lit(1)) / cap).cast("int").alias("nsub")
    )
    dst = assigned.join(F.broadcast(cellstats), ["label", "cell_id"]).select(
        "label", "cell_id",
        F.col("vec_id").alias("dst"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
        F.pmod(F.xxhash64("vec_id"), F.col("nsub")).cast("int").alias("sub"),
    )
    # a probed (label, cell) empty for that label drops in the inner
    # join with cellstats — probes only fan out into occupied cells
    src = (
        assign_cells(unit, cents, n=nprobe)
        .join(F.broadcast(cellstats), ["label", "cell_id"])
        .select(
            "label", "cell_id",
            F.col("vec_id").alias("src"),
            F.col("e").alias("ea"),
            F.col("nrm").alias("na"),
            F.explode(F.sequence(F.lit(0), F.col("nsub") - 1)).alias("sub"),
        )
    )
    return src.join(dst, ["label", "cell_id", "sub"]).where(
        F.col("src") != F.col("dst")
    )


_KNN_EDGES_SCHEMA = "src bigint, dst bigint, cos double"


def _knn_edge_kernel(k: int):
    """Per-(label, cell_s, cell_t) EXACT top-k kernel (r9, closing the
    r8 anchor residual — the expression-tree scoring of 400k candidate
    pairs through F.aggregate/zip_with HOF lambdas was the measured
    hotspot at 2.4 s; an unrolled 64-term codegen expression measured
    WORSE at 6.9 s, JIT bails on the generated method size).  One
    Arrow batch per cell ships the bounded vector block (≤ 2·cap
    rows); inside, the pair cosines build DIMENSION-BY-DIMENSION —
    S = ((0 + x₁y₁) + x₂y₂) + … via accumulated outer products, the
    squared norms likewise — so every per-pair double reproduces the
    exact left-fold IEEE order of the DuckDB list_reduce oracle
    (np.dot/BLAS would reorder the summation; at the 12-dp ranking
    grain that is a latent near-tie hazard this kernel never takes).
    Emits per-src top-k edges under the (cos desc, dst asc) tie-break
    — identical to the window ranking it replaces — so the cross-cell
    merge window downstream sees ≤ nsub·k rows per src, not the full
    candidate rectangle.  NOTE the thresholded shared intermediate
    `embedding_cosine_pairs` (cos ≥ 0.35) CANNOT serve this operator:
    a src with < k neighbors above the threshold takes sub-threshold
    edges into its exact kNN, which the truncated pair graph has
    discarded."""
    import numpy as np
    import pandas as pd

    empty = pd.DataFrame(
        {
            "src": pd.Series([], dtype="int64"),
            "dst": pd.Series([], dtype="int64"),
            "cos": pd.Series([], dtype="float64"),
        }
    )

    def cell_knn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _, cell_s, cell_t = key
        a = pdf[pdf["role"] == 0]
        b = a if cell_s == cell_t else pdf[pdf["role"] == 1]
        if len(a) == 0 or len(b) == 0:
            return empty
        ida = a["vec_id"].to_numpy()
        idb = b["vec_id"].to_numpy()
        A = np.stack(a["e"].to_numpy()).astype(np.float64)
        B = (
            A
            if b is a
            else np.stack(b["e"].to_numpy()).astype(np.float64)
        )
        d = A.shape[1]
        S = np.zeros((len(ida), len(idb)))
        na = np.zeros(len(ida))
        nb_ = np.zeros(len(idb))
        for i in range(d):
            S = S + np.outer(A[:, i], B[:, i])
            na = na + A[:, i] * A[:, i]
            nb_ = nb_ + B[:, i] * B[:, i]
        cs = np.round(S / np.outer(np.sqrt(na), np.sqrt(nb_)), 12)
        srcs: list = []
        dsts: list = []
        coss: list = []
        for p in range(len(ida)):
            order = np.lexsort((idb, -cs[p]))
            taken = 0
            for q in order:
                if idb[q] == ida[p]:
                    continue
                srcs.append(ida[p])
                dsts.append(idb[q])
                coss.append(cs[p, q])
                taken += 1
                if taken == k:
                    break
        return pd.DataFrame(
            {
                "src": pd.Series(srcs, dtype="int64"),
                "dst": pd.Series(dsts, dtype="int64"),
                "cos": pd.Series(coss, dtype="float64"),
            }
        )

    return cell_knn


def _knn_edges_salted(
    v: DataFrame, k: int, cap: int = EMB_BLOCK_CAP
) -> DataFrame:
    """Hash-salted (src-cell, dst-cell) routing for the exact kNN
    kernel: vector u (sub s) serves as the SRC side of cells (s, t)
    for every t and as the DST side of cells (s', sub) for every
    s' ≠ sub (the same-cell case reuses the src rows as both sides,
    halving the Arrow transfer in the nsub == 1 common case).  Every
    ordered (u, v) pair meets in exactly one cell (sub_u, sub_v); the
    per-cell top-k under-approximates nothing because a src's true
    top-k is the top-k of its per-cell top-k union."""
    sizes = v.groupBy("label").agg(
        F.ceil(F.count(F.lit(1)) / cap).cast("int").alias("nsub")
    )
    base = v.join(F.broadcast(sizes), "label").select(
        "label",
        "vec_id",
        "e",
        "nsub",
        F.pmod(F.xxhash64("vec_id"), F.col("nsub")).cast("int").alias("sub"),
    )
    grid = F.explode(F.sequence(F.lit(0), F.col("nsub") - 1))
    a_side = base.select(
        "label",
        "vec_id",
        "e",
        F.col("sub").alias("cell_s"),
        grid.alias("cell_t"),
        F.lit(0).alias("role"),
    )
    b_side = base.select(
        "label",
        "vec_id",
        "e",
        grid.alias("cell_s"),
        F.col("sub").alias("cell_t"),
        F.lit(1).alias("role"),
    ).where(F.col("cell_s") != F.col("cell_t"))
    routed = a_side.unionByName(b_side)
    return routed.groupBy("label", "cell_s", "cell_t").applyInPandas(
        _knn_edge_kernel(k), _KNN_EDGES_SCHEMA
    )


def _knn_candidates(
    v: DataFrame,
    cap: int = EMB_BLOCK_CAP,
    nsub_max: int = EMB_NSUB_MAX,
    nprobe: int = HUB_NPROBE,
) -> DataFrame:
    """kNN candidate frame (label, src, dst, ea, na, eb, nb) with the
    hot/cold dispatch: labels up to cap * nsub_max keep the exact
    salted all-pairs routing; beyond that, IVF-cell nprobe routing
    (_knn_celled_candidates).  One scalar (hot-label count) decides
    the plan shape; the row split is broadcast semi/anti joins."""
    cols = ["label", "src", "dst", "ea", "na", "eb", "nb"]
    sizes = v.groupBy("label").agg(
        F.ceil(F.count(F.lit(1)) / cap).cast("int").alias("nsub")
    )
    hot_dir = sizes.where(F.col("nsub") > nsub_max).select("label")
    v_exact = v
    cand_hot = None
    if hot_dir.count() > 0:
        v_exact = v.join(F.broadcast(hot_dir), "label", "left_anti")
        cand_hot = _knn_celled_candidates(
            v.join(F.broadcast(hot_dir), "label", "left_semi"),
            cap=cap,
            nprobe=nprobe,
        )
    vs = v_exact.join(F.broadcast(sizes), "label")
    a = vs.select(
        "label",
        F.col("vec_id").alias("src"),
        F.col("e").alias("ea"),
        F.col("nrm").alias("na"),
        F.pmod(F.xxhash64("vec_id"), F.col("nsub")).cast("int").alias("sub"),
    )
    b = vs.select(
        "label",
        F.col("vec_id").alias("dst"),
        F.col("e").alias("eb"),
        F.col("nrm").alias("nb"),
        F.explode(F.sequence(F.lit(0), F.col("nsub") - 1)).alias("sub"),
    )
    cand = (
        a.join(b, ["label", "sub"])
        .where(F.col("src") != F.col("dst"))
        .select(*cols)
    )
    if cand_hot is not None:
        cand = cand.unionByName(cand_hot.select(*cols))
    return cand


@query(
    "embedding_hubness_knn_graph",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        scored AS (
            SELECT a.label, a.vec_id AS src, b.vec_id AS dst,
                   ROUND(
                       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                           list_transform(range(1, len(a.e) + 1),
                                          j -> a.e[j] * b.e[j])),
                           (acc, x) -> acc + x)
                       / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                              list_transform(a.e, x -> x * x)), (acc, x) -> acc + x))
                          * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                              list_transform(b.e, x -> x * x)), (acc, x) -> acc + x))),
                       12) AS cos
            FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT label, src, dst
            FROM (
                SELECT label, src, dst,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY cos DESC, dst) AS rn
                FROM scored
            ) WHERE rn <= {HUB_K}
        ),
        indeg AS (
            SELECT v.label, v.vec_id,
                   CAST(COALESCE(d.cnt, 0) AS BIGINT) AS in_degree
            FROM v LEFT JOIN (
                SELECT dst, CAST(COUNT(*) AS BIGINT) AS cnt FROM knn GROUP BY dst
            ) d ON v.vec_id = d.dst
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(MAX(in_degree) AS BIGINT) AS max_in_degree,
               CAST(SUM(CASE WHEN in_degree >= 2 * {HUB_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hubs,
               CAST(SUM(CASE WHEN in_degree = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_antihubs,
               CAST(SUM(in_degree * in_degree) AS BIGINT) AS indeg_sq_sum
        FROM indeg
        GROUP BY label
        ORDER BY label
    """,
    tags=("E36", "E131"),
)
def embedding_hubness_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HUBNESS AUDIT of the embedding space: build the within-label
    {HUB_K}-NN cosine graph and summarize the IN-degree distribution —
    high-dimensional spaces concentrate neighbors onto hub points
    (in-degree ≫ k) while anti-hubs (in-degree 0) are nobody's
    neighbor; both distort retrieval and kNN-based dedup, and the
    Σin² term (with fixed Σin = k·n) quantifies the skew.  The
    pre-flight check before trusting the ANN family's neighborhoods.

    Determinism: cosine reuses the exact left-fold order of the
    LSH/kNN oracles, ROUNDED AT 12 DP BEFORE RANKING (the near-tie
    discipline), dst as tie-break; every output is an exact BIGINT.
    Vector norms fold ONCE per vector upstream (same expression, same
    IEEE value as the per-pair fold — division order unchanged).

    Scale (r3 verdict #2 — no full-corpus broadcast; r9 rework of the
    scoring hot path): exact labels route through the salted
    (src-cell, dst-cell) grid of `_knn_edges_salted`, where an
    Arrow-batched `applyInPandas` kernel scores each bounded cell and
    emits ONLY per-src top-k edges — the r8 plan scored every
    candidate pair through F.aggregate/zip_with HOF lambdas, and that
    expression-interpreted 64-dim fold over the full candidate
    rectangle was 2.4 s of the 3.8 s total (an unrolled codegen sum
    measured worse, 6.9 s — see _knn_edge_kernel).  The kernel's
    dimension-loop accumulation is IEEE-identical to the oracle's
    left-fold, so the 12-dp near-tie discipline is preserved
    bit-for-bit.  The thresholded `embedding_cosine_pairs` shared
    intermediate was evaluated and REJECTED as the source here: kNN
    is unthresholded by definition (a src with < k neighbors above
    0.35 keeps sub-threshold edges), so the truncated pair graph
    cannot reproduce the exact graph.  A label beyond
    cap * EMB_NSUB_MAX escalates to IVF-cell routing — each src
    probes the union of its HUB_NPROBE nearest coarse cells
    (_knn_celled_candidates, r5 verdict #4), JVM-scored, and its
    edges merge into the same global ranking — the split is a scalar
    branch decision plus broadcast semi/anti joins, and no test-scale
    corpus triggers it.  The cross-cell merge window sees ≤ nsub·k
    rows per src (k rows in the nsub == 1 common case), not the
    candidate rectangle; no final global sort (the 10-row orderBy
    cost ~0.6 s in range-partitioner sampling; the compare layer
    sorts rows)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("e"),
    ).select("vec_id", "label", "e", norm(F.col("e")).alias("nrm"))
    sizes = v.groupBy("label").agg(
        F.ceil(F.count(F.lit(1)) / EMB_BLOCK_CAP).cast("int").alias("nsub")
    )
    hot_dir = sizes.where(F.col("nsub") > EMB_NSUB_MAX).select("label")
    v_exact = v
    hot_edges = None
    if hot_dir.count() > 0:
        v_exact = v.join(F.broadcast(hot_dir), "label", "left_anti")
        hot_edges = _knn_celled_candidates(
            v.join(F.broadcast(hot_dir), "label", "left_semi"),
            cap=EMB_BLOCK_CAP,
            nprobe=HUB_NPROBE,
        ).select(
            "src",
            "dst",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")),
                12,
            ).alias("cos"),
        )
    edges = _knn_edges_salted(
        v_exact.select("label", "vec_id", "e"), k=HUB_K
    )
    if hot_edges is not None:
        edges = edges.unionByName(hot_edges)
    wk = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    knn = edges.withColumn("rn", F.row_number().over(wk)).where(
        F.col("rn") <= HUB_K
    )
    indeg = v.join(
        knn.groupBy("dst").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")),
        v.vec_id == F.col("dst"),
        "left",
    ).select(
        "label", F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("in_degree")
    )
    return indeg.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.max("in_degree").cast("bigint").alias("max_in_degree"),
        F.sum(F.when(F.col("in_degree") >= 2 * HUB_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hubs"),
        F.sum(F.when(F.col("in_degree") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_antihubs"),
        F.sum(F.col("in_degree") * F.col("in_degree"))
        .cast("bigint")
        .alias("indeg_sq_sum"),
    )


MMR_POOL_N = 40   # candidate pool: top-N by relevance to the probe
MMR_K = 8         # diversified selection size (lambda = 1/2)


@query(
    "sim_search_mmr_diverse_topk",
    oracle=f"""
        WITH RECURSIVE
        q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        rel AS (
            SELECT e.vec_id,
                   CAST(FLOOR(
                     (SELECT SUM(a*b) FROM (SELECT UNNEST(q.embedding)::DOUBLE AS a,
                                                   UNNEST(e.embedding)::DOUBLE AS b))
                     / (SQRT((SELECT SUM(a*a) FROM (SELECT UNNEST(q.embedding)::DOUBLE AS a)))
                      * SQRT((SELECT SUM(b*b) FROM (SELECT UNNEST(e.embedding)::DOUBLE AS b))))
                     * 1000000) AS BIGINT) AS rel_u
            FROM embeddings e, q WHERE e.vec_id <> 0
        ),
        pool AS (SELECT * FROM rel ORDER BY rel_u DESC, vec_id LIMIT {MMR_POOL_N}),
        pv AS (SELECT p.vec_id, p.rel_u, e.embedding
               FROM pool p JOIN embeddings e USING (vec_id)),
        pairs AS (
            SELECT x.vec_id AS id_a, y.vec_id AS id_b,
                   CAST(FLOOR(
                     (SELECT SUM(a*b) FROM (SELECT UNNEST(x.embedding)::DOUBLE AS a,
                                                   UNNEST(y.embedding)::DOUBLE AS b))
                     / (SQRT((SELECT SUM(a*a) FROM (SELECT UNNEST(x.embedding)::DOUBLE AS a)))
                      * SQRT((SELECT SUM(b*b) FROM (SELECT UNNEST(y.embedding)::DOUBLE AS b))))
                     * 1000000) AS BIGINT) AS sim_u
            FROM pv x JOIN pv y ON x.vec_id <> y.vec_id
        ),
        sel AS (
            SELECT CAST(1 AS BIGINT) AS rnk, vec_id, rel_u, rel_u AS score2_u,
                   [vec_id] AS ids
            FROM (SELECT * FROM pool ORDER BY rel_u DESC, vec_id LIMIT 1)
            UNION ALL
            SELECT s.rnk + 1, nxt.vec_id, nxt.rel_u, nxt.score2_u,
                   list_append(s.ids, nxt.vec_id)
            FROM sel s, LATERAL (
                SELECT p.vec_id, p.rel_u,
                       p.rel_u - COALESCE((SELECT MAX(pr.sim_u) FROM pairs pr
                                           WHERE pr.id_a = p.vec_id
                                             AND list_contains(s.ids, pr.id_b)), 0)
                           AS score2_u
                FROM pool p
                WHERE NOT list_contains(s.ids, p.vec_id)
                ORDER BY score2_u DESC, p.vec_id
                LIMIT 1
            ) nxt
            WHERE s.rnk < {MMR_K}
        )
        SELECT rnk, vec_id,
               ROUND(CAST(rel_u AS DOUBLE) / 1000000, 6) AS relevance,
               score2_u AS mmr2_u
        FROM sel ORDER BY rnk
    """,
    tags=("E36", "E18"),
)
def sim_search_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE diversified top-k — the data-curation
    selection rule (pick examples RELEVANT to a probe but DIVERSE from
    each other; lambda = 1/2): greedily maximize
    2*score = rel(d) - max_{s in S} sim(d, s) over the candidate pool.

    Two-phase, scale-split design: the DISTRIBUTED phase is the
    existing brute-force machinery (broadcast probe x streamed corpus
    -> top-{MMR_POOL_N} pool via WindowGroupLimit, then a pool x pool
    self-join for pairwise sims — pool is a CONSTANT, so the pair
    stage is O(1) regardless of corpus size); the greedy phase runs
    driver-side over that aggregate-sized state ({MMR_POOL_N} +
    {MMR_POOL_N}^2 rows — same class as the fixpoint scalars the
    graph family collects), because a k-step sequential argmax over 40
    rows is driver work, not cluster work.  All scores FLOOR-quantize
    to 1e-6 BIGINTs BEFORE the greedy, so both engines select
    identical ids (the DuckDB twin replays the same greedy as a
    recursive CTE with a correlated LATERAL argmax).  At 100 TB the
    relevance scan is one pass; nothing else grows."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.where(F.col("vec_id") == 0).select(
        as_double(F.col("embedding")).alias("q_emb")
    )
    corpus = emb.where(F.col("vec_id") != 0).select(
        "vec_id", as_double(F.col("embedding")).alias("c_emb")
    )
    rel = F.broadcast(probe).crossJoin(corpus).select(
        "vec_id",
        F.floor(cosine(F.col("q_emb"), F.col("c_emb")) * 1_000_000)
        .cast("bigint")
        .alias("rel_u"),
        "c_emb",
    )
    w = Window.orderBy(F.col("rel_u").desc(), "vec_id")
    pool = rel.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= MMR_POOL_N
    )
    x = pool.select(F.col("vec_id").alias("id_a"), F.col("c_emb").alias("ea"))
    y = pool.select(F.col("vec_id").alias("id_b"), F.col("c_emb").alias("eb"))
    pair_rows = (
        x.join(F.broadcast(y), F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.floor(cosine(F.col("ea"), F.col("eb")) * 1_000_000)
            .cast("bigint")
            .alias("sim_u"),
        )
        .collect()
    )
    pool_rows = pool.select("vec_id", "rel_u").collect()
    sims = {(r.id_a, r.id_b): r.sim_u for r in pair_rows}
    rels = {r.vec_id: r.rel_u for r in pool_rows}
    selected: list[tuple[int, int, int, int]] = []   # (rnk, id, rel_u, score2_u)
    chosen: list[int] = []
    while len(selected) < MMR_K and len(chosen) < len(rels):
        best = None
        for vid, rel_u in rels.items():
            if vid in chosen:
                continue
            max_sim = max((sims[(vid, s)] for s in chosen), default=0)
            score2 = rel_u - (max_sim if chosen else 0)
            key = (-score2, vid)
            if best is None or key < best[0]:
                best = (key, vid, rel_u, score2)
        selected.append((len(selected) + 1, best[1], best[2], best[3]))
        chosen.append(best[1])
    return spark.createDataFrame(
        [
            (rnk, vid, round(rel_u / 1e6, 6), score2)
            for rnk, vid, rel_u, score2 in selected
        ],
        "rnk bigint, vec_id bigint, relevance double, mmr2_u bigint",
    )


# --- E383: k-center greedy (farthest-point) diverse selection ------------

KCENTER_K = 4  # selection rounds after the hash-seeded start


def _kcenter_oracle() -> str:
    from potpot_spark.functions.numeric import phash60_expr

    steps = []
    for r in range(2, KCENTER_K + 1):
        steps.append(f"""
        md{r} AS (
            SELECT p.vec_id,
                   MIN((SELECT SUM((p.q[i] - s.q[i]) * (p.q[i] - s.q[i]))
                        FROM (SELECT unnest(range(1, len(p.q) + 1)) AS i)))
                       AS dmin
            FROM pts p, sel{r - 1} s
            GROUP BY p.vec_id
        ),
        pick{r} AS (
            SELECT vec_id, CAST(dmin AS BIGINT) AS dist_q
            FROM md{r} ORDER BY dmin DESC, vec_id LIMIT 1
        ),
        sel{r} AS (
            SELECT * FROM sel{r - 1}
            UNION ALL
            SELECT {r} AS rnk, p.vec_id, p.q
            FROM pts p JOIN pick{r} k ON k.vec_id = p.vec_id
        )""")
    picks = "\n            UNION ALL ".join(
        [
            "SELECT 1 AS rnk, vec_id, CAST(0 AS BIGINT) AS dist_q FROM sel1",
        ]
        + [
            f"SELECT {r} AS rnk, vec_id, dist_q FROM pick{r}"
            for r in range(2, KCENTER_K + 1)
        ]
    )
    return f"""
        WITH pts AS (
            SELECT vec_id,
                   [CAST(ROUND(CAST(v AS DOUBLE) * 1048576) AS BIGINT)
                    for v in embedding] AS q
            FROM embeddings
        ),
        sel1 AS (
            SELECT 1 AS rnk, vec_id, q FROM pts
            ORDER BY {phash60_expr("CAST(vec_id AS VARCHAR)")}, vec_id
            LIMIT 1
        ),
        {",".join(steps)}
        SELECT rnk, vec_id, dist_q
        FROM ({picks})
        ORDER BY rnk
    """


@query("sim_search_kcenter_greedy", oracle=_kcenter_oracle(), tags=("E383",))
def sim_search_kcenter_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center greedy (farthest-point / Gonzalez) diverse selection
    over the embedding table: start from the hash-seeded point, then
    {KCENTER_K}−1 times pick the point FARTHEST from everything chosen
    so far (max-min distance, (dist DESC, vec_id) tie-break).  The
    2-approximation to k-center — the coreset/diverse-subset primitive
    behind "pick maximally different examples" curation, active-
    learning batches, and prototype selection; the geometric opposite
    of MMR's relevance-diversity blend (sim_search_mmr_diverse_topk).

    Exact: coordinates quantized once to 2^20 BIGINTs (same recipe as
    ml_kmeans_fixed_point), distances are integer sums of squares, so
    every argmax — and therefore the exact selected id sequence —
    reproduces in DuckDB.

    Scale shape: each round is one broadcast of the (tiny) selected
    set against the point table with a min-over-selected distance and
    a TakeOrdered argmax — k scans, no pairwise blowup; min-distances
    are monotone so a 100 TB run caches the running min per point
    (one column, updated by the newest seed only)."""
    from potpot_spark.functions.numeric import phash60

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * 1048576).cast("bigint"),
        ).alias("q"),
    )
    # r11 opt: every greedy round (and the seed pick, and each sel
    # re-derivation) rescanned the parquet + re-ran the quantization
    # transform; the quantized point table is read 2k+1 times per call,
    # so materialize it once (the docstring's 100 TB note — cache the
    # per-point state — applied at fixture scale).
    pts = pts.localCheckpoint(eager=True)
    seed = (
        pts.orderBy(phash60(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .select(F.lit(1).alias("rnk"), "vec_id", "q")
    )
    sel_rows = [(1, seed.first()["vec_id"], 0)]
    sel = pts.join(
        F.broadcast(
            pts.sparkSession.createDataFrame(
                [(sel_rows[0][1],)], "vec_id BIGINT"
            )
        ),
        "vec_id",
    ).select("vec_id", "q")
    for r in range(2, KCENTER_K + 1):
        dist = F.aggregate(
            F.zip_with(
                F.col("q"), F.col("sq"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        md = (
            pts.crossJoin(
                F.broadcast(sel.select(F.col("q").alias("sq")))
            )
            .select("vec_id", dist.alias("d"))
            .groupBy("vec_id")
            .agg(F.min("d").alias("dmin"))
        )
        pick = md.orderBy(F.desc("dmin"), "vec_id").first()
        sel_rows.append((r, pick["vec_id"], pick["dmin"]))
        sel = pts.join(
            F.broadcast(
                pts.sparkSession.createDataFrame(
                    [(v,) for _, v, _ in sel_rows], "vec_id BIGINT"
                )
            ),
            "vec_id",
        ).select("vec_id", "q")
    return pts.sparkSession.createDataFrame(
        sel_rows, "rnk INT, vec_id BIGINT, dist_q BIGINT"
    ).orderBy("rnk")


# --- E385: retrieval recall@k evaluation ---------------------------------

RETR_QUERIES = 20
RETR_K = 10
RETR_SCALE = 1 << 20


@query(
    "sim_search_retrieval_recall_eval",
    oracle=f"""
        WITH pts AS (
            SELECT vec_id, label,
                   [CAST(ROUND(CAST(v AS DOUBLE) * {RETR_SCALE}) AS BIGINT)
                    for v in embedding] AS q
            FROM embeddings
        ),
        queries AS (
            SELECT vec_id AS qid, label AS qlabel, q AS qv FROM pts
            ORDER BY CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)),
                                             1, 15)) AS BIGINT), vec_id
            LIMIT {RETR_QUERIES}
        ),
        scored AS (
            SELECT qu.qid, qu.qlabel, p.vec_id, p.label,
                   (SELECT SUM(qu.qv[i] * p.q[i])
                    FROM (SELECT unnest(range(1, len(p.q) + 1)) AS i)) AS dot
            FROM queries qu JOIN pts p ON p.vec_id <> qu.qid
        ),
        topk AS (
            SELECT qid, qlabel, vec_id, label, dot FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY qid ORDER BY dot DESC, vec_id) AS rn
                FROM scored
            ) WHERE rn <= {RETR_K}
        )
        SELECT qlabel AS label,
               CAST(COUNT(DISTINCT qid) AS BIGINT) AS n_queries,
               CAST(SUM(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_same_label,
               ROUND(CAST(SUM(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
                          AS DOUBLE)
                     / ({RETR_K} * COUNT(DISTINCT qid)), 6) AS precision_at_k
        FROM topk
        GROUP BY qlabel
        ORDER BY qlabel
    """,
    tags=("E385",),
)
def sim_search_retrieval_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation harness: {RETR_QUERIES} hash-selected query
    vectors retrieve their top-{RETR_K} neighbors by dot product over
    the full table (self excluded), and label agreement scores the
    retriever — precision@k with same-label as the relevance proxy,
    reported per query label.  This is the eval loop every embedding-
    model change reruns; pinning it exactly means a metric change is a
    MODEL change, never engine noise.

    Exact: coordinates quantized once to 2^20 BIGINTs, dot products
    are integer sums (|q|·|v|·d ≤ 2^47), ranking ties break
    (dot DESC, vec_id) — the top-k sets, not just the metric,
    reproduce bit-for-bit in DuckDB.

    Scale shape: the query set broadcasts (fixed size) against one
    scan of the vector table; per-query ranking rides WindowGroupLimit
    (top-k per group, no global sort).  At 100 TB the brute-force scan
    swaps for the IVF probe path (sim_search_ivf) and THIS op is the
    recall gate that certifies the swap."""
    from potpot_spark.functions.numeric import phash60

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * RETR_SCALE).cast("bigint"),
        ).alias("q"),
    )
    queries = (
        pts.orderBy(phash60(F.col("vec_id").cast("string")), "vec_id")
        .limit(RETR_QUERIES)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlabel"),
            F.col("q").alias("qv"),
        )
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("q"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = (
        pts.crossJoin(F.broadcast(queries))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "qlabel", "vec_id", "label", dot.alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), "vec_id")
    topk = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= RETR_K
    )
    same = F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0)
    return (
        topk.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.countDistinct("qid").cast("bigint").alias("n_queries"),
            F.sum(same).cast("bigint").alias("n_same_label"),
            F.round(
                F.sum(same).cast("double")
                / (RETR_K * F.countDistinct("qid")),
                6,
            ).alias("precision_at_k"),
        )
        .orderBy("label")
    )


ANISO_FP = 10**9  # fixed-point scale for normalized components


@query(
    "embedding_anisotropy_mean_cosine",
    oracle=f"""
        WITH vecs AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        quant AS (
            SELECT vec_id,
                   list_transform(
                       v, x -> CAST(FLOOR(x / sqrt(list_sum(
                           list_transform(v, y -> y * y)))
                           * CAST({ANISO_FP} AS DOUBLE)) AS BIGINT)) AS q
            FROM vecs
        ),
        dims AS (
            SELECT g.k AS dim, CAST(SUM(q[g.k]) AS BIGINT) AS s_d
            FROM quant,
                 LATERAL (SELECT unnest(generate_series(1, len(q))) AS k) g
            GROUP BY g.k
        ),
        selfm AS (
            SELECT q.vec_id,
                   SUM(CAST(q.q[g.k] AS HUGEINT)
                       * CAST(q.q[g.k] AS HUGEINT)) AS m
            FROM quant q,
                 LATERAL (SELECT unnest(generate_series(1, len(q.q))) AS k) g
            GROUP BY q.vec_id
        ),
        tot AS (
            SELECT (SELECT SUM(CAST(s_d AS HUGEINT) * CAST(s_d AS HUGEINT))
                    FROM dims) AS s_norm2,
                   (SELECT SUM(m) FROM selfm) AS self_mass,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM quant) AS n
        )
        SELECT n,
               ROUND((CAST(s_norm2 AS DOUBLE) - CAST(self_mass AS DOUBLE))
                     / (CAST({ANISO_FP} AS DOUBLE)
                        * CAST({ANISO_FP} AS DOUBLE))
                     / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 9)
                   AS mean_pairwise_cosine
        FROM tot
    """,
    tags=("E430",),
)
def embedding_anisotropy_mean_cosine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EMBEDDING ANISOTROPY: the mean pairwise cosine over ALL vector
    pairs, computed WITHOUT any pair enumeration via the sum-vector
    identity sum_{{i != j}} v_i . v_j = ||S||^2 - sum_i ||v_i||^2 with
    S = sum v_i — Ethayarajh's diagnostic for embedding-space
    collapse (isotropic spaces score near 0; a high mean cosine means
    every document looks like every other and retrieval/dedup
    thresholds silently degrade).  The audit to run BEFORE trusting
    any cosine threshold in the dedup/ANN family.

    Exactness: normalized components are FLOOR-quantized to 1e-9
    fixed point, so the per-dimension sums, ||S||^2 and the self-mass
    are all exact integers (DECIMAL38 squares), and the final mean is
    one double expression — bit-identical despite being a sum over
    ~n^2/2 implicit pairs.  Scale: O(n*d) one pass + a d-row
    aggregate; the identity is what makes the all-pairs statistic
    computable at 100 TB at all (a pair join would be 10^18 rows)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    nrm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda y: y * y), F.lit(0.0), lambda a, x: a + x
        )
    )
    quant = emb.select(
        "vec_id",
        F.transform(
            "v", lambda x: F.floor(x / nrm * float(ANISO_FP)).cast("bigint")
        ).alias("q"),
    )
    dims = (
        quant.select(F.posexplode("q").alias("dim0", "qv"))
        .groupBy("dim0")
        .agg(F.sum("qv").cast("bigint").alias("s_d"))
    )
    s19 = F.col("s_d").cast("decimal(38,0)")
    s_norm2 = dims.agg(F.sum(s19 * s19).alias("s_norm2"))
    self_mass = quant.select(
        F.aggregate(
            F.transform(
                "q",
                lambda x: x.cast("decimal(19,0)") * x.cast("decimal(19,0)"),
            ),
            F.lit(0).cast("decimal(38,0)"),
            lambda a, x: a + x.cast("decimal(38,0)"),
        ).alias("m")
    ).agg(F.sum("m").cast("decimal(38,0)").alias("self_mass"))
    n_df = quant.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    nd = F.col("n").cast("double")
    return (
        n_df.crossJoin(s_norm2)
        .crossJoin(self_mass)
        .select(
            "n",
            F.round(
                (F.col("s_norm2").cast("double") - F.col("self_mass").cast("double"))
                / (float(ANISO_FP) * float(ANISO_FP))
                / (nd * (nd - 1.0)),
                9,
            ).alias("mean_pairwise_cosine"),
        )
    )


BHAM_QUERY_MOD = 100  # probe set: every 100th vec_id
BHAM_TOPK = 5

_BHAM_WORD = (
    "CAST(aggregate(transform(slice(embedding, {off}, 32), (x, i) -> "
    "IF(x > CAST(0 AS FLOAT), shiftleft(CAST(1 AS BIGINT), i), "
    "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (a, b) -> a + b) AS BIGINT)"
)


@query(
    "embedding_binary_hamming_search",
    oracle=f"""
        WITH words AS (
            SELECT vec_id,
                   CAST(list_sum(list_transform(embedding[1:32],
                        (x, i) -> CASE WHEN x > 0
                                  THEN CAST(1 AS BIGINT) << (i - 1)
                                  ELSE CAST(0 AS BIGINT) END))
                        AS BIGINT) AS lo,
                   CAST(list_sum(list_transform(embedding[33:64],
                        (x, i) -> CASE WHEN x > 0
                                  THEN CAST(1 AS BIGINT) << (i - 1)
                                  ELSE CAST(0 AS BIGINT) END))
                        AS BIGINT) AS hi
            FROM embeddings
        ),
        q AS (SELECT * FROM words WHERE vec_id % {BHAM_QUERY_MOD} = 0),
        d AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(bit_count(xor(q.lo, c.lo))
                        + bit_count(xor(q.hi, c.hi)) AS INT) AS hamming
            FROM q JOIN words c ON c.vec_id <> q.vec_id
        ),
        r AS (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY hamming, neighbor_id
            ) AS rnk
            FROM d
        )
        SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, hamming
        FROM r WHERE rnk <= {BHAM_TOPK}
        ORDER BY query_id, rank
    """,
    tags=("E442",),
)
def embedding_binary_hamming_search(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SIGN-BINARIZED HAMMING SEARCH: pack each 64-dim embedding into
    two 32-bit sign words (bit = component > 0) and rank neighbors by
    Hamming distance ``bit_count(xor)`` — the classic 32×-compression
    retrieval fallback (SimHash's dense-vector sibling): sign bits
    preserve angular order in expectation (Goemans-Williamson:
    P[bit differs] = angle/π), so Hamming rank ≈ cosine rank at 1/32
    the bytes and pure integer ALU cost.

    Exact and portable: float32 sign tests on identical parquet values
    decide identical bits on both engines; packing is an integer
    shift-sum (bits 0..31 per word — never bit 63, whose 2^63 shift
    wraps signed BIGINT); distances are exact ints; top-{BHAM_TOPK}
    per probe breaks ties on neighbor id.  Plan: the tiny probe set
    broadcasts across the corpus scan (BroadcastNestedLoopJoin by
    construction, bounded at |probes| x |corpus| — NOT an all-pairs
    join), WindowGroupLimit bounds ranking state to k rows per probe.
    100 TB: binary codes turn a 25 TB float32 corpus into 0.8 TB of
    codes — scan-speed brute force per probe batch; for full kNN (all
    vecs as queries) escalate to the banded-Hamming LSH dedup recipe
    (dedup_image_ahash_stub) or IVF cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    words = emb.select(
        "vec_id",
        F.expr(_BHAM_WORD.format(off=1)).alias("lo"),
        F.expr(_BHAM_WORD.format(off=33)).alias("hi"),
    )
    q = words.where(F.col("vec_id") % BHAM_QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("lo").alias("qlo"),
        F.col("hi").alias("qhi"),
    )
    d = (
        words.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                F.bit_count(F.expr("qlo ^ lo")) + F.bit_count(F.expr("qhi ^ hi"))
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    win = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    return (
        d.withColumn("rank", F.row_number().over(win).cast("int"))
        .where(F.col("rank") <= BHAM_TOPK)
        .select("query_id", "rank", "neighbor_id", "hamming")
        .orderBy("query_id", "rank")
    )


TWONN_FP = 10**9   # fixed-point grain for ln(mu) terms


@query(
    "embedding_intrinsic_dimension_twonn",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        scored AS (
            SELECT a.label, a.vec_id AS src, b.vec_id AS dst,
                   ROUND(
                       list_reduce(list_prepend(CAST(0 AS DOUBLE),
                           list_transform(range(1, len(a.e) + 1),
                                          j -> a.e[j] * b.e[j])),
                           (acc, x) -> acc + x)
                       / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                              list_transform(a.e, x -> x * x)), (acc, x) -> acc + x))
                          * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
                              list_transform(b.e, x -> x * x)), (acc, x) -> acc + x))),
                       12) AS cos
            FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id
        ),
        nn AS (
            SELECT label, src,
                   MAX(CASE WHEN rn = 1 THEN cos END) AS c1,
                   MAX(CASE WHEN rn = 2 THEN cos END) AS c2
            FROM (
                SELECT label, src, cos,
                       row_number() OVER (PARTITION BY src
                                          ORDER BY cos DESC, dst) AS rn
                FROM scored
            ) WHERE rn <= 2
            GROUP BY label, src
            HAVING MAX(CASE WHEN rn = 2 THEN cos END) IS NOT NULL
               AND MAX(CASE WHEN rn = 1 THEN cos END) < 1.0
        ),
        terms AS (
            SELECT label,
                   CAST(FLOOR(ln((1.0 - c2) / (1.0 - c1)) * {TWONN_FP})
                        AS BIGINT) AS lnmu_fp
            FROM nn
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(lnmu_fp) AS BIGINT) AS sum_lnmu_fp,
               ROUND(CAST(COUNT(*) AS DOUBLE) * {TWONN_FP}
                     / SUM(lnmu_fp), 9) AS id_twonn
        FROM terms
        GROUP BY label
    """,
    tags=("E501",),
)
def embedding_intrinsic_dimension_twonn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TwoNN INTRINSIC DIMENSION (Facco et al. 2017) per label, on
    cosine distance: each point contributes μ = d₂/d₁ = (1−cos₂)/
    (1−cos₁) from its two nearest within-label neighbors, and the MLE
    is ID = n/Σln μ.  THE capacity diagnostic for the ANN family: a
    64-dim embedding whose data lives on a ~9-dim manifold retrieves
    fine with small IVF nprobe; ID ≈ ambient dimension is the
    hubness-prone regime the registered hubness audit flags — the two
    ops together decide the index configuration before anything is
    built.

    Exact: neighbor cosines come from the SAME Arrow left-fold kernel
    as the hubness graph (_knn_edge_kernel with k = 2 — bit-identical
    to the oracle's list_reduce at the 12-dp grain), μ is a ratio of
    the two ROUNDED cosines (identical operands both engines), each
    ln μ is FLOOR-quantized at 1e9 into exact BIGINT sums, ID is one
    identical double expression.  Duplicate-vector sources (cos₁ = 1,
    μ undefined) are excluded on both sides.  Plan: the salted-cell
    kNN kernel (per-src top-2 only leaves each cell), a per-src merge
    window over ≤ 2·nsub rows, one per-label aggregate.  100 TB: the
    bounded-cell routing of the dedup/hubness family — no pair
    rectangle ever materializes."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("e")
    )
    edges = _knn_edges_salted(v, k=2)
    lab = v.select(F.col("vec_id").alias("src"), "label")
    wk = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst"))
    nn = (
        edges.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= 2)
        .groupBy("src")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("cos"))).alias("c1"),
            F.max(F.when(F.col("rn") == 2, F.col("cos"))).alias("c2"),
        )
        .where(F.col("c2").isNotNull() & (F.col("c1") < 1.0))
        .join(lab, "src")
    )
    terms = nn.select(
        "label",
        F.floor(
            F.log((1.0 - F.col("c2")) / (1.0 - F.col("c1"))) * TWONN_FP
        )
        .cast("bigint")
        .alias("lnmu_fp"),
    )
    return terms.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("lnmu_fp").cast("bigint").alias("sum_lnmu_fp"),
        F.round(
            F.count(F.lit(1)).cast("double") * TWONN_FP / F.sum("lnmu_fp"), 9
        ).alias("id_twonn"),
    )


def _cluster_grid_oracle(dim: int = 64) -> str:
    """(bucket, label) contingency CTE for the clustering-agreement
    op: table-0 sign-LSH buckets (the same literal hyperplanes and
    left folds as the registered LSH search) as the 'clustering',
    the label column as ground truth."""
    plane_rows = ",\n                ".join(
        f"({p}, [{', '.join(repr(c) for c in _hyperplane(dim, p))}])"
        for p in range(N_PLANES)
    )
    prod = f"list_transform(range({dim}), j -> ve.e[j+1] * plv.coefs[j+1])"
    return f"""
        ve AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        plv AS (
            SELECT * FROM (VALUES
                {plane_rows}
            ) AS t(p, coefs)
        ),
        bits AS (
            SELECT ve.vec_id, ve.label, plv.p,
                   CASE WHEN {_fold_sql(prod)} > 0
                        THEN CAST(power(2, plv.p) AS BIGINT) ELSE 0 END AS bit
            FROM ve, plv
        ),
        assign AS (
            SELECT vec_id, label, CAST(SUM(bit) AS BIGINT) AS cell
            FROM bits GROUP BY vec_id, label
        ),
        grid AS (
            SELECT cell, label, CAST(COUNT(*) AS BIGINT) AS n
            FROM assign GROUP BY cell, label
        )
    """


@query(
    "embedding_cluster_purity_rand",
    oracle=f"""
        WITH {_cluster_grid_oracle()},
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM grid),
        pur AS (
            SELECT CAST(SUM(mx) AS BIGINT) AS pure_n,
                   CAST(COUNT(*) AS BIGINT) AS n_cells
            FROM (SELECT cell, MAX(n) AS mx FROM grid GROUP BY cell)
        ),
        pairs AS (
            SELECT CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS a_pairs FROM grid
        ),
        rowp AS (
            SELECT CAST(SUM(nc * (nc - 1) // 2) AS BIGINT) AS rp
            FROM (SELECT cell, SUM(n) AS nc FROM grid GROUP BY cell)
        ),
        colp AS (
            SELECT CAST(SUM(nl * (nl - 1) // 2) AS BIGINT) AS cp
            FROM (SELECT label, SUM(n) AS nl FROM grid GROUP BY label)
        )
        SELECT (SELECT nn FROM tot) AS n_points,
               (SELECT n_cells FROM pur) AS n_cells,
               CAST((SELECT pure_n FROM pur) * 1000000
                    // (SELECT nn FROM tot) AS BIGINT) AS purity_ppm,
               CAST(((SELECT a_pairs FROM pairs)
                     + ((SELECT nn FROM tot) * ((SELECT nn FROM tot) - 1) // 2
                        - (SELECT rp FROM rowp) - (SELECT cp FROM colp)
                        + (SELECT a_pairs FROM pairs))) * 1000000
                    // ((SELECT nn FROM tot) * ((SELECT nn FROM tot) - 1) // 2)
                    AS BIGINT) AS rand_index_ppm,
               CAST(((SELECT a_pairs FROM pairs)
                     * ((SELECT nn FROM tot) * ((SELECT nn FROM tot) - 1) // 2)
                     - CAST((SELECT rp FROM rowp) AS HUGEINT)
                       * (SELECT cp FROM colp)) * 1000000
                    // ((((SELECT rp FROM rowp) + (SELECT cp FROM colp))
                        * ((SELECT nn FROM tot) * ((SELECT nn FROM tot) - 1) // 2)
                        // 2)
                       - CAST((SELECT rp FROM rowp) AS HUGEINT)
                         * (SELECT cp FROM colp))
                    AS BIGINT) AS adjusted_rand_ppm
        FROM tot
    """,
    tags=("E506",),
)
def embedding_cluster_purity_rand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CLUSTERING-AGREEMENT panel — purity, Rand index, Adjusted Rand
    — between the sign-LSH table-0 cell assignment (the SAME literal
    hyperplanes and left folds as the registered LSH search) and the
    label ground truth.  THE external-validation readout for any
    quantizer: purity answers "how label-pure are the buckets the ANN
    path probes?", ARI corrects Rand for chance (a 64-cell hash of
    random data scores ≈ 0) — together they quantify how much of the
    LSH recall comes from true structure vs bucket luck, the
    diagnostic the recall contracts alone can't give.

    Exact: sign bits are bit-equal folds (the LSH discipline), the
    (cell, label) grid is exact integers, and purity/RI/ARI are
    integer pair-count algebra (Σ C(n,2) terms, HUGEINT/decimal38
    cross products) with one ppm `div` each.  Plan: one projection
    pass (24→6 plane folds), one grid rollup, constant-size algebra.
    100 TB: the projection scan is the only corpus pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    dim = 64
    planes = F.array(
        *[
            F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
            for p in range(N_PLANES)
        ]
    )
    projs = F.transform(
        planes,
        lambda pl: F.aggregate(
            F.zip_with(as_double(F.col("embedding")), pl, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    cell = sum(
        F.when(F.element_at(F.col("_projs"), p + 1) > 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
        for p in range(N_PLANES)
    )
    assign = emb.select("label", projs.alias("_projs")).select(
        "label", cell.cast("bigint").alias("cell")
    )
    grid = assign.groupBy("cell", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = grid.agg(F.sum("n").cast("bigint").alias("nn"))
    pur = (
        grid.groupBy("cell")
        .agg(F.max("n").alias("mx"))
        .agg(
            F.sum("mx").cast("bigint").alias("pure_n"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        )
    )
    a_pairs = grid.agg(
        F.sum(F.expr("n * (n - 1) div 2")).cast("bigint").alias("a_pairs")
    )
    rowp = (
        grid.groupBy("cell")
        .agg(F.sum("n").alias("nc"))
        .agg(F.sum(F.expr("nc * (nc - 1) div 2")).cast("bigint").alias("rp"))
    )
    colp = (
        grid.groupBy("label")
        .agg(F.sum("n").alias("nl"))
        .agg(F.sum(F.expr("nl * (nl - 1) div 2")).cast("bigint").alias("cp"))
    )
    j = (
        tot.crossJoin(F.broadcast(pur))
        .crossJoin(F.broadcast(a_pairs))
        .crossJoin(F.broadcast(rowp))
        .crossJoin(F.broadcast(colp))
    )
    return j.select(
        F.col("nn").alias("n_points"),
        "n_cells",
        F.expr("CAST(pure_n * 1000000 div nn AS BIGINT)").alias("purity_ppm"),
        F.expr(
            "CAST((a_pairs + (nn * (nn - 1) div 2 - rp - cp + a_pairs))"
            " * 1000000 div (nn * (nn - 1) div 2) AS BIGINT)"
        ).alias("rand_index_ppm"),
        F.expr(
            "CAST((a_pairs * (nn * (nn - 1) div 2)"
            " - CAST(rp AS DECIMAL(38,0)) * cp) * 1000000"
            " div (((rp + cp) * (nn * (nn - 1) div 2) div 2)"
            " - CAST(rp AS DECIMAL(38,0)) * cp) AS BIGINT)"
        ).alias("adjusted_rand_ppm"),
    )


PR_Q = 10**6       # coordinate quantization for the Gram pass
PR_M_DOWN = 10**6  # downscale of centered-moment cells before squaring


def emb_gram_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(label, di, dj, m): the per-label CENTERED-GRAM cell table
    over 1e6-quantized embedding coordinates — m = (n·S_ij −
    s_i·s_j) div 1e6 on the upper triangle di ≤ dj — as a SHARED
    MATERIALIZED INTERMEDIATE.  Every trace-identity spectrum op
    (participation ratio's tr(C)/‖C‖_F², CKA's three HSIC blocks)
    consumes this one table: the d(d+1)/2 Gram fan-out is the entire
    corpus-pass cost (~2.2 s each at sf0.1), the downstream block
    aggregates are ≤20,800-row algebra — the hc_seed_reach
    discipline applied to the spectral family.  Built once per
    (session, sf_dir); bench bills it to shared_build_sec."""
    from potpot_spark.materialize import shared_intermediate

    def build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        vals = emb.select(
            "vec_id",
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "i0", "x"
            ),
        ).select(
            "vec_id",
            "label",
            (F.col("i0") + 1).alias("i"),
            F.floor(F.col("x") * PR_Q).cast("bigint").alias("q"),
        )
        marg = vals.groupBy("label", "i").agg(
            F.sum("q").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        d38 = "decimal(38,0)"
        a = vals.select(
            "vec_id", "label", F.col("i").alias("di"), F.col("q").alias("qa")
        )
        b = vals.select(
            "vec_id", F.col("i").alias("dj"), F.col("q").alias("qb")
        )
        gram = (
            a.join(b, "vec_id")
            .where(F.col("di") <= F.col("dj"))
            .groupBy("label", "di", "dj")
            .agg(
                F.sum(F.col("qa").cast(d38) * F.col("qb"))
                .cast(d38)
                .alias("sij")
            )
        )
        ma = marg.select(
            "label", F.col("i").alias("di"), F.col("s").alias("sa"), "n"
        )
        mb = marg.select(
            "label", F.col("i").alias("dj"), F.col("s").alias("sb")
        )
        # marginals are (labels x d)-bounded dim tables — broadcast class
        return (
            gram.join(F.broadcast(ma), ["label", "di"])
            .join(F.broadcast(mb), ["label", "dj"])
            .select(
                "label",
                "di",
                "dj",
                F.expr(
                    f"CAST((n * sij - CAST(sa AS DECIMAL(38,0)) * sb)"
                    f" div {PR_M_DOWN} AS DECIMAL(38,0))"
                ).alias("m"),
            )
        )

    return shared_intermediate(spark, sf_dir, "emb_gram_cells", build)


@query(
    "embedding_participation_ratio",
    oracle=f"""
        WITH vals AS (
            SELECT vec_id, label,
                   CAST(unnest(range(1, 65)) AS INT) AS i,
                   CAST(FLOOR(CAST(embedding[unnest(range(1, 65))] AS DOUBLE)
                              * {PR_Q}) AS BIGINT) AS q
            FROM embeddings
        ),
        marg AS (
            SELECT label, i, CAST(SUM(q) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY label, i
        ),
        gram AS (
            SELECT a.label, a.i AS di, b.i AS dj,
                   SUM(CAST(a.q AS HUGEINT) * b.q) AS sij
            FROM vals a JOIN vals b
              ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.label, a.i, b.i
        ),
        cells AS (
            SELECT g.label, g.di, g.dj,
                   (ma.n * g.sij - CAST(ma.s AS HUGEINT) * mb.s)
                       // {PR_M_DOWN} AS m
            FROM gram g
            JOIN marg ma ON ma.label = g.label AND ma.i = g.di
            JOIN marg mb ON mb.label = g.label AND mb.i = g.dj
        ),
        agg AS (
            SELECT label,
                   CAST(SUM(CASE WHEN di = dj THEN m ELSE 0 END)
                        AS HUGEINT) AS tr_q,
                   SUM(CASE WHEN di = dj THEN CAST(m AS HUGEINT) * m
                            ELSE 2 * CAST(m AS HUGEINT) * m END) AS tr2_q
            FROM cells GROUP BY label
        )
        SELECT label,
               CAST(tr_q AS DOUBLE) AS trace_q,
               CAST(tr_q * tr_q * 1000000 // tr2_q AS BIGINT)
                   AS participation_ratio_x1e6
        FROM agg ORDER BY label
    """,
    tags=("E510",),
)
def embedding_participation_ratio(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTICIPATION RATIO — the eigensolver-free effective dimension
    of each label's embedding cloud: PR = (Σλ)²/Σλ² = tr(C)²/tr(C²),
    computed ENTIRELY from trace identities (tr(C²) = ‖C‖_F², so no
    eigendecomposition, no iteration — unlike the registered PCA
    power-iteration op, this is one closed-form pass).  PR ≈ 64 means
    isotropic use of the space, PR ≈ 3 means the encoder collapsed;
    read next to TwoNN (manifold dimension of the DATA) — PR is the
    LINEAR dimension of the representation; a gap between them is
    nonlinear structure.

    Exact: coordinates FLOOR-quantize at 1e6, the Gram pass S_ij =
    Σq_iq_j and the marginals are exact integers, each centered cell
    n·S_ij − s_i·s_j downscales by one integer `div` (declared
    quantization, identical both engines) before squaring so ‖C‖_F²
    stays inside decimal38, and PR is one integer ppm ratio.  Plan:
    ONE ≤20,800-row aggregate over the emb_gram_cells SHARED
    INTERMEDIATE (the 64-way posexplode + vec_id-local self-join
    Gram pass, built once per session for the whole trace-identity
    family).  100 TB: the shared Gram pass is the corpus pass (at
    production d, matrix-blocked partial Grams via mapInPandas —
    same exact integer algebra)."""
    cells = emb_gram_cells(spark, sf_dir)
    d38 = "decimal(38,0)"
    agg = cells.groupBy("label").agg(
        F.sum(F.when(F.col("di") == F.col("dj"), F.col("m")).otherwise(0))
        .cast(d38)
        .alias("tr_q"),
        F.sum(
            F.when(
                F.col("di") == F.col("dj"), F.col("m") * F.col("m")
            ).otherwise(2 * F.col("m") * F.col("m"))
        )
        .cast(d38)
        .alias("tr2_q"),
    )
    return agg.select(
        "label",
        F.col("tr_q").cast("double").alias("trace_q"),
        F.expr(
            "CAST(tr_q * tr_q * 1000000 div tr2_q AS BIGINT)"
        ).alias("participation_ratio_x1e6"),
    ).orderBy("label")


CKA_Q = 10**6      # coordinate quantization for the cross-Gram pass
CKA_M_DOWN = 10**6 # downscale of centered cells before squaring
CKA_SPLIT = 32     # dims 1..32 = view X, 33..64 = view Y


@query(
    "embedding_cka_halves",
    oracle=f"""
        WITH vals AS (
            SELECT vec_id, label,
                   CAST(unnest(range(1, 65)) AS INT) AS i,
                   CAST(FLOOR(CAST(embedding[unnest(range(1, 65))] AS DOUBLE)
                              * {CKA_Q}) AS BIGINT) AS q
            FROM embeddings
        ),
        marg AS (
            SELECT label, i, CAST(SUM(q) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY label, i
        ),
        gram AS (
            SELECT a.label, a.i AS di, b.i AS dj,
                   SUM(CAST(a.q AS HUGEINT) * b.q) AS sij
            FROM vals a JOIN vals b
              ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.label, a.i, b.i
        ),
        cells AS (
            SELECT g.label, g.di, g.dj,
                   (ma.n * g.sij - CAST(ma.s AS HUGEINT) * mb.s)
                       // {CKA_M_DOWN} AS m
            FROM gram g
            JOIN marg ma ON ma.label = g.label AND ma.i = g.di
            JOIN marg mb ON mb.label = g.label AND mb.i = g.dj
        ),
        hsic AS (
            SELECT label,
                   SUM(CASE WHEN di <= {CKA_SPLIT} AND dj > {CKA_SPLIT}
                            THEN CAST(m AS HUGEINT) * m ELSE 0 END) AS hxy,
                   SUM(CASE WHEN di <= {CKA_SPLIT} AND dj <= {CKA_SPLIT}
                            THEN CASE WHEN di = dj
                                 THEN CAST(m AS HUGEINT) * m
                                 ELSE 2 * CAST(m AS HUGEINT) * m END
                            ELSE 0 END) AS hxx,
                   SUM(CASE WHEN di > {CKA_SPLIT} AND dj > {CKA_SPLIT}
                            THEN CASE WHEN di = dj
                                 THEN CAST(m AS HUGEINT) * m
                                 ELSE 2 * CAST(m AS HUGEINT) * m END
                            ELSE 0 END) AS hyy
            FROM cells GROUP BY label
        )
        SELECT label,
               CAST(((hxy * 1000000 // hxx) * hxy) // hyy AS BIGINT)
                   AS cka_sq_x1e6
        FROM hsic ORDER BY label
    """,
    tags=("E517",),
)
def embedding_cka_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR CKA (centered kernel alignment) between the first and
    last 32 dimensions of each label's embeddings: CKA(X,Y) =
    ‖Xc᙭Yc‖_F² / (‖Xc᙭Xc‖_F·‖Yc᙭Yc‖_F) — THE representation-
    similarity measure of the probing literature (invariant to
    rotation and isotropic scale), here answering "do the two halves
    of the vector encode the same structure?" — CKA ≈ 1 flags
    redundant halves (truncate: the registered Matryoshka op's
    go-signal), CKA ≈ 0 means the halves carry complementary
    information.

    Exact: the same trace-identity machinery as
    embedding_participation_ratio (one 1e6-quantized cross-Gram
    pass, integer centering n·S_ij − s_i·s_j, one declared 1e6
    downscale before squaring); the three HSIC blocks are carved
    from ONE (label, i≤j) cell table by dimension-range CASE, and
    CKA² lands by staged integer division (all operands ≥ 0 —
    sums of squares — so trunc = floor).  The √ back to CKA is
    client-side presentation.

    Plan: ONE ≤20,800-cell aggregate over the emb_gram_cells SHARED
    INTERMEDIATE — the posexplode + vec_id-local self-join Gram pass
    is built once per session and split with the participation-ratio
    op (same quantization constants by construction).  100 TB: the
    shared Gram pass is the corpus pass; cells stay d²-bounded."""
    assert (CKA_Q, CKA_M_DOWN) == (PR_Q, PR_M_DOWN)
    cells = emb_gram_cells(spark, sf_dir)
    d38 = "decimal(38,0)"
    m2 = F.col("m") * F.col("m")
    in_x = F.col("di") <= CKA_SPLIT
    in_y = F.col("dj") > CKA_SPLIT
    diag = F.col("di") == F.col("dj")
    hsic = cells.groupBy("label").agg(
        F.sum(F.when(in_x & in_y, m2).otherwise(0)).cast(d38).alias("hxy"),
        F.sum(
            F.when(
                in_x & ~in_y, F.when(diag, m2).otherwise(2 * m2)
            ).otherwise(0)
        )
        .cast(d38)
        .alias("hxx"),
        F.sum(
            F.when(
                ~in_x & in_y, F.when(diag, m2).otherwise(2 * m2)
            ).otherwise(0)
        )
        .cast(d38)
        .alias("hyy"),
    )
    return hsic.select(
        "label",
        F.expr(
            "CAST(((hxy * 1000000 div hxx) * hxy) div hyy AS BIGINT)"
        ).alias("cka_sq_x1e6"),
    ).orderBy("label")


UNIF_Q = 10**6   # coordinate quantization
UNIF_MOD_A = 13  # pair-sample strata: a-side vec_id % 13 == 0
UNIF_MOD_B = 17  # b-side vec_id % 17 == 0


@query(
    "embedding_uniformity_metric",
    oracle=f"""
        WITH q AS (
            SELECT vec_id, label,
                   [CAST(FLOOR(CAST(x AS DOUBLE) * {UNIF_Q}) AS BIGINT)
                    FOR x IN embedding] AS qv
            FROM embeddings
        ),
        pairs AS (
            SELECT a.label,
                   list_sum([(a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i])
                             FOR i IN range(1, 65)]) AS sq
            FROM q a JOIN q b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE a.vec_id % {UNIF_MOD_A} = 0
              AND b.vec_id % {UNIF_MOD_B} = 0
        ),
        terms AS (
            SELECT label,
                   CAST(FLOOR(EXP(-2.0 * (CAST(sq AS DOUBLE) / 1e12))
                              * 1000000) AS BIGINT) AS t
            FROM pairs
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(t) // COUNT(*) AS BIGINT) AS mean_exp_x1e6,
               CAST(FLOOR(LN((CAST(SUM(t) // COUNT(*) AS DOUBLE)) / 1000000)
                          * 1000000) AS BIGINT) AS uniformity_x1e6
        FROM terms GROUP BY label ORDER BY label
    """,
    tags=("E522",),
)
def embedding_uniformity_metric(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WANG-ISOLA UNIFORMITY of each label's embedding cloud:
    U = log E[exp(−2‖x−y‖²)] over random pairs — the contrastive-
    learning diagnostic pairing ALIGNMENT (positives close) with
    UNIFORMITY (features spread over the sphere).  U near 0 means
    collapse (everything close — exp terms ≈ 1); more negative
    is better spread.  Read with anisotropy (mean off-center
    cosine) and participation ratio: uniformity is the pairwise-
    distance view of the same collapse pathology.

    Exact: pair distances are exact integers over 1e6-quantized
    coordinates; each exp(−2d²) is evaluated on a BIT-IDENTICAL
    double (sq ≤ 2.6e14 < 2^53 casts exactly; /1e12 is correctly
    rounded on both engines) and immediately FLOOR-quantized at 1e6
    — the WOE ⌊ln·1e6⌋ discipline — so the per-label sums are exact
    integer addition in any order.

    Plan: pairs come from a DETERMINISTIC two-strata hash sample
    (a-side vec_id ≡ 0 mod {UNIF_MOD_A}, b-side ≡ 0 mod
    {UNIF_MOD_B}) joined per label — an unbiased pair sample at
    1/221 of the quadratic fan-out, never an all-pairs product (the
    plan-hygiene gate checks).  100 TB: tighten the strata moduli
    with n — the estimator needs O(10³) pairs per group, not
    O(n²)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * UNIF_Q).cast("bigint"),
        ).alias("qv"),
    )
    a = emb.where(F.col("vec_id") % UNIF_MOD_A == 0).select(
        F.col("vec_id").alias("aid"), "label", F.col("qv").alias("qa")
    )
    b = emb.where(F.col("vec_id") % UNIF_MOD_B == 0).select(
        F.col("vec_id").alias("bid"),
        F.col("label").alias("lb"),
        F.col("qv").alias("qb"),
    )
    pairs = a.join(
        b, (F.col("label") == F.col("lb")) & (F.col("aid") < F.col("bid"))
    ).select(
        "label",
        F.aggregate(
            F.zip_with(
                "qa", "qb", lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0).cast("bigint"),
            lambda acc, v: acc + v,
        ).alias("sq"),
    )
    terms = pairs.select(
        "label",
        F.floor(
            F.exp(F.lit(-2.0) * (F.col("sq").cast("double") / F.lit(1e12)))
            * 1000000
        )
        .cast("bigint")
        .alias("t"),
    )
    return (
        terms.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr("CAST(SUM(t) div COUNT(*) AS BIGINT)").alias(
                "mean_exp_x1e6"
            ),
            F.expr(
                "CAST(FLOOR(LN(CAST(SUM(t) div COUNT(*) AS DOUBLE) / 1000000)"
                " * 1000000) AS BIGINT)"
            ).alias("uniformity_x1e6"),
        )
        .orderBy("label")
    )


MAHA_TOP = 20


@query(
    "embedding_mahalanobis_diag_outliers",
    oracle=f"""
        WITH vals AS (
            SELECT vec_id, label,
                   CAST(unnest(range(1, 65)) AS INT) AS i,
                   CAST(FLOOR(CAST(embedding[unnest(range(1, 65))] AS DOUBLE)
                              * {_FIXED_POINT}) AS BIGINT) AS q
            FROM embeddings
        ),
        dimstats AS (
            SELECT i, CAST(SUM(q) AS BIGINT) AS sfx,
                   SUM(CAST(q AS HUGEINT) * q) AS q2,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY i
        ),
        terms AS (
            SELECT v.vec_id, v.label,
                   CAST(ROUND(CAST((CAST(v.q AS HUGEINT) * d.n - d.sfx)
                                   * (CAST(v.q AS HUGEINT) * d.n - d.sfx)
                                   AS DOUBLE)
                              / (d.n * d.q2 - CAST(d.sfx AS HUGEINT)
                                 * d.sfx), 12)
                        AS DECIMAL(24,12)) AS t
            FROM vals v JOIN dimstats d ON d.i = v.i
        ),
        md AS (
            SELECT vec_id, label,
                   CAST(SUM(t) AS DOUBLE) AS md2
            FROM terms GROUP BY vec_id, label
        )
        SELECT vec_id, label, ROUND(md2, 6) AS mahalanobis_sq
        FROM md
        ORDER BY md2 DESC, vec_id
        LIMIT {MAHA_TOP}
    """,
    tags=("E547",),
)
def embedding_mahalanobis_diag_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DIAGONAL-MAHALANOBIS embedding outliers: md2_i = SUM_d
    (x_id - mean_d)^2 / var_d, top-{MAHA_TOP} by distance — the
    variance-aware outlier screen that the registered norm audit
    (raw L2) misses whenever dimensions carry very different scales
    (one high-variance dimension dominates L2; Mahalanobis whitens
    per-dim).  The DIAGONAL form is the one that scales: full-matrix
    Mahalanobis needs a d x d inverse, diagonal needs one pass of
    per-dim moments — the standard embedding-QA compromise, and the
    statistical basis of the z-score family.

    Exact: per-dim moments are exact fixed-point integers; each
    per-(vector, dim) ratio (q N - S_d)^2 / (N Q_d - S_d^2) is
    scale-free (2^48 cancels) and rounds ONCE to DECIMAL(24,12) so
    per-vector sums are order-free; ranking ties break on vec_id.
    Plan: one posexplode pass, a 64-row broadcast moment join, one
    per-vector aggregate, top-k sort.  100 TB: two corpus passes,
    no pairwise anything."""
    e = load_table(spark, sf_dir, "embeddings")
    comps = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "comp")
    ).select(
        "vec_id",
        "label",
        "i",
        F.floor(F.col("comp").cast("double") * F.lit(_FIXED_POINT))
        .cast("bigint")
        .alias("q"),
    )
    d38 = "decimal(38,0)"
    dimstats = comps.groupBy("i").agg(
        F.sum("q").cast("bigint").alias("sfx"),
        F.sum(F.col("q").cast(d38) * F.col("q")).alias("q2"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    terms = comps.join(F.broadcast(dimstats), "i").select(
        "vec_id",
        "label",
        F.round(
            (
                (F.col("q").cast(d38) * F.col("n") - F.col("sfx"))
                * (F.col("q").cast(d38) * F.col("n") - F.col("sfx"))
            ).cast("double")
            / (
                F.col("n") * F.col("q2")
                - F.col("sfx").cast(d38) * F.col("sfx")
            ),
            12,
        )
        .cast("decimal(24,12)")
        .alias("t"),
    )
    md = terms.groupBy("vec_id", "label").agg(
        F.sum("t").cast("double").alias("md2")
    )
    return (
        md.select(
            "vec_id", "label", F.round("md2", 6).alias("mahalanobis_sq")
        )
        .orderBy(F.desc("md2"), "vec_id")
        .limit(MAHA_TOP)
    )


JL_K = 8          # projected dimensionality
JL_BAND = 300000  # ppm half-width of the declared distortion band


@query(
    "embedding_jl_projection_distortion",
    oracle=f"""
        WITH vals AS (
            SELECT vec_id,
                   CAST(unnest(range(1, 65)) AS INT) AS i,
                   CAST(FLOOR(CAST(embedding[unnest(range(1, 65))] AS DOUBLE)
                              * {_FIXED_POINT}) AS BIGINT) AS q
            FROM embeddings
        ),
        signs AS (
            SELECT k.k, d.i,
                   CASE WHEN {phash60_expr("CAST(k.k AS VARCHAR) || ':' || CAST(d.i - 1 AS VARCHAR)")}
                        % 2 = 0 THEN 1 ELSE -1 END AS sgn
            FROM (SELECT CAST(unnest(range(0, {JL_K})) AS INT) AS k) k
            CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INT) AS i) d
        ),
        proj AS (
            SELECT v.vec_id, s.k,
                   CAST(SUM(s.sgn * v.q) AS BIGINT) AS p
            FROM vals v JOIN signs s ON s.i = v.i
            GROUP BY v.vec_id, s.k
        ),
        norms AS (
            SELECT vec_id, SUM(CAST(p AS HUGEINT) * p) AS proj2
            FROM proj GROUP BY vec_id
        ),
        orig AS (
            SELECT vec_id, SUM(CAST(q AS HUGEINT) * q) AS orig2
            FROM vals GROUP BY vec_id
        ),
        dist AS (
            SELECT n.vec_id,
                   CAST(n.proj2 * 1000000 // ({JL_K} * o.orig2) AS BIGINT)
                       AS distortion_ppm
            FROM norms n JOIN orig o ON o.vec_id = n.vec_id
            WHERE o.orig2 > 0
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST({JL_K} AS BIGINT) AS k_proj,
               CAST(SUM(distortion_ppm) // COUNT(*) AS BIGINT)
                   AS mean_distortion_ppm,
               CAST(MIN(distortion_ppm) AS BIGINT) AS min_ppm,
               CAST(MAX(distortion_ppm) AS BIGINT) AS max_ppm,
               CAST(SUM(CASE WHEN distortion_ppm
                             BETWEEN {1000000 - JL_BAND}
                             AND {1000000 + JL_BAND}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_within_band
        FROM dist
    """,
    tags=("E548",),
)
def embedding_jl_projection_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JOHNSON-LINDENSTRAUSS sign-projection DISTORTION AUDIT: project
    64-dim embeddings to k = {JL_K} with a DETERMINISTIC Rademacher
    matrix (signs from the portable hash of (k, dim) — reproducible
    on any engine/cluster, no RNG state), and audit
    ||Px||^2 / (k ||x||^2) per vector — the norm-preservation ratio
    the JL lemma bounds.  This is the go/no-go check before shipping
    hash projections into the LSH/ANN family: the in-band share tells
    you whether k is large enough for this corpus BEFORE you build
    buckets on it.

    Exact, all-integer: fixed-point components, exact BIGINT
    projections (signed sums), HUGEINT/DECIMAL(38) squared norms,
    integer-ppm ratios; the summary is pure integer arithmetic.
    Plan: one posexplode pass joined against a broadcast (k x 64)
    literal sign matrix, two per-vector aggregates — corpus touched
    once.  100 TB: the sign matrix is constant-size; everything else
    is mergeable."""
    from potpot_spark.functions.numeric import phash60

    e = load_table(spark, sf_dir, "embeddings")
    comps = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "comp")
    ).select(
        "vec_id",
        "i",
        F.floor(F.col("comp").cast("double") * F.lit(_FIXED_POINT))
        .cast("bigint")
        .alias("q"),
    )
    ks = spark.range(JL_K).select(F.col("id").cast("int").alias("k"))
    ds = spark.range(64).select(F.col("id").cast("int").alias("i"))
    signs = ks.crossJoin(ds).select(
        "k",
        "i",
        F.when(
            phash60(
                F.concat_ws(
                    ":", F.col("k").cast("string"), F.col("i").cast("string")
                )
            )
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    proj = (
        comps.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "k")
        .agg(F.sum(F.col("sgn") * F.col("q")).cast("bigint").alias("p"))
    )
    d38 = "decimal(38,0)"
    norms = proj.groupBy("vec_id").agg(
        F.sum(F.col("p").cast(d38) * F.col("p")).alias("proj2")
    )
    orig = comps.groupBy("vec_id").agg(
        F.sum(F.col("q").cast(d38) * F.col("q")).alias("orig2")
    )
    dist = (
        norms.join(orig, "vec_id")
        .where(F.col("orig2") > 0)
        .select(
            "vec_id",
            F.expr(
                f"CAST(proj2 * 1000000 div ({JL_K} * orig2) AS BIGINT)"
            ).alias("distortion_ppm"),
        )
    )
    return dist.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.lit(JL_K).cast("bigint").alias("k_proj"),
        F.expr(
            "CAST(SUM(distortion_ppm) div COUNT(1) AS BIGINT)"
        ).alias("mean_distortion_ppm"),
        F.min("distortion_ppm").cast("bigint").alias("min_ppm"),
        F.max("distortion_ppm").cast("bigint").alias("max_ppm"),
        F.sum(
            F.when(
                (F.col("distortion_ppm") >= 1000000 - JL_BAND)
                & (F.col("distortion_ppm") <= 1000000 + JL_BAND),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_within_band"),
    )


@query(
    "embedding_triplet_violation_rate",
    oracle=f"""
        WITH ve AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        ord AS (
            SELECT vec_id, label,
                   LEAD(vec_id) OVER (PARTITION BY label ORDER BY vec_id)
                       AS pos_id,
                   LEAD(vec_id) OVER (ORDER BY vec_id) AS gnext_id,
                   LEAD(label) OVER (ORDER BY vec_id) AS gnext_label
            FROM ve
        ),
        tri AS (
            SELECT vec_id AS anchor_id, pos_id, gnext_id AS neg_id
            FROM ord
            WHERE pos_id IS NOT NULL AND gnext_label IS NOT NULL
              AND gnext_label <> label
        ),
        scored AS (
            SELECT CAST(ROUND(
                {_fold_sql("list_transform(range(64), j -> ae.e[j+1] * pe.e[j+1])")}
                / (SQRT({_fold_sql("list_transform(range(64), j -> ae.e[j+1] * ae.e[j+1])")})
                   * SQRT({_fold_sql("list_transform(range(64), j -> pe.e[j+1] * pe.e[j+1])")}))
                - {_fold_sql("list_transform(range(64), j -> ae.e[j+1] * ne.e[j+1])")}
                / (SQRT({_fold_sql("list_transform(range(64), j -> ae.e[j+1] * ae.e[j+1])")})
                   * SQRT({_fold_sql("list_transform(range(64), j -> ne.e[j+1] * ne.e[j+1])")}))
                , 9) AS DECIMAL(28,9)) AS margin
            FROM tri
            JOIN ve ae ON ae.vec_id = tri.anchor_id
            JOIN ve pe ON pe.vec_id = tri.pos_id
            JOIN ve ne ON ne.vec_id = tri.neg_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triplets,
               CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS violation_ppm,
               ROUND(CAST(SUM(margin) AS DOUBLE) / COUNT(*), 9)
                   AS avg_margin
        FROM scored
    """,
    tags=("E576",),
)
def embedding_triplet_violation_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRIPLET-ORDERING AUDIT of the embedding space: deterministic
    (anchor, positive, negative) triplets — positive = the next vec_id
    within the anchor's label, negative = the next vec_id globally
    when its label differs — and the fraction where cos(a,pos) <
    cos(a,neg).  The metric-learning acceptance test (the triplet loss
    objective evaluated as a rate): violation_ppm is what a contrastive
    training run is supposed to drive toward 0, and a RISING rate
    between two embedding versions is the regression signal that
    matters even when absolute recall metrics look flat.  The
    registered cluster-purity and hubness ops grade the space's
    STRUCTURE; this grades its ORDER — the property retrieval actually
    uses.  Deterministic id-order pairing keeps the audit reproducible
    run-over-run (no RNG), the same doctrine as every sampler in the
    engine.

    Exact: both cosines are the engine's standard left-fold chains
    (bit-equal in DuckDB via list_reduce), the margin is rounded once
    to DECIMAL(28,9) so the order-free mean is exact; counts and ppm
    are integers.  Plan: two LEAD windows (one per-label, one global)
    + three id-equi joins on the embeddings table.  100 TB: windows
    are per-label/ordered-scan shapes; the joins are id-hash
    co-partitionable."""
    emb = load_table(spark, sf_dir, "embeddings")
    ve = emb.select("vec_id", "label", as_double(F.col("embedding")).alias("e"))
    wl = Window.partitionBy("label").orderBy("vec_id")
    wg = Window.orderBy("vec_id")
    ordd = ve.select(
        "vec_id",
        "label",
        F.lead("vec_id").over(wl).alias("pos_id"),
        F.lead("vec_id").over(wg).alias("gnext_id"),
        F.lead("label").over(wg).alias("gnext_label"),
    )
    tri = ordd.where(
        F.col("pos_id").isNotNull()
        & F.col("gnext_label").isNotNull()
        & (F.col("gnext_label") != F.col("label"))
    ).select(
        F.col("vec_id").alias("anchor_id"),
        "pos_id",
        F.col("gnext_id").alias("neg_id"),
    )
    ae = ve.select(F.col("vec_id").alias("anchor_id"), F.col("e").alias("ea"))
    pe = ve.select(F.col("vec_id").alias("pos_id"), F.col("e").alias("ep"))
    ne = ve.select(F.col("vec_id").alias("neg_id"), F.col("e").alias("en"))
    scored = (
        tri.join(ae, "anchor_id")
        .join(pe, "pos_id")
        .join(ne, "neg_id")
        .select(
            F.round(
                cosine(F.col("ea"), F.col("ep"))
                - cosine(F.col("ea"), F.col("en")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("margin")
        )
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triplets"),
        F.sum(F.when(F.col("margin") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
        F.expr(
            "CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END)"
            " * 1000000 div COUNT(*) AS BIGINT)"
        ).alias("violation_ppm"),
        F.round(F.sum("margin").cast("double") / F.count(F.lit(1)), 9).alias(
            "avg_margin"
        ),
    )
