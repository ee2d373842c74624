"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantizer scale path complementing sign-LSH (similarity.py).

Index build = k-means over the corpus, expressed as iterative
DataFrame aggregation (the same driver-loop skeleton as connected
components, operators/graph.py):

  assign: corpus x broadcast(centroids) -> nearest centroid id
  update: groupBy(centroid) -> per-dimension mean

Determinism engineering (what makes a distributed k-means
reproducible):
- init is the first K corpus vectors by vec_id — no RNG;
- centroid updates accumulate per-dimension sums in DECIMAL(38,18)
  (exact, associative) and divide by the count once, so a different
  partitioning/AQE layout CANNOT move a centroid by an ulp and flip a
  downstream assignment;
- assignment ties break to the lowest centroid id.

Query = probe the ``nprobe`` nearest cells only (cost ~ nprobe/K of
the corpus per query), rerank candidates with exact cosine.  At 100 TB
the posting lists are a table partitioned by cell id; probes touch
nprobe partitions — the same pruning story as partitionBy, applied to
vector space.  Rows-only check (no SQL twin for the trained index);
recall vs brute force is bounded in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.operators.similarity import N_QUERIES, TOP_K, as_double, cosine
from potpot_spark.registry import query

K_CELLS = 16
N_ITERS = 5
N_PROBE = 4
DIM = 64


def sq_dist(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x)


def train_ivf_centroids(corpus: DataFrame, k: int = K_CELLS, iters: int = N_ITERS) -> DataFrame:
    """Lloyd's algorithm, deterministic: returns (cell_id, centroid)."""
    cents = (
        corpus.orderBy("vec_id")
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy("vec_id")).alias("cell_id"),
            F.col("emb").alias("centroid"),
        )
        .localCheckpoint()
    )
    for _ in range(iters):
        assigned = assign_cells(corpus, cents)
        # per-dimension decimal-exact mean: explode positions, sum, regroup
        exploded = assigned.select(
            "cell_id", F.posexplode("emb").alias("pos", "x")
        )
        dims = (
            exploded.groupBy("cell_id", "pos")
            .agg(
                (F.sum(F.col("x").cast("decimal(38,18)")) / F.count("x"))
                .cast("double")
                .alias("m")
            )
        )
        cents = (
            dims.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell_id", F.transform("pm", lambda s: s.m).alias("centroid"))
            .localCheckpoint()
        )
    return cents


def assign_cells(vectors: DataFrame, cents: DataFrame, n: int = 1) -> DataFrame:
    """Attach the n nearest cell ids to each vector (n=1: assignment;
    n=nprobe: probe set).  Centroids broadcast, so scoring never
    shuffles the corpus.  The n=1 argmin is a ``min(struct(d2, cell))``
    aggregation, NOT a window: min() combines map-side, so one row per
    vector crosses the exchange instead of k (a window's partitionBy
    would shuffle the full corpus x k scored rows AND sort them — the
    difference between an O(|V|) and O(k|V|) exchange at 100 TB).
    Struct ordering = (d2 asc, cell_id asc): ties break to the lowest
    cell id, same contract as the window form."""
    scored = vectors.crossJoin(F.broadcast(cents)).select(
        *vectors.columns,
        "cell_id",
        sq_dist(F.col("emb"), F.col("centroid")).alias("d2"),
    )
    keys = [c for c in ("vec_id", "query_id") if c in vectors.columns]
    if n == 1:
        payload = [c for c in vectors.columns if c not in keys]
        return (
            scored.groupBy(*keys)
            .agg(
                F.min(F.struct("d2", "cell_id")).alias("_best"),
                # every scored row of a vector carries identical payload
                *[F.first(c).alias(c) for c in payload],
            )
            .select(*keys, *payload, F.col("_best.cell_id").alias("cell_id"))
        )
    w = Window.partitionBy(*keys).orderBy(F.col("d2").asc(), F.col("cell_id").asc())
    return (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .where(F.col("cell_rank") <= n)
        .drop("d2", "cell_rank")
    )


@query("sim_search_ivf", oracle=None, tags=("E36", "rows-only"))
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: 16-cell deterministic k-means index, nprobe=4 probe,
    exact-cosine rerank, top-10 per query."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("emb")
    )
    cents = train_ivf_centroids(emb)
    postings = assign_cells(emb, cents, n=1)  # (vec_id, emb, cell_id)
    queries_df = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )
    probes = assign_cells(
        queries_df.withColumnRenamed("q_emb", "emb"), cents, n=N_PROBE
    ).withColumnRenamed("emb", "q_emb")
    candidates = F.broadcast(probes).join(postings, "cell_id").select(
        "query_id", "q_emb", "vec_id", "emb"
    ).dropDuplicates(["query_id", "vec_id"])
    scored = candidates.select(
        "query_id", "vec_id", cosine(F.col("q_emb"), F.col("emb")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOP_K)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cosine"), "rnk")
    )
