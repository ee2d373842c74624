"""Connected components over the near-duplicate pair graph.

Pair emission (dedup.py) is only half of dedup: shipping a training
corpus needs PAIRS -> CLUSTERS -> one keeper per cluster.  Cluster
identification is connected components — the canonical iterative
algorithm a declarative engine has to express (the reference has no
iteration of any kind; its deepest control flow is a linear-probe TODO,
``/root/reference/src/hashtable.rs:157-161``).

Spark-first design: min-label propagation as a driver-side loop of
DataFrame joins —

    label(v) <- min(label(v), min over neighbors u of label(u))

- edges are symmetrized once and cached; each round is one
  shuffle-join + one aggregate (both on the same node key, so AQE can
  reuse the exchange partitioning);
- ``localCheckpoint`` after every round truncates the lineage — the
  textbook failure of iterative DataFrame code is a plan that doubles
  per round until the driver OOMs planning it;
- rounds needed = graph diameter (near-dup clusters are tiny cliques:
  3-6 rounds); convergence is detected with a one-row aggregate, and a
  hard cap guards pathological chains.

At 100 TB the same loop holds because per-round cost is two exchanges
over |E|; for truly huge graphs the alternating large-star/small-star
variant (same skeleton, different join) halves rounds on skewed
degree distributions.

Oracle: DuckDB recursive CTE computing min reachable doc_id over the
same edge set — exact equality with the fixpoint of the propagation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.operators.dedup import dedup_ngram_jaccard
from potpot_spark.registry import query

# Edge definition shared with dedup_ngram_jaccard's oracle (same
# blocking + threshold); kept as one source string so the two oracles
# cannot drift apart.
_EDGE_SQL = """
        WITH sh AS (
            SELECT doc_id, lang, n_chars,
                   list_distinct(
                       list_transform(
                           range(1, greatest(len(string_split(lower(text), ' ')) - 2, 1) + 1),
                           i -> array_to_string(
                                    list_slice(string_split(lower(text), ' '), i, i + 2),
                                    ' ')
                       )
                   ) AS shingles
            FROM documents
            WHERE len(string_split(lower(text), ' ')) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sh a JOIN sh b
              ON a.lang = b.lang
             AND a.doc_id < b.doc_id
             AND abs(a.n_chars - b.n_chars) <= 10
            WHERE CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
                  / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.3
        )
"""


def connected_components(nodes: DataFrame, edges: DataFrame, max_rounds: int = 20) -> DataFrame:
    """Min-label propagation.  ``nodes``: (node,), ``edges``: (src, dst)
    one row per undirected edge; returns (node, component) where
    component is the minimum node id reachable from ``node``."""
    sym = (
        edges.select(F.col("src"), F.col("dst"))
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # Only edge endpoints can ever change label — singletons are fixed
    # points and sit out the loop entirely.  On a near-dup corpus |V(E)|
    # is orders of magnitude below |V| (most documents are unique), so
    # every round's shuffle runs over the pair graph, not the corpus.
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select(F.col("node"), F.col("node").alias("component"))
        .localCheckpoint()
    )
    # Labels only ever decrease (min semiring), so Σcomponent strictly
    # decreases on every non-converged round: a one-row sum aggregate is
    # a complete convergence test — no per-round diff join needed.
    prev_sum = labels.agg(F.sum("component")).collect()[0][0]
    for _ in range(max_rounds):
        # neighbor labels pulled across edges, then min with own label
        neighbor = (
            sym.join(labels, sym.dst == labels.node)
            .select(F.col("src").alias("node"), F.col("component"))
        )
        labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # truncate lineage every round
        )
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    # Singletons re-enter labelled by themselves.
    return nodes.join(labels, "node", "left").select(
        F.col("node"), F.coalesce("component", "node").alias("component")
    )


@query(
    "dedup_connected_components",
    oracle=_EDGE_SQL.replace("WITH sh AS", "WITH RECURSIVE sh AS", 1)
    + """
        , edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION
            SELECT doc_b, doc_a FROM pairs
        ),
        reach AS (
            SELECT doc_id AS node, doc_id AS label FROM documents
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN edges e ON e.src = r.node
            WHERE r.label < e.dst
        )
        SELECT node AS doc_id, MIN(label) AS component
        FROM reach
        GROUP BY node
    """,
    tags=("E35",),
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the exact
    n-gram-Jaccard pair graph (threshold 0.3).  Every document gets a
    component id = min doc_id in its cluster; singletons label
    themselves.  Downstream dedup keeps ``doc_id == component``."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    return connected_components(nodes, pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
