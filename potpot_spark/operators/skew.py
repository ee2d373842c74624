"""Skew-handling patterns: salted two-stage aggregation and salted
shuffle joins.

At 100 TB the killer failure is a hot key: one reducer gets the whole
'view' partition while 999 executors idle.  These operators encode the
two standard mitigations as *semantics-preserving* rewrites (both are
oracle-checked against the naive SQL — salting must never change the
answer):

- **two-stage aggregation**: groupBy(key, salt) partial -> groupBy(key)
  merge.  The hot key spreads over SALT reducers in stage 1; stage 2
  merges SALT sub-rows per key — O(keys x SALT) rows, trivial.
- **salted join**: explode the small-but-not-broadcastable side SALT
  ways, salt the skewed fact side deterministically, join on
  (key, salt).  Each hot-key bucket lands on a different reducer.

Salt is ``pmod(xxhash64(row-id), SALT)`` — deterministic, so the same
row always lands in the same bucket (reproducible runs, and retries
don't double-count), unlike ``rand()``-based salting.

Spark's AQE skew-join split (enabled in session.py) handles moderate
skew automatically at runtime; explicit salting remains the tool for
extreme single-key skew and for skewed AGGREGATION, which AQE does not
rebalance.

The reference has no grouping at all (``/root/reference/src/lib.rs:1-12``);
skew there means hash-bucket collisions, handled by linear probing
(``hashtable.rs:157-161`` TODO) — the single-node shadow of the same
problem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum, dsum_expr
from potpot_spark.registry import query

SALT = 16


@query(
    "agg_skew_two_stage",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS n_events,
               {dsum_expr('value', scale=4)} AS total_value
        FROM events
        GROUP BY event_type
    """,
    tags=("E14",),
)
def agg_skew_two_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation over a 5-value (maximally skewed)
    key.  Stage 1 groups by (event_type, salt) so the hot keys spread
    over {SALT} reducers; stage 2 merges the {SALT} sub-aggregates per
    key.  Decimal sums make the merge exact, so the result is
    bit-identical to the naive single-stage oracle."""
    e = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(SALT)).alias("salt")
    stage1 = (
        e.select("event_type", "value", salt)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("n_part"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("v_part"),
        )
    )
    return stage1.groupBy("event_type").agg(
        F.sum("n_part").alias("n_events"),
        F.sum("v_part").cast("double").alias("total_value"),
    )


@query(
    "join_skew_salted",
    oracle=f"""
        SELECT e.event_type,
               COUNT(*) AS n_events,
               {dsum_expr('e.value * t.weight', scale=6)} AS weighted_value
        FROM events e
        JOIN (
            SELECT event_type, CAST(COUNT(*) AS DOUBLE) / 1000.0 AS weight
            FROM events GROUP BY event_type
        ) t ON e.event_type = t.event_type
        GROUP BY e.event_type
    """,
    tags=("E8",),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join on a 5-value hot key: the fact side gets a
    deterministic salt; the dim side is exploded SALT ways so every
    (key, salt) bucket meets its dim row.  Result provably equals the
    unsalted join (oracle).  The dim here would of course broadcast —
    the op force-disables broadcast (hint) to exercise the shuffle-join
    rewrite that applies when the non-fact side is 100s of GB."""
    e = load_table(spark, sf_dir, "events")
    dim = (
        e.groupBy("event_type")
        .agg((F.count(F.lit(1)).cast("double") / 1000.0).alias("weight"))
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(SALT)]))
    )
    fact = e.select(
        "event_type", "value", F.pmod(F.xxhash64("event_id"), F.lit(SALT)).alias("salt")
    )
    joined = fact.hint("shuffle_hash").join(dim_salted, ["event_type", "salt"])
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value") * F.col("weight"), scale=6).alias("weighted_value"),
    )


BAND_MINUTES = 15


@query(
    "join_range_banded",
    oracle="""
        SELECT p.event_id AS purchase_id,
               COUNT(*) AS neighbor_events
        FROM events p
        JOIN events n
          ON p.user_id = n.user_id
         AND p.event_type = 'purchase'
         AND n.event_id <> p.event_id
         AND abs(date_diff('microsecond', CAST(p.ts AS TIMESTAMP),
                           CAST(n.ts AS TIMESTAMP))) <= 15 * 60 * 1000000
        GROUP BY p.event_id
    """,
    tags=("E12", "E8"),
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-neighborhood join via banding: events within +/-15 min of
    each purchase by the same user.  A naive |Δt| <= 15min predicate
    on top of the user equi-key degrades into a per-user cross product
    (quadratic in the hot user's events); banding adds floor(ts/15min)
    to the JOIN KEY — the probe side explodes into its band and both
    neighbors, every qualifying pair meets on exactly one (user, band)
    key, and |Δt| remains as a residual filter.  Same trick as the
    n-gram length-banding (operators/dedup.py), applied to time — the
    general recipe for range joins at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    band = F.floor(F.unix_micros("ts") / (BAND_MINUTES * 60 * 1_000_000))
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("p_us"),
        F.explode(F.array(band - 1, band, band + 1)).alias("band"),
    )
    neighbors = e.select(
        F.col("event_id").alias("n_id"),
        F.col("user_id"),
        F.unix_micros("ts").alias("n_us"),
        band.alias("band"),
    )
    return (
        purchases.join(neighbors, ["user_id", "band"])
        .where(
            (F.col("n_id") != F.col("purchase_id"))
            & (F.abs(F.col("p_us") - F.col("n_us")) <= BAND_MINUTES * 60 * 1_000_000)
        )
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("neighbor_events"))
    )
