"""Feature-engineering operators for training-data pipelines:
z-score standardization, leave-one-out target encoding, and
token-budget sequence packing.

These are the last-mile transforms between a cleaned corpus/fact table
and a training job.  All three follow the same scale discipline the
rest of the engine uses: group statistics are computed with
order-independent exact-decimal accumulation (functions/numeric.py),
then joined back broadcast — the per-row pass never reshuffles the
fact table, so at 100 TB the cost is one scan + one tiny dimension
join.  The reference has no aggregate surface at all (its only read is
a point-get stub, ``/root/reference/src/query.rs:7-9``); these extend
the engine-declared inventory (SURVEY.md §2.10/§2.11).

Float-parity note: the oracle gate compares doubles BIT-EXACTLY, so
every derived value is built only from IEEE-determined operations
(+ - * / sqrt are correctly rounded in both engines) applied in the
SAME association order on both sides.  No log/exp/pow in compared
columns.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dec, dsum
from potpot_spark.registry import query


@query(
    "ml_standardize_zscore",
    oracle="""
        WITH s AS (
            SELECT event_type,
                   COUNT(value) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sumsq,
                   CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sm
            FROM events GROUP BY event_type
        )
        SELECT e.event_id, e.event_type, e.value,
               (e.value - s.sm / s.n)
                 / sqrt((s.sumsq - (s.sm * s.sm) / s.n) / (s.n - 1)) AS zscore
        FROM events e JOIN s USING (event_type)
    """,
    tags=("E14", "E9"),
)
def ml_standardize_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score standardization of a feature column: one
    aggregate pass computes (n, Σx, Σx²) per event_type with exact
    decimal accumulation, then a broadcast join applies
    ``(x - mean) / stddev_samp`` row-wise.

    Two-pass-as-one-scan-plus-broadcast is the scalable shape: the
    statistics table has |distinct groups| rows, so the per-row pass is
    a map-side join — no shuffle of the fact table at any scale.  The
    decimal moments make mean/variance identical across partitionings
    (raw double Σx² is order-dependent); the final double expression
    uses only correctly-rounded IEEE ops (/ - * sqrt), so results are
    bit-reproducible across cluster sizes — and against the oracle."""
    e = load_table(spark, sf_dir, "events")
    stats = (
        e.groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.sum(dec("value", 4) * dec("value", 4)).cast("double").alias("sumsq"),
            dsum("value", 4).alias("sm"),
        )
    )
    mean = F.col("sm") / F.col("n")
    var = (F.col("sumsq") - (F.col("sm") * F.col("sm")) / F.col("n")) / (F.col("n") - 1)
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            ((F.col("value") - mean) / F.sqrt(var)).alias("zscore"),
        )
    )


@query(
    "ml_target_encoding_loo",
    oracle="""
        WITH oc AS (
            SELECT o.o_orderkey, c.c_mktsegment, o.o_totalprice
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        s AS (
            SELECT c_mktsegment,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS ssum,
                   COUNT(*) AS n
            FROM oc GROUP BY c_mktsegment
        )
        SELECT oc.o_orderkey, oc.c_mktsegment,
               (s.ssum - oc.o_totalprice) / (s.n - 1) AS loo_enc
        FROM oc JOIN s USING (c_mktsegment)
    """,
    tags=("E14", "E9"),
)
def ml_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature: encode
    each order's market segment as the mean total price of all OTHER
    orders in that segment — ``(Σ_segment - x) / (n_segment - 1)``.

    LOO is the standard leakage-safe categorical encoder for training
    pipelines (plain mean encoding leaks the row's own target).  The
    closed form needs only per-segment (Σ, n), so the plan is: fact ⨝
    broadcast(customer-key→segment), one partial-aggregated groupBy
    over ~5 segments, then a second broadcast join back — the fact
    table is scanned twice but never shuffled, and both joins are
    map-side at any scale."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    oc = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment", "o_totalprice"
    )
    s = oc.groupBy("c_mktsegment").agg(
        dsum("o_totalprice", 2).alias("ssum"),
        F.count(F.lit(1)).alias("n"),
    )
    return oc.join(F.broadcast(s), "c_mktsegment").select(
        "o_orderkey",
        "c_mktsegment",
        ((F.col("ssum") - F.col("o_totalprice")) / (F.col("n") - 1)).alias("loo_enc"),
    )


PACK_BUDGET = 2048


@query(
    "pipeline_pack_sequences",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        ),
        packed AS (
            SELECT lang, n_tokens,
                   CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                                   ROWS UNBOUNDED PRECEDING) - n_tokens)
                              / {PACK_BUDGET}) AS BIGINT) AS seq_no
            FROM toks
        )
        SELECT lang, seq_no,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM packed GROUP BY lang, seq_no
    """,
    tags=("E18", "E82"),
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: assign documents (in stable
    doc_id order, per language) to training sequences of ~2048 tokens
    by bucketing the running token count — ``seq_no = floor(
    (cumsum - n_tokens) / budget)``, i.e. a document starts a new
    sequence when the budget would otherwise be exceeded mid-stream.

    Packing is how LLM training jobs avoid padding waste; the greedy
    contiguous-fill variant here is what large pipelines actually use
    (bin-packing optimally is NP-hard and order-destroying).  The
    window partitions by lang, so the cumulative sum parallelizes
    across languages — the 100 TB form shards the window key further
    (e.g. (lang, shard) from a hash of doc_id) since packing quality
    only needs locality, not a global order.  Integer-only math: exact
    parity by construction."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    packed = toks.select(
        "lang",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET)
        .cast("bigint")
        .alias("seq_no"),
    )
    return packed.groupBy("lang", "seq_no").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


@query(
    "ml_winsorize_clip",
    oracle=f"""
        WITH bounds AS (
            SELECT event_type,
                   ROUND(quantile_cont(value, {WINSOR_LO}), 4) AS lo,
                   ROUND(quantile_cont(value, {WINSOR_HI}), 4) AS hi
            FROM events GROUP BY event_type
        )
        SELECT e.event_type, b.lo, b.hi,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_low,
               CAST(SUM(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_high,
               CAST(SUM(CAST(CASE WHEN e.value < b.lo THEN b.lo
                                  WHEN e.value > b.hi THEN b.hi
                                  ELSE e.value END AS DECIMAL(18,4))) AS DOUBLE)
                 AS clipped_sum
        FROM events e JOIN bounds b USING (event_type)
        GROUP BY e.event_type, b.lo, b.hi
    """,
    tags=("E40", "E99"),
)
def ml_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization: clip each event's value into its type's
    [p05, p95] band — the standard feature-robustification step before
    model training (z-scores move outliers, winsorizing caps them;
    anomaly_mad_flags DETECTS the same tail this op neutralizes).

    One exact-percentile aggregate collapses the fact table to a
    two-number row per type; clipping is a broadcast join back plus a
    branch-free CASE — the fact table never shuffles.  Percentile
    boundaries are rounded to 4 decimals on BOTH sides (same lossless
    convention as anomaly_mad_flags), clip compares are exact double
    comparisons, and the clipped sum accumulates in decimal after the
    boundary rounding — bit-identical across engines and partitionings.
    At 100 TB the exact percentile swaps for percentile_approx; the
    join-back shape is unchanged."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    bounds = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(WINSOR_LO)), 4).alias("lo"),
        F.round(F.percentile("value", F.lit(WINSOR_HI)), 4).alias("hi"),
    )
    clipped = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo",
        "hi",
        "value",
        F.when(F.col("value") < F.col("lo"), F.col("lo"))
        .when(F.col("value") > F.col("hi"), F.col("hi"))
        .otherwise(F.col("value"))
        .alias("v_clip"),
    )
    return clipped.groupBy("event_type", "lo", "hi").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.sum(F.col("v_clip").cast("decimal(18,4)")).cast("double").alias("clipped_sum"),
    )


HASH_DIM = 64


@query(
    "ml_feature_hashing",
    oracle=f"""
        WITH toks AS (
            SELECT t.tok
            FROM documents d,
                 UNNEST(string_split(lower(d.text), ' ')) AS t(tok)
            WHERE t.tok <> ''
        )
        SELECT CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % {HASH_DIM}
                 AS bucket,
               COUNT(*) AS n_tokens,
               COUNT(DISTINCT tok) AS n_distinct_tokens
        FROM toks
        GROUP BY bucket
    """,
    tags=("E37", "E48"),
)
def ml_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: project an unbounded token vocabulary onto a
    fixed 64-dimension feature space by hashing each token to a
    bucket — the stateless alternative to a fitted vocabulary (no
    dictionary to build, broadcast, or version; new tokens at serving
    time land deterministically).  The hash is the first 8 hex digits
    of md5 — engine-portable like every split/sample key in this repo,
    so feature indices survive engine swaps and reruns (a fitted
    CountVectorizer can't promise that).

    Corpus-level readout: tokens and distinct tokens per bucket — the
    collision audit run before choosing the dimension.  Filter-before-
    explode, one shuffle on the bucket key, 64-row result."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .where(F.col("tok") != "")
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint") % HASH_DIM
    ).alias("bucket")
    return toks.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
    )


@query(
    "ml_eval_binary_classifier",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
                   value AS score
            FROM events
        ), thresholds AS (
            SELECT CAST(t AS DOUBLE) AS threshold
            FROM (VALUES (50.0), (100.0), (200.0)) v(t)
        )
        SELECT t.threshold,
               CAST(SUM(CASE WHEN s.score > t.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN s.score > t.threshold AND s.label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN s.score <= t.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN s.score <= t.threshold AND s.label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
               CAST(SUM(CASE WHEN s.score > t.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN s.score > t.threshold THEN 1 ELSE 0 END), 0) AS precision,
               CAST(SUM(CASE WHEN s.score > t.threshold AND s.label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN s.label = 1 THEN 1 ELSE 0 END), 0) AS recall
        FROM scored s CROSS JOIN thresholds t
        GROUP BY t.threshold
        ORDER BY t.threshold
    """,
    tags=("E25",),
)
def ml_eval_binary_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classifier evaluation sweep: confusion matrix + precision
    / recall at three operating thresholds, in ONE pass over the data
    (label = is-purchase, score = event value — the driver fixtures'
    stand-in for model output).

    The threshold sweep is a 3-row broadcast cross join, so the fact
    table is read once and each row contributes to every threshold's
    conditional sums map-side — the scalable eval-harness shape (vs
    re-scanning per threshold).  Counts are exact integers; the two
    ratios are single divisions of identical integers on both engines
    (NULL-guarded when a threshold clears the whole positive side)."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        F.col("value").alias("score"),
    )
    thresholds = spark.createDataFrame(
        [(50.0,), (100.0,), (200.0,)], "threshold double"
    )
    pred = F.col("score") > F.col("threshold")
    pos = F.col("label") == 1
    tp = F.sum(F.when(pred & pos, 1).otherwise(0))
    return (
        scored.crossJoin(F.broadcast(thresholds))
        .groupBy("threshold")
        .agg(
            tp.alias("tp"),
            F.sum(F.when(pred & ~pos, 1).otherwise(0)).alias("fp"),
            F.sum(F.when(~pred & pos, 1).otherwise(0)).alias("fn"),
            F.sum(F.when(~pred & ~pos, 1).otherwise(0)).alias("tn"),
            (
                tp.cast("double")
                / F.nullif(F.sum(F.when(pred, 1).otherwise(0)), F.lit(0))
            ).alias("precision"),
            (
                tp.cast("double") / F.nullif(F.sum(F.when(pos, 1).otherwise(0)), F.lit(0))
            ).alias("recall"),
        )
        .orderBy("threshold")
    )


@query(
    "ml_eval_auc_rank",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
                   value AS score
            FROM events
        ), ranked AS (
            SELECT label,
                   (RANK() OVER (ORDER BY score)
                    + (COUNT(*) OVER (PARTITION BY score) - 1) / 2.0) AS avg_rank
            FROM scored
        )
        SELECT CAST((CAST(SUM(CASE WHEN label = 1 THEN avg_rank END)
                          AS DOUBLE)
                     - CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                       * (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) / 2.0)
                    / (CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                       * SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END))
               AS DOUBLE) AS auc,
               CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        FROM ranked
    """,
    tags=("E25",),
)
def ml_eval_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC-ROC via the Mann-Whitney rank-sum identity: AUC =
    (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg), with midrank tie
    handling — the distributed way to compute AUC exactly in TWO
    passes (rank window + one aggregate), no threshold sweep, no
    pairwise O(n^2) comparisons.

    Every quantity is integer-derived: ranks and tie-counts are exact,
    midranks are integers-over-2, and the final expression is the same
    short chain of double ops on both engines — bit-exact.  At 100 TB
    the global ORDER BY score is the one shuffle; everything else is a
    windowless aggregate."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        F.col("value").alias("score"),
    )
    wr = Window.orderBy("score")
    wt = Window.partitionBy("score")
    ranked = scored.select(
        "label",
        (
            F.rank().over(wr)
            + (F.count(F.lit(1)).over(wt) - 1) / F.lit(2.0)
        ).alias("avg_rank"),
    )
    n_pos = F.sum(F.when(F.col("label") == 1, 1).otherwise(0))
    n_neg = F.sum(F.when(F.col("label") == 0, 1).otherwise(0))
    r_pos = F.sum(F.when(F.col("label") == 1, F.col("avg_rank")))
    return ranked.agg(
        (
            (
                r_pos.cast("double")
                - n_pos.cast("double") * (n_pos + 1) / F.lit(2.0)
            )
            / (n_pos.cast("double") * n_neg)
        )
        .cast("double")
        .alias("auc"),
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
    )


@query(
    "udf_pandas_scalar_feature",
    oracle="""
        SELECT event_id,
               LEAST(GREATEST((value - 0.01) / (490.02 - 0.01), 0.0), 1.0)
                 AS minmax_scaled,
               value * value / 1000.0 AS poly_feature
        FROM events
        WHERE event_id % 11 = 0
        ORDER BY event_id
    """,
    tags=("E27", "E25"),
)
def udf_pandas_scalar_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar Pandas UDF — the sanctioned Python scalar
    path: whole Arrow batches in, NumPy-vectorized math, batches out
    (~10-100x over row-at-a-time Python UDFs, which this engine
    deliberately contains zero of).  Min-max scaling + a polynomial
    feature, pinned value-for-value against the same arithmetic in
    SQL: the Arrow transfer and pandas evaluation must be
    numerically IDENTICAL to the JVM expression — same operand
    order, same IEEE doubles — which is exactly what makes Python
    feature engineering trustworthy in a pipeline whose other half
    runs in SQL."""
    from pyspark.sql.functions import pandas_udf

    # lambda form: inner-scope type hints are not resolvable by
    # pandas_udf's signature inspection under deferred annotations
    minmax = pandas_udf(
        lambda v: ((v - 0.01) / (490.02 - 0.01)).clip(lower=0.0, upper=1.0),
        "double",
    )
    poly = pandas_udf(lambda v: v * v / 1000.0, "double")

    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 11 == 0)
    return e.select(
        "event_id",
        minmax("value").alias("minmax_scaled"),
        poly("value").alias("poly_feature"),
    ).orderBy("event_id")


@query(
    "ml_calibration_bins",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
                   CAST(LEAST(FLOOR(value / 50.0), 9) AS INT) AS bin
            FROM events
        )
        SELECT bin,
               50.0 * bin AS bin_low,
               COUNT(*) AS n,
               CAST(SUM(label) AS BIGINT) AS n_pos,
               CAST(SUM(label) AS DOUBLE) / COUNT(*) AS observed_rate
        FROM scored
        GROUP BY bin
        ORDER BY bin
    """,
    tags=("E25",),
)
def ml_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve: bucket the score into 10 fixed-width bins
    and report the observed positive rate per bin — the reliability
    diagram that tells you whether a model's scores mean what they
    say (pairs with ml_eval_auc_rank: AUC measures ranking,
    calibration measures probability).

    One pass, one aggregate: bin assignment is FLOOR arithmetic
    (truncation — identical on both engines, unlike round), counts
    are exact integers, the rate is one division.  At 100 TB the
    10-row result makes this free to run on every scoring batch."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int").alias("bin"),
    )
    return (
        scored.groupBy("bin")
        .agg(
            (F.lit(50.0) * F.col("bin")).alias("bin_low"),
            F.count(F.lit(1)).alias("n"),
            F.sum("label").alias("n_pos"),
            (F.sum("label").cast("double") / F.count(F.lit(1))).alias("observed_rate"),
        )
        .orderBy("bin")
    )


@query(
    "ml_rfm_segmentation",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS frequency,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     AS monetary
            FROM orders GROUP BY o_custkey
        ),
        scored AS (
            SELECT o_custkey, last_order, frequency, monetary,
                   NTILE(4) OVER (ORDER BY last_order, o_custkey) AS r_score,
                   NTILE(4) OVER (ORDER BY frequency, o_custkey) AS f_score,
                   NTILE(4) OVER (ORDER BY monetary, o_custkey) AS m_score
            FROM per_cust
        )
        SELECT r_score, f_score, m_score,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
                 AS segment_value
        FROM scored
        GROUP BY r_score, f_score, m_score
        ORDER BY r_score, f_score, m_score
    """,
    tags=("E19", "E25"),
)
def ml_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored into recency /
    frequency / monetary quartiles (ntile with a custkey tie-break —
    the total order that makes quartile boundaries identical on both
    engines), then the 4x4x4 segment grid sized and valued — the
    marketing-analytics workhorse.

    One per-customer aggregate, three ntile windows over it (each a
    sort of the ALREADY-aggregated relation — 1/1000th of the fact
    table), one final rollup.  Monetary sums ride exact decimals."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias(
            "monetary"
        ),
    )
    scored = per_cust.select(
        "o_custkey", "monetary",
        F.ntile(4).over(Window.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(4).over(Window.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(4).over(Window.orderBy("monetary", "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(18,2)")).cast("double").alias(
                "segment_value"
            ),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


KFOLD_K = 5


@query(
    "ml_kfold_assign",
    oracle=f"""
        WITH folds AS (
            SELECT c_custkey, c_acctbal,
                   CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 2))
                        AS INT) % {KFOLD_K} AS fold
            FROM customer
        )
        SELECT fold,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*) AS mean_acctbal,
               CAST(MIN(c_custkey) AS BIGINT) AS min_key,
               CAST(MAX(c_custkey) AS BIGINT) AS max_key
        FROM folds GROUP BY fold ORDER BY fold
    """,
    tags=("E48", "E99"),
)
def ml_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    md5(key) mod k — reproducible on any engine, any partitioning,
    any rerun (the same portable-hash discipline as
    ``sample_train_test_split``, completing the CV side of the
    train/eval tooling).  Per-fold row counts and exact-decimal mean
    of the target sanity-check fold balance.  At 100 TB the
    assignment is a pure row-local expression — no shuffle beyond the
    k-row aggregate."""
    c = load_table(spark, sf_dir, "customer")
    fold = (
        F.conv(F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2), 16, 10)
        .cast("int") % KFOLD_K
    ).alias("fold")
    return (
        c.select(fold, "c_custkey", "c_acctbal")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_acctbal"),
            F.min("c_custkey").cast("bigint").alias("min_key"),
            F.max("c_custkey").cast("bigint").alias("max_key"),
        )
        .orderBy("fold")
    )


DRIFT_BIN_WIDTH = 50.0
DRIFT_N_BINS = 10


@query(
    "ml_drift_total_variation",
    oracle=f"""
        WITH binned AS (
            SELECT CAST(LEAST(FLOOR(value / {DRIFT_BIN_WIDTH}), {DRIFT_N_BINS - 1}) AS INT)
                     AS bin,
                   user_id % 2 AS cohort
            FROM events
        ),
        counts AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
            FROM binned GROUP BY bin
        ),
        tot AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
            FROM counts
        )
        SELECT na, nb,
               ROUND(0.5 * CAST(SUM(ABS(ca * nb - cb * na)) AS DOUBLE)
                     / (na * nb), 9) AS tvd
        FROM counts, tot
        GROUP BY na, nb
    """,
    tags=("E42", "E88"),
)
def ml_drift_total_variation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift metric between two cohorts (even vs odd
    users) over binned event values: total variation distance
    TVD = ½ Σ_bins |p_i − q_i| — the log-free drift statistic (PSI's
    ln(p/q) term is not correctly-rounded cross-engine; TVD carries
    the identical monitoring signal with exact arithmetic).

    Bit-exact trick: |p−q| = |ca·nb − cb·na| / (na·nb), so the sum
    runs over INTEGERS and the single double division happens once at
    the end — reproducible at any partition count, any engine.  One
    mergeable groupBy over the fact table; everything after is
    aggregate-sized."""
    e = load_table(spark, sf_dir, "events")
    binned = e.select(
        F.least(F.floor(F.col("value") / DRIFT_BIN_WIDTH), F.lit(DRIFT_N_BINS - 1))
        .cast("int")
        .alias("bin"),
        (F.col("user_id") % 2).alias("cohort"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).cast("bigint").alias("ca"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).cast("bigint").alias("cb"),
    )
    from pyspark.sql.window import Window

    tot = Window.partitionBy()
    with_tot = counts.select(
        "ca", "cb",
        F.sum("ca").over(tot).cast("bigint").alias("na"),
        F.sum("cb").over(tot).cast("bigint").alias("nb"),
    )
    return with_tot.groupBy("na", "nb").agg(
        F.round(
            0.5
            * F.sum(F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))).cast(
                "double"
            )
            / (F.col("na") * F.col("nb")),
            9,
        ).alias("tvd")
    ).select(F.col("na"), F.col("nb"), F.col("tvd"))


NDCG_K = 5
# 1/log2(rank+1) precomputed as shortest-roundtrip double literals so
# NEITHER engine evaluates a transcendental at query time (log results
# are not guaranteed correctly-rounded across libm implementations;
# literals parse to identical doubles everywhere).
NDCG_DISCOUNTS = {
    1: 1.0,
    2: 0.6309297535714575,
    3: 0.5,
    4: 0.43067655807339306,
    5: 0.38685280723454163,
}
_NDCG_CASE = " ".join(f"WHEN {r} THEN {d!r}" for r, d in NDCG_DISCOUNTS.items())


@query(
    "ml_ndcg_at_k",
    oracle=f"""
        WITH scored AS (
            SELECT o_custkey,
                   5 - CAST(substring(o_orderpriority, 1, 1) AS INT) AS gain,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY 5 - CAST(substring(o_orderpriority, 1, 1) AS INT) DESC,
                                               o_orderkey) AS irn
            FROM orders
        ),
        per_cust AS (
            SELECT o_custkey,
                   SUM(CASE WHEN rn <= {NDCG_K} THEN
                         CAST(ROUND(gain * (CASE rn {_NDCG_CASE} END), 12)
                              AS DECIMAL(20,12)) ELSE 0 END) AS dcg,
                   SUM(CASE WHEN irn <= {NDCG_K} THEN
                         CAST(ROUND(gain * (CASE irn {_NDCG_CASE} END), 12)
                              AS DECIMAL(20,12)) ELSE 0 END) AS idcg
            FROM scored GROUP BY o_custkey
        ),
        ndcg AS (
            SELECT c.c_mktsegment,
                   CAST(ROUND(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 8)
                        AS DECIMAL(12,8)) AS ndcg
            FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
            WHERE idcg > 0
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               ROUND(CAST(SUM(ndcg) AS DOUBLE) / COUNT(*), 8) AS avg_ndcg
        FROM ndcg GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("E18", "E25"),
)
def ml_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the "rank a customer's orders by price" heuristic
    against order-priority relevance, averaged per market segment —
    the standard ranking-quality readout (search/reco eval) computed
    at warehouse scale.

    Determinism engineering: the log2 discount table is PRECOMPUTED
    Python literals (both engines parse identical doubles; no libm at
    query time); each DCG term is rounded to 12 decimals and
    accumulated as an exact DECIMAL (order-independent sum); the
    dcg/idcg division and the final mean (exact decimal sum / count)
    are single correctly-rounded double ops.  Plan shape: two window
    ranks over the same (custkey) partitioning — ONE shuffle, both
    windows reuse it — then mergeable aggregates; the customer join
    broadcasts segment labels."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    gain = (5 - F.substring("o_orderpriority", 1, 1).cast("int")).alias("gain")
    w_pred = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_ideal = Window.partitionBy("o_custkey").orderBy(
        F.desc("gain"), F.asc("o_orderkey")
    )
    scored = o.select(
        "o_custkey", gain, "o_totalprice", "o_orderkey"
    ).select(
        "o_custkey", "gain",
        F.row_number().over(w_pred).alias("rn"),
        F.row_number().over(w_ideal).alias("irn"),
    )

    def disc(rank_col):
        expr = F.lit(None).cast("double")
        for r, d in NDCG_DISCOUNTS.items():
            expr = F.when(rank_col == r, F.lit(d)).otherwise(expr)
        return expr

    def term(rank_col):
        return F.when(
            rank_col <= NDCG_K,
            F.round(F.col("gain") * disc(rank_col), 12).cast("decimal(20,12)"),
        ).otherwise(F.lit(0).cast("decimal(20,12)"))

    per_cust = scored.groupBy("o_custkey").agg(
        F.sum(term(F.col("rn"))).alias("dcg"),
        F.sum(term(F.col("irn"))).alias("idcg"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ndcg = (
        per_cust.where(F.col("idcg") > 0)
        .join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .select(
            "c_mktsegment",
            F.round(
                F.col("dcg").cast("double") / F.col("idcg").cast("double"), 8
            )
            .cast("decimal(12,8)")
            .alias("ndcg"),
        )
    )
    return (
        ndcg.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("ndcg").cast("double") / F.count(F.lit(1)), 8).alias(
                "avg_ndcg"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "ml_confusion_multiclass",
    oracle="""
        WITH scored AS (
            SELECT event_type AS actual,
                   CASE WHEN value >= 200 THEN 'purchase'
                        WHEN value >= 80  THEN 'signup'
                        WHEN value >= 30  THEN 'click'
                        ELSE 'view' END AS predicted
            FROM events
            WHERE event_type <> 'error'
        )
        SELECT actual, predicted, COUNT(*) AS n,
               ROUND(CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER (PARTITION BY actual), 6) AS row_rate
        FROM scored
        GROUP BY actual, predicted
        ORDER BY actual, predicted
    """,
    tags=("E14", "E25"),
)
def ml_confusion_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class confusion matrix (value-threshold rule predicting
    the event type) with per-actual row-normalized rates — the
    multi-class completion of ml_eval_binary_classifier's 2x2 matrix.
    One mergeable groupBy over the fact table; the normalizing
    per-actual total is a window over the |classes|² aggregate, not a
    second scan.  Integer counts, one division, round 6 — bit-exact
    cross-engine."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") != "error")
    pred = (
        F.when(F.col("value") >= 200, "purchase")
        .when(F.col("value") >= 80, "signup")
        .when(F.col("value") >= 30, "click")
        .otherwise("view")
    )
    counts = (
        e.select(F.col("event_type").alias("actual"), pred.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("actual")
    return (
        counts.select(
            "actual", "predicted", "n",
            F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias("row_rate"),
        )
        .orderBy("actual", "predicted")
    )


KNN_K = 3
KNN_QUERIES = 50


@query(
    "ml_knn_classifier_eval",
    oracle=f"""
        WITH prod AS (
            SELECT q.vec_id AS query_id, q.label AS true_label,
                   c.vec_id AS cand_id, c.label AS cand_label,
                   UNNEST(q.embedding)::DOUBLE AS qx,
                   UNNEST(c.embedding)::DOUBLE AS cx
            FROM embeddings q
            JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < {KNN_QUERIES}
        ),
        scored AS (
            SELECT query_id, true_label, cand_id, cand_label,
                   ROUND(SUM(qx * cx) / (SQRT(SUM(qx * qx)) * SQRT(SUM(cx * cx))),
                         12) AS cos
            FROM prod
            GROUP BY query_id, true_label, cand_id, cand_label
        ),
        topk AS (
            SELECT query_id, true_label, cand_label
            FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY cos DESC, cand_id) AS rn
                FROM scored
            ) WHERE rn <= {KNN_K}
        ),
        votes AS (
            SELECT query_id, true_label, cand_label AS pred_label,
                   COUNT(*) AS n_votes,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY COUNT(*) DESC, cand_label) AS vr
            FROM topk GROUP BY query_id, true_label, cand_label
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_correct,
               ROUND(CAST(SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS accuracy
        FROM votes WHERE vr = 1
    """,
    tags=("E36", "E25"),
)
def ml_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classifier evaluation over the embedding space: for each
    query vector, the 3 nearest neighbors by exact cosine
    (deterministic (cos DESC, vec_id) ranking) vote on the label
    (majority, ties to the smallest label) — leave-one-out accuracy
    against the true label.  THE sanity metric for embedding quality:
    if k-NN accuracy is near-random, no downstream ANN index can help.

    Scale shape: brute-force scoring is queries × corpus with
    broadcast queries (the corpus never shuffles); top-k is a
    per-query WindowGroupLimit; voting is a |q|·k aggregate.  Swap the
    brute-force stage for sim_search_ivf postings at billion-vector
    scale — the eval harness around it is unchanged."""
    from pyspark.sql.window import Window

    from potpot_spark.operators.similarity import as_double, dot, norm

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double(F.col("embedding")).alias("emb")
    )
    # r12 (VERDICT r11 #5, guide §1.2 per-task work): hoist both norms
    # out of the pair expression.  cosine(q, c) recomputed
    # sqrt(Σq²)·sqrt(Σc²) per PAIR — 3 interpreted array folds per
    # (query, candidate) row; computing each vector's norm ONCE (50
    # query norms in the broadcast side, one corpus projection for the
    # candidate norms) leaves a single fold (the dot) in the |q|×|corpus|
    # hot loop.  Bit-identical: norm is the same sequential
    # aggregate over the same array, and dot/(q_n*c_n) is the same
    # mul+div DAG as dot/(norm(q)*norm(c)) — only WHERE the two sqrts
    # evaluate moved, not any operand or operation order.
    emb_n = emb.select("vec_id", "label", "emb", norm(F.col("emb")).alias("c_n"))
    q = emb_n.where(F.col("vec_id") < KNN_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("true_label"),
        F.col("emb").alias("q_emb"),
        F.col("c_n").alias("q_n"),
    )
    scored = (
        F.broadcast(q)
        .join(emb_n, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "true_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            # Rounded BEFORE ranking: an ulp of cross-engine float drift on
            # near-tie candidates must not flip top-k order (same
            # rounding-before-ranking discipline as NDCG/AP).
            F.round(
                dot(F.col("q_emb"), F.col("emb")) / (F.col("q_n") * F.col("c_n")),
                12,
            ).alias("cos"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    topk = scored.withColumn("rn", F.row_number().over(wk)).where(F.col("rn") <= KNN_K)
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("pred_label")
    )
    votes = (
        topk.groupBy("query_id", "true_label", F.col("cand_label").alias("pred_label"))
        .agg(F.count(F.lit(1)).alias("n_votes"))
        .withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
    )
    return votes.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(
                F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy"),
    )


GD_ITERS = 5


def _gd_oracle() -> str:
    """Unrolled coordinate-descent oracle: each step is scalar algebra
    over the same exact-decimal sufficient statistics (see the Spark
    twin's docstring).  CTEs are MATERIALIZED so step i evaluates once
    (DuckDB would otherwise inline the chain exponentially)."""
    steps = ["s0 AS MATERIALIZED (SELECT 0.0 AS w, 0.0 AS b FROM sums)"]
    for i in range(1, GD_ITERS + 1):
        steps.append(
            f"s{i} AS MATERIALIZED (SELECT "
            f"CAST((sxy - s{i - 1}.b * sx) / sxx AS DOUBLE) AS w, "
            f"CAST((sy - ((sxy - s{i - 1}.b * sx) / sxx) * sx) / n AS DOUBLE) AS b "
            f"FROM sums, s{i - 1})"
        )
    trace = " UNION ALL ".join(
        f"SELECT {i} AS iteration, ROUND(w, 6) AS w, ROUND(b, 6) AS b FROM s{i}"
        for i in range(1, GD_ITERS + 1)
    )
    return f"""
        WITH sums AS MATERIALIZED (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
                            * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
                            * CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sxy
            FROM lineitem
        ), {", ".join(steps)}
        SELECT * FROM ({trace}) ORDER BY iteration
    """


@query("ml_gradient_descent_linear", oracle=_gd_oracle(), tags=("E43", "E25"))
def ml_gradient_descent_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative model training ON the engine: 5 rounds of exact
    coordinate descent for extendedprice ~ quantity (w-step minimizes
    MSE in w given b, b-step in b given the new w), returning the
    (iteration, w, b) trace as it converges to the OLS solution.

    The distributed insight: for a linear model every descent step is
    a LINEAR FUNCTION of fixed sufficient statistics — the w-step is
    (Σxy − b·Σx)/Σx² — so the data is scanned ONCE (exact decimal
    sums, order-independent) and all N "iterations" unroll into
    scalar algebra on that one aggregate row inside the plan.  This
    is how iterative optimization should meet a 100 TB table: N
    passes collapse to one pass + N scalar updates.  Coordinate
    descent (vs raw gradient steps) needs no learning rate and
    converges geometrically on the convex quadratic; the recursion
    references each previous value once, so the unrolled expression
    grows LINEARLY.  Every step is a fixed dag of correctly-rounded
    double ops — bit-identical across engines and partitionings.
    (Models that are not sums of per-row terms — deep nets — need the
    true per-batch loop; that shape is timeseries_holt_linear's
    applyInPandas recurrence.)"""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(18,4)")
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(x * y).cast("double").alias("sxy"),
    )
    b = F.lit(0.0)
    traces = []
    for i in range(1, GD_ITERS + 1):
        w = (F.col("sxy") - b * F.col("sx")) / F.col("sxx")
        b = (F.col("sy") - w * F.col("sx")) / F.col("n")
        traces.append(
            F.struct(
                F.lit(i).alias("iteration"),
                F.round(w, 6).alias("w"),
                F.round(b, 6).alias("b"),
            )
        )
    return (
        sums.select(F.explode(F.array(*traces)).alias("t"))
        .select("t.iteration", "t.w", "t.b")
        .orderBy("iteration")
    )


@query(
    "ml_quantile_normalize",
    oracle="""
        WITH ranked AS (
            SELECT event_type, value,
                   percent_rank() OVER (PARTITION BY event_type
                                        ORDER BY value, event_id) AS q
            FROM events
        )
        SELECT event_type,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(ROUND(q, 9) AS DECIMAL(12,10))) AS DOUBLE)
                     / COUNT(*), 9) AS mean_q,
               ROUND(MIN(q), 9) AS min_q,
               ROUND(MAX(q), 9) AS max_q
        FROM ranked
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("E56", "E99"),
)
def ml_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank) normalization of a feature: map every value to
    its within-group percent_rank — the outlier-immune transform used
    when feature distributions are heavy-tailed or cross-source
    incomparable (z-scores assume a shared scale; ranks don't).
    Verified through its defining property: per group the transformed
    feature is uniform on [0,1] — mean ≈ 1/2 (exact decimal sum of
    9-dp-rounded ranks), min 0, max 1.  One window sort per group,
    deterministic (value, event_id) tie-break."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select("event_type", F.percent_rank().over(w).alias("q"))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.round(F.col("q"), 9).cast("decimal(12,10)")).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mean_q"),
            F.round(F.min("q"), 9).alias("min_q"),
            F.round(F.max("q"), 9).alias("max_q"),
        )
        .orderBy("event_type")
    )


@query(
    "pipeline_incremental_stats_merge",
    oracle="""
        WITH per_source AS (
            SELECT source,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(n_chars AS DECIMAL(18,2))
                            * CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS ss
            FROM documents GROUP BY source
        ),
        merged AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n,
                   CAST(SUM(CAST(s AS DECIMAL(28,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(ss AS DECIMAL(28,2))) AS DOUBLE) AS ss
            FROM per_source
        ),
        direct AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS s,
                   CAST(SUM(CAST(n_chars AS DECIMAL(18,2))
                            * CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS ss
            FROM documents
        )
        SELECT m.n AS merged_n, d.n AS direct_n,
               m.s AS merged_sum, d.s AS direct_sum,
               (m.n = d.n AND m.s = d.s AND m.ss = d.ss) AS merge_lossless
        FROM merged m, direct d
    """,
    tags=("E42", "E14"),
)
def pipeline_incremental_stats_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-statistics contract, proven in-engine: per-source
    (n, Σx, Σx²) trios merged into corpus totals must equal the
    directly-computed totals EXACTLY — the algebraic property that
    makes incremental pipelines possible (yesterday's stats + today's
    delta, no recompute).  Decimal accumulation is what makes it hold
    bit-for-bit: double partials would differ by summation order and
    the equality flag would be partitioning-dependent.  The emitted
    boolean is the contract; the oracle recomputes both paths and
    must agree that they agree."""
    d = load_table(spark, sf_dir, "documents")
    x = F.col("n_chars").cast("decimal(18,2)")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s"),
        F.sum(x * x).cast("double").alias("ss"),
    )
    merged = per_source.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum(F.col("s").cast("decimal(28,2)")).cast("double").alias("s"),
        F.sum(F.col("ss").cast("decimal(28,2)")).cast("double").alias("ss"),
    )
    direct = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("s"),
        F.sum(x * x).cast("double").alias("ss"),
    )
    m, dd = merged.alias("m"), direct.alias("d")
    return m.join(dd).select(
        F.col("m.n").alias("merged_n"),
        F.col("d.n").alias("direct_n"),
        F.col("m.s").alias("merged_sum"),
        F.col("d.s").alias("direct_sum"),
        (
            (F.col("m.n") == F.col("d.n"))
            & (F.col("m.s") == F.col("d.s"))
            & (F.col("m.ss") == F.col("d.ss"))
        ).alias("merge_lossless"),
    )


@query(
    "udf_pandas_grouped_agg_topk_sum",
    oracle="""
        WITH ranked AS (
            SELECT l_returnflag,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_extendedprice DESC, l_orderkey,
                                               l_linenumber) AS rn
            FROM lineitem
        )
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN rn <= 5 THEN cents ELSE 0 END) AS BIGINT)
                 AS top5_cents
        FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("E41", "E18"),
)
def udf_pandas_grouped_agg_topk_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the last Python extension point in the
    taxonomy (scalar pandas_udf / applyInPandas / mapInPandas / UDTF /
    DataSource are all elsewhere): a whole group's column arrives as
    one pandas Series and reduces to a scalar, here the sum of the
    top-5 prices per returnflag in integer cents (exact — a double
    top-5 sum would be order-sensitive; cents are not).

    The oracle computes the same thing relationally (rank window +
    conditional sum), pinning the UDAF against pure SQL.  Scale note:
    GROUPED_AGG ships each whole group through Arrow — right for
    bounded groups (here: 3 flags x fact rows is NOT bounded, so a
    production top-k-per-huge-group uses the WindowGroupLimit form the
    oracle shows; this op pins the API contract on the engine
    surface)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: this module uses
    # `from __future__ import annotations`, which stringifies type
    # hints and breaks pandas_udf's signature inference.
    def _top5(prices):
        cents = (prices * 100).round().astype("int64")
        return int(cents.nlargest(5).sum())

    top5_cents = pandas_udf(_top5, "bigint", PandasUDFType.GROUPED_AGG)

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(top5_cents(F.col("l_extendedprice")).alias("top5_cents"))
        .orderBy("l_returnflag")
    )


@query(
    "ml_average_precision",
    oracle="""
        WITH scored AS (
            SELECT event_id,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
                   value AS score
            FROM events
        ),
        ranked AS (
            SELECT label,
                   row_number() OVER (ORDER BY score DESC, event_id) AS rk,
                   SUM(label) OVER (ORDER BY score DESC, event_id
                                    ROWS UNBOUNDED PRECEDING) AS tp_at_k
            FROM scored
        )
        SELECT CAST(SUM(label) AS BIGINT) AS n_pos,
               ROUND(CAST(SUM(CASE WHEN label = 1 THEN
                         CAST(ROUND(CAST(tp_at_k AS DOUBLE) / rk, 12)
                              AS DECIMAL(16,12)) ELSE 0 END) AS DOUBLE)
                     / SUM(label), 9) AS average_precision
        FROM ranked
    """,
    tags=("E25", "E18"),
)
def ml_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision (area under the precision-recall
    curve, step interpolation): AP = mean over positives of
    precision@rank — the ranking metric that, unlike AUC-ROC
    (ml_eval_auc_rank), stays informative under heavy class imbalance
    (the regime every retrieval/filtering pipeline lives in).

    One global window sort by (score DESC, event_id) yields both the
    rank and the cumulative true-positive count; precision@k = tp/k
    is a single integer division per positive, rounded to 12 dp and
    decimal-summed (order-free), one final division.  At 100 TB the
    global sort is a range-partitioned sort + two-pass prefix sum —
    same results by construction.  Deterministic tie-break makes AP
    exactly reproducible (ties in score are resolved by event_id on
    both engines)."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        F.col("value").alias("score"),
    )
    w = Window.orderBy(F.desc("score"), F.asc("event_id"))
    ranked = scored.select(
        "label",
        F.row_number().over(w).alias("rk"),
        F.sum("label").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("tp_at_k"),
    )
    return ranked.agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        F.round(
            F.sum(
                F.when(
                    F.col("label") == 1,
                    F.round(F.col("tp_at_k").cast("double") / F.col("rk"), 12).cast(
                        "decimal(16,12)"
                    ),
                ).otherwise(F.lit(0).cast("decimal(16,12)"))
            ).cast("double")
            / F.sum("label"),
            9,
        ).alias("average_precision"),
    )


ISO_BIN_WIDTH = 50.0
ISO_N_BINS = 10


@query(
    "ml_isotonic_calibration_pav",
    oracle=f"""
        WITH binned AS (
            SELECT LEAST(CAST(FLOOR(value / {ISO_BIN_WIDTH}) AS INT), {ISO_N_BINS - 1}) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
            FROM events GROUP BY 1
        ),
        pref AS (
            SELECT bin, n, n_pos,
                   SUM(n) OVER (ORDER BY bin) AS w_cum,
                   SUM(n_pos) OVER (ORDER BY bin) AS s_cum
            FROM binned
        ),
        seg AS (
            SELECT j.bin AS jb, k.bin AS kb,
                   CAST(k.s_cum - j.s_cum + j.n_pos AS DOUBLE)
                   / CAST(k.w_cum - j.w_cum + j.n AS DOUBLE) AS m
            FROM pref j JOIN pref k ON j.bin <= k.bin
        ),
        lower_env AS (
            SELECT p.bin, s.jb, MIN(s.m) AS mn
            FROM pref p JOIN seg s ON s.jb <= p.bin AND s.kb >= p.bin
            GROUP BY p.bin, s.jb
        ),
        fit AS (
            SELECT bin, MAX(mn) AS calibrated_rate FROM lower_env GROUP BY bin
        )
        SELECT b.bin, b.n, b.n_pos,
               CAST(b.n_pos AS DOUBLE) / b.n AS raw_rate,
               f.calibrated_rate
        FROM binned b JOIN fit f USING (bin)
    """,
    tags=("E25",),
)
def ml_isotonic_calibration_pav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic calibration via pool-adjacent-violators (PAV): take the
    per-bin observed purchase rates (the reliability diagram of
    ml_calibration_bins) and produce the best monotone fit —
    non-parametric score calibration, the standard alternative to
    Platt scaling when the score-probability relation is monotone but
    not sigmoid.

    Split of labor at scale: the DATA pass is the mergeable bin
    aggregate (any corpus size); PAV itself is inherently sequential
    over the ~bins rows, so it runs in applyInPandas over the
    aggregate — the same honest pattern as the EWMA/Holt recurrences
    (sequential math gets a sequential worker, but only ever over
    aggregate-sized state).  EXACT SQL oracle despite the recursion:
    isotonic regression has the closed minimax characterization
    fitted[i] = max_{{j<=i}} min_{{k>=i}} mean(y[j..k]), an O(bins^3)
    join cascade that is trivial over aggregate-sized state and
    bit-identical to PAV — every candidate mean is one IEEE division
    of exact integer sums, and rounding is monotone, so the
    max-min lands on the same double as PAV's pooled s/w.
    tests/test_properties.py additionally pins the defining
    properties: output monotone non-decreasing, weighted mean
    preserved exactly, and each pooled run constant."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    binned = (
        e.select(
            F.least(
                F.floor(F.col("value") / ISO_BIN_WIDTH), F.lit(ISO_N_BINS - 1)
            )
            .cast("int")
            .alias("bin"),
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("label").cast("bigint").alias("n_pos"),
        )
    )

    def pav(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bin").reset_index(drop=True)
        # stack of (weight, weighted-sum) blocks; merge while violating
        blocks: list[list[float]] = []  # [w, s, count_bins]
        for _, row in pdf.iterrows():
            w, s = float(row["n"]), float(row["n_pos"])
            blocks.append([w, s, 1])
            while len(blocks) > 1 and (
                blocks[-2][1] / blocks[-2][0] > blocks[-1][1] / blocks[-1][0]
            ):
                w2, s2, c2 = blocks.pop()
                blocks[-1][0] += w2
                blocks[-1][1] += s2
                blocks[-1][2] += c2
        fitted: list[float] = []
        for w, s, c in blocks:
            fitted.extend([s / w] * int(c))
        pdf["raw_rate"] = pdf["n_pos"] / pdf["n"]
        pdf["calibrated_rate"] = fitted
        return pdf[["bin", "n", "n_pos", "raw_rate", "calibrated_rate"]]

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("bin", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("n_pos", T.LongType()),
            T.StructField("raw_rate", T.DoubleType()),
            T.StructField("calibrated_rate", T.DoubleType()),
        ]
    )
    return (
        binned.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(pav, schema=schema)
        .orderBy("bin")
    )


# --- PCA top component via power iteration -------------------------------

PCA_ITERS = 24


def _pca_oracle_sql() -> str:
    """Unrolled power iteration over the (oracle-exact) covariance
    matrix: every float reduction is an ordered left fold, so the
    DuckDB twin performs the IDENTICAL IEEE operation sequence as the
    driver-side Python loop and the eigenvector matches bit-for-bit
    (same discipline as the LSH oracle's list_reduce folds)."""
    from potpot_spark.operators.similarity import COV_DIMS

    d = COV_DIMS

    def fold(products: str) -> str:
        return (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {products}), (a, x) -> a + x)"
        )

    sq = fold("list_transform(mv, x -> x * x)")
    parts = [
        f"""
        WITH pos AS (
            SELECT vec_id, CAST(unnest(range(1, {d} + 1)) AS INT) AS i
            FROM embeddings
        ),
        vals AS (
            SELECT p.vec_id, p.i, CAST(e.embedding[p.i] AS DOUBLE) AS x
            FROM pos p JOIN embeddings e ON e.vec_id = p.vec_id
        ),
        cpairs AS (
            SELECT a.i AS di, b.i AS dj, COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(a.x, 9) AS DECIMAL(14,9))) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(ROUND(b.x, 9) AS DECIMAL(14,9))) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(ROUND(a.x * b.x, 12) AS DECIMAL(18,12))) AS DOUBLE) AS sxy
            FROM vals a JOIN vals b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        ),
        cov_ut AS (
            SELECT di, dj, ROUND((sxy - sx * sy / n) / (n - 1), 9) AS cov FROM cpairs
        ),
        fullm AS (
            SELECT di AS i, dj AS j, cov FROM cov_ut
            UNION ALL
            SELECT dj, di, cov FROM cov_ut WHERE di < dj
        ),
        rows_m AS MATERIALIZED (
            SELECT i, list(cov ORDER BY j) AS r FROM fullm GROUP BY i
        ),
        v0 AS (SELECT [{', '.join(['CAST(1 AS DOUBLE)'] + ['0'] * (d - 1))}] AS v)"""
    ]
    mv_expr = f"list_transform(range({d}), j -> m.r[j+1] * p.v[j+1])"
    for t in range(1, PCA_ITERS + 1):
        parts.append(
            f"""
        mv{t} AS (
            SELECT m.i, {fold(mv_expr)} AS x
            FROM rows_m m CROSS JOIN v{t - 1} p
        ),
        ml{t} AS (SELECT list(x ORDER BY i) AS mv FROM mv{t}),
        v{t} AS MATERIALIZED (SELECT list_transform(mv, x -> x / sqrt({sq})) AS v FROM ml{t})"""
        )
    parts.append(
        f"""
        mvf AS (
            SELECT m.i, {fold(mv_expr)} AS x
            FROM rows_m m CROSS JOIN v{PCA_ITERS} p
        ),
        lam AS (
            SELECT {fold(f"list_transform(range({d}), j -> p.v[j+1] * mv[j+1])")} AS l
            FROM (SELECT list(x ORDER BY i) AS mv FROM mvf) CROSS JOIN v{PCA_ITERS} p
        )
        SELECT CAST(t.i AS INT) AS dim,
               ROUND(p.v[t.i], 9) AS loading,
               ROUND(lam.l, 9) AS eigenvalue,
               {PCA_ITERS} AS n_iters
        FROM (SELECT unnest(range(1, {d} + 1)) AS i) t
        CROSS JOIN v{PCA_ITERS} p CROSS JOIN lam"""
    )
    return ",".join(parts)


@query("ml_pca_power_iteration", oracle=_pca_oracle_sql(), tags=("E36", "E43"))
def ml_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance by POWER
    ITERATION — the whitening/PCA primitive, and the fourth iterative
    kernel (after CC, PageRank, k-core), this one running over
    AGGREGATE-sized state: the data pass is the distributed one-pass
    covariance build (embedding_covariance_matrix, oracle-exact
    9-dp-rounded cells); the d x d algebra then runs driver-side in
    plain left-to-right Python floats — 24 matvec+normalize rounds
    from e_0 — which is the declared correct split of labor at 100 TB
    (one scan of the corpus, O(d^2) local math; the 'collect' ships 36
    aggregate cells, not data).

    EXACT oracle despite the iteration: the DuckDB twin unrolls the
    same 24 rounds with list_reduce left folds, so every intermediate
    double — and the final eigenvector and Rayleigh eigenvalue — is
    bit-identical (rounded to 9 dp only at the output edge)."""
    import math

    from potpot_spark.operators.similarity import (
        COV_DIMS,
        embedding_covariance_matrix,
    )

    d = COV_DIMS
    cells = embedding_covariance_matrix(spark, sf_dir).collect()
    C = [[0.0] * d for _ in range(d)]
    for r in cells:
        C[r.di - 1][r.dj - 1] = r.cov
        C[r.dj - 1][r.di - 1] = r.cov

    def matvec(v):
        out = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc = acc + C[i][j] * v[j]
            out.append(acc)
        return out

    v = [1.0] + [0.0] * (d - 1)
    for _ in range(PCA_ITERS):
        mv = matvec(v)
        acc = 0.0
        for x in mv:
            acc = acc + x * x
        nrm = math.sqrt(acc)
        v = [x / nrm for x in mv]
    mvf = matvec(v)
    acc = 0.0
    for i in range(d):
        acc = acc + v[i] * mvf[i]
    lam = acc
    rows = [
        (i + 1, round(v[i], 9), round(lam, 9), PCA_ITERS) for i in range(d)
    ]
    return spark.createDataFrame(
        rows, "dim int, loading double, eigenvalue double, n_iters int"
    )


# --- decision-tree split evaluation --------------------------------------

GINI_THRESHOLDS = tuple(float(t) for t in range(50, 451, 50))


@query(
    "ml_decision_split_gini",
    oracle=f"""
        WITH labeled AS (
            SELECT value,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
            FROM events
        ),
        th AS (SELECT unnest([{', '.join(str(t) for t in GINI_THRESHOLDS)}]) AS threshold),
        split AS (
            SELECT t.threshold,
                   CAST(SUM(CASE WHEN l.value < t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
                   CAST(SUM(CASE WHEN l.value < t.threshold THEN l.label ELSE 0 END) AS BIGINT) AS pos_l,
                   CAST(SUM(CASE WHEN l.value >= t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
                   CAST(SUM(CASE WHEN l.value >= t.threshold THEN l.label ELSE 0 END) AS BIGINT) AS pos_r
            FROM th t CROSS JOIN labeled l
            GROUP BY t.threshold
        ),
        scored AS (
            SELECT threshold, n_l, n_r,
                   (CAST(n_l * n_l - pos_l * pos_l - (n_l - pos_l) * (n_l - pos_l) AS DOUBLE) / n_l
                    + CAST(n_r * n_r - pos_r * pos_r - (n_r - pos_r) * (n_r - pos_r) AS DOUBLE) / n_r)
                   / (n_l + n_r) AS weighted_gini
            FROM split WHERE n_l > 0 AND n_r > 0
        )
        SELECT threshold, n_l, n_r, weighted_gini,
               weighted_gini = MIN(weighted_gini) OVER () AS is_best_split
        FROM scored
    """,
    tags=("E25", "E42"),
)
def ml_decision_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-tree SPLIT EVALUATION: weighted Gini impurity of the
    purchase label for each candidate threshold on value — the inner
    loop of tree/GBM training, expressed as ONE conditional aggregate
    pass (9 thresholds = 9x4 aggregate buffers, map-side combined; no
    data pass per candidate, which is the entire scale story of
    histogram-based tree learners).

    Exactness: with integer counts, weighted Gini is the exact
    rational [(nL^2-posL^2-negL^2)/nL + (same for R)] / N — every
    numerator is an exact BIGINT and the two divisions are identical
    IEEE ops, so scores and the argmin flag match bit-for-bit (no
    epsilon comparisons).  Degenerate one-sided splits are excluded
    on both sides."""
    e = load_table(spark, sf_dir, "events")
    labeled = e.select(
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    th = F.explode(F.array(*[F.lit(t) for t in GINI_THRESHOLDS])).alias("threshold")
    split = (
        labeled.select("value", "label", th)
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("value") < F.col("threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_l"),
            F.sum(F.when(F.col("value") < F.col("threshold"), F.col("label")).otherwise(0))
            .cast("bigint")
            .alias("pos_l"),
            F.sum(F.when(F.col("value") >= F.col("threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_r"),
            F.sum(F.when(F.col("value") >= F.col("threshold"), F.col("label")).otherwise(0))
            .cast("bigint")
            .alias("pos_r"),
        )
        .where((F.col("n_l") > 0) & (F.col("n_r") > 0))
    )
    neg_l = F.col("n_l") - F.col("pos_l")
    neg_r = F.col("n_r") - F.col("pos_r")
    wg = (
        (
            (F.col("n_l") * F.col("n_l") - F.col("pos_l") * F.col("pos_l") - neg_l * neg_l)
            .cast("double") / F.col("n_l")
            + (F.col("n_r") * F.col("n_r") - F.col("pos_r") * F.col("pos_r") - neg_r * neg_r)
            .cast("double") / F.col("n_r")
        )
        / (F.col("n_l") + F.col("n_r"))
    )
    scored = split.select("threshold", "n_l", "n_r", wg.alias("weighted_gini"))
    w = Window.partitionBy()
    return scored.select(
        "threshold", "n_l", "n_r", "weighted_gini",
        (F.col("weighted_gini") == F.min("weighted_gini").over(w)).alias("is_best_split"),
    )


DECAY_BASE = 0.9
DECAY_SCALE = 1 << 30


@query(
    "ml_time_decay_engagement",
    oracle=f"""
        WITH anchored AS (
            SELECT user_id, value,
                   date_diff('day', date_trunc('day', CAST(ts AS TIMESTAMP)),
                             MAX(date_trunc('day', CAST(ts AS TIMESTAMP))) OVER ())
                       AS age_days
            FROM events
        ),
        weighted AS (
            SELECT user_id,
                   CAST(value AS DECIMAL(18,4))
                     * CAST(FLOOR(POW({DECAY_BASE}, age_days) * {DECAY_SCALE})
                            AS BIGINT) AS contrib
            FROM anchored
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(ROUND(SUM(contrib), 0) AS DOUBLE) / {DECAY_SCALE}
                   AS decay_score
        FROM weighted GROUP BY user_id
    """,
    tags=("E25", "E65"),
)
def ml_time_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential TIME-DECAY engagement score per user:
    sum of value * {DECAY_BASE}^age_days anchored at the dataset's max
    day — the recency-weighted feature every churn/propensity model
    uses (yesterday counts ~{DECAY_BASE}x today, last quarter ~0.01x).

    Fixed-point discipline on the decay weights: w =
    FLOOR({DECAY_BASE}^age * 2^30) is an exact BIGINT per distinct
    age (pow of an integer exponent — IEEE-identical cross-engine,
    floored at 2^30 grain like the perplexity log weights), each
    contribution is exact DECIMAL(18,4) x BIGINT, and the per-user
    sum rounds to whole units before the double cast (the ANOVA
    cast rule).  One window max anchors the clock; one grouped sum
    per user — fully mergeable."""
    e = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy()
    anchored = e.select(
        "user_id",
        "value",
        F.datediff(
            F.max(F.date_trunc("day", F.col("ts"))).over(w_all),
            F.date_trunc("day", F.col("ts")),
        ).alias("age_days"),
    )
    weight = F.floor(F.pow(F.lit(DECAY_BASE), F.col("age_days")) * DECAY_SCALE).cast(
        "bigint"
    )
    weighted = anchored.select(
        "user_id",
        (F.col("value").cast("decimal(18,4)") * weight).alias("contrib"),
    )
    return weighted.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.round(F.sum("contrib"), 0).cast("double") / F.lit(DECAY_SCALE)).alias(
            "decay_score"
        ),
    )


BEHAVIOR_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "ml_behavior_embedding",
    oracle=f"""
        WITH counts AS (
            SELECT user_id,
                   {', '.join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS c_{t}" for t in BEHAVIOR_TYPES)}
            FROM events GROUP BY user_id
        )
        SELECT user_id,
               {', '.join(f"c_{t}" for t in BEHAVIOR_TYPES)},
               {', '.join(f"CAST(c_{t} AS DOUBLE) / SQRT({' + '.join(f'c_{u} * c_{u}' for u in BEHAVIOR_TYPES)}) AS e_{t}" for t in BEHAVIOR_TYPES)}
        FROM counts
    """,
    tags=("E25", "E36"),
)
def ml_behavior_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral count-vector embedding per user: the per-event-type
    activity counts, L2-normalized — the zero-model user
    representation that feeds clustering/segmentation and the cosine
    machinery (sim_search_*) before any learned encoder exists.
    One conditional-aggregate pass (|types| mergeable buffers);
    normalization divides exact integers by the sqrt of an exact
    integer sum of squares — single identical IEEE ops, bit-exact
    cross-engine.  Raw counts ship next to the embedding so downstream
    can re-weight without a second scan."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"c_{t}")
            for t in BEHAVIOR_TYPES
        ]
    )
    norm = F.sqrt(
        sum((F.col(f"c_{t}") * F.col(f"c_{t}") for t in BEHAVIOR_TYPES), F.lit(0))
    )
    return counts.select(
        "user_id",
        *[F.col(f"c_{t}") for t in BEHAVIOR_TYPES],
        *[
            (F.col(f"c_{t}").cast("double") / norm).alias(f"e_{t}")
            for t in BEHAVIOR_TYPES
        ],
    )


@query(
    "ml_lift_gain_deciles",
    oracle="""
        WITH scored AS (
            SELECT value AS score,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
                   event_id
            FROM events
        ),
        ranked AS (
            SELECT score, label,
                   ntile(10) OVER (ORDER BY score DESC, event_id) AS decile
            FROM scored
        ),
        per_decile AS (
            SELECT decile,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(label) AS BIGINT) AS n_pos
            FROM ranked GROUP BY decile
        )
        SELECT decile, n, n_pos,
               CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
               ROUND(CAST(SUM(n_pos) OVER w AS DOUBLE)
                     / SUM(n_pos) OVER (), 6) AS cum_gain,
               ROUND((CAST(SUM(n_pos) OVER w AS DOUBLE) / SUM(n_pos) OVER ())
                     / (CAST(SUM(n) OVER w AS DOUBLE) / SUM(n) OVER ()), 6)
                   AS cum_lift
        FROM per_decile
        WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    """,
    tags=("E25", "E18"),
)
def ml_lift_gain_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIFT / GAINS deciles (the campaign-targeting eval classic,
    completing the eval battery next to AUC, NDCG, calibration and
    average precision): rank by score (value as the model-score proxy)
    descending, cut into 10 equal bins, report per-decile positives
    plus cumulative gain (share of all positives captured by deciles
    1..k) and cumulative lift (gain over the random baseline k/10).
    Determinism: ntile ties break on (score DESC, event_id) —
    identical bin assignment cross-engine; gains/lifts are ratios of
    exact integers rounded at the display edge.  Scale note: the
    global ntile sort is the one O(N log N) step — at 100 TB the
    histogram-decile rewrite (quantile cut points from
    approx_percentile, then a map-side bin) replaces the sort, same
    downstream math."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        "event_id",
    )
    wr = Window.orderBy(F.col("score").desc(), F.col("event_id"))
    ranked = scored.withColumn("decile", F.ntile(10).over(wr))
    per_decile = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("n_pos"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.partitionBy()
    return per_decile.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n_pos").over(wc).cast("bigint").alias("cum_pos"),
        F.round(
            F.sum("n_pos").over(wc).cast("double") / F.sum("n_pos").over(wa), 6
        ).alias("cum_gain"),
        F.round(
            (F.sum("n_pos").over(wc).cast("double") / F.sum("n_pos").over(wa))
            / (F.sum("n").over(wc).cast("double") / F.sum("n").over(wa)),
            6,
        ).alias("cum_lift"),
    )


PSI_BINS = 10
PSI_BIN_WIDTH = 50.0
PSI_LOG_SCALE = 1 << 20
PSI_P_SCALE = 1_000_000


@query(
    "ml_psi_population_stability",
    oracle=f"""
        WITH binned AS (
            SELECT LEAST(CAST(FLOOR(value / {PSI_BIN_WIDTH}) AS INT), {PSI_BINS - 1}) AS bin,
                   CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16' THEN 'ref'
                        ELSE 'cur' END AS period
            FROM events
        ),
        counts AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT) + 1 AS c_ref,
                   CAST(SUM(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT) + 1 AS c_cur
            FROM binned GROUP BY bin
        ),
        tots AS (
            SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
                   CAST(SUM(c_cur) AS BIGINT) AS n_cur
            FROM counts
        ),
        terms AS (
            SELECT c.bin,
                   CAST(FLOOR(CAST(c.c_ref AS DOUBLE) / t.n_ref * {PSI_P_SCALE}) AS BIGINT) AS pu,
                   CAST(FLOOR(CAST(c.c_cur AS DOUBLE) / t.n_cur * {PSI_P_SCALE}) AS BIGINT) AS qu,
                   CAST(FLOOR(ln((CAST(c.c_ref AS DOUBLE) / t.n_ref)
                                 / (CAST(c.c_cur AS DOUBLE) / t.n_cur)) * {PSI_LOG_SCALE})
                        AS BIGINT) AS lt
            FROM counts c CROSS JOIN tots t
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM((pu - qu) * lt) AS DOUBLE)
                 / ({PSI_P_SCALE}.0 * {PSI_LOG_SCALE}) AS psi
        FROM terms
    """,
    tags=("E25", "E42"),
)
def ml_psi_population_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the month (ref = before Jan 16, cur = after): PSI =
    Σ (p_i − q_i)·ln(p_i/q_i) over value bins with add-one smoothing —
    THE model-monitoring drift score (rule of thumb: <0.1 stable,
    >0.25 retrain), completing the drift battery next to KS and
    total-variation.

    Fixed-point discipline with FLOOR only (no ROUND — floor of an
    identical double has no half-way hazard, the HHI lesson): micro-
    probabilities FLOOR(p·10^6) and log terms FLOOR(ln(p/q)·2^20) are
    exact BIGINTs, their products sum exactly, one final division.
    Quantization bias ~10^-6 — documented semantics.  One grouped
    pass builds both histograms (conditional aggregation), the PSI is
    bin-scale algebra."""
    e = load_table(spark, sf_dir, "events")
    binned = e.select(
        F.least(
            F.floor(F.col("value") / PSI_BIN_WIDTH), F.lit(PSI_BINS - 1)
        ).cast("int").alias("bin"),
        F.when(F.col("ts") < F.lit("2024-01-16").cast("timestamp"), "ref")
        .otherwise("cur")
        .alias("period"),
    )
    counts = binned.groupBy("bin").agg(
        (F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)) + 1)
        .cast("bigint")
        .alias("c_ref"),
        (F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)) + 1)
        .cast("bigint")
        .alias("c_cur"),
    )
    tots = counts.agg(
        F.sum("c_ref").cast("bigint").alias("n_ref"),
        F.sum("c_cur").cast("bigint").alias("n_cur"),
    )
    p = F.col("c_ref").cast("double") / F.col("n_ref")
    q = F.col("c_cur").cast("double") / F.col("n_cur")
    terms = counts.crossJoin(F.broadcast(tots)).select(
        F.floor(p * PSI_P_SCALE).cast("bigint").alias("pu"),
        F.floor(q * PSI_P_SCALE).cast("bigint").alias("qu"),
        F.floor(F.log(p / q) * PSI_LOG_SCALE).cast("bigint").alias("lt"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        (
            F.sum((F.col("pu") - F.col("qu")) * F.col("lt")).cast("double")
            / (float(PSI_P_SCALE) * PSI_LOG_SCALE)
        ).alias("psi"),
    )


BRIER_P_DENOM = 600.0   # deterministic score→probability map: p = value/600, clipped
BRIER_Q = 10**12        # fixed-point grain for per-bin decomposition terms


@query(
    "ml_brier_decomposition",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                   CAST(LEAST(FLOOR(value / {BRIER_P_DENOM} * 1000), 1000) AS BIGINT)
                       AS p_milli
            FROM events
        ),
        g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM((p_milli - 1000 * y) * (p_milli - 1000 * y)) AS BIGINT)
                       AS sq
            FROM scored
        ),
        bins AS (
            SELECT LEAST(p_milli // 100, 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS nk,
                   CAST(SUM(p_milli) AS BIGINT) AS spk,
                   CAST(SUM(y) AS BIGINT) AS syk
            FROM scored GROUP BY bin
        ),
        terms AS (
            SELECT b.bin,
                   CAST(FLOOR(b.nk * ((CAST(b.spk AS DOUBLE) / (1000 * b.nk)
                                       - CAST(b.syk AS DOUBLE) / b.nk)
                                      * (CAST(b.spk AS DOUBLE) / (1000 * b.nk)
                                         - CAST(b.syk AS DOUBLE) / b.nk))
                              / g.n * {BRIER_Q}) AS BIGINT) AS rel_u,
                   CAST(FLOOR(b.nk * ((CAST(b.syk AS DOUBLE) / b.nk
                                       - CAST(g.sy AS DOUBLE) / g.n)
                                      * (CAST(b.syk AS DOUBLE) / b.nk
                                         - CAST(g.sy AS DOUBLE) / g.n))
                              / g.n * {BRIER_Q}) AS BIGINT) AS res_u
            FROM bins b CROSS JOIN g
        )
        SELECT g.n,
               CAST(g.sq AS DOUBLE) / (1000000.0 * g.n) AS brier,
               CAST((SELECT SUM(rel_u) FROM terms) AS BIGINT) AS reliability_u,
               CAST((SELECT SUM(res_u) FROM terms) AS BIGINT) AS resolution_u,
               CAST(g.sy AS DOUBLE) * (g.n - g.sy) / (CAST(g.n AS DOUBLE) * g.n)
                   AS uncertainty
        FROM g
    """,
    tags=("E166", "E152"),
)
def ml_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MURPHY DECOMPOSITION of the Brier score — reliability (how far
    bin-average forecasts sit from observed rates; lower is better),
    resolution (how much bins separate from the base rate; higher is
    better), uncertainty (base-rate entropy) — the diagnosis layer
    over `ml_calibration_bins`: a bad Brier from miscalibration is
    fixable by recalibration, one from no-resolution is not.

    Determinism: forecasts quantize once to integer milli-probs
    (FLOOR(value/600·1000)), so the Brier numerator Σ(p−1000y)² is an
    exact BIGINT; per-bin reliability/resolution terms FLOOR-quantize
    at 10^12 from identical division chains and sum exactly over the
    10 bins (no cross-engine double summation order anywhere).  Two
    grouped passes over the event stream + an O(bins) rollup."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.least(
            F.floor(F.col("value") / BRIER_P_DENOM * 1000), F.lit(1000)
        )
        .cast("bigint")
        .alias("p_milli"),
    )
    g = scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(
            (F.col("p_milli") - 1000 * F.col("y"))
            * (F.col("p_milli") - 1000 * F.col("y"))
        )
        .cast("bigint")
        .alias("sq"),
    )
    bins = scored.groupBy(
        F.least(F.expr("p_milli div 100"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum("p_milli").cast("bigint").alias("spk"),
        F.sum("y").cast("bigint").alias("syk"),
    )
    joined = bins.crossJoin(F.broadcast(g))
    dp = F.col("spk").cast("double") / (1000 * F.col("nk")) - F.col(
        "syk"
    ).cast("double") / F.col("nk")
    do = F.col("syk").cast("double") / F.col("nk") - F.col("sy").cast(
        "double"
    ) / F.col("n")
    terms = joined.select(
        F.floor(F.col("nk") * (dp * dp) / F.col("n") * BRIER_Q)
        .cast("bigint")
        .alias("rel_u"),
        F.floor(F.col("nk") * (do * do) / F.col("n") * BRIER_Q)
        .cast("bigint")
        .alias("res_u"),
    ).agg(
        F.sum("rel_u").cast("bigint").alias("reliability_u"),
        F.sum("res_u").cast("bigint").alias("resolution_u"),
    )
    return g.crossJoin(terms).select(
        "n",
        (F.col("sq").cast("double") / (1000000.0 * F.col("n"))).alias("brier"),
        "reliability_u",
        "resolution_u",
        (
            F.col("sy").cast("double")
            * (F.col("n") - F.col("sy"))
            / (F.col("n").cast("double") * F.col("n"))
        ).alias("uncertainty"),
    )


@query(
    "ml_expected_calibration_error",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                   CAST(LEAST(FLOOR(value / {BRIER_P_DENOM} * 1000), 1000) AS BIGINT)
                       AS p_milli
            FROM events
        ),
        g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored),
        bins AS (
            SELECT LEAST(p_milli // 100, 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS nk,
                   CAST(SUM(p_milli) AS BIGINT) AS spk,
                   CAST(SUM(y) AS BIGINT) AS syk
            FROM scored GROUP BY bin
        ),
        terms AS (
            SELECT b.bin, b.nk,
                   CAST(FLOOR(b.nk * abs(CAST(b.spk AS DOUBLE) / (1000 * b.nk)
                                         - CAST(b.syk AS DOUBLE) / b.nk)
                              / g.n * {BRIER_Q}) AS BIGINT) AS ece_term_u,
                   CASE WHEN 1000 * b.syk > b.spk THEN 1 ELSE 0 END AS underconfident
            FROM bins b CROSS JOIN g
        )
        SELECT CAST((SELECT MAX(n) FROM g) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM(ece_term_u) AS BIGINT) AS ece_u,
               CAST(SUM(CASE WHEN underconfident = 1 THEN nk ELSE 0 END) AS BIGINT)
                   AS n_underconfident_mass
        FROM terms
    """,
    tags=("E166", "E259"),
)
def ml_expected_calibration_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPECTED CALIBRATION ERROR (ECE): Σ (n_k/N)·|p̄_k − ō_k| over
    the same 10 forecast bins as the Brier decomposition — the single
    headline number modern model cards report for calibration, plus
    the mass of underconfident bins (observed rate above forecast —
    the direction matters for downstream thresholding).

    Same discipline as `ml_brier_decomposition`: milli-prob integer
    forecasts, per-bin terms FLOOR-quantized at 10^12 from identical
    division chains, exact BIGINT summation over bins — the two
    calibration queries reconcile bin-for-bin."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.least(F.floor(F.col("value") / BRIER_P_DENOM * 1000), F.lit(1000))
        .cast("bigint")
        .alias("p_milli"),
    )
    g = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    bins = scored.groupBy(
        F.least(F.expr("p_milli div 100"), F.lit(9)).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("nk"),
        F.sum("p_milli").cast("bigint").alias("spk"),
        F.sum("y").cast("bigint").alias("syk"),
    )
    joined = bins.crossJoin(F.broadcast(g))
    gap = F.abs(
        F.col("spk").cast("double") / (1000 * F.col("nk"))
        - F.col("syk").cast("double") / F.col("nk")
    )
    terms = joined.select(
        "nk",
        F.floor(F.col("nk") * gap / F.col("n") * BRIER_Q)
        .cast("bigint")
        .alias("ece_term_u"),
        F.when(1000 * F.col("syk") > F.col("spk"), 1).otherwise(0).alias("uc"),
    )
    summed = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("ece_term_u").cast("bigint").alias("ece_u"),
        F.sum(F.when(F.col("uc") == 1, F.col("nk")).otherwise(0))
        .cast("bigint")
        .alias("n_underconfident_mass"),
    )
    return F.broadcast(g).crossJoin(summed).select(
        "n", "n_bins", "ece_u", "n_underconfident_mass"
    )


@query(
    "udf_pandas_iterator_scalar",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(sqrt(l_quantity * 1000000.0)) AS BIGINT))
                    AS BIGINT) AS score_sum
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
    tags=("E163", "E154"),
)
def udf_pandas_iterator_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-form scalar pandas UDF (``Iterator[pd.Series] ->
    Iterator[pd.Series]``): the batch loop lives inside ONE udf call
    per partition, so expensive per-worker setup — loading a model,
    opening a tokenizer, warming a cache — runs once per partition
    instead of once per Arrow batch.  This is the production shape for
    model-scoring UDFs; the sibling `udf_pandas_scalar_feature` shows
    the per-batch form.

    The "model" here is a deterministic integer kernel
    (FLOOR(sqrt(q·10^6))) so the oracle can replay it exactly; the
    simulated setup cost is paid once per partition by construction
    (asserted by the iterator protocol itself).  Arrow-vectorized,
    no row-at-a-time Python; the aggregate downstream is a normal
    mergeable groupBy."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def score(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        model_scale = 1000000.0  # "loaded" once per partition
        for s in batches:
            yield pd.Series(
                np.floor(np.sqrt(s.to_numpy() * model_scale)).astype("int64")
            )

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    return (
        li.select("l_returnflag", score("l_quantity").alias("sc"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("sc").cast("bigint").alias("score_sum"),
        )
        .orderBy("l_returnflag")
    )


F1_THRESHOLDS = list(range(0, 1001, 50))  # milli-prob grid, 21 points


@query(
    "ml_threshold_sweep_f1",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                   CAST(LEAST(FLOOR(value / {BRIER_P_DENOM} * 1000), 1000) AS BIGINT)
                       AS p_milli
            FROM events
        ),
        sweep AS (
            SELECT t.thr,
                   CAST(SUM(CASE WHEN p_milli >= t.thr AND y = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN p_milli >= t.thr AND y = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN p_milli < t.thr AND y = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS fn
            FROM scored CROSS JOIN (SELECT unnest({F1_THRESHOLDS}) AS thr) t
            GROUP BY t.thr
        )
        SELECT thr, tp, fp, fn,
               ROUND(CASE WHEN tp + fp > 0
                          THEN CAST(tp AS DOUBLE) / (tp + fp) END, 6) AS precision,
               ROUND(CASE WHEN tp + fn > 0
                          THEN CAST(tp AS DOUBLE) / (tp + fn) END, 6) AS recall,
               ROUND(CASE WHEN 2 * tp + fp + fn > 0
                          THEN 2.0 * tp / (2 * tp + fp + fn) END, 6) AS f1
        FROM sweep
        ORDER BY thr
    """,
    tags=("E152", "E158"),
)
def ml_threshold_sweep_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPERATING-POINT SWEEP: precision / recall / F1 at 21 decision
    thresholds over the milli-prob forecasts (same deterministic
    score→probability map as the calibration family) — the table a
    practitioner reads to PICK the threshold, complementing the
    threshold-free AUC/AP rank metrics.

    Confusion counts are exact BIGINTs per threshold (one conditional
    aggregate over the scored stream × a 21-row broadcast grid — the
    corpus is read ONCE, not per threshold); F1 = 2TP/(2TP+FP+FN) is
    a single 6-dp division with explicit empty-cell NULLs.  At 100 TB
    this is the same one-pass shape: the grid fan-out happens
    map-side before the partial aggregate."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.least(F.floor(F.col("value") / BRIER_P_DENOM * 1000), F.lit(1000))
        .cast("bigint")
        .alias("p_milli"),
    )
    grid = spark.range(0, 1001, 50).select(F.col("id").cast("bigint").alias("thr"))
    sweep = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("thr")
        .agg(
            F.sum(
                F.when((F.col("p_milli") >= F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("tp"),
            F.sum(
                F.when((F.col("p_milli") >= F.col("thr")) & (F.col("y") == 0), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when((F.col("p_milli") < F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    return sweep.select(
        "thr",
        "tp",
        "fp",
        "fn",
        F.round(
            F.when(F.col("tp") + F.col("fp") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fp"))),
            6,
        ).alias("precision"),
        F.round(
            F.when(F.col("tp") + F.col("fn") > 0, F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))),
            6,
        ).alias("recall"),
        F.round(
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            ),
            6,
        ).alias("f1"),
    ).orderBy("thr")


@query(
    "ml_shapley_two_feature_exact",
    oracle="""
        WITH labeled AS (
            SELECT CASE WHEN value > 75.0 THEN 1 ELSE 0 END AS f_highval,
                   CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) < 12
                        THEN 1 ELSE 0 END AS f_morning,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        cells AS (
            SELECT f_highval, f_morning,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS s
            FROM labeled GROUP BY f_highval, f_morning
        ),
        m1 AS (
            SELECT f_highval, CAST(SUM(n) AS BIGINT) AS n1, CAST(SUM(s) AS BIGINT) AS s1
            FROM cells GROUP BY f_highval
        ),
        m2 AS (
            SELECT f_morning, CAST(SUM(n) AS BIGINT) AS n2, CAST(SUM(s) AS BIGINT) AS s2
            FROM cells GROUP BY f_morning
        ),
        g AS (SELECT CAST(SUM(n) AS BIGINT) AS ng, CAST(SUM(s) AS BIGINT) AS sg FROM cells)
        SELECT c.f_highval, c.f_morning, c.n,
               ROUND(CAST(c.s AS DOUBLE) / c.n, 9) AS rate,
               ROUND(0.5 * ((CAST(c.s AS DOUBLE) / c.n - CAST(m2.s2 AS DOUBLE) / m2.n2)
                            + (CAST(m1.s1 AS DOUBLE) / m1.n1 - CAST(g.sg AS DOUBLE) / g.ng)),
                     9) AS phi_highval,
               ROUND(0.5 * ((CAST(c.s AS DOUBLE) / c.n - CAST(m1.s1 AS DOUBLE) / m1.n1)
                            + (CAST(m2.s2 AS DOUBLE) / m2.n2 - CAST(g.sg AS DOUBLE) / g.ng)),
                     9) AS phi_morning
        FROM cells c
        JOIN m1 ON c.f_highval = m1.f_highval
        JOIN m2 ON c.f_morning = m2.f_morning
        CROSS JOIN g
        ORDER BY c.f_highval, c.f_morning
    """,
    tags=("E172", "E137"),
)
def ml_shapley_two_feature_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SHAPLEY VALUES for a two-binary-feature conversion model:
    with features {high-value, morning} and v(S) the conversion rate
    conditioned on the features in S, the closed form
    φ_i = ½[(v(both) − v(other)) + (v(own) − v(∅))] is computable
    EXACTLY from four cell counts and their marginals — no sampling,
    no surrogate (KernelSHAP degenerates to this at d=2).  The
    EFFICIENCY property φ₁ + φ₂ = rate(cell) − rate(overall) holds by
    construction and is the attribution-is-conserved audit (tested).

    One conditional grouped pass (4 cells) + marginal rollups; every
    count an exact BIGINT, every φ an identical 9-dp division chain.
    Feature thresholds reuse the A/B-test conversion boundary so the
    experiments family reconciles."""
    e = load_table(spark, sf_dir, "events")
    labeled = e.select(
        F.when(F.col("value") > 75.0, 1).otherwise(0).alias("f_highval"),
        F.when(F.hour("ts") < 12, 1).otherwise(0).alias("f_morning"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cells = labeled.groupBy("f_highval", "f_morning").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
    )
    m1 = cells.groupBy("f_highval").agg(
        F.sum("n").cast("bigint").alias("n1"), F.sum("s").cast("bigint").alias("s1")
    )
    m2 = cells.groupBy("f_morning").agg(
        F.sum("n").cast("bigint").alias("n2"), F.sum("s").cast("bigint").alias("s2")
    )
    g = cells.agg(
        F.sum("n").cast("bigint").alias("ng"), F.sum("s").cast("bigint").alias("sg")
    )
    pc = F.col("s").cast("double") / F.col("n")
    p1 = F.col("s1").cast("double") / F.col("n1")
    p2 = F.col("s2").cast("double") / F.col("n2")
    p0 = F.col("sg").cast("double") / F.col("ng")
    return (
        cells.join(F.broadcast(m1), "f_highval")
        .join(F.broadcast(m2), "f_morning")
        .crossJoin(F.broadcast(g))
        .select(
            "f_highval",
            "f_morning",
            "n",
            F.round(pc, 9).alias("rate"),
            F.round(0.5 * ((pc - p2) + (p1 - p0)), 9).alias("phi_highval"),
            F.round(0.5 * ((pc - p1) + (p2 - p0)), 9).alias("phi_morning"),
        )
        .orderBy("f_highval", "f_morning")
    )


IPS_W_SCALE = 10**6   # fixed-point grain for importance weights


@query(
    "ml_offpolicy_ips_eval",
    oracle=f"""
        WITH logged AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS reward,
                   CASE WHEN EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) < 12
                        THEN 1 ELSE 0 END AS action,
                   0.2 + 0.6 * LEAST(value / 600.0, 1.0) AS p_log
            FROM events
        ),
        weighted AS (
            SELECT reward, action,
                   CAST(FLOOR({IPS_W_SCALE} * CASE WHEN action = 1
                                                   THEN 1.0 / p_log
                                                   ELSE 0.0 END)
                        AS BIGINT) AS w_u
            FROM logged
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN action = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_action_taken,
               CAST(SUM(reward * w_u) AS BIGINT) AS ips_num_u,
               CAST(SUM(w_u) AS BIGINT) AS ips_den_u,
               ROUND(CAST(SUM(reward * w_u) AS DOUBLE)
                     / ({IPS_W_SCALE}.0 * COUNT(*)), 9) AS ips_value,
               ROUND(CAST(SUM(reward * w_u) AS DOUBLE) / SUM(w_u), 9)
                   AS snips_value
        FROM weighted
    """,
    tags=("E158", "E137"),
)
def ml_offpolicy_ips_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFF-POLICY EVALUATION via inverse propensity scoring: estimate
    the reward of a TARGET policy ("always act in the morning") from
    logs collected under a stochastic LOGGING policy whose propensity
    p(action|x) = 0.2 + 0.6·min(value/600, 1) is known — IPS
    (unbiased, high variance) next to SNIPS (self-normalized, the
    production default) — counterfactual evaluation without an A/B
    test, the core of bandit/recsys offline experimentation.

    Importance weights FLOOR-quantize at 10^6 into exact BIGINTs, so
    both estimators' numerators and denominators are exact integer
    sums (no double summation order anywhere) with one 9-dp division
    each.  One row-local pass + one global aggregate."""
    e = load_table(spark, sf_dir, "events")
    reward = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    action = F.when(F.hour("ts") < 12, 1).otherwise(0)
    p_log = 0.2 + 0.6 * F.least(F.col("value") / 600.0, F.lit(1.0))
    w_u = F.floor(
        IPS_W_SCALE
        * F.when(action == 1, 1.0 / p_log).otherwise(F.lit(0.0))
    ).cast("bigint")
    weighted = e.select(
        reward.alias("reward"), action.alias("action"), w_u.alias("w_u")
    )
    return weighted.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("action") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_action_taken"),
        F.sum(F.col("reward") * F.col("w_u")).cast("bigint").alias("ips_num_u"),
        F.sum("w_u").cast("bigint").alias("ips_den_u"),
        F.round(
            F.sum(F.col("reward") * F.col("w_u")).cast("double")
            / (float(IPS_W_SCALE) * F.count(F.lit(1))),
            9,
        ).alias("ips_value"),
        F.round(
            F.sum(F.col("reward") * F.col("w_u")).cast("double") / F.sum("w_u"),
            9,
        ).alias("snips_value"),
    )


@query(
    "ml_group_fairness_metrics",
    oracle="""
        WITH scored AS (
            SELECT CAST(user_id % 2 AS INT) AS grp,
                   CASE WHEN value > 75.0 THEN 1 ELSE 0 END AS pred,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        ),
        per_group AS (
            SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(pred) AS BIGINT) AS n_pred_pos,
                   CAST(SUM(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
                   CAST(SUM(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg
            FROM scored GROUP BY grp
        )
        SELECT grp, n,
               ROUND(CAST(n_pred_pos AS DOUBLE) / n, 9) AS selection_rate,
               ROUND(CAST(tp AS DOUBLE) / pos, 9) AS tpr,
               ROUND(CAST(fp AS DOUBLE) / neg, 9) AS fpr
        FROM per_group
        ORDER BY grp
    """,
    tags=("E152", "E176"),
)
def ml_group_fairness_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP FAIRNESS AUDIT of a classifier (value > 75 predicting
    purchase) across a protected-attribute stand-in (user parity):
    per-group SELECTION RATE (demographic parity), TPR and FPR
    (equalized odds) — the three rates every responsible-AI review
    reads side by side; their between-group gaps are the reported
    fairness violations, and the confusion-matrix machinery is shared
    with the threshold-sweep / multiclass eval ops so the numbers
    reconcile.

    Exact BIGINT confusion cells from one conditional grouped pass;
    rates are identical 9-dp chains.  Group count is the output
    cardinality — scale-free."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        (F.col("user_id") % 2).cast("int").alias("grp"),
        F.when(F.col("value") > 75.0, 1).otherwise(0).alias("pred"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_group = scored.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("pred").cast("bigint").alias("n_pred_pos"),
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).cast("bigint").alias("pos"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).cast("bigint").alias("neg"),
    )
    return per_group.select(
        "grp",
        "n",
        F.round(F.col("n_pred_pos").cast("double") / F.col("n"), 9).alias(
            "selection_rate"
        ),
        F.round(F.col("tp").cast("double") / F.col("pos"), 9).alias("tpr"),
        F.round(F.col("fp").cast("double") / F.col("neg"), 9).alias("fpr"),
    ).orderBy("grp")


EB_RATE_SCALE = 10**6   # fixed-point grain for raw per-part rates (10^6: r_u^2 sums stay in BIGINT at any part count)
EB_TOP = 15


@query(
    "ml_empirical_bayes_shrinkage",
    oracle=f"""
        WITH per_part AS (
            SELECT l_partkey,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS x
            FROM lineitem GROUP BY l_partkey
        ),
        q AS (
            SELECT l_partkey, n, x,
                   CAST(FLOOR(CAST(x AS DOUBLE) * {EB_RATE_SCALE} / n) AS BIGINT)
                       AS r_u
            FROM per_part
        ),
        mom AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS k,
                   CAST(SUM(r_u) AS BIGINT) AS sr,
                   CAST(SUM(r_u * r_u) AS BIGINT) AS srr
            FROM q
        ),
        prior AS (
            SELECT
              (CAST(sr AS DOUBLE) / k / {EB_RATE_SCALE}) AS mu,
              GREATEST(
                ((CAST(srr AS DOUBLE) - CAST(sr AS DOUBLE) * sr / k) / (k - 1))
                  / ({EB_RATE_SCALE}.0 * {EB_RATE_SCALE}), 1e-18) AS var
            FROM mom
        ),
        ab AS (
            SELECT mu, var,
                   mu * (mu * (1.0 - mu) / var - 1.0) AS alpha,
                   (1.0 - mu) * (mu * (1.0 - mu) / var - 1.0) AS beta
            FROM prior
        )
        SELECT q.l_partkey, q.n, q.x,
               ROUND(CAST(q.x AS DOUBLE) / q.n, 9) AS raw_rate,
               ROUND((q.x + ab.alpha) / (q.n + ab.alpha + ab.beta), 9)
                   AS shrunk_rate
        FROM q CROSS JOIN ab
        ORDER BY ROUND((q.x + ab.alpha) / (q.n + ab.alpha + ab.beta), 9) DESC,
                 q.l_partkey
        LIMIT {EB_TOP}
    """,
    tags=("E100", "E137"),
)
def ml_empirical_bayes_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMPIRICAL-BAYES (beta-binomial) SHRINKAGE of per-part return
    rates: method-of-moments fits the Beta prior from the corpus of
    raw rates, and each part's rate shrinks toward it in proportion to
    its sample size — the canonical fix for "2 returns out of 3
    lineitems = 67% return rate" leaderboard poisoning; the top-k by
    SHRUNKEN rate is the list a category manager can actually act on
    (its sibling target-encoding op uses the same idea for features).

    Raw rates FLOOR-quantize at 10^6 (EB_RATE_SCALE) so the MoM
    moments are exact BIGINT sums (no double summation); α/β and the
    shrunken rates are identical division chains, ROUNDED BEFORE
    RANKING (the near-tie discipline) with part-key tie-break.  The
    prior variance is floored at 1e-18 — far below the 1e-12
    quantization grain, so real corpora are untouched — to keep a
    degenerate corpus (all raw rates equal, var = 0) from producing
    inf/NaN α/β; both engines apply the identical guard (r3 ADVICE)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("x"),
    )
    q = per_part.withColumn(
        "r_u",
        F.floor(F.col("x").cast("double") * EB_RATE_SCALE / F.col("n")).cast(
            "bigint"
        ),
    )
    mom = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("r_u").cast("bigint").alias("sr"),
        F.sum(F.col("r_u") * F.col("r_u")).cast("bigint").alias("srr"),
    )
    mu = F.col("sr").cast("double") / F.col("k") / EB_RATE_SCALE
    var = (
        (F.col("srr").cast("double") - F.col("sr").cast("double") * F.col("sr") / F.col("k"))
        / (F.col("k") - 1)
    ) / (float(EB_RATE_SCALE) * EB_RATE_SCALE)
    var = F.greatest(var, F.lit(1e-18))
    common = mu * (1.0 - mu) / var - 1.0
    ab = mom.select(
        (mu * common).alias("alpha"),
        ((1.0 - mu) * common).alias("beta"),
    )
    shrunk = F.round(
        (F.col("x") + F.col("alpha")) / (F.col("n") + F.col("alpha") + F.col("beta")),
        9,
    )
    return (
        q.crossJoin(F.broadcast(ab))
        .select(
            "l_partkey",
            "n",
            "x",
            F.round(F.col("x").cast("double") / F.col("n"), 9).alias("raw_rate"),
            shrunk.alias("shrunk_rate"),
        )
        .orderBy(F.col("shrunk_rate").desc(), "l_partkey")
        .limit(EB_TOP)
    )


LC_FRACTIONS = list(range(10, 101, 10))   # cumulative hash-bucket percents


@query(
    "ml_learning_curve_subsample",
    oracle=f"""
        WITH scored AS (
            SELECT CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                        AS BIGINT) % 100 AS bucket,
                   CASE WHEN value > 75.0 THEN 1 ELSE 0 END AS pred,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        )
        SELECT f.pct,
               CAST(SUM(CASE WHEN s.bucket < f.pct THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_sample,
               CAST(SUM(CASE WHEN s.bucket < f.pct AND s.y = 1 AND s.pred = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(SUM(CASE WHEN s.bucket < f.pct AND s.y = 0 AND s.pred = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN s.bucket < f.pct AND s.y = 1 AND s.pred = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               ROUND(2.0 * SUM(CASE WHEN s.bucket < f.pct AND s.y = 1 AND s.pred = 1
                                    THEN 1 ELSE 0 END)
                     / (2 * SUM(CASE WHEN s.bucket < f.pct AND s.y = 1 AND s.pred = 1
                                     THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN s.bucket < f.pct AND s.y = 0 AND s.pred = 1
                              THEN 1 ELSE 0 END)
                        + SUM(CASE WHEN s.bucket < f.pct AND s.y = 1 AND s.pred = 0
                              THEN 1 ELSE 0 END)), 6) AS f1
        FROM scored s CROSS JOIN (SELECT unnest({LC_FRACTIONS}) AS pct) f
        GROUP BY f.pct
        ORDER BY f.pct
    """,
    tags=("E274", "E90"),
)
def ml_learning_curve_subsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARNING-CURVE HARNESS: the fixed classifier evaluated on
    CUMULATIVE deterministic subsamples (md5-bucket < p%, so the 20%
    sample contains the 10% sample — each point adds data, exactly
    like a data-scaling study) — where the metric flattens is where
    more data stops paying; the noisy low-p points show the variance
    a small-data conclusion carries.  The data-scaling complement of
    the threshold sweep (fixes data, varies threshold; this fixes
    threshold, varies data).

    Hash-bucket membership is engine-portable and NESTED by
    construction; the corpus is read once × a 10-row broadcast grid
    (map-side fan-out before the partial aggregate); every confusion
    cell an exact BIGINT, F1 one 6-dp chain."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 100
        ).alias("bucket"),
        F.when(F.col("value") > 75.0, 1).otherwise(0).alias("pred"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    grid = spark.range(10, 101, 10).select(F.col("id").cast("bigint").alias("pct"))
    inb = F.col("bucket") < F.col("pct")
    sweep = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("pct")
        .agg(
            F.sum(F.when(inb, 1).otherwise(0)).cast("bigint").alias("n_sample"),
            F.sum(F.when(inb & (F.col("y") == 1) & (F.col("pred") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("tp"),
            F.sum(F.when(inb & (F.col("y") == 0) & (F.col("pred") == 1), 1).otherwise(0))
            .cast("bigint")
            .alias("fp"),
            F.sum(F.when(inb & (F.col("y") == 1) & (F.col("pred") == 0), 1).otherwise(0))
            .cast("bigint")
            .alias("fn"),
        )
    )
    return sweep.select(
        "pct",
        "n_sample",
        "tp",
        "fp",
        "fn",
        F.round(
            2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
    ).orderBy("pct")


COST_FP = 1    # cost of a false positive (wasted outreach)
COST_FN = 5    # cost of a false negative (missed conversion)


@query(
    "ml_cost_sensitive_threshold",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                   CAST(LEAST(FLOOR(value / {BRIER_P_DENOM} * 1000), 1000) AS BIGINT)
                       AS p_milli
            FROM events
        ),
        sweep AS (
            SELECT t.thr,
                   CAST(SUM(CASE WHEN p_milli >= t.thr AND y = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN p_milli < t.thr AND y = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS fn
            FROM scored CROSS JOIN (SELECT unnest({F1_THRESHOLDS}) AS thr) t
            GROUP BY t.thr
        ),
        costed AS (
            SELECT thr, fp, fn,
                   CAST({COST_FP} * fp + {COST_FN} * fn AS BIGINT) AS total_cost
            FROM sweep
        )
        SELECT arg_min(thr, total_cost * 2048 + thr) AS best_thr,
               CAST(MIN(total_cost) AS BIGINT) AS best_cost,
               CAST(MAX(CASE WHEN thr = 0 THEN total_cost END) AS BIGINT)
                   AS cost_accept_all,
               CAST(MAX(CASE WHEN thr = 1000 THEN total_cost END) AS BIGINT)
                   AS cost_reject_all
        FROM costed
    """,
    tags=("E274", "E259"),
)
def ml_cost_sensitive_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COST-SENSITIVE OPERATING POINT: with an asymmetric error-cost
    matrix (FP = {COST_FP}, FN = {COST_FN} — missing a converter
    costs 5x a wasted outreach), the optimal threshold MINIMIZES
    EXPECTED COST, not F1 — the business-decision layer over the F1
    sweep (same grid, same forecasts, so the two tables reconcile
    row-for-row), bracketed by the accept-all and reject-all
    degenerate policies.

    Costs are exact BIGINTs; the argmin key is the scalar composite
    cost·2048 + thr (the change-point recipe — thr ≤ 1000 < 2048), so
    ties break toward the lower threshold identically on both
    engines.  One corpus pass × broadcast grid."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.least(F.floor(F.col("value") / BRIER_P_DENOM * 1000), F.lit(1000))
        .cast("bigint")
        .alias("p_milli"),
    )
    grid = spark.range(0, 1001, 50).select(F.col("id").cast("bigint").alias("thr"))
    sweep = (
        scored.crossJoin(F.broadcast(grid))
        .groupBy("thr")
        .agg(
            F.sum(
                F.when((F.col("p_milli") >= F.col("thr")) & (F.col("y") == 0), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("fp"),
            F.sum(
                F.when((F.col("p_milli") < F.col("thr")) & (F.col("y") == 1), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("fn"),
        )
    )
    costed = sweep.select(
        "thr",
        (COST_FP * F.col("fp") + COST_FN * F.col("fn")).cast("bigint").alias(
            "total_cost"
        ),
    )
    key = F.col("total_cost") * 2048 + F.col("thr")
    return costed.agg(
        F.min_by("thr", key).alias("best_thr"),
        F.min("total_cost").cast("bigint").alias("best_cost"),
        F.max(F.when(F.col("thr") == 0, F.col("total_cost")))
        .cast("bigint")
        .alias("cost_accept_all"),
        F.max(F.when(F.col("thr") == 1000, F.col("total_cost")))
        .cast("bigint")
        .alias("cost_reject_all"),
    )


CHAMPION_THR = 500    # champion decision threshold (milli-prob)
CHALLENGER_THR = 350  # challenger decision threshold


@query(
    "ml_mcnemar_champion_challenger",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
                   CAST(LEAST(FLOOR(value / {BRIER_P_DENOM} * 1000), 1000) AS BIGINT)
                       AS p_milli
            FROM events
        ),
        paired AS (
            SELECT CASE WHEN (p_milli >= {CHAMPION_THR}) = (y = 1)
                        THEN 1 ELSE 0 END AS champ_ok,
                   CASE WHEN (p_milli >= {CHALLENGER_THR}) = (y = 1)
                        THEN 1 ELSE 0 END AS chall_ok
            FROM scored
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN champ_ok = 1 AND chall_ok = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b_champ_only,
               CAST(SUM(CASE WHEN champ_ok = 0 AND chall_ok = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_chall_only,
               ROUND(CAST(SUM(champ_ok) AS DOUBLE) / COUNT(*), 9) AS champ_accuracy,
               ROUND(CAST(SUM(chall_ok) AS DOUBLE) / COUNT(*), 9) AS chall_accuracy,
               ROUND(
                   CAST((SUM(CASE WHEN champ_ok = 1 AND chall_ok = 0 THEN 1 ELSE 0 END)
                         - SUM(CASE WHEN champ_ok = 0 AND chall_ok = 1 THEN 1 ELSE 0 END))
                        AS DOUBLE)
                   * (SUM(CASE WHEN champ_ok = 1 AND chall_ok = 0 THEN 1 ELSE 0 END)
                      - SUM(CASE WHEN champ_ok = 0 AND chall_ok = 1 THEN 1 ELSE 0 END))
                   / (SUM(CASE WHEN champ_ok = 1 AND chall_ok = 0 THEN 1 ELSE 0 END)
                      + SUM(CASE WHEN champ_ok = 0 AND chall_ok = 1 THEN 1 ELSE 0 END)),
                   6) AS mcnemar_chi2
        FROM paired
    """,
    tags=("E274", "E165"),
)
def ml_mcnemar_champion_challenger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST for champion vs challenger models (two decision
    thresholds over the same forecasts): accuracy deltas on PAIRED
    predictions are driven entirely by the discordant cells — rows
    one model gets right and the other wrong — and χ² = (b−c)²/(b+c)
    is the statistically-correct promotion gate (two independent
    accuracy intervals overlap-checking, the common practice, wastes
    the pairing and misses real wins).

    Discordant counts are exact BIGINTs from one conditional pass;
    accuracies and χ² are identical division chains.  Completes the
    experimentation family: A/B (users), DiD/ITS (time), McNemar
    (paired predictions)."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.least(F.floor(F.col("value") / BRIER_P_DENOM * 1000), F.lit(1000))
        .cast("bigint")
        .alias("p_milli"),
    )
    champ_ok = F.when(
        (F.col("p_milli") >= CHAMPION_THR) == (F.col("y") == 1), 1
    ).otherwise(0)
    chall_ok = F.when(
        (F.col("p_milli") >= CHALLENGER_THR) == (F.col("y") == 1), 1
    ).otherwise(0)
    paired = scored.select(champ_ok.alias("champ_ok"), chall_ok.alias("chall_ok"))
    b = F.sum(
        F.when((F.col("champ_ok") == 1) & (F.col("chall_ok") == 0), 1).otherwise(0)
    ).cast("bigint")
    c = F.sum(
        F.when((F.col("champ_ok") == 0) & (F.col("chall_ok") == 1), 1).otherwise(0)
    ).cast("bigint")
    return paired.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        b.alias("b_champ_only"),
        c.alias("c_chall_only"),
        F.round(F.sum("champ_ok").cast("double") / F.count(F.lit(1)), 9).alias(
            "champ_accuracy"
        ),
        F.round(F.sum("chall_ok").cast("double") / F.count(F.lit(1)), 9).alias(
            "chall_accuracy"
        ),
        F.round((b - c).cast("double") * (b - c) / (b + c), 6).alias(
            "mcnemar_chi2"
        ),
    )


@query(
    "ml_auc_delong_ci",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label,
                   value AS score
            FROM events
        ),
        ranked AS (
            SELECT label,
                   2 * RANK() OVER (ORDER BY score)
                     + (COUNT(*) OVER (PARTITION BY score) - 1) AS r2_all,
                   2 * RANK() OVER (PARTITION BY label ORDER BY score)
                     + (COUNT(*) OVER (PARTITION BY label, score) - 1) AS r2_in
            FROM scored
        ),
        nn AS (
            SELECT CAST(SUM(label) AS BIGINT) AS n_pos,
                   CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg
            FROM scored
        ),
        plc AS (
            SELECT r.label,
                   CASE WHEN r.label = 1 THEN r.r2_all - r.r2_in
                        ELSE 2 * n.n_pos - (r.r2_all - r.r2_in) END AS a
            FROM ranked r, nn n
        ),
        sums AS (
            SELECT label,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(a) AS DECIMAL(38,0)) AS sa,
                   CAST(SUM(CAST(a AS HUGEINT) * a) AS DECIMAL(38,0)) AS saa
            FROM plc GROUP BY 1
        )
        SELECT
          ROUND(CAST(p.sa AS DOUBLE) / (2.0 * n.n_neg * n.n_pos), 6) AS auc,
          ROUND(SQRT(
             ((CAST(p.saa AS DOUBLE) - CAST(p.sa AS DOUBLE) * CAST(p.sa AS DOUBLE) / p.m)
                  / (p.m - 1)) / (4.0 * n.n_neg * n.n_neg) / p.m
           + ((CAST(q.saa AS DOUBLE) - CAST(q.sa AS DOUBLE) * CAST(q.sa AS DOUBLE) / q.m)
                  / (q.m - 1)) / (4.0 * n.n_pos * n.n_pos) / q.m), 6) AS se,
          ROUND(CAST(p.sa AS DOUBLE) / (2.0 * n.n_neg * n.n_pos)
                - 1.96 * SQRT(
             ((CAST(p.saa AS DOUBLE) - CAST(p.sa AS DOUBLE) * CAST(p.sa AS DOUBLE) / p.m)
                  / (p.m - 1)) / (4.0 * n.n_neg * n.n_neg) / p.m
           + ((CAST(q.saa AS DOUBLE) - CAST(q.sa AS DOUBLE) * CAST(q.sa AS DOUBLE) / q.m)
                  / (q.m - 1)) / (4.0 * n.n_pos * n.n_pos) / q.m), 6) AS ci_lo,
          ROUND(CAST(p.sa AS DOUBLE) / (2.0 * n.n_neg * n.n_pos)
                + 1.96 * SQRT(
             ((CAST(p.saa AS DOUBLE) - CAST(p.sa AS DOUBLE) * CAST(p.sa AS DOUBLE) / p.m)
                  / (p.m - 1)) / (4.0 * n.n_neg * n.n_neg) / p.m
           + ((CAST(q.saa AS DOUBLE) - CAST(q.sa AS DOUBLE) * CAST(q.sa AS DOUBLE) / q.m)
                  / (q.m - 1)) / (4.0 * n.n_pos * n.n_pos) / q.m), 6) AS ci_hi,
          n.n_pos, n.n_neg
        FROM sums p, sums q, nn n
        WHERE p.label = 1 AND q.label = 0
    """,
    tags=("E25", "E165"),
)
def ml_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELONG confidence interval for AUC-ROC — the variance the AUC
    point estimate (ml_eval_auc_rank) needs before anyone compares two
    models: Var(AUC) = S10/n_pos + S01/n_neg over the placement values
    V10/V01, computed by the placement-rank identity (no O(n^2)
    pairwise psi).

    Integer exactness end to end: DOUBLED midranks 2R = 2*RANK() +
    (ties-1) never form a fraction; the placement a = 2R_all - 2R_within
    equals 2*n_neg*V10 (positives) / 2*n_pos*(1-V01) (negatives) as a
    BIGINT, and the moment sums carry DECIMAL(38,0) (HUGEINT in the
    twin) so no precision is lost before the one shared double chain
    that forms AUC, SE and the 95% CI.  The numpy brute-force
    validation matched to all 6 dp.  At 100 TB: one global ORDER BY
    score (the same shuffle AUC itself needs) + per-label rank windows
    + one aggregate; nothing is corpus-squared."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
        F.col("value").alias("score"),
    )
    w_all = Window.orderBy("score")
    w_all_t = Window.partitionBy("score")
    w_in = Window.partitionBy("label").orderBy("score")
    w_in_t = Window.partitionBy("label", "score")
    ranked = scored.select(
        "label",
        (2 * F.rank().over(w_all) + (F.count(F.lit(1)).over(w_all_t) - 1)).alias(
            "r2_all"
        ),
        (2 * F.rank().over(w_in) + (F.count(F.lit(1)).over(w_in_t) - 1)).alias(
            "r2_in"
        ),
    )
    nn = scored.agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("label")).cast("bigint").alias("n_neg"),
    )
    plc = ranked.crossJoin(F.broadcast(nn)).select(
        "label",
        F.when(
            F.col("label") == 1, F.col("r2_all") - F.col("r2_in")
        )
        .otherwise(2 * F.col("n_pos") - (F.col("r2_all") - F.col("r2_in")))
        .cast("bigint")
        .alias("a"),
    )
    sums = plc.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("a").cast("decimal(38,0)").alias("sa"),
        F.sum(
            F.col("a").cast("decimal(19,0)") * F.col("a").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("saa"),
    )
    p = sums.where("label = 1").select(
        F.col("m").alias("pm"), F.col("sa").alias("psa"), F.col("saa").alias("psaa")
    )
    q = sums.where("label = 0").select(
        F.col("m").alias("qm"), F.col("sa").alias("qsa"), F.col("saa").alias("qsaa")
    )
    j = p.crossJoin(q).crossJoin(F.broadcast(nn))
    auc = F.col("psa").cast("double") / (2.0 * F.col("n_neg") * F.col("n_pos"))
    var10 = (
        (
            F.col("psaa").cast("double")
            - F.col("psa").cast("double") * F.col("psa").cast("double") / F.col("pm")
        )
        / (F.col("pm") - 1)
    ) / (4.0 * F.col("n_neg") * F.col("n_neg")) / F.col("pm")
    var01 = (
        (
            F.col("qsaa").cast("double")
            - F.col("qsa").cast("double") * F.col("qsa").cast("double") / F.col("qm")
        )
        / (F.col("qm") - 1)
    ) / (4.0 * F.col("n_pos") * F.col("n_pos")) / F.col("qm")
    se = F.sqrt(var10 + var01)
    return j.select(
        F.round(auc, 6).alias("auc"),
        F.round(se, 6).alias("se"),
        F.round(auc - 1.96 * se, 6).alias("ci_lo"),
        F.round(auc + 1.96 * se, 6).alias("ci_hi"),
        "n_pos",
        "n_neg",
    )


TSCV_FOLDS = 3
TSCV_PURGE_DAYS = 7


@query(
    "ml_time_series_cv_folds",
    oracle=f"""
        WITH d AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
        b AS (
            SELECT MIN(d) AS d0,
                   date_diff('day', MIN(d), MAX(d)) AS span
            FROM d
        ),
        folds AS (
            SELECT t.fold,
                   b.d0 + CAST(t.fold * b.span // {TSCV_FOLDS + 1} AS INTEGER)
                       AS cut,
                   b.d0 + CAST((t.fold + 1) * b.span // {TSCV_FOLDS + 1}
                               AS INTEGER) AS tend
            FROM b, (SELECT unnest(range(1, {TSCV_FOLDS} + 1)) AS fold) t
        )
        SELECT CAST(f.fold AS BIGINT) AS fold,
               strftime(f.cut, '%Y-%m-%d') AS train_end,
               strftime(f.cut + {TSCV_PURGE_DAYS}, '%Y-%m-%d') AS test_start,
               strftime(f.tend, '%Y-%m-%d') AS test_end,
               CAST(SUM(CASE WHEN d.d < f.cut THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(SUM(CASE WHEN d.d >= f.cut + {TSCV_PURGE_DAYS}
                              AND d.d < f.tend THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_test,
               CAST(SUM(CASE WHEN d.d >= f.cut
                              AND d.d < f.cut + {TSCV_PURGE_DAYS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_purged
        FROM d, folds f
        GROUP BY f.fold, f.cut, f.tend
        ORDER BY fold
    """,
    tags=("E42", "E25"),
)
def ml_time_series_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPANDING-WINDOW time-series cross-validation folds with a
    purge gap: each fold trains on everything before its cut, skips
    {TSCV_PURGE_DAYS} days (the leakage quarantine for label windows
    that look into the future — the Combinatorial-Purged-CV idea in
    its simple expanding form), and tests on the next segment.  The
    fold table IS the deliverable: per fold the boundary dates and
    exact train/test/purged row counts, the assignment every honest
    backtest of a temporal model starts from (random k-fold,
    ml_kfold_assign, leaks future into past here).

    Exact integer calendar arithmetic (day spans via integer DIV —
    no float dates), so both engines agree to the day.  Scale shape:
    one min/max aggregate, a {TSCV_FOLDS}-row literal fold frame
    broadcast against the fact table, one conditional-count groupBy
    — the fact table is read once and never shuffled by row."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    b = o.agg(
        F.min("d").alias("d0"),
        F.datediff(F.max("d"), F.min("d")).cast("bigint").alias("span"),
    )
    folds = (
        b.select(
            F.explode(F.sequence(F.lit(1), F.lit(TSCV_FOLDS))).alias("fold"),
            "d0",
            "span",
        )
        .select(
            "fold",
            F.expr(
                f"date_add(d0, CAST(fold * span DIV {TSCV_FOLDS + 1} AS INT))"
            ).alias("cut"),
            F.expr(
                f"date_add(d0, CAST((fold + 1) * span DIV {TSCV_FOLDS + 1} AS INT))"
            ).alias("tend"),
        )
    )
    g = TSCV_PURGE_DAYS
    return (
        o.crossJoin(F.broadcast(folds))
        .groupBy("fold", "cut", "tend")
        .agg(
            F.sum(F.when(F.col("d") < F.col("cut"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(
                F.when(
                    (F.col("d") >= F.date_add(F.col("cut"), g))
                    & (F.col("d") < F.col("tend")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_test"),
            F.sum(
                F.when(
                    (F.col("d") >= F.col("cut"))
                    & (F.col("d") < F.date_add(F.col("cut"), g)),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_purged"),
        )
        .select(
            F.col("fold").cast("bigint").alias("fold"),
            F.date_format("cut", "yyyy-MM-dd").alias("train_end"),
            F.date_format(F.date_add("cut", g), "yyyy-MM-dd").alias("test_start"),
            F.date_format("tend", "yyyy-MM-dd").alias("test_end"),
            "n_train",
            "n_test",
            "n_purged",
        )
        .orderBy("fold")
    )


# --- E366: multinomial naive Bayes language classifier -------------------

NB_SCALE = 1 << 20


@query(
    "ml_naive_bayes_multinomial",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, lang,
                   list_filter(string_split(lower(text), ' '),
                               w -> regexp_matches(w, '^[a-z]+$')) AS toks,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                        AS INT) AS h
            FROM documents
        ),
        train_tok AS (
            SELECT lang, unnest(toks) AS w FROM base WHERE h < 8
        ),
        cw AS (
            SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM train_tok GROUP BY lang, w
        ),
        cls AS (
            SELECT lang AS cl, CAST(COUNT(*) AS BIGINT) AS nc
            FROM train_tok GROUP BY lang
        ),
        vstat AS (
            SELECT (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) FROM train_tok)
                       AS v
        ),
        prior AS (
            SELECT lang AS cl, CAST(COUNT(*) AS BIGINT) AS ndocs
            FROM base WHERE h < 8 GROUP BY lang
        ),
        consts AS (
            SELECT p.cl, c.nc,
                   CAST(FLOOR({NB_SCALE} * LOG2(
                       CAST(p.ndocs AS DOUBLE)
                       / (SELECT SUM(ndocs) FROM prior))) AS BIGINT)
                       AS prior_q,
                   CAST(FLOOR({NB_SCALE} * LOG2(
                       1.0 / CAST(c.nc + vs.v AS DOUBLE))) AS BIGINT)
                       AS unseen_q
            FROM prior p JOIN cls c ON c.cl = p.cl CROSS JOIN vstat vs
        ),
        terms AS (
            SELECT cw.w, cw.lang AS cl,
                   CAST(FLOOR({NB_SCALE} * LOG2(
                       CAST(cw.c + 1 AS DOUBLE)
                       / CAST(k.nc + vs.v AS DOUBLE))) AS BIGINT)
                   - k.unseen_q AS delta_q
            FROM cw JOIN consts k ON k.cl = cw.lang CROSS JOIN vstat vs
        ),
        eval_docs AS (
            SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tok
            FROM base WHERE h >= 8
        ),
        eval_tok AS (
            SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT doc_id, unnest(toks) AS w FROM base WHERE h >= 8)
            GROUP BY doc_id, w
        ),
        matched AS (
            SELECT e.doc_id, t.cl,
                   CAST(SUM(e.cnt * t.delta_q) AS BIGINT) AS sd_q
            FROM eval_tok e JOIN terms t ON t.w = e.w
            GROUP BY e.doc_id, t.cl
        ),
        scores AS (
            SELECT d.doc_id, d.lang, k.cl,
                   k.prior_q + d.n_tok * k.unseen_q + COALESCE(m.sd_q, 0)
                       AS score_q
            FROM eval_docs d CROSS JOIN consts k
            LEFT JOIN matched m ON m.doc_id = d.doc_id AND m.cl = k.cl
        ),
        pred AS (
            SELECT doc_id, lang, cl AS pred_lang
            FROM (SELECT doc_id, lang, cl,
                         row_number() OVER (PARTITION BY doc_id
                                            ORDER BY score_q DESC, cl) AS rn
                  FROM scores)
            WHERE rn = 1
        )
        SELECT lang AS true_lang, pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM pred
        GROUP BY lang, pred_lang
        ORDER BY true_lang, pred_lang
    """,
    tags=("E366",),
)
def ml_naive_bayes_multinomial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier, trained and
    evaluated entirely in the engine: add-1 smoothed per-(class, word)
    log-likelihoods and doc-count priors from the deterministic md5
    train split, argmax scoring of the held-out split, confusion
    matrix out.  The "train a model IN the warehouse" pattern — no
    data leaves the cluster, and the fitted model is itself a table.

    Exact algebra: every log2 is quantized once into fixed-point
    BIGINTs (prior_q, unseen_q, per-word delta_q = term_q - unseen_q);
    a doc's class score is prior_q + n_tok·unseen_q + Σ cnt·delta_q —
    pure integer arithmetic, partition-invariant, bit-identical in
    DuckDB.  The unseen-word decomposition means the score join only
    touches words that EXIST in the model: OOV handling costs nothing.

    Scale shape: model = two map-side-combined aggregates (vocab ×
    5 classes); scoring joins eval postings against the model on the
    word key (shuffle), then one argmax-by-struct per doc.  At 100 TB
    the model table is vocab-bounded and the scoring join is the only
    corpus-scale exchange."""
    from potpot_spark.catalog import spread

    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    base = spread(
        d.select(
            "doc_id",
            "lang",
            F.filter(
                F.split(F.lower(F.col("text")), " "),
                lambda w: w.rlike("^[a-z]+$"),
            ).alias("toks"),
            h.alias("h"),
        )
    )
    train_tok = base.where(F.col("h") < 8).select(
        "lang", F.explode("toks").alias("w")
    )
    cw = train_tok.groupBy("lang", "w").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cls = train_tok.groupBy(F.col("lang").alias("cl")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nc")
    )
    vstat = train_tok.agg(F.countDistinct("w").cast("bigint").alias("v"))
    prior = (
        base.where(F.col("h") < 8)
        .groupBy(F.col("lang").alias("cl"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ndocs"))
    )
    total = prior.agg(F.sum("ndocs").alias("ntotal"))
    consts = (
        prior.join(cls, "cl")
        .crossJoin(F.broadcast(vstat))
        .crossJoin(F.broadcast(total))
        .select(
            "cl",
            "nc",
            F.floor(
                F.lit(NB_SCALE)
                * F.log2(F.col("ndocs").cast("double") / F.col("ntotal"))
            )
            .cast("bigint")
            .alias("prior_q"),
            F.floor(
                F.lit(NB_SCALE)
                * F.log2(F.lit(1.0) / (F.col("nc") + F.col("v")).cast("double"))
            )
            .cast("bigint")
            .alias("unseen_q"),
        )
    )
    terms = (
        cw.join(F.broadcast(consts), cw["lang"] == consts["cl"])
        .crossJoin(F.broadcast(vstat))
        .select(
            "w",
            "cl",
            (
                F.floor(
                    F.lit(NB_SCALE)
                    * F.log2(
                        (F.col("c") + 1).cast("double")
                        / (F.col("nc") + F.col("v")).cast("double")
                    )
                ).cast("bigint")
                - F.col("unseen_q")
            ).alias("delta_q"),
        )
    )
    eval_docs = base.where(F.col("h") >= 8).select(
        "doc_id", "lang", F.size("toks").cast("bigint").alias("n_tok")
    )
    eval_tok = (
        base.where(F.col("h") >= 8)
        .select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    matched = (
        eval_tok.join(terms, "w")
        .groupBy("doc_id", "cl")
        .agg(F.sum(F.col("cnt") * F.col("delta_q")).cast("bigint").alias("sd_q"))
    )
    scores = (
        eval_docs.crossJoin(F.broadcast(consts.select("cl", "prior_q", "unseen_q")))
        .join(matched, ["doc_id", "cl"], "left")
        .select(
            "doc_id",
            "lang",
            "cl",
            (
                F.col("prior_q")
                + F.col("n_tok") * F.col("unseen_q")
                + F.coalesce(F.col("sd_q"), F.lit(0))
            ).alias("score_q"),
        )
    )
    pred = scores.groupBy("doc_id", "lang").agg(
        F.min(F.struct((-F.col("score_q")).alias("neg"), F.col("cl"))).alias("_m")
    )
    return (
        pred.groupBy(
            F.col("lang").alias("true_lang"), F.col("_m.cl").alias("pred_lang")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# --- E367: mutual information between features and the label -------------

MI_SCALE = 1 << 20


def _mi_oracle_feature(feat_expr: str, feat_name: str) -> str:
    return f"""
        SELECT '{feat_name}' AS feature, CAST(n AS BIGINT) AS n,
               CAST(SUM(nxy * cell_q) AS BIGINT) AS mi_scaled_q,
               ROUND(CAST(SUM(nxy * cell_q) AS DOUBLE) / n / {MI_SCALE}, 6)
                   AS mi_bits
        FROM (
            SELECT nxy, n,
                   CAST(FLOOR({MI_SCALE} * LOG2(
                       CAST(nxy AS DOUBLE) * n
                       / (CAST(nx AS DOUBLE) * ny))) AS BIGINT) AS cell_q
            FROM (
                SELECT x, y, nxy,
                       SUM(nxy) OVER (PARTITION BY x) AS nx,
                       SUM(nxy) OVER (PARTITION BY y) AS ny,
                       SUM(nxy) OVER () AS n
                FROM (SELECT {feat_expr} AS x, lang AS y,
                             CAST(COUNT(*) AS BIGINT) AS nxy
                      FROM documents GROUP BY 1, 2)
            )
        )
        GROUP BY n
    """


@query(
    "ml_mutual_information_label",
    oracle=f"""
        {_mi_oracle_feature("source", "source")}
        UNION ALL
        {_mi_oracle_feature(
            "CAST(length(bin(CAST(n_chars AS BIGINT))) - 1 AS BIGINT)",
            "len_log2",
        )}
        ORDER BY feature
    """,
    tags=("E367",),
)
def ml_mutual_information_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(feature; label) in bits for each candidate
    feature against the language label — the model-free feature-ranking
    step run before training a router/classifier (high-MI features
    carry label signal; near-zero ones are noise).  Features here:
    ``source`` and the ⌊log2(n_chars)⌋ length bucket (fixed-width bins,
    no global ntile — bin assignment is a pure row expression).

    Exact algebra: each contingency cell contributes
    nxy · FLOOR(2^20·log2(nxy·n / (nx·ny))) — one quantized log2 per
    cell, then BIGINT sums; the final bits value is one identical
    double division + ROUND on both engines.  Joint/marginal counts
    come from ONE aggregate plus window sums over the (tiny)
    contingency table.

    Scale shape: one map-side-combined groupBy per feature builds the
    contingency table (|X|·|Y| rows — KBs even at 100 TB); marginals
    are window sums over that table, never a second corpus pass."""
    d = load_table(spark, sf_dir, "documents")

    def mi_for(feat: Column, name: str) -> DataFrame:
        ct = d.groupBy(feat.alias("x"), F.col("lang").alias("y")).agg(
            F.count(F.lit(1)).cast("bigint").alias("nxy")
        )
        wx = Window.partitionBy("x")
        wy = Window.partitionBy("y")
        wall = Window.partitionBy()
        cells = ct.select(
            "nxy",
            F.sum("nxy").over(wx).alias("nx"),
            F.sum("nxy").over(wy).alias("ny"),
            F.sum("nxy").over(wall).alias("n"),
        ).select(
            "nxy",
            "n",
            F.floor(
                F.lit(MI_SCALE)
                * F.log2(
                    F.col("nxy").cast("double")
                    * F.col("n")
                    / (F.col("nx").cast("double") * F.col("ny"))
                )
            )
            .cast("bigint")
            .alias("cell_q"),
        )
        return cells.groupBy("n").agg(
            F.sum(F.col("nxy") * F.col("cell_q")).cast("bigint").alias("mi_scaled_q"),
            F.round(
                F.sum(F.col("nxy") * F.col("cell_q")).cast("double")
                / F.first("n")
                / MI_SCALE,
                6,
            ).alias("mi_bits"),
        ).select(F.lit(name).alias("feature"), "n", "mi_scaled_q", "mi_bits")

    len_bin = (F.length(F.conv(F.col("n_chars").cast("string"), 10, 2)) - 1).cast(
        "bigint"
    )
    return mi_for(F.col("source"), "source").union(
        mi_for(len_bin, "len_log2")
    ).orderBy("feature")


# --- E368: ridge regression via normal equations -------------------------

RIDGE_LAMBDA = 1


@query(
    "ml_ridge_normal_equation",
    oracle=f"""
        WITH g AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS sx1,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sx2,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sy,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
                            * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE)
                       AS sx1x1,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
                            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                       AS sx1x2,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                       AS sx2x2,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sx1y,
                   CAST(SUM(CAST(l_discount AS DECIMAL(18,2))
                            * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS sx2y
            FROM lineitem
        ),
        a AS (
            SELECT n, sy, sx1y, sx2y,
                   CAST(n AS DOUBLE) AS a00, sx1 AS a01, sx2 AS a02,
                   sx1 AS a10, sx1x1 + {RIDGE_LAMBDA} AS a11, sx1x2 AS a12,
                   sx2 AS a20, sx1x2 AS a21, sx2x2 + {RIDGE_LAMBDA} AS a22
            FROM g
        ),
        s AS (
            SELECT n, sy, sx1y, sx2y, a00, a01, a02, a10, a11, a12,
                   a20, a21, a22,
                   a00 * (a11 * a22 - a12 * a21)
                   - a01 * (a10 * a22 - a12 * a20)
                   + a02 * (a10 * a21 - a11 * a20) AS det
            FROM a
        )
        SELECT n,
               ROUND((sy * (a11 * a22 - a12 * a21)
                      - a01 * (sx1y * a22 - a12 * sx2y)
                      + a02 * (sx1y * a21 - a11 * sx2y)) / det, 6) AS beta0,
               ROUND((a00 * (sx1y * a22 - a12 * sx2y)
                      - sy * (a10 * a22 - a12 * a20)
                      + a02 * (a10 * sx2y - sx1y * a20)) / det, 6) AS beta1,
               ROUND((a00 * (a11 * sx2y - sx1y * a21)
                      - a01 * (a10 * sx2y - sx1y * a20)
                      + sy * (a10 * a21 - a11 * a20)) / det, 6) AS beta2
        FROM s
    """,
    tags=("E368",),
)
def ml_ridge_normal_equation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form ridge regression (normal equations) of
    l_extendedprice on (l_quantity, l_discount) with an intercept:
    accumulate the 3×3 Gram matrix X'X and X'y in ONE distributed
    aggregate, add λ={RIDGE_LAMBDA} to the slope diagonal (intercept
    unpenalized), solve by Cramer's rule in a final scalar expression.
    The "d is small, n is huge" regression every warehouse runs — one
    pass, no iterations, no driver-side data.

    Exact algebra: all Gram sums go through exact DECIMAL accumulation
    (order-independent; quantity is integral, discount/price are 2 dp,
    so every product is an exact decimal), then the Cramer expansion
    is an identical double expression tree on both engines —
    bit-identical betas before the final ROUND(·, 6).

    Scale shape: d features cost one d²-wide partial aggregate —
    map-side combined, a single scalar row crosses the exchange; at
    100 TB it is a pure scan-bound job.  Contrast with
    ml_gradient_descent_linear (iterative) — this is the one-shot
    exact path."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = dec("l_quantity", 0)
    x2 = dec("l_discount", 2)
    y = dec("l_extendedprice", 2)
    g = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x1).cast("double").alias("sx1"),
        F.sum(x2).cast("double").alias("sx2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x1 * x1).cast("double").alias("sx1x1"),
        F.sum(x1 * x2).cast("double").alias("sx1x2"),
        F.sum(x2 * x2).cast("double").alias("sx2x2"),
        F.sum(x1 * y).cast("double").alias("sx1y"),
        F.sum(x2 * y).cast("double").alias("sx2y"),
    )
    a = g.select(
        "n",
        "sy",
        "sx1y",
        "sx2y",
        F.col("n").cast("double").alias("a00"),
        F.col("sx1").alias("a01"),
        F.col("sx2").alias("a02"),
        F.col("sx1").alias("a10"),
        (F.col("sx1x1") + RIDGE_LAMBDA).alias("a11"),
        F.col("sx1x2").alias("a12"),
        F.col("sx2").alias("a20"),
        F.col("sx1x2").alias("a21"),
        (F.col("sx2x2") + RIDGE_LAMBDA).alias("a22"),
    )
    s = a.withColumn(
        "det",
        F.col("a00") * (F.col("a11") * F.col("a22") - F.col("a12") * F.col("a21"))
        - F.col("a01") * (F.col("a10") * F.col("a22") - F.col("a12") * F.col("a20"))
        + F.col("a02") * (F.col("a10") * F.col("a21") - F.col("a11") * F.col("a20")),
    )
    return s.select(
        "n",
        F.round(
            (
                F.col("sy") * (F.col("a11") * F.col("a22") - F.col("a12") * F.col("a21"))
                - F.col("a01") * (F.col("sx1y") * F.col("a22") - F.col("a12") * F.col("sx2y"))
                + F.col("a02") * (F.col("sx1y") * F.col("a21") - F.col("a11") * F.col("sx2y"))
            )
            / F.col("det"),
            6,
        ).alias("beta0"),
        F.round(
            (
                F.col("a00") * (F.col("sx1y") * F.col("a22") - F.col("a12") * F.col("sx2y"))
                - F.col("sy") * (F.col("a10") * F.col("a22") - F.col("a12") * F.col("a20"))
                + F.col("a02") * (F.col("a10") * F.col("sx2y") - F.col("sx1y") * F.col("a20"))
            )
            / F.col("det"),
            6,
        ).alias("beta1"),
        F.round(
            (
                F.col("a00") * (F.col("a11") * F.col("sx2y") - F.col("sx1y") * F.col("a21"))
                - F.col("a01") * (F.col("a10") * F.col("sx2y") - F.col("sx1y") * F.col("a20"))
                + F.col("sy") * (F.col("a10") * F.col("a21") - F.col("a11") * F.col("a20"))
            )
            / F.col("det"),
            6,
        ).alias("beta2"),
    )


# --- E373: exact fixed-point k-means (Lloyd, 2 rounds) -------------------

KM_K = 8
KM_ROUNDS = 2
KM_SCALE = 1 << 20
KM_INERTIA_SHIFT = 10  # report inertia as sum(dist >> 10): overflow-safe


def _km_oracle() -> str:
    from potpot_spark.functions.numeric import phash60_expr

    def assign(cte_pts: str, cte_c: str, out: str) -> str:
        return f"""
        {out}d AS (
            SELECT p.vec_id, c.cid,
                   CAST(SUM((p.q - c.cq) * (p.q - c.cq)) AS BIGINT) AS dist
            FROM {cte_pts} p JOIN {cte_c} c ON c.dim = p.dim
            GROUP BY p.vec_id, c.cid
        ),
        {out} AS (
            SELECT vec_id, cid, dist FROM (
                SELECT vec_id, cid, dist,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dist, cid) AS rn
                FROM {out}d
            ) WHERE rn = 1
        )"""

    return f"""
        WITH pts AS (
            SELECT vec_id, d.i AS dim,
                   CAST(ROUND(CAST(embedding[d.i] AS DOUBLE) * {KM_SCALE})
                        AS BIGINT) AS q
            FROM embeddings, (SELECT unnest(range(1, 10001)) AS i) d
            WHERE d.i <= len(embedding)
        ),
        seeds AS (
            SELECT vec_id, CAST(rn AS INT) AS cid FROM (
                SELECT vec_id,
                       row_number() OVER (
                           ORDER BY {phash60_expr("CAST(vec_id AS VARCHAR)")},
                                    vec_id) AS rn
                FROM embeddings
            ) WHERE rn <= {KM_K}
        ),
        c0 AS (
            SELECT s.cid, p.dim, p.q AS cq
            FROM seeds s JOIN pts p ON p.vec_id = s.vec_id
        ),
        {assign("pts", "c0", "a1")},
        c1 AS (
            SELECT a.cid, p.dim,
                   CAST(FLOOR(CAST(SUM(p.q) AS DOUBLE) / COUNT(*)) AS BIGINT)
                       AS cq
            FROM a1 a JOIN pts p ON p.vec_id = a.vec_id
            GROUP BY a.cid, p.dim
        ),
        {assign("pts", "c1", "a2")}
        SELECT cid AS centroid_id,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(dist // {1 << KM_INERTIA_SHIFT}) AS BIGINT)
                   AS inertia_kq
        FROM a2
        GROUP BY cid
        ORDER BY cid
    """


@query("ml_kmeans_fixed_point", oracle=_km_oracle(), tags=("E373",))
def ml_kmeans_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed k-means (Lloyd's algorithm, k={KM_K},
    {KM_ROUNDS} rounds) over the embedding table — the clustering
    step behind IVF index training, SemDeDup-style semantic dedup,
    and topic bucketing, here with a FULL value oracle: coordinates
    are quantized once to 2^20 fixed-point BIGINTs, so every distance,
    every argmin, every centroid update is integer-exact and the
    whole trajectory reproduces bit-for-bit in DuckDB (the IVF ops
    keep float k-means engine-internal and are rows-only by declared
    design — this op is the checkable twin).

    Determinism pins: seeds are the {KM_K} lowest (phash60(vec_id),
    vec_id) points (content-independent, no RNG); assignment ties
    break (dist, cid) ascending; centroid update is
    FLOOR(sum/count) — floor division via double on <2^53 sums,
    identical in both engines; inertia is reported as
    sum(dist >> {KM_INERTIA_SHIFT}) so the per-cluster total cannot
    overflow BIGINT even at adversarial spread.

    Scale shape: each round is one (points×k) distance aggregate —
    shuffle on (vec_id) then (cid, dim), both map-side combined; the
    centroid table is k·d rows and broadcasts.  At 100 TB rounds are
    scan-bound; k-means|| seeding would replace the hash seeds, and
    the quantized algebra carries over unchanged."""
    from potpot_spark.functions.numeric import phash60

    emb = load_table(spark, sf_dir, "embeddings")
    pts = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("v").cast("double") * KM_SCALE).cast("bigint").alias("q"),
    )
    seeds = (
        emb.select(
            "vec_id", phash60(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(KM_K)
        .select(
            "vec_id",
            F.row_number()
            .over(Window.orderBy("h", "vec_id"))
            .cast("int")
            .alias("cid"),
        )
    )
    cent = seeds.join(pts, "vec_id").select("cid", "dim", F.col("q").alias("cq"))

    assign = None
    for _ in range(KM_ROUNDS):
        diff = F.col("q") - F.col("cq")
        dists = (
            pts.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum(diff * diff).cast("bigint").alias("dist"))
        )
        assign = dists.groupBy("vec_id").agg(
            F.min(F.struct("dist", "cid")).alias("_m")
        ).select("vec_id", F.col("_m.cid").alias("cid"), F.col("_m.dist").alias("dist"))
        cent = (
            assign.join(pts, "vec_id")
            .groupBy("cid", "dim")
            .agg(
                F.floor(F.sum("q").cast("double") / F.count(F.lit(1)))
                .cast("bigint")
                .alias("cq")
            )
        )
    return (
        assign.groupBy(F.col("cid").alias("centroid_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum(F.shiftright(F.col("dist"), KM_INERTIA_SHIFT))
            .cast("bigint")
            .alias("inertia_kq"),
        )
        .orderBy("centroid_id")
    )


# --- E382: gradient-boosted decision stumps (squared loss) ---------------

BOOST_ROUNDS = 2


def _boost_round_sql(src: str, r: int) -> str:
    nxt = f"base{r + 1}"
    return f"""
        f{r} AS (
            SELECT 1 AS f, x1 AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
                   SUM(CAST(y AS HUGEINT)) AS s,
                   SUM(CAST(y AS HUGEINT) * y) AS ss
            FROM {src} GROUP BY x1
            UNION ALL
            SELECT 2 AS f, x2 AS v, CAST(COUNT(*) AS BIGINT) AS cnt,
                   SUM(CAST(y AS HUGEINT)) AS s,
                   SUM(CAST(y AS HUGEINT) * y) AS ss
            FROM {src} GROUP BY x2
        ),
        c{r} AS (
            SELECT f, v,
                   SUM(cnt) OVER w AS cl, SUM(s) OVER w AS sl,
                   SUM(ss) OVER w AS ssl,
                   SUM(cnt) OVER wf AS ct, SUM(s) OVER wf AS st,
                   SUM(ss) OVER wf AS sst
            FROM f{r}
            WINDOW w AS (PARTITION BY f ORDER BY v
                         ROWS UNBOUNDED PRECEDING),
                   wf AS (PARTITION BY f)
        ),
        e{r} AS (
            SELECT f, v, cl, ct - cl AS cr, sl, ssl, st, sst,
                   CAST(FLOOR(CAST(sl AS DOUBLE) / cl) AS BIGINT) AS mul,
                   CAST(FLOOR(CAST(st - sl AS DOUBLE) / (ct - cl)) AS BIGINT)
                       AS mur
            FROM c{r} WHERE ct - cl > 0
        ),
        g{r} AS (
            SELECT f, v, mul, mur,
                   (ssl - 2 * CAST(mul AS HUGEINT) * sl
                        + CAST(cl AS HUGEINT) * mul * mul)
                   + ((sst - ssl) - 2 * CAST(mur AS HUGEINT) * (st - sl)
                        + CAST(cr AS HUGEINT) * mur * mur) AS sse
            FROM e{r}
        ),
        b{r} AS (
            SELECT f, v, mul, mur, sse FROM g{r}
            ORDER BY sse, f, v LIMIT 1
        ),
        {nxt} AS (
            SELECT x1, x2,
                   y - CASE WHEN (b.f = 1 AND x1 <= b.v)
                              OR (b.f = 2 AND x2 <= b.v)
                            THEN b.mul ELSE b.mur END AS y
            FROM {src}, b{r} b
        )"""


def _boost_oracle() -> str:
    rounds = ",".join(
        _boost_round_sql(f"base{r}", r) for r in range(1, BOOST_ROUNDS + 1)
    )
    finals = "\n            UNION ALL ".join(
        f"SELECT {r} AS rnd, f AS feature, v AS threshold, mul AS mu_left, "
        f"mur AS mu_right, "
        f"CAST(FLOOR(CAST(sse AS DOUBLE) / 1000000) AS BIGINT) AS sse_millions "
        f"FROM b{r}"
        for r in range(1, BOOST_ROUNDS + 1)
    )
    return f"""
        WITH base1 AS (
            SELECT CAST(l_quantity AS BIGINT) AS x1,
                   CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        {rounds}
        SELECT rnd, feature, threshold, mu_left, mu_right, sse_millions
        FROM ({finals})
        ORDER BY rnd
    """


@query("ml_gradient_boosted_stumps", oracle=_boost_oracle(), tags=("E382",))
def ml_gradient_boosted_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gradient boosting with depth-1 trees (decision stumps) under
    squared loss, {BOOST_ROUNDS} rounds, fully in-engine and fully
    exact: each round scans every (feature, threshold) candidate via
    per-feature value-grouped stats + running prefix sums (the
    histogram trick every GBDT library uses), picks the SSE-minimizing
    stump with a (sse, feature, threshold) tie-break, and fits the
    next round on integer residuals.  The missing ensemble-tree
    primitive next to the linear learners (GD, ridge) and the single
    split (ml_decision_split_gini).

    Exactness: targets are integer cents; leaf means are
    FLOOR(sum/cnt) (sums < 2^53, double floor-division exact); SSE is
    assembled from Σy², Σy, n in 128-bit-exact arithmetic (HUGEINT in
    DuckDB, DECIMAL(38,0) in Spark — values ≤ ~10^21 fit both), so
    the argmin and the whole boosting trajectory are bit-identical.

    Scale shape: per round, ONE pass builds per-(feature, value)
    histograms (map-side combined; candidates = distinct values, not
    rows); prefix sums run over the tiny histogram; the chosen stump
    is a 1-row driver scalar and residuals are a map-side expression.
    At 100 TB with continuous features, the same plan runs on
    quantile-binned histograms (256 bins) — the LightGBM recipe."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("bigint").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    d38 = "decimal(38,0)"
    out_rows = []
    cur = base
    for r in range(1, BOOST_ROUNDS + 1):
        hists = []
        for fi, xc in ((1, "x1"), (2, "x2")):
            hists.append(
                cur.groupBy(F.col(xc).alias("v"))
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("cnt"),
                    F.sum(F.col("y").cast(d38)).alias("s"),
                    F.sum((F.col("y") * F.col("y")).cast(d38)).alias("ss"),
                )
                .select(F.lit(fi).alias("f"), "v", "cnt", "s", "ss")
            )
        hist = hists[0].unionByName(hists[1])
        w = (
            Window.partitionBy("f")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = Window.partitionBy("f")
        c = hist.select(
            "f",
            "v",
            F.sum("cnt").over(w).alias("cl"),
            F.sum("s").over(w).alias("sl"),
            F.sum("ss").over(w).alias("ssl"),
            F.sum("cnt").over(wf).alias("ct"),
            F.sum("s").over(wf).alias("st"),
            F.sum("ss").over(wf).alias("sst"),
        ).where(F.col("ct") - F.col("cl") > 0)
        mul = F.floor(F.col("sl").cast("double") / F.col("cl")).cast("bigint")
        mur = F.floor(
            (F.col("st") - F.col("sl")).cast("double")
            / (F.col("ct") - F.col("cl"))
        ).cast("bigint")
        e = c.select(
            "f", "v", "cl", (F.col("ct") - F.col("cl")).alias("cr"),
            "sl", "ssl", "st", "sst", mul.alias("mul"), mur.alias("mur"),
        )
        sse = (
            F.col("ssl")
            - 2 * F.col("mul").cast(d38) * F.col("sl")
            + F.col("cl").cast(d38) * F.col("mul") * F.col("mul")
        ) + (
            (F.col("sst") - F.col("ssl"))
            - 2 * F.col("mur").cast(d38) * (F.col("st") - F.col("sl"))
            + F.col("cr").cast(d38) * F.col("mur") * F.col("mur")
        )
        best = (
            e.select("f", "v", "mul", "mur", sse.alias("sse"))
            .orderBy("sse", "f", "v")
            .first()
        )
        out_rows.append(
            (
                r,
                best["f"],
                best["v"],
                best["mul"],
                best["mur"],
                int(float(best["sse"]) // 1_000_000),
            )
        )
        xc = "x1" if best["f"] == 1 else "x2"
        pred = F.when(F.col(xc) <= best["v"], best["mul"]).otherwise(best["mur"])
        cur = cur.select("x1", "x2", (F.col("y") - pred).alias("y"))
    return spark.createDataFrame(
        out_rows,
        "rnd INT, feature INT, threshold BIGINT, mu_left BIGINT,"
        " mu_right BIGINT, sse_millions BIGINT",
    ).orderBy("rnd")


ENET_ITERS = 10
ENET_L1_PER_N = 1024.0   # l1 penalty per row (dyadic)
ENET_L2_PER_N = 256.0    # l2 penalty per row (dyadic)


def _enet_oracle() -> str:
    """Unrolled elastic-net coordinate descent: Gauss-Seidel b1/b2
    updates with soft-thresholding, scalar algebra over exact-decimal
    sufficient statistics (the ml_gradient_descent_linear pattern).
    Steps are MATERIALIZED so the chain evaluates linearly."""
    steps = ["s0 AS MATERIALIZED (SELECT 0.0 AS b1, 0.0 AS b2 FROM sums)"]
    st = (
        "CASE WHEN {rho} > l1v THEN ({rho} - l1v) / ({den} + l2v) "
        "WHEN {rho} < -l1v THEN ({rho} + l1v) / ({den} + l2v) "
        "ELSE 0.0 END"
    )
    for i in range(1, ENET_ITERS + 1):
        b1 = st.format(rho="rho1", den="c11")
        steps.append(
            f"s{i} AS MATERIALIZED (SELECT b1, "
            + st.format(rho="(c2y - c12 * b1)", den="c22")
            + " AS b2 FROM ("
            f"SELECT {b1} AS b1, c2y, c12, c22, l1v, l2v FROM ("
            f"SELECT c1y - c12 * s{i - 1}.b2 AS rho1, "
            f"c11, c12, c22, c2y, l1v, l2v "
            f"FROM sums, s{i - 1})))"
        )
    trace = " UNION ALL ".join(
        f"SELECT {i} AS iteration, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2 "
        f"FROM s{i}"
        for i in range(1, ENET_ITERS + 1)
    )
    return f"""
        WITH sums AS MATERIALIZED (
            SELECT
                CAST(SUM(x1 * x1) AS DOUBLE) AS c11,
                CAST(SUM(x2 * x2) AS DOUBLE) AS c22,
                CAST(SUM(x1 * x2) AS DOUBLE) AS c12,
                CAST(SUM(x1 * y) AS DOUBLE) AS c1y,
                CAST(SUM(x2 * y) AS DOUBLE) AS c2y,
                {ENET_L1_PER_N} * COUNT(*) AS l1v,
                {ENET_L2_PER_N} * COUNT(*) AS l2v
            FROM (
                SELECT CAST(l_quantity AS DECIMAL(18,4)) AS x1,
                       CAST(l_discount AS DECIMAL(18,4)) * 100 AS x2,
                       CAST(l_extendedprice AS DECIMAL(18,4)) AS y
                FROM lineitem
            )
        ), {", ".join(steps)}
        SELECT * FROM ({trace}) ORDER BY iteration
    """


@query("ml_elastic_net_coordinate_descent", oracle=_enet_oracle(), tags=("E393",))
def ml_elastic_net_coordinate_descent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ELASTIC-NET regression (L1 + L2) by cyclic coordinate descent —
    the glmnet algorithm — for extendedprice ~ quantity + discount%:
    each coordinate update soft-thresholds its partial residual
    correlation (the L1 shrink-to-zero) and shrinks by the ridge term
    (the L2).  The lasso path's defining behavior is visible in the
    trace: a weak coordinate hits the threshold and snaps to exactly
    0.0.

    The distributed insight is the same as ml_gradient_descent_linear:
    penalized least squares has fixed sufficient statistics (the
    feature Gram matrix and feature-target correlations), so 100 TB is
    scanned ONCE into exact decimal sums; the 10 iterations are then
    O(1) scalar algebra on that aggregate row, replayed driver-side
    (the graph-fixpoint-scalar pattern — unlike the unpenalized GD
    twin, the soft-threshold CASE references its argument three
    times, so unrolling it as a plan expression grows 3^k and OOMs
    Catalyst; the collect moves one 7-double row, not data).  Python
    floats are IEEE doubles, so +,-,*,/ and the threshold comparisons
    replay DuckDB's arithmetic bit-for-bit; rounding happens JVM-side
    (HALF_UP, matching DuckDB ROUND).  Penalties scale with row count
    (dyadic per-row constants), keeping shrinkage meaningful at any
    SF."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("decimal(18,4)")
    x2 = F.col("l_discount").cast("decimal(18,4)") * 100
    y = F.col("l_extendedprice").cast("decimal(18,4)")
    sums = li.agg(
        F.sum(x1 * x1).cast("double").alias("c11"),
        F.sum(x2 * x2).cast("double").alias("c22"),
        F.sum(x1 * x2).cast("double").alias("c12"),
        F.sum(x1 * y).cast("double").alias("c1y"),
        F.sum(x2 * y).cast("double").alias("c2y"),
        (F.lit(ENET_L1_PER_N) * F.count(F.lit(1))).alias("l1v"),
        (F.lit(ENET_L2_PER_N) * F.count(F.lit(1))).alias("l2v"),
    )

    m = sums.collect()[0]
    c11, c22, c12 = m["c11"], m["c22"], m["c12"]
    c1y, c2y, l1v, l2v = m["c1y"], m["c2y"], m["l1v"], m["l2v"]

    def soft(rho: float, den: float) -> float:
        if rho > l1v:
            return (rho - l1v) / (den + l2v)
        if rho < -l1v:
            return (rho + l1v) / (den + l2v)
        return 0.0

    b1, b2 = 0.0, 0.0
    trace = []
    for i in range(1, ENET_ITERS + 1):
        b1 = soft(c1y - c12 * b2, c11)
        b2 = soft(c2y - c12 * b1, c22)
        trace.append((i, b1, b2))
    from pyspark.sql import types as T

    out = spark.createDataFrame(
        trace,
        T.StructType(
            [
                T.StructField("iteration", T.IntegerType()),
                T.StructField("b1", T.DoubleType()),
                T.StructField("b2", T.DoubleType()),
            ]
        ),
    )
    return out.select(
        "iteration",
        F.round("b1", 6).alias("b1"),
        F.round("b2", 6).alias("b2"),
    ).orderBy("iteration")


TREE2_HOUR_GRID = (6, 12, 18)  # child-level splits: hour-of-day


@query(
    "ml_decision_tree_depth2",
    oracle=f"""
        WITH labeled AS (
            SELECT value,
                   CAST(EXTRACT(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT)
                       AS hr,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS label
            FROM events
        ),
        t1 AS (SELECT unnest([{', '.join(str(t) for t in GINI_THRESHOLDS)}])
               AS v_th),
        t2 AS (SELECT unnest([{', '.join(str(h) for h in TREE2_HOUR_GRID)}])
               AS h_th),
        cells AS (
            SELECT a.v_th, b.h_th,
                   CAST(SUM(CASE WHEN l.value < a.v_th AND l.hr < b.h_th
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_ll,
                   CAST(SUM(CASE WHEN l.value < a.v_th AND l.hr < b.h_th
                                 THEN l.label ELSE 0 END) AS BIGINT) AS p_ll,
                   CAST(SUM(CASE WHEN l.value < a.v_th AND l.hr >= b.h_th
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_lr,
                   CAST(SUM(CASE WHEN l.value < a.v_th AND l.hr >= b.h_th
                                 THEN l.label ELSE 0 END) AS BIGINT) AS p_lr,
                   CAST(SUM(CASE WHEN l.value >= a.v_th AND l.hr < b.h_th
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_rl,
                   CAST(SUM(CASE WHEN l.value >= a.v_th AND l.hr < b.h_th
                                 THEN l.label ELSE 0 END) AS BIGINT) AS p_rl,
                   CAST(SUM(CASE WHEN l.value >= a.v_th AND l.hr >= b.h_th
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_rr,
                   CAST(SUM(CASE WHEN l.value >= a.v_th AND l.hr >= b.h_th
                                 THEN l.label ELSE 0 END) AS BIGINT) AS p_rr
            FROM t1 a CROSS JOIN t2 b CROSS JOIN labeled l
            GROUP BY a.v_th, b.h_th
        ),
        scored AS (
            SELECT v_th, h_th,
                   CASE WHEN n_ll = 0 THEN 0.0 ELSE
                     CAST(n_ll*n_ll - p_ll*p_ll - (n_ll-p_ll)*(n_ll-p_ll)
                          AS DOUBLE) / n_ll END
                 + CASE WHEN n_lr = 0 THEN 0.0 ELSE
                     CAST(n_lr*n_lr - p_lr*p_lr - (n_lr-p_lr)*(n_lr-p_lr)
                          AS DOUBLE) / n_lr END AS g_left,
                   CASE WHEN n_rl = 0 THEN 0.0 ELSE
                     CAST(n_rl*n_rl - p_rl*p_rl - (n_rl-p_rl)*(n_rl-p_rl)
                          AS DOUBLE) / n_rl END
                 + CASE WHEN n_rr = 0 THEN 0.0 ELSE
                     CAST(n_rr*n_rr - p_rr*p_rr - (n_rr-p_rr)*(n_rr-p_rr)
                          AS DOUBLE) / n_rr END AS g_right
            FROM cells
        ),
        best AS (
            SELECT v_th,
                   MIN({{'g': g_left, 'h': h_th}}).h AS h_left,
                   MIN({{'g': g_left, 'h': h_th}}).g AS gl,
                   MIN({{'g': g_right, 'h': h_th}}).h AS h_right,
                   MIN({{'g': g_right, 'h': h_th}}).g AS gr
            FROM scored GROUP BY v_th
        )
        SELECT v_th AS root_value_threshold,
               CAST(h_left AS BIGINT) AS left_hour_threshold,
               CAST(h_right AS BIGINT) AS right_hour_threshold,
               ROUND(gl + gr, 9) AS tree_gini_mass
        FROM best
        ORDER BY gl + gr, v_th
        LIMIT 1
    """,
    tags=("E419",),
)
def ml_decision_tree_depth2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT DEPTH-2 DECISION TREE over a threshold grid: the root
    splits on `value`, each child splits on hour-of-day, and the
    chosen tree minimizes total weighted Gini mass — CART's greedy
    level-2 step made exhaustive-exact (grid enumeration instead of
    per-value scan), extending the battery's stump
    (ml_decision_split_gini) and boosted stumps to an interaction-
    capable model: it can express "high value AND evening".

    Exactness: every candidate (root, child-split) cell is ONE
    conditional aggregate of exact BIGINTs — the weighted Gini n*g =
    (n^2 - pos^2 - neg^2)/n is integers + one division; per-root
    child argmins and the final root argmin ride min(struct) with
    threshold tie-breaks.  Plan: one pass over events cross-joined
    with the 8x3 threshold grid (a 24-row broadcast literal — rows
    scale linearly, not by distinct values), one hash aggregate,
    O(grid) finale.  At 100 TB this is the histogram trick every
    distributed GBDT uses: candidate stats in one scan, tree chosen
    from the histogram."""
    e = load_table(spark, sf_dir, "events")
    labeled = e.select(
        "value",
        F.hour("ts").cast("bigint").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias(
            "label"
        ),
    )
    t1 = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(float(t)) for t in GINI_THRESHOLDS])
        ).alias("v_th")
    )
    t2 = spark.range(1).select(
        F.explode(F.array(*[F.lit(h) for h in TREE2_HOUR_GRID])).alias("h_th")
    )
    grid = F.broadcast(t1.crossJoin(t2))
    j = labeled.crossJoin(grid)

    def cnt(cond, lab=False):
        src = F.when(cond, F.col("label") if lab else F.lit(1)).otherwise(0)
        return F.sum(src).cast("bigint")

    lv = F.col("value") < F.col("v_th")
    lh = F.col("hr") < F.col("h_th")
    cells = j.groupBy("v_th", "h_th").agg(
        cnt(lv & lh).alias("n_ll"),
        cnt(lv & lh, True).alias("p_ll"),
        cnt(lv & ~lh).alias("n_lr"),
        cnt(lv & ~lh, True).alias("p_lr"),
        cnt(~lv & lh).alias("n_rl"),
        cnt(~lv & lh, True).alias("p_rl"),
        cnt(~lv & ~lh).alias("n_rr"),
        cnt(~lv & ~lh, True).alias("p_rr"),
    )

    def g(n, p):
        n, p = F.col(n), F.col(p)
        return F.when(n == 0, F.lit(0.0)).otherwise(
            (n * n - p * p - (n - p) * (n - p)).cast("double") / n
        )

    scored = cells.select(
        "v_th",
        "h_th",
        (g("n_ll", "p_ll") + g("n_lr", "p_lr")).alias("g_left"),
        (g("n_rl", "p_rl") + g("n_rr", "p_rr")).alias("g_right"),
    )
    best = scored.groupBy("v_th").agg(
        F.min(F.struct(F.col("g_left").alias("g"), F.col("h_th").alias("h"))).alias("bl"),
        F.min(F.struct(F.col("g_right").alias("g"), F.col("h_th").alias("h"))).alias("br"),
    )
    return (
        best.select(
            F.col("v_th").alias("root_value_threshold"),
            F.col("bl.h").cast("bigint").alias("left_hour_threshold"),
            F.col("br.h").cast("bigint").alias("right_hour_threshold"),
            F.round(F.col("bl.g") + F.col("br.g"), 9).alias("tree_gini_mass"),
            (F.col("bl.g") + F.col("br.g")).alias("_tot"),
        )
        .orderBy("_tot", "root_value_threshold")
        .drop("_tot")
        .limit(1)
    )


MCC_THRESHOLD = 100.0  # operating point for the confusion counts


@query(
    "ml_mcc_balanced_metrics",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS label,
                   value AS score
            FROM events
        ),
        conf AS (
            SELECT CAST(SUM(CASE WHEN score > {MCC_THRESHOLD} AND label = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN score > {MCC_THRESHOLD} AND label = 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN score <= {MCC_THRESHOLD} AND label = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
                   CAST(SUM(CASE WHEN score <= {MCC_THRESHOLD} AND label = 0
                                 THEN 1 ELSE 0 END) AS BIGINT) AS tn
            FROM scored
        )
        SELECT tp, fp, fn, tn,
               ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
                      - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
                     / sqrt((CAST(tp + fp AS DOUBLE))
                            * (CAST(tp + fn AS DOUBLE))
                            * (CAST(tn + fp AS DOUBLE))
                            * (CAST(tn + fn AS DOUBLE))), 9) AS mcc,
               ROUND((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                      + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE))
                     / 2.0, 9) AS balanced_accuracy,
               ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                     + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)
                     - 1.0, 9) AS youden_j
        FROM conf
    """,
    tags=("E426",),
)
def ml_mcc_balanced_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATTHEWS CORRELATION + balanced accuracy + Youden's J at a
    fixed operating point: the three imbalance-robust summaries of a
    confusion matrix.  MCC is the full four-cell correlation (the
    only single scalar that punishes BOTH error types under skew —
    accuracy and even F1 can look good while tn or tp collapses);
    balanced accuracy and J are its sensitivity+specificity cousins.
    Completes the eval battery's threshold family
    (ml_eval_binary_classifier's per-threshold counts,
    ml_threshold_sweep_f1's argmax).

    Exact: the four cells are exact BIGINTs from one conditional
    aggregate; each metric is a fixed rational expression (MCC's
    denominator is one sqrt of an exact integer product in double).
    Plan: single scan, single aggregate row — nothing shuffles but
    four longs."""
    e = load_table(spark, sf_dir, "events")
    label = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    pos = F.col("value") > MCC_THRESHOLD
    scored = e.select(label.alias("label"), pos.alias("pos"))
    conf = scored.agg(
        F.count_if(F.col("pos") & (F.col("label") == 1)).cast("bigint").alias("tp"),
        F.count_if(F.col("pos") & (F.col("label") == 0)).cast("bigint").alias("fp"),
        F.count_if(~F.col("pos") & (F.col("label") == 1)).cast("bigint").alias("fn"),
        F.count_if(~F.col("pos") & (F.col("label") == 0)).cast("bigint").alias("tn"),
    )
    tp, fp = F.col("tp").cast("double"), F.col("fp").cast("double")
    fn, tn = F.col("fn").cast("double"), F.col("tn").cast("double")
    mcc = (tp * tn - fp * fn) / F.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    sens = tp / (tp + fn)
    spec = tn / (tn + fp)
    return conf.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(mcc, 9).alias("mcc"),
        F.round((sens + spec) / 2.0, 9).alias("balanced_accuracy"),
        F.round(sens + spec - 1.0, 9).alias("youden_j"),
    )


@query(
    "udf_pandas_cogrouped_asof",
    oracle="""
        WITH purchases AS (
            SELECT user_id, event_id,
                   epoch_us(CAST(ts AS TIMESTAMP)) AS p_tus
            FROM events WHERE event_type = 'purchase'
        ),
        views AS (
            SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS v_tus
            FROM events WHERE event_type = 'view'
        ),
        matched AS (
            SELECT p.user_id, p.event_id, p.p_tus,
                   MAX(v.v_tus) AS last_view_tus
            FROM purchases p
            LEFT JOIN views v
              ON v.user_id = p.user_id AND v.v_tus <= p.p_tus
            GROUP BY p.user_id, p.event_id, p.p_tus
        )
        SELECT user_id, event_id,
               CAST(p_tus - last_view_tus AS BIGINT) AS view_to_buy_us
        FROM matched
        WHERE last_view_tus IS NOT NULL
        ORDER BY user_id, event_id
    """,
    tags=("E429",),
)
def udf_pandas_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COGROUPED applyInPandas — the two-sided Arrow API
    (``groupBy().cogroup().applyInPandas``): purchases and views
    cogroup per user and a pandas ``merge_asof`` finds each
    purchase's most recent preceding view, emitting the
    view-to-purchase latency.  This is the per-key two-stream merge
    shape (reconcile trades vs quotes, impressions vs conversions)
    where BOTH sides of a key need to be in memory together and the
    merge logic lives in pandas — the one Arrow surface the UDF
    family (scalar, iterator, grouped-agg) didn't yet cover.  The
    relational twin is join_asof_events; this op exists to pin the
    cogroup machinery itself against the same semantics.

    Exact: integer-microsecond timestamps end-to-end; merge_asof with
    by='user_id', direction='backward' is exactly the per-user
    MAX(v <= p) oracle; sort order inside each batch is pinned before
    merging.  Scale/cost: cogrouping on the RAW user key paid one
    Python call per user (measured 12.1 s at sf0.1, ~10k calls); the
    cogroup key is therefore a 256-way user BUCKET and merge_asof's
    `by` argument keeps per-user semantics inside each batch — same
    rows, 256 calls, 1.8 s.  Memory bounds by the largest bucket
    (tunable), the same knob every cogroup deployment sizes."""
    import pandas as pd

    from pyspark.sql import types as T

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "event_id", F.col("tus").alias("p_tus"),
        F.pmod(F.col("user_id"), F.lit(256)).alias("bucket"),
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.col("tus").alias("v_tus"),
        F.pmod(F.col("user_id"), F.lit(256)).alias("bucket"),
    )

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("view_to_buy_us", T.LongType()),
        ]
    )

    def merge(p: pd.DataFrame, v: pd.DataFrame) -> pd.DataFrame:
        if p.empty or v.empty:
            return pd.DataFrame(
                {"user_id": [], "event_id": [], "view_to_buy_us": []}
            ).astype({"user_id": "int64", "event_id": "int64",
                      "view_to_buy_us": "int64"})
        p = p.sort_values("p_tus", kind="mergesort")
        v = v.sort_values("v_tus", kind="mergesort")
        m = pd.merge_asof(
            p, v[["user_id", "v_tus"]], by="user_id",
            left_on="p_tus", right_on="v_tus", direction="backward",
        )
        m = m.dropna(subset=["v_tus"])
        return pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "event_id": m["event_id"].astype("int64"),
                "view_to_buy_us": (m["p_tus"] - m["v_tus"]).astype("int64"),
            }
        )

    out = (
        purchases.groupBy("bucket")
        .cogroup(views.groupBy("bucket"))
        .applyInPandas(merge, schema)
    )
    return out.orderBy("user_id", "event_id")


REG_LAG = 7  # seasonal-naive horizon the metrics evaluate


@query(
    "ml_regression_metrics_suite",
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        pred AS (
            SELECT event_type, day, c,
                   lag(c, {REG_LAG}) OVER (PARTITION BY event_type
                                           ORDER BY day) AS yhat
            FROM daily
        ),
        err AS (
            SELECT event_type, c, yhat, c - yhat AS e,
                   abs(c - yhat) AS ae,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY abs(c - yhat), day) AS ae_rn,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM pred WHERE yhat IS NOT NULL
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(ae) // MAX(n) AS BIGINT) AS mae_floor,
               ROUND(sqrt(CAST(SUM(e * e) AS DOUBLE)
                          / CAST(MAX(n) AS DOUBLE)), 9) AS rmse,
               CAST(SUM(CASE WHEN c > 0
                             THEN ae * 1000000 // c ELSE 0 END)
                    // MAX(n) AS BIGINT) AS mape_ppm,
               CAST(MAX(CASE WHEN ae_rn * 2 <= n + 1 THEN ae END)
                    AS BIGINT) AS median_ae,
               ROUND(1.0 - CAST(MAX(n) AS DOUBLE) * CAST(SUM(e * e) AS DOUBLE)
                     / (CAST(MAX(n) AS DOUBLE) * CAST(SUM(c * c) AS DOUBLE)
                        - CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)),
                     9) AS r2
        FROM err
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("E431",),
)
def ml_regression_metrics_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE REGRESSION EVAL TOOLBOX — MAE, RMSE, MAPE, median-AE and
    R² in one pass — for the lag-{REG_LAG} seasonal-naive forecaster
    on each event_type's daily counts: the metric battery every
    forecast comparison starts from, each metric exposing a different
    failure mode (MAE = typical miss, RMSE = tail-weighted, MAPE =
    relative, median-AE = robust, R² = vs the mean baseline; a model
    can win four and lose the fifth).  The seasonal-naive target
    makes the suite self-contained and gives every fancier model in
    the battery (Holt-Winters, Croston, backtests) a common floor to
    beat.

    Exact: errors are integer count differences; MAE and MAPE ride
    integer floor divisions (MAPE per-row quantized to ppm BEFORE the
    sum — order-free), median-AE is a rank pick, R² is spelled as the
    cross-multiplied rational 1 − nΣe²/(nΣy²−(Σy)²), RMSE's one sqrt
    is the only irrational step.  Plan: one lag window + one
    aggregate per series — a single series-key shuffle."""
    e = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window as W

    daily = e.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wl = W.partitionBy("event_type").orderBy("day")
    pred = daily.select(
        "event_type",
        "day",
        "c",
        F.lag("c", REG_LAG).over(wl).alias("yhat"),
    ).where(F.col("yhat").isNotNull())
    ae = F.abs(F.col("c") - F.col("yhat"))
    wr = W.partitionBy("event_type").orderBy(ae, "day")
    wn = W.partitionBy("event_type")
    err = pred.select(
        "event_type",
        "c",
        (F.col("c") - F.col("yhat")).alias("e"),
        ae.alias("ae"),
        F.row_number().over(wr).alias("ae_rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    nd = F.max("n").cast("double")
    se = F.sum(F.col("e") * F.col("e")).cast("double")
    sc = F.sum("c").cast("double")
    scc = F.sum(F.col("c") * F.col("c")).cast("double")
    return (
        err.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.expr("CAST(SUM(ae) div MAX(n) AS BIGINT)").alias("mae_floor"),
            F.round(F.sqrt(se / nd), 9).alias("rmse"),
            F.expr(
                "CAST(SUM(CASE WHEN c > 0 THEN (ae * 1000000) div c"
                " ELSE 0 END) div MAX(n) AS BIGINT)"
            ).alias("mape_ppm"),
            F.max(
                F.when(F.col("ae_rn") * 2 <= F.col("n") + 1, F.col("ae"))
            ).cast("bigint").alias("median_ae"),
            F.round(1.0 - nd * se / (nd * scc - sc * sc), 9).alias("r2"),
        )
        .orderBy("event_type")
    )


@query(
    "ml_fisher_lda_two_feature",
    oracle="""
        WITH r AS (
            SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS cls,
                   CAST(l_quantity AS BIGINT) AS x1,
                   CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)
                       AS x2
            FROM lineitem WHERE l_returnflag IN ('R', 'N')
        ),
        m AS (
            SELECT cls,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x1) AS BIGINT) AS s1,
                   CAST(SUM(x2) AS BIGINT) AS s2,
                   CAST(SUM(x1 * x1) AS BIGINT) AS s11,
                   CAST(SUM(x2 * x2) AS BIGINT) AS s22,
                   CAST(SUM(x1 * x2) AS BIGINT) AS s12
            FROM r GROUP BY cls
        ),
        p AS (
            SELECT MAX(CASE WHEN cls = 0 THEN n END) AS n0,
                   MAX(CASE WHEN cls = 1 THEN n END) AS n1,
                   MAX(CASE WHEN cls = 0 THEN s1 END) AS a1,
                   MAX(CASE WHEN cls = 0 THEN s2 END) AS a2,
                   MAX(CASE WHEN cls = 1 THEN s1 END) AS b1,
                   MAX(CASE WHEN cls = 1 THEN s2 END) AS b2,
                   MAX(CASE WHEN cls = 0 THEN s11 END) AS a11,
                   MAX(CASE WHEN cls = 0 THEN s22 END) AS a22,
                   MAX(CASE WHEN cls = 0 THEN s12 END) AS a12,
                   MAX(CASE WHEN cls = 1 THEN s11 END) AS b11,
                   MAX(CASE WHEN cls = 1 THEN s22 END) AS b22,
                   MAX(CASE WHEN cls = 1 THEN s12 END) AS b12
            FROM m
        ),
        sw AS (
            SELECT n0, n1,
                   CAST(a1 AS DOUBLE) / n0 AS m01,
                   CAST(a2 AS DOUBLE) / n0 AS m02,
                   CAST(b1 AS DOUBLE) / n1 AS m11,
                   CAST(b2 AS DOUBLE) / n1 AS m12,
                   (CAST(a11 AS DOUBLE) - CAST(a1 AS DOUBLE) * a1 / n0)
                 + (CAST(b11 AS DOUBLE) - CAST(b1 AS DOUBLE) * b1 / n1)
                       AS sw11,
                   (CAST(a22 AS DOUBLE) - CAST(a2 AS DOUBLE) * a2 / n0)
                 + (CAST(b22 AS DOUBLE) - CAST(b2 AS DOUBLE) * b2 / n1)
                       AS sw22,
                   (CAST(a12 AS DOUBLE) - CAST(a1 AS DOUBLE) * a2 / n0)
                 + (CAST(b12 AS DOUBLE) - CAST(b1 AS DOUBLE) * b2 / n1)
                       AS sw12
            FROM p
        ),
        w AS (
            SELECT n0, n1, m01, m02, m11, m12,
                   (sw22 * (m11 - m01) - sw12 * (m12 - m02))
                       / (sw11 * sw22 - sw12 * sw12) AS w1r,
                   (sw11 * (m12 - m02) - sw12 * (m11 - m01))
                       / (sw11 * sw22 - sw12 * sw12) AS w2r
            FROM sw
        )
        SELECT n0 AS n_class0, n1 AS n_class1,
               ROUND(w1r / sqrt(w1r * w1r + w2r * w2r), 9) AS w_quantity,
               ROUND(w2r / sqrt(w1r * w1r + w2r * w2r), 9) AS w_discount,
               ROUND(w1r * (m11 - m01) + w2r * (m12 - m02), 9)
                   AS fisher_j,
               ROUND((w1r * (m01 + m11) / 2 + w2r * (m02 + m12) / 2)
                     / sqrt(w1r * w1r + w2r * w2r), 9) AS threshold
        FROM w
    """,
    tags=("E444",),
)
def ml_fisher_lda_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FISHER LINEAR DISCRIMINANT for returned-vs-kept lineitems on
    (quantity, discount-cents): the closed-form two-class projection
    w ∝ Sw⁻¹(μ1 - μ0) that maximizes between-class over within-class
    scatter — the oldest supervised direction there is, and the sane
    first look before logistic regression (it IS logistic's decision
    boundary under equal-covariance Gaussians).  Reports the unit
    direction, the Fisher criterion J = dᵀSw⁻¹d (squared Mahalanobis
    separation of the means), and the midpoint threshold.

    Exact: both features are exact integers (quantity; discount via
    DECIMAL(4,2)·100, never double·100), the five per-class moments
    are BIGINT sums, and the 2x2 inverse + normalization is one fixed
    double expression over those integers, identical text on both
    engines, ROUND 9.  Plan: ONE map-side-combined groupBy over 2
    classes, O(1) finale.  100 TB: same single pass; d features cost a
    d² moment vector per class (the covariance-matrix op's pattern),
    nothing iterative."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    )
    r = li.select(
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("cls"),
        F.col("l_quantity").cast("bigint").alias("x1"),
        (F.col("l_discount").cast("decimal(4,2)") * 100)
        .cast("bigint")
        .alias("x2"),
    )
    m = r.groupBy("cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
    )

    def pick(c, col):
        return F.max(F.when(F.col("cls") == c, F.col(col)))

    p = m.agg(
        pick(0, "n").alias("n0"), pick(1, "n").alias("n1"),
        pick(0, "s1").alias("a1"), pick(0, "s2").alias("a2"),
        pick(1, "s1").alias("b1"), pick(1, "s2").alias("b2"),
        pick(0, "s11").alias("a11"), pick(0, "s22").alias("a22"),
        pick(0, "s12").alias("a12"), pick(1, "s11").alias("b11"),
        pick(1, "s22").alias("b22"), pick(1, "s12").alias("b12"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    sw = p.select(
        "n0", "n1",
        (d("a1") / F.col("n0")).alias("m01"),
        (d("a2") / F.col("n0")).alias("m02"),
        (d("b1") / F.col("n1")).alias("m11"),
        (d("b2") / F.col("n1")).alias("m12"),
        ((d("a11") - d("a1") * F.col("a1") / F.col("n0"))
         + (d("b11") - d("b1") * F.col("b1") / F.col("n1"))).alias("sw11"),
        ((d("a22") - d("a2") * F.col("a2") / F.col("n0"))
         + (d("b22") - d("b2") * F.col("b2") / F.col("n1"))).alias("sw22"),
        ((d("a12") - d("a1") * F.col("a2") / F.col("n0"))
         + (d("b12") - d("b1") * F.col("b2") / F.col("n1"))).alias("sw12"),
    )
    det = F.col("sw11") * F.col("sw22") - F.col("sw12") * F.col("sw12")
    w = sw.select(
        "n0", "n1", "m01", "m02", "m11", "m12",
        ((F.col("sw22") * (F.col("m11") - F.col("m01"))
          - F.col("sw12") * (F.col("m12") - F.col("m02"))) / det).alias("w1r"),
        ((F.col("sw11") * (F.col("m12") - F.col("m02"))
          - F.col("sw12") * (F.col("m11") - F.col("m01"))) / det).alias("w2r"),
    )
    norm = F.sqrt(F.col("w1r") * F.col("w1r") + F.col("w2r") * F.col("w2r"))
    return w.select(
        F.col("n0").alias("n_class0"),
        F.col("n1").alias("n_class1"),
        F.round(F.col("w1r") / norm, 9).alias("w_quantity"),
        F.round(F.col("w2r") / norm, 9).alias("w_discount"),
        F.round(
            F.col("w1r") * (F.col("m11") - F.col("m01"))
            + F.col("w2r") * (F.col("m12") - F.col("m02")),
            9,
        ).alias("fisher_j"),
        F.round(
            (
                F.col("w1r") * (F.col("m01") + F.col("m11")) / 2
                + F.col("w2r") * (F.col("m02") + F.col("m12")) / 2
            )
            / norm,
            9,
        ).alias("threshold"),
    )


CONF_ALPHA_PCT = 10   # miscoverage target: 90% intervals
CONF_CAL_MOD = 4      # hash % 4: 3 = calibration, 0 = test, 1-2 = train


@query(
    "ml_conformal_split_intervals",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS y,
                   CAST(('0x' || substring(
                       md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                       AS BIGINT) % {CONF_CAL_MOD} AS fold
            FROM orders
        ),
        model AS (
            SELECT o_orderpriority,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM o WHERE fold IN (1, 2) GROUP BY 1
        ),
        cal AS (
            SELECT CAST(FLOOR(abs(CAST(o.y AS DOUBLE)
                       - CAST(m.sy AS DOUBLE) / m.n)) AS BIGINT) AS s,
                   o.o_orderkey
            FROM o JOIN model m ON m.o_orderpriority = o.o_orderpriority
            WHERE o.fold = 3
        ),
        ranked AS (
            SELECT s, ROW_NUMBER() OVER (ORDER BY s, o_orderkey) AS rnk,
                   COUNT(*) OVER () AS n_cal
            FROM cal
        ),
        qhat AS (
            SELECT s AS q_cents, n_cal FROM ranked
            WHERE rnk = LEAST(CAST(CEIL((n_cal + 1)
                             * (100 - {CONF_ALPHA_PCT}) / 100.0) AS BIGINT),
                             n_cal)
        ),
        test AS (
            SELECT o.o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(COUNT(*) FILTER (
                       CAST(FLOOR(abs(CAST(o.y AS DOUBLE)
                            - CAST(m.sy AS DOUBLE) / m.n)) AS BIGINT)
                       <= (SELECT q_cents FROM qhat)) AS BIGINT)
                       AS n_covered
            FROM o JOIN model m ON m.o_orderpriority = o.o_orderpriority
            WHERE o.fold = 0
            GROUP BY 1
        )
        SELECT o_orderpriority, n_test, n_covered,
               CAST(n_covered * 1000000 // n_test AS BIGINT)
                   AS coverage_ppm,
               (SELECT CAST(n_cal AS BIGINT) FROM qhat) AS n_cal,
               (SELECT q_cents FROM qhat) AS q_cents
        FROM test
        ORDER BY o_orderpriority
    """,
    tags=("E451",),
)
def ml_conformal_split_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT CONFORMAL PREDICTION intervals for order totals under a
    per-priority group-mean model: train folds fit the model,
    the calibration fold's nonconformity scores |y - ŷ| yield q̂ =
    the ⌈(n+1)(1-α)⌉-th smallest score, and every test prediction
    gets the interval ŷ ± q̂ — distribution-free finite-sample
    coverage ≥ 1-α REGARDLESS of how bad the model is (the guarantee
    is over the exchangeable split, not the model), which is why
    conformal is the default uncertainty wrapper in production ML.
    Per-priority test coverage shows the marginal guarantee holding
    while hinting at the conditional-coverage gaps a group-naive q̂
    leaves.

    Exact: folds ride the engine-portable md5 hash (phash60 recipe);
    y is exact cents; scores FLOOR-quantize the |y - mean| double to
    integer cents before ANY ranking or comparison, so the rank-pick
    of q̂ (deterministic (s, orderkey) tie-break) and the coverage
    counts are exact integers.  Plan: one groupBy for the model, one
    WindowGroupLimit-free rank over the calibration minority, one
    broadcast of the 1-row q̂ into the test scan.  100 TB: calibration
    is a fixed hash slice; the global sort is over that slice only —
    swap in percentile_disc for a fully shuffle-light variant."""
    from potpot_spark.functions.numeric import phash60

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
        (phash60(F.col("o_orderkey").cast("string")) % CONF_CAL_MOD).alias(
            "fold"
        ),
    )
    model = (
        o.where(F.col("fold").isin(1, 2))
        .groupBy("o_orderpriority")
        .agg(
            F.sum("y").cast("bigint").alias("sy"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    score = F.floor(
        F.abs(
            F.col("y").cast("double")
            - F.col("sy").cast("double") / F.col("n")
        )
    ).cast("bigint")
    cal = (
        o.where(F.col("fold") == 3)
        .join(F.broadcast(model), "o_orderpriority")
        .select(score.alias("s"), "o_orderkey")
    )
    ranked = cal.select(
        "s",
        F.row_number().over(Window.orderBy("s", "o_orderkey")).alias("rnk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n_cal"),
    )
    # rank clamped to n_cal: when (n+1)(1-alpha) exceeds n (tiny
    # calibration folds) q-hat = max score — the standard conformal
    # clamp — so qhat is non-empty whenever cal has >= 1 row, and the
    # LEFT join below keeps per-priority rows (NULL q_cents/n_cal)
    # even when cal is EMPTY, mirroring the oracle's scalar
    # subqueries on an empty qhat (r8 advice fix)
    qhat = ranked.where(
        F.col("rnk")
        == F.least(
            F.ceil(
                (F.col("n_cal") + 1) * (100 - CONF_ALPHA_PCT) / 100.0
            ).cast("bigint"),
            F.col("n_cal"),
        )
    ).select(
        F.lit(1).alias("jk"),
        F.col("s").alias("q_cents"),
        F.col("n_cal").cast("bigint").alias("n_cal"),
    )
    test = (
        o.where(F.col("fold") == 0)
        .join(F.broadcast(model), "o_orderpriority")
        .withColumn("jk", F.lit(1))
        .join(F.broadcast(qhat), "jk", "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(F.when(score <= F.col("q_cents"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
            F.max("n_cal").alias("n_cal"),
            F.max("q_cents").alias("q_cents"),
        )
    )
    return test.select(
        "o_orderpriority",
        "n_test",
        "n_covered",
        F.expr("CAST(n_covered * 1000000 div n_test AS BIGINT)").alias(
            "coverage_ppm"
        ),
        "n_cal",
        "q_cents",
    ).orderBy("o_orderpriority")


PINBALL_TAUS = (1, 5, 9)  # tau * 10: the 10th / 50th / 90th percentiles


@query(
    "ml_pinball_quantile_eval",
    oracle=f"""
        WITH o AS (
            SELECT o_orderkey, o_orderpriority,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS y,
                   CAST(('0x' || substring(
                       md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
                       AS BIGINT) % {CONF_CAL_MOD} AS fold
            FROM orders
        ),
        ranked AS (
            SELECT o_orderpriority, y,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                       ORDER BY y, o_orderkey) AS rnk,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM o WHERE fold IN (1, 2)
        ),
        taus AS (SELECT unnest(ARRAY{list(PINBALL_TAUS)}) AS t10),
        q AS (
            SELECT r.o_orderpriority, taus.t10, r.y AS q_cents
            FROM ranked r JOIN taus
              ON r.rnk = (r.n * taus.t10 + 9) // 10
        ),
        test AS (
            SELECT o.o_orderpriority, q.t10, q.q_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_test,
                   CAST(SUM(GREATEST(q.t10 * (o.y - q.q_cents),
                                     (q.t10 - 10) * (o.y - q.q_cents)))
                        AS BIGINT) AS loss_fp10
            FROM o JOIN q ON q.o_orderpriority = o.o_orderpriority
            WHERE o.fold = 0
            GROUP BY 1, 2, 3
        )
        SELECT o_orderpriority, t10 AS tau_x10, q_cents, n_test,
               CAST(loss_fp10 // (10 * n_test) AS BIGINT)
                   AS mean_pinball_cents
        FROM test
        ORDER BY o_orderpriority, tau_x10
    """,
    tags=("E466",),
)
def ml_pinball_quantile_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PINBALL (quantile) LOSS EVALUATION of per-priority quantile
    predictors at τ = 0.1/0.5/0.9 — THE metric for probabilistic
    forecasts (demand quantiles, latency SLOs, prediction intervals):
    ρ_τ(y - q) = max(τ(y-q), (τ-1)(y-q)) penalizes under-prediction
    τ:(1-τ) against over-prediction, so the loss-minimizing constant
    IS the τ-quantile — evaluating a median model with MAE and a P90
    model with pinball-0.9 on the same scan is how forecast suites
    grade a quantile ladder.

    Exact: the predictor is the explicit ⌈τ·n⌉-th order statistic —
    rank pick (n·t10 + 9) div 10 with deterministic (y, orderkey)
    tie-break, no interpolation ambiguity cross-engine — and the loss
    rides a x10 fixed point (t10 integer), summed exactly before one
    final `div`.  Plan: one window over the train minority, a 3-row
    tau grid joined ON THE RANK (broadcast), one test-fold aggregate.
    100 TB: the rank window is per-group; swap the order statistic
    for percentile_approx when the per-group sort dominates."""
    from potpot_spark.functions.numeric import phash60

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
        (phash60(F.col("o_orderkey").cast("string")) % CONF_CAL_MOD).alias(
            "fold"
        ),
    )
    ranked = (
        o.where(F.col("fold").isin(1, 2))
        .select(
            "o_orderpriority",
            "y",
            F.row_number()
            .over(
                Window.partitionBy("o_orderpriority").orderBy(
                    "y", "o_orderkey"
                )
            )
            .alias("rnk"),
            F.count(F.lit(1))
            .over(Window.partitionBy("o_orderpriority"))
            .alias("n"),
        )
    )
    taus = spark.createDataFrame(
        [(t,) for t in PINBALL_TAUS], "t10 int"
    )
    q = ranked.join(
        F.broadcast(taus),
        F.col("rnk") == F.expr("(n * t10 + 9) div 10"),
    ).select("o_orderpriority", "t10", F.col("y").alias("q_cents"))
    loss = F.greatest(
        F.col("t10") * (F.col("y") - F.col("q_cents")),
        (F.col("t10") - 10) * (F.col("y") - F.col("q_cents")),
    )
    test = (
        o.where(F.col("fold") == 0)
        .join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority", "t10", "q_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(loss).cast("bigint").alias("loss_fp10"),
        )
    )
    return test.select(
        "o_orderpriority",
        F.col("t10").alias("tau_x10"),
        "q_cents",
        "n_test",
        F.expr("CAST(loss_fp10 div (10 * n_test) AS BIGINT)").alias(
            "mean_pinball_cents"
        ),
    ).orderBy("o_orderpriority", "tau_x10")


CB_BETA_NUM = 999    # beta = 0.999 — the Cui et al. default
CB_FP = 10**12


@query(
    "ml_class_balanced_weights",
    oracle=f"""
        WITH c AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        ),
        w AS (
            SELECT lang, n,
                   CAST({CB_FP} AS BIGINT)
                       - CAST(FLOOR(pow({CB_BETA_NUM} / 1000.0, n)
                              * {CB_FP}) AS BIGINT) AS eff_den_fp
            FROM c
        ),
        raw AS (
            SELECT lang, n, eff_den_fp,
                   CAST({CB_FP} AS HUGEINT) * 1000000 // eff_den_fp
                       AS w_raw_fp
            FROM w
        )
        SELECT lang, n,
               ROUND(CAST(eff_den_fp AS DOUBLE) / {CB_FP}
                     / (1 - {CB_BETA_NUM} / 1000.0), 6)
                   AS effective_n,
               CAST(w_raw_fp * (SELECT COUNT(*) FROM c) * 1000000
                    // (SELECT SUM(w_raw_fp) FROM raw) AS BIGINT)
                   AS weight_ppm
        FROM raw
        ORDER BY lang
    """,
    tags=("E477",),
)
def ml_class_balanced_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASS-BALANCED LOSS WEIGHTS (Cui et al. 2019, "effective number
    of samples") per document language: w_c ∝ (1-β)/(1-β^{n_c}) with
    β = 0.{CB_BETA_NUM} — the re-weighting that interpolates between
    no re-weighting (β=0) and inverse-frequency (β→1) by modeling
    diminishing returns of near-duplicate samples.  This is the
    training-pipeline knob that pairs with the temperature-mixing
    sampler already registered: mixing fixes the DATA distribution,
    these weights fix the LOSS for whatever imbalance remains.

    Exact: the single transcendental β^n is FLOOR-quantized ONCE per
    class at 1e-12 (the libm discipline — one quantization, then pure
    integers), raw weights are integer cross-multiplications on
    HUGEINT/decimal38, and the normalized weight (Σw = k·1e6 ppm) is
    an integer ratio of sums; effective_n is reported alongside,
    rounded.  Plan: one per-class aggregate, scalar algebra over
    |langs| rows.  100 TB: one map-side-combined groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    beta = CB_BETA_NUM / 1000.0
    w = c.select(
        "lang",
        "n",
        (
            F.lit(CB_FP).cast("bigint")
            - F.floor(F.pow(F.lit(beta), F.col("n")) * CB_FP).cast("bigint")
        ).alias("eff_den_fp"),
    )
    raw = w.select(
        "lang",
        "n",
        "eff_den_fp",
        F.expr(
            f"CAST({CB_FP} AS DECIMAL(38,0)) * 1000000 div eff_den_fp"
        ).alias("w_raw_fp"),
    )
    tot = raw.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("w_raw_fp").alias("sw"),
    )
    return (
        raw.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n",
            F.round(
                F.col("eff_den_fp").cast("double") / CB_FP / (1 - beta), 6
            ).alias("effective_n"),
            F.expr(
                "CAST(w_raw_fp * k * 1000000 div sw AS BIGINT)"
            ).alias("weight_ppm"),
        )
        .orderBy("lang")
    )


@query(
    "ml_pr_operating_points",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS label,
                   value AS score
            FROM events
        ),
        by_score AS (
            SELECT score,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(label) AS BIGINT) AS pos
            FROM scored GROUP BY score
        ),
        cum AS (
            SELECT pos,
                   SUM(n) OVER (ORDER BY score DESC
                                ROWS UNBOUNDED PRECEDING) AS cum_n,
                   SUM(pos) OVER (ORDER BY score DESC
                                  ROWS UNBOUNDED PRECEDING) AS cum_pos,
                   SUM(pos) OVER () AS tot_pos
            FROM by_score
        )
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(MAX(cum_n) AS BIGINT) AS n_total,
               CAST(SUM(pos * (cum_pos * 1000000 // cum_n))
                    // SUM(pos) AS BIGINT) AS avg_precision_ppm,
               CAST(MIN(CASE WHEN cum_pos * 2 >= tot_pos
                             THEN cum_pos * 1000000 // cum_n END)
                    AS BIGINT) AS precision_at_recall50_ppm
        FROM cum
    """,
    tags=("E498",),
)
def ml_pr_operating_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR OPERATING POINTS at tie-grouped DISTINCT-SCORE thresholds:
    step AP over the achievable thresholds plus precision at the
    50%-recall operating point — the number a triage pipeline is
    provisioned by.  Differs from the registered per-row
    `ml_average_precision` on both axes that matter: (a) ties enter
    TOGETHER (the sklearn precision_recall_curve convention — a
    per-row tie-break credits precision at ranks no real threshold
    can achieve), and (b) the plan is VOCABULARY-scale: one window
    over distinct scores instead of a row-scale global sort, which is
    the form that survives 100 TB.

    Exact: thresholds are the distinct scores (ties enter together —
    the sklearn step convention); cumulative TP/N come from one
    vocabulary-scale window; each retained threshold contributes
    pos·(cumTP·1e6 div cumN) — all BIGINT — and AP is one final
    integer div by n_pos (a declared floor-AP at ppm grain, identical
    both engines).  Plan: one score rollup, one global-order window
    over distinct scores, one aggregate — the Mann-Whitney shape.
    100 TB: only the rollup sees the corpus."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
        F.col("value").alias("score"),
    )
    by_score = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("label").cast("bigint").alias("pos"),
    )
    w = Window.orderBy(F.col("score").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = by_score.select(
        "pos",
        F.sum("n").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("pos").over(Window.partitionBy()).alias("tot_pos"),
    )
    return cum.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.max("cum_n").cast("bigint").alias("n_total"),
        F.expr(
            "CAST(SUM(pos * (cum_pos * 1000000 div cum_n))"
            " div SUM(pos) AS BIGINT)"
        ).alias("avg_precision_ppm"),
        F.min(
            F.when(
                F.col("cum_pos") * 2 >= F.col("tot_pos"),
                F.expr("cum_pos * 1000000 div cum_n"),
            )
        )
        .cast("bigint")
        .alias("precision_at_recall50_ppm"),
    )


WOE_FP = 10**6


@query(
    "ml_woe_information_value",
    oracle=f"""
        WITH flag AS (
            SELECT o_custkey,
                   MAX(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN 1 ELSE 0 END) AS bad
            FROM orders GROUP BY o_custkey
        ),
        cust AS (
            SELECT NTILE(5) OVER (ORDER BY c.c_acctbal, c.c_custkey) AS bin,
                   COALESCE(f.bad, 0) AS bad
            FROM customer c LEFT JOIN flag f ON f.o_custkey = c.c_custkey
        ),
        cells AS (
            SELECT bin,
                   CAST(SUM(1 - bad) AS BIGINT) AS g,
                   CAST(SUM(bad) AS BIGINT) AS b
            FROM cust GROUP BY bin
        ),
        tot AS (
            SELECT CAST(SUM(g) AS BIGINT) AS gg, CAST(SUM(b) AS BIGINT) AS bb
            FROM cells
        ),
        scored AS (
            SELECT bin, g, b,
                   CAST(FLOOR(ln((CAST(g AS DOUBLE) * (SELECT bb FROM tot))
                                 / (CAST(b AS DOUBLE) * (SELECT gg FROM tot)))
                              * {WOE_FP}) AS BIGINT) AS woe_fp
            FROM cells WHERE g > 0 AND b > 0
        )
        SELECT bin, g AS n_good, b AS n_bad, woe_fp,
               CAST((CAST(g AS HUGEINT) * (SELECT bb FROM tot)
                     - CAST(b AS HUGEINT) * (SELECT gg FROM tot)) * woe_fp
                    // (CAST((SELECT gg FROM tot) AS HUGEINT)
                        * (SELECT bb FROM tot)) AS BIGINT) AS iv_contrib_fp
        FROM scored ORDER BY bin
    """,
    tags=("E507",),
)
def ml_woe_information_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT OF EVIDENCE + INFORMATION VALUE of account-balance
    quintiles against an urgent-order outcome — the credit-scoring
    standard for "how predictive is this feature, bin by bin":
    WOE_i = ln((g_i/G)/(b_i/B)) is the log-odds shift each bin
    carries, and IV = Σ(g_i/G − b_i/B)·WOE_i grades the feature
    (< 0.02 useless, > 0.3 strong).  The binned, sign-carrying
    complement of the registered mutual-information op — WOE feeds
    monotone scorecards directly.

    Exact: the quintile assignment is a deterministic NTILE on
    (acctbal, custkey); WOE quantizes ONE ln of an exact integer
    ratio at 1e6; each IV contribution is (g·B − b·G)·woe div (G·B)
    — all integer products (HUGEINT/decimal38).  Plan: one
    customer-grain outcome rollup (broadcast-joined orders flag), a
    user-scale NTILE, a 5-cell aggregate."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    bad = (
        o.groupBy("o_custkey")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
            ).alias("bad")
        )
    )
    cust = (
        c.join(bad, c.c_custkey == bad.o_custkey, "left")
        .select(
            "c_custkey",
            "c_acctbal",
            F.coalesce(F.col("bad"), F.lit(0)).alias("bad"),
        )
        .select(
            "bad",
            F.ntile(5)
            .over(Window.orderBy("c_acctbal", "c_custkey"))
            .alias("bin"),
        )
    )
    cells = cust.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).cast("bigint").alias("g"),
        F.sum("bad").cast("bigint").alias("b"),
    )
    tot = cells.agg(
        F.sum("g").cast("bigint").alias("gg"),
        F.sum("b").cast("bigint").alias("bb"),
    )
    scored = (
        cells.crossJoin(F.broadcast(tot))
        .where((F.col("g") > 0) & (F.col("b") > 0))
        .select(
            "bin",
            "g",
            "b",
            "gg",
            "bb",
            F.floor(
                F.log(
                    (F.col("g").cast("double") * F.col("bb"))
                    / (F.col("b").cast("double") * F.col("gg"))
                )
                * WOE_FP
            )
            .cast("bigint")
            .alias("woe_fp"),
        )
    )
    return scored.select(
        "bin",
        F.col("g").alias("n_good"),
        F.col("b").alias("n_bad"),
        "woe_fp",
        F.expr(
            "CAST((CAST(g AS DECIMAL(38,0)) * bb"
            " - CAST(b AS DECIMAL(38,0)) * gg) * woe_fp"
            " div (CAST(gg AS DECIMAL(38,0)) * bb) AS BIGINT)"
        ).alias("iv_contrib_fp"),
    ).orderBy("bin")


from potpot_spark.functions.numeric import phash60_expr  # noqa: E402

ADVV_MOD = 2  # phash60(doc_id) % 2: pseudo train/test split


@query(
    "ml_adversarial_validation_auc",
    oracle=f"""
        WITH split AS (
            SELECT n_chars AS score,
                   {phash60_expr("CAST(doc_id AS VARCHAR)")} % {ADVV_MOD}
                       AS is_test
            FROM documents
        ),
        vals AS (
            SELECT score,
                   CAST(COUNT(*) FILTER (WHERE is_test = 0) AS BIGINT) AS a,
                   CAST(COUNT(*) FILTER (WHERE is_test = 1) AS BIGINT) AS b
            FROM split GROUP BY score
        ),
        cum AS (
            SELECT a, b,
                   COALESCE(SUM(b) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_b_below
            FROM vals
        ),
        agg AS (
            SELECT CAST(SUM(a) AS HUGEINT) AS na,
                   CAST(SUM(b) AS HUGEINT) AS nb,
                   CAST(SUM(a * (2 * cum_b_below + b)) AS HUGEINT) AS u2
            FROM cum
        )
        SELECT CAST(na AS BIGINT) AS n_train,
               CAST(nb AS BIGINT) AS n_test,
               CAST(u2 * 1000000 // (2 * na * nb) AS BIGINT) AS auc_x1e6,
               CAST(ABS(u2 * 1000000 // (2 * na * nb) - 500000)
                    AS BIGINT) AS drift_score_x1e6
        FROM agg
    """,
    tags=("E520",),
)
def ml_adversarial_validation_auc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ADVERSARIAL VALIDATION: how well does a feature distinguish
    the "train" split from the "test" split?  AUC of the n_chars
    feature between the two halves of a portable-hash split — AUC ≈
    0.5 means the splits are exchangeable (no leakage, no covariate
    shift); |AUC − 0.5| is the drift score.  THE pre-training sanity
    check run before trusting any validation metric (here the
    self-audit of the engine's own hash splitter; in production the
    two sides are real train vs eval corpora), complementing PSI /
    total-variation drift (distribution distance) with a
    DISCRIMINABILITY readout that works on any rankable feature.

    Exact: the split is the engine's portable 60-bit md5 hash
    (bit-identical in DuckDB), and tie-aware AUC is the Mann-Whitney
    identity on the DISTINCT-VALUE aggregate — U counts test-below
    plus half the ties per train value via the doubled integer U2 =
    Σ_v a_v(2·cumB_< + b_v), one fixed-point division at the end
    (operands ≥ 0).  The distinct-value pass is the vocabulary-scale
    trick the rank-test family uses: the window runs over |values|
    rows, not |rows|.

    Plan: one hash-split projection, one value-grain aggregate, one
    cumulative window over the value table, 1-row algebra.  100 TB:
    value-grain is bounded by feature cardinality; for continuous
    features, bucket to the declared quantization first."""
    from potpot_spark.functions.numeric import phash60

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("score"),
        (phash60(F.col("doc_id").cast("string")) % ADVV_MOD).alias("is_test"),
    )
    vals = docs.groupBy("score").agg(
        F.count(F.when(F.col("is_test") == 0, 1)).cast("bigint").alias("a"),
        F.count(F.when(F.col("is_test") == 1, 1)).cast("bigint").alias("b"),
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.select(
        "a",
        "b",
        F.coalesce(F.sum("b").over(w), F.lit(0)).alias("cum_b_below"),
    )
    d38 = "decimal(38,0)"
    agg = cum.agg(
        F.sum("a").cast(d38).alias("na"),
        F.sum("b").cast(d38).alias("nb"),
        F.sum(F.col("a") * (2 * F.col("cum_b_below") + F.col("b")))
        .cast(d38)
        .alias("u2"),
    )
    return agg.select(
        F.col("na").cast("bigint").alias("n_train"),
        F.col("nb").cast("bigint").alias("n_test"),
        F.expr("CAST(u2 * 1000000 div (2 * na * nb) AS BIGINT)").alias(
            "auc_x1e6"
        ),
        F.expr(
            "CAST(ABS(u2 * 1000000 div (2 * na * nb) - 500000) AS BIGINT)"
        ).alias("drift_score_x1e6"),
    )


@query(
    "ml_mrr_reciprocal_rank",
    oracle="""
        WITH ranked AS (
            SELECT o_custkey,
                   o_orderpriority,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC,
                                               o_orderkey) AS rn
            FROM orders
        ),
        per_cust AS (
            SELECT o_custkey,
                   MIN(CASE WHEN o_orderpriority = '1-URGENT'
                            THEN rn END) AS first_rel
            FROM ranked GROUP BY o_custkey
        ),
        seg AS (
            SELECT c.c_mktsegment,
                   first_rel,
                   CASE WHEN first_rel IS NOT NULL
                        THEN CAST(ROUND(1.0 / first_rel, 12)
                                  AS DECIMAL(20,12)) END AS rr
            FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(COUNT(rr) AS BIGINT) AS n_with_relevant,
               ROUND(CAST(SUM(rr) AS DOUBLE) / COUNT(rr), 9) AS mrr,
               ROUND(CAST(SUM(rr) AS DOUBLE) / COUNT(*), 9)
                   AS mrr_all_queries
        FROM seg GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("E535",),
)
def ml_mrr_reciprocal_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN RECIPROCAL RANK of the "rank a customer's orders by price"
    heuristic against urgent-priority relevance, per market segment —
    the first-hit retrieval metric that completes the registered
    ranking-eval triple: NDCG@5 (graded, top-k), average precision
    (all relevant positions), MRR (POSITION OF THE FIRST relevant
    item — what navigational search and agentic tool-choice eval
    read).  Both conventions ship: mrr over queries with >= 1
    relevant, and mrr_all_queries counting barren queries as 0.

    Exact: the predicted ranking reuses ml_ndcg_at_k's deterministic
    (price DESC, orderkey) tie-break; each reciprocal rank rounds
    ONCE to DECIMAL(20,12) (double->decimal rounding is
    deterministic) so per-segment sums are order-free; the two means
    are single double divisions, rounded 1e-9.  Plan: ONE custkey
    window (rank + min fold share the shuffle), a broadcast segment
    join, one aggregate.  100 TB: per-query state is one rank
    scalar."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = o.select(
        "o_custkey",
        "o_orderpriority",
        F.row_number().over(w).alias("rn"),
    )
    per_cust = ranked.groupBy("o_custkey").agg(
        F.min(
            F.when(F.col("o_orderpriority") == "1-URGENT", F.col("rn"))
        ).alias("first_rel")
    )
    seg = per_cust.join(
        F.broadcast(c), per_cust["o_custkey"] == c["c_custkey"]
    ).select(
        "c_mktsegment",
        F.when(
            F.col("first_rel").isNotNull(),
            F.round(F.lit(1.0) / F.col("first_rel"), 12).cast(
                "decimal(20,12)"
            ),
        ).alias("rr"),
    )
    return (
        seg.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.count("rr").cast("bigint").alias("n_with_relevant"),
            F.round(
                F.sum("rr").cast("double") / F.count("rr"), 9
            ).alias("mrr"),
            F.round(
                F.sum("rr").cast("double") / F.count(F.lit(1)), 9
            ).alias("mrr_all_queries"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "ml_tweedie_deviance_eval",
    oracle="""
        WITH y AS (
            SELECT o_orderpriority AS grp,
                   CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                        AS BIGINT) AS y
            FROM orders
        ),
        mu AS (
            SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mu
            FROM y GROUP BY grp
        ),
        terms AS (
            SELECT y.grp, m.n, m.mu,
                   CAST(ROUND(4 * sqrt(m.mu) + 4 * (y.y / sqrt(m.mu))
                              - 8 * sqrt(CAST(y.y AS DOUBLE)), 9)
                        AS DECIMAL(24,9)) AS d
            FROM y JOIN mu m ON m.grp = y.grp
        )
        SELECT grp AS priority, CAST(MAX(n) AS BIGINT) AS n,
               ROUND(MAX(mu), 9) AS mu_cents,
               ROUND(CAST(SUM(d) AS DOUBLE) / MAX(n), 9)
                   AS mean_tweedie_dev_p15
        FROM terms GROUP BY grp ORDER BY grp
    """,
    tags=("E536",),
)
def ml_tweedie_deviance_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEAN TWEEDIE DEVIANCE (power p = 1.5) of the per-priority
    group-mean model of order totals — the compound-Poisson loss that
    sits BETWEEN the registered regression suite's squared error
    (p = 0, gaussian) and the pinball family: for positive,
    right-skewed, mass-at-small-values targets (revenue, claim
    amounts, tokens-per-doc) Tweedie deviance is the standard GLM
    objective, and evaluating a fitted model's deviance per segment
    is how actuarial/revenue models are compared.  At p = 1.5 the
    unit deviance closed form is d(y, mu) = 4 sqrt(mu) + 4 y /
    sqrt(mu) - 8 sqrt(y) >= 0 (AM-GM).

    Exact: y rides as integer cents; mu is one double division of
    exact integers; each deviance term (sqrt is IEEE-exact) rounds
    ONCE to DECIMAL(24,9), making per-group sums order-free; the mean
    is a single double division, rounded 1e-9.  Plan: one group
    aggregate for mu, one broadcast join back (5-row build side), one
    mergeable aggregate.  100 TB: standard two-pass model-eval
    shape."""
    o = load_table(spark, sf_dir, "orders")
    y = o.select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    mu = y.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("mu"),
    )
    terms = y.join(F.broadcast(mu), "grp").select(
        "grp",
        "n",
        "mu",
        F.round(
            F.lit(4) * F.sqrt(F.col("mu"))
            + F.lit(4) * (F.col("y") / F.sqrt(F.col("mu")))
            - F.lit(8) * F.sqrt(F.col("y").cast("double")),
            9,
        )
        .cast("decimal(24,9)")
        .alias("d"),
    )
    return (
        terms.groupBy("grp")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            F.round(F.max("mu"), 9).alias("mu_cents"),
            F.round(F.sum("d").cast("double") / F.max("n"), 9).alias(
                "mean_tweedie_dev_p15"
            ),
        )
        .select(
            F.col("grp").alias("priority"),
            "n",
            "mu_cents",
            "mean_tweedie_dev_p15",
        )
        .orderBy("priority")
    )


@query(
    "ml_chi2_feature_selection",
    oracle="""
        WITH base AS (
            SELECT o.o_orderpriority, c.c_mktsegment,
                   CAST(EXTRACT(year FROM o.o_orderdate) AS VARCHAR)
                       AS oyear,
                   CASE WHEN o.o_orderstatus = 'F' THEN 'F'
                        ELSE 'NF' END AS label
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        long AS (
            SELECT 'priority' AS feat, o_orderpriority AS val, label
            FROM base
            UNION ALL
            SELECT 'segment', c_mktsegment, label FROM base
            UNION ALL
            SELECT 'order_year', oyear, label FROM base
        ),
        cells AS (
            SELECT feat, val, label, COUNT(*) AS o
            FROM long GROUP BY 1, 2, 3
        ),
        tot AS (
            SELECT feat, val, label, o,
                   SUM(o) OVER (PARTITION BY feat, val) AS rt,
                   SUM(o) OVER (PARTITION BY feat, label) AS ct,
                   SUM(o) OVER (PARTITION BY feat) AS g
            FROM cells
        ),
        per_feat AS (
            SELECT feat,
                   CAST(SUM(CAST(
                       (o - CAST(rt * ct AS DOUBLE) / g)
                       * (o - CAST(rt * ct AS DOUBLE) / g)
                       / (CAST(rt * ct AS DOUBLE) / g)
                       AS DECIMAL(28,12))) AS DOUBLE) AS chi2,
                   (COUNT(DISTINCT val) - 1)
                       * (COUNT(DISTINCT label) - 1) AS dof
            FROM tot GROUP BY feat
        )
        SELECT feat, ROUND(chi2, 9) AS chi2, CAST(dof AS BIGINT) AS dof,
               ROUND(chi2 / dof, 9) AS chi2_per_dof,
               CAST(row_number() OVER (ORDER BY chi2 / dof DESC, feat)
                    AS BIGINT) AS rank
        FROM per_feat ORDER BY rank
    """,
    tags=("E537",),
)
def ml_chi2_feature_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE FEATURE SELECTION: score three candidate categorical
    features (order priority, customer segment, order year) against
    the finished-order label in ONE pass and rank them by chi2/dof —
    the filter-method ranking (sklearn's SelectKBest(chi2) shape)
    that decides which features enter a model BEFORE any training,
    where the registered WoE/IV operator scores binnable numerics and
    mutual information scores a single pairing.  chi2/dof (not raw
    chi2) is the comparable number across features with different
    cardinalities.

    Exact: the long (feature, value, label) table is a 3-way stack of
    the SAME scan (one corpus pass, unioned after projection);
    per-cell expected counts and (O-E)^2/E terms follow the
    stats_chi_square_independence discipline verbatim (one
    double->DECIMAL(28,12) rounding per cell makes the sum
    order-free); the ranking window runs over 3 rows.  Plan: one
    join + stack, one cell aggregate, per-feature windows over the
    tiny contingency tables.  100 TB: contingency cells are
    |values| x 2 regardless of corpus size."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "o_orderpriority",
        "c_mktsegment",
        F.year("o_orderdate").cast("string").alias("oyear"),
        F.when(F.col("o_orderstatus") == "F", "F")
        .otherwise("NF")
        .alias("label"),
    )
    long = base.selectExpr(
        "stack(3, 'priority', o_orderpriority,"
        " 'segment', c_mktsegment,"
        " 'order_year', oyear) AS (feat, val)",
        "label",
    )
    cells = long.groupBy("feat", "val", "label").agg(
        F.count(F.lit(1)).alias("o")
    )
    tot = cells.select(
        "feat",
        "val",
        "label",
        "o",
        F.sum("o").over(Window.partitionBy("feat", "val")).alias("rt"),
        F.sum("o").over(Window.partitionBy("feat", "label")).alias("ct"),
        F.sum("o").over(Window.partitionBy("feat")).alias("g"),
    )
    exp = (F.col("rt") * F.col("ct")).cast("double") / F.col("g")
    term = ((F.col("o") - exp) * (F.col("o") - exp) / exp).cast(
        "decimal(28,12)"
    )
    per_feat = tot.groupBy("feat").agg(
        F.sum(term).cast("double").alias("chi2"),
        (
            (F.countDistinct("val") - 1) * (F.countDistinct("label") - 1)
        ).alias("dof"),
    )
    return per_feat.select(
        "feat",
        F.round("chi2", 9).alias("chi2"),
        F.col("dof").cast("bigint").alias("dof"),
        F.round(F.col("chi2") / F.col("dof"), 9).alias("chi2_per_dof"),
        F.row_number()
        .over(Window.orderBy(F.desc(F.col("chi2") / F.col("dof")), "feat"))
        .cast("bigint")
        .alias("rank"),
    ).orderBy("rank")


CV_Q = 1 << 24  # fixed-point grain for embedding components (float32-exact)


@query(
    "ml_calinski_harabasz_index",
    oracle=f"""
        WITH vals AS (
            SELECT vec_id, label,
                   CAST(unnest(range(1, 65)) AS INT) AS i,
                   CAST(FLOOR(CAST(embedding[unnest(range(1, 65))] AS DOUBLE)
                              * {CV_Q}) AS BIGINT) AS q
            FROM embeddings
        ),
        perld AS (
            SELECT label, i, CAST(SUM(q) AS BIGINT) AS sfx,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY label, i
        ),
        perl AS (
            SELECT label, CAST(MAX(n) AS BIGINT) AS n,
                   SUM(CAST(sfx AS HUGEINT) * sfx) AS ssq
            FROM perld GROUP BY label
        ),
        sq AS (
            SELECT label, SUM(CAST(q AS HUGEINT) * q) AS sqsum
            FROM vals GROUP BY label
        ),
        gdim AS (
            SELECT i, CAST(SUM(sfx) AS BIGINT) AS gs
            FROM perld GROUP BY i
        ),
        ntot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt,
                        CAST(COUNT(*) AS BIGINT) AS k FROM perl),
        bnum AS (
            SELECT p.label,
                   SUM((CAST(p.sfx AS HUGEINT) * t.nt - CAST(g.gs AS HUGEINT) * p.n)
                       * (CAST(p.sfx AS HUGEINT) * t.nt - CAST(g.gs AS HUGEINT) * p.n))
                       AS bn
            FROM perld p JOIN gdim g ON g.i = p.i
            CROSS JOIN ntot t
            GROUP BY p.label
        ),
        terms AS (
            SELECT l.label,
                   b.bn // (l.n * t.nt * t.nt) AS bq,
                   (l.n * s.sqsum - l.ssq) // l.n AS wq
            FROM perl l
            JOIN bnum b ON b.label = l.label
            JOIN sq s ON s.label = l.label
            CROSS JOIN ntot t
        ),
        agg AS (
            SELECT CAST(SUM(bq) AS HUGEINT) AS bsum,
                   CAST(SUM(wq) AS HUGEINT) AS wsum
            FROM terms
        )
        SELECT t.k AS n_labels, t.nt AS n_vectors,
               ROUND(CAST(a.bsum AS DOUBLE) / {CV_Q} / {CV_Q}, 6) AS ssb,
               ROUND(CAST(a.wsum AS DOUBLE) / {CV_Q} / {CV_Q}, 6) AS ssw,
               CAST(a.bsum * (t.nt - t.k) * 1000000
                    // NULLIF(a.wsum * (t.k - 1), 0) AS BIGINT)
                   AS ch_index_x1e6
        FROM agg a CROSS JOIN ntot t
    """,
    tags=("E538",),
)
def ml_calinski_harabasz_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CALINSKI-HARABASZ (variance ratio) index of the label
    clustering of the embedding space: CH = [SSB/(k-1)] / [SSW/(N-k)]
    — the first of the three classical internal cluster-validity
    indices (CH here, Davies-Bouldin and simplified silhouette as
    siblings), the number a kmeans-k sweep or an embedding-space
    label audit actually ranks by.  SSB uses the centered-moment
    identity SUM_l n_l ||c_l - c||^2 with centroids never
    materialized as floats: per-(label, dim) fixed-point sums S_ld
    give the exact numerator (S_ld N - G_d n_l)^2 / (n_l N^2); SSW =
    (n_l Q_l - SUM_d S_ld^2) / n_l from the same pass (the
    participation-ratio Gram discipline).

    Exact: components quantize at 2^-24 (float32-lossless for
    |x| >= 0.5, deterministic floor below); every accumulation is
    HUGEINT/DECIMAL(38); per-label B/W terms floor-rescale ONCE
    (relative error ~1e-15, deterministic); CH ships as an integer
    cross-multiplication.  Plan: one posexplode pass -> three
    label/dim-grain aggregates -> 10-row algebra; broadcast joins
    only.  100 TB: everything after the first aggregate is
    (labels x dims)-bounded."""
    e = load_table(spark, sf_dir, "embeddings")
    comps = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "comp")
    ).select(
        "vec_id",
        "label",
        "i",
        F.floor(F.col("comp").cast("double") * F.lit(CV_Q))
        .cast("bigint")
        .alias("q"),
    )
    d38 = "decimal(38,0)"
    perld = comps.groupBy("label", "i").agg(
        F.sum("q").cast("bigint").alias("sfx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    perl = perld.groupBy("label").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("sfx").cast(d38) * F.col("sfx")).alias("ssq"),
    )
    sq = comps.groupBy("label").agg(
        F.sum(F.col("q").cast(d38) * F.col("q")).alias("sqsum")
    )
    gdim = perld.groupBy("i").agg(F.sum("sfx").cast("bigint").alias("gs"))
    ntot = perl.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    bnum = (
        perld.join(F.broadcast(gdim), "i")
        .join(F.broadcast(ntot))
        .groupBy("label")
        .agg(
            F.sum(
                (
                    F.col("sfx").cast(d38) * F.col("nt")
                    - F.col("gs").cast(d38) * F.col("n")
                )
                * (
                    F.col("sfx").cast(d38) * F.col("nt")
                    - F.col("gs").cast(d38) * F.col("n")
                )
            ).alias("bn")
        )
    )
    terms = (
        perl.join(bnum, "label")
        .join(sq, "label")
        .join(F.broadcast(ntot))
        .select(
            "label",
            F.expr("bn div (n * nt * nt)").alias("bq"),
            F.expr("(n * sqsum - ssq) div n").alias("wq"),
        )
    )
    agg = terms.agg(
        F.sum("bq").cast(d38).alias("bsum"),
        F.sum("wq").cast(d38).alias("wsum"),
    )
    return agg.join(F.broadcast(ntot)).select(
        F.col("k").alias("n_labels"),
        F.col("nt").alias("n_vectors"),
        F.round(
            F.col("bsum").cast("double") / F.lit(CV_Q) / F.lit(CV_Q), 6
        ).alias("ssb"),
        F.round(
            F.col("wsum").cast("double") / F.lit(CV_Q) / F.lit(CV_Q), 6
        ).alias("ssw"),
        F.expr(
            "CAST(bsum * (nt - k) * 1000000"
            " div nullif(wsum * (k - 1), 0) AS BIGINT)"
        ).alias("ch_index_x1e6"),
    )


@query(
    "ml_davies_bouldin_index",
    oracle=f"""
        WITH vals AS (
            SELECT vec_id, label,
                   CAST(unnest(range(1, 65)) AS INT) AS i,
                   CAST(FLOOR(CAST(embedding[unnest(range(1, 65))] AS DOUBLE)
                              * {CV_Q}) AS BIGINT) AS q
            FROM embeddings
        ),
        perld AS (
            SELECT label, i, CAST(SUM(q) AS BIGINT) AS sfx,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY label, i
        ),
        perl AS (
            SELECT label, CAST(MAX(n) AS BIGINT) AS n,
                   SUM(CAST(sfx AS HUGEINT) * sfx) AS ssq
            FROM perld GROUP BY label
        ),
        sq AS (
            SELECT label, SUM(CAST(q AS HUGEINT) * q) AS sqsum
            FROM vals GROUP BY label
        ),
        w AS (
            SELECT l.label, l.n,
                   (l.n * s.sqsum - l.ssq) // l.n AS wq
            FROM perl l JOIN sq s ON s.label = l.label
        ),
        pnum AS (
            SELECT a.label AS la, b.label AS lb,
                   SUM((CAST(a.sfx AS HUGEINT) * b.n - CAST(b.sfx AS HUGEINT) * a.n)
                       * (CAST(a.sfx AS HUGEINT) * b.n - CAST(b.sfx AS HUGEINT) * a.n))
                       AS pn
            FROM perld a JOIN perld b
              ON a.i = b.i AND a.label <> b.label
            GROUP BY a.label, b.label
        ),
        ratios AS (
            SELECT p.la, p.lb,
                   (sqrt(CAST(wa.wq AS DOUBLE) / wa.n)
                    + sqrt(CAST(wb.wq AS DOUBLE) / wb.n))
                   / sqrt(CAST(p.pn AS DOUBLE)
                          / (wa.n * wa.n * wb.n * wb.n)) AS r
            FROM pnum p
            JOIN w wa ON wa.label = p.la
            JOIN w wb ON wb.label = p.lb
        ),
        worst AS (
            SELECT la, lb, r,
                   row_number() OVER (PARTITION BY la
                                      ORDER BY r DESC, lb) AS rn
            FROM ratios
        ),
        pick AS (
            SELECT la AS label, lb AS worst_peer, r FROM worst WHERE rn = 1
        ),
        final AS (
            SELECT p.label, w.n, w.wq, p.worst_peer, p.r,
                   CAST(ROUND(p.r, 12) AS DECIMAL(20,12)) AS rdec
            FROM pick p JOIN w ON w.label = p.label
        )
        SELECT label, n AS n_vectors,
               ROUND(sqrt(CAST(wq AS DOUBLE) / n) / {CV_Q}, 9) AS sigma,
               worst_peer,
               ROUND(r, 9) AS worst_ratio,
               ROUND(CAST(SUM(rdec) OVER () AS DOUBLE)
                     / COUNT(*) OVER (), 9) AS db_index
        FROM final ORDER BY label
    """,
    tags=("E539",),
)
def ml_davies_bouldin_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAVIES-BOULDIN index of the label clustering, with the
    per-label decomposition ranked tools actually read: for each
    cluster the WORST-SEPARATED peer argmax_j (sigma_i + sigma_j) /
    d(c_i, c_j) — compactness over separation — and the global DB =
    mean of those worst ratios (lower is better).  CH (sibling op)
    answers "how strong is the clustering overall?"; DB answers
    "WHICH labels are about to merge?", the per-cluster diagnostic.

    Exact: reuses the CH fixed-point machinery — per-(label, dim)
    integer sums give exact within-dispersion numerators and exact
    pairwise centroid-gap numerators SUM_d (S_id n_j - S_jd n_i)^2;
    sigma and d are IEEE-exact sqrt over identical double trees, the
    argmax tie-breaks on (ratio DESC, peer label), each worst ratio
    rounds ONCE to DECIMAL(20,12) so the global mean is order-free.
    Plan: one posexplode pass; the pairwise table is (k^2 x dims)
    rows — (labels x labels x 64), never points x points.  100 TB:
    k-bounded algebra after one corpus aggregate."""
    e = load_table(spark, sf_dir, "embeddings")
    comps = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "comp")
    ).select(
        "vec_id",
        "label",
        "i",
        F.floor(F.col("comp").cast("double") * F.lit(CV_Q))
        .cast("bigint")
        .alias("q"),
    )
    d38 = "decimal(38,0)"
    perld = comps.groupBy("label", "i").agg(
        F.sum("q").cast("bigint").alias("sfx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    perl = perld.groupBy("label").agg(
        F.max("n").cast("bigint").alias("n"),
        F.sum(F.col("sfx").cast(d38) * F.col("sfx")).alias("ssq"),
    )
    sq = comps.groupBy("label").agg(
        F.sum(F.col("q").cast(d38) * F.col("q")).alias("sqsum")
    )
    w = perl.join(sq, "label").select(
        "label", "n", F.expr("(n * sqsum - ssq) div n").alias("wq")
    )
    a = perld.select(
        F.col("label").alias("la"),
        "i",
        F.col("sfx").alias("sfa"),
        F.col("n").alias("na"),
    )
    b = perld.select(
        F.col("label").alias("lb"),
        "i",
        F.col("sfx").alias("sfb"),
        F.col("n").alias("nb"),
    )
    # perld is a (labels x dims)-bounded frame — broadcast class
    pnum = (
        a.join(F.broadcast(b), "i")
        .where(F.col("la") != F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(
                (
                    F.col("sfa").cast(d38) * F.col("nb")
                    - F.col("sfb").cast(d38) * F.col("na")
                )
                * (
                    F.col("sfa").cast(d38) * F.col("nb")
                    - F.col("sfb").cast(d38) * F.col("na")
                )
            ).alias("pn")
        )
    )
    wa = w.select(
        F.col("label").alias("la"), F.col("n").alias("na2"),
        F.col("wq").alias("wqa"),
    )
    wb = w.select(
        F.col("label").alias("lb"), F.col("n").alias("nb2"),
        F.col("wq").alias("wqb"),
    )
    ratios = (
        pnum.join(F.broadcast(wa), "la")
        .join(F.broadcast(wb), "lb")
        .select(
            "la",
            "lb",
            (
                (
                    F.sqrt(F.col("wqa").cast("double") / F.col("na2"))
                    + F.sqrt(F.col("wqb").cast("double") / F.col("nb2"))
                )
                / F.sqrt(
                    F.col("pn").cast("double")
                    / (
                        F.col("na2")
                        * F.col("na2")
                        * F.col("nb2")
                        * F.col("nb2")
                    )
                )
            ).alias("r"),
        )
    )
    pick = (
        ratios.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("la").orderBy(F.desc("r"), "lb")
            ),
        )
        .where(F.col("rn") == 1)
        .select(F.col("la").alias("label"), F.col("lb").alias("worst_peer"), "r")
    )
    final = pick.join(w, "label").select(
        "label",
        "n",
        "wq",
        "worst_peer",
        "r",
        F.round("r", 12).cast("decimal(20,12)").alias("rdec"),
    )
    wall = Window.partitionBy()
    return final.select(
        "label",
        F.col("n").alias("n_vectors"),
        F.round(
            F.sqrt(F.col("wq").cast("double") / F.col("n")) / F.lit(CV_Q), 9
        ).alias("sigma"),
        "worst_peer",
        F.round("r", 9).alias("worst_ratio"),
        F.round(
            F.sum("rdec").over(wall).cast("double")
            / F.count(F.lit(1)).over(wall),
            9,
        ).alias("db_index"),
    ).orderBy("label")


@query(
    "ml_simplified_silhouette",
    oracle=f"""
        WITH vals AS (
            SELECT vec_id, label,
                   CAST(unnest(range(1, 65)) AS INT) AS i,
                   CAST(FLOOR(CAST(embedding[unnest(range(1, 65))] AS DOUBLE)
                              * {CV_Q}) AS BIGINT) AS q
            FROM embeddings
        ),
        perld AS (
            SELECT label AS clabel, i, CAST(SUM(q) AS BIGINT) AS sfx,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM vals GROUP BY label, i
        ),
        dist AS (
            SELECT v.vec_id, v.label, c.clabel,
                   sqrt(CAST(SUM((CAST(v.q AS HUGEINT) * c.n - c.sfx)
                                 * (CAST(v.q AS HUGEINT) * c.n - c.sfx))
                             AS DOUBLE)
                        / (MAX(c.n) * MAX(c.n))) AS d
            FROM vals v JOIN perld c ON c.i = v.i
            GROUP BY v.vec_id, v.label, c.clabel
        ),
        ab AS (
            SELECT vec_id, label,
                   MAX(CASE WHEN clabel = label THEN d END) AS a,
                   MIN(CASE WHEN clabel <> label THEN d END) AS b
            FROM dist GROUP BY vec_id, label
        ),
        s AS (
            SELECT vec_id, label,
                   CAST(ROUND((b - a) / GREATEST(a, b), 12)
                        AS DECIMAL(20,12)) AS sil
            FROM ab WHERE GREATEST(a, b) > 0
        )
        SELECT label,
               CAST(COUNT(*) AS BIGINT) AS n_scored,
               ROUND(CAST(SUM(sil) AS DOUBLE) / COUNT(*), 9)
                   AS mean_silhouette,
               CAST(SUM(CASE WHEN sil < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_negative
        FROM s GROUP BY label ORDER BY label
    """,
    tags=("E540",),
)
def ml_simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPLIFIED SILHOUETTE per label: s_i = (b_i - a_i) /
    max(a_i, b_i) with a = distance to the OWN centroid and b =
    distance to the nearest FOREIGN centroid — the point-level member
    of the validity triple (CH: global ratio; DB: per-cluster worst
    peer; silhouette: per-POINT assignment quality, n_negative =
    points a reassignment would move).  The simplified (centroid)
    form is the one that scales: classical silhouette needs all
    pairwise distances (O(n^2)); this is n x k centroid distances —
    the standard big-data substitution (it's what Spark MLlib's
    ClusteringEvaluator computes).

    Exact: distances are sqrt of exact HUGEINT/DECIMAL(38) numerators
    SUM_d (q n_c - S_cd)^2 / n_c^2 (the CV fixed-point discipline);
    each silhouette rounds ONCE to DECIMAL(20,12) so per-label means
    are order-free.  Plan: one posexplode pass, one broadcast join
    against the (labels x dims) centroid-sum frame, two aggregates —
    candidate volume is n x k, never n x n.  100 TB: k-bounded
    fan-out; the per-point rows stay distributed end to end."""
    e = load_table(spark, sf_dir, "embeddings")
    comps = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i", "comp")
    ).select(
        "vec_id",
        "label",
        "i",
        F.floor(F.col("comp").cast("double") * F.lit(CV_Q))
        .cast("bigint")
        .alias("q"),
    )
    d38 = "decimal(38,0)"
    perld = comps.groupBy(F.col("label").alias("clabel"), F.col("i")).agg(
        F.sum("q").cast("bigint").alias("sfx"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    dist = (
        comps.join(F.broadcast(perld), "i")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sqrt(
                F.sum(
                    (F.col("q").cast(d38) * F.col("n") - F.col("sfx"))
                    * (F.col("q").cast(d38) * F.col("n") - F.col("sfx"))
                ).cast("double")
                / (F.max("n") * F.max("n"))
            ).alias("d")
        )
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("d"))).alias(
            "a"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d"))).alias(
            "b"
        ),
    )
    s = ab.where(F.greatest("a", "b") > 0).select(
        "label",
        F.round(
            (F.col("b") - F.col("a")) / F.greatest("a", "b"), 12
        )
        .cast("decimal(20,12)")
        .alias("sil"),
    )
    return (
        s.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.round(
                F.sum("sil").cast("double") / F.count(F.lit(1)), 9
            ).alias("mean_silhouette"),
            F.sum(F.when(F.col("sil") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_negative"),
        )
        .orderBy("label")
    )


FOCAL_P_SHIFT = 100.0  # score -> probability squash p = s / (s + 100)
FOCAL_GAMMA = 2


@query(
    "ml_focal_loss_eval",
    oracle=f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y,
                   CAST(value AS DOUBLE)
                       / (CAST(value AS DOUBLE) + {FOCAL_P_SHIFT}) AS p
            FROM events
            WHERE CAST(value AS DOUBLE) > 0
        ),
        terms AS (
            SELECT y,
                   CAST(ROUND(CASE WHEN y = 1 THEN -ln(p)
                                   ELSE -ln(1.0 - p) END, 9)
                        AS DECIMAL(24,9)) AS ce,
                   CAST(ROUND(CASE WHEN y = 1
                                   THEN -(1.0 - p) * (1.0 - p) * ln(p)
                                   ELSE -p * p * ln(1.0 - p) END, 9)
                        AS DECIMAL(24,9)) AS fl
            FROM scored
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_positive,
               ROUND(CAST(SUM(ce) AS DOUBLE) / COUNT(*), 9)
                   AS mean_cross_entropy,
               ROUND(CAST(SUM(fl) AS DOUBLE) / COUNT(*), 9)
                   AS mean_focal_gamma2,
               ROUND(CAST(SUM(fl) AS DOUBLE) / CAST(SUM(ce) AS DOUBLE), 9)
                   AS focal_to_ce_ratio
        FROM terms
    """,
    tags=("E546",),
)
def ml_focal_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOCAL LOSS (gamma = {FOCAL_GAMMA}) vs plain cross-entropy of
    the events purchase scorer (p = value / (value + {FOCAL_P_SHIFT}),
    the declared squash) — the class-imbalance diagnostic pair: focal
    loss down-weights already-confident examples by (1-p)^gamma, so
    the focal/CE RATIO measures how much of the loss mass lives in
    hard examples; a ratio near 1 means the model is uniformly
    uncertain (imbalance handling won't help), a tiny ratio means a
    few hard cases dominate (the regime focal training and the
    registered class-balanced weights exist for).

    Exact: each per-row term is one identical double chain (ln over
    bit-identical operands, the engine's standing ln-parity contract)
    rounded ONCE to DECIMAL(24,9) — sums are order-free; the three
    outputs are single divisions rounded 1e-9.  Plan: row-local
    codegen + ONE aggregate, no shuffle before it.  100 TB:
    embarrassingly parallel eval pass."""
    e = load_table(spark, sf_dir, "events")
    scored = e.where(F.col("value").cast("double") > 0).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        (
            F.col("value").cast("double")
            / (F.col("value").cast("double") + F.lit(FOCAL_P_SHIFT))
        ).alias("p"),
    )
    ce = F.when(F.col("y") == 1, -F.log(F.col("p"))).otherwise(
        -F.log(F.lit(1.0) - F.col("p"))
    )
    fl = F.when(
        F.col("y") == 1,
        -(F.lit(1.0) - F.col("p"))
        * (F.lit(1.0) - F.col("p"))
        * F.log(F.col("p")),
    ).otherwise(
        -F.col("p") * F.col("p") * F.log(F.lit(1.0) - F.col("p"))
    )
    terms = scored.select(
        "y",
        F.round(ce, 9).cast("decimal(24,9)").alias("ce"),
        F.round(fl, 9).cast("decimal(24,9)").alias("fl"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_positive"),
        F.round(F.sum("ce").cast("double") / F.count(F.lit(1)), 9).alias(
            "mean_cross_entropy"
        ),
        F.round(F.sum("fl").cast("double") / F.count(F.lit(1)), 9).alias(
            "mean_focal_gamma2"
        ),
        F.round(
            F.sum("fl").cast("double") / F.sum("ce").cast("double"), 9
        ).alias("focal_to_ce_ratio"),
    )


DBSCAN_EPS = 0.05       # radius in embedding units (dims 0,1)
DBSCAN_MINPTS = 4       # neighbors (incl. self) to be a core point
DBSCAN_Q = 1 << 24      # fixed-point grain
DBSCAN_EPS_FP = int(DBSCAN_EPS * DBSCAN_Q)


@query(
    "ml_dbscan_grid_2d",
    oracle=f"""
        WITH RECURSIVE pts AS (
            SELECT vec_id AS id,
                   CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * {DBSCAN_Q})
                        AS BIGINT) AS x,
                   CAST(FLOOR(CAST(embedding[2] AS DOUBLE) * {DBSCAN_Q})
                        AS BIGINT) AS y
            FROM embeddings
        ),
        nbr AS (
            SELECT a.id AS ia, b.id AS ib
            FROM pts a JOIN pts b
              ON a.id <> b.id
             AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
                 <= CAST({DBSCAN_EPS_FP} AS HUGEINT) * {DBSCAN_EPS_FP}
        ),
        ncount AS (
            SELECT p.id,
                   1 + COALESCE(c.n, 0) AS n_nbr
            FROM pts p LEFT JOIN (
                SELECT ia AS id, CAST(COUNT(*) AS BIGINT) AS n
                FROM nbr GROUP BY ia
            ) c ON c.id = p.id
        ),
        cores AS (
            SELECT id FROM ncount WHERE n_nbr >= {DBSCAN_MINPTS}
        ),
        core_edges AS (
            SELECT n.ia AS u, n.ib AS v
            FROM nbr n
            JOIN cores ca ON ca.id = n.ia
            JOIN cores cb ON cb.id = n.ib
        ),
        walk(node, lbl) AS (
            SELECT id, id FROM cores
            UNION
            SELECT e.v, w.lbl
            FROM walk w JOIN core_edges e ON e.u = w.node
        ),
        comp AS (
            SELECT node AS id, MIN(lbl) AS cluster FROM walk GROUP BY node
        ),
        border AS (
            SELECT n.ia AS id, MIN(c.cluster) AS cluster
            FROM nbr n
            JOIN comp c ON c.id = n.ib
            WHERE n.ia NOT IN (SELECT id FROM cores)
            GROUP BY n.ia
        ),
        assigned AS (
            SELECT id, cluster, 'core' AS role FROM comp
            UNION ALL
            SELECT id, cluster, 'border' FROM border
        ),
        labeled AS (
            SELECT p.id,
                   COALESCE(a.cluster, -1) AS cluster,
                   COALESCE(a.role, 'noise') AS role
            FROM pts p LEFT JOIN assigned a ON a.id = p.id
        )
        SELECT cluster,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN role = 'core' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_core,
               CAST(SUM(CASE WHEN role = 'border' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_border
        FROM labeled
        GROUP BY cluster
        ORDER BY cluster
    """,
    tags=("E554",),
)
def ml_dbscan_grid_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the embedding (dim0, dim1) plane, DISTRIBUTED via
    GRID BLOCKING: eps = {DBSCAN_EPS}, minPts = {DBSCAN_MINPTS}.
    Density clustering is the one classical family the engine's
    kmeans/LSH ops don't cover (arbitrary-shape clusters + explicit
    noise), and its scalable form is exactly this: hash points into
    eps-sized cells, generate candidate pairs ONLY from 3x3 neighbor
    cells (the join_grid_epsilon_pairs discipline — candidate volume
    is density-bounded, never n^2), count eps-neighbors for core
    status, run the engine's min-label connected components over
    core-core edges, then attach border points to their MIN-labeled
    core neighbor (deterministic, engine-independent assignment).

    Exact: coordinates and eps ride as 2^24 fixed-point integers
    (squared distances in HUGEINT/DECIMAL(38) — no floats anywhere),
    cluster ids are min core ids, role counts are exact integers.
    The oracle brute-forces the pair set and walks components with a
    recursive CTE — same contract, independently derived.  Plan: one
    9-cell explode join (shuffle on cell), two aggregates, the
    shared CC fixpoint.  100 TB: candidate pairs are bounded by
    cell occupancy (the skew knob is the cell size), CC state is
    size-gated like the dedup components op."""
    from potpot_spark.operators.graph import connected_components

    e = load_table(spark, sf_dir, "embeddings")
    pts = e.select(
        F.col("vec_id").alias("id"),
        F.floor(F.element_at("embedding", 1).cast("double") * DBSCAN_Q)
        .cast("bigint")
        .alias("x"),
        F.floor(F.element_at("embedding", 2).cast("double") * DBSCAN_Q)
        .cast("bigint")
        .alias("y"),
    )
    eps = F.lit(DBSCAN_EPS_FP)
    cellx = F.expr(f"CAST(floor(x / {DBSCAN_EPS_FP}) AS BIGINT)")
    celly = F.expr(f"CAST(floor(y / {DBSCAN_EPS_FP}) AS BIGINT)")
    # each point broadcasts itself into its 9 neighbor cells (probe
    # side); build side keeps its own cell only
    probe = pts.select(
        "id",
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (cellx + dx).alias("cx"), (celly + dy).alias("cy")
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select("id", "x", "y", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    build = pts.select(
        F.col("id").alias("ib"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        cellx.alias("cx"),
        celly.alias("cy"),
    )
    # ε-check in plain BIGINT: joined pairs come from adjacent cells,
    # so |x−bx| < 2·EPS_FP < 2^21 and each square < 2^42 — the sum
    # sits 20 bits under the int64 ceiling AT ANY DATA SCALE (the
    # bound is the cell geometry, not the row count).  The previous
    # DECIMAL(38) chain was pure defensive cost on the hottest filter
    # (the oracle's HUGEINT compare is the same boolean either way).
    nbr = (
        probe.join(build, ["cx", "cy"])
        .where(F.col("id") != F.col("ib"))
        .where(
            (F.col("x") - F.col("bx")) * (F.col("x") - F.col("bx"))
            + (F.col("y") - F.col("by")) * (F.col("y") - F.col("by"))
            <= eps.cast("bigint") * eps
        )
        .select(F.col("id").alias("ia"), "ib")
    )
    # The ε-neighbor pair table feeds THREE consumers (core census,
    # core-core edges, border attachment) — materialize it once
    # (pair-scale rows, two longs each) instead of re-running the
    # 9-cell grid join per consumer (guide §5 cache-when-reused rule;
    # measured A/B below in OPTIMIZATION_r11.md).
    nbr = nbr.localCheckpoint(eager=True)
    ncount = pts.join(
        nbr.groupBy(F.col("ia").alias("id")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        ),
        "id",
        "left",
    ).select("id", (F.lit(1) + F.coalesce("n", F.lit(0))).alias("n_nbr"))
    cores = ncount.where(F.col("n_nbr") >= DBSCAN_MINPTS).select("id")
    core_edges = (
        nbr.join(cores.select(F.col("id").alias("ia")), "ia")
        .join(cores.select(F.col("id").alias("ib")), "ib")
        .where(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("src"), F.col("ib").alias("dst"))
    )
    comp = connected_components(
        cores.select(F.col("id").alias("node")), core_edges
    ).select(F.col("node").alias("id"), F.col("component").alias("cluster"))
    border = (
        nbr.join(comp.select(F.col("id").alias("ib"), "cluster"), "ib")
        .join(cores.select(F.col("id").alias("ia")), "ia", "left_anti")
        .groupBy(F.col("ia").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    assigned = comp.select("id", "cluster", F.lit("core").alias("role")).unionByName(
        border.select("id", "cluster", F.lit("border").alias("role"))
    )
    labeled = pts.select("id").join(assigned, "id", "left").select(
        "id",
        F.coalesce("cluster", F.lit(-1)).alias("cluster"),
        F.coalesce("role", F.lit("noise")).alias("role"),
    )
    return (
        labeled.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.sum(F.when(F.col("role") == "core", 1).otherwise(0))
            .cast("bigint")
            .alias("n_core"),
            F.sum(F.when(F.col("role") == "border", 1).otherwise(0))
            .cast("bigint")
            .alias("n_border"),
        )
        .orderBy("cluster")
    )


@query(
    "ml_ks_separation_statistic",
    oracle="""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS label,
                   value AS score
            FROM events
        ), byscore AS (
            SELECT score,
                   CAST(SUM(label) AS BIGINT) AS c1,
                   CAST(SUM(1 - label) AS BIGINT) AS c0
            FROM scored GROUP BY score
        ), cum AS (
            SELECT score,
                   SUM(c1) OVER (ORDER BY score) AS cum1,
                   SUM(c0) OVER (ORDER BY score) AS cum0,
                   SUM(c1) OVER () AS n1,
                   SUM(c0) OVER () AS n0
            FROM byscore
        ), d AS (
            SELECT score, n1, n0,
                   ABS(cum1 * n0 - cum0 * n1) AS diff,
                   MAX(ABS(cum1 * n0 - cum0 * n1)) OVER () AS mx
            FROM cum
        )
        SELECT CAST(MAX(n1) AS BIGINT) AS n_pos,
               CAST(MAX(n0) AS BIGINT) AS n_neg,
               CAST(CAST(MAX(mx) AS HUGEINT) * 1000000
                    // (MAX(n1) * MAX(n0)) AS BIGINT) AS ks_x1e6,
               ROUND(MIN(score), 9) AS ks_at_score
        FROM d WHERE diff = mx
    """,
    tags=("E562",),
)
def ml_ks_separation_statistic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KS SEPARATION of a scoring model — max_t |F1(t) - F0(t)| between
    the score CDFs of positives and negatives (the engine's standard
    purchase-vs-rest / value-as-score eval fixture, the same one the
    registered rank-AUC reads).  THE credit-scoring industry's
    headline discriminative metric: unlike AUC (a global rank average)
    KS localizes WHERE the model separates, and ks_at_score is the
    operating threshold a single-cutoff policy would pick.  AUC can
    stay flat while KS collapses at the business-relevant cutoff —
    which is why scorecard monitoring tracks both.

    Exact: class counts per distinct score, running sums, and the
    cross-multiplied |cum1*n0 - cum0*n1| are ALL exact integers —
    the statistic ships as one integer fixed-point division
    (HUGEINT/DECIMAL(38,0): n1*n0*1e6 passes 9.2e18 near sf 1);
    ks_at_score breaks argmax ties by MIN(score), deterministic.
    Plan: one score-grain aggregate (vocabulary-scale, the
    Mann-Whitney discipline), one ordered window over distinct
    scores, one aggregate.  100 TB: the corpus is scanned once; the
    window runs on the distinct-score table."""
    e = load_table(spark, sf_dir, "events")
    scored = e.select(
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("label"),
        F.col("value").alias("score"),
    )
    byscore = scored.groupBy("score").agg(
        F.sum("label").cast("bigint").alias("c1"),
        F.sum(1 - F.col("label")).cast("bigint").alias("c0"),
    )
    wo = Window.orderBy("score")
    wall = Window.partitionBy()
    cum = byscore.select(
        "score",
        F.sum("c1").over(wo).alias("cum1"),
        F.sum("c0").over(wo).alias("cum0"),
        F.sum("c1").over(wall).alias("n1"),
        F.sum("c0").over(wall).alias("n0"),
    )
    diff = F.abs(F.col("cum1") * F.col("n0") - F.col("cum0") * F.col("n1"))
    d = cum.select(
        "score",
        "n1",
        "n0",
        diff.alias("diff"),
        F.max(diff).over(wall).alias("mx"),
    )
    return d.where(F.col("diff") == F.col("mx")).agg(
        F.max("n1").cast("bigint").alias("n_pos"),
        F.max("n0").cast("bigint").alias("n_neg"),
        F.expr(
            "CAST(CAST(MAX(mx) AS DECIMAL(38,0)) * 1000000"
            " div (MAX(n1) * MAX(n0)) AS BIGINT)"
        ).alias("ks_x1e6"),
        F.round(F.min("score"), 9).alias("ks_at_score"),
    )


WK_R1_SQL = (
    "CASE WHEN n_chars < 200 THEN 1 WHEN n_chars < 400 THEN 2"
    " WHEN n_chars < 800 THEN 3 WHEN n_chars < 1600 THEN 4"
    " ELSE 5 END"
)
WK_R2_SQL = (
    "CASE WHEN wc < 40 THEN 1 WHEN wc < 80 THEN 2"
    " WHEN wc < 160 THEN 3 WHEN wc < 320 THEN 4 ELSE 5 END"
)


@query(
    "ml_weighted_kappa_quadratic",
    oracle=f"""
        WITH rated AS (
            SELECT {WK_R1_SQL} AS r1, {WK_R2_SQL} AS r2
            FROM (SELECT n_chars,
                         len(string_split(text, ' ')) AS wc
                  FROM documents)
        ),
        cells AS (
            SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS n
            FROM rated GROUP BY 1, 2
        ),
        marg AS (
            SELECT r.i, r.row_n, c.j, c.col_n
            FROM (SELECT r1 AS i, CAST(SUM(n) AS BIGINT) AS row_n
                  FROM cells GROUP BY 1) r
            CROSS JOIN (SELECT r2 AS j, CAST(SUM(n) AS BIGINT) AS col_n
                        FROM cells GROUP BY 1) c
        ),
        sums AS (
            SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM cells) AS n_total,
                   (SELECT CAST(SUM((r1 - r2) * (r1 - r2) * n) AS BIGINT)
                    FROM cells) AS wo,
                   (SELECT CAST(SUM((i - j) * (i - j) * row_n * col_n)
                                AS BIGINT)
                    FROM marg) AS we
        )
        SELECT n_total, wo AS weighted_disagreement,
               CAST(1000000
                    - CAST(wo AS HUGEINT) * n_total * 1000000 // we
                    AS BIGINT) AS kappa_w_x1e6
        FROM sums
    """,
    tags=("E569",),
)
def ml_weighted_kappa_quadratic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QUADRATICALLY WEIGHTED COHEN'S KAPPA between two ordinal 1-5
    document-length raters (character-bucket vs word-count-bucket —
    deliberately correlated raters, so the statistic exercises its
    full range): kappa_w = 1 - SUM w_ij O_ij / SUM w_ij E_ij with
    w_ij = (i-j)^2.  THE ordinal-agreement standard (radiology
    scales, essay scoring, LLM-judge 1-5 rubrics): unweighted kappa
    (registered, nominal) charges a 1-vs-2 disagreement the same as
    1-vs-5; quadratic weights charge the SQUARE of the gap, which is
    what makes kappa_w comparable to a Pearson correlation on the
    latent scale.  The engine surface an LLM-judge calibration
    pipeline queries when deciding whether two rubric versions agree.

    Exact: O_ij, marginals, and both weighted sums are exact BIGINTs
    (the 5x5 weight grid is a CROSS JOIN of two 5-row marginal
    tables); kappa_w ships as one integer cross-multiplied 1e6 fixed
    point.  Plan: one corpus pass -> 25-cell aggregate -> scalar
    algebra.  100 TB: sufficient-statistic shape, nothing downstream
    of the cell table sees data scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "n_chars", F.size(F.split(F.col("text"), " ")).alias("wc")
    )
    rated = d.select(
        F.expr(WK_R1_SQL).alias("r1"), F.expr(WK_R2_SQL).alias("r2")
    )
    cells = rated.groupBy("r1", "r2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    rows = cells.groupBy(F.col("r1").alias("i")).agg(
        F.sum("n").cast("bigint").alias("row_n")
    )
    cols = cells.groupBy(F.col("r2").alias("j")).agg(
        F.sum("n").cast("bigint").alias("col_n")
    )
    marg = rows.crossJoin(F.broadcast(cols))
    wo_t = cells.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum(
            (F.col("r1") - F.col("r2"))
            * (F.col("r1") - F.col("r2"))
            * F.col("n")
        )
        .cast("bigint")
        .alias("wo"),
    )
    we_t = marg.agg(
        F.sum(
            (F.col("i") - F.col("j"))
            * (F.col("i") - F.col("j"))
            * F.col("row_n")
            * F.col("col_n")
        )
        .cast("bigint")
        .alias("we")
    )
    return wo_t.crossJoin(F.broadcast(we_t)).select(
        "n_total",
        F.col("wo").alias("weighted_disagreement"),
        F.expr(
            "CAST(1000000 - CAST(wo AS DECIMAL(38,0)) * n_total"
            " * 1000000 div we AS BIGINT)"
        ).alias("kappa_w_x1e6"),
    )


CAL_NEWTON_ITERS = 6


def _cal_terms_sql(src: str, params: str) -> str:
    """One Newton iteration's sufficient statistics over `src` (cols
    y, l) at the current (a, b) in `params` — identical SQL text on
    both engines; every per-row term is rounded once to
    DECIMAL(28,12) so the corpus-wide sums are order-free."""
    return f"""
            SELECT
                CAST(SUM(CAST(ROUND(y - 1.0 / (1.0 + exp(-(a + b * l))),
                     12) AS DECIMAL(28,12))) AS DOUBLE) AS g1,
                CAST(SUM(CAST(ROUND(l * (y - 1.0
                     / (1.0 + exp(-(a + b * l)))), 12)
                     AS DECIMAL(28,12))) AS DOUBLE) AS g2,
                CAST(SUM(CAST(ROUND((1.0 / (1.0 + exp(-(a + b * l))))
                     * (1.0 - 1.0 / (1.0 + exp(-(a + b * l)))), 12)
                     AS DECIMAL(28,12))) AS DOUBLE) AS h11,
                CAST(SUM(CAST(ROUND(l * (1.0 / (1.0 + exp(-(a + b * l))))
                     * (1.0 - 1.0 / (1.0 + exp(-(a + b * l)))), 12)
                     AS DECIMAL(28,12))) AS DOUBLE) AS h12,
                CAST(SUM(CAST(ROUND(l * l
                     * (1.0 / (1.0 + exp(-(a + b * l))))
                     * (1.0 - 1.0 / (1.0 + exp(-(a + b * l)))), 12)
                     AS DECIMAL(28,12))) AS DOUBLE) AS h22,
                MAX(a) AS a, MAX(b) AS b
            FROM {src} CROSS JOIN {params}
    """


def _cal_step_sql(terms: str) -> str:
    """Newton update (a,b) += H^-1 g from one iteration's sums."""
    return f"""
            SELECT a + (h22 * g1 - h12 * g2)
                       / (h11 * h22 - h12 * h12) AS a,
                   b + (h11 * g2 - h12 * g1)
                       / (h11 * h22 - h12 * h12) AS b
            FROM {terms}
    """


def _cal_oracle_sql() -> str:
    stages = [
        "it0 AS (SELECT ln(CAST(SUM(y) AS DOUBLE)"
        " / (COUNT(*) - SUM(y))) AS a,"
        " CAST(0.0 AS DOUBLE) AS b FROM scored)"
    ]
    for i in range(CAL_NEWTON_ITERS):
        stages.append(
            f"t{i} AS ({_cal_terms_sql('scored', f'it{i}')})"
        )
        stages.append(f"it{i + 1} AS ({_cal_step_sql(f't{i}')})")
    chain = ",\n        ".join(stages)
    return f"""
        WITH scored AS (
            SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                       AS y,
                   ln(LEAST(GREATEST(value / 500.0, 0.001), 0.999)
                      / (1.0 - LEAST(GREATEST(value / 500.0, 0.001),
                                     0.999))) AS l
            FROM events
        ),
        {chain}
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM scored) AS n_rows,
               ROUND(a, 6) AS intercept,
               ROUND(b, 6) AS slope,
               ABS(b - 1.0) > 0.1 OR ABS(a) > 0.1
                   AS needs_recalibration
        FROM it{CAL_NEWTON_ITERS}
    """


@query(
    "ml_calibration_slope_logistic",
    oracle=_cal_oracle_sql(),
    tags=("E588",),
)
def ml_calibration_slope_logistic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COX CALIBRATION SLOPE AND INTERCEPT (logistic recalibration,
    Cox 1958): fit y ~ sigmoid(a + b logit(p)) on the engine's
    standard scored fixture by SIX UNROLLED NEWTON-RAPHSON iterations
    expressed as ONE declarative plan — each iteration is an
    aggregate of five sufficient statistics (gradient + Hessian of
    the logistic likelihood) at the current (a, b), chained through
    1-row parameter frames; no driver-side loop or materialization.  THE
    clinical-model recalibration standard: slope b < 1 means the
    model is OVERCONFIDENT (predictions too extreme — the signature
    of overfitting), b > 1 underconfident, intercept a != 0 means
    base-rate drift; together they complete the calibration suite
    (bins draw it, ECE averages it, Spiegelhalter tests it, slope
    DIAGNOSES and FIXES it — (a, b) are literally the recalibration
    map you deploy).

    Exact: every per-row gradient/Hessian term is one identical
    double chain rounded to DECIMAL(28,12) (order-free corpus sums);
    the 2x2 Newton solve is closed-form scalar algebra in the 1-row
    frame; iterations are pinned so both engines walk the same
    trajectory.  Plan (r10 rework, was 7.94 s): the 2-column scored
    projection is SPREAD and CACHED once, and each iteration's 1-row
    parameter frame is checkpointed.  Two measured costs were fixed:
    plan growth (iteration i's plan embedded iterations 1..i-1 as
    nested broadcast subtrees — truncated by the checkpoints) and
    DECIMAL(28,12) aggregation serialized onto the fixture's 2 scan
    partitions (JVM Decimal adds are object-path, ~2.5× double sums —
    A/B at sf0.1: 1.24 s → 0.45 s per pass after spread(); the sums
    are order-free by the rounding discipline, so the round-robin
    split cannot change a bit).  100 TB: 6 passes of
    sufficient-statistic shape over the materialized projection — the
    distributed textbook IRLS, with the per-pass scan as the only
    data-sized cost (at corpus scale swap the cache for a
    materialized 2-column table)."""
    from potpot_spark.catalog import spread

    e = load_table(spark, sf_dir, "events")
    scored = spread(e.select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.expr(
            "ln(LEAST(GREATEST(value / 500.0, 0.001), 0.999)"
            " / (1.0 - LEAST(GREATEST(value / 500.0, 0.001), 0.999)))"
        ).alias("l"),
    )).persist()
    try:
        params = scored.agg(
            F.expr(
                "ln(CAST(SUM(y) AS DOUBLE) / (COUNT(*) - SUM(y)))"
            ).alias("a"),
            F.lit(0.0).alias("b"),
        ).localCheckpoint(eager=True)
        mu_sql = "1.0 / (1.0 + exp(-(a + b * l)))"
        for _ in range(CAL_NEWTON_ITERS):
            terms = scored.crossJoin(F.broadcast(params)).agg(
                F.expr(
                    f"CAST(SUM(CAST(ROUND(y - {mu_sql}, 12)"
                    " AS DECIMAL(28,12))) AS DOUBLE)"
                ).alias("g1"),
                F.expr(
                    f"CAST(SUM(CAST(ROUND(l * (y - {mu_sql}), 12)"
                    " AS DECIMAL(28,12))) AS DOUBLE)"
                ).alias("g2"),
                F.expr(
                    f"CAST(SUM(CAST(ROUND(({mu_sql}) * (1.0 - {mu_sql}), 12)"
                    " AS DECIMAL(28,12))) AS DOUBLE)"
                ).alias("h11"),
                F.expr(
                    f"CAST(SUM(CAST(ROUND(l * ({mu_sql}) * (1.0 - {mu_sql}),"
                    " 12) AS DECIMAL(28,12))) AS DOUBLE)"
                ).alias("h12"),
                F.expr(
                    f"CAST(SUM(CAST(ROUND(l * l * ({mu_sql})"
                    f" * (1.0 - {mu_sql}), 12)"
                    " AS DECIMAL(28,12))) AS DOUBLE)"
                ).alias("h22"),
                F.max("a").alias("a"),
                F.max("b").alias("b"),
            )
            params = terms.select(
                F.expr(
                    "a + (h22 * g1 - h12 * g2) / (h11 * h22 - h12 * h12)"
                ).alias("a"),
                F.expr(
                    "b + (h11 * g2 - h12 * g1) / (h11 * h22 - h12 * h12)"
                ).alias("b"),
            ).localCheckpoint(eager=True)
        n = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        out = params.crossJoin(F.broadcast(n)).select(
            "n_rows",
            F.round(F.col("a"), 6).alias("intercept"),
            F.round(F.col("b"), 6).alias("slope"),
            (
                (F.abs(F.col("b") - 1.0) > 0.1) | (F.abs(F.col("a")) > 0.1)
            ).alias("needs_recalibration"),
        ).localCheckpoint(eager=True)  # materialize before releasing the cache
    finally:
        # release on every exit path (ADVICE r10): an exception
        # mid-iteration must not leak the cached projection into
        # subsequent queries
        scored.unpersist()
    return out
