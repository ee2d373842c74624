"""Sampling operators — the 100 TB workflow primitive the reference
lacks entirely (its only read is a point get,
``/root/reference/src/query.rs:7-9``).

Three sampling modes with different reproducibility contracts:

- **hash-systematic** (``sample_hash_systematic``): keep rows whose
  portable hash (md5) falls in a fixed bucket range.  Fully
  deterministic ACROSS ENGINES and cluster sizes — the sample is a
  pure function of the key, so it has a DuckDB oracle, is stable under
  repartitioning, and two tables sampled the same way stay joinable
  (correlated sampling).  This is the mode a training-data pipeline
  should use for reproducible subsets.
- **seeded Bernoulli** (``sample_bernoulli_seeded``): Spark
  ``df.sample`` — deterministic within Spark given (seed, partitioning)
  but not across engines -> rows-only check.
- **stratified** (``sample_stratified_by_flag``): ``sampleBy`` with
  per-stratum fractions — balances class skew; rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from potpot_spark.catalog import load_table
from potpot_spark.functions.numeric import dsum, dsum_expr
from potpot_spark.registry import query


@query(
    "sample_hash_systematic",
    oracle=f"""
        SELECT COUNT(*) AS sample_rows,
               {dsum_expr('o_totalprice')} AS sample_totalprice
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
    tags=("E7", "E28"),
)
def sample_hash_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample: first hex digit of md5(key) in
    {0,1}.  Engine-portable and partitioning-independent (the aggregate
    proves the same rows were kept on both sides)."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1)
    return (
        o.where(bucket.isin("0", "1"))
        .agg(
            F.count(F.lit(1)).alias("sample_rows"),
            dsum("o_totalprice").alias("sample_totalprice"),
        )
    )


@query(
    "sample_bernoulli_seeded",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
               TRUE AS fraction_within_4_sigma
        FROM lineitem
    """,
    tags=("E7",),
)
def sample_bernoulli_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli row sampling (``df.sample``) — per-partition
    XORShift streams, no shuffle, O(1) memory.  Sample IDENTITY
    depends on Spark's partitioning (engine-internal), so the oracle
    gate carries the sampler's statistical CONTRACT instead: the
    realized fraction sits within 4 binomial sigmas of p=0.1
    (measured 1.8 sigma at sf0.001, 0.4 at sf0.01, 1.0 at sf0.1).
    Both the sample count and the population count accumulate in one
    pass; the oracle emits the exact population count plus literal
    TRUE (the agg_approx_percentile_bounds pattern)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = 0.1
    tot = l.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    smp = l.sample(fraction=p, seed=42).agg(F.count(F.lit(1)).alias("n_sampled"))
    return tot.crossJoin(smp).select(
        "n_total",
        (
            F.abs(F.col("n_sampled") / F.col("n_total") - p)
            <= 4.0 * F.sqrt(F.lit(p * (1 - p)) / F.col("n_total"))
        ).alias("fraction_within_4_sigma"),
    )


STRATA_FRACTIONS = {"A": 0.2, "N": 0.05, "R": 0.2}


@query(
    "sample_stratified_by_flag",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS stratum_total,
               TRUE AS fraction_within_4_sigma
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("E7", "E14"),
)
def sample_stratified_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (``sampleBy``): per-stratum Bernoulli
    fractions to rebalance skewed classes — the standard corpus
    rebalancing move before training-data export.  Same contract-gate
    treatment as sample_bernoulli_seeded: per-stratum realized
    fractions within 4 binomial sigmas of their declared targets
    (max measured 1.33 sigma across strata and SFs), verified against
    the exact stratum totals."""
    l = load_table(spark, sf_dir, "lineitem")
    sampled = (
        l.sampleBy("l_returnflag", STRATA_FRACTIONS, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("sampled_rows"))
    )
    totals = l.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("stratum_total"))
    p = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in STRATA_FRACTIONS.items() for x in kv]
        ),
        F.col("l_returnflag"),
    )
    return (
        totals.join(sampled, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("stratum_total").cast("bigint").alias("stratum_total"),
            (
                F.abs(F.col("sampled_rows") / F.col("stratum_total") - p)
                <= 4.0 * F.sqrt(p * (1 - p) / F.col("stratum_total"))
            ).alias("fraction_within_4_sigma"),
        )
    )


@query(
    "sample_train_test_split",
    oracle="""
        SELECT CASE
                 WHEN h < 8  THEN 'train'
                 WHEN h < 9  THEN 'val'
                 ELSE 'test'
               END AS split,
               lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM (
            SELECT lang, n_chars,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) AS INT) AS h
            FROM documents
        )
        GROUP BY 1, 2
    """,
    tags=("E48", "E37"),
)
def sample_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by hashed key —
    the split a training pipeline must be able to reproduce bit-for-bit
    months later on a regenerated corpus.  The split is a pure
    expression on md5(doc_id) (no seed state, no partitioning
    dependence, engine-portable — proved by the oracle), so membership
    survives repartitioning, backfills, and engine swaps.  Returned as
    per-(split, lang) counts: the skew check run before every training
    job."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10).cast("int")
    split = (
        F.when(h < 8, "train").when(h < 9, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split"), F.col("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


RESERVOIR_N = 5


@query(
    "sample_topn_per_group_by_hash",
    oracle=f"""
        SELECT lang, doc_id, n_chars
        FROM (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        ) WHERE rn <= {RESERVOIR_N}
    """,
    tags=("E18",),
)
def sample_topn_per_group_by_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group reservoir: keep N documents per language,
    chosen by ranking on md5(key) — a uniform-ish pseudo-random order
    that is a pure function of the data, so the "reservoir" is
    reproducible across engines, runs, partitionings, and cluster
    sizes (unlike true reservoir sampling, whose result depends on
    encounter order).

    The per-group top-k-by-hash shape is what curation pipelines use
    for fixed-size per-stratum inspection samples.  Catalyst rewrites
    the rank-filter into WindowGroupLimit, so each partition retains
    only N candidates before the shuffle — the full sort never
    happens at scale.  Tie-break on doc_id (md5 collisions on distinct
    keys are practically impossible, but determinism shouldn't rest on
    'practically')."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= RESERVOIR_N)
        .select("lang", "doc_id", "n_chars")
    )


@query(
    "sample_mixture_weights",
    oracle="""
        WITH rates AS (
            SELECT * FROM (VALUES
                ('high', 192), ('mid', 96), ('low', 32)
            ) v(tier, keep_buckets)
        ),
        tiered AS (
            SELECT doc_id, lang, n_chars, source,
                   CASE
                     WHEN substring(md5(source), 1, 1) IN ('0','1','2','3','4')
                       THEN 'high'
                     WHEN substring(md5(source), 1, 1) IN ('5','6','7','8','9','a')
                       THEN 'mid'
                     ELSE 'low'
                   END AS tier,
                   CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                        AS INTEGER) AS bucket
            FROM documents
        )
        SELECT t.tier, r.keep_buckets,
               COUNT(*) AS n_source_docs,
               CAST(SUM(CASE WHEN t.bucket < r.keep_buckets THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_sampled,
               CAST(SUM(CASE WHEN t.bucket < r.keep_buckets THEN n_chars ELSE 0 END) AS BIGINT)
                 AS sampled_chars
        FROM tiered t JOIN rates r ON t.tier = r.tier
        GROUP BY t.tier, r.keep_buckets
        ORDER BY t.tier
    """,
    tags=("E7", "E28", "E38"),
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture sampling: sources are weighted into tiers
    (75% / 37.5% / 12.5% keep rates as md5-bucket thresholds out of
    256) and each document's keep/drop decision is a pure function of
    its id — the "data mixing" stage of an LLM pipeline, where
    high-quality sources are upweighted and boilerplate farms
    downweighted.

    Both the TIER assignment (hash of the source name) and the ROW
    decision (hash-bucket of doc_id vs the tier's threshold) are
    engine-portable md5 arithmetic: the exact sampled multiset is
    reproducible across engines, cluster sizes, and reruns — the
    property that makes training sets auditable.  The rate table
    broadcasts; the scan never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    rates = F.broadcast(
        spark.createDataFrame(
            [("high", 192), ("mid", 96), ("low", 32)], "tier string, keep_buckets int"
        )
    )
    first_hex = F.substring(F.md5(F.col("source")), 1, 1)
    tier = (
        F.when(first_hex.isin(*"01234"), "high")
        .when(first_hex.isin(*"56789a"), "mid")
        .otherwise("low")
    )
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
        "int"
    )
    tiered = d.select(
        "doc_id", "n_chars", tier.alias("tier"), bucket.alias("bucket")
    )
    keep = F.col("bucket") < F.col("keep_buckets")
    return (
        tiered.join(rates, "tier")
        .groupBy("tier", "keep_buckets")
        .agg(
            F.count(F.lit(1)).alias("n_source_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"),
            F.sum(F.when(keep, F.col("n_chars")).otherwise(0)).alias("sampled_chars"),
        )
        .orderBy("tier")
    )


WPRIO_K = 50
_WPRIO_2_60 = float(1 << 60)


@query(
    "sample_weighted_priority",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, lang, n_chars,
                   ROUND(
                       POW(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                                AS BIGINT) / {_WPRIO_2_60},
                           1.0 / n_chars),
                       12) AS priority
            FROM documents WHERE n_chars > 0
        )
        SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, priority, rnk
        FROM (
            SELECT *, CAST(row_number() OVER (
                       ORDER BY priority DESC, doc_id) AS INT) AS rnk
            FROM keyed
        )
        WHERE rnk <= {WPRIO_K}
    """,
    tags=("E7", "E48"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis-Spirakis
    priority sampling): each doc draws u = portable-hash(doc_id)/2^60
    in (0,1) and gets priority u^(1/weight); the global top-k by
    priority is a weight-proportional sample — here weight = n_chars,
    the quality-weighted corpus subsampling move.  No RNG state: the
    'randomness' is the md5 hash, so membership is reproducible
    bit-for-bit months later and across engines (the
    sample_hash_systematic philosophy with weights).

    Float discipline: priorities are rounded to 12 dp BEFORE ranking
    on both sides (pow/log libm implementations may differ by an ulp
    between engines — the knn rounding-before-ranking rule), ties
    break by doc_id.  Scale shape: one map pass + one global top-k
    (TakeOrderedAndProject — no full sort materializes)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("double") / F.lit(_WPRIO_2_60)
    )
    keyed = d.select(
        "doc_id", "lang",
        F.col("n_chars").cast("bigint").alias("weight"),
        F.round(F.pow(u, F.lit(1.0) / F.col("n_chars")), 12).alias("priority"),
    )
    w = Window.orderBy(F.col("priority").desc(), F.col("doc_id"))
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= WPRIO_K)
        .select("doc_id", "lang", "weight", "priority", "rnk")
    )


@query(
    "sample_downsample_to_minority",
    oracle="""
        WITH sized AS (
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
        ),
        target AS (SELECT MIN(n) AS n_min FROM sized),
        ranked AS (
            SELECT event_type, event_id,
                   row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
            FROM events
        )
        SELECT r.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(r.event_id) AS BIGINT) AS kept_id_sum
        FROM ranked r, target t
        WHERE r.rn <= t.n_min
        GROUP BY r.event_type
    """,
    tags=("E7", "E50"),
)
def sample_downsample_to_minority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-BALANCED downsampling: every event class keeps exactly
    n_min rows (the minority class size), members chosen by md5-hash
    rank — the deterministic alternative to seeded sampleBy for
    training-set balancing, reproducible across engines, runs and
    backfills (membership is a pure function of the data; the kept-id
    checksum through the oracle proves the SAME rows survive on both
    sides).  Scale: per-class WindowGroupLimit prunes to n_min rows
    map-side before the exchange; n_min is an aggregate scalar
    broadcast into the filter."""
    e = load_table(spark, sf_dir, "events")
    sized = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    target = sized.agg(F.min("n").alias("n_min"))
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    ranked = e.select(
        "event_type", "event_id", F.row_number().over(w).alias("rn")
    )
    return (
        ranked.crossJoin(F.broadcast(target))
        .where(F.col("rn") <= F.col("n_min"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("event_id").cast("bigint").alias("kept_id_sum"),
        )
    )


@query(
    "sample_user_consistent_holdout",
    oracle="""
        WITH assigned AS (
            SELECT user_id,
                   CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1))
                             AS INT) < 3
                        THEN 'holdout' ELSE 'train' END AS split,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        ),
        straddle AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_straddling_users FROM (
                SELECT user_id FROM (
                    SELECT DISTINCT user_id, split FROM assigned
                ) GROUP BY user_id HAVING COUNT(*) > 1
            )
        )
        SELECT a.split,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(a.n_events) AS BIGINT) AS n_events,
               CAST(SUM(CAST(('0x' || substring(md5(CAST(a.user_id AS VARCHAR)), 3, 8))
                             AS BIGINT)) AS BIGINT) AS user_set_checksum,
               s.n_straddling_users
        FROM assigned a CROSS JOIN straddle s
        GROUP BY a.split, s.n_straddling_users
        ORDER BY a.split
    """,
    tags=("E90", "E48"),
)
def sample_user_consistent_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USER-CONSISTENT HOLDOUT: every event of a user lands in the same
    split (md5 first hex < 3 → ~19% holdout) — the leakage-safe
    eval split for behavioral models, where a row-level split would put
    one user's history on both sides and inflate every metric.

    The output carries its own AUDIT: `n_straddling_users` counts users
    observed in more than one split (computed from the data, not
    assumed — must be 0), and a user-set membership checksum (sum of a
    second md5 slice, order-free exact BIGINT) pins WHICH users, not
    just how many, through the oracle gate.  One grouped pass + an
    O(users) rollup; assignment is a pure row expression — survives
    repartitioning, backfills, engine swaps."""
    e = load_table(spark, sf_dir, "events")
    h1 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1), 16, 10
    ).cast("int")
    split = F.when(h1 < 3, "holdout").otherwise("train")
    assigned = e.groupBy("user_id").agg(
        F.max(split).alias("split"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    # Audit recomputes the per-event split assignment independently
    # (DISTINCT user->split pairs over raw events), so a hypothetical
    # non-determinism in the expression WOULD surface as a straddler.
    per_event = e.select(
        "user_id", F.when(h1 < 3, "holdout").otherwise("train").alias("split")
    ).distinct()
    straddle = (
        per_event.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_straddling_users"))
    )
    chk = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 3, 8), 16, 10
    ).cast("bigint")
    return (
        assigned.crossJoin(F.broadcast(straddle))
        .groupBy("split", "n_straddling_users")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum(chk).cast("bigint").alias("user_set_checksum"),
        )
        .select(
            "split", "n_users", "n_events", "user_set_checksum", "n_straddling_users"
        )
        .orderBy("split")
    )


# --- E377: contrastive pair sampling -------------------------------------

CONTRASTIVE_OFFSET = 7  # hash-ring stride for negative candidates
CONTRASTIVE_BUCKETS = 16  # negatives pair within hash buckets: no global rank


@query(
    "sample_balanced_pairs_contrastive",
    oracle=f"""
        WITH pos AS (
            SELECT label, vec_id,
                   COALESCE(
                       LEAD(vec_id) OVER (PARTITION BY label ORDER BY vec_id),
                       MIN(vec_id) OVER (PARTITION BY label)) AS pos_id,
                   COUNT(*) OVER (PARTITION BY label) AS nl
            FROM embeddings
        ),
        ring AS (
            SELECT label, vec_id, h % {CONTRASTIVE_BUCKETS} AS bkt,
                   row_number() OVER (
                       PARTITION BY h % {CONTRASTIVE_BUCKETS}
                       ORDER BY h, vec_id) AS rk,
                   COUNT(*) OVER (
                       PARTITION BY h % {CONTRASTIVE_BUCKETS}) AS n
            FROM (SELECT label, vec_id,
                         CAST(('0x' || substring(
                             md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT)
                             AS h
                  FROM embeddings)
        ),
        neg AS (
            SELECT a.label, a.vec_id, b.vec_id AS neg_id,
                   CASE WHEN b.label <> a.label THEN 1 ELSE 0 END AS ok
            FROM ring a JOIN ring b
              ON b.bkt = a.bkt
             AND b.rk = ((a.rk - 1 + {CONTRASTIVE_OFFSET}) % a.n) + 1
        )
        SELECT p.label,
               CAST(COUNT(*) AS BIGINT) AS n_anchors,
               CAST(SUM(CASE WHEN p.nl > 1 AND p.pos_id <> p.vec_id
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_pairs,
               CAST(SUM(n.ok) AS BIGINT) AS n_neg_pairs,
               CAST(SUM(CASE WHEN p.nl > 1 AND p.pos_id <> p.vec_id
                             THEN p.vec_id * 31 + p.pos_id
                             ELSE 0 END) AS BIGINT) AS pos_checksum,
               CAST(SUM(CASE WHEN n.ok = 1
                             THEN p.vec_id * 31 + n.neg_id
                             ELSE 0 END) AS BIGINT) AS neg_checksum
        FROM pos p JOIN neg n ON n.vec_id = p.vec_id
        GROUP BY p.label
        ORDER BY p.label
    """,
    tags=("E377",),
)
def sample_balanced_pairs_contrastive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive pair assembly for embedding training:
    every vector anchors one positive (the next vec_id cyclically
    within its label — no RNG, survives regeneration) and one negative
    candidate (the vector {CONTRASTIVE_OFFSET} positions ahead on its
    md5 hash ring, rings being {CONTRASTIVE_BUCKETS} independent hash
    buckets; kept only when the labels differ, so the negative rate is
    itself a mixing diagnostic).  Checksums (Σ id·31+pair_id)
    pin the EXACT pair sets, not just counts — the property a
    reproducible training run needs.

    Scale shape: positives are one window pass per label; rings are
    PER-BUCKET (rank windows partition on the hash bucket — no global
    single-partition rank anywhere) and the negative lookup is a 1:1
    self-equi-join on (bucket, position).  At 100 TB raise the bucket
    count with the corpus; checksums are plain BIGINT sums (ids ≪
    2^31, no overflow)."""
    from potpot_spark.functions.numeric import phash60

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    w_lab = Window.partitionBy("label").orderBy("vec_id")
    w_lab_all = Window.partitionBy("label")
    pos = emb.select(
        "label",
        "vec_id",
        F.coalesce(
            F.lead("vec_id").over(w_lab), F.min("vec_id").over(w_lab_all)
        ).alias("pos_id"),
        F.count(F.lit(1)).over(w_lab_all).alias("nl"),
    )
    hashed = emb.select(
        "label", "vec_id", phash60(F.col("vec_id").cast("string")).alias("h")
    ).withColumn("bkt", F.pmod(F.col("h"), F.lit(CONTRASTIVE_BUCKETS)))
    w_ring = Window.partitionBy("bkt").orderBy("h", "vec_id")
    ring = hashed.select(
        "label",
        "vec_id",
        "bkt",
        F.row_number().over(w_ring).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("bkt")).alias("n"),
    )
    a = ring.alias("a")
    b = ring.alias("b")
    neg = a.join(
        b,
        (F.col("b.bkt") == F.col("a.bkt"))
        & (
            F.col("b.rk")
            == F.pmod(F.col("a.rk") - 1 + CONTRASTIVE_OFFSET, F.col("a.n")) + 1
        ),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("neg_id"),
        F.when(F.col("b.label") != F.col("a.label"), 1).otherwise(0).alias("ok"),
    )
    pos_valid = (F.col("nl") > 1) & (F.col("pos_id") != F.col("vec_id"))
    return (
        pos.join(neg, "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_anchors"),
            F.sum(F.when(pos_valid, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos_pairs"),
            F.sum("ok").cast("bigint").alias("n_neg_pairs"),
            F.sum(
                F.when(pos_valid, F.col("vec_id") * 31 + F.col("pos_id")).otherwise(0)
            )
            .cast("bigint")
            .alias("pos_checksum"),
            F.sum(
                F.when(F.col("ok") == 1, F.col("vec_id") * 31 + F.col("neg_id"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("neg_checksum"),
        )
        .orderBy("label")
    )


NEYMAN_N = 1000        # total sample budget to allocate
NEYMAN_FP = 2 ** 20    # fixed-point scale for stratum weights


@query(
    "sample_neyman_allocation",
    oracle=f"""
        WITH strata AS (
            SELECT o_orderpriority AS stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_h,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0)))
                        AS DOUBLE) AS s,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS DECIMAL(19,0))
                            * CAST(ROUND(o_totalprice * 100)
                                   AS DECIMAL(19,0))) AS DOUBLE) AS ss
            FROM orders GROUP BY o_orderpriority
        ),
        weighted AS (
            SELECT stratum, n_h,
                   CAST(FLOOR(
                       CAST(n_h AS DOUBLE)
                       * sqrt((ss - s * s / CAST(n_h AS DOUBLE))
                              / CAST(n_h AS DOUBLE))
                       * {NEYMAN_FP}.0 / 100.0) AS BIGINT) AS w_fp
            FROM strata
        ),
        tot AS (SELECT CAST(SUM(w_fp) AS BIGINT) AS total_w FROM weighted)
        SELECT w.stratum, w.n_h, w.w_fp,
               CAST(({NEYMAN_N} * w.w_fp) // t.total_w AS BIGINT)
                   AS n_alloc
        FROM weighted w CROSS JOIN tot t
        ORDER BY w.stratum
    """,
    tags=("E398",),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN OPTIMAL ALLOCATION for stratified sampling: split a
    fixed sample budget across the order-priority strata in proportion
    to N_h * sigma_h — the allocation that minimizes the variance of
    the stratified mean estimator for a fixed total n (big AND
    volatile strata get more samples; uniform and proportional
    allocation are both strictly worse unless sigmas are equal).
    This is the planning step in front of every stratified sampler
    (the executing sibling is sample_stratified_by_flag).

    Exact: per-stratum sums run in integer cents (exact DECIMAL),
    sigma_h is the one spelled-identical sqrt expression, and the
    weight N_h*sigma_h is FLOOR-quantized to 2^-20 fixed point BEFORE
    the cross-stratum total — so the total is an exact BIGINT sum
    (order-free) and every allocation is one exact integer division.
    Plan: one hash aggregate over orders, a 5-row weight table, a
    1-row total broadcast back.  At 100 TB the stats pass is the only
    data touch; allocation is O(#strata)."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("decimal(19,0)")
    strata = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum(cents).cast("double").alias("s"),
        F.sum(cents * cents).cast("double").alias("ss"),
    )
    nhd = F.col("n_h").cast("double")
    sigma = F.sqrt(
        (F.col("ss") - F.col("s") * F.col("s") / nhd) / nhd
    )
    weighted = strata.select(
        "stratum",
        "n_h",
        F.floor(nhd * sigma * float(NEYMAN_FP) / 100.0).cast("bigint").alias(
            "w_fp"
        ),
    )
    tot = weighted.agg(F.sum("w_fp").cast("bigint").alias("total_w"))
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "stratum",
            "n_h",
            "w_fp",
            F.expr(f"CAST(({NEYMAN_N} * w_fp) div total_w AS BIGINT)").alias(
                "n_alloc"
            ),
        )
        .orderBy("stratum")
    )


SYSK = 13  # take every k-th row of the deterministic ordering


@query(
    "sample_systematic_interval",
    oracle=f"""
        WITH ordered AS (
            SELECT o_orderkey, o_totalprice,
                   row_number() OVER (ORDER BY o_orderkey) AS rn
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS sample_rows,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sample_totalprice,
               CAST(MIN(o_orderkey) AS BIGINT) AS first_key,
               CAST(MAX(o_orderkey) AS BIGINT) AS last_key
        FROM ordered
        WHERE rn % {SYSK} = 1
    """,
    tags=("E415",),
)
def sample_systematic_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC INTERVAL SAMPLING: every {SYSK}-th row of the
    key-ordered population (rows 1, {SYSK}+1, 2*{SYSK}+1, ...) — the
    classic survey design that guarantees even coverage across the
    ordering dimension, where Bernoulli sampling only achieves it in
    expectation (and hash-systematic, the sibling op, achieves it per
    hash bucket).  With the frame ordered by a time-correlated key,
    this is implicit stratification over time for free.

    Exact: membership is a row_number arithmetic predicate on a total
    deterministic order, so the SAMPLE IDENTITY (not just its size)
    reproduces on both engines and any partitioning; the decimal sum
    proves it value-for-value.  Plan: one global sort window + filter
    — at 100 TB a range-partitioned sort, or zero extra cost when the
    table is already key-sorted (the common layout)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    ordered = o.select(
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
    )
    return ordered.where(F.col("rn") % SYSK == 1).agg(
        F.count(F.lit(1)).cast("bigint").alias("sample_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sample_totalprice"),
        F.min("o_orderkey").cast("bigint").alias("first_key"),
        F.max("o_orderkey").cast("bigint").alias("last_key"),
    )
