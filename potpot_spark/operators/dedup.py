"""Deduplication operators for training-data pipelines
(SURVEY.md §2.10: E34, E35 + simhash + n-gram Jaccard).

Everything runs JVM-side on DataFrame built-ins — shingling with
``transform``/``slice``, set algebra with
``array_intersect``/``array_union`` — no Python in the row path.  The
MinHash/SimHash signatures build on the PORTABLE md5-60-bit hash
(functions/numeric.phash60) with fixed affine permutations, so the
full signature -> band -> candidate -> verified-pair chain is
bit-reproducible in DuckDB and every query here carries an exact
value oracle (the reference's unfinished hash machinery at
``/root/reference/src/hashtable.rs:382-418`` left hashing
engine-internal; making it portable is what buys cross-engine
checkability).  Candidate-pair blocking keys are raw minima tuples —
no engine hash anywhere in the join keys.

Scale design: never all-pairs.  Exact dedup is a hash group-by;
MinHash pairs come from LSH band buckets (shuffle on band hash);
n-gram Jaccard pairs come from blocking keys.  All-pairs appears only
in tests as the ground truth for recall measurement.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from potpot_spark.catalog import load_table, spread
from potpot_spark.functions.numeric import phash60, phash60_expr
from potpot_spark.registry import query

# --- shingling helpers (JVM expressions) ---------------------------------


def tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.col(col)), " ")


def word_shingles(tok: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a token array (JVM higher-order fns).

    ``tok`` MUST be a reference to a MATERIALIZED token-array column
    (see ``with_tokens``), never the raw ``tokens()`` expression: the
    lambda body is interpreted per element with no common-subexpression
    elimination, so an embedded ``split(lower(text))`` subtree would be
    re-evaluated for EVERY sequence index — O(words²) per document.
    Fixing exactly that took the sf0.1 bigram census 1.9 s → 0.48 s
    and sped up every shingle consumer 2-4× (r10)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tok) - (k - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(tok, i, k), " "),
        )
    )


def with_tokens(docs: DataFrame, min_words: int, *cols: str) -> DataFrame:
    """Project ``*cols`` plus the token array as a MATERIALIZED column
    ``w``, filtered to rows with at least ``min_words`` tokens — the
    mandatory staging step before ``word_shingles`` (whose lambda must
    slice a column reference, not re-split the text per element)."""
    return docs.select(*cols, tokens().alias("w")).where(
        F.size("w") >= min_words
    )


MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1: a*h+b stays < 2^62


def minhash_params(num_hashes: int = 32) -> list[tuple[int, int]]:
    """Fixed affine-permutation constants (a_i, b_i), derived from md5
    of the permutation index so both engines can embed the SAME
    literals — no RNG state, no engine-specific seed."""
    import hashlib

    out = []
    for i in range(num_hashes):
        dg = hashlib.md5(f"potpot-minhash-{i}".encode()).hexdigest()
        a = int(dg[:8], 16) % (MINHASH_P - 1) + 1
        b = int(dg[8:16], 16) % MINHASH_P
        out.append((a, b))
    return out


def minhash_signature(shingles: Column, num_hashes: int = 32) -> list[Column]:
    """num_hashes MinHash values over a column of PRE-HASHED shingle
    longs already reduced mod P: min over shingles of (a_i*h + b_i) % P.

    Permutation i is an affine map over the base hash — the
    variable-length string walk happens ONCE per shingle (in the
    caller, as a materialized column), and each permutation costs two
    integer ops instead of a full string hash.  The base hash is the
    PORTABLE md5-60-bit hash (functions/numeric.phash60), not
    xxhash64, so the whole signature -> band -> candidate-pair chain
    is bit-reproducible in DuckDB and the query carries a full value
    oracle (xxhash64 was ~15% faster end-to-end but rows-only
    checkable).  ANSI-safe: products stay below 2^62, no wraparound."""
    return [
        F.array_min(
            F.transform(shingles, lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P)))
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(minhash_params(num_hashes))
    ]


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two distinct-element arrays."""
    return F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b))


# --- E34: exact dedup ----------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
        SELECT md5(lower(text)) AS content_hash,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY md5(lower(text))
    """,
    tags=("E34",),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E34 — exact content dedup: hash normalized text, keep min
    doc_id per hash.  One hash group-by — the same map-side-combine
    shape as E14, flat cost at any scale."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.lower(F.col("text"))).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_copies"))
    )


# --- E35: MinHash + LSH near-dedup --------------------------------------

NUM_HASHES = 32
BANDS = 8  # 8 bands x 4 rows: catches jaccard >~ 0.6 w/ high prob


def minhash_docs(docs: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    # Staged projections: materialize the token array, then the shingle
    # array, then derive the 32 minhash columns — each stage referencing
    # the previous stage's *column*, never re-embedding its expression
    # (word_shingles' lambda would otherwise re-split the text per
    # element; the 33x-rebuild hazard is the same discipline one stage
    # later).
    with_shingles = with_tokens(spread(docs), 3, "doc_id").select(
        "doc_id", word_shingles(F.col("w"), 3).alias("shingles")
    )
    # Third stage: hash every shingle to a long ONCE (portable md5
    # hash, reduced mod P here so the 32 affine permutations are pure
    # integer mixes of this materialized array — see
    # minhash_signature); the string hashing cost does not scale with
    # num_hashes.
    with_hashes = with_shingles.select(
        "doc_id",
        "shingles",
        F.transform(
            F.col("shingles"), lambda s: F.pmod(phash60(s), F.lit(MINHASH_P))
        ).alias("sh_hash"),
    )
    return with_hashes.select(
        "doc_id", "shingles", *minhash_signature(F.col("sh_hash"), num_hashes)
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = BANDS, num_hashes: int = NUM_HASHES) -> DataFrame:
    """Band the signature, bucket-join within the band's minima tuple.

    The band key is the raw (band_id, r0..r3) tuple of signature
    minima — a plain multi-column equi join, portable (no engine hash
    in the key) so the DuckDB oracle reproduces the exact candidate
    set.  The exploded band table shuffles on that tuple — skewed
    buckets (boilerplate-heavy corpora) are the known hazard; AQE
    skew-join splitting handles moderate skew, and a bucket-size cap
    would be the 100 TB guard (documented, not needed at test scale).
    """
    rows_per_band = num_hashes // bands
    exploded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        *[
                            F.col(f"mh_{b * rows_per_band + r}").alias(f"r{r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.*")
    key = ["band_id"] + [f"r{r}" for r in range(rows_per_band)]
    a = exploded.alias("a")
    b = exploded.alias("b")
    cond = reduce(
        lambda acc, c: acc & (F.col(f"a.{c}") == F.col(f"b.{c}")),
        key[1:],
        F.col(f"a.{key[0]}") == F.col(f"b.{key[0]}"),
    ) & (F.col("a.doc_id") < F.col("b.doc_id"))
    return (
        a.join(b, cond)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def near_dup_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """LSH candidates verified with exact Jaccard over shingle sets.

    The signature table feeds three consumers (two explode sides + the
    verify join); cache it so the shingle/minhash pipeline runs once.
    At warehouse scale the equivalent is materializing signatures to a
    table keyed by doc_id and reusing it across dedup runs.
    """
    sigs = minhash_docs(docs).persist()
    cands = lsh_candidate_pairs(sigs)
    sh = sigs.select("doc_id", "shingles")
    verified = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("shingles", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("shingles", "sh_b"), "doc_b")
        .withColumn("jaccard_sim", jaccard(F.col("sh_a"), F.col("sh_b")))
        .where(F.col("jaccard_sim") >= threshold)
    )
    return verified.select("doc_a", "doc_b", F.round("jaccard_sim", 6).alias("jaccard_sim"))


def _minhash_cte_sql() -> str:
    """Shared DuckDB CTE body of the MinHash+LSH pipeline (toks →
    shingles → portable hashes → signatures → bands → candidate
    pairs) — same portable base hash, same affine-permutation
    literals, same band tuples as the Spark side, reused by the
    near-dup oracle and the estimator audit."""
    rpb = NUM_HASHES // BANDS
    params = minhash_params(NUM_HASHES)
    mh_list = ",\n                   ".join(
        f"list_min(list_transform(hp, h -> ({a} * h + {b}) % {MINHASH_P}))"
        for a, b in params
    )
    band_cols = ", ".join(f"mh[t.b * {rpb} + {r + 1}] AS r{r}" for r in range(rpb))
    band_eq = " AND ".join(f"a.r{r} = b.r{r}" for r in range(rpb))
    return f"""toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS tok
            FROM documents
        ),
        sh AS (
            SELECT doc_id,
                   list_distinct(
                       list_transform(
                           range(1, greatest(len(tok) - 2, 1) + 1),
                           i -> array_to_string(list_slice(tok, i, i + 2), ' ')
                       )
                   ) AS shingles
            FROM toks WHERE len(tok) >= 3
        ),
        hp AS (
            SELECT doc_id, shingles,
                   list_transform(
                       shingles,
                       s -> {phash60_expr('s')} % {MINHASH_P}
                   ) AS hp
            FROM sh
        ),
        sigs AS (
            SELECT doc_id, [{mh_list}] AS mh
            FROM hp
        ),
        bands AS (
            SELECT doc_id, t.b AS band_id, {band_cols}
            FROM sigs CROSS JOIN (SELECT unnest(range({BANDS})) AS b) t
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND {band_eq}
             AND a.doc_id < b.doc_id
        )"""


def _minhash_oracle_sql(threshold: float = 0.6) -> str:
    """Near-dup oracle: the shared pipeline CTEs + exact-Jaccard
    verification at ``threshold``."""
    return f"""
        WITH {_minhash_cte_sql()}
        SELECT c.doc_a, c.doc_b,
               ROUND(
                   CAST(len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s))) AS DOUBLE)
                   / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard_sim
        FROM cand c
        JOIN sh sa ON sa.doc_id = c.doc_a
        JOIN sh sb ON sb.doc_id = c.doc_b
        WHERE CAST(len(list_filter(sa.shingles, s -> list_contains(sb.shingles, s))) AS DOUBLE)
              / len(list_distinct(list_concat(sa.shingles, sb.shingles))) >= {threshold}
    """


@query("dedup_near_minhash", oracle=_minhash_oracle_sql(), tags=("E35",))
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E35 — MinHash+LSH near-dedup, exact-Jaccard verified at 0.6.

    Fully oracle-checked: the portable md5-60-bit base hash + fixed
    affine permutations make signatures, band buckets, candidate pairs
    and verified output bit-reproducible in DuckDB (previously
    rows-only on xxhash64 seeds).  Recall vs brute force is
    additionally bounded in tests/test_dedup.py."""
    return near_dup_pairs(load_table(spark, sf_dir, "documents"), threshold=0.6)


# --- SimHash -------------------------------------------------------------


def simhash64(hashes: Column) -> Column:
    """64-bit SimHash from a token-hash array: per-bit majority vote.

    Bit i of the signature is 1 iff sum over tokens of
    (bit i of hash ? +1 : -1) is positive.  Pure JVM expression tree
    (64 bit-votes), no shuffle.  Pass a *materialized column* of
    hashes, not an expression — the 64 votes each scan the array, so
    an inlined expression would rebuild it 64x per row.
    """

    def bit_mask(i: int) -> int:
        # bit 63 is the sign bit: its mask is the most-negative long
        return (1 << i) if i < 63 else -(1 << 63)

    def vote(i: int):
        mask = bit_mask(i)
        # exactly-two-arg lambda: pyspark binds extra params as lambda vars
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask).cast("long")) != 0, 1
        ).otherwise(-1)

    bit_votes = [
        F.aggregate(hashes, F.lit(0).cast("long"), vote(i)) for i in range(64)
    ]
    return reduce(
        lambda acc, iv: acc.bitwiseOR(
            F.when(iv[1] > 0, F.lit(bit_mask(iv[0])).cast("long")).otherwise(F.lit(0).cast("long"))
        ),
        enumerate(bit_votes),
        F.lit(0).cast("long"),
    )


_SIMHASH_ORACLE = f"""
        WITH th AS (
            SELECT doc_id,
                   list_transform(
                       string_split(lower(text), ' '),
                       t -> {phash60_expr('t')}
                   ) AS h
            FROM documents
        ),
        votes AS (
            SELECT doc_id, j.j,
                   list_sum(list_transform(th.h,
                       x -> CASE WHEN (x >> j.j) & 1 = 1 THEN 1 ELSE -1 END)) AS v
            FROM th CROSS JOIN (SELECT unnest(range(60)) AS j) j
        )
        SELECT doc_id,
               CAST(SUM(CASE WHEN v > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END)
                    AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
"""


@query("dedup_simhash", oracle=_SIMHASH_ORACLE, tags=("E35",))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures per document (near-dup via Hamming distance
    on 16-bit chunk collisions downstream).

    Fully oracle-checked: token hashes are the portable md5-60-bit
    hash (functions/numeric.phash60), so the per-bit majority votes —
    and therefore the signature longs — are bit-identical in DuckDB
    (previously rows-only on xxhash64 seeds).  Bits 60-63 of the
    64-bit fold are always 0 under a 60-bit base hash (every vote is
    -1), which the 60-bit oracle reproduces by construction.

    Shape: the simhash64 per-row HOF fold over spread() partitions —
    A/B'd r3 warm sf0.1 against an exploded 64-bit-count-SUM aggregate
    twin (algebraically identical, asserted in tests/test_dedup.py):
    the aggregate form was 2.5x SLOWER (5.3 s vs 2.0 s — 64 wide sum
    buffers per group beat by the row-local fold), so the fold stays;
    it is embarrassingly parallel and shuffle-free."""
    d = load_table(spark, sf_dir, "documents")
    hashed = spread(d).select(
        "doc_id", F.transform(tokens(), lambda t: phash60(t)).alias("tok_hashes")
    )
    return hashed.select("doc_id", simhash64(F.col("tok_hashes")).alias("simhash"))


# --- exact n-gram Jaccard (oracle-checked) -------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle="""
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
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               ROUND(
                   CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
                   / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard_sim
        FROM sh a JOIN sh b
          ON a.lang = b.lang
         AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 10
        WHERE CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.3
    """,
    tags=("E35",),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over blocked candidate pairs (same
    lang, |n_chars| within 10) — the oracle-checkable exact-similarity
    complement of MinHash.

    Scale shape: the semantic block (lang, |n_chars|<=10) is realized
    as an EQUI join on (lang, length-band) — side A explodes into its
    band and both neighbors, side B stays in its own band, so every
    qualifying pair meets on exactly one key and the shuffle spreads
    over lang x band keys instead of 5 lang-only keys (which made a
    per-language cross product).  The |n_chars| predicate remains as a
    residual filter, so results are identical to the naive form the
    oracle computes.  Shingles compare as xxhash64 longs, not strings
    (same Jaccard, ~10x cheaper intersections; hash-collision
    probability over the corpus is ~1e-14 per pair)."""
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def ngram_jaccard_pairs(d: DataFrame, threshold: float = 0.3) -> DataFrame:
    """Banded exact n-gram Jaccard pairs over any documents-shaped
    DataFrame (doc_id, text, lang, n_chars) — reused by the CC
    clustering (operators/graph.py) and the corpus filter pipeline
    (operators/pipeline.py) on pre-filtered inputs."""
    band = (F.col("n_chars") / 20).cast("int")
    hashed = F.array_distinct(
        F.transform(word_shingles(F.col("w"), 3), lambda s: F.xxhash64(s))
    )
    # Both join sides recompute this subtree; measured at sf0.1, the
    # recompute (pure codegen: split+slice+xxhash64) is CHEAPER than
    # persisting the wide shingle arrays (cache write + eviction
    # pressure), so no .persist() here.  At warehouse scale the right
    # move is materializing signatures to a table once per corpus, not
    # an in-job cache.
    # spread() first: shingle+hash is the CPU-heavy stage and must not
    # serialize onto the fixture's single scan task (see catalog.spread)
    sh = with_tokens(spread(d), 3, "doc_id", "lang", "n_chars").select(
        "doc_id", "lang", "n_chars", hashed.alias("shingles_h"), band.alias("band")
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang"),
        F.col("n_chars").alias("chars_a"),
        F.col("shingles_h").alias("sh_a"),
        F.explode(F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)).alias("jband"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang"),
        F.col("n_chars").alias("chars_b"),
        F.col("shingles_h").alias("sh_b"),
        F.col("band").alias("jband"),
    )
    sim = jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        a.join(b, ["lang", "jband"])
        .where(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("chars_a") - F.col("chars_b")) <= 10)
        )
        .where(sim >= threshold)
        .select("doc_a", "doc_b", F.round(sim, 6).alias("jaccard_sim"))
    )


INCR_SPLIT = 400


@query(
    "dedup_incremental_new_only",
    oracle=f"""
        SELECT n.doc_id, n.lang, n.n_chars
        FROM documents n
        WHERE n.doc_id >= {INCR_SPLIT}
          AND NOT EXISTS (
              SELECT 1 FROM documents e
              WHERE e.doc_id < {INCR_SPLIT}
                AND md5(lower(e.text)) = md5(lower(n.text))
          )
    """,
    tags=("E34", "E11"),
)
def dedup_incremental_new_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: of an incoming batch, keep only
    documents whose normalized content hash is NOT already in the
    existing corpus (here: existing = doc_id < {split}, incoming = the
    rest — the fixture stand-in for yesterday's corpus vs today's
    crawl).  Anti join on the 16-byte content hash, never on text: the
    shuffle carries hashes, not documents, and on a warehouse the
    existing side is a pre-materialized hash index scanned
    hash-bucketed (bucketBy on content_hash makes the anti join
    exchange-free — sink_bucketed_join_noshuffle shows the layout).
    The streaming twin is stream_dedup_late_data; this is the batch
    backfill path of the same contract."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.col("text")))
    existing = d.where(F.col("doc_id") < INCR_SPLIT).select(h.alias("content_hash"))
    incoming = d.where(F.col("doc_id") >= INCR_SPLIT).select(
        "doc_id", "lang", "n_chars", h.alias("content_hash")
    )
    return incoming.join(existing, "content_hash", "left_anti").select(
        "doc_id", "lang", "n_chars"
    )


CONTAINMENT_THRESHOLD = 0.5


@query(
    "dedup_containment_ngrams",
    oracle=f"""
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
        )
        SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
               ROUND(
                   CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
                   / len(a.shingles), 6) AS containment
        FROM sh a JOIN sh b
          ON a.lang = b.lang
         AND a.doc_id <> b.doc_id
         AND (len(a.shingles) < len(b.shingles)
              OR (len(a.shingles) = len(b.shingles) AND a.doc_id < b.doc_id))
         AND abs(a.n_chars - b.n_chars) <= 40
        WHERE CAST(len(list_filter(a.shingles, s -> list_contains(b.shingles, s))) AS DOUBLE)
              / len(a.shingles) >= {CONTAINMENT_THRESHOLD}
    """,
    tags=("E35",),
)
def dedup_containment_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT |A∩B| / |A| of the smaller-shingle-set doc
    in the larger — the asymmetric near-dup signal Jaccard misses:
    a short doc fully embedded in a long one (quote farms, wrapper
    pages, partial mirrors) scores containment ≈ 1 while Jaccard
    stays low.  Production corpus filters (RefinedWeb-style) gate on
    BOTH.  Same banded-blocking recipe as dedup_ngram_jaccard (equi
    join on (lang, length band), wider ±40-char band, residual
    filter), shingles compared as xxhash64 longs; the direction
    normalization (smaller set is always A, doc_id tie-break) keeps
    one deterministic row per pair."""
    d = load_table(spark, sf_dir, "documents")
    # band width 40 == the residual |n_chars| cap: the tightest width
    # that still guarantees every qualifying pair meets in a same-or-
    # adjacent band (lossless), halving per-band candidates vs a
    # wider band.
    band = (F.col("n_chars") / 40).cast("int")
    hashed = F.array_distinct(
        F.transform(word_shingles(F.col("w"), 3), lambda s: F.xxhash64(s))
    )
    sh = with_tokens(spread(d), 3, "doc_id", "lang", "n_chars").select(
        "doc_id", "lang", "n_chars", hashed.alias("sh_h"), band.alias("band")
    )
    a = sh.select(
        F.col("doc_id").alias("doc_small"),
        "lang",
        F.col("n_chars").alias("chars_a"),
        F.col("sh_h").alias("sh_a"),
        F.explode(F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)).alias("jband"),
    )
    b = sh.select(
        F.col("doc_id").alias("doc_big"),
        "lang",
        F.col("n_chars").alias("chars_b"),
        F.col("sh_h").alias("sh_b"),
        F.col("band").alias("jband"),
    )
    containment = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size("sh_a")
    direction = (F.size("sh_a") < F.size("sh_b")) | (
        (F.size("sh_a") == F.size("sh_b")) & (F.col("doc_small") < F.col("doc_big"))
    )
    return (
        a.join(b, ["lang", "jband"])
        .where(
            (F.col("doc_small") != F.col("doc_big"))
            & direction
            & (F.abs(F.col("chars_a") - F.col("chars_b")) <= 40)
        )
        .where(containment >= CONTAINMENT_THRESHOLD)
        .select("doc_small", "doc_big", F.round(containment, 6).alias("containment"))
    )


WINNOW_K = 3   # k-gram size (words)
WINNOW_W = 4   # winnowing window (hashes per window)


@query(
    "dedup_winnowing_fingerprints",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents
            WHERE len(string_split(lower(text), ' ')) >= {WINNOW_K}
        ),
        hashes AS (
            SELECT doc_id,
                   list_transform(
                       range(1, len(t) - {WINNOW_K - 1} + 1),
                       i -> {phash60_expr("array_to_string(t[i:i+" + str(WINNOW_K - 1) + "], ' ')")}
                   ) AS h
            FROM toks
        ),
        winnowed AS (
            SELECT doc_id,
                   len(h) AS n_grams,
                   list_distinct(
                       CASE WHEN len(h) <= {WINNOW_W}
                            THEN [list_min(h)]
                            ELSE list_transform(
                                range(1, len(h) - {WINNOW_W - 1} + 1),
                                i -> list_min(h[i:i+{WINNOW_W - 1}]))
                       END
                   ) AS fp
            FROM hashes
        )
        SELECT doc_id,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(len(fp) AS BIGINT) AS n_fingerprints,
               CAST(list_sum(list_transform(fp, x -> x % 1000000007)) % 1000000007
                    AS BIGINT) AS fp_checksum
        FROM winnowed
        ORDER BY doc_id
    """,
    tags=("E35", "E37"),
)
def dedup_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken —
    the MOSS algorithm): hash every {WINNOW_K}-word gram, slide a
    {WINNOW_W}-hash window, keep each window's minimum — guaranteed to
    catch any shared substring of ≥ k+w−1 words between documents
    while storing ~2/(w+1) of the grams.  The local-substring
    complement to MinHash (whole-document similarity): winnowing
    localizes WHERE the overlap is, which is what plagiarism/code-
    clone/licence-text detection needs.

    Entirely JVM higher-order functions on the portable 60-bit md5
    hash (the phash60 discipline, so fingerprints — and the order-free
    modular checksum reported per doc — are bit-identical in DuckDB).
    Per-doc row-local work, no shuffle; a pair-matching pass would
    explode fingerprints and self-join on the hash, candidate-bounded
    exactly like the banded-LSH family."""
    d = load_table(spark, sf_dir, "documents")
    tok = tokens()
    toks = d.where(F.size(tok) >= WINNOW_K).select("doc_id", tok.alias("t"))
    hashes = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (WINNOW_K - 1)),
            lambda i: phash60(F.array_join(F.slice(F.col("t"), i, WINNOW_K), " ")),
        ).alias("h"),
    )
    fp = F.array_distinct(
        F.when(
            F.size("h") <= WINNOW_W, F.array(F.array_min("h"))
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size("h") - (WINNOW_W - 1)),
                lambda i: F.array_min(F.slice(F.col("h"), i, WINNOW_W)),
            )
        )
    )
    winnowed = hashes.select(
        "doc_id", F.size("h").cast("bigint").alias("n_grams"), fp.alias("fp")
    )
    checksum = (
        F.aggregate(
            F.transform("fp", lambda x: x % 1000000007),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        % 1000000007
    )
    return winnowed.select(
        "doc_id",
        "n_grams",
        F.size("fp").cast("bigint").alias("n_fingerprints"),
        checksum.cast("bigint").alias("fp_checksum"),
    ).orderBy("doc_id")


@query(
    "dedup_cross_source_overlap",
    oracle="""
        WITH hashed AS (
            SELECT DISTINCT source, md5(substring(text, 1, 200)) AS h FROM documents
        ),
        pairs AS (
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM hashed a JOIN hashed b
              ON a.h = b.h AND a.source < b.source
            GROUP BY a.source, b.source
        ),
        per_source AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM hashed GROUP BY source
        )
        SELECT p.source_a, p.source_b, p.n_shared,
               sa.n_distinct AS n_a, sb.n_distinct AS n_b,
               ROUND(CAST(p.n_shared AS DOUBLE)
                     / LEAST(sa.n_distinct, sb.n_distinct), 6)
                   AS containment
        FROM pairs p
        JOIN per_source sa ON p.source_a = sa.source
        JOIN per_source sb ON p.source_b = sb.source
        ORDER BY p.source_a, p.source_b
    """,
    tags=("E34", "E153"),
)
def dedup_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE OVERLAP MATRIX: for every source pair, how many
    distinct document HEADS (md5 of the first 200 chars) appear in
    BOTH — prefix identity catches mirrors whose tails diverge
    (ads, footers, pagination) that whole-text hashing misses —
    the corpus-forensics read behind mixing decisions (two mirrors of
    the same crawl must not be double-weighted) and behind
    decontamination direction-of-flow questions.  Containment
    normalizes by the smaller side (the `dedup_containment_ngrams`
    convention).

    The hash self-join runs on the DEDUPLICATED (source, md5)
    projection — O(distinct contents), never O(docs²); source-pair
    output is O(|sources|²).  All counts exact; one 6-dp ratio."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "source", F.md5(F.substring("text", 1, 200)).alias("h")
    ).distinct()
    a = hashed.select(F.col("source").alias("source_a"), "h")
    b = hashed.select(F.col("source").alias("source_b"), F.col("h").alias("hb"))
    pairs = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    per_source = hashed.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct")
    )
    sa = per_source.select(
        F.col("source").alias("source_a"), F.col("n_distinct").alias("n_a")
    )
    sb = per_source.select(
        F.col("source").alias("source_b"), F.col("n_distinct").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
        .orderBy("source_a", "source_b")
    )


BLOOM_M = 16384   # bloom width in bits (fixed so both engines agree)
BLOOM_K = 3       # hash probes per key


@query(
    "dedup_bloom_prefilter_audit",
    oracle=f"""
        WITH corpus AS (
            SELECT md5(lower(text)) AS h FROM documents
            WHERE doc_id < {INCR_SPLIT}
        ),
        bloom AS (
            SELECT DISTINCT
                   {phash60_expr("h || ':' || CAST(t.k AS VARCHAR)")}
                       % {BLOOM_M} AS pos
            FROM corpus, range(0, {BLOOM_K}) t(k)
        ),
        batch AS (
            SELECT doc_id, md5(lower(text)) AS h FROM documents
            WHERE doc_id >= {INCR_SPLIT}
        ),
        probe AS (
            SELECT b.doc_id, b.h, CAST(COUNT(bl.pos) AS BIGINT) AS n_set
            FROM batch b
            CROSS JOIN range(0, {BLOOM_K}) t(k)
            LEFT JOIN bloom bl
              ON bl.pos = {phash60_expr("b.h || ':' || CAST(t.k AS VARCHAR)")}
                              % {BLOOM_M}
            GROUP BY 1, 2
        ),
        truth AS (SELECT DISTINCT h FROM corpus)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
               CAST(SUM(CASE WHEN p.n_set = {BLOOM_K} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_bloom_hits,
               CAST(SUM(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_true_dups,
               CAST(SUM(CASE WHEN p.n_set = {BLOOM_K} AND t.h IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM bloom) AS n_bits_set,
               CAST(FLOOR(CAST(SUM(CASE WHEN p.n_set = {BLOOM_K} AND t.h IS NULL
                                        THEN 1 ELSE 0 END) AS DOUBLE) * 1000000
                          / GREATEST(COUNT(*) - SUM(CASE WHEN t.h IS NOT NULL
                                                         THEN 1 ELSE 0 END), 1))
                    AS BIGINT) AS fp_rate_u
        FROM probe p LEFT JOIN truth t USING (h)
    """,
    tags=("E34", "E16"),
)
def dedup_bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-PREFILTER incremental dedup AUDIT — measures the m={BLOOM_M},
    k={BLOOM_K} Bloom filter that a 100 TB incremental-ingest pipeline
    puts IN FRONT of the exact anti join (dedup_incremental_new_only):
    batch keys whose {BLOOM_K} portable-hash positions are all set are
    the only ones that pay the exact lookup.  Reported: bloom hits vs
    exact truth, false-positive count, the realized FP rate in
    micro-units, and the fill (bits set) — the number that says
    whether m was sized right for n (at sf0.1 the fixed test width
    saturates visibly; production sizes m ∝ corpus keys).

    Portable end to end: positions are phash60(h:k) % m, so the DuckDB
    twin reconstructs the identical filter bit-for-bit.  Scale shape:
    the filter is m-BOUNDED state (broadcast once), the probe is a
    map-side join of batch × k rows against it, and the exact-truth
    join here exists only to SCORE the filter — production runs it
    solely on the hits."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.col("text")))
    corpus = d.where(F.col("doc_id") < INCR_SPLIT).select(h.alias("h"))
    ks = F.explode(F.sequence(F.lit(0), F.lit(BLOOM_K - 1))).alias("k")
    pos = lambda hcol, kcol: (  # noqa: E731
        phash60(F.concat(hcol, F.lit(":"), kcol.cast("string"))) % BLOOM_M
    )
    bloom = (
        corpus.select(ks, "h")
        .select(pos(F.col("h"), F.col("k")).alias("pos"))
        .distinct()
    )
    batch = d.where(F.col("doc_id") >= INCR_SPLIT).select("doc_id", h.alias("h"))
    probe = (
        batch.select("doc_id", "h", ks)
        .withColumn("pos", pos(F.col("h"), F.col("k")))
        .join(F.broadcast(bloom.withColumnRenamed("pos", "bpos")),
              F.col("pos") == F.col("bpos"), "left")
        .groupBy("doc_id", "h")
        .agg(F.count("bpos").cast("bigint").alias("n_set"))
    )
    truth = corpus.distinct().withColumn("is_dup", F.lit(1))
    n_bits = bloom.agg(F.count(F.lit(1)).cast("bigint").alias("n_bits_set"))
    hit = (F.col("n_set") == BLOOM_K).cast("int")
    is_dup = F.col("is_dup").isNotNull().cast("int")
    return (
        probe.join(F.broadcast(truth), "h", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_batch"),
            F.sum(hit).cast("bigint").alias("n_bloom_hits"),
            F.sum(is_dup).cast("bigint").alias("n_true_dups"),
            F.sum(hit * (1 - is_dup)).cast("bigint").alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_batch", "n_bloom_hits", "n_true_dups", "n_false_pos", "n_bits_set",
            F.floor(
                F.col("n_false_pos").cast("double")
                * 1_000_000
                / F.greatest(F.col("n_batch") - F.col("n_true_dups"), F.lit(1))
            )
            .cast("bigint")
            .alias("fp_rate_u"),
        )
    )


def _mh_audit_oracle() -> str:
    match_terms = " + ".join(
        f"CASE WHEN a.mh[{i + 1}] = b.mh[{i + 1}] THEN 1 ELSE 0 END"
        for i in range(NUM_HASHES)
    )
    return f"""
        WITH {_minhash_cte_sql()},
        scored AS (
            SELECT ({match_terms}) * 1000000 // {NUM_HASHES} AS est_u,
                   CAST(len(list_filter(sa.shingles,
                                        s -> list_contains(sb.shingles, s)))
                        AS BIGINT) * 1000000
                     // len(list_distinct(list_concat(sa.shingles, sb.shingles)))
                       AS exact_u
            FROM cand c
            JOIN sigs a ON a.doc_id = c.doc_a
            JOIN sigs b ON b.doc_id = c.doc_b
            JOIN sh sa ON sa.doc_id = c.doc_a
            JOIN sh sb ON sb.doc_id = c.doc_b
        )
        SELECT CAST(exact_u // 100000 AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(exact_u) // COUNT(*) AS BIGINT) AS mean_exact_u,
               CAST(SUM(est_u) // COUNT(*) AS BIGINT) AS mean_est_u,
               CAST(SUM(ABS(est_u - exact_u)) // COUNT(*) AS BIGINT) AS mae_u,
               CAST(SUM(est_u - exact_u) // COUNT(*) AS BIGINT) AS bias_u
        FROM scored
        GROUP BY 1
        ORDER BY bin
    """


@query("dedup_minhash_estimator_audit", oracle=_mh_audit_oracle(), tags=("E35", "E16"))
def dedup_minhash_estimator_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINHASH ESTIMATOR CALIBRATION: over the LSH candidate pairs,
    compare the signature-estimated Jaccard (matching positions /
    {NUM_HASHES}) against the exact shingle-set Jaccard, binned by
    exact similarity decile — the audit that says whether the
    {NUM_HASHES}-hash signature is trustworthy at the thresholds the
    dedup pipeline actually cuts at (the estimator's ±1/√k noise is
    exactly what separates "0.58" from "0.62" around a 0.6 cut).
    Per bin: pair count, mean exact, mean estimated, MAE and signed
    bias, all in micro-units.

    PURE INTEGERS end to end — the estimate is matches·1e6 DIV k,
    exact Jaccard is |∩|·1e6 DIV |∪|, and the per-bin means use
    integer division — so the audit passes the value oracle
    bit-for-bit.  Scale shape: the candidate join is the banded LSH
    one (never all-pairs); the audit adds two signature probes and
    the same shingle verify near_dup_pairs already pays."""
    sigs = minhash_docs(load_table(spark, sf_dir, "documents")).persist()
    cands = lsh_candidate_pairs(sigs)
    sig_a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(NUM_HASHES)],
    )
    sig_b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(NUM_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("bigint")
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("bigint")
    scored = (
        cands.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select(
            matches.cast("bigint").alias("n_match"),
            inter.alias("inter"),
            union.alias("union_n"),
        )
        .select(
            F.expr(f"n_match * 1000000 DIV {NUM_HASHES}").alias("est_u"),
            F.expr("inter * 1000000 DIV union_n").alias("exact_u"),
        )
    )
    return (
        scored.groupBy(F.expr("exact_u DIV 100000").cast("bigint").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr("sum(exact_u) DIV count(1)").cast("bigint").alias("mean_exact_u"),
            F.expr("sum(est_u) DIV count(1)").cast("bigint").alias("mean_est_u"),
            F.expr("sum(abs(est_u - exact_u)) DIV count(1)")
            .cast("bigint")
            .alias("mae_u"),
            F.expr("sum(est_u - exact_u) DIV count(1)").cast("bigint").alias("bias_u"),
        )
        .orderBy("bin")
    )


@query(
    "dedup_survivorship_rules",
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, n_chars, source,
                   {{PH}} AS content_hash
            FROM documents
        ),
        groups AS (
            SELECT content_hash, CAST(COUNT(*) AS BIGINT) AS n_dups
            FROM hashed GROUP BY content_hash
            HAVING COUNT(*) > 1
        ),
        ranked AS (
            SELECT h.content_hash, g.n_dups, h.doc_id, h.n_chars, h.source,
                   row_number() OVER (
                       PARTITION BY h.content_hash
                       ORDER BY h.n_chars DESC,
                                CASE h.source WHEN 'web' THEN 0
                                              WHEN 'wiki' THEN 1
                                              ELSE 2 END,
                                h.doc_id) AS rn
            FROM hashed h JOIN groups g USING (content_hash)
        )
        SELECT content_hash, n_dups,
               doc_id AS survivor_doc_id,
               n_chars AS survivor_n_chars,
               source AS survivor_source
        FROM ranked WHERE rn = 1
        ORDER BY content_hash
    """.replace("{PH}", phash60_expr("text")),
    tags=("E437",),
)
def dedup_survivorship_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVORSHIP RULES for duplicate groups — the MDM "golden
    record" step the plain keep-min-id dedup (dedup_keep_canonical)
    skips: within each exact-content group the survivor is chosen by
    an ordered RULE CASCADE (longest text, then source priority
    web > wiki > other, then lowest id as the final deterministic
    tie-break).  In a crawl pipeline this is "keep the most complete
    copy from the most trusted source" — the difference between
    deduping and CURATING.

    Exact: content identity is the portable hash, the cascade is one
    multi-key row_number with an integer CASE for source rank — the
    survivor is bit-deterministic on both engines.  Plan: one hash
    per doc, one group aggregate to find multi-doc groups, one window
    pass over ONLY those groups (duplicates are a tiny fraction; the
    anti-join drops singletons before the sort).  At 100 TB this is
    the same shuffle as exact dedup plus a window over the dup
    minority."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id",
        "n_chars",
        "source",
        phash60(F.col("text")).alias("content_hash"),
    )
    groups = (
        hashed.groupBy("content_hash")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )
    src_rank = (
        F.when(F.col("source") == "web", 0)
        .when(F.col("source") == "wiki", 1)
        .otherwise(2)
    )
    w = Window.partitionBy("content_hash").orderBy(
        F.desc("n_chars"), src_rank.asc(), F.asc("doc_id")
    )
    return (
        hashed.join(groups, "content_hash")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "content_hash",
            "n_dups",
            F.col("doc_id").alias("survivor_doc_id"),
            F.col("n_chars").alias("survivor_n_chars"),
            F.col("source").alias("survivor_source"),
        )
        .orderBy("content_hash")
    )


LSH_PLAN_CONFIGS = ((16, 4), (8, 8), (4, 16))  # (bands, rows) at 64 hashes


@query(
    "dedup_lsh_scurve_planner",
    oracle="""
        WITH grid AS (
            SELECT b, r, k, k / 100.0 AS s
            FROM (VALUES (16, 4), (8, 8), (4, 16)) cfg(b, r),
                 range(1, 100) g(k)
        ),
        powed AS (
            SELECT b, r, k, s,
                   s * s AS s2,
                   (s * s) * (s * s) AS s4
            FROM grid
        ),
        powed2 AS (
            SELECT b, r, k, s,
                   CASE r WHEN 4 THEN s4
                          WHEN 8 THEN s4 * s4
                          ELSE (s4 * s4) * (s4 * s4) END AS sr
            FROM powed
        ),
        curve AS (
            SELECT b, r, k,
                   1.0 - CASE b
                       WHEN 4 THEN ((1.0 - sr) * (1.0 - sr))
                                   * ((1.0 - sr) * (1.0 - sr))
                       WHEN 8 THEN (((1.0 - sr) * (1.0 - sr))
                                    * ((1.0 - sr) * (1.0 - sr)))
                                   * (((1.0 - sr) * (1.0 - sr))
                                      * ((1.0 - sr) * (1.0 - sr)))
                       ELSE ((((1.0 - sr) * (1.0 - sr))
                              * ((1.0 - sr) * (1.0 - sr)))
                             * (((1.0 - sr) * (1.0 - sr))
                                * ((1.0 - sr) * (1.0 - sr))))
                            * ((((1.0 - sr) * (1.0 - sr))
                                * ((1.0 - sr) * (1.0 - sr)))
                               * (((1.0 - sr) * (1.0 - sr))
                                  * ((1.0 - sr) * (1.0 - sr)))) END AS p
            FROM powed2
        )
        SELECT b AS bands, r AS rows_per_band,
               CAST(MIN(CASE WHEN p >= 0.5 THEN k END) AS BIGINT)
                   AS s50_pct,
               CAST(MAX(CASE WHEN k = 30
                        THEN CAST(FLOOR(p * 1000000) AS BIGINT) END)
                    AS BIGINT) AS p30_ppm,
               CAST(MAX(CASE WHEN k = 50
                        THEN CAST(FLOOR(p * 1000000) AS BIGINT) END)
                    AS BIGINT) AS p50_ppm,
               CAST(MAX(CASE WHEN k = 70
                        THEN CAST(FLOOR(p * 1000000) AS BIGINT) END)
                    AS BIGINT) AS p70_ppm,
               CAST(MAX(CASE WHEN k = 90
                        THEN CAST(FLOOR(p * 1000000) AS BIGINT) END)
                    AS BIGINT) AS p90_ppm
        FROM curve
        GROUP BY b, r
        ORDER BY bands
    """,
    tags=("E455",),
)
def dedup_lsh_scurve_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH PARAMETER PLANNER: the banding S-curve P(candidate) =
    1 - (1 - s^r)^b for every (bands, rows) factorization of the
    64-hash budget the MinHash family uses — the table you read
    BEFORE choosing dedup_near_minhash's banding: where the curve
    crosses 1/2 is the effective Jaccard threshold, and the p@s
    columns quantify false-candidate mass below it and miss mass
    above.  (16,4) is the loose-threshold config (~0.5), (4,16) the
    strict one (~0.92); the planner shows exactly what each buys.

    Exactness trick: NO pow() anywhere — s^r and (1-s^r)^b use
    explicit dyadic repeated-squaring multiplication trees with
    identical association order in both engines (pow is a libm
    transcendental whose last ulp differs across implementations;
    plain * is IEEE-exact), so the FLOOR-ppm values are bit-stable.
    Pure derived table — no corpus input; the grid is 3 configs x 99
    thresholds.  100 TB relevance: this is the op that justifies the
    banded joins' parameters everywhere else; it costs nothing at
    any scale."""
    cfg = spark.createDataFrame(
        [(b, r) for b, r in LSH_PLAN_CONFIGS], "b: int, r: int"
    )
    grid = cfg.crossJoin(
        spark.range(1, 100).select(F.col("id").cast("int").alias("k"))
    ).withColumn("s", F.col("k") / 100.0)
    s2 = F.col("s") * F.col("s")
    s4 = (F.col("s") * F.col("s")) * (F.col("s") * F.col("s"))
    powed = grid.withColumn(
        "sr",
        F.when(F.col("r") == 4, s4)
        .when(F.col("r") == 8, s4 * s4)
        .otherwise((s4 * s4) * (s4 * s4)),
    )
    t = 1.0 - F.col("sr")
    t4 = (t * t) * (t * t)
    t8 = ((t * t) * (t * t)) * ((t * t) * (t * t))
    t16 = (((t * t) * (t * t)) * ((t * t) * (t * t))) * (
        ((t * t) * (t * t)) * ((t * t) * (t * t))
    )
    curve = powed.withColumn(
        "p",
        1.0
        - F.when(F.col("b") == 4, t4)
        .when(F.col("b") == 8, t8)
        .otherwise(t16),
    )

    def p_at(k: int):
        return (
            F.max(
                F.when(
                    F.col("k") == k,
                    F.floor(F.col("p") * 1000000).cast("bigint"),
                )
            )
            .cast("bigint")
            .alias(f"p{k}_ppm")
        )

    return (
        curve.groupBy(F.col("b").alias("bands"), F.col("r").alias("rows_per_band"))
        .agg(
            F.min(F.when(F.col("p") >= 0.5, F.col("k")))
            .cast("bigint")
            .alias("s50_pct"),
            p_at(30),
            p_at(50),
            p_at(70),
            p_at(90),
        )
        .orderBy("bands")
    )
