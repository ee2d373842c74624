#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md protocol).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], forcing full
materialization through the noop sink (no driver-side collect cost),
and prints ONE SHORT JSON line as the final stdout line:

    {"metric": "total_wall_sec", "value": N, "unit": "sec",
     "sf": 0.1, "queries_run": N, "errors": N}

The full per-query timing map (200+ keys) is written to
BENCH_DETAIL.json next to this script — embedding it in the stdout
line overflows the driver's stdout-tail buffer (ADVICE.md r1).
Each query runs $SPARK_GRAFT_BENCH_RUNS (default 3) warm reps,
INTERLEAVED as full passes over the suite (r5 verdict #3 — reps run
back-to-back contend with ContextCleaner teardown of their own
previous rep's shuffle files and bias explode-heavy medians 2-3x
high); the detail entry is {"median", "min", "runs"} with a true
statistics.median, and the headline total sums medians (r4 verdict
#3 — single-run numbers could not adjudicate 2x swings on a shared
host).  Queries that raise are
recorded with median -1.0 and counted in "errors" so a regression
from working to erroring is visible in the headline line.

WALL-CLOCK BUDGET (r9 verdict #1): at 679 keys x 3 interleaved
passes the suite outgrew the driver's bench window — BENCH_r09.json
is rc=124/parsed:null, so round 9 has NO official perf number.
$SPARK_GRAFT_BENCH_BUDGET_SEC (default 2400) now bounds the whole
run: pass 1 always covers EVERY registered query (the artifact must
report queries_run == registry size), and the remaining passes are
FULL interleaved passes over the whole registry (the r10 shakedown
showed pass-1-only sub-second medians carry the one-time codegen
compile, inflating that class 1.78x vs warm), each gated on the
budget minus a reserve for the isolated-rerun tail: a pass stops
enqueueing new queries the moment the reserve is reached, so
degradation is graceful mid-pass.  reps_by_name in the detail file
records what each query actually got.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from potpot_spark import registry
from potpot_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def materialize(df) -> None:
    """Force full execution without shipping rows to the driver."""
    df.write.format("noop").mode("overwrite").save()


def drain_cleaner(spark, settle_sec: float = 0.5) -> None:
    """Force ContextCleaner teardown to happen NOW, not under the next
    timed query.

    Shuffle files / broadcast blocks are only dereferenced when a
    driver GC runs; with a 32g heap GC is rare, so teardown arrives in
    bursts that land under whatever query runs next (r9: 20 wake
    victims, medians up to 16x their isolated cost — e.g.
    dedup_shard_locality_audit 14.34 s in-suite vs 0.87 s isolated).
    An explicit System.gc() enqueues the weak refs immediately and the
    settle sleep gives the cleaner thread a window to delete the files
    off the tmpfs local dir before the next measurement starts.
    """
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:  # noqa: BLE001 - drain is best-effort
        pass
    time.sleep(settle_sec)


def main() -> int:
    only = sys.argv[1:]
    bench_start = time.perf_counter()
    budget_sec = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "2400"))
    # Bench host sizing is the harness's business, not the library's
    # (ADVICE r9): get_session derives a conservative heap from host
    # memory; the bench explicitly asks for the measured 32g config.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    spark = get_session("potpot_bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    # Untimed warmup: JVM JIT, codegen compiler, parquet footer caches and
    # the noop-writer path all initialize here so the first measured query
    # isn't charged ~2s of one-time session cost.
    materialize(spark.range(100_000).selectExpr("id % 7 AS k", "id AS v").groupBy("k").sum("v"))
    materialize(spark.read.parquet(os.path.join(SF_DIR, "nation.parquet")))
    # ICU collation tables load lazily on first collated comparison
    # (~8 s once per JVM); touch them here so the collation query
    # measures the operator, not the library load.
    materialize(spark.range(10).selectExpr("collate(cast(id AS string), 'UTF8_LCASE') AS c").groupBy("c").count())
    # Streaming warmup: the micro-batch engine + state-store providers
    # cost ~5-7s once per JVM; without this the first streaming query
    # in the loop absorbs it.
    from pyspark.sql import functions as F

    from potpot_spark.streaming.runner import run_to_batch, stream_events

    run_to_batch(stream_events(spark, SF_DIR).groupBy("event_type").count(), "complete")
    # Stream-stream join machinery (symmetric hash join state managers)
    # JITs separately from aggregation state; warm it on a pruned slice.
    _a = (
        stream_events(spark, SF_DIR)
        .where(F.col("event_id") < 50)
        .select(F.col("event_id").alias("a_id"), F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts"))
        .withWatermark("a_ts", "1 hour")
    )
    _b = (
        stream_events(spark, SF_DIR)
        .where(F.col("event_id") < 50)
        .select(F.col("event_id").alias("b_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
        .withWatermark("b_ts", "1 hour")
    )
    run_to_batch(
        _a.join(
            _b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 MINUTES")),
        ),
        "append",
    )
    # Python DataSource bridge warmup: the first Python-defined scan
    # pays ~5 s of one-time cost (source pickling, Python planner
    # worker spawn, Arrow bridge init) — same treatment as the
    # streaming/collation warmups above so scan_python_datasource
    # measures the connector, not the bridge.
    from potpot_spark.sources.python_ds import DocPythonSource

    spark.dataSource.register(DocPythonSource)
    materialize(
        spark.read.format("potpot_pydocs")
        .option("path", os.path.join(SF_DIR, "documents.parquet"))
        .load()
        .limit(10)
    )

    # Shared-intermediate pre-warm (ADVICE r2 "attributable timings"):
    # the pair graph / components / co-purchase edges build once per
    # session (materialize.shared_intermediate) and were charged to
    # whichever family member ran first, making per-query numbers
    # unstable across runs.  Build them here, bill the cost to ONE
    # explicit shared_build_sec line (still added to the headline
    # total — the work is real), and let every query time its marginal
    # cost.
    # r4 verdict #2: the ANN trained indexes (IVF centroids/postings,
    # PQ codebooks/codes) and the embedding pair graph join the list —
    # index TRAINING is billed here once, so the timed loop reports
    # probe-only numbers for sim_search_ivf / sim_search_pq_adc and
    # marginal cost for every shared_intermediate consumer.
    # r7 verdict #7: shared_build_sec grew opaque (40 -> 51 s with the
    # WDS store) — record PER-BUILDER seconds so growth stays
    # auditable.  Each entry is (registered query that forces the
    # build, intermediate name billed).
    _SHARED_BUILDERS = (
        ("pipeline_corpus_filter", "corpus_filter_survivors"),
        ("dedup_connected_components", "dedup_cc_components"),
        ("analytics_market_basket", "part_repeat_pairs"),
        ("graph_triangle_count", "part_copurchase_edges"),
        ("dedup_embedding_cosine", "embedding_cosine_pairs"),
        ("sim_search_ivf", "ivf_centroids+postings"),
        ("sim_search_pq_adc", "pq_codebooks+codes"),
        ("graph_label_propagation", "lpa_labels"),
        # r7 verdict #1: the forward multi-source sigma-BFS shared by
        # harmonic / eccentricity / sampled betweenness (warmed via
        # harmonic, the cheapest consumer: build + one aggregate)
        ("graph_harmonic_centrality", "hc_seed_reach"),
        # r9: the centered-Gram cell table shared by the trace-identity
        # spectrum family (participation ratio, CKA) — warmed via the
        # participation ratio, the cheapest consumer
        ("embedding_participation_ratio", "emb_gram_cells"),
        ("multimodal_webdataset_samples", "wds_shard_store"),
    )
    shared_build_breakdown: dict[str, float] = {}
    heavy_drain_sec = 2.5  # drain teardown after explode-heavy slots
    t0 = time.perf_counter()
    for warm_name, intermediate in _SHARED_BUILDERS:
        spec = registry.specs().get(warm_name)
        if spec is None or (only and not any(f in warm_name for f in only)):
            continue
        t1 = time.perf_counter()
        try:
            materialize(spec.fn(spark, SF_DIR))
        except Exception:  # noqa: BLE001 - the timed loop reports it
            pass
        shared_build_breakdown[intermediate] = round(
            time.perf_counter() - t1, 3
        )
        # The timed loop drains cleaner teardown between measurement
        # slots; the builders need the same discipline — the r11-opt
        # baseline measured part_copurchase_edges at 18.8 s inside the
        # back-to-back builder chain vs 2.7-5 s in a clean session
        # (the corpus-filter/minhash builders' shuffle teardown landed
        # under it).  The settle sleep is billed to shared_build_sec,
        # same as the work it protects.
        if time.perf_counter() - t1 > heavy_drain_sec:
            drain_cleaner(spark, settle_sec=1.0)
    shared_build_sec = round(time.perf_counter() - t0, 3)

    # r4 verdict #3: single-run numbers on a variably-loaded 32-thread
    # host produced two rounds of phantom 2x swings (LSH r3,
    # clustering-coefficient r4).  Each query now runs RUNS times warm
    # and the detail file carries {median, min, runs}; the headline
    # total sums MEDIANS (plus shared_build), so it is comparable
    # round-over-round and robust to one co-scheduled stage.
    # r5 verdict #3: the reps are INTERLEAVED (pass 1 over every
    # query, then pass 2, then pass 3) instead of back-to-back — r5's
    # consecutive reps showed a repeatable median>=2x-min penalty on
    # the explode-heavy family (decontaminate 11.4/3.9, winnowing
    # 2.7/1.7) that isolated reruns of the same queries never
    # reproduce: rep N was contending with ContextCleaner teardown of
    # rep N-1's own just-dereferenced shuffle files.  Separating reps
    # by a full pass removes the self-contention while keeping every
    # rep warm (codegen/footer caches are session-level).
    runs_per_query = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    names = [
        name
        for name in registry.specs()
        if not only or any(f in name for f in only)
    ]
    times_by_name: dict[str, list[float]] = {n: [] for n in names}
    failed: set[str] = set()

    def run_once(name: str) -> None:
        spec = registry.specs()[name]
        t0 = time.perf_counter()
        try:
            materialize(spec.fn(spark, SF_DIR))
            times_by_name[name].append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            print(
                f"# BENCH ERROR {name}: {type(e).__name__}: {str(e).splitlines()[0][:200]}",
                file=sys.stderr,
            )
            failed.add(name)

    def remaining() -> float:
        return budget_sec - (time.perf_counter() - bench_start)

    # Pass 1: EVERY query, unconditionally — the driver artifact must
    # cover the whole registry even if the budget is tight.
    def drain_after(name: str) -> None:
        # settle time scales with how heavy the finished query was: a
        # fixed 0.5 s was not enough for the next measurement to dodge
        # a 10 GB-shuffle teardown (r10: the query AFTER node2vec
        # still measured 5.6 s in-suite vs 0.8 s isolated)
        t = times_by_name[name][-1] if times_by_name[name] else 0.0
        if t > heavy_drain_sec:
            drain_cleaner(spark, settle_sec=min(3.0, max(0.5, 0.15 * t)))

    for name in names:
        run_once(name)
        drain_after(name)
    # Re-rep passes: FULL interleaved passes while the budget — minus
    # a reserve for the isolated-rerun tail — allows (pass 2 first ran
    # only the >=1 s cohort, but that left every sub-second query's
    # median equal to its single pass-1 sample, which carries the
    # plan's one-time codegen compile: the r10 shakedown showed the
    # sub-second class inflated 1.78x vs its warm cost while the >=1 s
    # class sat at 1.33x).  If the budget dies mid-pass the remaining
    # queries keep their pass-1 sample — reps_by_name records who got
    # what, degradation is visible, and the artifact still covers the
    # whole registry.
    isolated_reserve_sec = 240.0
    for _ in range(runs_per_query - 1):
        if remaining() <= isolated_reserve_sec:
            break
        drain_cleaner(spark, settle_sec=1.0)
        for name in names:
            if name in failed or remaining() <= isolated_reserve_sec:
                continue
            run_once(name)
            drain_after(name)
    timings: dict[str, dict[str, float]] = {}
    total = shared_build_sec
    errors = 0
    for name in names:
        times = times_by_name[name]
        if name in failed or not times:
            timings[name] = {"median": -1.0, "min": -1.0, "runs": len(times)}
            errors += 1
            continue
        med = statistics.median(times)
        timings[name] = {
            "median": round(med, 3),
            "min": round(min(times), 3),
            "runs": len(times),
        }
        total += med
    # r7 verdict #3: wake-victim adjudication is now MECHANICAL — a
    # query sitting downstream of a heavy neighbor in the interleaved
    # passes can show a 2-3x in-suite median with no code change
    # (r7: graph_degree_assortativity 3.08 s in-suite vs 0.79-1.0 s
    # isolated; the judge had to profile it by hand).  Flag any query
    # whose median is >2x its own min OR >25% over its prior-round
    # median (newest BENCH_DETAIL_r*.json), re-run each flagged query
    # once ISOLATED at the end (after a cleaner-drain pause), and
    # record the number in the detail entry so regressions and wake
    # noise separate without human adjudication.
    prior_medians: dict[str, float] = {}
    if not only:
        import glob
        import re

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = []
        for p in glob.glob(os.path.join(here, "BENCH_DETAIL_r[0-9]*.json")):
            m = re.match(r"BENCH_DETAIL_r(\d+)\.json$", os.path.basename(p))
            if m:
                rounds.append((int(m.group(1)), p))
        if rounds:
            _, prior_path = max(rounds)
            try:
                with open(prior_path) as f:
                    prior_medians = {
                        k: v.get("median", -1.0)
                        for k, v in json.load(f).get("queries", {}).items()
                    }
            except Exception:  # noqa: BLE001 - flagging is best-effort
                prior_medians = {}
    flagged = []
    for name in names:
        t = timings[name]
        med, mn = t["median"], t["min"]
        if med < 0.5:  # sub-noise-floor queries can't be adjudicated
            continue
        prior = prior_medians.get(name, -1.0)
        if med > 2 * mn or (prior > 0 and med > 1.25 * prior):
            flagged.append(name)
    # bound the isolated tail: worst offenders first, at most 32 (r12,
    # VERDICT r11 #7 — the r12 baseline hit the old cap of 20 exactly,
    # leaving flagged keys unadjudicated; 32 reruns at the observed
    # ~4-5 s each still fit the 240 s reserve, and the change only ADDS
    # isolated samples — the headline sum-of-medians is untouched), and
    # stop when the wall-clock budget is exhausted (a missing isolated
    # sample degrades adjudication, never the headline artifact).
    # A rerun can itself be a wake victim of the PREVIOUS rerun's
    # teardown (r10 shakedown: node2vec measured 41 s isolated right
    # after the dbscan explode-join's cleanup, vs 3.6 s in-suite min) —
    # when the "isolated" sample comes out worse than the in-suite
    # median it is re-measured once after a longer settle and the
    # better of the two attempts is kept.
    flagged.sort(key=lambda n: -timings[n]["median"])
    for name in flagged[:32]:
        if remaining() <= 10.0:
            break
        drain_cleaner(spark, settle_sec=2.0)
        spec = registry.specs()[name]
        t0 = time.perf_counter()
        try:
            materialize(spec.fn(spark, SF_DIR))
            iso = time.perf_counter() - t0
            if iso > timings[name]["median"] and remaining() > 15.0:
                drain_cleaner(spark, settle_sec=4.0)
                t0 = time.perf_counter()
                materialize(spec.fn(spark, SF_DIR))
                iso = min(iso, time.perf_counter() - t0)
            timings[name]["isolated"] = round(iso, 3)
        except Exception:  # noqa: BLE001 - already counted above
            pass

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # A name-filtered invocation must not clobber the full-suite
    # detail map (burned once in r5: a 6-query A/B overwrote the
    # 417-query record).
    detail_name = "BENCH_DETAIL_FILTERED.json" if only else "BENCH_DETAIL.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    # r8 verdict #6: the round-over-round comparison must not inherit
    # interleave noise — report the headline sum BOTH ways: medians
    # everywhere, and medians-with-isolated-substituted-where-flagged
    # (the isolated rerun is the wake-noise-free number for exactly
    # the queries the flagger caught).
    total_isolated_where_flagged = shared_build_sec
    n_isolated = 0
    for name in names:
        t = timings[name]
        if t["median"] < 0:
            continue
        if "isolated" in t:
            # clamp to [min, median]: the substitution exists to strip
            # wake noise out of the headline, and an isolated sample
            # that is itself a wake victim must not re-add it
            total_isolated_where_flagged += max(
                min(t["isolated"], t["median"]), t["min"]
            )
            n_isolated += 1
        else:
            total_isolated_where_flagged += t["median"]
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "total_wall_sec",
                "value": round(total, 3),
                "sum_isolated_where_flagged_sec": round(
                    total_isolated_where_flagged, 3
                ),
                "n_isolated_substituted": n_isolated,
                "unit": "sec",
                "sf": sf_val,
                "errors": errors,
                "budget_sec": budget_sec,
                "elapsed_sec": round(time.perf_counter() - bench_start, 3),
                "shared_build_sec": shared_build_sec,
                "shared_build_breakdown": shared_build_breakdown,
                "queries": timings,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    # Final stdout line stays short (the driver tails stdout and parses
    # the last JSON line; a 6 KB line gets truncated — ADVICE.md r1).
    print(
        json.dumps(
            {
                "metric": "total_wall_sec",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf_val,
                "queries_run": len(timings),
                "errors": errors,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
