"""SparkSession factory with scale-aware defaults.

The reference engine's physical machinery (16 KB paged file with
O_DIRECT + fsync, ``/root/reference/src/storage.rs:57-84``; clock-swept
buffer pool, ``bufferpool.rs:39-73``; CRC32 page checksums,
``aligned.rs:61-64``) maps onto Spark/Parquet built-ins (SURVEY.md
§4.2), so the only "storage engine" code we own is configuration.

The defaults below are chosen for the 100 TB / 1000-executor target and
merely *tested* on local[32]:

- AQE on (runtime partition coalescing + skew-join splitting) so plans
  re-optimize with real statistics at any scale.
- Shuffle partitions: small fixed number locally (env-tunable); on a
  real cluster AQE's coalescing makes the initial number far less
  critical than in static planning.
- Broadcast threshold left at default 10 MB; dimension tables are also
  hinted explicitly with ``F.broadcast`` at call sites so plans stay
  broadcast-joins even if statistics are missing.
- Arrow enabled for every pandas interchange (vectorized UDF path).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_session", "DEFAULT_CONFS"]

DEFAULT_CONFS: dict[str, str] = {
    # Runtime adaptivity: re-plan with actual stats — critical at scale.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all pandas/python interchange (vectorized, not per-row).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Parquet scan efficiency: pushdown + vectorized reader are defaults,
    # set explicitly so a regression is loud.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Timestamps in testdata are ms/ns precision; use java8 time API.
    "spark.sql.session.timeZone": "UTC",
    # Keep partition files reasonably sized when writing.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Headless engine: no web UI, and trim retained listener state —
    # a 350+-query bench session otherwise accumulates UI/plan history
    # for thousands of stages in the driver (measured as a steady
    # per-query slowdown late in long sessions).
    "spark.ui.enabled": "false",
    "spark.sql.ui.retainedExecutions": "10",
    "spark.ui.retainedJobs": "100",
    "spark.ui.retainedStages": "100",
    "spark.ui.retainedTasks": "1000",
    # events.parquet stores TIMESTAMP(NANOS), which the vectorized
    # parquet reader otherwise rejects.  Declared session-wide (rather
    # than toggled inside the events read path) so the behavior —
    # nanosecond parquet timestamps surface as int64 nanos and must be
    # converted explicitly (catalog.nanos_to_ts) — is a documented
    # engine-wide contract, not a read-path side effect (ADVICE.md r1).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Whole-stage-codegen CLASS CACHE (static conf — must be set at
    # session build).  The default of 100 compiled-class entries is
    # sized for a handful of hot queries; a 523-query suite with
    # INTERLEAVED bench reps (r6 protocol) generates thousands of
    # distinct codegen units between two reps of the same query, so
    # every rep ran with a cold Janino cache and re-paid ~1-2 s of
    # compilation — measured on text_trigram_name_similarity (isolated
    # min 4.9 s vs 7.3 s inside a 42-query session; raising the cache
    # restored in-suite parity, see SURVEY §6 r7) and the prime suspect
    # for the r6 "+5% common-set drift" the interleave introduced.
    # Cost is driver metaspace for cached classes (bounded, ~KBs per
    # entry); on a 1000-executor cluster the same cache exists per
    # executor and repeated-plan workloads want it just as large.
    # r9: raised 10000 -> 40000 — at 679 registered queries x ~15
    # codegen units x 3 interleaved passes the 10k LRU started
    # thrashing again (the r6 failure mode at the new suite size):
    # the common-568 min-time sum inflated ~31% round-over-round with
    # NO per-query plan changes, the uniform-everything signature of
    # recompilation churn, and re-benching at 40k recovered it.
    "spark.sql.codegen.cache.maxEntries": "40000",
    # ContextCleaner only tears down dereferenced shuffle files /
    # broadcast blocks after a driver GC queues their weak refs; with a
    # large heap GC is rare, so teardown arrives in bursts that land
    # under whatever query runs next (r9: 20 bench wake victims with
    # in-suite medians up to 16x their isolated cost).  Shorten the
    # periodic driver GC from the 30min default so cleanup stays
    # incremental; the bench harness additionally drains explicitly
    # between measurement slots (bench.drain_cleaner).
    "spark.cleaner.periodicGC.interval": "2min",
}


def _local_cores() -> str:
    return os.environ.get("SPARK_GRAFT_CPUS", "*")


def get_session(app_name: str = "potpot_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``shuffle_partitions`` defaults to the local core count so tiny
    local runs don't pay 200-partition scheduling overhead; on a real
    cluster this should be ~2-3x total executor cores and AQE coalesces
    downward from there.
    """
    cores = _local_cores()
    if shuffle_partitions is None:
        try:
            shuffle_partitions = int(cores)
        except ValueError:
            shuffle_partitions = os.cpu_count() or 8

    builder = SparkSession.builder.appName(app_name).master(f"local[{cores}]")
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # Local-mode heap: the driver JVM IS the executor, and the r9
    # bench showed an 8g heap produced a UNIFORM ~1.25x min-time
    # inflation across every size class (GC-fraction signature) once
    # 679 queries x 3 interleaved passes shared it.  But a fixed 32g
    # default bakes the 128 GiB bench host into the library entry
    # point (ADVICE r9) — on a 16 GB laptop the JVM would swap or be
    # OOM-killed.  Derive the default from detected host memory
    # (~1/4 of RAM, clamped to [2g, 32g]); the bench harness pins the
    # measured figure via SPARK_GRAFT_DRIVER_MEM, which always wins.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if not driver_mem:
        try:
            total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        except (ValueError, OSError, AttributeError):
            total = 8 << 30
        # sysconf reports HOST RAM; inside a memory-limited cgroup
        # (container) the JVM would size itself against 128 GiB while
        # the kernel OOM-kills at the 8 GiB limit (ADVICE r10).  Take
        # the min with the cgroup v2/v1 limit when one is set.
        for limit_path in (
            "/sys/fs/cgroup/memory.max",               # v2
            "/sys/fs/cgroup/memory/memory.limit_in_bytes",  # v1
        ):
            try:
                with open(limit_path) as fh:
                    raw = fh.read().strip()
                if raw and raw != "max":
                    lim = int(raw)
                    # v1 reports ~PTRDIFF_MAX when unlimited
                    if 0 < lim < (1 << 60):
                        total = min(total, lim)
                break
            except (OSError, ValueError):
                continue
        total_gib = total >> 30
        driver_mem = f"{max(2, min(32, total_gib // 4))}g"
    builder = builder.config("spark.driver.memory", driver_mem)
    # Shuffle/spill scratch on tmpfs when available: local-mode shuffle
    # files (and their async ContextCleaner deletion) otherwise hit the
    # root disk, and the teardown I/O of a heavy query taxes whatever
    # runs next (the r6 bench "wake tax" — interleaved medians showed
    # light queries 2-4s slower right after explode-heavy ones).  On a
    # real cluster the cluster manager owns local dirs; this is purely
    # the local-bench/test path.  Override with SPARK_GRAFT_LOCAL_DIR
    # (set to "" to disable).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        # only adopt tmpfs when it can actually absorb shuffle spill —
        # Docker's default /dev/shm is 64 MB and would ENOSPC where the
        # root-disk default works (round-6 review)
        try:
            st = os.statvfs("/dev/shm")
            if st.f_bavail * st.f_frsize >= 8 << 30:
                local_dir = "/dev/shm/potpot_spark_local"
        except OSError:
            pass
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in DEFAULT_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
