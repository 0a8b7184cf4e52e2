"""SparkSession factory.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config choice is made for a real multi-executor cluster at ~100 TB:

- AQE on: runtime shuffle-partition coalescing, broadcast-join conversion and
  skew-join splitting replace hand-tuned partition counts at scale.
- ``spark.sql.shuffle.partitions`` is only the *initial* number; AQE coalesces.
- Arrow on: every Pandas-UDF boundary is Arrow-batched (the only Python code
  paths in this engine are the tier-3 fuzzy lookup and multimodal decode).
- UTC session timezone: deterministic timestamp semantics across engines
  (parity with the DuckDB oracle and with any downstream warehouse).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aldean-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(cpus)))
    # Shuffle/spill scratch: prefer tmpfs when present — the default /tmp
    # sits on a virtual disk whose latency varies with host neighbors, and
    # local-mode shuffle volumes here are MBs. tmpfs is RAM-backed and is
    # commonly tiny in containers (64 MB default), so only prefer it when it
    # reports enough free space for local-mode shuffle volume; otherwise
    # shuffle spill fails with no-space errors or pressures host memory. On
    # a real cluster point this at fast local SSDs instead (deployment
    # config, not engine semantics).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        try:
            st = os.statvfs("/dev/shm")
            free_bytes = st.f_bavail * st.f_frsize
        except OSError:
            free_bytes = 0
        # 4 GiB floor: comfortably above the largest shuffle this engine
        # produces in local mode at sf1 (sub-GB), far below the 128 GiB
        # bench host's tmpfs (half of RAM by default).
        if free_bytes >= 4 * 1024**3:
            local_dir = "/dev/shm/spark-local"
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.local.dir", local_dir or "/tmp")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The generated-class cache defaults to 100 entries; a workload with
        # tens of distinct query shapes (this engine's surface) evicts and
        # janino-recompiles the biggest classes (the 64-aggregate MinHash /
        # SimHash combines take seconds to compile) on every re-plan.
        # Measured: dedup_minhash 22.8 s → 3.7 s at sf0.1 once the compile
        # is cached. Cheap in memory (generated classes are small), pure win
        # for a long-running cluster app.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # Dozens of distinct query shapes × whole-stage codegen emit enough
        # janino classes to fill the JVM's default 240 MB code cache; when it
        # fills, the JIT disables itself and hot aggregate/join loops drop to
        # interpreted bytecode (measured here as a ~9x single-task slowdown
        # late in a 30-query session). 512m was the r3 fix; by r6 the
        # registry's 74 query shapes at sf1 saturate THAT too — reproduced:
        # docs_repetition (pure codegen expressions) ran 2.7 s in a fresh
        # session but 6.2 s after 15 assorted queries with 512m, and 3.4 s
        # with 1g. r9: the 54-query headline + two streaming replay configs
        # + the heavy-tail additions pushed a full bench session past 1g
        # again (median +11% vs a same-day 50-query session, concentrated
        # on pure-codegen relational plans — the JIT-sweep signature), so
        # 2g. Reserved (virtual) memory only — committed grows with
        # use; trivial on any real driver host. Only effective when this
        # process launches the JVM (driver-local mode); harmless otherwise.
        .config(
            "spark.driver.extraJavaOptions",
            (
                "-XX:ReservedCodeCacheSize=2g "
                + os.environ.get("SPARK_GRAFT_JAVA_OPTS", "")
            ).strip(),
        )
        .getOrCreate()
    )
