"""SparkSession factory tuned for this engine.

local[N] in the sandbox; the same configs are the ones we'd set on a real
multi-executor cluster (AQE, Arrow, explicit shuffle parallelism).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "fineweb_legal_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # Python UDF workers inherit this env (driver -> JVM -> daemon -> fork).
    # Keep glibc from returning freed arena memory to the kernel: page
    # faults are pathologically slow in this microVM (~0.2-0.8 GB/s commit)
    # and per-Arrow-batch mmap/munmap churn across 32 workers re-faults the
    # same memory thousands of times.
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "-1")
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "268435456")
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # default 64m advisory lets AQE coalesce the dedup-window shuffle
        # below the core count (11 partitions for ~700MB → 32 cores idle)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: driver heap is the ONLY executor memory pool. Heap
        # sizing on this microVM is dominated by a pathology: the guest
        # commits memory at only ~0.2-0.8 GB/s (EPT faults + TLB-shootdown
        # IPI storms; THP makes it WORSE), so concurrent heap growth under
        # 32 allocating tasks put the kernel at ~99% system time for
        # minutes — the round-1 'local[32] slower than local[8]' scaling
        # anomaly. Fix: a MODEST heap, pinned (-Xms=-Xmx) and pre-touched
        # once at startup (~15 s one-time), exactly the discipline real
        # cluster executors use (Xms=Xmx, live for hours). 16g is enough
        # for 32 window/sort tasks on the 2M-turn bench (probe records
        # spill_mb to verify).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # G1 pause goal relaxed for batch throughput: the default 200 ms
        # goal makes G1 keep the young gen SMALL under a high allocation
        # rate — the pair-expansion joins (exact-jaccard member
        # expansion, ~300M short-lived rows/run) then spent 57% of task
        # time in young GC (stage taskSummary: 310 s GC / 548 s run). A
        # 1500 ms goal lets G1 grow young adaptively and cut that branch
        # 13.9 -> 4.6 s steady; pipeline and the Arrow-kernel queries
        # measured neutral inside their noise bands. Pause latency is
        # irrelevant to a batch engine; the flag is standard (no
        # experimental unlock) and G1 stays free to shrink young again
        # under old-gen pressure.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JAVA_OPTS",
                "-Xms" + os.environ.get("SPARK_DRIVER_MEM", "16g")
                + " -XX:+AlwaysPreTouch -XX:MaxGCPauseMillis=1500",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def explain_formatted(df) -> str:
    """Formatted physical-plan text of a DataFrame.

    Single home for the private-API touchpoint (``_sc._jvm`` /
    ``PythonSQLUtils``) used by the plan-shape tests and the plan-audit
    tool, so a pyspark upgrade that moves it is a one-line fix.
    """
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
