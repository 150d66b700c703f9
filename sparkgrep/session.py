"""SparkSession factory with engine-tuned defaults.

Local mode here, but every conf is chosen for cluster scale:

- AQE on (runtime coalescing + skew-join splitting),
- Arrow on (all engine UDFs are vectorized pandas UDFs),
- shuffle partitions sized to the local core count (on a real cluster
  this is set to ~2-3x total cores by the submitter),
- parquet pushdown left at defaults (on — the postings table relies on
  partition pruning + min/max row-group stats).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkgrep",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # under spark-submit (PythonRunner sets PYSPARK_GATEWAY_PORT) the
    # master comes from the CLI (--master yarn/k8s://…/local[N]) through
    # the already-running JVM's conf: setting .master() here would
    # silently override a cluster submission with local mode, so leave
    # it unset unless the caller chose one. Plain `python` runs (no
    # gateway yet) default to local[cpus].
    submitted = master is None and "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not submitted:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        if master is not None and master.startswith("local"):
            # local[N] → N; local[*] / bare 'local' → machine cores
            inner = master.split("[")[-1].rstrip("]")
            shuffle_partitions = (
                cpus if inner in ("*", "local") else int(inner)
            )
        else:
            # cluster submission: ~3 waves per core is the standard
            # sizing; override via SPARKGREP_SHUFFLE_PARTITIONS
            shuffle_partitions = int(
                os.environ.get("SPARKGREP_SHUFFLE_PARTITIONS", str(3 * cpus))
            )

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    # Shuffle/spill scratch: point at fast storage (tmpfs) when provided —
    # on this sandbox the default /tmp is slow virtio ext4 and disk
    # writeback dominates big builds.
    local_dir = os.environ.get("SPARKGREP_LOCAL_DIR")
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        builder = builder.config("spark.local.dir", local_dir)
    aqe = "false" if os.environ.get("SPARKGREP_AQE") == "off" else "true"
    return (
        builder
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch rows bound every pandas-UDF kernel's per-batch
        # working set (decode/encode are the memory-bandwidth-heaviest
        # phases); env-tunable so the bench can measure working-set
        # sensitivity at wide parallelism without a code change
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARKGREP_ARROW_BATCH", "8192"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARKGREP_DRIVER_MEM", "8g"))
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
