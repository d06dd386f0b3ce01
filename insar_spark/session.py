"""SparkSession factory with engine-standard configuration.

One place to pin every config the engine relies on:

* UTC session timezone — required for bit-exact agreement with the DuckDB
  oracle and for deterministic `date_trunc` tier boundaries.
* AQE on — runtime coalescing + skew-join handling (the reference hand-plans
  uniform blocks, /root/reference/insar/timeseries.py:684-706; AQE is the
  Catalyst-native replacement).
* Arrow on — all Python crossings are Arrow-batched (pandas UDFs only).
* shuffle partitions sized to cores, not the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batch size plays the role of the reference's 10 MB block budget
# (/root/reference/insar/timeseries.py:172-174): bound per-batch memory in
# the vectorized UDF stage.
ARROW_MAX_RECORDS = 100_000


def get_spark(
    app_name: str = "insar_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    On a real cluster, pass ``master=None`` and let spark-submit supply it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # local[N] → N; a real cluster should set this to ~2-3× total cores.
        n = cpus or (master.split("[")[-1].rstrip("]") if "[" in master else "")
        shuffle_partitions = int(n) if n.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS)
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
