"""SparkSession builder with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB target (AQE on for runtime re-planning and
skew-join splitting; Arrow for every pandas UDF boundary; UTC so warc_ts
comparisons are stable), sized down via `shuffle_partitions` for local runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "wise_spark",
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
    ship: bool = True,
) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
        "spark.driver.memory": "8g",
    }
    conf.update(extra_conf or {})
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    if ship:
        from .deploy import ship_package

        ship_package(spark)  # wise_spark importable on executors (--py-files analog)
    return spark
