"""Delta Lake round-trip — skip-gated on the delta-spark dependency.

The reference README (reference README.md:17) name-drops DuckDB's format
breadth "parquet, json, delta"; parquet/csv/json/orc round-trips are
oracle-checked queries (operators/io.py). Delta needs the delta-spark
package + its Spark jars, neither of which ships in this container (and
installs are off-limits) — see SURVEY.md §6 "Dependency gap". This test
is the ready-to-activate carry, same pattern as test_tshark_e2e.py: the
moment `import delta` resolves, the round-trip below runs unchanged.
"""

import importlib.util

import pytest

HAS_DELTA = importlib.util.find_spec("delta") is not None

pytestmark = pytest.mark.skipif(
    not HAS_DELTA,
    reason="delta-spark not installed in this container (SURVEY §6)",
)


@pytest.fixture()
def delta_spark(tmp_path):
    """A session with the Delta catalog extensions enabled (delta-spark's
    documented configure_spark_with_delta_pip pattern, minus pip)."""
    from delta import configure_spark_with_delta_pip
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("delta-roundtrip")
        .config("spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension")
        .config("spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog")
        .config("spark.sql.shuffle.partitions", "4")
    )
    spark = configure_spark_with_delta_pip(builder).getOrCreate()
    yield spark


def test_delta_roundtrip_and_time_travel(delta_spark, sf_dir, tmp_path):
    """Write nation as a Delta table, append a second version, read both
    the latest snapshot and version 0 back (the upsert/time-travel
    surface parquet alone cannot express)."""
    spark = delta_spark
    path = str(tmp_path / "nation_delta")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.write.format("delta").save(path)
    nation.limit(1).write.format("delta").mode("append").save(path)

    latest = spark.read.format("delta").load(path)
    v0 = (spark.read.format("delta").option("versionAsOf", 0).load(path))
    assert latest.count() == nation.count() + 1
    assert v0.count() == nation.count()
    assert sorted(latest.columns) == sorted(nation.columns)
