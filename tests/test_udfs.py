"""U1 scalar-UDF surface: works, and the expression twin matches."""

from pyspark.sql import functions as F

from fcs_etl_reactor_spark.functions.udfs import decade_label, decade_label_expr
from fcs_etl_reactor_spark.io import load
from tests.conftest import SF_SMALL


def test_scalar_udf_matches_expression_twin(spark):
    e = load(spark, SF_SMALL, "events")
    both = e.select(
        decade_label(F.col("value")).alias("via_udf"),
        decade_label_expr("value").alias("via_expr"),
    )
    assert both.filter(F.col("via_udf") != F.col("via_expr")).count() == 0


def test_scalar_udf_registered_for_sql(spark):
    spark.udf.register("decade_label", decade_label)
    load(spark, SF_SMALL, "events").createOrReplaceTempView("udf_events")
    out = spark.sql(
        "SELECT decade_label(value) AS d FROM udf_events WHERE value > 0 LIMIT 5"
    ).collect()
    assert all(r["d"].startswith("1e") for r in out)
