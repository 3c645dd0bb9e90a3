import os

import pytest

os.environ.setdefault("TZ", "UTC")

from scrapy_processors_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="sps-tests", shuffle_partitions=4)
    yield s


def run_scalar(spark, col_expr_fn, inputs):
    """Apply a (Column -> Column) function to a one-column DF of strings;
    return outputs in row order."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, v) for i, v in enumerate(inputs)], "id long, v string")
    out = df.select("id", col_expr_fn(F.col("v")).alias("r")).orderBy("id").collect()
    return [r["r"] for r in out]
