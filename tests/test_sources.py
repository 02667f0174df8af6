"""S1/S2/S3/S4 source/sink coverage: CSV round-trip, optional scan,
synthetic generator shape/determinism."""

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from financial_fraud_detection_using_time_series_data_spark.sources import (
    generate_transactions,
    load_table,
)
from financial_fraud_detection_using_time_series_data_spark.sources.tables import (
    read_csv,
    read_csv_optional,
    write_csv,
)


def test_csv_round_trip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").limit(200)
    path = str(tmp_path / "orders_csv")
    write_csv(orders, path)
    back = read_csv(spark, path)
    assert back.count() == 200
    assert set(back.columns) == set(orders.columns)
    # numeric column survives the round trip with values intact
    a = orders.agg(F.sum("o_totalprice")).collect()[0][0]
    b = back.agg(F.sum(F.col("o_totalprice").cast("double"))).collect()[0][0]
    assert abs(a - b) < 1e-4


def test_optional_scan_missing_file(spark, tmp_path):
    schema = StructType().add("TransactionID", "long").add("DeviceType", "string")
    df = read_csv_optional(spark, str(tmp_path / "missing.csv"), schema)
    assert df.count() == 0
    assert df.schema == schema


def test_synthetic_generator_deterministic(spark):
    a = generate_transactions(spark, n=2000, fraud_rate=0.05, seed=11)
    b = generate_transactions(spark, n=2000, fraud_rate=0.05, seed=11)
    assert a.count() == 2000
    ha = a.selectExpr("sum(hash(*)) h").collect()[0].h
    hb = b.selectExpr("sum(hash(*)) h").collect()[0].h
    assert ha == hb, "same seed must give identical data"
    rate = a.agg(F.avg("isFraud")).collect()[0][0]
    assert 0.02 < rate < 0.10
