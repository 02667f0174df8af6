"""Distributed synthetic transaction generator.

Capability parity with the reference's ``DataLoader.generate_synthetic_data``
(``src/data/loader.py:75-184``): N transactions with a target fraud rate,
fraud-conditional amount/V-column distributions, user/merchant keys, sorted
timestamps, nullable email/device columns.

Spark-first design: ``spark.range(n)`` is already partition-parallel, and
``rand``/``randn`` take per-partition deterministic seeds — no driver-side
numpy arrays, so this scales to billions of rows (the reference caps at what
fits in one pandas frame).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_transactions(
    spark: SparkSession,
    n: int = 100_000,
    fraud_rate: float = 0.035,
    seed: int = 42,
    n_days: int = 30,
    signal: str = "mild",
) -> DataFrame:
    """``signal`` selects the planted fraud signal strength:

    - ``"mild"`` (default): amount scales 120/180 with no floor, V-column
      shifts 0.5·sin(i) — a deliberately hard set that keeps AUC away
      from 1.0 so ensemble/threshold logic stays exercised.
    - ``"reference"``: the reference generator's own distributions
      (``loader.py:108-180``): legit amounts Exp(50), fraud amounts
      Exp(200)+100 (the +100 floor is most of its separability), V-column
      fraud means Uniform(-1,1) per column — the set on which the
      reference reports its published ROC-AUC ≈ 0.94.
    """
    import random as _random

    df = spark.range(0, n).withColumnRenamed("id", "TransactionID")
    u = lambda s: F.rand(seed + s)
    g = lambda s: F.randn(seed + s)
    _ref = signal == "reference"
    _vshift = _random.Random(seed)  # per-V-column deterministic means

    df = df.withColumn("isFraud", (u(1) < F.lit(fraud_rate)).cast("int"))
    # sorted uniform timestamps over n_days (reference sorts after draw;
    # stretching the id over the window gives the same sorted-uniform shape
    # without a global sort)
    span = n_days * 86400
    df = df.withColumn(
        "TransactionDT",
        (F.col("TransactionID") / F.lit(n) * span + u(2) * (span / n)).cast("double"),
    )
    # exponential amounts, fraud-shifted, clipped to [1, 10000]
    # (loader.py:119-128): inverse-CDF from uniform
    if _ref:
        amt = F.when(
            F.col("isFraud") == 1, -200.0 * F.log(F.lit(1.0) - u(3)) + F.lit(100.0)
        ).otherwise(-50.0 * F.log(F.lit(1.0) - u(3)))
    else:
        amt_scale = F.when(F.col("isFraud") == 1, 180.0).otherwise(120.0)
        amt = -amt_scale * F.log(F.lit(1.0) - u(3))
    df = df.withColumn("TransactionAmt", F.greatest(F.least(amt, F.lit(10000.0)), F.lit(1.0)))

    n_users = max(n // 5, 1)
    n_merchants = max(n // 20, 1)
    df = df.withColumn("card1", (u(4) * n_users).cast("long"))
    df = df.withColumn("card2", (u(5) * n_merchants).cast("long"))

    def choice(s: int, values: list[str], probs: list[float]):
        r, expr, acc = u(s), None, 0.0
        out = F.lit(values[-1])
        for v, p in zip(values[:-1], probs[:-1]):
            acc += p
            cond = r < acc
            expr = F.when(cond, v) if expr is None else expr.when(cond, v)
        return expr.otherwise(out) if expr is not None else out

    df = df.withColumn("ProductCD", choice(6, ["W", "H", "C", "S", "R"], [0.5, 0.2, 0.15, 0.1, 0.05]))
    df = df.withColumn(
        "card4",
        choice(7, ["visa", "mastercard", "american express", "discover"], [0.6, 0.25, 0.1, 0.05]),
    )
    df = df.withColumn("card6", choice(8, ["debit", "credit"], [0.7, 0.3]))
    df = df.withColumn(
        "P_emaildomain",
        F.when(
            u(9) < 0.9,
            choice(10, ["gmail.com", "yahoo.com", "hotmail.com", "outlook.com", "aol.com"],
                   [0.4, 0.25, 0.15, 0.12, 0.08]),
        ).otherwise(F.lit(None).cast("string")),
    )
    df = df.withColumn(
        "R_emaildomain",
        F.when(u(11) < 0.3, F.col("P_emaildomain")).otherwise(F.lit(None).cast("string")),
    )
    df = df.withColumn("DeviceType", choice(12, ["desktop", "mobile"], [0.55, 0.45]))
    df = df.withColumn(
        "DeviceInfo",
        F.when(
            u(13) < 0.85,
            choice(14, ["Windows", "iOS Device", "MacOS", "Android"], [0.45, 0.25, 0.15, 0.15]),
        ).otherwise(F.lit(None).cast("string")),
    )
    # V-columns: standard normal, fraud-mean-shifted (loader.py:164-174)
    for i in range(1, 20):
        mean_i = _vshift.uniform(-1.0, 1.0) if _ref else 0.5 * math.sin(i)
        shift = F.when(F.col("isFraud") == 1, F.lit(mean_i)).otherwise(F.lit(0.0))
        v = F.when(u(100 + i) < 0.1, F.lit(None).cast("double")).otherwise(g(200 + i) + shift)
        df = df.withColumn(f"V{i}", v)
    return df
