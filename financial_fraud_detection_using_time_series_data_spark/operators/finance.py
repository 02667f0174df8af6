"""Financial time-series primitives (beyond-reference): OHLC bars,
log-returns with realized volatility, maximum drawdown.

The reference models fraud over transaction time series
(``src/features/engineer.py``); these operators summarize the same
streams the way a market-data stack would — bar aggregation, return
series, and path-dependent risk stats. All three collapse the corpus to
a |series|·|buckets| rollup in ONE map-side-combined shuffle and run
every window on the rollup frame.

Scale notes (100 TB):
- ``ohlc_bars``: pure single groupBy — open/close are `min_by`/`max_by`
  on the (ts, id) struct, which partial-aggregates map-side like any
  min/max, so the shuffle payload is one candidate row per (series,
  bucket) per map task, never the raw ticks.
- ``realized_volatility``: lag + rolling std windows partitioned by
  series over the bucket rollup — |buckets| rows per series, one
  exchange after the rollup shuffle.
- ``max_drawdown``: running-peak and argmax windows over the same
  rollup; the equity curve is decimal-exact so peaks and troughs are
  reduction-order invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ohlc_bars(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Open/high/low/close bars per series per time bucket, plus count
    and decimal-exact total — the canonical tick→bar compression.

    Open/close are the values at the first/last (ts, id) in the bucket
    (`min_by`/`max_by` on the composite struct — deterministic under ts
    ties, and partially aggregatable so the shuffle carries one candidate
    per group per map task). One shuffle total; output is
    |series|·|buckets| rows.
    """
    order = F.struct(F.col(ts_col), F.col(id_col))
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    return (
        df.groupBy(series_col, b)
        .agg(
            F.min_by(F.col(value_col), order).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), order).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(25,2)"))
            .cast("double")
            .alias("total"),
        )
    )


def realized_volatility(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
    vol_window: int = 24,
) -> DataFrame:
    """Log-return series and trailing realized volatility per series:
    r_t = ln(x_t / x_{t−1}) over the bucketed totals, and σ_t = sample
    std of the last ``vol_window`` returns — the standard activity-burst
    diagnostic (card-testing shows as a volatility regime shift even
    when levels look plausible).

    Buckets with a non-positive current or previous total yield NULL
    return (log undefined) and are skipped by the std (count-based
    guard keeps early buckets NULL until 2 returns exist). Decimal-exact
    rollup; one corpus shuffle + one rollup-frame exchange.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    actuals = df.groupBy(series_col, b).agg(
        F.sum(F.col(value_col).cast("decimal(25,2)")).alias("x_dec")
    )
    word = Window.partitionBy(series_col).orderBy("bucket")
    x = F.col("x_dec").cast("double")
    prev = F.lag("x_dec").over(word).cast("double")
    ret = F.when((x > 0) & (prev > 0), F.log(x / prev))
    staged = actuals.select(series_col, "bucket", x.alias("total"), ret.alias("log_return"))
    wroll = (
        Window.partitionBy(series_col)
        .orderBy("bucket")
        .rowsBetween(-(vol_window - 1), Window.currentRow)
    )
    n_ret = F.count("log_return").over(wroll)
    return staged.select(
        series_col,
        "bucket",
        "total",
        "log_return",
        F.when(n_ret >= 2, F.stddev_samp("log_return").over(wroll)).alias(
            "realized_vol"
        ),
    )


def max_drawdown(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "hour",
) -> DataFrame:
    """Maximum drawdown of the cumulative value curve per series: the
    largest peak-to-trough fraction 1 − equity/peak, with the bucket
    where the trough lands. The path-dependent collapse signal — a
    refund/chargeback wave shows as a drawdown long before level stats
    move.

    The equity curve is the decimal-exact running sum of bucket totals;
    running peak, per-bucket drawdown, and the argmax pick are windows
    over the |series|·|buckets| rollup. Returns one row per series:
    (max_drawdown, trough_bucket, peak_value, final_value), where
    ``peak_value`` is the running peak AS OF the trough bucket (the
    peak the drawdown fell from); ties on drawdown pick the earliest
    bucket, so a flat/monotone curve reports its first bucket at dd 0.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    actuals = df.groupBy(series_col, b).agg(
        F.sum(F.col(value_col).cast("decimal(25,2)")).alias("x_dec")
    )
    wcum = (
        Window.partitionBy(series_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = actuals.select(
        series_col,
        "bucket",
        F.sum("x_dec").over(wcum).alias("__eq"),
    ).select(
        series_col,
        "bucket",
        "__eq",
        F.max("__eq").over(wcum).alias("__peak"),
    )
    dd = F.when(
        F.col("__peak").cast("double") > 0,
        F.lit(1.0) - F.col("__eq").cast("double") / F.col("__peak").cast("double"),
    ).otherwise(F.lit(0.0))
    scored = staged.select(
        series_col,
        "bucket",
        "__eq",
        "__peak",
        dd.alias("__dd"),
    )
    wpick = Window.partitionBy(series_col).orderBy(
        F.col("__dd").desc(), F.col("bucket")
    )
    wlast = Window.partitionBy(series_col).orderBy(F.col("bucket").desc())
    return (
        scored.select(
            series_col,
            "bucket",
            "__dd",
            "__peak",
            F.row_number().over(wpick).alias("__rn"),
            F.first("__eq").over(wlast).alias("__final"),
        )
        .where(F.col("__rn") == 1)
        .select(
            series_col,
            F.col("__dd").alias("max_drawdown"),
            F.col("bucket").alias("trough_bucket"),
            F.col("__peak").cast("double").alias("peak_value"),
            F.col("__final").cast("double").alias("final_value"),
        )
    )


def twap(
    df: DataFrame,
    ts_col: str = "ts",
    series_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Time-weighted average value per series per bucket: each
    observation HOLDS until the series' next observation (step
    function), and the bucket's TWAP integrates the step function over
    the bucket — the correct "average price/level" when sampling is
    irregular (a plain avg() over-weights bursts, which is exactly when
    fraud happens). The last observation of a series holds until the
    dataset's max timestamp.

    Plan shape: one exchange on the series for the lead() window, then
    each holding interval EXPLODES into the buckets it overlaps
    (`sequence()` on the truncated endpoints — map-side, no shuffle) and
    a groupBy(series, bucket) folds overlap-weighted decimal products.
    Row amplification = interval span / bucket width, the same
    densification cost as any gap-filling resample: bounded by the
    calendar span of the data, not by |events|². Weighted sums are
    decimal-exact (value decimal × whole-second overlap), divided once
    at the end. Buckets before a series' first event don't exist for it
    (no carry-in of an unknown level).
    """
    end = df.agg(F.max(ts_col).alias("__end"))
    held = (
        df.join(F.broadcast(end))
        .select(
            series_col,
            F.col(value_col).cast("decimal(25,6)").alias("__x"),
            F.col(ts_col).cast("long").alias("__t0"),
            F.coalesce(
                F.lead(F.col(ts_col).cast("long")).over(
                    Window.partitionBy(series_col).orderBy(ts_col, id_col)
                ),
                F.col("__end").cast("long"),
            ).alias("__t1"),
        )
        .where(F.col("__t1") > F.col("__t0"))
    )
    step = {"hour": 3600, "day": 86400, "minute": 60}[bucket]
    # integer floor to the bucket grid (no float division of epochs)
    b0 = F.col("__t0") - F.col("__t0") % step
    b1 = F.col("__t1") - F.col("__t1") % step
    exploded = held.select(
        series_col,
        "__x",
        "__t0",
        "__t1",
        F.explode(F.sequence(b0, b1, F.lit(step))).alias("__b"),
    )
    overlap = F.greatest(
        F.least(F.col("__t1"), F.col("__b") + step) - F.greatest(F.col("__t0"), F.col("__b")),
        F.lit(0),
    )
    agg = (
        exploded.groupBy(series_col, "__b")
        .agg(
            F.sum((F.col("__x") * overlap).cast("decimal(38,6)")).alias("__wx"),
            F.sum(overlap).alias("__w"),
        )
        .where(F.col("__w") > 0)
    )
    return agg.select(
        series_col,
        F.timestamp_seconds(F.col("__b")).alias("bucket"),
        (F.col("__wx").cast("double") / F.col("__w").cast("double")).alias("twap"),
        F.col("__w").cast("long").alias("covered_s"),
    )


def reconcile_totals(
    detail: DataFrame,
    header: DataFrame,
    detail_key: str,
    header_key: str,
    detail_amount,
    header_amount: str,
    rel_tolerance: float = 0.0,
) -> DataFrame:
    """Detail-vs-header reconciliation: fold the detail table's amounts
    per key (decimal-exact, reduction-order invariant), join the header
    total, and emit every key whose relative discrepancy exceeds
    ``rel_tolerance`` — plus keys missing from either side, which a
    naive inner-join reconciliation silently swallows. The close-of-day
    control every ledger pipeline runs: "do the line items still add up
    to the invoices?"

    ``detail_amount`` may be a Column expression (e.g. price net of
    discount); it is cast to decimal(38,4) before the fold — four
    decimal places so a 2dp-price × 2dp-rate product folds EXACTLY
    (rounding each line to cents first would tie-break differently
    across engines: Spark rounds half-up, DuckDB half-even). One
    map-side-combined groupBy on the detail key and one full-outer join
    on the same key — at 100 TB the join co-partitions with the groupBy
    output, and the header side shuffles once on its own key.
    """
    d = (
        detail.groupBy(F.col(detail_key).alias("key"))
        .agg(
            F.sum(detail_amount.cast("decimal(38,4)")).alias("detail_total"),
            F.count(F.lit(1)).alias("n_detail_rows"),
        )
    )
    h = header.select(
        F.col(header_key).alias("key"),
        F.col(header_amount).cast("decimal(25,2)").alias("header_total"),
    )
    j = d.join(h, "key", "full_outer")
    delta = F.col("header_total").cast("double") - F.col(
        "detail_total"
    ).cast("double")
    rel = delta / F.abs(F.col("header_total").cast("double"))
    status = (
        F.when(F.col("detail_total").isNull(), F.lit("missing_detail"))
        .when(F.col("header_total").isNull(), F.lit("missing_header"))
        .when(F.abs(rel) > float(rel_tolerance), F.lit("mismatch"))
    )
    return j.where(status.isNotNull()).select(
        "key",
        F.col("n_detail_rows").cast("long").alias("n_detail_rows"),
        F.col("detail_total").cast("double").alias("detail_total"),
        F.col("header_total").cast("double").alias("header_total"),
        delta.alias("delta"),
        rel.alias("rel_delta"),
        status.alias("status"),
    )


def lead_lag_corr(
    df: DataFrame,
    type_a: str,
    type_b: str,
    max_lag: int = 6,
    type_col: str = "event_type",
    ts_col: str = "ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Lead-lag cross-correlation between two event streams: Pearson
    corr(countₐ(t), count_b(t+ℓ)) for every lag ℓ in −max_lag..max_lag
    hourly buckets — "do clicks LEAD purchases, and by how much?" The
    argmax lag is the causal-direction screen that plain same-bucket
    correlation (`rolling_corr`) cannot see.

    Fully order-invariant: the per-bucket series are integer COUNTS, so
    every sufficient statistic (n, Σx, Σy, Σxy, Σx², Σy²) folds as
    exact BIGINTs — the correlation assembles from integers in one
    closed form, no float accumulates anywhere. One corpus rollup to
    the |buckets|-row series, a (2·max_lag+1)-way explode of that TINY
    frame, one equi-join on the shifted bucket id (no range join), one
    groupBy(lag). NULL corr for degenerate (zero-variance) overlaps.

    Returns (lag, n_buckets, corr) — positive lag means ``type_a``
    activity precedes ``type_b``.
    """
    bucket = (F.col(ts_col).cast("long") / F.lit(bucket_s)).cast("long")
    ser = (
        df.where(F.col(type_col).isin(type_a, type_b))
        .groupBy(bucket.alias("__h"))
        .agg(
            F.sum((F.col(type_col) == type_a).cast("long")).alias("__x"),
            F.sum((F.col(type_col) == type_b).cast("long")).alias("__y"),
        )
    )
    lags = ser.select(
        "__h", "__x",
        F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag))).alias("lag"),
    ).withColumn("__hb", F.col("__h") + F.col("lag"))
    joined = lags.join(
        ser.select(F.col("__h").alias("__hb"), F.col("__y").alias("__yb")), "__hb"
    )
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum("__yb").alias("__sy"),
        F.sum(F.col("__x") * F.col("__yb")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__yb") * F.col("__yb")).alias("__syy"),
    )
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sy = F.col("__sy").cast("double")
    cov = n * F.col("__sxy").cast("double") - sx * sy
    vx = n * F.col("__sxx").cast("double") - sx * sx
    vy = n * F.col("__syy").cast("double") - sy * sy
    return agg.select(
        "lag",
        F.col("__n").cast("long").alias("n_buckets"),
        F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)).alias("corr"),
    ).orderBy("lag")


def var_es(
    df: DataFrame,
    entity_col: str = "user_id",
    value_col: str = "value",
    alpha: float = 0.05,
    min_obs: int = 20,
) -> DataFrame:
    """Historical Value-at-Risk and Expected Shortfall per entity at
    tail level ``alpha``: VaR = the ⌈α·n⌉-th smallest observation (an
    ORDER STATISTIC, deliberately not an interpolated quantile — order
    statistics are engine-exact where interpolation forms differ in the
    last bit), ES = the exact-decimal mean of the ⌈α·n⌉ smallest — the
    coherent tail-risk measure that VaR alone understates.

    ONE per-entity window (rank ascending by value, ties by nothing —
    equal values are interchangeable in both statistics) + the same-key
    groupBy riding its exchange. Entities with fewer than ``min_obs``
    observations drop (a 5% tail of 3 points is noise).

    Returns (entity, n_obs, var_value, es_value) — both in the value's
    units; for RETURNS feed the return column and read the tail as
    losses.
    """
    w = Window.partitionBy(entity_col).orderBy(F.col("__v").asc())
    w_all = Window.partitionBy(entity_col)
    ranked = (
        df.where(F.col(value_col).isNotNull())
        .select(entity_col, F.col(value_col).cast("decimal(25,6)").alias("__v"))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(w_all))
    )
    tail = F.col("__rn") <= F.ceil(F.lit(alpha) * F.col("__n"))
    agg = ranked.groupBy(entity_col).agg(
        F.max("__n").alias("__n"),
        F.sum(F.when(tail, F.col("__v"))).alias("__tail_sum"),
        F.max(F.when(tail, F.col("__v"))).alias("__var"),
    )
    k = F.ceil(F.lit(alpha) * F.col("__n"))
    return (
        agg.where(F.col("__n") >= min_obs)
        .select(
            entity_col,
            F.col("__n").cast("long").alias("n_obs"),
            F.col("__var").cast("double").alias("var_value"),
            (F.col("__tail_sum").cast("double") / k.cast("double")).alias("es_value"),
        )
    )


def amihud_illiquidity(
    df: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    min_days: int = 2,
) -> DataFrame:
    """Amihud (2002) illiquidity proxy per series: mean over days of
    |daily return| / daily dollar volume, scaled ×10⁶ as the literature
    does. High values = a little flow moves the price a lot — thin,
    manipulable series; in the fraud frame it flags accounts whose
    value level is hypersensitive to activity.

    One groupBy builds the daily (open, close, volume) bars —
    open/close via min_by/max_by on the (ts, id) struct (map-side
    partial-aggregatable, deterministic under ts ties), volume as an
    exact decimal sum. The per-day ratio is a double expression over
    those exact inputs; the across-days mean folds integer micro-units
    (DECIMAL(38,0)) so it is reduction-order invariant. Days with zero
    open or zero volume are excluded (the ratio is undefined there).
    Two shuffles total — (entity, day) then entity — both map-side
    combined.
    """
    order = F.struct(F.col(ts_col), F.col(id_col))
    daily = df.groupBy(
        entity_col, F.date_trunc("day", F.col(ts_col)).alias("__d")
    ).agg(
        F.min_by(F.col(value_col), order).alias("__open"),
        F.max_by(F.col(value_col), order).alias("__close"),
        F.sum(F.col(value_col).cast("decimal(25,2)")).alias("__vol"),
    )
    ret = (F.col("__close") - F.col("__open")) / F.col("__open")
    illiq_e6 = F.abs(ret) / F.col("__vol").cast("double") * F.lit(1e6)
    good = daily.where((F.col("__open") != 0) & (F.col("__vol") > 0))
    return (
        good.groupBy(entity_col)
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(
                F.floor(illiq_e6 * F.lit(1e6) + F.lit(0.5)).cast("decimal(38,0)")
            ).alias("__s"),
        )
        .where(F.col("n_days") >= min_days)
        .select(
            entity_col,
            F.col("n_days").cast("long").alias("n_days"),
            (F.col("__s").cast("double") / F.lit(1e6) / F.col("n_days")).alias(
                "illiq_e6"
            ),
        )
    )
