"""Leakage-safe forecasting (SURVEY.md SS2.10 M1-M6, M8-M9).

Re-expresses `forecasting_model.py:158-606`: time-aware split (never
k-fold - the reference imports CrossValidator but deliberately avoids
it, `forecasting_model.py:12`), per-entity window features computed
AFTER the split, manual grid search validated on an inner time split,
best model refit on the full train range, metrics on the held-out tail.

Trailing frames exclude the current row (`forecasting_model.py:88-90`)
so no feature leaks the label.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import StandardScaler, VectorAssembler
from pyspark.ml.regression import LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.operators import windows as W

SEED = 42  # forecasting_model.py:366 pins 42 everywhere


def daily_series(events: DataFrame, entity: str = "user_id", ts: str = "ts", value: str = "value") -> DataFrame:
    """Daily measure per entity - the forecasting base table."""
    return events.groupBy(entity, F.to_date(ts).alias("date")).agg(
        F.sum(value).alias("label_value")
    )


def add_forecast_features(daily: DataFrame, entity: str = "user_id") -> DataFrame:
    """Lag grid + trailing rolling stats + calendar features, then drop
    warm-up rows (`forecasting_model.py:77-98`, `feature_engineering.py:196`)."""
    w = W.entity_window(entity, "date")
    df = W.with_lags(daily, "label_value", w, [1, 2, 3, 7], prefix="lag_")
    df = W.with_trailing_stats(df, "label_value", w, 7, stats=("avg", "stddev"))
    df = (
        df.withColumn("day_of_week", F.dayofweek("date"))
        .withColumn("is_weekend", F.dayofweek("date").isin(1, 7).cast("int"))
        .withColumn("day_of_month", F.dayofmonth("date"))
    )
    return df.na.drop()


FEATURE_COLS = [
    "lag_1",
    "lag_2",
    "lag_3",
    "lag_7",
    "rolling_avg_7r",
    "rolling_stddev_7r",
    "day_of_week",
    "is_weekend",
    "day_of_month",
]


@dataclass
class ForecastResult:
    predictions: DataFrame
    metrics: dict[str, float]
    best_params: dict[str, float]
    model: PipelineModel = field(repr=False, default=None)


def _pipeline(estimator) -> Pipeline:
    """assembler -> scaler -> model (M1/M2/M8; `forecasting_model.py:231-232`)."""
    assembler = VectorAssembler(
        inputCols=FEATURE_COLS, outputCol="features_raw", handleInvalid="skip"
    )
    scaler = StandardScaler(inputCol="features_raw", outputCol="features")
    return Pipeline(stages=[assembler, scaler, estimator])


def train_linear_forecast(
    features: DataFrame,
    test_cutoff,
    val_cutoff,
    reg_params: tuple[float, ...] = (0.01, 0.1),
    elastic_net_params: tuple[float, ...] = (0.0, 0.5),
) -> ForecastResult:
    """Grid-searched LinearRegression with inner time-split validation
    (`forecasting_model.py:272-320`)."""
    train = features.filter(F.col("date") < F.lit(test_cutoff))
    test = features.filter(F.col("date") >= F.lit(test_cutoff))
    inner_train = train.filter(F.col("date") < F.lit(val_cutoff))
    inner_val = train.filter(F.col("date") >= F.lit(val_cutoff))
    train.cache()
    inner_train.cache()
    inner_val.cache()

    # Grid points fit CONCURRENTLY: Spark's scheduler interleaves jobs
    # submitted from multiple driver threads over the same cached
    # inputs. The reference ran its 9+4 grid strictly sequentially
    # (`forecasting_model.py:286-306` - SURVEY.md SS3 "no parallel
    # tuning"); on a cluster this is the difference between grid time
    # = slowest point vs = sum of points. Selection stays deterministic:
    # results keep grid order and min() takes the first minimum.
    from concurrent.futures import ThreadPoolExecutor

    grid = [(reg, en) for reg in reg_params for en in elastic_net_params]

    def fit_point(point):
        reg, en = point
        lr = LinearRegression(
            featuresCol="features", labelCol="label_value",
            maxIter=100, regParam=reg, elasticNetParam=en,
        )
        model = _pipeline(lr).fit(inner_train)
        rmse = RegressionEvaluator(
            labelCol="label_value", predictionCol="prediction", metricName="rmse"
        ).evaluate(model.transform(inner_val))
        return rmse, {"regParam": reg, "elasticNetParam": en}

    with ThreadPoolExecutor(max_workers=min(4, len(grid))) as ex:
        results = list(ex.map(fit_point, grid))
    params = min(results, key=lambda r: r[0])[1]
    final = _pipeline(
        LinearRegression(
            featuresCol="features", labelCol="label_value", maxIter=100,
            regParam=params["regParam"], elasticNetParam=params["elasticNetParam"],
        )
    ).fit(train)
    preds = final.transform(test)
    metrics = {
        name: RegressionEvaluator(
            labelCol="label_value", predictionCol="prediction", metricName=name
        ).evaluate(preds)
        for name in ("mae", "rmse", "r2")
    }
    train.unpersist()
    inner_train.unpersist()
    inner_val.unpersist()
    return ForecastResult(predictions=preds, metrics=metrics, best_params=params, model=final)


def train_gbt_forecast(
    features: DataFrame,
    test_cutoff,
    max_iter: int = 20,
    max_depth: int = 5,
    sample_fraction: float | None = None,
) -> ForecastResult:
    """GBTRegressor path (M5; present-but-disabled in the reference for
    memory, `forecasting_model.py:428-476` - its 20% sample workaround
    is exposed here as an explicit option)."""
    from pyspark.ml.regression import GBTRegressor

    train = features.filter(F.col("date") < F.lit(test_cutoff))
    if sample_fraction is not None:
        train = train.sample(fraction=sample_fraction, seed=SEED)
    test = features.filter(F.col("date") >= F.lit(test_cutoff))
    gbt = GBTRegressor(
        featuresCol="features", labelCol="label_value",
        maxIter=max_iter, maxDepth=max_depth, seed=SEED,
    )
    model = _pipeline(gbt).fit(train)
    preds = model.transform(test)
    metrics = {
        name: RegressionEvaluator(
            labelCol="label_value", predictionCol="prediction", metricName=name
        ).evaluate(preds)
        for name in ("mae", "rmse", "r2")
    }
    return ForecastResult(
        predictions=preds,
        metrics=metrics,
        best_params={"maxIter": max_iter, "maxDepth": max_depth},
        model=model,
    )


def train_rf_forecast(
    features: DataFrame,
    test_cutoff,
    num_trees: int = 20,
    max_depth: int = 5,
    grid: tuple[tuple[int, int], ...] | None = None,
    val_cutoff=None,
) -> ForecastResult:
    """RandomForestRegressor path (M4; `forecasting_model.py:350-393`).

    ``grid``: optional ((numTrees, maxDepth), ...) searched with the
    same inner time-split validation as the LR path (the reference's RF
    grid is {50,100}x{5,10}, `forecasting_model.py:350-355`); requires
    ``val_cutoff``. Grid points fit concurrently over the shared cached
    inner split; selection keeps grid order (first minimum wins), so it
    is deterministic. ``grid=None`` keeps the single-point fit."""
    train = features.filter(F.col("date") < F.lit(test_cutoff))
    test = features.filter(F.col("date") >= F.lit(test_cutoff))
    if grid:
        if val_cutoff is None:
            raise ValueError("grid search needs val_cutoff for the inner split")
        from concurrent.futures import ThreadPoolExecutor

        inner_train = train.filter(F.col("date") < F.lit(val_cutoff))
        inner_val = train.filter(F.col("date") >= F.lit(val_cutoff))
        inner_train.cache()
        inner_val.cache()

        def fit_point(point):
            n_t, depth = point
            cand = RandomForestRegressor(
                featuresCol="features", labelCol="label_value",
                numTrees=n_t, maxDepth=depth, seed=SEED,
            )
            m = _pipeline(cand).fit(inner_train)
            rmse = RegressionEvaluator(
                labelCol="label_value", predictionCol="prediction", metricName="rmse"
            ).evaluate(m.transform(inner_val))
            # NaN rmse (empty/degenerate inner_val) compares false against
            # everything, which would make min() return a position-dependent
            # grid point; treat it as worst-possible so first-minimum-wins
            # selection stays deterministic.
            return (rmse if rmse == rmse else float("inf")), point

        with ThreadPoolExecutor(max_workers=min(4, len(grid))) as ex:
            results = list(ex.map(fit_point, grid))
        num_trees, max_depth = min(results, key=lambda r: r[0])[1]
        inner_train.unpersist()
        inner_val.unpersist()
    rf = RandomForestRegressor(
        featuresCol="features", labelCol="label_value",
        numTrees=num_trees, maxDepth=max_depth, seed=SEED,
    )
    model = _pipeline(rf).fit(train)
    preds = model.transform(test)
    metrics = {
        name: RegressionEvaluator(
            labelCol="label_value", predictionCol="prediction", metricName=name
        ).evaluate(preds)
        for name in ("mae", "rmse", "r2")
    }
    return ForecastResult(
        predictions=preds,
        metrics=metrics,
        best_params={"numTrees": num_trees, "maxDepth": max_depth},
        model=model,
    )
