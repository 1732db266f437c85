"""ML queries (rows-only: cross-engine ML has no SQL oracle;
seed-pinned tolerance assertions live in tests/test_ml.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from smart_energy_consumption_analytics_using_big_data_spark.ml import anomaly as AN
from smart_energy_consumption_analytics_using_big_data_spark.ml import forecast as FC
from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import q, t

TEST_CUTOFF = "2024-01-25"
VAL_CUTOFF = "2024-01-18"


def _daily_features(spark, sf_dir):
    daily = FC.daily_series(t(spark, sf_dir, "events"))
    return FC.add_forecast_features(daily)


@q("q_ml_forecast_linear")  # rows-only (M3/M6/M8/M9)
def q_ml_forecast_linear(spark, sf_dir):
    """Grid-searched LinearRegression forecast of daily per-user value
    (`forecasting_model.py:272-320` semantics: time split, inner
    validation split, refit, holdout predictions)."""
    feats = _daily_features(spark, sf_dir)
    result = FC.train_linear_forecast(feats, TEST_CUTOFF, VAL_CUTOFF)
    return result.predictions.select(
        "user_id",
        "date",
        F.round("label_value", 6).alias("label_value"),
        F.round("prediction", 6).alias("prediction"),
    )


@q("q_ml_forecast_rf")  # rows-only (M4)
def q_ml_forecast_rf(spark, sf_dir):
    """RandomForest forecast variant, seed pinned to 42."""
    feats = _daily_features(spark, sf_dir)
    result = FC.train_rf_forecast(feats, TEST_CUTOFF, num_trees=20, max_depth=5)
    return result.predictions.select(
        "user_id",
        "date",
        F.round("label_value", 6).alias("label_value"),
        F.round("prediction", 6).alias("prediction"),
    )


@q("q_ml_anomaly_kmeans")  # rows-only (M7 + D1-replacement + W6)
def q_ml_anomaly_kmeans(spark, sf_dir):
    """K-Means(k=5, seed=42) + native centroid distance + per-cluster
    z-score anomaly flags (`anomaly_detection.py:108-143`, Python UDF
    replaced by Catalyst expressions)."""
    feats = _daily_features(spark, sf_dir)
    scored = AN.detect_anomalies(
        feats,
        feature_cols=["label_value", "lag_1", "rolling_avg_7r", "day_of_week"],
    )
    return scored.select(
        "user_id",
        "date",
        "cluster",
        F.round("distance_to_center", 6).alias("distance_to_center"),
        "z_score",
        "is_anomaly",
    )


@q("q_ml_rf_importance")  # rows-only (M4 importances report)
def q_ml_rf_importance(spark, sf_dir):
    """RandomForest feature importances as rows (feature, importance) -
    the model-explanation report the reference prints at
    `forecasting_model.py:411-418`, exposed as a queryable DataFrame.
    Seed pinned; importances sum to 1 (asserted in test_ml.py)."""
    feats = _daily_features(spark, sf_dir)
    result = FC.train_rf_forecast(feats, TEST_CUTOFF, num_trees=20, max_depth=5)
    rf_model = result.model.stages[-1]
    rows = [
        (name, round(float(w), 6))
        for name, w in zip(FC.FEATURE_COLS, rf_model.featureImportances.toArray())
    ]
    return spark.createDataFrame(rows, "feature string, importance double")


@q("q_ml_als")  # rows-only (factorization; no SQL oracle by nature)
def q_ml_als(spark, sf_dir):
    """ALS collaborative filtering (implicit feedback): customer x part
    purchase counts from the order join factorize into rank-8 latent
    vectors (seed 42), and each customer gets their top-3 part
    recommendations — the model-based recommender beside the
    item-item-cosine memory-based one (q_rec_item_sim). Exploded to
    scalar rows for the driver comparator. Scale note: training is
    Spark's blocked ALS (shuffle-bounded); exhaustive
    recommendForAllUsers scoring is the sf-sized baseline — at corpus
    scale serving goes through the ANN path (q_sim_ann_ivf) over the
    learned item factors."""
    from pyspark.ml.recommendation import ALS

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ratings = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            o["o_custkey"].cast("int").alias("user"),
            li["l_partkey"].cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
    )
    als = ALS(
        rank=8,
        maxIter=5,
        seed=42,
        implicitPrefs=True,
        alpha=1.0,
        regParam=0.1,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
    )
    model = als.fit(ratings)
    recs = model.recommendForAllUsers(3)
    return recs.select(
        F.col("user").cast("bigint").alias("user_id"),
        F.posexplode("recommendations").alias("rec_rank", "rec"),
    ).select(
        "user_id",
        (F.col("rec_rank") + 1).alias("rec_rank"),
        F.col("rec.item").cast("bigint").alias("part_id"),
        F.round(F.col("rec.rating").cast("double"), 6).alias("score"),
    )


def _ols_exact_sql() -> str:
    """Oracle for q_ml_ols_exact, GENERATED from the same formula
    machinery the Spark side executes (ml/ols_exact.py): identical
    statistic expressions, identical canonical Cramer expansion, so
    the two engines evaluate one expression tree on one set of
    decimal-exact inputs."""
    from smart_energy_consumption_analytics_using_big_data_spark.ml.ols_exact import (
        cramer4_sql,
        ols_stats_exprs,
    )

    xs = ["1", "lag_1", "dow", "dom"]
    stats = ",\n         ".join(
        f"{sql} AS {name}" for name, sql in ols_stats_exprs(xs).items()
    )
    betas = cramer4_sql()
    beta_cols = ",\n       ".join(
        f"round({b}, 6) AS beta{k}" for k, b in enumerate(betas)
    )
    pred = (
        f"round(({betas[0]}) + ({betas[1]}) * 100.0 + ({betas[2]}) * 3 "
        f"+ ({betas[3]}) * 15, 6)"
    )
    return f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS date,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS label
      FROM events GROUP BY 1, 2
    ),
    feat AS (
      SELECT label AS y,
             lag(label) OVER (PARTITION BY user_id ORDER BY date) AS lag_1,
             CAST(((date - DATE '1970-01-01') + 4) % 7 AS INT) AS dow,
             CAST(EXTRACT(day FROM date) AS INT) AS dom
      FROM daily
    ),
    f AS (SELECT * FROM feat WHERE lag_1 IS NOT NULL),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
         {stats}
      FROM f
    )
    SELECT n,
       {beta_cols},
       {pred} AS pred_ref
    FROM s
    """


@q("q_ml_ols_exact", _ols_exact_sql())
def q_ml_ols_exact(spark, sf_dir):
    """The forecast family's first VALUE-level correctness row
    (VERDICT r14 task 3): ordinary least squares — the forecaster's
    regParam=0 regime — fit by closed-form normal equations instead
    of LBFGS, on the forecaster's own base table (per-user daily
    series) with a minimal feature set that stays SQL-expressible:
    intercept, lag_1 (previous observed day's total), day-of-week
    (epoch-day arithmetic, engine-neutral unlike dayofweek()'s
    1/0-based split), day-of-month. The daily label uses the decimal
    sum_exact path so the BASE table is already order-independent;
    every Gram/moment entry decimal-accumulates its per-row product;
    the 4x4 solve is one generated Cramer expansion both engines
    evaluate left-associatively on identical doubles (ml/ols_exact.py
    docstring has the bit-identity argument). Output: n, the four
    coefficients, and the fitted value at a fixed reference point.
    One aggregation pass, 14 numbers shuffled per partition, O(1)
    driver solve — the cheapest distributed regression at 100 TB."""
    from smart_energy_consumption_analytics_using_big_data_spark.ml.ols_exact import ols_fit_exact
    from smart_energy_consumption_analytics_using_big_data_spark.operators.aggregates import (
        sum_exact,
    )

    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date("ts").alias("date")
    ).agg(sum_exact("value").alias("label"))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("date")
    feat = (
        daily.select(
            F.col("label").alias("y"),
            F.lag("label").over(w).alias("lag_1"),
            ((F.datediff("date", F.lit("1970-01-01")) + F.lit(4)) % 7)
            .cast("int")
            .alias("dow"),
            F.dayofmonth("date").cast("int").alias("dom"),
        )
        .filter(F.col("lag_1").isNotNull())
    )
    return ols_fit_exact(feat, ["1", "lag_1", "dow", "dom"], "y")
