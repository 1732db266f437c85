"""Distributed covariance + PCA (ext/embeddings.py).

The covariance query is oracle-checked against DuckDB covar_samp; here
we pin (a) parity of the whole distributed pipeline with single-node
numpy PCA, (b) the spectral properties a correct projection must have,
and (c) that the projection plan stays JVM-side (no Python stages).
"""

from __future__ import annotations

import numpy as np

from smart_energy_consumption_analytics_using_big_data_spark.ext.embeddings import (
    covariance_matrix,
    pca_components,
    pca_project,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _numpy_matrix(spark):
    rows = _emb(spark).select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r.vec_id)
    x = np.asarray([r.embedding for r in rows], dtype=np.float64)
    return [r.vec_id for r in rows], x


def test_covariance_matches_numpy(spark):
    ids, x = _numpy_matrix(spark)
    expect = np.cov(x, rowvar=False, ddof=1)
    got = {(r.i, r.j): r.cov for r in covariance_matrix(_emb(spark)).collect()}
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), c in got.items():
        assert abs(c - expect[i, j]) < 1e-5, ((i, j), c, expect[i, j])


def test_pca_components_match_numpy_and_are_sign_fixed(spark):
    ids, x = _numpy_matrix(spark)
    comps, evs = pca_components(_emb(spark), k=2)
    vals, vecs = np.linalg.eigh(np.cov(x, rowvar=False, ddof=1))
    order = np.argsort(vals)[::-1][:2]
    assert evs[0] >= evs[1] > 0
    for c_idx, idx in enumerate(order):
        assert abs(evs[c_idx] - vals[idx]) < 1e-4
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        got = np.asarray(comps[c_idx])
        assert got[np.argmax(np.abs(got))] > 0, "sign convention"
        assert np.allclose(got, v, atol=1e-4), c_idx


def test_frozen_pca_artifact_is_the_trained_model(spark):
    """The q_emb_pca_score literals (`ext/pca_artifact.py`) must BE the
    model `pca_components` trains on the sf0.01 snapshot — the freeze
    that makes the scoring path oracled is only honest if the artifact
    provably matches the live trainer. Tolerance 1e-6, not exact: the
    snapshot's eigengap is ~1.3% (lambda1=0.027568, lambda2=0.027221),
    so partition-order float summation in the covariance pass perturbs
    the eigenvectors by O(ulp/eigengap) ~ 1e-12 — far below both the
    pin and the query's 6-decimal rounding."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.pca_artifact import (
        FROZEN_PCA_COMPONENTS_K2,
        FROZEN_PCA_EIGENVALUES_K2,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    comps, evs = pca_components(emb, k=2)
    assert np.allclose(evs, FROZEN_PCA_EIGENVALUES_K2, atol=1e-9)
    for got, frozen in zip(comps, FROZEN_PCA_COMPONENTS_K2):
        assert np.allclose(got, frozen, atol=1e-6)


def test_projection_spectral_properties_and_jvm_plan(spark):
    emb = _emb(spark)
    comps, evs = pca_components(emb, k=2)
    proj = pca_project(emb, comps)
    plan = proj._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    for node in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert node not in plan, f"projection must be JVM-only, found {node}"

    pdf = proj.toPandas()
    assert len(pdf) == emb.count()
    # projected variance along pc_k equals the k-th eigenvalue; the two
    # projections are uncorrelated (components orthogonal).
    assert abs(pdf["pc1"].var(ddof=1) - evs[0]) < 1e-3
    assert abs(pdf["pc2"].var(ddof=1) - evs[1]) < 1e-3
    assert abs(np.cov(pdf["pc1"], pdf["pc2"], ddof=1)[0, 1]) < 1e-3


def test_mahalanobis_matches_numpy_and_flags_planted_outlier(spark):
    import pandas as pd

    from smart_energy_consumption_analytics_using_big_data_spark.ext.embeddings import (
        mahalanobis_scores,
    )

    rng = np.random.default_rng(7)
    d = 8
    base = rng.normal(size=(200, d))
    outlier = np.full((1, d), 25.0)
    x = np.vstack([base, outlier])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(x)),
            "label": np.zeros(len(x), dtype="int32"),
            "embedding": [row.astype("float32").tolist() for row in x],
        }
    )
    emb = spark.createDataFrame(pdf)
    got = {r.vec_id: r.maha2 for r in mahalanobis_scores(emb).collect()}

    xf = np.asarray([np.asarray(v, dtype=np.float32) for v in pdf["embedding"]], dtype=np.float64)
    mu = xf.mean(axis=0)
    cov = np.cov(xf, rowvar=False, ddof=1) + 1e-6 * np.eye(d)
    inv = np.linalg.inv(cov)
    for i in range(len(xf)):
        delta = xf[i] - mu
        expect = float(delta @ inv @ delta)
        assert abs(got[i] - expect) < 1e-3, (i, got[i], expect)
    # the planted outlier dominates every inlier score
    assert got[len(xf) - 1] > max(got[i] for i in range(len(xf) - 1)) * 5


def test_arrow_udf_cosine_matches_jvm_expression(spark):
    """Spark 4.1 @arrow_udf kernel == the JVM zip_with/aggregate cosine
    (rounded); nulls absent by schema, zero-norm guarded."""
    from pyspark.sql import functions as F

    from smart_energy_consumption_analytics_using_big_data_spark.functions.vectorfns import (
        cosine,
        cosine_to_literal_arrow,
    )

    emb = _emb(spark)
    qvec = emb.orderBy("vec_id").first()["embedding"]
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    jvm = {
        r.vec_id: r.c
        for r in emb.select(
            "vec_id", F.round(cosine(F.col("embedding"), qlit), 6).alias("c")
        ).collect()
    }
    arrow_fn = cosine_to_literal_arrow([float(v) for v in qvec])
    arr = {
        r.vec_id: r.c
        for r in emb.select("vec_id", arrow_fn("embedding").alias("c")).collect()
    }
    assert len(jvm) == len(arr)
    for k in jvm:
        assert abs(jvm[k] - arr[k]) <= 1e-6, (k, jvm[k], arr[k])


def test_incremental_covariance_equals_full_recompute(spark):
    """Folding a new batch into stored sufficient statistics must give
    exactly the full-corpus covariance (associative decimal-free sums
    of identical doubles — both orders add the same per-batch
    partials)."""
    from smart_energy_consumption_analytics_using_big_data_spark.ext.embeddings import (
        covariance_from_state,
        covariance_matrix,
        covariance_state,
        covariance_update,
    )

    emb = _emb(spark)
    old = emb.filter("vec_id < 300")
    new = emb.filter("vec_id >= 300")
    state = covariance_state(old).localCheckpoint()  # "persisted" history
    merged = covariance_update(state, new)
    inc = {(r.i, r.j): r.cov for r in covariance_from_state(merged).collect()}
    full = {(r.i, r.j): r.cov for r in covariance_matrix(emb).collect()}
    assert set(inc) == set(full)
    for k in full:
        assert abs(inc[k] - full[k]) <= 1e-6, k


def test_pca_score_plan_is_jvm_only_and_shuffle_free(spark):
    """q_emb_pca_score's scoring plan must be the production shape the
    frozen-artifact design promises: literal weights folded JVM-side
    (no Python/Arrow eval node) over a narrow scan with NO exchange —
    the plan that broadcasts to any executor count at 100 TB."""
    from smart_energy_consumption_analytics_using_big_data_spark.plans import QUERIES

    df = QUERIES["q_emb_pca_score"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for python_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert python_node not in plan
    rows = df.collect()
    assert len(rows) > 0 and set(df.columns) == {"vec_id", "pc1", "pc2"}
