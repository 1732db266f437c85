"""Distributed second-moment statistics + PCA over embedding columns
(SURVEY.md §7 extension — the pre-training feature-space audit for an
embedding corpus: covariance structure, principal directions, and a
2-D projection for downstream visual QA / whitening / coreset work).

Scale design (the classic distributed-PCA split):

* the O(N·d²) part — the Gram/covariance accumulation — runs as ONE
  Arrow-batched pass over the corpus (`mapInPandas`, numpy ``X.T @ X``
  per batch) emitting tiny per-batch partial rows; a map-side-combined
  groupBy reduces them. Nothing driver-sized depends on N.
* the O(d³) part — the eigendecomposition — is a d×d problem (64×64
  here, 16 KB); it belongs on the driver, exactly like KMeans
  centroids or the PQ codebook.
* scoring/projection embeds the components as LITERAL arrays and runs
  pure JVM column math (zip_with/aggregate dot products) — no Python
  at projection time, so the scoring plan broadcasts to any number of
  executors and stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

PARTIAL_SCHEMA = "i int, j int, n long, sx double, sy double, sxy double"


def covariance_partials(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-Arrow-batch Gram partials for every upper-triangle (i, j).

    Each input batch of B vectors collapses to d(d+1)/2 rows carrying
    (batch count, component sums, product sums) — the sufficient
    statistics for covariance. Batch size amortizes the Python cost:
    one ``X.T @ X`` per ~10k rows, not per row.
    """

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            n = len(x)
            s = x.sum(axis=0)
            g = x.T @ x
            d = x.shape[1]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "n": np.full(len(iu), n, dtype="int64"),
                    "sx": s[iu],
                    "sy": s[ju],
                    "sxy": g[iu, ju],
                }
            )

    return emb.select(vec_col).mapInPandas(gram, PARTIAL_SCHEMA)


def covariance_matrix(
    emb: DataFrame, vec_col: str = "embedding", round_output: bool = True
) -> DataFrame:
    """Sample covariance of the embedding components, long form.

    Output: (i, j, cov) for i <= j — d(d+1)/2 scalar rows. One corpus
    pass; the shuffle moves only per-batch partials keyed by (i, j),
    combined map-side. ``round_output=False`` keeps full precision for
    numeric consumers (PCA); the default 6-decimal form is the
    cross-engine-comparable query output.
    """
    parts = covariance_partials(emb, vec_col)
    agg = parts.groupBy("i", "j").agg(
        F.sum("n").alias("N"),
        F.sum("sx").alias("SX"),
        F.sum("sy").alias("SY"),
        F.sum("sxy").alias("SXY"),
    )
    cov = (F.col("SXY") - F.col("SX") * F.col("SY") / F.col("N")) / (
        F.col("N") - 1
    )
    if not round_output:
        return agg.select("i", "j", cov.alias("cov"))
    # + 0.0 folds IEEE -0.0 (a tiny negative covariance rounded to six
    # decimals) to +0.0 so both engines canonicalize zero identically.
    return agg.select("i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov"))


def pca_components(
    emb: DataFrame,
    k: int = 2,
    vec_col: str = "embedding",
    cov_rows: list | None = None,
) -> tuple[list[list[float]], list[float]]:
    """Top-k principal components via the distributed covariance pass.

    Returns (components, explained_variances): k rows of d weights and
    the matching eigenvalues, descending. The d×d eig runs on the
    driver (64×64 here — smaller than one Arrow batch header); sign is
    fixed so each component's largest-magnitude weight is positive,
    making the decomposition deterministic across BLAS builds.
    ``cov_rows``: pass a pre-collected covariance_matrix(...) result to
    reuse one corpus pass across consumers (components + trace).
    """
    import numpy as np

    rows = (
        cov_rows
        if cov_rows is not None
        else covariance_matrix(emb, vec_col, round_output=False).collect()
    )
    d = max(r["j"] for r in rows) + 1
    c = np.zeros((d, d))
    for r in rows:
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(c)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[np.argmax(np.abs(v))] < 0:
            v = -v
        comps.append([float(w) for w in v])
    return comps, [float(vals[i]) for i in order]


def pca_project(
    emb: DataFrame,
    components: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project each embedding onto the given components — pure JVM
    column math (components as literal arrays, zip_with/aggregate dot
    product), no Python at projection time."""
    out = [F.col(id_col)]
    for c_idx, comp in enumerate(components):
        lit = F.array(*[F.lit(float(w)) for w in comp])
        prods = F.zip_with(
            F.col(vec_col), lit, lambda x, w: x.cast("double") * w
        )
        proj = F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
        out.append(F.round(proj, 6).alias(f"pc{c_idx + 1}"))
    return emb.select(*out)


GROUPED_PARTIAL_SCHEMA = (
    "label int, i int, j int, n long, sx double, sy double, sxy double"
)


def covariance_matrix_grouped(
    emb: DataFrame,
    key_col: str = "label",
    vec_col: str = "embedding",
    round_output: bool = True,
) -> DataFrame:
    """Class-conditional covariance: one (i, j, cov) triangle PER KEY —
    the sufficient-statistics input for LDA / per-class Mahalanobis /
    per-domain embedding drift. Same single-pass shape as
    covariance_matrix with the key carried through: each Arrow batch
    groups by key in numpy and emits per-(key, i, j) partials, so skewed
    keys cost their row share, never a separate job per class."""

    def gram(batches):
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue
            for key, grp in pdf.groupby(key_col, sort=False):
                x = np.asarray(grp[vec_col].to_list(), dtype=np.float64)
                n = len(x)
                s = x.sum(axis=0)
                g = x.T @ x
                iu, ju = np.triu_indices(x.shape[1])
                yield pd.DataFrame(
                    {
                        "label": np.full(len(iu), key, dtype="int32"),
                        "i": iu.astype("int32"),
                        "j": ju.astype("int32"),
                        "n": np.full(len(iu), n, dtype="int64"),
                        "sx": s[iu],
                        "sy": s[ju],
                        "sxy": g[iu, ju],
                    }
                )

    parts = emb.select(key_col, vec_col).mapInPandas(gram, GROUPED_PARTIAL_SCHEMA)
    agg = parts.groupBy("label", "i", "j").agg(
        F.sum("n").alias("N"),
        F.sum("sx").alias("SX"),
        F.sum("sy").alias("SY"),
        F.sum("sxy").alias("SXY"),
    )
    cov = (F.col("SXY") - F.col("SX") * F.col("SY") / F.col("N")) / (
        F.col("N") - 1
    )
    if not round_output:
        return agg.select("label", "i", "j", cov.alias("cov"))
    return agg.select(
        "label", "i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov")
    )


def mahalanobis_scores(
    emb: DataFrame,
    key_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    ridge: float = 1e-6,
) -> DataFrame:
    """Per-class squared Mahalanobis distance of every embedding to its
    class distribution — the classic embedding-space outlier/QA score
    (mislabeled points, contamination, domain drift).

    Train-small / score-big split, third rung of the covariance ladder:
    the per-class (mean, covariance) come from the ONE distributed
    grouped pass; each class's Cholesky factor inverts on the driver
    (k tiny d×d problems, ridge-regularized for rank safety); scoring
    broadcasts the factors and runs vectorized per Arrow batch —
    ``solve_triangular``-free: y = (x - mu) @ Linv.T, score = ||y||²,
    one BLAS call per batch per class, never per row.
    """
    import numpy as np

    stats = covariance_matrix_grouped(
        emb, key_col=key_col, vec_col=vec_col, round_output=False
    ).collect()
    means_rows = (
        emb.select(key_col, F.posexplode(vec_col).alias("p", "x"))
        .groupBy(key_col, "p")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    d = max(r["j"] for r in stats) + 1
    labels = sorted({r["label"] for r in stats})
    mu = {lb: np.zeros(d) for lb in labels}
    for r in means_rows:
        mu[r[key_col]][r["p"]] = r["m"]
    linv = {}
    for lb in labels:
        c = np.zeros((d, d))
        for r in stats:
            if r["label"] == lb:
                c[r["i"], r["j"]] = r["cov"]
                c[r["j"], r["i"]] = r["cov"]
        lchol = np.linalg.cholesky(c + ridge * np.eye(d))
        linv[lb] = np.linalg.inv(lchol)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            out_scores = np.empty(len(pdf))
            x = np.asarray(pdf[vec_col].to_list(), dtype=np.float64)
            lab = pdf[key_col].to_numpy()
            for lb in np.unique(lab):
                mask = lab == lb
                y = (x[mask] - mu[lb]) @ linv[lb].T
                out_scores[mask] = (y * y).sum(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    key_col: lab,
                    "maha2": np.round(out_scores, 6),
                }
            )

    return emb.select(id_col, key_col, vec_col).mapInPandas(
        score, f"{id_col} long, {key_col} int, maha2 double"
    )


def covariance_state(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The d(d+1)/2-row sufficient-statistics table (i, j, N, SX, SY,
    SXY) — the persistable state behind covariance_matrix. Store this
    after each ingest; it is constant-size in the corpus."""
    return (
        covariance_partials(emb, vec_col)
        .groupBy("i", "j")
        .agg(
            F.sum("n").alias("N"),
            F.sum("sx").alias("SX"),
            F.sum("sy").alias("SY"),
            F.sum("sxy").alias("SXY"),
        )
    )


def covariance_update(
    state: DataFrame, new_emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Incremental covariance maintenance: fold a NEW batch into a
    stored sufficient-statistics table without rescanning history —
    the nightly-embedding-ingest shape (same pattern as the
    incremental rollup and the incremental LSH index: history is a
    constant-size state table, only the delta touches the corpus
    reader). Returns the merged state; covariance_from_state turns any
    state into the (i, j, cov) triangle."""
    delta = covariance_state(new_emb, vec_col)
    return (
        state.unionByName(delta)
        .groupBy("i", "j")
        .agg(
            F.sum("N").alias("N"),
            F.sum("SX").alias("SX"),
            F.sum("SY").alias("SY"),
            F.sum("SXY").alias("SXY"),
        )
    )


def covariance_from_state(state: DataFrame, round_output: bool = True) -> DataFrame:
    """(i, j, cov) from a sufficient-statistics table."""
    cov = (F.col("SXY") - F.col("SX") * F.col("SY") / F.col("N")) / (
        F.col("N") - 1
    )
    if not round_output:
        return state.select("i", "j", cov.alias("cov"))
    return state.select("i", "j", (F.round(cov, 6) + F.lit(0.0)).alias("cov"))
