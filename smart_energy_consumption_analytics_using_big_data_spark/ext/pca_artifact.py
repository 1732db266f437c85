"""Frozen PCA model artifact for the oracled scoring query.

``q_emb_pca_project`` trains AND scores in one plan, so it can only be
rows-only: the eigendecomposition is not expressible in the DuckDB
oracle. But scoring alone is pure linear algebra over literal weights —
exactly the train-small / score-big split the module is built around
(`ext/embeddings.py`: components are driver-side literals, projection
is JVM ``zip_with``/``aggregate`` column math). Freezing the trained
components as a constant turns the SCORING path into a fully oracled
query (``q_emb_pca_score``): both engines fold the identical literal
weights over the identical embedding arrays in the identical order, so
the comparison is bit-exact before rounding.

Provenance: top-2 components of the sf0.01 ``embeddings`` snapshot,
trained by ``ext.embeddings.pca_components`` (one distributed
covariance pass -> driver eigh, sign-fixed so each component's
largest-magnitude weight is positive). ``tests/test_embeddings_pca.py``
re-trains on the same snapshot and pins these constants against the
live trainer, so the artifact provably IS the model — not arbitrary
weights. Like any shipped model file, it is version-pinned to its
training snapshot; retrain and re-freeze if the fixture regenerates.

Eigengap caveat (why the pin uses 1e-6, not exact equality): the
snapshot's spectrum is nearly degenerate (lambda1=0.027568,
lambda2=0.027221, ratio 1.013), so ulp-level covariance differences
from partition-order float summation rotate the eigenvectors by
O(ulp / eigengap) ~ 1e-12 — far below the pin tolerance and the
6-decimal query rounding, but not bit-stable.
"""

from __future__ import annotations

# fmt: off
FROZEN_PCA_EIGENVALUES_K2: tuple[float, float] = (
    0.02756803535150417, 0.027221187127255436,
)

FROZEN_PCA_COMPONENTS_K2: tuple[tuple[float, ...], ...] = (
    (
        -0.2096393300202028, -0.12057271532723673, 0.036547858157612134,
        0.01181956673367529, 0.07567008238652331, 0.013214628819759398,
        0.09058411852537655, 0.2866187923515331, 0.049546962198392955,
        0.4140565264810955, 0.06530498182357518, 0.1820788538770334,
        0.06513224150018762, -0.03653205474590873, 0.17114897510631705,
        -0.18534977731552305, 0.08898987448653041, -0.15702655458925818,
        -0.03013668633728899, 0.03217896951211664, 0.061213204086393344,
        -0.11068832311424731, -0.0834751278586719, -0.05543746864805592,
        0.019550012020346605, 0.19912542853516932, -0.03751725245021924,
        0.14950769892188984, -0.17287963096364825, -0.006123114085460381,
        -0.058715726703469924, 0.06203771797942597, 0.296538543537769,
        0.10616457882139813, -0.032041938893808825, 0.10414385148185397,
        0.04453875953671187, 0.0614640530939501, 0.01300669820067325,
        0.02177120565591325, -0.116678987798228, 0.005524586419047212,
        -0.24083692028370826, 0.09570759064865955, -0.02830770835616206,
        -0.2251274447351692, 0.008731835914196281, -0.07903750804624604,
        -0.08368084414987442, -0.11845091153313808, 0.12045949820882157,
        0.0724832515791852, -0.0171864821571749, 0.08160437407065277,
        -0.015031355628748754, -0.06676477469561945, -0.05565063627860249,
        -0.05137605781699047, 0.06019601767571005, -0.09113914348048652,
        0.12198699564215855, 0.050649833878916486, -0.21821146492315363,
        -0.1020138863625452,
    ),
    (
        -0.0038371272115912533, -0.05443024576702603, -0.012567933480759576,
        -0.0881336579764872, 0.1748576977504257, 0.025214365797044964,
        0.07494656338562362, -0.06998070108596458, 0.07744817020896035,
        0.030696056195260654, 0.10575814459049974, -0.017882873012908633,
        0.01297565633124882, 0.13369681742755216, 0.014559198307485421,
        0.04139191933934147, 0.14841100078750896, 0.3603098511261572,
        -0.05418865141456779, -0.050764775917261515, 0.032543169734787845,
        0.03539112685064569, 0.06533467378092334, -0.3091228055052971,
        -0.2576821382583786, -0.2390658636293963, -0.02063763279331187,
        -0.00022331337887689356, -0.08628570371767141, -0.17453292227143635,
        -0.024067927226899235, -0.21754493603557246, 0.029463935144021323,
        0.06153867890849662, 0.03375332841845172, 0.07921967482014358,
        0.05946710015971153, 0.03649840257323392, 0.18210698156722915,
        0.046673884808694534, 8.626507702145375e-06, 0.04698675564095887,
        -0.06276704622858859, -0.17918979594373452, 0.1726864902093715,
        -0.1888352229469675, -0.04694587131589587, 0.1457794821148016,
        0.1129239775772592, -0.11328063222737843, -0.15743104350111625,
        -0.08197501074018451, 0.012979946743258294, -0.016092353749803077,
        0.23803515091895205, 0.023384317388539695, -0.3028202755225075,
        0.016382840108207692, 0.1354336430120573, -0.12158606610327043,
        -0.0836704960306455, 0.08483882908899565, -0.0004431848647368196,
        -0.07861586992416258,
    ),
)
# fmt: on


def duckdb_weight_literal(component: tuple[float, ...]) -> str:
    """DuckDB list literal for one component, ``repr``-formatted so the
    decimal text round-trips to the identical IEEE double the Spark
    ``lit()`` array carries."""
    return "[" + ", ".join(repr(w) for w in component) + "]"
