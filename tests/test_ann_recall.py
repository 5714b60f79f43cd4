"""ANN quality quantification: the approximate neighbor queries are
rows-only/hash-checked for *determinism*; this test pins their
*recall* against the exact brute-force baseline so a refactor that
silently degrades the approximation fails loudly.

Measured at sf0.01 (500 vectors, 5 queries): IVF nprobe=1 recall@3 =
0.40; three-table hyperplane-LSH recall@3 = 0.6 with round-5's
query-side weakest-3-bit multi-probe (round-4's two-table
weakest-2-bit measured 0.33; single-probe 0.13).  The LSH ceiling is
set by the DATA, not the implementation:
the synthetic embeddings are near-uniform, so the exact top-3 sit at
cos ≈ 0.2–0.3 — a regime where random-hyperplane sign bits carry
little signal.  Hyperplane LSH's design target is the high-cosine
near-duplicate regime (cos ≥ 0.9, where its recall → 1), which
embedding_neardup/minhash cover with exact verification.  Thresholds
sit one notch below the measured values so boxes with different float
rounding don't flap.
"""

from __future__ import annotations

import os

SF_DIR = os.environ.get("TEST_SF_DIR_ANN", "/root/testdata/sf0.01")


def _recall_at3(approx, exact) -> float:
    per_q = []
    for q in sorted(exact.query_id.unique()):
        a3 = set(
            approx[approx.query_id == q]
            .sort_values(list(approx.columns))  # deterministic
            .neighbor_id.head(3)
        )
        e3 = set(
            exact[exact.query_id == q]
            .sort_values("cos", ascending=False)
            .neighbor_id.head(3)
        )
        per_q.append(len(a3 & e3) / 3)
    return sum(per_q) / len(per_q)


def test_ivf_recall_vs_exact(spark):
    # component functions directly: the registry folds D6+D8 into one
    # union-tagged grid entry (ann_exact_ivf), but recall is a property
    # of each component plan
    from beeradvocate_crawler_spark.plans import textops as X

    ivf = X.q_ivf_ann_cosine(spark, SF_DIR).toPandas()
    ex = X.q_cosine_topk(spark, SF_DIR).toPandas()
    # ivf carries an explicit rank column — use it
    ivf = ivf.sort_values(["query_id", "rnk"])
    r = _recall_at3(ivf, ex)
    assert r >= 0.3, f"IVF nprobe=1 recall@3 regressed: {r:.3f}"


def test_lsh_recall_vs_exact(spark):
    import __spark_entry__ as E

    lsh = E.queries()["ann_lsh_cosine"](spark, SF_DIR).toPandas()

    from beeradvocate_crawler_spark.plans import textops as X

    ex = X.q_cosine_topk(spark, SF_DIR).toPandas()
    r = _recall_at3(lsh, ex)
    # 3 tables + weakest-4-bit multi-probe (round 5): measured 0.6 at
    # sf0.01 (vs 0.33 round-4 multi-probe, 0.13 single-probe)
    assert r >= 0.5, f"multi-probe LSH recall@3 regressed: {r:.3f}"


def test_trained_ivf_recall_vs_exact(spark):
    """The k-means codebook + nprobe=3 variant must beat the nprobe=1
    deterministic stand-in by a wide margin (measured 0.8 vs 0.40 at
    sf0.01; pinned one notch below)."""
    import __spark_entry__ as E

    ivf = E.queries()["ann_ivf_trained"](spark, SF_DIR).toPandas()

    from beeradvocate_crawler_spark.plans import textops as X

    ex = X.q_cosine_topk(spark, SF_DIR).toPandas()
    ivf = ivf.sort_values(["query_id", "rnk"])
    r = _recall_at3(ivf, ex)
    assert r >= 0.6, f"trained-IVF recall@3 regressed: {r:.3f}"
