"""AUC evaluators (queries/recommend.py): the fixed-grid binned form
vs the exact distributed Mann-Whitney form (r10, VERDICT r9 #6)."""

from __future__ import annotations

import numpy as np

from bigdatafinalproject_spark import registry
from tests.conftest import SF_DIR


def _numpy_midrank_auc(scores, labels):
    """Independent reference: Mann-Whitney AUC with midrank ties."""
    order = np.argsort(scores, kind="mergesort")
    s, y = scores[order], labels[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0  # midrank of the tied block
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    return (ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (
        n_pos * n_neg
    )


def test_eval_auc_binned_equals_exact(spark):
    """On the fixture corpus the distinct midpoint scores land in
    distinct 256-grid bins, so the binned closed form and the exact
    per-value form agree BIT-FOR-BIT; both match an independent numpy
    midrank computation to float precision. (In general the binned
    form carries grid quantization error — the exact form is the
    documented large-N variant built on the distributed range-
    partitioned prefix sum.)"""
    from bigdatafinalproject_spark.queries.recommend import (
        _midpoint_predictions,
    )

    binned = registry.QUERIES["eval_auc"](spark, SF_DIR).collect()[0][0]
    exact = registry.QUERIES["eval_auc_exact"](spark, SF_DIR).collect()[0][0]
    assert binned == exact  # bit-identical on the fixture

    pdf = _midpoint_predictions(spark, SF_DIR).toPandas()
    scores = pdf["prediction"].to_numpy(dtype=float)
    labels = (pdf["rating"].to_numpy(dtype=float) > 25).astype(int)
    ref = _numpy_midrank_auc(scores, labels)
    assert abs(exact - ref) < 1e-12
