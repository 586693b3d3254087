"""Iterative-training vertical: the distributed logistic regression must
replay bit-exactly in pure Python (the determinism contract for the
quantized gradient reduction) and must actually learn the gate."""

from __future__ import annotations

from imdbmapreduce_spark import registry
from imdbmapreduce_spark.operators.ml import (
    _LR_ROUNDS,
    logreg_replay,
    quality_features,
)


def test_logreg_training_curve_replays_bit_exactly(spark, sf_dir):
    feats = [
        (r.y, r.x0, r.x1, r.x2, r.x3)
        for r in quality_features(spark, sf_dir).orderBy("doc_id").collect()
    ]
    expected = logreg_replay(feats)
    got = [
        (r["round"], r.sum_loss_q, r.n_correct, r.w0, r.w1, r.w2, r.w3)
        for r in registry.get("doc_quality_logreg").fn(spark, sf_dir).collect()
    ]
    assert len(got) == _LR_ROUNDS
    assert got == expected  # exact: quantized sums + IEEE scalar updates


def test_logreg_converges(spark, sf_dir):
    rows = sorted(
        registry.get("doc_quality_logreg").fn(spark, sf_dir).collect(),
        key=lambda r: r["round"],
    )
    n = quality_features(spark, sf_dir).count()
    # loss must strictly improve over training and accuracy must beat
    # both the all-one baseline and 80% by the last round
    assert rows[-1].sum_loss_q < rows[0].sum_loss_q
    base = max(r.n_correct for r in rows[:1])  # round 0 = w=0 coin flip
    assert rows[-1].n_correct > base
    assert rows[-1].n_correct / n >= 0.8, (rows[-1].n_correct, n)
