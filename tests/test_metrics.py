"""EER / DET / confusion-matrix parity tests (reference: evaluate_metrics.py)."""

import numpy as np
import pytest

from occm_tpu.metrics import (
    calculate_confusion_matrix,
    compute_det_curve,
    compute_eer,
)


def _oracle_det(target, nontarget):
    """Independent oracle: sweep every threshold, count errors directly."""
    all_scores = np.concatenate([target, nontarget])
    order = np.argsort(all_scores, kind="mergesort")
    labels = np.concatenate(
        [np.ones(target.size), np.zeros(nontarget.size)]
    )[order]
    frr = [0.0]
    far = [1.0]
    rejected_targets = 0
    accepted_nontargets = nontarget.size
    for lab in labels:
        if lab == 1:
            rejected_targets += 1
        else:
            accepted_nontargets -= 1
        frr.append(rejected_targets / target.size)
        far.append(accepted_nontargets / nontarget.size)
    return np.array(frr), np.array(far)


def test_det_curve_against_counting_oracle():
    rng = np.random.default_rng(0)
    target = rng.normal(2.0, 1.0, 257)
    nontarget = rng.normal(0.0, 1.0, 389)
    frr, far, thr = compute_det_curve(target, nontarget)
    ofrr, ofar = _oracle_det(target, nontarget)
    np.testing.assert_allclose(frr, ofrr, atol=1e-12)
    np.testing.assert_allclose(far, ofar, atol=1e-12)
    assert thr.shape == frr.shape
    # leading threshold sits just below the minimum score
    assert thr[0] == pytest.approx(np.min(np.concatenate([target, nontarget])) - 0.001)


def test_eer_perfect_separation():
    eer, thr = compute_eer(np.array([10.0, 11.0, 12.0]), np.array([0.0, 1.0, 2.0]))
    assert eer == 0.0
    assert 2.0 <= thr <= 10.0


def test_eer_total_overlap():
    rng = np.random.default_rng(1)
    scores = rng.normal(0, 1, 4000)
    eer, _ = compute_eer(scores[:2000], scores[2000:])
    assert abs(eer - 0.5) < 0.05


def test_eer_symmetric_gaussians_known_value():
    # equal-variance gaussians at +/- mu: EER = Phi(-mu/sigma)
    rng = np.random.default_rng(2)
    mu = 1.0
    target = rng.normal(mu, 1.0, 200_000)
    nontarget = rng.normal(-mu, 1.0, 200_000)
    eer, thr = compute_eer(target, nontarget)
    from scipy.stats import norm

    assert eer == pytest.approx(norm.cdf(-mu), abs=0.004)
    assert thr == pytest.approx(0.0, abs=0.02)


def test_eer_tie_handling_is_stable_mergesort():
    # ties between target/nontarget scores: stable sort keeps targets first
    target = np.array([1.0, 1.0, 2.0])
    nontarget = np.array([1.0, 1.0, 0.0])
    frr, far, thr = compute_det_curve(target, nontarget)
    # after the first sorted score (0.0, nontarget): far drops to 2/3, frr 0
    np.testing.assert_allclose(frr[:4], [0.0, 0.0, 1 / 3, 2 / 3])
    np.testing.assert_allclose(far[:4], [1.0, 2 / 3, 2 / 3, 2 / 3])


def test_confusion_matrix_counts():
    tp, tn, fp, fn = calculate_confusion_matrix(
        np.array([0.9, 0.8, 0.2]), np.array([0.1, 0.6, 0.3]), threshold=0.5
    )
    assert (tp, tn, fp, fn) == (2, 2, 1, 1)
