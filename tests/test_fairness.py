"""Fairness engine parity tests.

Oracles are straight transliterations of the reference formulas (written here
independently in plain numpy, mirroring 10_FAME.py:54-122 / 01_BEHRT.py:27-99)
plus hand-computed micro-cases.
"""

import numpy as np
import pytest

from fairmultimodal_tpu.fairness import (
    combined_eddi,
    compute_eddi,
    eddi_from_stats,
    eddi_loss,
    equalized_odds,
    subgroup_error_stats,
)


def _oracle_eddi_fame(y_true, y_pred, sens, threshold, complete_groups):
    # Line-by-line mirror of 10_FAME.py:54-82 semantics.
    y_bin = (y_pred > threshold).astype(int)
    groups = np.array(complete_groups)
    overall = np.mean(y_bin != y_true)
    denom = (1 - overall) if overall < 0.5 else overall
    if overall in (0.0, 1.0):
        denom = 1.0
    sub = {}
    valid = 0
    for g in groups:
        m = sens == g
        if m.sum() == 0:
            continue
        valid += 1
        er = np.mean(y_bin[m] != y_true[m])
        sub[g] = (er - overall) / denom
    if valid:
        return np.sqrt(np.sum(np.array(list(sub.values())) ** 2)) / valid, sub
    return 0.0, sub


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eddi_fame_variant_matches_oracle(seed):
    r = np.random.default_rng(seed)
    n = 500
    y = r.integers(0, 2, n)
    p = r.random(n)
    sens = r.integers(0, 4, n)
    # Leave group 3 sometimes empty to exercise valid-group counting.
    if seed == 1:
        sens[sens == 3] = 2
    got, got_sub = compute_eddi(y, p, sens, threshold=0.5, complete_groups=[0, 1, 2, 3])
    want, want_sub = _oracle_eddi_fame(y, p, sens, 0.5, [0, 1, 2, 3])
    assert got == pytest.approx(want, abs=1e-12)
    assert set(got_sub) == set(want_sub)
    for g in want_sub:
        assert got_sub[g] == pytest.approx(want_sub[g], abs=1e-12)


def test_eddi_behrt_variant_total_divisor():
    # 01_BEHRT.py:98 divides by len(unique_groups); with all groups present
    # the variants agree, so force the difference via complete_groups+divisor.
    y = np.array([1, 0, 1, 0, 1, 0])
    p = np.array([0.9, 0.1, 0.2, 0.8, 0.9, 0.1])
    sens = np.array([0, 0, 1, 1, 2, 2])
    e_valid, _ = compute_eddi(y, p, sens, complete_groups=[0, 1, 2, 3], divisor="valid")
    e_total, _ = compute_eddi(y, p, sens, complete_groups=[0, 1, 2, 3], divisor="total")
    assert e_valid == pytest.approx(e_total * 4 / 3)


def test_eddi_hand_computed():
    # preds bin = [1,0,0,1,1,1]; errors = [0,0,1,1,0,1]; overall = 0.5, denom 0.5.
    # group 0: err 0   -> d = (0 - 0.5)/0.5   = -1.0
    # group 1: err 1   -> d = (1 - 0.5)/0.5   =  1.0
    # group 2: err 1/2 -> d =  0.0
    y = np.array([1, 0, 1, 0, 1, 0])
    p = np.array([0.9, 0.1, 0.2, 0.8, 0.9, 0.8])
    sens = np.array([0, 0, 1, 1, 2, 2])
    overall, sub = compute_eddi(y, p, sens)
    assert sub[0] == pytest.approx(-1.0)
    assert sub[1] == pytest.approx(1.0)
    assert sub[2] == pytest.approx(0.0)
    assert overall == pytest.approx(np.sqrt(2.0) / 3)


def test_eddi_degenerate_perfect_predictions():
    y = np.array([1, 0, 1, 0])
    p = np.array([0.9, 0.1, 0.9, 0.1])
    sens = np.array([0, 0, 1, 1])
    overall, sub = compute_eddi(y, p, sens)
    assert overall == 0.0
    assert all(v == 0.0 for v in sub.values())


def test_combined_eddi():
    assert combined_eddi(0.3, 0.4, 0.0) == pytest.approx(0.5 / 3)


def test_eddi_from_stats_matches_compute_eddi(rng):
    n = 400
    y = rng.integers(0, 2, n)
    p = rng.random(n)
    sens = rng.integers(0, 5, n)
    sens[sens == 4] = 1  # empty group 4
    want, _ = compute_eddi(y, p, sens, complete_groups=range(5))
    y_bin = (p > 0.5).astype(np.float32)
    counts, errors = subgroup_error_stats(
        np.asarray(y, np.float32), y_bin, np.asarray(sens, np.int32), 5
    )
    got = eddi_from_stats(np.asarray(counts), np.asarray(errors))
    assert got == pytest.approx(want, abs=1e-6)


def _oracle_leddi(probs, labels, sens_list):
    # Mirror of the torch loop at 10_FAME.py:423-442 in numpy.
    rmses = []
    for i in range(probs.shape[1]):
        p, yy = probs[:, i], labels[:, i]
        overall = np.mean(np.abs(p - yy))
        for sens in sens_list:
            diffs = []
            for g in np.unique(sens):
                m = sens == g
                sub = np.mean(np.abs(p[m] - yy[m]))
                diffs.append((sub - overall) ** 2)
            rmses.append(np.sqrt(np.mean(diffs) + 1e-8))
    return np.mean(rmses)


def test_eddi_loss_matches_reference_loop(rng):
    import jax.numpy as jnp

    b = 64
    probs = rng.random((b, 3)).astype(np.float32)
    labels = rng.integers(0, 2, (b, 3)).astype(np.float32)
    age = rng.integers(0, 4, b).astype(np.int32)
    eth = rng.integers(0, 5, b).astype(np.int32)
    ins = rng.integers(0, 6, b).astype(np.int32)
    ins[ins == 5] = 0  # leave a group empty
    want = _oracle_leddi(probs, labels, [age, eth, ins])
    got = eddi_loss(jnp.array(probs), jnp.array(labels), [age, eth, ins], [4, 5, 6])
    assert float(got) == pytest.approx(want, rel=1e-5)


def test_eddi_loss_grad_flows():
    import jax
    import jax.numpy as jnp

    def f(logits):
        probs = jax.nn.sigmoid(logits)
        labels = jnp.array([[1.0, 0.0, 1.0]] * 8)
        sens = [jnp.zeros(8, jnp.int32), jnp.arange(8, dtype=jnp.int32) % 5,
                jnp.arange(8, dtype=jnp.int32) % 6]
        return eddi_loss(probs, labels, sens, [4, 5, 6])

    g = jax.grad(f)(jnp.linspace(-1, 1, 24).reshape(8, 3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_equalized_odds_pairs_vs_n2():
    y = np.array([1, 1, 0, 0, 1, 0, 1, 0])
    pred = np.array([1, 0, 0, 1, 1, 1, 0, 0])
    sens = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    eo_pairs = equalized_odds(y, pred, sens, aggregation="pairs")
    eo_n2 = equalized_odds(y, pred, sens, aggregation="n2")
    # group0: TPR=1/2 FPR=1/2 ; group1: TPR=1/2 FPR=1/2 -> all gaps 0
    assert eo_pairs["EO"] == pytest.approx(0.0)
    # n=2: n2 divides by 4 instead of 1 pair.
    assert eo_n2["EOTPR"] == pytest.approx(eo_pairs["EOTPR"] * 1 / 4)


def test_equalized_odds_hand_case():
    # group0: TPR=1.0, FPR=0.0 ; group1: TPR=0.0, FPR=1.0
    y = np.array([1, 0, 1, 0])
    pred = np.array([1, 0, 0, 1])
    sens = np.array([0, 0, 1, 1])
    eo = equalized_odds(y, pred, sens)
    assert eo["EOTPR"] == pytest.approx(1.0)
    assert eo["EOFPR"] == pytest.approx(1.0)
    assert eo["EO"] == pytest.approx(1.0)
