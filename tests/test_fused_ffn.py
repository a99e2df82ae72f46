"""Parity tests for the Pallas fused-FFN kernel (ops/fused_ffn.py).

CPU tests run the kernels in the Pallas interpreter.  The dropout branch
uses TPU-only PRNG primitives (``pltpu.prng_seed``) with no interpreter
lowering, so its statistical test is TPU-gated; the backward's ReLU+dropout
mask math needs no RNG (it is recovered from the stored activation) and IS
covered here by constructing a zero-patterned activation by hand.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairmultimodal_tpu.ops.fused_ffn import _bwd_impl, _fwd_impl, fused_ffn

R, H, F = 300, 256, 384  # deliberately non-multiple-of-block rows


def _inputs(seed=0, r=R):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(0, 1, (r, H)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.05, (H, F)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.05, F), jnp.float32),
            jnp.asarray(rng.normal(0, 0.05, (F, H)), jnp.float32),
            jnp.asarray(rng.normal(0, 0.05, H), jnp.float32))


def _ref(x, w1, b1, w2, b2):
    return jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2


def test_forward_parity_deterministic():
    x, w1, b1, w2, b2 = _inputs()
    out = fused_ffn(x, w1, b1, w2, b2, jnp.zeros(1, jnp.int32),
                    0.1, True, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(x, w1, b1, w2, b2)),
                               rtol=2e-5, atol=2e-5)


def test_all_five_grads_match_autodiff():
    x, w1, b1, w2, b2 = _inputs(1)
    seed = jnp.zeros(1, jnp.int32)

    def loss_f(args):
        return jnp.sum(jnp.sin(fused_ffn(*args, seed, 0.1, True, True)))

    def loss_r(args):
        return jnp.sum(jnp.sin(_ref(*args)))

    gf = jax.grad(loss_f)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_r)((x, w1, b1, w2, b2))
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-4, err_msg=name)


def test_backward_mask_semantics_with_dropout_pattern():
    """The backward derives the ReLU+dropout VJP factor from h_d alone.

    Build an h_d with a hand-made zero pattern (as a real dropout forward
    would produce) and check the kernel's gradients against the analytic
    formulas dh=(g@W2^T)*1[h_d>0]/keep, dx=dh@W1^T, dW1=x^T dh, dW2=h_d^T g.
    """
    rng = np.random.default_rng(2)
    x, w1, b1, w2, b2 = _inputs(2, r=256)
    rate = 0.25
    keep = 1.0 - rate
    h = np.maximum(np.asarray(x) @ np.asarray(w1) + np.asarray(b1), 0.0)
    mask = rng.random(h.shape) < keep
    hd = jnp.asarray(h * mask / keep, jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (256, H)), jnp.float32)

    dx, dw1, db1, dw2, db2 = _bwd_impl(x, w1, w2, hd, g, rate=rate,
                                       deterministic=False, interpret=True)
    s = (np.asarray(hd) > 0) / keep
    dh = (np.asarray(g) @ np.asarray(w2).T) * s
    np.testing.assert_allclose(np.asarray(dx), dh @ np.asarray(w1).T,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(x).T @ dh,
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(db1).ravel(), dh.sum(0),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw2), np.asarray(hd).T @ np.asarray(g),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(db2).ravel(), np.asarray(g).sum(0),
                               rtol=1e-4, atol=1e-3)


def test_encoder_layer_paths_identical():
    """ffn_kernel=True/False: identical param trees, identical deterministic
    outputs, matching grads — checkpoints are interchangeable."""
    from fairmultimodal_tpu.models.behrt import TorchEncoderLayer

    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 32, 256)),
                    jnp.float32)
    m_ref = TorchEncoderLayer(256, 4, ffn_size=384, ffn_kernel=False)
    m_fus = TorchEncoderLayer(256, 4, ffn_size=384, ffn_kernel=True)
    p1 = m_ref.init(jax.random.PRNGKey(7), x)["params"]
    p2 = m_fus.init(jax.random.PRNGKey(7), x)["params"]
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), p1, p2))

    y1 = m_ref.apply({"params": p1}, x)
    y2 = m_fus.apply({"params": p1}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)

    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m_ref.apply({"params": p}, x))))(p1)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(m_fus.apply({"params": p}, x))))(p1)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-5, err_msg=str(path))

    jax.tree_util.tree_map_with_path(check, g1, g2)


def test_row_padding_grads_exact():
    """Non-block-multiple rows: padded rows must contribute nothing."""
    x, w1, b1, w2, b2 = _inputs(4, r=130)
    seed = jnp.zeros(1, jnp.int32)

    def loss_f(args):
        return jnp.sum(fused_ffn(*args, seed, 0.0, True, True) ** 2)

    def loss_r(args):
        return jnp.sum(_ref(*args) ** 2)

    gf = jax.grad(loss_f)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_r)((x, w1, b1, w2, b2))
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-4, err_msg=name)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="dropout branch uses TPU PRNG primitives")
def test_dropout_statistics_tpu():
    x, w1, b1, w2, b2 = _inputs(5, r=512)
    rate = 0.5
    out, hd = _fwd_impl(x, w1, b1, w2, b2, jnp.asarray([123], jnp.int32),
                        rate=rate, deterministic=False, interpret=False)
    h = np.maximum(np.asarray(x) @ np.asarray(w1) + np.asarray(b1), 0.0)
    hd = np.asarray(hd)
    alive = h > 1e-3
    drop_frac = float((hd[alive] == 0).mean())
    assert abs(drop_frac - rate) < 0.02
    # Kept entries are scaled by 1/keep.  The numpy fp32 h differs from the
    # kernel's fp32-on-MXU h by default-matmul precision (bf16 passes): the
    # error is ABSOLUTE in the scale of the pre-cancellation sum (measured
    # ≤0.017 here), so small h entries show large relative error.  The check
    # classifies the scaling — a kept/dropped misclassification at h > 0.2
    # gives |diff| = h/keep ≥ 0.4, far above these tolerances.
    kept = (h > 0.2) & (hd > 0)
    np.testing.assert_allclose(hd[kept], h[kept] / (1 - rate), rtol=1e-2,
                               atol=5e-2)
    # out is hd @ w2 + b2 (same MXU-vs-numpy precision caveat).
    np.testing.assert_allclose(
        np.asarray(out), hd[:512] @ np.asarray(w2) + np.asarray(b2),
        rtol=3e-2, atol=3e-2)


# -- LN-epilogue variant (fused_ffn_ln) ---------------------------------------


def _ref_ln(x, w1, b1, w2, b2, gamma, beta, eps=1e-6):
    """XLA reference for LayerNorm(x + ffn(x)), dropout off, with the
    kernel's residual contract: stats from the dtype-rounded z."""
    z = (x + _ref(x, w1, b1, w2, b2)).astype(x.dtype)
    zz = z.astype(jnp.float32)
    mu = jnp.mean(zz, axis=-1, keepdims=True)
    var = jnp.mean((zz - mu) ** 2, axis=-1, keepdims=True)
    xhat = (zz - mu) * jax.lax.rsqrt(var + eps)
    return xhat * gamma + beta


def _ln_params(seed=7):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.normal(1, 0.1, H), jnp.float32),
            jnp.asarray(rng.normal(0, 0.1, H), jnp.float32))


def test_ln_forward_parity_deterministic():
    from fairmultimodal_tpu.ops.fused_ffn import fused_ffn_ln

    x, w1, b1, w2, b2 = _inputs(2)
    gamma, beta = _ln_params()
    out = fused_ffn_ln(x, w1, b1, w2, b2, gamma, beta,
                       jnp.zeros(2, jnp.int32), 0.1, True, True)
    ref = _ref_ln(x, w1, b1, w2, b2, gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ln_all_seven_grads_match_autodiff():
    from fairmultimodal_tpu.ops.fused_ffn import fused_ffn_ln

    x, w1, b1, w2, b2 = _inputs(3)
    gamma, beta = _ln_params(8)
    seed = jnp.zeros(2, jnp.int32)

    def loss_f(args):
        return jnp.sum(jnp.sin(fused_ffn_ln(*args, seed, 0.1, True, True)))

    def loss_r(args):
        return jnp.sum(jnp.sin(_ref_ln(*args)))

    gf = jax.grad(loss_f)((x, w1, b1, w2, b2, gamma, beta))
    gr = jax.grad(loss_r)((x, w1, b1, w2, b2, gamma, beta))
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2", "dgamma",
                           "dbeta"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-4, err_msg=name)


def test_encoder_layer_ffn_fold_paths_identical():
    """fold_ln=True/False on TorchEncoderLayer with the FFN kernel forced:
    same params, same deterministic output, matching grads."""
    from fairmultimodal_tpu.models.behrt import TorchEncoderLayer

    x = jnp.asarray(np.random.default_rng(9).normal(0, 1, (2, 16, 256)),
                    jnp.float32)
    m_ref = TorchEncoderLayer(256, 4, ffn_size=384, ffn_kernel=True,
                              attn_kernel=False, fold_ln=False)
    m_fold = TorchEncoderLayer(256, 4, ffn_size=384, ffn_kernel=True,
                               attn_kernel=False, fold_ln=True)
    p = m_ref.init(jax.random.PRNGKey(3), x)["params"]
    p2 = m_fold.init(jax.random.PRNGKey(3), x)["params"]
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), p, p2))

    y1 = m_ref.apply({"params": p}, x)
    y2 = m_fold.apply({"params": p}, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)

    g1 = jax.grad(lambda q: jnp.sum(jnp.sin(m_ref.apply({"params": q}, x))))(p)
    g2 = jax.grad(lambda q: jnp.sum(jnp.sin(m_fold.apply({"params": q}, x))))(p)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-4, err_msg=str(path))

    jax.tree_util.tree_map_with_path(check, g1, g2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="dropout branch uses TPU PRNG primitives")
def test_ln_outer_dropout_replay_tpu():
    """Train-mode fused_ffn_ln: (a) same seed -> bit-identical output,
    (b) the backward's outer-mask REPLAY reproduces the forward's mask —
    kernel grads must equal jax.grad of an XLA reference built with the
    masks recovered from the stored residuals."""
    from fairmultimodal_tpu.ops.fused_ffn import _fwd_ln_impl, fused_ffn_ln

    x, w1, b1, w2, b2 = _inputs(6, r=512)
    gamma, beta = _ln_params(9)
    seed = jnp.asarray([11, 17], jnp.int32)
    rate = 0.3

    out1, hd, z = _fwd_ln_impl(x, w1, b1, w2, b2, gamma, beta, seed,
                               rate=rate, deterministic=False,
                               interpret=False)
    out2, _, _ = _fwd_ln_impl(x, w1, b1, w2, b2, gamma, beta, seed,
                              rate=rate, deterministic=False,
                              interpret=False)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    # Recover both masks from the stored residuals.
    hd = np.asarray(hd)                        # post-inner-dropout activation
    z = np.asarray(z)
    y_full = hd @ np.asarray(w2) + np.asarray(b2)
    outer_kept = (z - np.asarray(x)) != 0      # dropped rows: z == x exactly
    inv_keep = 1.0 / (1.0 - rate)
    # Coarse tolerance: numpy fp32 vs MXU default-precision matmul — this
    # check classifies kept-vs-dropped, not matmul ulps.
    np.testing.assert_allclose((z - np.asarray(x))[outer_kept],
                               (y_full * inv_keep)[outer_kept], rtol=3e-2,
                               atol=3e-2)

    def ref_with_masks(x, w1, b1, w2, b2, gamma, beta):
        h = jnp.maximum(x @ w1 + b1, 0.0)
        h = jnp.where(jnp.asarray(hd) > 0, h * inv_keep, 0.0)
        y = h @ w2 + b2
        y = jnp.where(jnp.asarray(outer_kept), y * inv_keep, 0.0)
        zz = (x + y).astype(jnp.float32)
        mu = jnp.mean(zz, axis=-1, keepdims=True)
        var = jnp.mean((zz - mu) ** 2, axis=-1, keepdims=True)
        return ((zz - mu) * jax.lax.rsqrt(var + 1e-6)) * gamma + beta

    args = (x, w1, b1, w2, b2, gamma, beta)
    gf = jax.grad(lambda a: jnp.sum(jnp.sin(
        fused_ffn_ln(*a, seed, rate, False, False))))(args)
    gr = jax.grad(lambda a: jnp.sum(jnp.sin(ref_with_masks(*a))))(args)
    # Tolerance is set by fp32-on-MXU default precision (bf16 passes) with
    # different contraction orders on the two sides, measured ~1e-3 relative
    # on O(10) grads.  A replay bug (one flipped mask bit) perturbs grads by
    # O(0.1-1) — still two orders above this bound.  The exact bwd math is
    # pinned by the CPU interpret-mode tests above.
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2", "dgamma",
                           "dbeta"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=3e-2, err_msg=name)


# -- gelu activation mode (the BERT FFN, round 3) ---------------------------------
#
# CPU caveat: this box's XLA:CPU lowers fp32 dot_general through a bf16
# fastmath gemm at DEFAULT precision, so comparing matmuls of two *slightly
# different* activation buffers (exact vs approximated gelu) has a bf16-level
# noise floor (~6e-4 measured).  The comparisons below run the XLA reference
# under ``jax.default_matmul_precision("highest")``, which restores the
# true fp32 gap of ~1e-6 (the A&S erf approximation, see ops/fused_ffn.py).


def _gelu_ref(x, w1, b1, w2, b2):
    return jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2


def test_gelu_forward_parity():
    x, w1, b1, w2, b2 = _inputs(3)
    with jax.default_matmul_precision("highest"):
        out = fused_ffn(x, w1, b1, w2, b2, jnp.zeros(1, jnp.int32),
                        0.0, True, True, "gelu")
        ref = _gelu_ref(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gelu_all_five_grads_match_autodiff():
    x, w1, b1, w2, b2 = _inputs(4)
    seed = jnp.zeros(1, jnp.int32)

    def loss_f(args):
        return jnp.sum(jnp.sin(fused_ffn(*args, seed, 0.0, True, True,
                                         "gelu")))

    def loss_r(args):
        return jnp.sum(jnp.sin(_gelu_ref(*args)))

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_f)((x, w1, b1, w2, b2))
        gr = jax.grad(loss_r)((x, w1, b1, w2, b2))
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=5e-4, err_msg=name)


def test_gelu_ln_epilogue_parity():
    """fused_ffn_ln(activation="gelu", ln_eps=1e-12): the BERT FFN half-layer."""
    from fairmultimodal_tpu.ops.fused_ffn import fused_ffn_ln

    x, w1, b1, w2, b2 = _inputs(5)
    rng = np.random.default_rng(6)
    gamma = jnp.asarray(rng.normal(1, 0.05, H), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.05, H), jnp.float32)

    def ref(x, w1, b1, w2, b2, gamma, beta):
        z = x + _gelu_ref(x, w1, b1, w2, b2)
        mu = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.mean((z - mu) ** 2, axis=-1, keepdims=True)
        return (z - mu) * jax.lax.rsqrt(var + 1e-12) * gamma + beta

    with jax.default_matmul_precision("highest"):
        out = fused_ffn_ln(x, w1, b1, w2, b2, gamma, beta,
                           jnp.zeros(2, jnp.int32), 0.0, True, True,
                           "gelu", 1e-12)
        want = ref(x, w1, b1, w2, b2, gamma, beta)
        g_out = jax.grad(lambda a: jnp.sum(jnp.sin(fused_ffn_ln(
            *a, jnp.zeros(2, jnp.int32), 0.0, True, True, "gelu", 1e-12))))(
            (x, w1, b1, w2, b2, gamma, beta))
        g_ref = jax.grad(lambda a: jnp.sum(jnp.sin(ref(*a))))(
            (x, w1, b1, w2, b2, gamma, beta))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=5e-5, atol=5e-5)
    for name, a, b in zip(("dx", "dw1", "db1", "dw2", "db2", "dgamma",
                           "dbeta"), g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-3, err_msg=name)


def test_ln_infer_matches_training_path():
    """fused_ffn_ln_infer == fused_ffn_ln (deterministic): identical math,
    only the backward-only residual stores differ (skipped)."""
    from fairmultimodal_tpu.ops.fused_ffn import fused_ffn_ln, fused_ffn_ln_infer

    x, w1, b1, w2, b2 = _inputs(11)
    gamma, beta = _ln_params(12)
    ref = fused_ffn_ln(x, w1, b1, w2, b2, gamma, beta,
                       jnp.zeros(2, jnp.int32), 0.1, True, True)
    got = fused_ffn_ln_infer(x, w1, b1, w2, b2, gamma, beta, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # gelu flavor (the BERT FFN)
    ref_g = fused_ffn_ln(x, w1, b1, w2, b2, gamma, beta,
                         jnp.zeros(2, jnp.int32), 0.0, True, True,
                         activation="gelu", ln_eps=1e-12)
    got_g = fused_ffn_ln_infer(x, w1, b1, w2, b2, gamma, beta,
                               interpret=True, activation="gelu",
                               ln_eps=1e-12)
    np.testing.assert_array_equal(np.asarray(got_g), np.asarray(ref_g))
