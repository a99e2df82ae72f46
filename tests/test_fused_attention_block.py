"""Parity tests for the attention megakernel (ops/fused_attention_block.py).

All tests run the kernels in the Pallas interpreter on CPU and compare
against the unfused composition (Dense projections + attention_reference +
Dense out-projection) both forward and through jax.grad — covering the
softmax VJP, the head-padding (d=64 -> dp=128), the cross-grid fp32
weight-grad accumulators, and the select-based final-step flush.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairmultimodal_tpu.ops.attention import attention_reference
from fairmultimodal_tpu.ops.fused_attention_block import fused_attention_block

B, S, H, NH = 3, 48, 256, 4  # d = 64 -> padded head dim 128


def _weights(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *shape: jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32)
    return dict(wq=mk(H, H), bq=mk(H), wk=mk(H, H), bk=mk(H),
                wv=mk(H, H), bv=mk(H), wo=mk(H, H), bo=mk(H))


def _x(seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0, 1, (B, S, H)), jnp.float32)


def _ref_block(x, wq, bq, wk, bk, wv, bv, wo, bo, mask):
    b, s, h = x.shape
    d = h // NH

    def heads(w, bb):
        return (x @ w + bb).reshape(b, s, NH, d).transpose(0, 2, 1, 3)

    out = attention_reference(heads(wq, bq), heads(wk, bk), heads(wv, bv), mask)
    return out.transpose(0, 2, 1, 3).reshape(b, s, h) @ wo + bo


@pytest.mark.parametrize("masked", [False, True])
def test_forward_parity(masked):
    x, w = _x(), _weights()
    mask = None
    if masked:
        mask = jnp.asarray(
            np.random.default_rng(2).integers(0, 2, (B, S)), jnp.int32
        ).at[:, 0].set(1)  # every row attends to something
    out = fused_attention_block(x, w["wq"], w["bq"], w["wk"], w["bk"],
                                w["wv"], w["bv"], w["wo"], w["bo"], mask,
                                NH, True)
    ref = _ref_block(x, mask=mask if masked else None, **w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_autodiff():
    x, w = _x(3), _weights(4)
    mask = jnp.ones((B, S), jnp.int32).at[:, -5:].set(0)
    names = ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo")

    def loss_f(x, args):
        return jnp.sum(jnp.sin(fused_attention_block(x, *args, mask, NH, True)))

    def loss_r(x, args):
        return jnp.sum(jnp.sin(_ref_block(x, *args, mask=mask)))

    args = tuple(w[n] for n in names)
    gx_f, gw_f = jax.grad(loss_f, argnums=(0, 1))(x, args)
    gx_r, gw_r = jax.grad(loss_r, argnums=(0, 1))(x, args)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               rtol=5e-5, atol=5e-5, err_msg="dx")
    for n, a, b in zip(names, gw_f, gw_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-4, err_msg=n)


def test_encoder_layer_attn_paths_identical():
    """attn_kernel=True/False on TorchEncoderLayer: same params, same
    deterministic output, matching grads."""
    from fairmultimodal_tpu.models.behrt import TorchEncoderLayer

    x = jnp.asarray(np.random.default_rng(5).normal(0, 1, (2, 32, 256)),
                    jnp.float32)
    mask = jnp.ones((2, 32), jnp.int32).at[:, -7:].set(0)
    m_ref = TorchEncoderLayer(256, 4, ffn_size=384, attn_kernel=False)
    m_fus = TorchEncoderLayer(256, 4, ffn_size=384, attn_kernel=True)
    p1 = m_ref.init(jax.random.PRNGKey(9), x, mask)["params"]
    p2 = m_fus.init(jax.random.PRNGKey(9), x, mask)["params"]
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: bool((a == b).all()), p1, p2))

    y1 = m_ref.apply({"params": p1}, x, mask)
    y2 = m_fus.apply({"params": p1}, x, mask)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-5,
                               atol=2e-5)

    g1 = jax.grad(lambda p: jnp.sum(jnp.sin(m_ref.apply({"params": p}, x, mask))))(p1)
    g2 = jax.grad(lambda p: jnp.sum(jnp.sin(m_fus.apply({"params": p}, x, mask))))(p1)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5,
                                   atol=5e-4, err_msg=str(path))

    jax.tree_util.tree_map_with_path(check, g1, g2)
