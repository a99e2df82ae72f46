"""Random-geometry fuzz for the Pallas megakernels (interpret mode).

The production paths only exercise two geometries (lab encoder S=560/H=768/
d=96, BERT S=512/H=768/d=64).  These tests sweep seeded-random shapes across
the kernels' supported domain — H and F multiples of 128 (the
``can_use_fused_*`` lane-alignment gates), arbitrary rows, any head count
dividing H with d <= 128, S multiples of 16 — so tile-padding and index-map
bugs off the production shapes can't hide (e.g. d=32 pads 4x into the 128
lane stripe; d=128 pads none; odd row counts pad the row-block grid).

Forward AND all grads are compared against the unfused XLA composition for
every sampled geometry, fp32 tight; one bf16 forward sanity case per family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairmultimodal_tpu.ops.attention import attention_reference
from fairmultimodal_tpu.ops.fused_attention_block import (
    fused_attention_block_ln,
)
from fairmultimodal_tpu.ops.fused_ffn import fused_ffn_ln

# (B, S, H, num_heads): d = H/nh in {128, 64, 32, 96, 16}; S from 16..96.
ATTN_GEOMETRIES = [
    (1, 16, 128, 1),    # single head, d == dp == 128 (no padding at all)
    (2, 32, 128, 4),    # d = 32 -> 4x lane padding
    (2, 48, 256, 8),    # d = 32, asymmetric S
    (3, 80, 384, 4),    # d = 96 -> the lab-encoder padding ratio
    (2, 96, 256, 2),    # d = 128 boundary
    (1, 64, 512, 32),   # d = 16 -> extreme 8x padding, many heads
]

# (rows, H, F): rows deliberately off the 512-row block boundaries.
FFN_GEOMETRIES = [
    (1, 128, 128),      # single row, minimal dims
    (7, 128, 512),
    (130, 256, 128),    # F < H (contraction wider than output)
    (300, 384, 256),
    (513, 128, 384),    # one row past a 512-row block
    (64, 512, 512),
]


def _ln(z, gamma, beta, eps=1e-6):
    zz = z.astype(jnp.float32)
    mu = jnp.mean(zz, axis=-1, keepdims=True)
    var = jnp.mean((zz - mu) ** 2, axis=-1, keepdims=True)
    return (zz - mu) * jax.lax.rsqrt(var + eps) * gamma + beta


def _ref_attn_ln(x, wq, bq, wk, bk, wv, bv, wo, bo, gamma, beta, mask, nh):
    b, s, h = x.shape
    d = h // nh

    def heads(w, bb):
        return (x @ w + bb).reshape(b, s, nh, d).transpose(0, 2, 1, 3)

    out = attention_reference(heads(wq, bq), heads(wk, bk), heads(wv, bv),
                              mask)
    attn = out.transpose(0, 2, 1, 3).reshape(b, s, h) @ wo + bo
    return _ln((x + attn).astype(x.dtype), gamma, beta)


def _ref_ffn_ln(x, w1, b1, w2, b2, gamma, beta):
    y = jnp.maximum(x @ w1 + b1, 0.0) @ w2 + b2
    return _ln((x + y).astype(x.dtype), gamma, beta)


@pytest.mark.parametrize("geom", ATTN_GEOMETRIES,
                         ids=[f"B{b}S{s}H{h}nh{n}" for b, s, h, n in
                              ATTN_GEOMETRIES])
def test_attention_ln_fuzz_geometry(geom):
    b, s, h, nh = geom
    rng = np.random.default_rng(hash(geom) % 2**32)
    mk = lambda *shape: jnp.asarray(rng.normal(0, 0.05, shape), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (b, s, h)), jnp.float32)
    w = [mk(h, h), mk(h), mk(h, h), mk(h), mk(h, h), mk(h), mk(h, h), mk(h)]
    gamma = jnp.asarray(1 + rng.normal(0, 0.1, h), jnp.float32)
    beta = mk(h)
    # random key mask, first key always valid so no row is fully masked
    mask = jnp.asarray(rng.integers(0, 2, (b, s)),
                       jnp.int32).at[:, 0].set(1)
    seed = jnp.zeros(1, jnp.int32)

    def loss_f(x, args, gamma, beta):
        return jnp.sum(jnp.sin(fused_attention_block_ln(
            x, *args, gamma, beta, mask, seed, nh, 0.1, True, True)))

    def loss_r(x, args, gamma, beta):
        return jnp.sum(jnp.sin(_ref_attn_ln(x, *args, gamma, beta, mask,
                                            nh)))

    out_f = fused_attention_block_ln(x, *w, gamma, beta, mask, seed, nh,
                                     0.1, True, True)
    out_r = _ref_attn_ln(x, *w, gamma, beta, mask, nh)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=3e-5, atol=3e-5)

    gf = jax.grad(loss_f, argnums=(0, 1, 2, 3))(x, tuple(w), gamma, beta)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, tuple(w), gamma, beta)
    names = ("dx", "dw", "dgamma", "dbeta")
    for name, a, r in zip(names, gf, gr):
        for leaf_a, leaf_r in zip(jax.tree_util.tree_leaves(a),
                                  jax.tree_util.tree_leaves(r)):
            np.testing.assert_allclose(
                np.asarray(leaf_a), np.asarray(leaf_r), rtol=5e-5, atol=5e-4,
                err_msg=f"{geom} {name}")


@pytest.mark.parametrize("geom", FFN_GEOMETRIES,
                         ids=[f"R{r}H{h}F{f}" for r, h, f in FFN_GEOMETRIES])
def test_ffn_ln_fuzz_geometry(geom):
    r, h, f = geom
    rng = np.random.default_rng(hash(geom) % 2**32)
    x = jnp.asarray(rng.normal(0, 1, (r, h)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (h, f)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.05, f), jnp.float32)
    w2 = jnp.asarray(rng.normal(0, 0.05, (f, h)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    gamma = jnp.asarray(1 + rng.normal(0, 0.1, h), jnp.float32)
    beta = jnp.asarray(rng.normal(0, 0.05, h), jnp.float32)
    seed = jnp.zeros(2, jnp.int32)

    out_f = fused_ffn_ln(x, w1, b1, w2, b2, gamma, beta, seed, 0.1, True,
                         True)
    out_r = _ref_ffn_ln(x, w1, b1, w2, b2, gamma, beta)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=3e-5, atol=3e-5)

    def loss_f(args):
        return jnp.sum(jnp.sin(fused_ffn_ln(*args, seed, 0.1, True, True)))

    def loss_r(args):
        return jnp.sum(jnp.sin(_ref_ffn_ln(*args)))

    args = (x, w1, b1, w2, b2, gamma, beta)
    gf = jax.grad(loss_f)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, rr in zip(("dx", "dw1", "db1", "dw2", "db2", "dgamma",
                            "dbeta"), gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(rr), rtol=5e-5,
                                   atol=5e-4, err_msg=f"{geom} {name}")


def test_attention_ln_fuzz_bf16_forward():
    b, s, h, nh = 2, 32, 256, 4
    rng = np.random.default_rng(0)
    mk = lambda *shape: jnp.asarray(rng.normal(0, 0.05, shape), jnp.bfloat16)
    x = jnp.asarray(rng.normal(0, 1, (b, s, h)), jnp.bfloat16)
    w = [mk(h, h), mk(h), mk(h, h), mk(h), mk(h, h), mk(h), mk(h, h), mk(h)]
    gamma = jnp.ones(h, jnp.bfloat16)
    beta = jnp.zeros(h, jnp.bfloat16)
    out_f = fused_attention_block_ln(x, *w, gamma, beta, None,
                                     jnp.zeros(1, jnp.int32), nh, 0.1, True,
                                     True)
    out_r = _ref_attn_ln(x, *w, gamma, beta, None, nh)
    assert out_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_r, np.float32),
                               rtol=0.05, atol=0.05)


def test_ffn_ln_fuzz_bf16_forward():
    r, h, f = 48, 128, 256
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (r, h)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(0, 0.05, (h, f)), jnp.bfloat16)
    b1 = jnp.asarray(rng.normal(0, 0.05, f), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(0, 0.05, (f, h)), jnp.bfloat16)
    b2 = jnp.asarray(rng.normal(0, 0.05, h), jnp.bfloat16)
    gamma = jnp.ones(h, jnp.bfloat16)
    beta = jnp.zeros(h, jnp.bfloat16)
    out_f = fused_ffn_ln(x, w1, b1, w2, b2, gamma, beta,
                         jnp.zeros(2, jnp.int32), 0.1, True, True)
    out_r = _ref_ffn_ln(x, w1, b1, w2, b2, gamma, beta)
    assert out_f.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_r, np.float32),
                               rtol=0.05, atol=0.05)
