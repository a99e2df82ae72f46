"""Pallas fused attention parity tests (interpret mode on CPU).

The same kernels run compiled on TPU; interpret mode executes identical
kernel code through the Pallas interpreter so CI without a TPU still checks
the math (forward + all three gradients) against the XLA reference path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fairmultimodal_tpu.ops.attention import attention_reference
from fairmultimodal_tpu.ops.flash_attention import flash_attention


@pytest.fixture(scope="module")
def qkvm():
    rng = np.random.default_rng(0)
    B, H, S, D = 2, 2, 128, 32
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, H, S, D)).astype(np.float32))
               for _ in range(3))
    mask = jnp.asarray((rng.random((B, S)) > 0.25).astype(np.int32))
    return q, k, v, mask


def test_forward_parity(qkvm):
    q, k, v, mask = qkvm
    out = flash_attention(q, k, v, mask, True)
    ref = attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_forward_no_mask(qkvm):
    q, k, v, _ = qkvm
    out = flash_attention(q, k, v, None, True)
    ref = attention_reference(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("wrt", [0, 1, 2])
def test_gradient_parity(qkvm, wrt):
    q, k, v, mask = qkvm
    args = [q, k, v]

    def f_flash(x):
        a = [x if i == wrt else args[i] for i in range(3)]
        return jnp.sum(jnp.sin(flash_attention(*a, mask, True)))

    def f_ref(x):
        a = [x if i == wrt else args[i] for i in range(3)]
        return jnp.sum(jnp.sin(attention_reference(*a, mask)))

    g1 = jax.grad(f_flash)(args[wrt])
    g2 = jax.grad(f_ref)(args[wrt])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=5e-4, rtol=5e-4)


def test_bf16_inputs(qkvm):
    q, k, v, mask = qkvm
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, mask, True)
    assert out.dtype == jnp.bfloat16
    ref = attention_reference(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_unsupported_sequence_length_raises():
    """S > 1024 breaks the single-K/V-tile VMEM contract (the backward has
    no q-blocking); flash_attention must refuse instead of compiling an
    OOM-prone kernel."""
    B, H, S, D = 1, 1, 1040, 32
    q = jnp.zeros((B, H, S, D), jnp.float32)
    with pytest.raises(ValueError, match="1024"):
        flash_attention(q, q, q, None, True)
