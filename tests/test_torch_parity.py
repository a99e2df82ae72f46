"""Numerical parity against torch for the remaining reference building
blocks: nn.TransformerEncoderLayer (the lab encoder core, 10_FAME.py:214),
BCEWithLogitsLoss(pos_weight), FocalLoss, and ReduceLROnPlateau semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from fairmultimodal_tpu.models.behrt import TorchEncoderLayer  # noqa: E402
from fairmultimodal_tpu.ops.losses import bce_with_logits, focal_loss  # noqa: E402
from fairmultimodal_tpu.train.loop import PlateauScheduler  # noqa: E402


def test_encoder_layer_matches_torch():
    H, NH, FFN = 16, 4, 32
    torch.manual_seed(0)
    ref = torch.nn.TransformerEncoderLayer(H, NH, dim_feedforward=FFN,
                                           batch_first=True)
    ref.eval()

    sd = {k: np.asarray(v.detach()) for k, v in ref.state_dict().items()}
    w_in = sd["self_attn.in_proj_weight"]          # [3H, H]
    b_in = sd["self_attn.in_proj_bias"]            # [3H]
    params = {
        "query": {"kernel": w_in[:H].T, "bias": b_in[:H]},
        "key": {"kernel": w_in[H:2 * H].T, "bias": b_in[H:2 * H]},
        "value": {"kernel": w_in[2 * H:].T, "bias": b_in[2 * H:]},
        "attn_out": {"kernel": sd["self_attn.out_proj.weight"].T,
                     "bias": sd["self_attn.out_proj.bias"]},
        "ffn_in": {"kernel": sd["linear1.weight"].T, "bias": sd["linear1.bias"]},
        "ffn_out": {"kernel": sd["linear2.weight"].T, "bias": sd["linear2.bias"]},
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
    }

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 6, H)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()

    layer = TorchEncoderLayer(H, NH, ffn_size=FFN)
    out = layer.apply({"params": params}, jnp.asarray(x), None,
                      deterministic=True)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5, rtol=2e-5)


def test_bce_with_logits_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(0, 2, (16, 3)).astype(np.float32)
    labels = rng.integers(0, 2, (16, 3)).astype(np.float32)
    pw = np.array([2.0, 0.5, 7.3], np.float32)
    ref = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pw))(
        torch.tensor(logits), torch.tensor(labels)).item()
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels),
                                 pos_weight=jnp.asarray(pw)))
    assert ours == pytest.approx(ref, abs=1e-6)


def test_focal_loss_matches_reference_formula():
    """((1 - e^{-BCE})^g)*BCE with torch BCE as the oracle (02:18-39)."""
    rng = np.random.default_rng(2)
    logits = rng.normal(0, 2, (8, 3)).astype(np.float32)
    labels = rng.integers(0, 2, (8, 3)).astype(np.float32)
    bce = torch.nn.BCEWithLogitsLoss(reduction="none")(
        torch.tensor(logits), torch.tensor(labels))
    ref = (((1 - torch.exp(-bce)) ** 2.0) * bce).mean().item()
    ours = float(focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0))
    assert ours == pytest.approx(ref, abs=1e-6)


def test_plateau_scheduler_matches_torch():
    torch.manual_seed(0)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=1.0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, mode="min",
                                                     factor=0.1, patience=2)
    ours = PlateauScheduler(lr=1.0, factor=0.1, patience=2)
    losses = [1.0, 0.9, 0.95, 0.95, 0.95, 0.95, 0.85, 0.86, 0.86, 0.86, 0.86]
    for loss in losses:
        ref.step(loss)
        lr_ours = ours.step(loss)
        lr_ref = opt.param_groups[0]["lr"]
        assert lr_ours == pytest.approx(lr_ref), (loss, lr_ours, lr_ref)
