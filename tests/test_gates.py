"""Kernel-path gate: env knob, process-level force, and the mixed-mesh
auto-fallback (decision record in ops/gates.py)."""

from __future__ import annotations

import warnings

import jax
import numpy as np
import pytest

from fairmultimodal_tpu.ops import gates


@pytest.fixture(autouse=True)
def _reset_force():
    before = gates.forced_xla_reason()
    yield
    gates._FORCE_XLA_REASON = before


def test_env_knob_and_force(monkeypatch):
    monkeypatch.delenv("FMTPU_KERNELS", raising=False)
    gates._FORCE_XLA_REASON = None
    assert gates.kernels_enabled()
    monkeypatch.setenv("FMTPU_KERNELS", "0")
    assert not gates.kernels_enabled()
    monkeypatch.delenv("FMTPU_KERNELS")
    gates.force_xla_path("test reason")
    assert not gates.kernels_enabled()
    assert gates.forced_xla_reason() == "test reason"
    # Public reset (advisor r4): later single-chip/pure-DP trainers in the
    # same process can regain the kernels.
    gates.clear_forced_xla_path()
    assert gates.forced_xla_reason() is None
    assert gates.kernels_enabled()
    # The env override is independent of the forced path.
    monkeypatch.setenv("FMTPU_KERNELS", "0")
    gates.clear_forced_xla_path()
    assert not gates.kernels_enabled()


def test_mixed_mesh_on_tpu_auto_disables_kernels(monkeypatch):
    """On a TPU backend, constructing a mixed data×model trainer must warn
    and flip the process to the XLA layer path; pure-DP must NOT."""
    from fairmultimodal_tpu.models.fusion import FAMEModel
    from fairmultimodal_tpu.parallel.sharding import get_mesh
    from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    gates._FORCE_XLA_REASON = None

    def make(mesh):
        model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                          num_insurances=6, lab_token_count=6,
                          text_embed_size=16, hidden_size=16, demo_layers=1,
                          demo_heads=2, lab_layers=1, lab_heads=2,
                          fusion_hidden=8)
        return FAMETrainer(model, TrainConfig(rng_impl="threefry",
                                              batch_size=16),
                           np.ones(3), mesh=mesh)

    # Pure-DP: no mixed-mesh warning, kernels stay enabled.
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        make(get_mesh(data=8, model=1))
    assert not [w for w in caught if "mixed data×model" in str(w.message)]
    assert gates.forced_xla_reason() is None

    # Mixed: warning + forced XLA path for the process.
    with pytest.warns(UserWarning, match="mixed data×model"):
        make(get_mesh(data=4, model=2))
    assert gates.forced_xla_reason() is not None
    assert not gates.kernels_enabled()
