"""Benchmark: FAME fusion fwd+bwd throughput (patients/sec/chip).

Measures the full jitted training step (forward + BCE+L_EDDI+L1 loss +
backward + AdamW update) of the reference-geometry FAMEModel — 768-hidden
12L/12H demo-BERT, 2L/8H lab encoder over 549 lab-bin tokens, 768-d frozen
text embeddings — in bfloat16 on the available accelerator.

Measured progression on a single v5e chip (batch 256, bf16): 1047 p/s with
XLA attention -> 1202 with the Pallas fused-attention path -> ~1700 with
hardware-RBG dropout keys -> ~1790 with whole-S q blocks -> ~2000 with
16-granular sequence padding (549 lab bins -> 560 instead of 640).

Baseline: the reference (PyTorch, fp32, batch 16) publishes no throughput
numbers (BASELINE.json ``published: {}``), so ``vs_baseline`` is computed
against an estimated single-A100 eager-PyTorch throughput of the same model:
~42.5 GFLOPs/patient fwd+bwd at ~20% TF32 MFU (~31 TF/s effective) ->
~730 patients/sec.  The estimate and its derivation are fixed here so the
ratio is comparable across rounds.
"""

import json
import os
import time

# Persistent XLA compilation cache: repeat bench runs skip the multi-minute
# first compile (especially costly through the axon TPU tunnel).
from fairmultimodal_tpu.cachedir import default_compile_cache_dir  # jax-free import

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", default_compile_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import numpy as np

A100_BASELINE_PATIENTS_PER_SEC = 730.0  # documented estimate, see module docstring

LABS = 549
BATCH = int(os.environ.get("BENCH_BATCH", "256"))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from fairmultimodal_tpu.models.fusion import FAMEModel
    from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig

    model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                      num_insurances=6, lab_token_count=LABS,
                      dtype=jnp.bfloat16)
    cfg = TrainConfig(lr=1e-5, batch_size=BATCH)
    trainer = FAMETrainer(model, cfg, pos_weight=np.ones(3, np.float32))

    rng = np.random.default_rng(0)
    batch = {
        "model_inputs": {
            "demo_dummy_ids": jnp.zeros((BATCH, 1), jnp.int32),
            "demo_attn_mask": jnp.ones((BATCH, 1), jnp.int32),
            "age_ids": jnp.asarray(rng.integers(0, 4, BATCH), jnp.int32),
            "gender_ids": jnp.asarray(rng.integers(0, 2, BATCH), jnp.int32),
            "ethnicity_ids": jnp.asarray(rng.integers(0, 5, BATCH), jnp.int32),
            "insurance_ids": jnp.asarray(rng.integers(0, 6, BATCH), jnp.int32),
            "lab_features": jnp.asarray(rng.normal(0, 1, (BATCH, LABS)), jnp.float32),
            "text_embedding": jnp.asarray(rng.normal(0, 1, (BATCH, 768)), jnp.float32),
        },
        "labels": jnp.asarray(rng.integers(0, 2, (BATCH, 3)), jnp.float32),
        "weight": jnp.ones(BATCH, jnp.float32),
    }
    params = trainer.init_params(batch)
    opt_state = trainer.init_opt_state(params)
    dyn_w = jnp.asarray(trainer.dynamic_weights)
    step_rng = jax.random.PRNGKey(0)

    # Warmup / compile.
    for _ in range(3):
        params, opt_state, total, _ = trainer._train_step(
            params, opt_state, batch, dyn_w, step_rng)
    jax.block_until_ready(total)

    # Best of two timed windows: the tunnel occasionally stalls a window
    # (observed one 20x-slow outlier); steady-state throughput is the max.
    iters = 20
    best_dt = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, total, _ = trainer._train_step(
                params, opt_state, batch, dyn_w, step_rng)
        jax.block_until_ready(total)
        best_dt = min(best_dt, time.perf_counter() - t0)
    dt = best_dt

    pps = BATCH * iters / dt
    n_chips = jax.device_count()
    pps_chip = pps / n_chips

    # Estimated MFU so progress is tracked against physics, not only the
    # estimated-A100 ratio.  FLOPs per step from the compiled HLO when the
    # backend exposes a cost analysis; analytic fallback otherwise
    # (42.5 GFLOP/patient, derivation in the module docstring).
    try:
        cost = trainer._train_step.lower(
            params, opt_state, batch, dyn_w, step_rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost["flops"])
    except Exception:
        flops_per_step = 42.5e9 * BATCH
    # Peak dense bf16 throughput of the chip actually benched.
    peak = {"v5e": 197e12, "v5litepod": 197e12, "v5p": 459e12,
            "v4": 275e12, "v6e": 918e12}
    kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    peak_flops = next((v for k, v in peak.items() if k in kind), 197e12)
    mfu = (flops_per_step * iters / dt) / (n_chips * peak_flops)

    print(json.dumps({
        "metric": "fame_fusion_train_patients_per_sec_per_chip",
        "value": round(pps_chip, 2),
        "unit": "patients/sec/chip",
        "vs_baseline": round(pps_chip / A100_BASELINE_PATIENTS_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "flops_per_step": flops_per_step,
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
