#!/usr/bin/env python
"""Device-profile the bench-geometry FAME train step and decompose it.

Round-3's speed-of-light audit (CLAUDE.md "Device profile") was produced by
hand; this script makes it one command so the residue accounting stays
reproducible: capture ~N steps with ``jax.profiler.trace`` (device-side
self-times are trustworthy over the axon tunnel even though host async
timing is not), then print per-category totals and the top ops per step.

Usage:
    python scripts/profile_step.py [--steps 10] [--batch 256] [--top 40]

Needs the real chip free (two processes cannot share it).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from fairmultimodal_tpu.cachedir import default_compile_cache_dir  # jax-free

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", default_compile_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--labs", type=int, default=549)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None,
                    help="keep the raw trace here (default: temp dir)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fairmultimodal_tpu.models.fusion import FAMEModel
    from fairmultimodal_tpu.train.loop import FAMETrainer, TrainConfig
    from fairmultimodal_tpu.utils.profiling import hlo_self_times, profile_to

    model = FAMEModel(num_ages=4, num_genders=2, num_ethnicities=5,
                      num_insurances=6, lab_token_count=args.labs,
                      dtype=jnp.bfloat16)
    trainer = FAMETrainer(model, TrainConfig(lr=1e-5, batch_size=args.batch),
                          pos_weight=np.ones(3, np.float32))
    rng = np.random.default_rng(0)
    B = args.batch
    batch = {
        "model_inputs": {
            "demo_dummy_ids": jnp.zeros((B, 1), jnp.int32),
            "demo_attn_mask": jnp.ones((B, 1), jnp.int32),
            "age_ids": jnp.asarray(rng.integers(0, 4, B), jnp.int32),
            "gender_ids": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
            "ethnicity_ids": jnp.asarray(rng.integers(0, 5, B), jnp.int32),
            "insurance_ids": jnp.asarray(rng.integers(0, 6, B), jnp.int32),
            "lab_features": jnp.asarray(rng.normal(0, 1, (B, args.labs)),
                                        jnp.float32),
            "text_embedding": jnp.asarray(rng.normal(0, 1, (B, 768)),
                                          jnp.float32),
        },
        "labels": jnp.asarray(rng.integers(0, 2, (B, 3)), jnp.float32),
        "weight": jnp.ones(B, jnp.float32),
    }
    params = trainer.init_params(batch)
    opt_state = trainer.init_opt_state(params)
    dyn_w = jnp.asarray(trainer.dynamic_weights)
    step_rng = jax.random.PRNGKey(0)

    for _ in range(3):   # absorb compile
        params, opt_state, total, _ = trainer._train_step(
            params, opt_state, batch, dyn_w, step_rng)
    jax.block_until_ready(total)

    logdir = args.logdir or tempfile.mkdtemp(prefix="fmtpu_prof_")
    with profile_to(logdir):
        for _ in range(args.steps):
            params, opt_state, total, _ = trainer._train_step(
                params, opt_state, batch, dyn_w, step_rng)
        jax.block_until_ready(total)

    by_cat, by_op = hlo_self_times(logdir)
    n = args.steps
    total_us = sum(by_cat.values())
    print(f"\ndevice self-time: {total_us / n / 1e3:.2f} ms/step "
          f"over {n} steps  (trace: {logdir})")
    print("\nper-category (ms/step):")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {t / n / 1e3:9.3f}  {cat}")
    print(f"\ntop {args.top} ops (ms/step):")
    for op, t in sorted(by_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {t / n / 1e3:9.3f}  {op}")


if __name__ == "__main__":
    main()
