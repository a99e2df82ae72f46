"""Debug utilities (SURVEY §5: replaces the reference's NaN-batch skipping,
01_BEHRT.py:227-229, with device-side checking).

- :func:`enable_nan_checks` — flips ``jax_debug_nans`` so any NaN produced
  inside a jitted computation raises at the exact primitive.
- :func:`check_finite_tree` — host-side assertion over a pytree (params or
  grads); returns the offending paths instead of silently training on NaNs.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

__all__ = ["enable_nan_checks", "check_finite_tree"]


def enable_nan_checks(enabled: bool = True) -> None:
    jax.config.update("jax_debug_nans", enabled)


def check_finite_tree(tree, name: str = "tree") -> List[str]:
    """Return the list of paths holding non-finite values (empty = clean)."""
    bad: List[str] = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            continue
        if not bool(jnp.isfinite(leaf).all()):
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in path)
            bad.append(f"{name}/{key}")
    return bad
