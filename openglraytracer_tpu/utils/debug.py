"""Numerical-safety tooling — the build's analog of sanitizers/race detection.

The reference needs no sanitizers (disjoint per-pixel writes; SURVEY.md §5)
and leans on IEEE-inf semantics for degenerate slab divisions. Here every
division/sqrt is eps-guarded in the kernels themselves; this module adds:

  * ``checked_render`` — a checkify-wrapped render that turns NaN/inf
    production into reported errors instead of silent garbage pixels,
  * ``assert_finite_tree`` — debug assertion for gradients/params.

Use in development / CI; the production path stays guard-based (branch-free).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from openglraytracer_tpu.ops.render import render


def checked_render(scene, camera, height, width, **kwargs):
    """Render with float checks; returns (error, image). error.throw() raises
    if any NaN/inf was produced anywhere in the pipeline."""
    def fn(scene, camera):
        return render(scene, camera, height, width, **kwargs)

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    return checked(scene, camera)


def assert_finite_tree(tree, name: str = "tree") -> None:
    """Host-side finite check over every float leaf (for grads/params)."""
    import numpy as np
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}")
