"""Structured metrics/logging + render timing.

The reference's observability is cout'd shader logs and nothing else
(SURVEY.md §5); here: JSONL metrics (step, loss, Mrays/s), and
block_until_ready-bracketed wall timers for honest device timings.
"""

from __future__ import annotations

import json
import logging
import sys
import time

import jax

log = logging.getLogger("openglraytracer_tpu")


class MetricsLogger:
    """Emit one JSON object per event to stderr (and optionally a file)."""

    def __init__(self, name: str, path: str | None = None):
        self.name = name
        self._fh = open(path, "a") if path else None

    def log(self, **kv):
        rec = {"name": self.name, "t": time.time(), **kv}
        line = json.dumps(rec)
        print(line, file=sys.stderr)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()


def time_fn(fn, *args, warmup: int = 2, iters: int = 5):
    """Median wall time of fn(*args) with jax.block_until_ready around each
    call (the honest replacement for the reference's vsync-masked frame
    times, main.cpp:76)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def rays_per_frame(height: int, width: int, n_lights: int, depth: int = 0,
                   mirror_only: bool = False,
                   shadow_lights: tuple | None = None,
                   bounce_mask: tuple | None = None):
    """Primary + shadow ray count per frame, matching what the renderer
    actually casts (BASELINE.md's accounting for the reference):

      * full reflection+refraction tree: 2^(depth+1) - 1 casts per pixel
      * mirror_only (trace_rays_mirror / stack-free chain): depth + 1 casts
      * each cast spawns one shadow segment per SHADOW-CASTING light —
        lights statically elided by shading.static_shadow_mask
        (``shadow_lights[i] is False``) never cast and are not charged;
      * bounce subtrees statically elided by shading.static_bounce_mask
        (``bounce_mask``, (has_refl, has_refr)) aren't cast or charged
        either: one live branch = depth + 1 chain casts, none = 1.
    """
    if mirror_only:
        casts = depth + 1
    elif bounce_mask is not None and not all(bounce_mask):
        casts = (depth + 1) if any(bounce_mask) else 1
    else:
        casts = 2 ** (depth + 1) - 1
    casting = (sum(map(bool, shadow_lights)) if shadow_lights is not None
               else n_lights)
    return height * width * casts * (1 + casting)
