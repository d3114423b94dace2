"""Multi-host runtime: initialization and host-side image gather.

The reference's 'distributed backend' is the single-GPU GL command queue
(main.cpp:223-238). The TPU-native equivalent (SURVEY.md §5):
``jax.distributed.initialize()`` for the multi-host coordinator, XLA
collectives over ICI/DCN inside jitted code, and a DCN process_allgather to
assemble the final image on host 0 (the analog of the fragment-shader blit +
swapchain, draw_screen_frag.glsl + main.cpp:243-260).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

log = logging.getLogger(__name__)


def _already_initialized() -> bool:
    # Prefer the public API (ADVICE r2: the private global_state moved once
    # already); fall back to the private attribute, then to process_count.
    if hasattr(jax.distributed, "is_initialized"):
        try:
            return bool(jax.distributed.is_initialized())
        except Exception:
            pass
    try:
        from jax._src import distributed
        return distributed.global_state.client is not None
    except Exception:
        return jax.process_count() > 1


def _pod_environment() -> bool:
    """True when the standard multi-host environment variables are present:
    a coordinator address set by the launcher, or a Cloud TPU pod worker
    hostname list with more than one worker."""
    if any(os.environ.get(k) for k in ("COORDINATOR_ADDRESS",
                                       "JAX_COORDINATOR_ADDRESS",
                                       "MEGASCALE_COORDINATOR_ADDRESS")):
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h]) > 1


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the JAX multi-host runtime.

    Explicit arguments initialize unconditionally (errors propagate — a
    mis-specified cluster must never silently fall back to single-process).
    With no arguments, a standard pod environment (coordinator env var set,
    or a multi-worker TPU hostname list) auto-initializes via JAX's own
    detection; a plain single-host dev loop stays single-process. No-op if
    already initialized.
    """
    if _already_initialized():
        return
    if coordinator_address is not None or num_processes is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return
    if _pod_environment():
        jax.distributed.initialize()  # all arguments auto-detect
        log.info("jax.distributed initialized: process %d/%d",
                 jax.process_index(), jax.process_count())


def gather_image(image) -> np.ndarray:
    """Assemble a (possibly multi-host sharded) image on every host as numpy.

    Single-host arrays (even sharded over local devices) are fully addressable
    and transfer directly; multi-host arrays go through a DCN allgather.
    """
    if jax.process_count() == 1 or image.is_fully_addressable:
        return np.asarray(image)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(image, tiled=True))
