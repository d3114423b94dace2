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

import jax
import numpy as np

log = logging.getLogger(__name__)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the JAX multi-host runtime. No-op when single-process or
    already initialized. On TPU pods with the standard environment, all
    arguments auto-detect."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is not None:
            jax.distributed.initialize(coordinator_address=coordinator_address,
                                       num_processes=num_processes,
                                       process_id=process_id)
        elif num_processes is not None:
            jax.distributed.initialize()
    except (RuntimeError, ValueError) as e:  # single-host dev loop
        log.warning("jax.distributed.initialize skipped: %s", e)


def gather_image(image) -> np.ndarray:
    """Assemble a (possibly multi-host sharded) image on every host as numpy.

    Single-host arrays (even sharded over local devices) are fully addressable
    and transfer directly; multi-host arrays go through a DCN allgather.
    """
    if jax.process_count() == 1 or image.is_fully_addressable:
        return np.asarray(image)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(image, tiled=True))
