"""Orbax checkpointing for the inverse-rendering fit (params + optimizer
state + step). The forward renderer itself needs no checkpoints — it is a pure
function of (scene, time), preserving the reference's statelessness
(SURVEY.md §5)."""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)


def _manager(directory: str):
    import orbax.checkpoint as ocp
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save(directory: str, state, step: int) -> None:
    import orbax.checkpoint as ocp
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()


def restore_latest(directory: str, abstract_state):
    """Restore the newest checkpoint, or None if none exists."""
    import orbax.checkpoint as ocp
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    if step is None:
        return None
    restored = mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))
    log.info("restored checkpoint step %d from %s", step, directory)
    return restored
