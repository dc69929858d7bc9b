"""Checkpointing via orbax with the reference's rotation semantics.

Replaces flax.training.checkpoints (reference training.py:46-53,
train.py:232): step-numbered checkpoints, keep the newest `keep`, atomic
writes, restore-latest-or-initial.
"""

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(ckpt_dir, keep: int = 2) -> ocp.CheckpointManager:
  options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
  return ocp.CheckpointManager(Path(ckpt_dir).absolute(), options=options)


def save_checkpoint(ckpt_dir, state, step: Optional[int] = None,
                    keep: int = 2) -> str:
  """Saves `state` at `step` (defaults to state.step), keeping `keep` newest."""
  if step is None:
    step = int(jax.device_get(state.step))
  state = jax.device_get(state)
  with _manager(ckpt_dir, keep) as mgr:
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
  return str(Path(ckpt_dir) / str(step))


def latest_checkpoint_step(ckpt_dir) -> Optional[int]:
  ckpt_dir = Path(ckpt_dir)
  if not ckpt_dir.exists():
    return None
  with _manager(ckpt_dir) as mgr:
    return mgr.latest_step()


def restore_checkpoint(ckpt_dir, state: Any) -> Any:
  """Restores the newest checkpoint into the structure of `state`.

  Returns `state` unchanged when no checkpoint exists (parity with
  flax.training.checkpoints.restore_checkpoint).
  """
  step = latest_checkpoint_step(ckpt_dir)
  if step is None:
    return state
  abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                          jax.device_get(state))
  with _manager(ckpt_dir) as mgr:
    return mgr.restore(step, args=ocp.args.StandardRestore(abstract))
