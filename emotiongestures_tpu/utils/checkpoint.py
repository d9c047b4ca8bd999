"""Checkpoint save/load (SURVEY.md §5): orbax pytree checkpoints carrying
{params, batch_stats, opt_state, step}; resume-from-latest for failure
recovery (the reference's torch.save/state_dict path is
utils/train_utils.py:149-213).
"""
from __future__ import annotations

import re
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


def _state_tree(state):
    return {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }


def save_checkpoint(state, directory, step: int | None = None,
                    max_to_keep: int | None = 5):
    """Write `checkpoint_iteration{step}` under `directory` (the
    reference's naming, train_...py:197-199), pruning to the newest
    `max_to_keep` checkpoints (None keeps everything)."""
    import shutil

    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    step = int(state.step) if step is None else int(step)
    path = directory / f"checkpoint_iteration{step}"
    if jax.process_count() > 1:
        # multi-host: the tree is already host-local numpy (device_get of
        # replicated arrays), and only the primary calls this — restrict
        # orbax's barrier to the calling process or its cross-process
        # sync waits forever for processes that never save
        from orbax.checkpoint.options import MultiprocessingOptions

        ckptr = ocp.Checkpointer(
            ocp.PyTreeCheckpointHandler(),
            multiprocessing_options=MultiprocessingOptions(
                primary_host=jax.process_index(),
                active_processes={jax.process_index()},
                barrier_sync_key_prefix=f"p{jax.process_index()}"))
    else:
        ckptr = ocp.PyTreeCheckpointer()
    with ckptr:
        ckptr.save(path, _state_tree(state), force=True)
    if max_to_keep is not None:
        steps = sorted(
            int(m.group(1))
            for p in directory.iterdir()
            if (m := re.fullmatch(r"checkpoint_iteration(\d+)", p.name))
        )
        for old in steps[:-max_to_keep]:
            shutil.rmtree(directory / f"checkpoint_iteration{old}",
                          ignore_errors=True)
    return path


def latest_step(directory) -> int | None:
    directory = Path(directory)
    if not directory.exists():
        return None
    steps = []
    for p in directory.iterdir():
        m = re.fullmatch(r"checkpoint_iteration(\d+)", p.name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def load_checkpoint(state, directory, step: int | None = None):
    """Restore into an existing TrainState (resume-from-latest when step
    is None). Returns (state, loaded?). Structure-free restore: params /
    batch_stats / step always load; opt_state loads when its structure
    matches the state's optimizer (otherwise the fresh opt_state is kept
    — e.g. evaluating a checkpoint with a different optimizer config)."""
    import logging

    directory = Path(directory).absolute()
    if step is None:
        step = latest_step(directory)
        if step is None:
            return state, False
    path = directory / f"checkpoint_iteration{step}"
    with ocp.PyTreeCheckpointer() as ckptr:
        raw = ckptr.restore(path)  # nested dicts of numpy arrays

    def graft(template, restored):
        """Map restored leaves onto the template's pytree structure."""
        t_leaves, treedef = jax.tree_util.tree_flatten(template)
        r_leaves = jax.tree_util.tree_leaves(restored)
        if len(t_leaves) != len(r_leaves):
            raise ValueError("leaf count mismatch")
        return jax.tree_util.tree_unflatten(treedef, r_leaves)

    new = state.replace(
        step=int(np.asarray(raw["step"])),
        params=graft(state.params, raw["params"]),
        batch_stats=graft(state.batch_stats, raw["batch_stats"]),
    )
    try:
        new = new.replace(opt_state=graft(state.opt_state,
                                          raw.get("opt_state", {})))
    except ValueError:
        logging.getLogger(__name__).warning(
            "checkpoint opt_state structure mismatch — keeping fresh "
            "optimizer state (params/batch_stats restored)")
    return new, True
