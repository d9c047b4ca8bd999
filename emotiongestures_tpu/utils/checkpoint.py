"""Checkpoint save/load (SURVEY.md §5): orbax pytree checkpoints carrying
{params, batch_stats, opt_state, step}; resume-from-latest plus
preemption-safe non-blocking saves (AsyncSaver + GracefulShutdown) for
failure recovery (the reference's torch.save/state_dict path is
utils/train_utils.py:149-213; it has no recovery story at all).
"""
from __future__ import annotations

import re
import signal
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp


# Directories this process holds the writer lock for (released atexit).
_HELD_LOCKS: set = set()


def _proc_start_token(pid: int) -> str | None:
    """Kernel start-time of `pid` (clock ticks since boot, field 22 of
    /proc/<pid>/stat) — distinguishes a recycled pid from the original
    holder process. None when unreadable (non-linux, process gone)."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        # comm (field 2) may contain spaces/parens; split after its ")"
        return stat.rsplit(")", 1)[1].split()[19]
    except (OSError, IndexError):
        return None


def _parse_lock(content: bytes) -> tuple[int, str]:
    """Lock file layout: b"<pid>" (legacy) or b"<pid>:<start_token>"."""
    text = content.decode(errors="replace").strip()
    pid_s, _, token = text.partition(":")
    try:
        return int(pid_s or "0"), token
    except ValueError:
        return 0, ""


def _holder_alive(pid: int, token: str) -> bool:
    import os

    if pid <= 0 or pid == os.getpid():
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        pass  # exists, owned by someone else
    if token:
        now = _proc_start_token(pid)
        if now is not None and now != token:
            return False  # pid recycled since the lock was written
    return True


def _acquire_writer_lock(directory: Path) -> None:
    """One writer process per checkpoint directory. Two trainers sharing
    a directory silently destroy each other's work through max_to_keep
    pruning — the round-4 flagship rehearsal lost its only
    iteration-3200 skeleton checkpoint to exactly this (a second run's
    prune deleted the first run's save). The lock file holds the writer
    pid plus its /proc start-time token (so a recycled pid cannot make a
    dead trainer look live and block a legitimate resume-after-crash);
    a stale lock is reclaimed silently, and the reclaim is read back to
    verify THIS process won it before proceeding (two racing reclaimers
    would otherwise both become writers — ADVICE r4). Best-effort and
    per-host: multi-host runs save from the primary process only, so
    cross-host pid collisions cannot occur on the happy path."""
    import atexit
    import os

    directory = Path(directory)
    lock = directory / ".egtp_writer.lock"
    token = _proc_start_token(os.getpid())
    me = (f"{os.getpid()}:{token}" if token else str(os.getpid())).encode()
    if directory in _HELD_LOCKS:
        if not lock.exists():  # dir was rmtree'd (e.g. plateau reseed)
            lock.write_bytes(me)
        return
    for _ in range(8):
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
            with os.fdopen(fd, "wb") as f:
                f.write(me)
            break
        except FileExistsError:
            try:
                holder, h_token = _parse_lock(lock.read_bytes())
            except OSError:
                continue  # lock vanished mid-read; retry acquisition
            if _holder_alive(holder, h_token):
                raise RuntimeError(
                    f"checkpoint directory {directory} is being written by "
                    f"another live trainer (pid {holder}); concurrent "
                    f"writers prune each other's checkpoints (max_to_keep) "
                    f"— point the second run at its own --model_save_path, "
                    f"or remove {lock} if the holder is not a trainer")
            # stale (crashed writer) — reclaim, then VERIFY we won: a
            # concurrent reclaimer's os.replace may have landed after ours
            tmp = directory / f".egtp_writer.lock.tmp-{os.getpid()}"
            tmp.write_bytes(me)
            os.replace(tmp, lock)
            try:
                if lock.read_bytes() == me:
                    break
            except OSError:
                pass  # lost the race; loop re-checks the winner
    else:
        raise RuntimeError(
            f"could not acquire checkpoint writer lock {lock} after "
            f"repeated reclaim races — another trainer is contending")
    _HELD_LOCKS.add(directory)
    atexit.register(_release_writer_lock, directory)


def _release_writer_lock(directory: Path) -> None:
    import os

    directory = Path(directory)
    if directory not in _HELD_LOCKS:
        return
    _HELD_LOCKS.discard(directory)
    lock = directory / ".egtp_writer.lock"
    try:
        if _parse_lock(lock.read_bytes())[0] == os.getpid():
            lock.unlink()
    except OSError:
        pass


def _state_tree(state):
    return {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
    }


def _write_tree(tree, directory: Path, step: int,
                max_to_keep: int | None):
    """Serialize an already-host-local tree to
    `directory/checkpoint_iteration{step}` and prune old checkpoints.
    Crash-safe: orbax stages into a `...orbax-checkpoint-tmp-*` dir and
    renames on commit, and `latest_step`'s fullmatch regex never sees the
    staging name — a kill mid-write is invisible to resume."""
    import shutil

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
        ckptr.save(path, tree, force=True)
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


def save_checkpoint(state, directory, step: int | None = None,
                    max_to_keep: int | None = 5):
    """Write `checkpoint_iteration{step}` under `directory` (the
    reference's naming, train_...py:197-199), pruning to the newest
    `max_to_keep` checkpoints (None keeps everything). Blocking; for
    in-train-loop saves prefer AsyncSaver."""
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    _acquire_writer_lock(directory)
    step = int(state.step) if step is None else int(step)
    return _write_tree(_state_tree(state), directory, step, max_to_keep)


class AsyncSaver:
    """Non-blocking checkpoint writer for train loops (SURVEY §5
    failure-recovery: the TPU-native equivalent of a DataLoader-era
    torch.save is a save that does not stall the device).

    Split of work: the device->host fetch (`_state_tree`) runs on the
    CALLING thread — the train steps donate their input states
    (train/gan.py:143), so the buffers must be read before the next step
    dispatches — while orbax serialization, disk write, and pruning run
    on a single background worker. One save is in flight at a time; a
    new save (or `wait()`/`close()`) surfaces any error from the
    previous one.

    Usage:
        saver = AsyncSaver()
        ...
        saver.save(state, ckpt_dir)        # returns after D2H copy
        ...
        saver.close()                      # final barrier at exit
    """

    def __init__(self):
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="egtp-ckpt")
        self._pending = None

    def save(self, state, directory, step: int | None = None,
             max_to_keep: int | None = 5):
        directory = Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        _acquire_writer_lock(directory)
        step = int(state.step) if step is None else int(step)
        tree = _state_tree(state)  # D2H now — buffers die at next step
        self.wait()
        self._pending = self._executor.submit(
            _write_tree, tree, directory, step, max_to_keep)

    def wait(self):
        """Block until the in-flight save (if any) committed; re-raises
        its exception here if it failed."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def close(self):
        self.wait()
        self._executor.shutdown()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class GracefulShutdown:
    """SIGTERM/SIGINT -> a flag the train loop polls at step boundaries
    (SURVEY §5: TPU pods get preempted; the preemption notice is a
    SIGTERM). The loop saves a final checkpoint and exits cleanly instead
    of dying mid-write. Second signal: default behavior (hard kill) —
    the handler uninstalls itself, so a stuck save can still be killed.

    Usage:
        with GracefulShutdown() as stop:
            for epoch ...:
                for batch ...:
                    if stop.requested: break
                    ...
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._previous = {}
        self._event = threading.Event()

    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def _handler(self, signum, frame):
        self._event.set()
        # restore default so a second signal kills immediately
        signal.signal(signum, self._previous.get(signum, signal.SIG_DFL))

    def __enter__(self):
        for s in self._signals:
            try:
                self._previous[s] = signal.signal(s, self._handler)
            except ValueError:  # not the main thread (tests)
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            try:
                if signal.getsignal(s) == self._handler:
                    signal.signal(s, prev)
            except ValueError:
                pass
        return False


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
