"""Checkpointing: orbax-backed save/restore with keep-N + best-metric policy.

Reference behavior being matched (SURVEY.md §5):
  - mAR-SCF keeps only the best-test-NLL checkpoint (marscf_main.py:362-364);
  - SRFlow keeps the 2 newest + every 10k-multiple (base_model.py:95-110) and
    auto-resumes from the newest training state (utils/util.py:150-162).
"""
from __future__ import annotations

import json
import os
import re
import shutil
import threading
from typing import Any, Optional

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_into(template, flat, prefix=""):
    if isinstance(template, dict):
        return {k: _unflatten_into(v, flat, f"{prefix}{k}/") for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [_unflatten_into(v, flat, f"{prefix}{i}/") for i, v in enumerate(template)]
        if hasattr(template, "_fields"):  # NamedTuple (optax states)
            return type(template)(*seq)
        return type(template)(seq) if isinstance(template, tuple) else seq
    key = prefix[:-1]
    value = flat[key]
    t_shape = getattr(template, "shape", None)
    if t_shape is not None and tuple(value.shape) != tuple(t_shape):
        raise ValueError(
            f"checkpoint leaf '{key}' has shape {tuple(value.shape)} but the "
            f"model expects {tuple(t_shape)} — stale checkpoint for a "
            f"different architecture?")
    return value


@jax.jit
def _copy_leaves(xs):
    return [jax.numpy.copy(x) for x in xs]


class CheckpointManager:
    """npz-based checkpoints (dependency-light, works on any backend).

    Layout: <dir>/step_<N>.npz plus meta.json tracking best metric. Keeps the
    `keep` newest and every multiple of `keep_every`.
    """

    def __init__(self, directory: str, keep: int = 2, keep_every: int = 10000):
        self.dir = directory
        self.keep = keep
        self.keep_every = keep_every
        self._async_thread: Optional[threading.Thread] = None
        self._async_err: Optional[BaseException] = None
        os.makedirs(directory, exist_ok=True)

    def _meta_path(self):
        return os.path.join(self.dir, "meta.json")

    def _load_meta(self):
        if os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                return json.load(f)
        return {"best_metric": None, "best_step": None}

    def _save_meta(self, meta):
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def save(self, step: int, state: Any, metric: Optional[float] = None) -> bool:
        """Saves state; returns True if this is the new best metric (lower=better)."""
        flat = _flatten(jax.device_get(state))
        path = os.path.join(self.dir, f"step_{step}.npz")
        tmp = path + ".tmp.npz"
        np.savez(tmp, **flat)
        os.replace(tmp, path)

        meta = self._load_meta()
        is_best = False
        if metric is not None and np.isfinite(metric):
            if meta["best_metric"] is None or metric < meta["best_metric"]:
                meta["best_metric"] = float(metric)
                meta["best_step"] = step
                shutil.copyfile(path, os.path.join(self.dir, "best.npz"))
                is_best = True
        self._save_meta(meta)
        self._gc()
        return is_best

    def _steps(self):
        steps = []
        for fn in os.listdir(self.dir):
            m = re.fullmatch(r"step_(\d+)\.npz", fn)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def _gc(self):
        steps = self._steps()
        for s in steps[: -self.keep]:
            if self.keep_every and s > 0 and s % self.keep_every == 0:
                continue
            os.remove(os.path.join(self.dir, f"step_{s}.npz"))

    def save_async(self, step: int, state: Any,
                   metric: Optional[float] = None) -> None:
        """Overlapped save: snapshot the device buffers with an on-device
        copy (cheap; also decouples from donated buffers that the next train
        step will overwrite), then pull device->host and write the npz on a
        background thread. Over the remote-TPU tunnel the ~70 MB pull is the
        expensive part — it no longer stalls the train loop
        (docs/BENCHMARKS.md round-2 epoch-boundary collapse).

        One save in flight at a time: a new call joins the previous one
        first (bounds memory; saves are rare).
        """
        self.wait_async()
        # Single jitted dispatch for the snapshot: per-leaf eager copies cost
        # ~seconds each over the axon tunnel (one executable launch instead
        # of ~1k). Non-array leaves pass through unchanged.
        leaves, treedef = jax.tree.flatten(state)
        is_arr = [hasattr(x, "devices") for x in leaves]
        copied = iter(_copy_leaves([x for x, a in zip(leaves, is_arr) if a]))
        snap = jax.tree.unflatten(
            treedef, [next(copied) if a else x
                      for x, a in zip(leaves, is_arr)])

        def worker():
            try:
                self.save(step, snap, metric=metric)
            except BaseException as e:  # surfaced on the next wait_async()
                self._async_err = e

        self._async_thread = threading.Thread(target=worker, daemon=True)
        self._async_thread.start()

    def wait_async(self) -> None:
        """Join the in-flight async save (call before restore/exit)."""
        if self._async_thread is not None:
            self._async_thread.join()
            self._async_thread = None
        if self._async_err is not None:
            err, self._async_err = self._async_err, None
            raise err

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, template: Any, step: Optional[int] = None,
                best: bool = False) -> Any:
        if best:
            path = os.path.join(self.dir, "best.npz")
        else:
            step = self.latest_step() if step is None else step
            assert step is not None, "no checkpoint to restore"
            path = os.path.join(self.dir, f"step_{step}.npz")
        with np.load(path) as data:
            flat = {k: data[k] for k in data.files}
        return _unflatten_into(template, flat)
