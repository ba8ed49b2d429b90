"""Orbax checkpoint store: top-k on val loss + always-latest + auto-resume.

TPU-native equivalent of the reference's Lightning ModelCheckpoint pair
(`/root/reference/train.py:90-101`: top-3 on `loss/val` + save_last) and its
newest-checkpoint auto-resume (`train.py:10-43`).
"""

import json
import shutil
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointStore:
    def __init__(self, root: str, keep_top_k: int = 3):
        self.root = Path(root).resolve()
        self.root.mkdir(parents=True, exist_ok=True)
        self.keep_top_k = keep_top_k
        self._ckptr = ocp.StandardCheckpointer()
        self._index_path = self.root / "index.json"
        self._index = self._load_index()

    def _load_index(self):
        if self._index_path.exists():
            return json.loads(self._index_path.read_text())
        return {"entries": []}  # list of {step, epoch, val_loss, path}

    def _write_index(self):
        # atomic: a concurrent reader (another host on a shared FS) must never see
        # a half-written index
        tmp = self._index_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(self._index, indent=1))
        tmp.replace(self._index_path)

    def save(self, step: int, epoch: int, params: Any, opt_state: Any, val_loss: float):
        """Save a checkpoint. Multi-host: EVERY process must call this (Orbax
        coordinates the distributed write and barriers internally). The index is
        OWNED by process 0: only rank 0 appends/GCs/writes it — non-primary ranks'
        in-memory copies stay frozen at the last `_load_index()` (they only consult
        the index at startup, for the collective resume restore, where all ranks
        read the same on-disk file)."""
        path = self.root / f"step_{step:09d}"
        primary = jax.process_index() == 0
        if primary and path.exists():
            shutil.rmtree(path)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_pre_save_{step}")
        self._ckptr.save(path, {"params": params, "opt_state": opt_state})
        self._ckptr.wait_until_finished()
        if primary:
            self._index["entries"].append(
                {"step": step, "epoch": epoch, "val_loss": float(val_loss),
                 "path": str(path)}
            )
            self._gc()
            self._write_index()

    def _gc(self):
        """Keep the top-k by val loss plus the most recent entry."""
        entries = self._index["entries"]
        if not entries:
            return
        latest = max(entries, key=lambda e: e["step"])
        best = sorted(entries, key=lambda e: e["val_loss"])[: self.keep_top_k]
        keep = {e["path"] for e in best} | {latest["path"]}
        kept = []
        for e in entries:
            if e["path"] in keep:
                kept.append(e)
            else:
                p = Path(e["path"])
                if p.exists():
                    shutil.rmtree(p)
        self._index["entries"] = kept

    def latest(self) -> Optional[dict]:
        entries = self._index["entries"]
        return max(entries, key=lambda e: e["step"]) if entries else None

    def best(self) -> Optional[dict]:
        entries = self._index["entries"]
        return min(entries, key=lambda e: e["val_loss"]) if entries else None

    def restore(self, entry: dict, params_like: Any, opt_state_like: Any) -> Tuple:
        target = {"params": params_like, "opt_state": opt_state_like}
        restored = self._ckptr.restore(Path(entry["path"]), target)
        return restored["params"], restored["opt_state"], entry["step"], entry["epoch"]

    def restore_params(self, prefer: str = "best") -> Any:
        """Params-only restore for inference (no optimizer-state template needed).

        Template-free Orbax restore of the best-val (or latest) checkpoint; returns
        just the model parameter tree. Use `restore_latest`/`restore_best` when
        resuming training (those also rebuild optimizer state and step/epoch).
        """
        entry = (self.best() if prefer == "best" else None) or self.latest()
        if entry is None:
            raise FileNotFoundError(f"no checkpoint found in {self.root}")
        return self._ckptr.restore(Path(entry["path"]))["params"]

    def restore_latest(self, params_like: Any, opt_state_like: Any) -> Optional[Tuple]:
        entry = self.latest()
        if entry is None:
            return None
        return self.restore(entry, params_like, opt_state_like)

    def restore_best(self, params_like: Any, opt_state_like: Any) -> Optional[Tuple]:
        entry = self.best()
        if entry is None:
            return None
        return self.restore(entry, params_like, opt_state_like)
