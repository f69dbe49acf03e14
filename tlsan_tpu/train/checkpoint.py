"""Checkpoint save/restore with JSON config sidecars.

Mirrors the reference contract (TLSAN/model.py:302-313, TLSAN/train.py:59-84):
step-named checkpoint files under model_dir, a JSON config sidecar per save,
restore-or-init on startup, and the `from_scratch` wipe.  Serialization is
msgpack via flax.serialization (params + opt_state + step + rng in one file).
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional, Tuple

import flax.serialization as fser

from tlsan_tpu.core.config import save_config_json

LATEST = "latest"
BEST = "best"


def save(model_dir: str, name: str, step: int, params: Any, opt_state: Any,
         *configs: Any, best: bool = False) -> str:
    """Write `<name>-<step>.ckpt` + `<name>-<step>.json` sidecar and update
    the latest-pointer (reference: TLSAN/model.py:302-307).  `best=True`
    additionally updates the best-pointer, which the unconditional
    final-epoch save never touches — so serving can load the gated-best
    params even after the model overfits past its peak."""
    os.makedirs(model_dir, exist_ok=True)
    stem = os.path.join(model_dir, f"{name}-{step}")
    payload = {"step": step, "params": params, "opt_state": opt_state}
    with open(stem + ".ckpt", "wb") as f:
        f.write(fser.to_bytes(payload))
    if configs:
        save_config_json(stem + ".json", *configs)
    pointers = (LATEST, BEST) if best else (LATEST,)
    for pointer in pointers:
        with open(os.path.join(model_dir, pointer), "w") as f:
            f.write(f"{name}-{step}.ckpt\n")
    return stem + ".ckpt"


def _read_pointer(model_dir: str, pointer_name: str) -> Optional[str]:
    pointer = os.path.join(model_dir, pointer_name)
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        fname = f.read().strip()
    path = os.path.join(model_dir, fname)
    return path if os.path.exists(path) else None


def latest_checkpoint(model_dir: str) -> Optional[str]:
    """Path of the newest checkpoint, or None
    (≡ tf.train.get_checkpoint_state at TLSAN/train.py:71)."""
    return _read_pointer(model_dir, LATEST)


def best_checkpoint(model_dir: str) -> Optional[str]:
    """Path of the best gated-save checkpoint, falling back to latest."""
    return _read_pointer(model_dir, BEST) or _read_pointer(model_dir, LATEST)


def restore(path: str, params_template: Any, opt_state_template: Any
            ) -> Tuple[int, Any, Any]:
    """Load a checkpoint into the given pytree templates."""
    with open(path, "rb") as f:
        payload = fser.from_bytes(
            {"step": 0, "params": params_template, "opt_state": opt_state_template},
            f.read(),
        )
    return payload["step"], payload["params"], payload["opt_state"]


def maybe_wipe(model_dir: str, from_scratch: bool) -> None:
    """`from_scratch` wipes the model dir (reference: TLSAN/train.py:124-127)."""
    if from_scratch and os.path.exists(model_dir):
        shutil.rmtree(model_dir)
    os.makedirs(model_dir, exist_ok=True)
