"""Optimizer and train state.

Replaces the reference's init_optimizer (TLSAN/model.py:185-205): optimizer
switch sgd/adam/adadelta/rmsprop, global-norm gradient clipping, and the
hard-coded LR step schedule (lr → 0.1·lr at a fixed global step,
TLSAN/train.py:232-233).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import optax

from tlsan_tpu.core.config import TrainConfig


def bf16_cast(tree):
    """Cast every f32 leaf to bf16 (mixed-precision forward/backward compute;
    master params and optimizer state stay f32 — the f32→bf16 cast's VJP
    casts the bf16 cotangents back up, so gradients land in f32)."""
    import jax
    import jax.numpy as jnp
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if getattr(x, "dtype", None) == jnp.float32 else x, tree)


def wants_bf16(tc: TrainConfig) -> bool:
    dt = tc.compute_dtype
    if dt in ("float32", "f32", "fp32"):
        return False
    if dt in ("bfloat16", "bf16"):
        return True
    raise ValueError(f"compute_dtype must be float32 or bfloat16, got {dt!r}")


def lr_schedule(tc: TrainConfig):
    """Step schedule: lr until lr_drop_step, then lr×0.1
    (reference: TLSAN/train.py:232-233; drop step varies per trainer)."""
    return optax.piecewise_constant_schedule(
        init_value=tc.learning_rate,
        boundaries_and_scales={tc.lr_drop_step: 0.1},
    )


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = lr_schedule(tc)
    if tc.optimizer == "adam":
        opt = optax.adam(schedule)
    elif tc.optimizer == "adadelta":
        opt = optax.adadelta(schedule)
    elif tc.optimizer == "rmsprop":
        opt = optax.rmsprop(schedule)
    else:
        opt = optax.sgd(schedule)
    return optax.chain(
        optax.clip_by_global_norm(tc.max_gradient_norm),
        opt,
    )


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0
