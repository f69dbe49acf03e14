"""Parameter initializers matching TF 1.8 defaults.

``tf.get_variable`` and ``tf.layers.dense`` default to glorot-uniform kernels
and zero biases in TF 1.8 — the reference never overrides the kernel
initializer (e.g. TLSAN/model.py:62-81, :347), so every table and dense map
is glorot-uniform.  jax.nn.initializers.glorot_uniform computes fan-in/out
from the shape the same way.
"""

import jax
import jax.numpy as jnp

glorot_uniform = jax.nn.initializers.glorot_uniform()


def zeros_init(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def constant_init(value):
    def init(shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init
