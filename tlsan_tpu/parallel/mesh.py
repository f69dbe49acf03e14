"""Device-mesh setup and sharding rules.

The reference is single-process/single-device (its only device control is
CUDA_VISIBLE_DEVICES — TLSAN/train.py:146).  Here parallelism is first-class:

  axes:  dp — data parallel: batch sharded, dense attention towers replicated
         mp — model parallel: embedding tables row-sharded over the vocab dim

The model is a few MB of dense weights plus vocab tables, so dp is the primary
strategy; mp shards the tables (the only components that grow with catalog
size).  PP/EP/CP/SP are intentionally out of scope: sequences are ≤90 items of
64 features and fit trivially in VMEM (design decision recorded in SURVEY.md
§2.8 and docs/design.md).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
MP_AXIS = "mp"

# model parameters whose leading dim is a vocab axis → row-sharded over mp
# (short_w/long_w are LSPM's item-/user-vocab tables — LSPM/model.py:46-49)
VOCAB_SHARDED_PARAMS = ("item_emb", "item_b", "user_emb", "usert_emb",
                        "cate_emb", "short_w", "long_w")


def make_mesh(dp: int = 0, mp: int = 1, devices=None) -> Mesh:
    """Build a (dp, mp) mesh; dp=0 means "all remaining devices".

    With no explicit device list, mesh_utils picks an ICI-topology-aware
    ordering (mp neighbors on adjacent links) — a raw jax.devices() reshape
    can place the per-lookup mp collectives across slow paths.  An explicit
    `devices` list (tests, virtual CPU meshes) is honored as given.
    """
    n = len(devices) if devices is not None else len(jax.devices())
    if dp <= 0:
        assert n % mp == 0, f"{n} devices not divisible by mp={mp}"
        dp = n // mp
    assert dp * mp <= n, f"mesh {dp}x{mp} needs {dp*mp} devices, have {n}"
    if devices is None:
        try:
            arr = mesh_utils.create_device_mesh((dp, mp))
        except (ValueError, AssertionError):  # partial slice / odd counts
            arr = np.asarray(jax.devices()[: dp * mp]).reshape(dp, mp)
    else:
        arr = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(arr, (DP_AXIS, MP_AXIS))


def batch_spec() -> P:
    """Batch arrays: sharded over dp, replicated over mp."""
    return P(DP_AXIS)


def param_spec(path: str, ndim: int, vocab_sharded: bool) -> P:
    """Sharding spec for a parameter leaf.  Vocab tables row-shard over mp;
    everything else (gamma, attention dense maps) replicates."""
    if vocab_sharded and any(path.endswith(name) for name in VOCAB_SHARDED_PARAMS):
        return P(MP_AXIS, *([None] * (ndim - 1)))
    return P()


def param_shardings(mesh: Mesh, params, vocab_sharded: bool = True):
    """NamedSharding pytree matching `params`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        pstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
        out.append(NamedSharding(mesh, param_spec(pstr, np.ndim(leaf), vocab_sharded)))
    return jax.tree_util.tree_unflatten(treedef, out)


def data_shardings(mesh: Mesh, data):
    """NamedSharding pytree for batch dicts: leading dim over dp."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, batch_spec()), data)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
