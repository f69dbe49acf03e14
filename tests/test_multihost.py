"""Real multi-process jax.distributed bring-up (2 CPU processes via Gloo).

Validates parallel/multihost.py with actual separate controller processes —
stronger than the virtual-device mesh tests, which share one process.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    from tlsan_tpu.parallel.multihost import init_distributed, local_batch_slice
    n = init_distributed(coordinator=f"localhost:{port}", num_processes=2,
                         process_id=proc_id)
    import jax
    assert n == 2 and jax.process_count() == 2
    sl = local_batch_slice(8)
    assert (sl.start, sl.stop) == (4 * proc_id, 4 * proc_id + 4)
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    got = multihost_utils.process_allgather(jnp.ones(4) * (proc_id + 1))
    assert got.shape == (2, 4) and float(got.sum()) == 12.0
    print(f"proc {proc_id}: OK", flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_bringup(tmp_path):
    # (bounded by the 150 s communicate timeout below)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("XLA_FLAGS", None)  # no virtual-device fleet in the workers
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=150)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    from tlsan_tpu.parallel.multihost import init_distributed
    init_distributed(coordinator=f"localhost:{port}", num_processes=2,
                     process_id=proc_id)
    import jax
    import numpy as np
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    import __graft_entry__ as g
    from tlsan_tpu.core.config import TrainConfig
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.parallel.api import (make_sharded_train_step, shard_batch,
                                        shard_train_state)
    from tlsan_tpu.parallel.mesh import make_mesh
    from tlsan_tpu.train.state import make_optimizer
    cfg, params, batch, cate_list = g._tiny_setup(B=16)
    mesh = make_mesh(dp=4, mp=2, devices=jax.devices())
    tc = TrainConfig()
    opt_state = make_optimizer(tc).init(params)
    params, opt_state = shard_train_state(mesh, params, opt_state)
    batch = shard_batch(mesh, batch)
    step = make_sharded_train_step(TLSAN, cfg, tc, cate_list, mesh,
                                   vocab_sharded=True, use_pallas=False)
    params, opt_state, loss = step(params, opt_state, batch)
    loss = float(loss)
    assert np.isfinite(loss)
    print(f"proc {proc_id}: loss={loss:.6f}", flush=True)
""")


def test_two_process_sharded_train_step(tmp_path):
    """The FULL (dp x mp) TLSAN train step over 2 controller processes x 4
    virtual devices: vocab-sharded gathers + grad psums ride real
    inter-process collectives; both ranks must compute the same loss."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    port = _free_port()
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, str(worker), str(i), str(port)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        losses.append(out.split("loss=")[-1].strip().splitlines()[0])
    assert losses[0] == losses[1], losses  # identical loss on both ranks
