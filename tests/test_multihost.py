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


_FULL_TRAINER_WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tlsan_tpu.parallel.multihost import init_distributed
    init_distributed(coordinator=f"localhost:{port}", num_processes=2,
                     process_id=proc_id)
    assert jax.device_count() == 8 and jax.process_count() == 2
    from tests.test_train import synthetic
    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.train.loop import Trainer
    train, test, cate_list = synthetic(n=128, users=21, items=29, cates=5)
    cfg = ModelConfig(model="tlsan", user_count=21, item_count=29,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=outdir, max_epochs=2, train_batch_size=32,
                     test_batch_size=64, steps_per_call=2, eval_freq=4,
                     best_after_step=0, save_auc_gate=0.0, dp=4, mp=2)
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    best = tr.train()
    print(f"proc {proc_id}: best_auc={best['auc']:.6f} step={best['step']}",
          flush=True)
""")


def test_two_process_full_trainer(tmp_path):
    """Trainer.train() end-to-end across 2 real controller processes x 4
    virtual devices on a (4dp, 2mp) mesh: per-host local-shard batch
    feeding, collective checkpoint materialization, host-0-only writes —
    and identical final metrics on both ranks."""
    worker = tmp_path / "full_trainer_worker.py"
    worker.write_text(_FULL_TRAINER_WORKER)
    outdir = str(tmp_path / "run")
    port = _free_port()
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
                [sys.executable, str(worker), str(i), str(port), outdir],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        lines.append(out.split("best_auc=")[-1].strip())
    assert lines[0] == lines[1], lines  # identical best metrics on both ranks
    # host 0 wrote the artifacts (checkpoint + metrics + latest pointer)
    assert os.path.exists(os.path.join(outdir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(outdir, "latest"))


_SPARSE_TRAINER_WORKER = textwrap.dedent("""
    import os, sys
    proc_id = int(sys.argv[1]); port = sys.argv[2]; outdir = sys.argv[3]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from tlsan_tpu.parallel.multihost import init_distributed
    init_distributed(coordinator=f"localhost:{port}", num_processes=2,
                     process_id=proc_id)
    assert jax.device_count() == 8 and jax.process_count() == 2
    from tests.test_train import synthetic
    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.train.loop import Trainer
    train, test, cate_list = synthetic(n=128, users=21, items=29, cates=5)
    cfg = ModelConfig(model="tlsan", user_count=21, item_count=29,
                      cate_count=5, Ls=10, Ts=8)
    tc = TrainConfig(model_dir=outdir, max_epochs=2, train_batch_size=32,
                     test_batch_size=64, steps_per_call=2, eval_freq=4,
                     best_after_step=0, save_auc_gate=0.0, dp=4, mp=2,
                     sparse_updates=True)
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    assert tr._use_sparse, "sparse path must engage in multi-process mode"
    best = tr.train()
    print(f"proc {proc_id}: best_auc={best['auc']:.6f} step={best['step']}",
          flush=True)
""")


def test_two_process_sparse_trainer(tmp_path):
    """Sparse (touched-row) updates composed with the multi-PROCESS trainer
    (VERDICT r3 #4): Trainer.train() with sparse_updates=True across 2 real
    controller processes x 4 virtual devices on a (4dp, 2mp) mesh — per-host
    batch assembly feeds the assembled-mode sparse chunk.  Parity is checked
    two ways: identical metrics on both ranks, and the final checkpointed
    params must match a SINGLE-process run of the same sparse config on an
    in-process 8-device mesh to float-associativity tolerance."""
    worker = tmp_path / "sparse_trainer_worker.py"
    worker.write_text(_SPARSE_TRAINER_WORKER)
    outdir = str(tmp_path / "run2p")
    port = _free_port()
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
                [sys.executable, str(worker), str(i), str(port), outdir],
                env=env, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    lines = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
        lines.append(out.split("best_auc=")[-1].strip())
    assert lines[0] == lines[1], lines

    # single-process reference run, same sparse config on the shared
    # 8-virtual-device mesh (conftest sets the fleet for THIS process)
    from tests.test_train import synthetic
    from tlsan_tpu.core.config import ModelConfig, TrainConfig
    from tlsan_tpu.models.tlsan import TLSAN
    from tlsan_tpu.train import checkpoint as ckpt
    from tlsan_tpu.train.loop import Trainer
    train, test, cate_list = synthetic(n=128, users=21, items=29, cates=5)
    cfg = ModelConfig(model="tlsan", user_count=21, item_count=29,
                      cate_count=5, Ls=10, Ts=8)
    outdir1 = str(tmp_path / "run1p")
    tc = TrainConfig(model_dir=outdir1, max_epochs=2, train_batch_size=32,
                     test_batch_size=64, steps_per_call=2, eval_freq=4,
                     best_after_step=0, save_auc_gate=0.0, dp=4, mp=2,
                     sparse_updates=True)
    tr = Trainer(TLSAN, cfg, tc, cate_list, train, test, use_pallas=False)
    assert tr._use_sparse
    tr.train()

    import flax.serialization as fser
    import jax
    import numpy as np

    def leaves(mdir):
        with open(ckpt.latest_checkpoint(mdir), "rb") as f:
            payload = fser.msgpack_restore(f.read())
        return jax.tree_util.tree_leaves_with_path(payload["params"])

    l2, l1 = leaves(outdir), leaves(outdir1)
    assert [k for k, _ in l2] == [k for k, _ in l1]
    for (k, a), (_, b) in zip(l2, l1):
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-6,
            err_msg=f"2-process vs 1-process sparse param mismatch at {k}")
