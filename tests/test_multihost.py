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
