"""Fast TPU-tunnel health probe.

The image's sitecustomize registers the axon PJRT backend with the default
claim timeout, so a dead/claimed tunnel costs ~25 minutes per attempt.
This probe re-registers with a SHORT claim timeout and runs one trivial
device op.  Exit 0 = tunnel healthy, nonzero = unavailable.

Run with the sitecustomize registration disabled so we control the
timeout:  PALLAS_AXON_POOL_IPS= python scripts/tpu_probe.py [timeout_s]
"""

import os
import sys
import uuid

timeout_s = int(sys.argv[1]) if len(sys.argv) > 1 else 60

# replicate the sitecustomize env contract (it was skipped via the
# emptied PALLAS_AXON_POOL_IPS)
os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
os.environ["AXON_LOOPBACK_RELAY"] = "1"
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ["JAX_PLATFORMS"] = "axon"
gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")

from axon.register import register  # noqa: E402

register(
    None,
    f"{gen}:1x1x1",
    so_path="/opt/axon/libaxon_pjrt.so",
    session_id=str(uuid.uuid4()),
    remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
    claim_timeout_s=timeout_s,
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

x = jnp.arange(8.0)
y = float(jnp.sum(x * 2.0))
assert y == 56.0, y
print(f"TPU_OK {jax.devices()[0]}")
