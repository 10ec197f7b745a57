"""Worker process for the two-process multi-host test.

Usage: python scripts/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; together they form one 8-device
'data' mesh spanning both processes (the jax.distributed analogue of the
reference's disabled DDP path, train.py:40-62). Each worker feeds only its
local half of a deterministic global batch via `shard_host_batch`, runs one
global-mean loss + grad step under jit (XLA inserts the cross-process
collectives), and prints `RESULT <loss> <gradsum>` — the launcher asserts
both processes agree with the single-process value.
"""
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from gpnf_tpu.parallel.multihost import (global_mesh, initialize_distributed,
                                         shard_host_batch)

initialize_distributed(f"localhost:{port}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == nproc * 4, len(jax.devices())

mesh = global_mesh()

# deterministic global batch, independent of process layout
global_batch = np.arange(8 * 3 * 4 * 4, dtype=np.float32).reshape(8, 3, 4, 4)
global_batch = np.sin(global_batch * 0.1)
per = 8 // nproc
local = global_batch[pid * per : (pid + 1) * per]

gb = shard_host_batch(mesh, local)
w = jnp.full((3, 4, 4), 0.5, jnp.float32)


def loss_fn(w, x):
    return jnp.mean((x * w[None]) ** 2)


loss, grads = jax.jit(jax.value_and_grad(loss_fn))(w, gb)
print(f"RESULT {float(loss):.8f} {float(jnp.sum(grads)):.8f}", flush=True)
