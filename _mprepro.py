"""Minimal 2-process repro: all-gather a bf16 sharded array via gloo."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, port, dtype = int(sys.argv[1]), sys.argv[2], sys.argv[3]
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(4, 1), ("data", "model"))
sharded = NamedSharding(mesh, P("data"))
rep = NamedSharding(mesh, P())

x = jax.jit(
    lambda: jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3).astype(dtype),
    out_shardings=sharded,
)()
print(f"[{pid}] built sharded {dtype}", flush=True)
g = jax.jit(lambda a: a, out_shardings=rep)(x)
jax.block_until_ready(g)
print(f"[{pid}] gathered", flush=True)
if pid == 0:
    v = np.asarray(jax.device_get(g)).astype(np.float32)
    print(f"[{pid}] device_get ok sum={v.sum()}", flush=True)
