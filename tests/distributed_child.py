"""Child process for the two-process jax.distributed integration test
(tests/test_parallel.py::TestMultiProcess): 2 virtual CPU devices per
process, no axon plugin, explicit coordinator topology — the DCN-path
mechanics (rendezvous + cross-process collectives) that
parallel/distributed.py gates on.

The SPAWNER must set the env (JAX_PLATFORMS=cpu, PALLAS_AXON_POOL_IPS
empty, XLA_FLAGS device count, GPT_DIST/JAX_COORDINATOR_ADDRESS/
JAX_NUM_PROCESSES/JAX_PROCESS_ID): this image's sitecustomize registers
the axon TPU plugin at interpreter startup, before this file's body runs,
so in-script os.environ writes are too late.

Run: python tests/distributed_child.py  (with env prepared)
"""
import os
import sys

assert not os.environ.get("PALLAS_AXON_POOL_IPS"), (
    "spawner must clear PALLAS_AXON_POOL_IPS before launch"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gaussianprediction_tpu.parallel.distributed import (  # noqa: E402
    maybe_initialize_distributed,
)

multi = maybe_initialize_distributed()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
from jax import shard_map  # noqa: E402

assert multi, "maybe_initialize_distributed returned single-process"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

# the ('data',) axis of parallel/mesh.py, spanning both processes
mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
sharding = NamedSharding(mesh, P("data"))

# global array sharded across processes: each host materializes only its
# local shards (the multi-host data-loading pattern for per-camera batches)
full = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
gx = jax.make_array_from_callback((4, 8), sharding, lambda idx: full[idx])

# 1. jit-level cross-process reduction (XLA inserts the collective)
total = jax.jit(jnp.sum)(gx)
np.testing.assert_allclose(jax.device_get(total), full.sum())

# 2. shard_map psum over 'data' — the exact collective pattern of the
# gradient all-reduce in parallel/shard.py
psummed = jax.jit(
    shard_map(
        lambda x: jax.lax.psum(jnp.sum(x, axis=0, keepdims=True), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
)(gx)
np.testing.assert_allclose(
    jax.device_get(psummed)[0], full.sum(axis=0), rtol=1e-6
)

# 3. a tiny sharded-gradient "train step": per-shard loss grads psummed to
# a replicated update, applied identically on every process
w = jnp.ones((8,), jnp.float32)


def loss(w, x):
    return jnp.sum((x @ w) ** 2)


def sharded_grad(w, x):
    g = jax.grad(loss)(w, x)
    return jax.lax.psum(g, "data")


# check_vma=False, matching parallel/shard.py:190: grads w.r.t. REPLICATED
# params come out of the transpose marked unvarying under the new VMA
# tracking, and psum of an "unvarying" value multiplies by axis size
# instead of summing the (actually different) device values.
g = jax.jit(
    shard_map(sharded_grad, mesh=mesh, in_specs=(P(), P("data")),
              out_specs=P(), check_vma=False),
)(w, gx)
g_ref = jax.grad(loss)(w, jnp.asarray(full))
np.testing.assert_allclose(jax.device_get(g), np.asarray(g_ref), rtol=1e-5)

print(f"DIST_OK process={jax.process_index()}", flush=True)
