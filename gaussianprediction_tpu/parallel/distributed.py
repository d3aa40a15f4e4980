"""Multi-host bring-up: jax.distributed initialization (SURVEY.md §5.8).

On a TPU pod slice each host sees only its local chips until
`jax.distributed.initialize()` joins them into one global runtime; after
that `jax.devices()` is global and the ('data','tile') mesh in
parallel/mesh.py spans hosts transparently — shard_map collectives
(all_gather of tile bands, psum of per-Gaussian grads) ride ICI within a
slice and DCN across slices with no code changes (the design premise of
parallel/shard.py).

Initialization is gated on environment variables so single-host runs (and
this CI environment, which has one tunneled chip) never pay the rendezvous:

  GPT_DIST=1                 opt in (or set JAX_COORDINATOR_ADDRESS)
  JAX_COORDINATOR_ADDRESS    host:port of process 0 (optional on TPU pods,
                             where libtpu auto-discovers peers)
  JAX_NUM_PROCESSES / JAX_PROCESS_ID   explicit topology (optional)

Every CLI entry point calls maybe_initialize_distributed() before touching
devices. Reference scope note: the upstream repo is single-GPU only
(no DDP — /root/reference/train.py binds cuda:0); multi-chip scaling is
a TPU-native extension per SURVEY §5.8.
"""
from __future__ import annotations

import os


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed iff the env opts in. Returns True if
    running multi-process after the call."""
    opted_in = (
        os.environ.get("GPT_DIST", "0") == "1"
        or "JAX_COORDINATOR_ADDRESS" in os.environ
    )
    if not opted_in:
        return False
    import jax

    kwargs = {}
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kwargs["coordinator_address"] = addr
    if "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    if verbose:
        print(
            f"[distributed] process {jax.process_index()}/"
            f"{jax.process_count()}: {jax.local_device_count()} local / "
            f"{jax.device_count()} global devices"
        )
    return jax.process_count() > 1
