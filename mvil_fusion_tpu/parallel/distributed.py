"""Multi-host initialization (config 5 of BASELINE.json).

One SPMD process per host; `jax.distributed.initialize` wires the hosts,
and the global device set forms the mesh for the keyframe-sharded BA and
point-sharded registration in this package.  On a single host this is a
no-op and the local devices are used.

Run on each host:

    python -m mvil_fusion_tpu.parallel.distributed \
        --coordinator=<host0>:1234 --num-processes=N --process-id=k

or call `init()` programmatically before building meshes.  Intra-slice
reduction rides ICI; cross-host psum falls onto DCN — the sharded solvers
only allreduce tiny (D,D)/(6,6) partials, so scaling is communication-light
by construction.
"""

from __future__ import annotations

import argparse

import jax


def init(coordinator: str | None = None, num_processes: int = 1,
         process_id: int = 0):
    """Initialize multi-host JAX when configured; returns (devices, n)."""
    if coordinator and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.devices(), len(jax.devices())


def smoke(n_local: int | None = None) -> int:
    """Allreduce smoke test over the global mesh (run after init).

    Each process feeds its local slice of arange(n_devices); a psum over the
    mesh must see every device's value — the minimal proof the collective
    fabric (ICI single-host, DCN multi-host) is actually wired."""
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mvil_fusion_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_local)
    n = len(mesh.devices.ravel())
    data = np.arange(n, dtype=np.float32)
    # make_array_from_callback builds the global array from each process's
    # addressable shards — works single- and multi-process alike
    x = jax.make_array_from_callback(
        (n,), NamedSharding(mesh, P("f")), lambda idx: data[idx])
    total = jax.jit(
        jax.shard_map(lambda v: jax.lax.psum(jnp.sum(v), "f"),
                      mesh=mesh, in_specs=P("f"), out_specs=P(),
                      check_vma=False))(x)
    expect = n * (n - 1) / 2
    assert float(total) == expect, (float(total), expect)
    return n


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a backend (e.g. cpu) before init — this "
                    "environment's sitecustomize registers a TPU plugin "
                    "that overrides the JAX_PLATFORMS env var")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    devs, n = init(args.coordinator, args.num_processes, args.process_id)
    print(f"process {args.process_id}: {n} global devices")
    print(f"allreduce smoke over {smoke()} devices OK")
