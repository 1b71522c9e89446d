"""Device-mesh helpers for the distributed backend.

The reference's "distributed backend" is a ROS TCP pub/sub graph on one host
(SURVEY.md §1, §2.6); here the multi-chip axis is a `jax.sharding.Mesh`, and
cross-device reduction rides XLA collectives over ICI/DCN instead of topic
queues.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401


def make_mesh(n_devices: int | None = None, axis: str = "f",
              devices=None) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))
