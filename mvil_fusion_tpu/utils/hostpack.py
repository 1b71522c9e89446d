"""Batched host->device argument packing.

Through the tunneled TPU every host->device transfer pays a latency floor
(measured 0.2-4 ms fresh, ~40 ms in a compile-degraded session — PERF.md
§1/§2).  An event handler that ships ~25 small arrays therefore spends its
entire budget on transfer latency.  HostPack lays every per-event host
array into ONE reusable buffer per dtype class (f32 / i32 / bool), so an
event costs at most 3 transfers; the device side unpacks with free
slice/reshape ops inside the consuming jit.

Usage:
    pack = HostPack([("obs", (F, W, 2), np.float32), ...])
    pack.zero(); pack["obs"][...] = ...       # host writes into views
    bufs = pack.buffers()                     # 3 numpy arrays -> jit args
    # inside jit (layout is a static argument):
    u = unpack(layout, f32, i32, b8)          # dict name -> jnp array
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_KINDS = {np.float32: 0, np.int32: 1, np.bool_: 2}
_DTYPES = (np.float32, np.int32, np.bool_)


class HostPack:
    """One reusable flat host buffer per dtype class, with named views."""

    def __init__(self, fields: list[tuple[str, tuple, type]]):
        sizes = [0, 0, 0]
        spec = []
        for name, shape, dtype in fields:
            kind = _KINDS[dtype]
            n = int(np.prod(shape)) if shape else 1
            spec.append((name, tuple(shape), kind, sizes[kind]))
            sizes[kind] += n
        self.layout = tuple(spec)          # static, hashable
        self._bufs = [np.zeros(max(s, 1), _DTYPES[k])
                      for k, s in enumerate(sizes)]
        self._views = {}
        for name, shape, kind, off in spec:
            n = int(np.prod(shape)) if shape else 1
            self._views[name] = self._bufs[kind][off:off + n].reshape(shape)

    def __getitem__(self, name: str) -> np.ndarray:
        return self._views[name]

    def zero(self):
        for b in self._bufs:
            b[...] = 0

    def buffers(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        return tuple(self._bufs)


def unpack(layout, f32, i32, b8) -> dict:
    """Device-side unpacking (call inside jit; layout must be static)."""
    bufs = (f32, i32, b8)
    out = {}
    for name, shape, kind, off in layout:
        n = int(np.prod(shape)) if shape else 1
        out[name] = jnp.reshape(bufs[kind][off:off + n], shape)
    return out
