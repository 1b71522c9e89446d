"""LiDAR compensator front end: ring split + per-point relative time.

Replaces the reference's lidar_compensator node (reference:
lidar_compensator/src/PointProcessor.cc PointToRing/ElevationToRing
:107-341, sensor presets processor_node.cc:29-43 — 16/32/64-ring presets,
azimuth→relative-time annotation, intensity rewritten as ring + rel_time).

One vectorized device call per sweep; the output feeds the estimator's
`process_lidar` (which deskews) exactly like the reference's /full_cloud.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mvil_fusion_tpu.config import SystemConfig
from mvil_fusion_tpu.ops import deskew as dsk

# elevation presets (deg): (fov_down, fov_up, n_rings)
SENSOR_PRESETS = {
    "leishen_c16": (-15.0, 15.0, 16),
    "vlp16": (-15.0, 15.0, 16),
    "hdl32": (-30.67, 10.67, 32),
    "hdl64": (-24.9, 2.0, 64),
}


def _hdl64_table() -> np.ndarray:
    """HDL-64 per-ring elevation table (ascending, degrees): TWO sections —
    lower block 32 lasers ≈1/2° apart (−24.9…−9.0°), upper block 32 lasers
    1/3° apart (−8.33…+2.0°).  The reference declares an `uneven_` flag for
    such ladders but never uses it (PointProcessor.h:131) and bins HDL-64
    linearly over (−24.9, 2.0) — which mis-rings the upper block; this
    table is the physically-correct layout."""
    lower = np.linspace(-24.9, -9.0, 32)
    upper = np.linspace(-8.33, 2.0, 32)
    return np.concatenate([lower, upper]).astype(np.float32)


# non-uniform ladders: preset name -> (R,) ascending elevation table
SENSOR_ELEV_TABLES = {
    "hdl64": _hdl64_table(),
}


class CompensatedSweep(NamedTuple):
    """Fields are DEVICE arrays: every production consumer (estimator
    deskew, LOAM grid) is a jitted program, so fetching them to host here
    would cost 4-5 tunnel round-trips per sweep for nothing.  Eager numpy
    indexing still works on them (concrete jax arrays)."""
    pts: jnp.ndarray       # (N,3)
    ring: jnp.ndarray      # (N,)
    rel_time: jnp.ndarray  # (N,)
    mask: jnp.ndarray      # (N,)
    intensity: jnp.ndarray # (N,) ring + rel_time (reference encoding)
    t_start: float


@partial(jax.jit, static_argnames=("n_rings", "scan_period", "fov_down",
                                   "fov_up", "min_dist", "max_dist",
                                   "has_table"))
def _annotate(pts, mask, start_azi, elev_table, n_rings: int,
              scan_period: float, fov_down: float, fov_up: float,
              min_dist: float, max_dist: float, has_table: bool = False):
    ring, rel_time, ring_ok = dsk.ring_and_time(
        pts, n_rings, scan_period, fov_up_deg=fov_up, fov_down_deg=fov_down,
        start_azimuth=start_azi,
        elev_table_deg=elev_table if has_table else None)
    rng = jnp.linalg.norm(pts, axis=-1)
    ok = mask & ring_ok & (rng > min_dist) & (rng < max_dist)
    intensity = ring.astype(pts.dtype) + rel_time
    return ring, rel_time, ok, intensity


@dataclass
class LidarCompensator:
    cfg: SystemConfig
    sensor: str = "leishen_c16"

    def __post_init__(self):
        # start-orientation circular buffer (reference PointProcessor.cc
        # :107-341 infers the sweep start azimuth from 10-scan history
        # instead of assuming azimuth 0)
        self._start_hist: list[float] = []

    def _infer_start(self, pts: np.ndarray, valid: np.ndarray) -> float:
        """Sweep-start azimuth from the first emitted point (drivers emit
        in capture order), tracked over the last 10 sweeps.  The start is
        the most counter-clockwise first-point azimuth seen — every
        historical sweep start is then clockwise of (i.e. after) it, so
        per-sweep jitter never wraps a first point to ~scan_period."""
        idx = np.nonzero(valid)[0][:1]
        if len(idx) == 0:
            return self._start_hist[-1] if self._start_hist else 0.0
        est = float(np.arctan2(pts[idx[0], 1], pts[idx[0], 0]))
        self._start_hist.append(est)
        if len(self._start_hist) > 10:
            self._start_hist.pop(0)
        s = np.asarray(self._start_hist)
        mean = float(np.arctan2(np.sin(s).mean(), np.cos(s).mean()))
        dev = (s - mean + np.pi) % (2.0 * np.pi) - np.pi
        return mean + float(dev.max())

    def process(self, t_start: float, pts: np.ndarray,
                valid: np.ndarray | None = None) -> CompensatedSweep:
        """Annotate one raw sweep (N,3) with ring ids and relative times."""
        lc = self.cfg.lidar
        fov_down, fov_up, n_rings = SENSOR_PRESETS[self.sensor]
        if valid is None:
            valid = np.isfinite(pts).all(axis=-1)
        start_azi = (self._infer_start(pts, valid)
                     if lc.infer_start_ori else 0.0)
        table = SENSOR_ELEV_TABLES.get(self.sensor)
        pts_dev = jnp.asarray(pts, jnp.float32)
        ring, rel, ok, inten = _annotate(
            pts_dev, jnp.asarray(valid),
            jnp.asarray(start_azi, jnp.float32),
            jnp.zeros(n_rings, jnp.float32) if table is None
            else jnp.asarray(table),
            n_rings=n_rings, scan_period=lc.scan_period,
            fov_down=fov_down, fov_up=fov_up,
            min_dist=lc.min_distance, max_dist=lc.max_distance,
            has_table=table is not None)
        return CompensatedSweep(pts=pts_dev, ring=ring, rel_time=rel,
                                mask=ok, intensity=inten, t_start=t_start)
