"""LiDAR motion deskew (undistortion to sweep end).

Replaces the reference's OpenMP `TransformToEnd` loop (reference:
vils_estimator/src/lidar_frontend.cpp:1001-1041, called from
estimator.cpp:189-238): each point, stamped with its relative time inside
the sweep, is transformed by the slerp-interpolated sensor motion so the
whole cloud is expressed at the sweep-end pose.  One vmapped kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mvil_fusion_tpu.utils import lie


def deskew_to_end(pts: jnp.ndarray, rel_time: jnp.ndarray,
                  p_start: jnp.ndarray, q_start: jnp.ndarray,
                  p_end: jnp.ndarray, q_end: jnp.ndarray,
                  scan_period: float) -> jnp.ndarray:
    """Undistort points to the sweep-end frame.

    pts: (N,3) in the (moving) sensor frame at each point's capture time;
    rel_time: (N,) seconds from sweep start; (p,q)_start/end: sensor poses in
    a common frame at sweep start/end.
    """
    s = jnp.clip(rel_time / scan_period, 0.0, 1.0)
    q_t = lie.quat_slerp(q_start[None, :], q_end[None, :], s)
    p_t = p_start[None, :] * (1.0 - s[:, None]) + p_end[None, :] * s[:, None]
    # world point at capture time, then into the end frame
    pw = lie.quat_rotate(q_t, pts) + p_t
    return lie.quat_rotate_inv(q_end[None, :], pw - p_end[None, :])


def ring_and_time(pts: jnp.ndarray, n_rings: int, scan_period: float,
                  fov_up_deg: float = 15.0, fov_down_deg: float = -15.0,
                  start_azimuth: jnp.ndarray | float = 0.0,
                  elev_table_deg: jnp.ndarray | None = None):
    """Ring index from elevation + relative time from azimuth.

    The lidar_compensator front end (reference: lidar_compensator/src/
    PointProcessor.cc PointToRing :107-341, ElevationToRing
    PointProcessor.h:77-81): elevation maps onto the ring ladder; azimuth
    (unwound clockwise from `start_azimuth`, the inferred sweep start
    orientation) maps onto [0, scan_period].

    elev_table_deg: optional (n_rings,) ascending per-ring elevation table
    for NON-UNIFORM ladders (e.g. the HDL-64's two sections with 1/3° and
    ~1/2° spacing — the reference's linear `factor_` ladder mis-bins these;
    its `uneven_` flag is declared but never used).  When given, each point
    snaps to the nearest table entry, valid if within 0.6× the local
    inter-ring gap.
    """
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    r_xy = jnp.sqrt(x * x + y * y)
    elev = jnp.degrees(jnp.arctan2(z, r_xy))
    if elev_table_deg is None:
        step = (fov_up_deg - fov_down_deg) / (n_rings - 1)
        ring = jnp.round((elev - fov_down_deg) / step).astype(jnp.int32)
        ring_ok = (ring >= 0) & (ring < n_rings)
        ring = jnp.clip(ring, 0, n_rings - 1)
    else:
        tab = jnp.asarray(elev_table_deg, pts.dtype)       # (R,) ascending
        mids = 0.5 * (tab[1:] + tab[:-1])                  # (R-1,) bin edges
        ring = jnp.searchsorted(mids, elev).astype(jnp.int32)
        ring = jnp.clip(ring, 0, n_rings - 1)
        gap_lo = tab[jnp.maximum(ring, 1)] - tab[jnp.maximum(ring, 1) - 1]
        gap_hi = tab[jnp.minimum(ring + 1, n_rings - 1)] \
            - tab[jnp.minimum(ring + 1, n_rings - 1) - 1]
        tol = 0.6 * jnp.maximum(gap_lo, gap_hi)
        ring_ok = jnp.abs(elev - tab[ring]) <= tol
    azi = jnp.arctan2(y, x)                     # [-pi, pi]
    frac = (start_azimuth - azi) % (2.0 * jnp.pi) / (2.0 * jnp.pi)  # cw sweep
    rel_time = frac * scan_period
    return ring, rel_time, ring_ok
