"""Checkpoint / resume for the full SLAM system.

The reference has NO runtime persistence — the iSAM2 graph and map live
only in memory and the result files are written in destructors
(SURVEY.md §5, globalMappingIkdTree.cpp:118-131).  Here the whole system
state — sliding window + marginalization prior + feature tracks + raw IMU
buffers + rolling local map + pose graph + keyed scans — serializes to one
file, so a crashed or migrated session resumes mid-run.

Device arrays are stored as numpy and restored as jnp on load.
"""

from __future__ import annotations

import io
import pickle

import jax
import jax.numpy as jnp
import numpy as np

# Deserialization is restricted to the classes a checkpoint legitimately
# contains: numpy/jax array reconstructors and this package's own state
# types.  A tampered file can therefore not execute arbitrary callables
# (the classic pickle RCE); it can at worst corrupt numeric state.
_SAFE_MODULE_PREFIXES = ("mvil_fusion_tpu.",)
_SAFE_GLOBALS = {
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy._core.numeric", "_frombuffer"),
    ("numpy.core.numeric", "_frombuffer"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("jax._src.array", "_reconstruct_array"),
    ("collections", "OrderedDict"),
    ("builtins", "complex"),
}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if (module, name) in _SAFE_GLOBALS or module.startswith(
                _SAFE_MODULE_PREFIXES):
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"checkpoint contains disallowed global {module}.{name}")


def _to_host(tree):
    """jax.Arrays pickle natively (restored on the default device on load),
    so serialization is a plain passthrough; kept as a hook for future
    cross-backend checkpoint portability."""
    return tree


def _to_device(tree):
    return tree


def save_system(system, path: str):
    """Serialize a VilSystem (or bare VIOEstimator) to `path`."""
    if hasattr(system, "flush"):
        system.flush()          # drain deferred readbacks before snapshot
    est = system.estimator if hasattr(system, "estimator") else system
    if hasattr(est, "flush"):
        est.flush()
    blob = {
        "estimator": {
            "status": est.status,
            "frame_count": est.frame_count,
            "times": est.times,
            "tracks": est.tracks,
            "slots": est.slots,
            "intervals": est.intervals,
            "pending": est._pending,
            "marg_old": est.marg_old,
            "state": _to_host(est.state),
            "prior": _to_host(est.prior),
            "failures": est.failures,
            "trajectory": est.trajectory,
            "lps_list": est.lps_list,
        }
    }
    if est.lidar is not None:
        lf = est.lidar
        blob["lidar"] = {
            "rlb": lf.rlb, "tlb": lf.tlb, "q_lb": lf.q_lb,
            "constraints": lf.constraints,
            "first_zv": lf.first_zv, "zv_pose": lf.zv_pose,
            "calibrated": lf.calibrated,
            "prev": _to_host(lf.prev) if lf.prev is not None else None,
        }
    if hasattr(system, "local_mapper") and system.local_mapper is not None:
        lm = system.local_mapper
        blob["local"] = _to_host({
            "corner_map": lm.corner_map, "corner_mask": lm.corner_mask,
            "surf_map": lm.surf_map, "surf_mask": lm.surf_mask,
            "surf_map_i": lm.surf_map_i,
            "p_corr": lm.p_corr, "q_corr": lm.q_corr,
            "initialized": lm.initialized,
            "accum_buf": lm.accum_buf, "accum_mask": lm.accum_mask,
            "accum_start_pose": lm.accum_start_pose,
            "frames_since_submap": lm.frames_since_submap,
            "trajectory": lm.trajectory,
            "submaps_emitted": lm.submaps_emitted,
        })
    if hasattr(system, "global_mapper") and system.global_mapper is not None:
        gm = system.global_mapper
        blob["global"] = {
            "graph": _to_host(gm.graph),
            "n_nodes": gm.n_nodes, "n_edges": gm.n_edges, "n_z": gm.n_z,
            "scans": gm.scans, "scan_masks": gm.scan_masks,
            "times": gm.times, "floor_ids": gm.floor_ids,
            "last_odom": gm.last_odom, "loops_closed": gm.loops_closed,
            "loop_pairs": gm.loop_pairs,
            "map_refreshes": gm.map_refreshes, "evictions": gm.evictions,
            "sc_desc": np.asarray(gm.sc_desc),
            "sc_keys": np.asarray(gm.sc_keys),
            "since_last_close": gm._since_last_close,
        }
    if hasattr(system, "lidar_sweep_count"):
        blob["system"] = {
            "lidar_sweep_count": system.lidar_sweep_count,
            "depth_bufs": np.asarray(system.depth_register._snap[0])
            if hasattr(system, "depth_register") else None,
            "depth_masks": np.asarray(system.depth_register._snap[1])
            if hasattr(system, "depth_register") else None,
            "depth_slot_t": system.depth_register._snap[2].copy()
            if hasattr(system, "depth_register") else None,
        }
    with open(path, "wb") as f:
        pickle.dump(blob, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_system(system, path: str):
    """Restore state saved by save_system into a freshly constructed
    system of the same configuration."""
    with open(path, "rb") as f:
        blob = _RestrictedUnpickler(f).load()
    est = system.estimator if hasattr(system, "estimator") else system
    e = blob["estimator"]
    est.status = e["status"]
    est.frame_count = e["frame_count"]
    est.times = e["times"]
    est.tracks = e["tracks"]
    est.slots = e["slots"]
    est.intervals = e["intervals"]
    est._pending = e["pending"]
    est.marg_old = e["marg_old"]
    est.state = _to_device(e["state"])
    est.prior = _to_device(e["prior"])
    est.failures = e["failures"]
    est.trajectory = e["trajectory"]
    est.lps_list = e["lps_list"]
    if "lidar" in blob:
        est.enable_lidar()
        lf = est.lidar
        L = blob["lidar"]
        lf.rlb, lf.tlb, lf.q_lb = L["rlb"], L["tlb"], L["q_lb"]
        lf.constraints = L["constraints"]
        lf.first_zv = L["first_zv"]
        lf.zv_pose = L["zv_pose"]
        lf.calibrated = L["calibrated"]
        lf.prev = _to_device(L["prev"]) if L["prev"] is not None else None
    if "local" in blob and hasattr(system, "local_mapper") \
            and system.local_mapper is not None:
        lm = system.local_mapper
        L = _to_device(blob["local"])
        lm.corner_map, lm.corner_mask = L["corner_map"], L["corner_mask"]
        lm.surf_map, lm.surf_mask = L["surf_map"], L["surf_mask"]
        if "surf_map_i" in L:
            lm.surf_map_i = L["surf_map_i"]
        lm.p_corr, lm.q_corr = np.asarray(L["p_corr"]), np.asarray(L["q_corr"])
        lm.initialized = L["initialized"]
        if "accum_buf" in L:
            lm.accum_buf, lm.accum_mask = L["accum_buf"], L["accum_mask"]
        lm.accum_start_pose = L["accum_start_pose"]
        lm.frames_since_submap = L["frames_since_submap"]
        lm.trajectory = L["trajectory"]
        lm.submaps_emitted = L["submaps_emitted"]
    if "global" in blob and hasattr(system, "global_mapper") \
            and system.global_mapper is not None:
        gm = system.global_mapper
        G = blob["global"]
        gm.graph = _to_device(G["graph"])
        gm.n_nodes, gm.n_edges, gm.n_z = G["n_nodes"], G["n_edges"], G["n_z"]
        gm.scans, gm.scan_masks = G["scans"], G["scan_masks"]
        gm.times, gm.floor_ids = G["times"], G["floor_ids"]
        gm.last_odom = G["last_odom"]
        gm.loops_closed = G["loops_closed"]
        gm.loop_pairs = G["loop_pairs"]
        gm.map_refreshes = G.get("map_refreshes", 0)
        gm.evictions = G.get("evictions", 0)
        gm.sc_desc = jnp.asarray(G["sc_desc"])
        gm.sc_keys = jnp.asarray(G["sc_keys"])
        gm._since_last_close = G["since_last_close"]
        gm._refresh_host_poses()
    if "system" in blob and hasattr(system, "lidar_sweep_count"):
        system.lidar_sweep_count = blob["system"]["lidar_sweep_count"]
        if hasattr(system, "depth_register") \
                and blob["system"].get("depth_bufs") is not None:
            system.depth_register._snap = (
                jnp.asarray(blob["system"]["depth_bufs"]),
                jnp.asarray(blob["system"]["depth_masks"]),
                blob["system"]["depth_slot_t"])
    return system
