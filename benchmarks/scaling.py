"""Multi-chip strong-scaling measurement for the sharded solvers.

Runs the keyframe/landmark-sharded Schur BA and the point-sharded VGICP at
reference scale (F=1024 landmarks, 32k source points — reference
NUM_OF_F=1000, vils_estimator/src/parameters.h:14; fast_gicp sweeps) over
1/2/4/8-device meshes and reports step time + strong-scaling efficiency
(t_1 / (n · t_n)).

On this machine the mesh is 8 virtual CPU devices
(--xla_force_host_platform_device_count): the point of the measurement is
the scaling *shape* — how much of the step is the psum-reduced parallel
axis vs the replicated (D,D) solve — which transfers to a real ICI mesh
where the collectives are faster, not slower, than shared-memory CPU.

    python benchmarks/scaling.py [--devices 1 2 4 8] [--repeat 20]

Writes/updates SCALING.md at the repo root and prints one JSON line per
(kernel, n_devices).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def bench_sharded_ba(n_dev: int, F: int, repeat: int) -> float:
    from mvil_fusion_tpu.io.synthetic import (SyntheticTrajectory,
                                              SyntheticWorld)
    from mvil_fusion_tpu.parallel import mesh as mesh_lib, sharded_ba
    from helpers import build_window_problem, make_problem, perturb_state

    world = SyntheticWorld(
        traj=SyntheticTrajectory(duration=8.0, w_amp=(0.9, 0.8, 1.0),
                                 w_freq=(0.5, 0.4, 0.6)),
        n_landmarks=F, landmark_radius=8.0)
    s_true, feats, preints, imask, _ = build_window_problem(world, F=F)
    prob = make_problem(s_true, feats, preints, imask)
    s0 = perturb_state(s_true, np.random.default_rng(0))

    m = mesh_lib.make_mesh(n_dev)
    solver = sharded_ba.make_sharded_solver(m, 460.0, iters=8)
    s_sh, prob_sh = sharded_ba.shard_problem(m, s0, prob)
    jax.block_until_ready(solver(s_sh, prob_sh))
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = solver(s_sh, prob_sh)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


def bench_sharded_vgicp(n_dev: int, n_pts: int, repeat: int) -> float:
    from mvil_fusion_tpu.ops import voxel
    from mvil_fusion_tpu.parallel import mesh as mesh_lib
    from mvil_fusion_tpu.parallel import sharded_registration as sreg

    rng = np.random.default_rng(0)
    # two noisy samplings of the same smooth surface, offset by a small rigid
    # transform the aligner must recover
    def sample(n):
        xy = rng.uniform(-20, 20, (n, 2))
        z = (2.0 * np.sin(0.3 * xy[:, 0]) * np.cos(0.25 * xy[:, 1])
             + 0.02 * rng.standard_normal(n))
        return np.column_stack([xy, z]).astype(np.float32)

    tgt = sample(n_pts)
    src = (sample(n_pts) - np.asarray([0.3, -0.2, 0.05], np.float32))
    mask = np.ones(n_pts, bool)

    tgt_map = voxel.build_gaussian_voxel_map(jnp.asarray(tgt),
                                             jnp.asarray(mask), 0.5)
    src_map = voxel.build_gaussian_voxel_map(jnp.asarray(src),
                                             jnp.asarray(mask), 0.5)
    m = mesh_lib.make_mesh(n_dev)
    align = sreg.make_sharded_vgicp(m, iters=12)
    src_sh, mask_sh = sreg.shard_points(m, jnp.asarray(src),
                                        jnp.asarray(mask))
    p0 = jnp.zeros(3, jnp.float32)
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    jax.block_until_ready(align(src_sh, mask_sh, tgt_map, src_map, p0, q0))
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = align(src_sh, mask_sh, tgt_map, src_map, p0, q0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


def bench_sharded_loam(n_dev: int, n_surf: int, repeat: int) -> float:
    """Query-sharded LOAM scan-to-map at dryrun scale (the engine's
    biggest matmul: queries x map association)."""
    from mvil_fusion_tpu.parallel import mesh as mesh_lib, sharded_loam
    from mvil_fusion_tpu.utils import lie

    rng = np.random.default_rng(0)
    n_c, m_c, m_s = n_surf // 2, 8192, 16384
    n_lines = m_c // 16
    xy = rng.uniform(-8, 8, (n_lines, 2)).astype(np.float32)
    z = np.linspace(-2.0, 2.0, 16, dtype=np.float32)
    cmap = np.column_stack([np.repeat(xy[:, 0], 16),
                            np.repeat(xy[:, 1], 16),
                            np.tile(z, n_lines)]).astype(np.float32)
    smap = rng.uniform(-8, 8, (m_s, 3)).astype(np.float32)
    smap[:, 2] = np.round(smap[:, 2] / 2.0) * 2.0 \
        + 0.01 * rng.standard_normal(m_s).astype(np.float32)
    corner = cmap[rng.integers(0, m_c, n_c)] + [0.06, -0.04, 0.02]
    surf = smap[rng.integers(0, m_s, n_surf)] + [0.06, -0.04, 0.02]

    m = mesh_lib.make_mesh(n_dev)
    s2m = sharded_loam.make_sharded_scan_to_map(m, outer_iters=2,
                                                gn_iters=4)
    c_sh, cm_sh, s_sh, sm_sh = sharded_loam.shard_features(
        m, jnp.asarray(corner), jnp.ones(n_c, bool),
        jnp.asarray(surf), jnp.ones(n_surf, bool))
    args = (c_sh, cm_sh, s_sh, sm_sh, jnp.asarray(cmap),
            jnp.ones(m_c, bool), jnp.asarray(smap), jnp.ones(m_s, bool),
            jnp.zeros(3), lie.quat_identity())
    jax.block_until_ready(s2m(*args))
    t0 = time.perf_counter()
    for _ in range(repeat):
        out = s2m(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--repeat", type=int, default=20)
    ap.add_argument("--features", type=int, default=1024)
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--out", default=str(pathlib.Path(__file__).parent.parent
                                         / "SCALING.md"))
    args = ap.parse_args()

    rows = []
    for name, fn, size, unit in (
            ("sharded_ba", lambda n: bench_sharded_ba(
                n, args.features, args.repeat), args.features, "landmarks"),
            ("sharded_vgicp", lambda n: bench_sharded_vgicp(
                n, args.points, args.repeat), args.points, "points"),
            ("sharded_loam_s2m", lambda n: bench_sharded_loam(
                n, 2048, args.repeat), 2048, "queries")):
        t1 = None
        for n in args.devices:
            if n > len(jax.devices()):
                continue
            t = fn(n)
            if t1 is None:
                t1 = t
            eff = t1 / (n * t)
            rows.append({"kernel": name, "n_devices": n, "size": size,
                         "unit": unit, "ms": round(t * 1e3, 3),
                         "speedup": round(t1 / t, 2),
                         "efficiency": round(eff, 3)})
            print(json.dumps(rows[-1]))

    plat = jax.devices()[0].platform
    n_cores = os.cpu_count() or 1
    D = 15 * 7 + 7  # pose_dim(W=7): window states + extrinsic/td block
    ba_bytes = (D * D + D) * 4          # psum-ed Schur partial + rhs
    vg_bytes = (6 * 6 + 6) * 4          # psum-ed GN normal system
    lines = [
        "# Multi-chip scaling (strong scaling, fixed problem size)",
        "",
        f"Measured on {len(jax.devices())}x virtual `{plat}` devices "
        f"(`--xla_force_host_platform_device_count`) backed by "
        f"**{n_cores} physical cores**; repeat={args.repeat}.  "
        "Efficiency = t1 / (n · tn).",
        "",
        "| kernel | size | devices | step ms | speedup | efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['kernel']} | {r['size']} {r['unit']} | "
                     f"{r['n_devices']} | {r['ms']} | {r['speedup']} | "
                     f"{r['efficiency']} |")
    lines += [
        "",
        "## Reading these numbers",
        "",
        f"The virtual devices share {n_cores} physical cores, so the "
        f"emulation cannot show speedup past n={n_cores} (and XLA:CPU "
        "thread-pool contention erodes it before that).  What the table "
        "does establish: (a) the sharded programs compile and run at "
        "every mesh size with identical results to the single-device "
        "solver (tests/test_sharded_ba.py, test_sharded_registration.py), "
        "and (b) device-count-independent communication volume:",
        "",
        "| kernel | psum payload / LM iter | per-device work / iter |",
        "|---|---|---|",
        f"| sharded_ba | {ba_bytes / 1024:.1f} KiB "
        f"((D,D)+(D,) with D={D}) | O(F/n) landmark Schur blocks |",
        f"| sharded_vgicp | {vg_bytes} B ((6,6)+(6,)) | O(P/n) "
        "Mahalanobis residuals + 3x3 solves |",
        f"| sharded_loam_s2m | {vg_bytes} B ((6,6)+(6,)) per GN iter | "
        "O(Q/n) query x map association (the (10^3 x 10^4) distance "
        "matmul) + line/plane fits |",
        "",
        "All heavy per-landmark / per-point work is shard-local; the "
        "collective payload is constant in problem size and device count. "
        "On a real v5e ICI mesh (~45 GB/s/link, ~1 us latency) an "
        f"allreduce of {ba_bytes / 1024:.0f} KiB costs ~10 us against a "
        "multi-ms compute step — a <1% communication fraction, i.e. "
        ">95% strong-scaling efficiency until shards become too small to "
        "fill the VPU/MXU (F/n < ~128 landmarks or P/n < ~4k points).",
        "",
        "Multi-host: `parallel/distributed.py` wires processes via "
        "`jax.distributed.initialize`; tests/test_distributed.py runs a "
        "real 2-process (gloo) allreduce over a 4-device global mesh.",
        "",
        "Regenerate: `python benchmarks/scaling.py`.",
    ]
    pathlib.Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
