"""Benchmarks: all five BASELINE.md configs, TPU vs the reference's compute.

The reference package itself cannot run here (dask/pint/tifffile/skimage are
not installed), so every CPU baseline is the reference's *exact kernel calls*
(cv2 Farneback/remap/warpAffine/FAST, sklearn NMI) reconstructed with its
control flow (scripts/reference_recon.py), timed serially and credited with
PERFECT 32-core scaling (serial/32) per the BASELINE.md convention.  The DAISY
descriptor stage is excluded from the feature-path baseline (cv2 here has no
contrib and skimage is absent) — that makes the baseline *faster* than the
real reference, i.e. our vs_baseline for config 1 is conservative.

Timeout robustness (the round-2 failure mode was a driver timeout with zero
output):

* the headline config runs FIRST and its JSON line is printed and flushed
  immediately; every subsequent config re-emits an enriched line, so the last
  parseable JSON line in the output tail is always the best snapshot so far;
* serial CPU baselines are RECORDED constants (measured with --measure-cpu,
  provenance below) instead of ~90 s of in-run serial cv2;
* a wall budget (MICROALIGNER_BENCH_BUDGET_S, default 330 s) skips remaining
  configs once exceeded;
* SIGTERM/SIGINT emit the current snapshot before exiting;
* the jax compilation cache lives in <repo>/.jax_cache so compiles from
  earlier runs in the same workspace persist into the driver's run.

TPU timings are steady-state: K register steps with distinct inputs chained
inside one jit, synced once (the tunneled single-dispatch round-trip costs
30-70 ms, which production amortizes across planes).

The headline metric is config #2 (tiled Farneback register+warp throughput);
the other configs are in detail.configs.
"""

from __future__ import annotations

import json
import math
import os
import signal
import sys
import time
from pathlib import Path

import numpy as np

_REPO = os.path.dirname(os.path.abspath(__file__))

# Keep stdout JSON-only: engine progress lines would otherwise push the JSON
# snapshot out of the driver's output tail if the process is killed mid-config.
os.environ.setdefault("MICROALIGNER_TPU_LOG", "quiet")

# Persistent compile cache: env vars set in-process are ignored by this jax
# build, so use the config API (verified: the env-var route writes nothing).
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.join(_REPO, "scripts"))

CORES = 32.0  # BASELINE.md comparator: perfect 32-core scaling credited

# Serial cv2/sklearn reference-kernel timings, measured in this workspace with
# `python bench.py --measure-cpu` on an otherwise idle host.  Each is the
# reference's exact compute run serially; vs_baseline divides these by 32
# (perfect scaling credited) then by our TPU time.  Re-measure with
# --measure-cpu after changing sizes/params — CPU_BASELINE_PROVENANCE below is
# emitted into every bench JSON so a stale recording is visible, not silent.
RECORDED_CPU_SERIAL_S = {
    "1_feature_pair": 78.5,   # FeatureRegistratorRecon full driver (FAST+DAISY+FLANN+RANSAC+MI), 4096²
    "2_optflow_pair": 26.6,   # 25 halo tiles Farneback win99 iter3 + remap, 4096²
    "3_chained_mse": 58.0,    # reference_recon 2-lvl pyramid register, 2048²
    "4_zstack_apply": 0.94,   # 8 × u16 4096² cv2.remap planes
    "5_20k_streamed": 399.0,  # 441-tile Farneback extrapolated from 4 tiles
}

# Provenance for the recorded constants: kept in sync with the --measure-cpu
# run that produced RECORDED_CPU_SERIAL_S.  The params string covers the
# workload-defining knobs of every config; --measure-cpu prints it so a
# recording made under different sizes/params is visibly stale in the JSON.
CPU_BASELINE_PROVENANCE = {
    "measured_at": "2026-08-18 (config 1; others 2026-08-17)",
    "cv2": "5.0.0",
    "params": "1:4096/pyr3/iter3/tile1000 2:4096/tile1000/ov100/iter3 "
              "3:2048/pyr2/iter3 4:4096/u16x8 5:20480/tile1000/ov100/iter3",
}

_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("MICROALIGNER_BENCH_BUDGET_S", "330"))
_STATE = {
    "metric": "optflow_register_warp_throughput",
    "value": None,
    "unit": "Mpix/s",
    "vs_baseline": None,
    "detail": {
        "baseline": "recorded reference-kernel (cv2/sklearn) serial timings / 32 (perfect scaling credited); refresh with --measure-cpu",
        "baseline_provenance": CPU_BASELINE_PROVENANCE,
        "tpu_timing": "steady-state: K jit-chained steps, one sync",
        "configs": {},
    },
}


def _elapsed():
    return time.perf_counter() - _T0


_LAST_GOOD = os.path.join(_REPO, "BENCH_LAST_GOOD.json")


def _emit():
    _STATE["detail"]["elapsed_s"] = round(_elapsed(), 1)
    print(json.dumps(_STATE), flush=True)


_SAVING = False


def _save_last_good():
    """Persist the current snapshot as the last successful on-hardware run,
    so a later tunnel-down skip can still point at real measured numbers
    (clearly labeled as a prior run, never as this run's result).

    MERGES per-config into the committed snapshot: only configs that produced
    a measured ``value`` this run replace their entry (each stamped with its
    own measured_at), so a partial run — tunnel dying mid-bench, ``--only``
    reruns, budget skips — never erases a previously measured config.

    Crash-safe: writes to a temp file and os.replace()s it into place, and a
    re-entrant call (SIGTERM arriving mid-write) is a no-op — either way the
    committed file is never left truncated."""
    global _SAVING
    if _SAVING:
        return
    _SAVING = True
    try:
        now = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        try:
            with open(_LAST_GOOD) as fh:
                snap = json.load(fh)
        except (OSError, ValueError):
            snap = {}
        snap.setdefault("configs", {})
        for key, cfg in _STATE["detail"]["configs"].items():
            if isinstance(cfg, dict) and cfg.get("value") is not None:
                snap["configs"][key] = dict(cfg, measured_at=now)
        if _STATE["value"] is not None:
            snap["measured_at"] = now
            snap.update({k: _STATE[k] for k in ("metric", "value", "unit", "vs_baseline")})
        snap["note"] = (
            "Last successful on-hardware bench snapshots (1x TPU v5e via the "
            "dev tunnel), merged per-config; each entry's measured_at stamps "
            "the run that produced it.  Regenerate BASELINE.md's table with "
            "scripts/render_baseline_table.py."
        )
        tmp = _LAST_GOOD + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(snap, fh, indent=1)
        os.replace(tmp, _LAST_GOOD)
    except OSError:
        pass
    finally:
        _SAVING = False


def _last_good_config(key):
    """The committed last-good entry for one config, or None."""
    try:
        with open(_LAST_GOOD) as fh:
            return json.load(fh)["configs"][key]
    except (OSError, ValueError, KeyError):
        return None


def _sig_handler(signum, frame):  # emit best snapshot before dying
    _STATE["detail"]["interrupted_by_signal"] = signum
    _save_last_good()
    _emit()
    sys.exit(128 + signum)


def _flow_knobs():
    """Active flow-path env knobs, embedded in config entries so A/B sweep
    outputs are self-describing."""
    names = ("MICROALIGNER_TPU_FLOW_DENSE", "MICROALIGNER_TPU_FLOW_TILE_BATCH",
             "MICROALIGNER_TPU_FLOW_STATIC_SPLIT", "MICROALIGNER_TPU_R_BF16",
             "MICROALIGNER_TPU_FLOW_BAND_ROWS")
    knobs = {k[len("MICROALIGNER_TPU_"):]: os.environ[k]
             for k in names if os.environ.get(k)}
    return {"knobs": knobs} if knobs else {}


def _make_pair(h, w, seed=0):
    import cv2 as cv

    rng = np.random.default_rng(seed)
    base = cv.GaussianBlur(rng.random((h, w), dtype=np.float32), (0, 0), 3.0)
    base = cv.normalize(base, None, 0, 255, cv.NORM_MINMAX, cv.CV_8U)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    mov = cv.remap(base, xs + 2.0 * np.sin(ys / 50), ys + 1.5 * np.cos(xs / 45), cv.INTER_LINEAR)
    return base, mov


# --------------------------------------------------------------- config 2


def bench_optflow_step(size=4096, tile_size=1000, overlap=100, num_iter=3, k_steps=4):
    """Fused tiled Farneback register+warp step, steady-state (K chained).

    Follows the library's path selection (flow_calc._dense_banded — the
    full-width row-band path is the default since the r4 sweep validated it);
    MICROALIGNER_TPU_FLOW_DENSE=0 A/Bs the mesh-sharded square-window step."""
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.parallel.mesh import get_tile_mesh
    from microaligner_tpu.parallel.step import make_sharded_register_step
    from microaligner_tpu.tiles import TileGrid

    win_size = overlap - (1 - overlap % 2)
    ref, mov = _make_pair(size, size)
    grid = TileGrid.for_image(ref.shape, tile_size, overlap)
    from microaligner_tpu.optflow.flow_calc import _dense_banded

    dense = _dense_banded()  # same default as the production tiled path
    if dense:
        from microaligner_tpu.optflow.flow_calc import calc_flow_and_warp_dense_banded

        def step(r, m):
            flow, warped = calc_flow_and_warp_dense_banded(
                r, m, m, grid, win_size, num_iter, "float32"
            )
            return warped, flow
    else:
        step = make_sharded_register_step(
            get_tile_mesh(), grid, win_size=win_size, num_iter=num_iter, with_hist=False
        )
    refj = jnp.asarray(ref, jnp.float32)
    movj = jnp.asarray(mov, jnp.float32)

    def rep(r, m):
        acc = 0.0
        for k in range(k_steps):  # distinct inputs so XLA cannot CSE the steps
            w, _ = step(r + float(k + 1), m - float(k))
            acc = acc + jnp.sum(w)
        return acc

    g = jax.jit(rep)
    t0 = time.perf_counter()
    float(g(refj, movj))  # compile + settle
    first_call_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(refj, movj))
        times.append(time.perf_counter() - t0)
    tpu_amortized = min(times) / k_steps

    serial = RECORDED_CPU_SERIAL_S["2_optflow_pair"]
    mpix = size * size / 1e6
    return {
        "value": round(mpix / tpu_amortized, 2),
        "unit": "Mpix/s",
        "vs_baseline": round((serial / CORES) / tpu_amortized, 2),
        "tpu_s": round(tpu_amortized, 4),
        "first_call_s": round(first_call_s, 1),
        "cpu_serial_s": serial,
        "image": f"{size}x{size}",
        "path": "dense_banded" if dense else "tiled_sharded",
        **_flow_knobs(),
    }


def measure_cpu_optflow_step(size=4096, tile_size=1000, overlap=100, num_iter=3):
    import cv2 as cv

    from microaligner_tpu.tiles import TileGrid, split_into_tiles
    import jax.numpy as jnp

    win_size = overlap - (1 - overlap % 2)
    ref, mov = _make_pair(size, size)
    grid = TileGrid.for_image(ref.shape, tile_size, overlap)
    ref_t = np.asarray(split_into_tiles(jnp.asarray(ref, jnp.float32), grid))
    mov_t = np.asarray(split_into_tiles(jnp.asarray(mov, jnp.float32), grid))
    t0 = time.perf_counter()
    for i in range(ref_t.shape[0]):
        f = cv.calcOpticalFlowFarneback(
            mov_t[i], ref_t[i], None, 0.5, 0, win_size, num_iter, 1, 1.7,
            cv.OPTFLOW_FARNEBACK_GAUSSIAN,
        )
        nf = -f
        nf[..., 0] += np.arange(f.shape[1])
        nf[..., 1] += np.arange(f.shape[0]).reshape(-1, 1)
        cv.remap(mov_t[i].astype(np.float32), nf, None, cv.INTER_LINEAR)
    return time.perf_counter() - t0


# --------------------------------------------------------------- config 1


def bench_feature(size=4096):
    """FeatureRegistrator affine registration of a 2-cycle pair.

    CPU baseline (recorded): the FULL reference driver reconstructed with its
    exact kernel calls (scripts/reference_recon.FeatureRegistratorRecon —
    cv2 FAST per halo tile + DAISY descriptors via cv2 separable blurs +
    FLANN knn + RANSAC + warpAffine + sklearn NMI gates, the whole
    pyramid x iteration loop), run serially and credited /32.  The round-3
    baseline omitted DAISY+FLANN entirely; this one pays for them.
    """
    import cv2 as cv

    from microaligner_tpu.features import FeatureRegistrator

    ref, _ = _make_pair(size, size, seed=1)
    t_true = np.float32([[1.0004, 0.0003, 6.4], [-0.0003, 1.0004, -9.1]])
    mov = cv.warpAffine(ref, t_true, (size, size))

    def run():
        reg = FeatureRegistrator()
        reg.num_pyr_lvl = 3
        reg.num_iterations = 3
        reg.tile_size = 1000
        reg.use_dog = True
        reg.ref_img = ref
        reg.mov_img = mov
        return reg.register()

    t0 = time.perf_counter()
    m = run()  # compile
    first_call_s = time.perf_counter() - t0
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        m = run()
        times.append(time.perf_counter() - t0)
    tpu_s = min(times)
    # recovered translation sanity (mov -> ref should invert t_true)
    err = abs(m[0, 2] + t_true[0, 2]) + abs(m[1, 2] + t_true[1, 2])

    serial = RECORDED_CPU_SERIAL_S["1_feature_pair"]
    return {
        "value": round(size * size / 1e6 / tpu_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round((serial / CORES) / tpu_s, 3),
        "tpu_s": round(tpu_s, 2),
        "first_call_s": round(first_call_s, 1),
        "cpu_serial_s": serial,
        "tmat_translation_err_px": round(float(err), 3),
        "note": "cpu baseline = full reference driver incl. DAISY(cv2-blur impl)+FLANN",
    }


def measure_cpu_feature(size=4096):
    """Serial cost of the reference's FULL feature registration driver on the
    config-1 pair: same pyramid/iteration control flow, same kernel calls
    (FAST, DAISY, FLANN knn, RANSAC, warpAffine, sklearn NMI)."""
    import cv2 as cv
    import reference_recon as recon

    ref, _ = _make_pair(size, size, seed=1)
    t_true = np.float32([[1.0004, 0.0003, 6.4], [-0.0003, 1.0004, -9.1]])
    mov = cv.warpAffine(ref, t_true, (size, size))
    r = recon.FeatureRegistratorRecon()
    r.num_pyr_lvl = 3
    r.num_iterations = 3
    r.tile_size = 1000
    r.use_dog = True
    r.ref_img = ref
    r.mov_img = mov
    t0 = time.perf_counter()
    r.register()
    return time.perf_counter() - t0


# --------------------------------------------------------------- config 3


def bench_chained(size=2048, with_mse=True):
    """DoG + chained affine -> optflow registration, plus (budget allowing)
    the E2E quality metric: warped-output MSE vs the cv2 reference
    reconstruction (which costs ~60 s of serial cv2 to produce)."""
    import jax.numpy as jnp

    from microaligner_tpu.optflow import OptFlowRegistrator

    ref, mov = _make_pair(size, size, seed=2)

    def run_ours():
        reg = OptFlowRegistrator()
        reg.num_pyr_lvl = 2
        reg.num_iterations = 3
        reg.tile_size = 1000
        reg.overlap = 100
        reg.use_full_res_img = True
        reg.use_dog = False
        reg.ref_img = ref
        reg.mov_img = mov
        # device-resident register: the production consumer (tiled warp of
        # the cycle's channels in pipeline/runner.py) takes the flow on
        # device, so the 32 MB host flow download is not part of the
        # register step; it is timed separately below as host_fetch_s
        return reg.register_device()

    # NOTE: jax.block_until_ready does NOT reliably wait on the tunneled
    # axon backend (verified 2026-08-18: a fused launch "completed" in 0.5 ms
    # by block_until_ready but took ~300 ms when forced by a scalar fetch);
    # every timed region here ends with a tiny forced fetch instead.
    float(jnp.sum(run_ours()[0, :8]))  # compile + settle
    t0 = time.perf_counter()
    flow_dev = run_ours()
    float(jnp.sum(flow_dev[0, :8]))  # force execution; ~64 B fetch
    tpu_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    flow_ours = np.asarray(jax.device_get(flow_dev))
    fetch_s = time.perf_counter() - t0

    serial = RECORDED_CPU_SERIAL_S["3_chained_mse"]
    out = {
        "value": round(size * size / 1e6 / tpu_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round((serial / CORES) / tpu_s, 2),
        "tpu_s": round(tpu_s, 2),
        "host_fetch_s": round(fetch_s, 2),
        "cpu_serial_s": serial,
        "mse_target": 1e-3,
    }
    if with_mse:
        import reference_recon as recon

        r = recon.OptFlowRegistratorRecon()
        r.num_pyr_lvl = 2
        r.num_iterations = 3
        r.tile_size = 1000
        r.overlap = 100
        r.use_full_res_img = True
        r.ref_img = ref
        r.mov_img = mov
        flow_ref = r.register()
        warp_ref = recon.warp_tiled(mov.astype(np.float32), flow_ref, 1000, 100)
        warp_ours = recon.warp_tiled(mov.astype(np.float32), flow_ours, 1000, 100)
        out["warp_mse_vs_reference_recon"] = float(
            np.mean(((warp_ref - warp_ours) / 255.0) ** 2)
        )
    else:
        out["warp_mse_vs_reference_recon"] = "skipped (budget); see BASELINE.md round-2: 8.4e-9"
    return out


def measure_cpu_chained(size=2048):
    import reference_recon as recon

    ref, mov = _make_pair(size, size, seed=2)
    r = recon.OptFlowRegistratorRecon()
    r.num_pyr_lvl = 2
    r.num_iterations = 3
    r.tile_size = 1000
    r.overlap = 100
    r.use_full_res_img = True
    r.ref_img = ref
    r.mov_img = mov
    t0 = time.perf_counter()
    r.register()
    return time.perf_counter() - t0


# --------------------------------------------------------------- config 4


def bench_zstack_apply(size=4096, n_planes=8):
    """Multi-channel z-stack apply: warp n u16 planes with one flow field.

    Reports end-to-end (host planes in, host planes out — on this dev setup
    dominated by the tunneled host<->device link) AND the device-resident
    warp compute (what the chip itself sustains; on production hosts PCIe
    moves a 32 MB plane in ~2 ms, so e2e approaches it).
    """
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.pipeline.runner import _apply_flow_plane
    from microaligner_tpu.tiles import TileGrid

    rng = np.random.default_rng(3)
    planes = rng.integers(0, 65535, (n_planes, size, size)).astype(np.uint16)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    flow = np.stack([2.0 * np.sin(ys / 50), 1.5 * np.cos(xs / 45)], axis=-1).astype(np.float32)
    grid = TileGrid.for_image((size, size), 1000, 100)
    flow_j = jnp.asarray(flow)

    out0 = _apply_flow_plane(jnp.asarray(planes[0]), flow_j, grid, "uint16")
    jax.block_until_ready(out0)  # compile
    # e2e (host in -> host out) is dominated by the dev tunnel's ~20 MB/s
    # downlink; 2 planes characterize it, extrapolated to n_planes (the
    # device-resident loop below still measures all n_planes)
    n_e2e = 2
    t0 = time.perf_counter()
    outs = [
        np.asarray(_apply_flow_plane(jnp.asarray(p), flow_j, grid, "uint16"))
        for p in planes[:n_e2e]
    ]
    tpu_e2e = (time.perf_counter() - t0) / n_e2e * n_planes

    # device-resident: all planes on device, ONE multi-plane apply (the
    # shared-flow weights are computed once per band, not once per plane —
    # pipeline/runner.py::_apply_flow_planes)
    from microaligner_tpu.pipeline.runner import _apply_flow_planes

    planes_j = jnp.asarray(planes)

    def rep(ps):
        o = _apply_flow_planes(ps, flow_j, grid, "uint16")
        return jnp.sum(o[:, 0, :8].astype(jnp.float32))

    g = jax.jit(rep)
    float(g(planes_j))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(planes_j))
        times.append(time.perf_counter() - t0)
    tpu_dev = min(times)

    serial = RECORDED_CPU_SERIAL_S["4_zstack_apply"]
    mpix = n_planes * size * size / 1e6
    return {
        "value": round(mpix / tpu_dev, 2),
        "unit": "Mpix/s",
        "vs_baseline": round((serial / CORES) / tpu_dev, 2),
        "tpu_device_s": round(tpu_dev, 3),
        "tpu_e2e_s": round(tpu_e2e, 3),
        "e2e_mpix_s": round(mpix / tpu_e2e, 2),
        "vs_baseline_e2e": round((serial / CORES) / tpu_e2e, 3),
        "cpu_serial_s": serial,
        "planes": n_planes,
        "e2e_planes_measured": n_e2e,
        "note": "e2e extrapolated from 2 planes; the dev tunnel is host-link-bound (~80 MB/s), production PCIe is ~200x that",
    }


def measure_cpu_zstack(size=4096, n_planes=8):
    import cv2 as cv

    rng = np.random.default_rng(3)
    planes = rng.integers(0, 65535, (n_planes, size, size)).astype(np.uint16)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    flow = np.stack([2.0 * np.sin(ys / 50), 1.5 * np.cos(xs / 45)], axis=-1).astype(np.float32)
    nf = -flow
    nf[..., 0] += np.arange(size)
    nf[..., 1] += np.arange(size).reshape(-1, 1)
    t0 = time.perf_counter()
    for p in planes[:2]:
        cv.remap(p, nf, None, cv.INTER_LINEAR)
    return (time.perf_counter() - t0) / 2 * n_planes


# --------------------------------------------------------------- config 5


def bench_20k(size=20480, tile_size=1000, overlap=100, num_iter=3):
    """Tiled 20k-class register + streamed apply (one u16 plane through the
    BigTIFF writer).  CPU Farneback cost recorded (441 serial tiles ≈ 400 s,
    extrapolated from 4 tiles via --measure-cpu)."""
    import jax
    import jax.numpy as jnp

    from microaligner_tpu.io.tiff import MemmapWriter
    from microaligner_tpu.optflow.flow_calc import calc_flow_and_warp_tiled
    from microaligner_tpu.pipeline.apply import stream_apply
    from microaligner_tpu.tiles import TileGrid

    win_size = overlap - (1 - overlap % 2)
    ref, mov = _make_pair(size // 8, size // 8, seed=4)
    ref = np.tile(ref, (8, 8))[:size, :size]
    mov = np.tile(mov, (8, 8))[:size, :size]
    grid = TileGrid.for_image(ref.shape, tile_size, overlap)
    refj = jnp.asarray(ref)
    movj = jnp.asarray(mov)

    # flow + post-warp fused per tile chunk (the separate warp pass re-read
    # the 3.3 GB stitched flow and the mov canvas)
    t0 = time.perf_counter()
    flow, warped = calc_flow_and_warp_tiled(
        refj, movj, movj, grid, win_size, num_iter, "uint8"
    )
    jax.block_until_ready((flow, warped))  # compile
    first_call_s = time.perf_counter() - t0
    # steady-state: min of 2 post-compile calls (same convention as the
    # chained-step configs; a single shot is exposed to host scheduling noise
    # when the driver shares the 32-core host with other work)
    register_s = math.inf
    for _ in range(2):
        t0 = time.perf_counter()
        flow, warped = calc_flow_and_warp_tiled(
            refj, movj, movj, grid, win_size, num_iter, "uint8"
        )
        float(jnp.sum(warped.astype(jnp.float32)[0, :8]))
        register_s = min(register_s, time.perf_counter() - t0)

    # Checkpoint the register split into the snapshot BEFORE the streamed
    # apply: the apply fetches an ~800 MB plane, and on a degraded dev tunnel
    # (observed 80 KB/s downlink) that outlives any sane timeout — a SIGTERM
    # mid-apply must not lose the register measurement.
    serial_est = RECORDED_CPU_SERIAL_S["5_20k_streamed"]
    mpix = size * size / 1e6
    partial = {
        "value": round(mpix / register_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round((serial_est / CORES) / register_s, 2),
        "register_s": round(register_s, 2),
        "first_call_s": round(first_call_s, 1),
        "streamed_apply_s": None,
        "note": "partial: apply not completed (tunnel-bound); register measured",
        "image": f"{size}x{size}",
        **_flow_knobs(),
    }
    # carry the last full apply measurement instead of dropping it; a prior
    # snapshot that is itself a partial carries ITS carried value forward, so
    # consecutive interrupted runs never lose the last real apply measurement
    prior = _last_good_config("5_20k_streamed") or {}
    carried = prior.get("streamed_apply_s") or prior.get("streamed_apply_s_prior")
    if carried:
        partial["streamed_apply_s_prior"] = carried
        partial["streamed_apply_measured_at"] = (
            prior.get("streamed_apply_measured_at") or prior.get("measured_at")
        )
    _STATE["detail"]["configs"]["5_20k_streamed"] = partial
    _save_last_good()

    # the streamed apply fetches ~800 MB over the tunnel (~40-70 s on a good
    # day, unbounded on a degraded one); skip it inside the driver's budget
    # and report the carried measurement instead
    if _elapsed() > _BUDGET_S - 90:
        partial["note"] = (
            "register measured this run; streamed apply skipped (insufficient "
            "remaining budget), prior measurement carried in streamed_apply_s_prior"
        )
        return dict(partial)

    # streamed apply of one u16 plane through the real BigTIFF writer
    plane = (mov.astype(np.uint16) * 257)
    out_path = "/tmp/microaligner_bench_20k.ome.tiff"
    mm = MemmapWriter(out_path, (1, 1, 1, size, size), np.uint16)
    t0 = time.perf_counter()

    def planes():
        yield (0, 0), plane

    from microaligner_tpu.pipeline.runner import _apply_flow_plane

    def device_fn(img):
        return _apply_flow_plane(jnp.asarray(img), flow, grid, "uint16")

    def write_fn(key, out):
        mm[0, key[0], key[1]] = out
        mm.flush()

    stream_apply(planes(), device_fn, write_fn)
    apply_s = time.perf_counter() - t0
    mm.close()
    os.unlink(out_path)

    total = register_s + apply_s
    return {
        "value": round(mpix / register_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round((serial_est / CORES) / register_s, 2),
        "register_s": round(register_s, 2),
        "first_call_s": round(first_call_s, 1),
        "streamed_apply_s": round(apply_s, 2),
        "total_s": round(total, 2),
        "cpu_serial_s_recorded": serial_est,
        "image": f"{size}x{size}",
        "note": "cpu cost extrapolated from 4 tiles (441 serial would be ~7 min)",
        **_flow_knobs(),
    }


def measure_cpu_20k(size=20480, tile_size=1000, overlap=100, num_iter=3):
    import cv2 as cv
    import jax.numpy as jnp

    from microaligner_tpu.tiles import TileGrid, split_into_tiles

    win_size = overlap - (1 - overlap % 2)
    ref, mov = _make_pair(size // 8, size // 8, seed=4)
    ref = np.tile(ref, (8, 8))[:size, :size]
    mov = np.tile(mov, (8, 8))[:size, :size]
    grid = TileGrid.for_image(ref.shape, tile_size, overlap)
    some = np.asarray(split_into_tiles(jnp.asarray(ref), grid)[:4])
    some_m = np.asarray(split_into_tiles(jnp.asarray(mov), grid)[:4])
    t0 = time.perf_counter()
    for i in range(4):
        cv.calcOpticalFlowFarneback(
            some_m[i], some[i], None, 0.5, 0, win_size, num_iter, 1, 1.7,
            cv.OPTFLOW_FARNEBACK_GAUSSIAN,
        )
    return (time.perf_counter() - t0) / 4 * grid.num_tiles


def bench_20k_cli(size=20480, tile_size=1000, overlap=100):
    """Config 5b: the reference's real workload shape at scale — a 2-cycle,
    2-channel 20k CycleStack through the FULL CLI pipeline (YAML -> OptFlowReg
    chain -> BigTIFF out), wall-clock end to end.

    Verification: the registered cycle-2 reference-channel plane must match
    cycle 1 far better than the unregistered input does (interior MSE).
    """
    import shutil
    import tempfile

    import cv2 as cv
    import jax
    import yaml

    from microaligner_tpu.io import MemmapWriter, TiffFile
    from microaligner_tpu.pipeline.config import PipelineConfigReader
    from microaligner_tpu.pipeline.runner import run_pipeline

    work = Path(tempfile.mkdtemp(prefix="ma_bench_20k_cli_"))
    try:
        ref8, mov8 = _make_pair(size // 8, size // 8, seed=5)
        ref = (np.tile(ref8, (8, 8))[:size, :size].astype(np.uint16) * 257)
        ys, xs = np.mgrid[0 : size // 8, 0 : size // 8].astype(np.float32)
        warp_x = xs + 2.0 * np.sin(ys / 40)
        warp_y = ys + 1.5 * np.cos(xs / 55)

        def shifted(img):
            t = np.empty_like(img)
            for i in range(8):  # per-band warp keeps host memory bounded
                for j in range(8):
                    blk = img[i * size // 8 : (i + 1) * size // 8,
                              j * size // 8 : (j + 1) * size // 8]
                    t[i * size // 8 : (i + 1) * size // 8,
                      j * size // 8 : (j + 1) * size // 8] = cv.remap(
                        blk, warp_x, warp_y, cv.INTER_LINEAR)
            return t

        cyc2 = shifted(ref)
        second_ch = (ref // 3).astype(np.uint16)
        stack = work / "stack.ome.tif"
        ome = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06"><Image ID="Image:0" Name="b">'
            f'<Pixels ID="Pixels:0" DimensionOrder="XYZCT" Type="uint16" SizeT="1" SizeC="4" SizeZ="1" '
            f'SizeY="{size}" SizeX="{size}" PhysicalSizeX="0.5" PhysicalSizeXUnit="um" '
            'PhysicalSizeY="0.5" PhysicalSizeYUnit="um">'
            + "".join(
                f'<Channel ID="Channel:0:{i}" Name="{n}" SamplesPerPixel="1"/>'
                for i, n in enumerate(("c01 DAPI", "c01 Cy5", "c02 DAPI", "c02 Cy5"))
            )
            + "</Pixels></Image></OME>"
        )
        mm = MemmapWriter(stack, (1, 4, 1, size, size), np.uint16, description=ome)
        mm[0, 0, 0] = ref
        mm[0, 1, 0] = second_ch
        mm[0, 2, 0] = cyc2
        mm[0, 3, 0] = shifted(second_ch)
        mm.close()

        cfg = {
            "Input": {"InputImagePaths": {"CycleStack": str(stack)},
                      "ReferenceCycle": 1, "ReferenceChannel": "DAPI"},
            "Output": {"OutputDir": str(work / "out"), "OutputPrefix": "",
                       "SaveOutputToCycleStack": True},
            "RegistrationParameters": {
                "OptFlowReg": dict(
                    NumberPyramidLevels=2, NumberIterationsPerLevel=3,
                    TileSize=tile_size, Overlap=overlap, NumberOfWorkers=0,
                    UseFullResImage=False, UseDOG=False,
                )
            },
        }
        ypath = work / "cfg.yaml"
        ypath.write_text(yaml.dump(cfg, sort_keys=False))

        t0 = time.perf_counter()
        run_pipeline(PipelineConfigReader().read_config(ypath))
        total_s = time.perf_counter() - t0

        out_tif = work / "out" / "optflow_reg_result_stack.tif"
        with TiffFile(str(out_tif)) as tf:
            reg = tf.read_page(2).astype(np.float32)
        margin = max(64, size // 40)  # 512 px at the 20480 production size
        inner = (slice(margin, -margin), slice(margin, -margin))
        mse_after = float(np.mean(((reg[inner] - ref[inner].astype(np.float32)) / 65535.0) ** 2))
        mse_before = float(np.mean(((cyc2[inner].astype(np.float32) - ref[inner]) / 65535.0) ** 2))

        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak_hbm_gb = round(stats.get("peak_bytes_in_use", 0) / 2**30, 2)
        except Exception:
            peak_hbm_gb = None
        return {
            "value": round(4 * size * size / 1e6 / total_s, 2),
            "unit": "Mpix/s",
            "total_s": round(total_s, 2),
            "planes": 4,
            "image": f"{size}x{size}",
            "mse_after_registration": mse_after,
            "mse_before_registration": mse_before,
            "peak_hbm_gb": peak_hbm_gb,
            "note": "full YAML->CLI pipeline (read, z-MIP, chained OptFlowReg, streamed BigTIFF write)",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ----------------------------------------------------------------- driver


def _skip_entry(key, reason):
    """A skip entry that still carries the committed last-good numbers for
    this config inline (clearly labeled as a prior run's measurement, with
    its own measured_at — never as this run's result)."""
    entry = {"skipped": reason}
    prior = _last_good_config(key)
    if prior:
        entry["last_good"] = prior
        entry["last_good_note"] = (
            "prior committed on-hardware measurement (see measured_at inside),"
            " NOT produced by this run"
        )
    return entry


def _run_config(key, fn, headline=False, min_budget=0.0, **kw):
    cfgs = _STATE["detail"]["configs"]
    remaining = _BUDGET_S - _elapsed()
    if remaining < max(min_budget, 0.0) or remaining <= 0:
        reason = (
            f"wall budget {_BUDGET_S}s exceeded"
            if remaining <= 0
            else f"insufficient remaining budget ({remaining:.0f}s < {min_budget:.0f}s needed)"
        )
        cfgs[key] = _skip_entry(key, reason)
        _emit()
        return None
    t0 = time.perf_counter()
    try:
        cfgs[key] = fn(**kw)
        cfgs[key]["wall_s"] = round(time.perf_counter() - t0, 1)
        if headline and "value" in cfgs[key]:
            _STATE["value"] = cfgs[key]["value"]
            _STATE["vs_baseline"] = cfgs[key]["vs_baseline"]
        if _STATE["value"] is not None or cfgs[key].get("value") is not None:
            # --only runs never set the headline; still persist their configs
            _save_last_good()
    except Exception as e:  # bench resilience — never lose earlier configs
        # an exception mid-config must not discard fields measured before it
        # (e.g. the config-5 register split checkpointed before the apply)
        partial = cfgs.get(key) if isinstance(cfgs.get(key), dict) else {}
        cfgs[key] = dict(partial, error=repr(e)[:300],
                         wall_s=round(time.perf_counter() - t0, 1))
    _emit()
    return cfgs[key]


def main():
    # --only 1,5b : run just those configs (cache warming / focused reruns)
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    if "--measure-cpu" in sys.argv:
        measured = {
            "1_feature_pair": measure_cpu_feature(),
            "2_optflow_pair": measure_cpu_optflow_step(),
            "3_chained_mse": measure_cpu_chained(),
            "4_zstack_apply": measure_cpu_zstack(),
            "5_20k_streamed": measure_cpu_20k(),
        }
        print(json.dumps({k: round(v, 2) for k, v in measured.items()}, indent=2))
        print("paste into RECORDED_CPU_SERIAL_S", file=sys.stderr)
        return 0

    signal.signal(signal.SIGTERM, _sig_handler)
    signal.signal(signal.SIGINT, _sig_handler)

    # Bounded backend probe: device init over the tunneled backend can hang
    # indefinitely when the tunnel is down, which would otherwise time the
    # whole bench out with NO parseable output (the round-2 failure mode).
    # A daemon-thread probe converts that hang into a documented skip.
    import threading

    probe_done = threading.Event()

    def _probe():
        try:
            jax.devices()
        finally:
            probe_done.set()

    threading.Thread(target=_probe, daemon=True).start()
    probe_s = float(os.environ.get("MICROALIGNER_BENCH_PROBE_TIMEOUT_S", "180"))
    if not probe_done.wait(timeout=probe_s):
        _STATE["detail"]["error"] = (
            f"device backend unreachable (init probe exceeded {probe_s:.0f}s; "
            "tunnel down?) — no TPU numbers this run"
        )
        try:
            with open(_LAST_GOOD) as fh:
                _STATE["detail"]["last_measured_run"] = json.load(fh)
        except (OSError, ValueError):
            pass
        _emit()
        return 0

    def want(key):
        return only is None or key.split("_")[0] in only

    # Headline first (its JSON line must hit stdout before anything slow),
    # then the north-star config 5 — the ≥10x target workload — BEFORE the
    # cheaper detail configs, so a budget overrun starves the tail, not the
    # targets.  Every skip embeds that config's committed last-good numbers.
    if want("2_optflow_pair"):
        _run_config("2_optflow_pair", bench_optflow_step, headline=True)
    if want("5_20k_streamed"):
        _run_config("5_20k_streamed", bench_20k)
    if want("1_feature_pair"):
        _run_config("1_feature_pair", bench_feature)
    if want("3_chained_mse"):
        _run_config("3_chained_mse", bench_chained,
                    with_mse=_elapsed() < _BUDGET_S - 90)
    if want("4_zstack_apply"):
        _run_config("4_zstack_apply", bench_zstack_apply)
    if want("5b_20k_cli"):
        # the CLI run needs a real time slice; only-mode runs it regardless
        _run_config("5b_20k_cli", bench_20k_cli,
                    min_budget=0 if only else 240)
    # If the probe passed but every config still failed (tunnel died mid-run),
    # the final snapshot must still carry the committed last-good numbers.
    if _STATE["value"] is None and "last_measured_run" not in _STATE["detail"]:
        try:
            with open(_LAST_GOOD) as fh:
                _STATE["detail"]["last_measured_run"] = json.load(fh)
        except (OSError, ValueError):
            pass
    _emit()
    return 0


if __name__ == "__main__":
    sys.exit(main())
