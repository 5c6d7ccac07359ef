"""Benchmark: Mrays/s for 800x800 NeRF-synthetic-style rendering.

Replicates the reference's headless FPS protocol (main_headless.cpp:203-231):
render N poses end-to-end on device, excluding PNG writing; report rays/s.
No real PlenOctree assets exist in this environment, so the scene is a
deterministic procedural SH16 octree at drums-like scale (see
volrend_tpu/models/synthetic.py). Baseline: the PlenOctrees paper's ~168 FPS
on a V100 at 800x800 = ~110 Mrays/s (BASELINE.md).

Timing notes: on the axon TPU tunnel ``block_until_ready`` does NOT actually
synchronize — only host transfers do — and every dispatch+sync round trip
costs ~26 ms. So all poses are rendered inside ONE jitted call (a
``lax.map`` over the pose batch, which is also how a production batch
renderer should be written) and the timed region ends with a host transfer
of a per-pose checksum.

Fail-soft contract (VERDICT r3 item 2): this script ALWAYS prints exactly
one JSON line and exits 0. The fastest configuration — the reference's
own RGBA8 display write-out (surf2Dwrite, volrend.cu:166-172) — is tried
first; on any compile/runtime/quality failure it falls down a knob ladder
(RGBA8 -> f32 emit -> bf16 table + exact emit) and reports
``"degraded": true`` for the last-resort rung, so a bad knob flip can
never erase a round's perf evidence again.

Quality gates (VERDICT r3 item 5): three pose classes are gated against
the exact T2 octree renderer — the orbit pose (>=52 dB), a steep
split-frame pose (>=45 dB), and the sparse solid scene (>=46 dB) — so
throughput can't silently buy quality. Per-class PSNRs are reported in
the JSON line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import sys
import time
import traceback
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MRAYS = 110.0
_DIR = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(_DIR, ".bench_tree_cache.npz")
CACHE_SPARSE = os.path.join(_DIR, ".bench_sparse_cache.npz")
W = H = 800
# 200 test poses = the canonical NeRF-synthetic test-set size the reference's
# headless protocol times (main_headless.cpp:203-231 renders every pose given)
N_POSES = 200
N_POSES_SPARSE = 96
DEPTH = 7          # 256^3 effective resolution
BASIS_DIM = 16     # SH deg 4 path (BASELINE.json configs[1])
GI = 256           # grid-matched display march setting (CLAUDE.md r3 facts)

# quality floors per pose class (dB vs exact T2 rays). Raised r4 after
# the affine-int8 / dir_win / homography-coords work landed (measured
# 56.26 / 56.53 / 49.80 on chip): ~2+ dB headroom each, so a future knob
# cannot silently spend quality for speed.
FLOOR_ORBIT = 54.0
FLOOR_STEEP = 52.0
FLOOR_SPARSE = 47.5
# NDC/LLFF pose class (volrend.cu:34-54 warp semantics on the slab path;
# VERDICT r4 item 6): floor set from the r5 on-chip measurement (49.84 dB
# with the u8 display emit, docs/PERF_R16.json) minus ~2.3 dB headroom,
# like the others.
FLOOR_NDC = 47.5


def get_tree():
    from volrend_tpu.models.n3tree import N3Tree
    from volrend_tpu.models.synthetic import make_test_tree

    if os.environ.get("VT_BENCH_INJECT_FAIL") == "tree":
        # test hook (tests/test_tools.py): the fail-soft contract must
        # survive any crash — one JSON line, exit 0 (VERDICT r3 item 2)
        raise RuntimeError("injected tree-load failure")
    if os.path.isfile(CACHE):
        try:
            return N3Tree(CACHE)
        except Exception:
            os.unlink(CACHE)
    tree = make_test_tree(max_depth=DEPTH, basis_dim=BASIS_DIM, seed=3,
                          n_blobs=6, sigma_scale=60.0)
    try:
        tree.save_npz(CACHE, compressed=False)
    except Exception:
        pass
    return tree


def get_sparse_tree():
    from volrend_tpu.models.n3tree import N3Tree
    from volrend_tpu.models.synthetic import make_solid_tree

    if os.path.isfile(CACHE_SPARSE):
        try:
            return N3Tree(CACHE_SPARSE)
        except Exception:
            os.unlink(CACHE_SPARSE)
    tree = make_solid_tree(max_depth=DEPTH, basis_dim=BASIS_DIM, seed=3)
    try:
        tree.save_npz(CACHE_SPARSE, compressed=False)
    except Exception:
        pass
    return tree


CACHE_NDC = os.path.join(_DIR, ".bench_ndc_cache.npz")
DEPTH_NDC = 6      # 128^3: keeps the third scene's bake/upload modest


def get_ndc_tree():
    from volrend_tpu.models.n3tree import N3Tree, NdcConfig

    if os.path.isfile(CACHE_NDC):
        try:
            t = N3Tree(CACHE_NDC)
            # save_npz persists only the scene arrays; this cache is ours,
            # so restore the NDC sidecar config on load (without this the
            # cache could never hit and every bench run re-built the tree)
            if not t.use_ndc:
                t.use_ndc = True
                t.ndc = NdcConfig(width=float(W), height=float(H),
                                  focal=1111.11)
            return t
        except Exception:
            os.unlink(CACHE_NDC)
    from volrend_tpu.models.synthetic import make_test_tree
    tree = make_test_tree(max_depth=DEPTH_NDC, basis_dim=BASIS_DIM, seed=4,
                          n_blobs=6, sigma_scale=60.0)
    tree.use_ndc = True
    tree.ndc = NdcConfig(width=float(W), height=float(H), focal=1111.11)
    try:
        tree.save_npz(CACHE_NDC, compressed=False)
    except Exception:
        pass
    return tree


def ndc_pose():
    """The default LLFF forward-facing viewing pose (the viewer's
    ndc_camera geometry: camera just off the z=0 plane, looking down -z
    in the NDC convention)."""
    from volrend_tpu.ops.camera import Camera
    return Camera.from_vectors(center=(0.0, 0.0, 0.2),
                               v_back=(0.05, 0.02, 1.0),
                               v_world_up=(0.0, 1.0, 0.0),
                               width=W, height=H, fx=1111.11)


def orbit_poses(n, radius=2.8, elev=0.45):
    from volrend_tpu.ops.camera import Camera
    cams = []
    for i in range(n):
        th = 2 * np.pi * i / n
        back = np.array([np.cos(th) * np.cos(elev),
                         np.sin(th) * np.cos(elev), np.sin(elev)])
        cams.append(Camera.from_vectors(
            center=tuple(radius * back), v_back=tuple(back),
            width=W, height=H))
    return cams


def steep_pose():
    """A pose past MAX_SLAB_SLOPE that exercises the split-frame fallback
    (tools/perf_split.py elevation-sweep geometry)."""
    from volrend_tpu.ops.camera import Camera
    back = np.asarray([np.cos(1.2), 0.2, np.sin(1.2)])
    back /= np.linalg.norm(back)
    return Camera.from_vectors(
        center=tuple(1.35 * back), v_back=tuple(back),
        v_world_up=(0.0, 1.0, 0.0), width=W, height=H, fx=420.0)


def _log(msg):
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()


def _psnr(got_rgb, exact_rgb):
    mse = float(np.mean((np.asarray(got_rgb, np.float32)
                         - np.asarray(exact_rgb, np.float32)) ** 2))
    return 99.0 if mse < 1e-12 else -10.0 * float(np.log10(mse))


def _exact_rays(dev, cam, opt, stride):
    """Exact T2 per-sample octree rays on a pixel-subsampled grid."""
    import jax.numpy as jnp
    from volrend_tpu.ops import render_jax
    ys = np.arange(0, H, stride)
    xs = np.arange(0, W, stride)
    origins, dirs = cam.pixel_rays(xp=np)
    sel = (ys[:, None] * W + xs[None, :]).reshape(-1)
    exact = np.asarray(render_jax.render_rays(
        dev, jnp.asarray(origins.reshape(-1, 3)[sel]),
        jnp.asarray(dirs.reshape(-1, 3)[sel]), opt))
    return sel, exact


def _as_float_frame(frame):
    frame = np.asarray(frame)
    if frame.dtype == np.uint8:
        return frame.astype(np.float32) / 255.0
    return frame.astype(np.float32)


def setup_scene(tree, log_tag):
    from volrend_tpu.ops import dense_grid
    _log(f"{log_tag}: to_device")
    dev = tree.to_device(lut_depth=None)
    _log(f"{log_tag}: baking dense grid")
    # int8 colors + 14-bit fixed-point sigma, dequantized inside the march
    # kernel: halves HBM stream traffic at 76 dB PSNR vs the f16 grid
    grid = dense_grid.bake_dense(dev, dtype="int8")
    grid.data.block_until_ready()
    _log(f"{log_tag}: bake dispatched")
    return dev, grid


def group_poses(grid, cams, opt):
    import jax.numpy as jnp
    from volrend_tpu.ops import slab_render
    groups = {}
    for c in cams:
        perm, flip, slope = slab_render.choose_axis(
            grid, c.transform, c.fx, c.fy, W, H)
        assert np.isfinite(slope), "orbit pose not slab-renderable"
        groups.setdefault((perm, flip), []).append(c.transform)
    batches = [(jnp.asarray(np.stack(trs), jnp.float32), perm, flip)
               for (perm, flip), trs in groups.items()]
    static_pf = tuple((perm, flip) for _, perm, flip in batches)
    pay_by_perm = {}
    for _, perm, flip in batches:
        if perm not in pay_by_perm:
            pay_by_perm[perm] = slab_render.prepare_payload(grid, perm, opt)
    payloads = tuple(pay_by_perm[perm] for _, perm, flip in batches)
    trs_list = tuple(t for t, _, _ in batches)
    return trs_list, payloads, static_pf


def run_throughput(grid, trs_list, payloads, static_pf, fx, fy, opt,
                   n_poses, out_dtype=None, reps=2):
    """One-dispatch multi-group batch render; returns (Mrays/s, rep times).

    ALL pose groups render inside one jitted call: every dispatch through
    the tunnel costs a ~26 ms round trip, so the whole benchmark is a
    single dispatch + a single host transfer of per-pose checksums.
    """
    import jax
    import jax.numpy as jnp
    from volrend_tpu.ops import slab_render

    @partial(jax.jit, static_argnames=("pf",))
    def render_all(grid, trs_list, pays, pf):
        outs = []
        for (perm, flip), trs, pay in zip(pf, trs_list, pays):
            out = slab_render.render_frames(
                grid, trs, fx, fy, perm, flip, W, H, opt, gi=GI,
                payload=pay, out_dtype=out_dtype)
            outs.append(jnp.sum(out, dtype=jnp.float32, axis=(1, 2)))
        return jnp.concatenate(outs)

    np.asarray(render_all(grid, trs_list, payloads, static_pf))
    _log("compiled")

    # best-of-reps: the axon relay occasionally stalls a single dispatch for
    # seconds right after big uploads (measured 5 vs 123 Mrays/s for the
    # same binary); the min is the honest steady-state number
    dts = []
    for _rep in range(reps):
        t0 = time.perf_counter()
        total = np.asarray(render_all(grid, trs_list, payloads, static_pf))
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    assert np.all(np.isfinite(total)), "non-finite pose checksums"
    mrays = n_poses * W * H / dt / 1e6
    _log(f"throughput {mrays:.1f} Mrays/s ({mrays / BASELINE_MRAYS:.2f}x); "
         f"reps {[round(d, 3) for d in dts]}")
    return mrays, dts


def gate_orbit(dev, grid, cam, opt, out_dtype, stride=5):
    """Orbit-pose PSNR vs exact rays, rendered with the SAME display knobs
    as the throughput run so they are priced into the number."""
    import jax.numpy as jnp
    from volrend_tpu.ops import slab_render
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    frame = _as_float_frame(slab_render.render_frame(
        grid, jnp.asarray(cam.transform), cam.fx, cam.fy, perm, flip,
        W, H, opt, gi=GI, out_dtype=out_dtype))
    sel, exact = _exact_rays(dev, cam, opt, stride)
    got = frame.reshape(-1, 4)[sel]
    return _psnr(got[:, :3], exact[:, :3])


def gate_steep(dev, grid, opt, out_dtype=None, stride=8):
    """Split-frame steep-pose PSNR vs exact rays (render_image routes the
    past-MAX_SLAB_SLOPE pose through the <=6-pass split renderer), rendered
    with the SAME display dtype as the throughput run so uint8 display
    quantization is priced into this gate too (the split path stitches in
    f32 and converts once at the end)."""
    from volrend_tpu.ops import slab_render
    cam = steep_pose()
    frame = _as_float_frame(slab_render.render_image(
        grid, cam, opt, gi=GI, out_dtype=out_dtype))
    sel, exact = _exact_rays(dev, cam, opt, stride)
    got = frame.reshape(-1, 4)[sel]
    return _psnr(got[:, :3], exact[:, :3])


def main():
    import jax  # noqa: F401  (device init before timers)
    import jax.numpy as jnp
    from volrend_tpu.ops import display_warp, slab_render
    from volrend_tpu.utils.options import RenderOptions

    result = {
        "metric": "render_throughput_800x800_sh16",
        "value": 0.0,
        "unit": "Mrays/s",
        "vs_baseline": 0.0,
    }
    errors = []
    opt = RenderOptions(max_steps=1024)

    _log("loading tree")
    tree = get_tree()
    dev, grid = setup_scene(tree, "dense")

    cams = orbit_poses(N_POSES)
    trs_list, payloads, static_pf = group_poses(grid, cams, opt)
    fx, fy = cams[0].fx, cams[0].fy
    _log(f"{len(static_pf)} pose groups: "
         f"{[(pf, int(t.shape[0])) for pf, t in zip(static_pf, trs_list)]}")

    # knob ladder, fastest first. Each entry: (name, display-warp knobs +
    # emit dtype). A later entry only runs if every earlier one failed to
    # produce a gated number (VERDICT r3 item 2: the bench must fail soft).
    # The HEADLINE config is the RGBA8 display write-out — the protocol the
    # reference times (surf2Dwrite RGBA8, volrend.cu:166-172); it gates at
    # 55.90/49.83 dB on chip (tools/perf_r15.py), ~2 dB over the floors.
    # Note: ANY rung failure is recorded in ``errors`` and so degrades the
    # run (a fast8 -> fast fall means the RGBA8 protocol config broke);
    # landing on the last-resort 'safe' rung additionally degrades by
    # itself even if nothing errored before it.
    ladder = [
        ("fast8", dict(table_int8=True, exact_emit=False, out=jnp.uint8)),
        ("fast", dict(table_int8=True, exact_emit=False, out=None)),
        ("safe", dict(table_int8=False, exact_emit=True, out=None)),
    ]

    mrays = None
    psnr_orbit = psnr_steep = None
    config_name = None
    out_dtype = None
    for li, (name, knobs) in enumerate(ladder):
        try:
            if li > 0:
                # knob flips are read at trace time: drop cached traces
                import jax as _jax
                _jax.clear_caches()
            display_warp._TABLE_INT8 = knobs["table_int8"]
            display_warp._EXACT_EMIT = knobs["exact_emit"]
            _log(f"config '{name}': {knobs}")
            m, _ = run_throughput(grid, trs_list, payloads, static_pf,
                                  fx, fy, opt, N_POSES,
                                  out_dtype=knobs["out"])
            _log("quality gate: orbit pose vs exact rays")
            p_orbit = gate_orbit(dev, grid, cams[0], opt, knobs["out"])
            _log(f"psnr_orbit {p_orbit:.2f} dB (floor {FLOOR_ORBIT})")
            if p_orbit < FLOOR_ORBIT:
                raise AssertionError(
                    f"orbit gate: {p_orbit:.2f} dB < {FLOOR_ORBIT}")
            mrays, psnr_orbit, config_name = m, p_orbit, name
            out_dtype = knobs["out"]
            break
        except Exception as e:
            errors.append(f"{name}: {type(e).__name__}: {e}")
            _log(f"config '{name}' FAILED: {e}")
            traceback.print_exc(file=sys.stderr)

    if mrays is not None:
        result.update(
            value=round(mrays, 3),
            vs_baseline=round(mrays / BASELINE_MRAYS, 4),
            psnr_orbit_db=round(psnr_orbit, 2),
            psnr_vs_exact_db=round(psnr_orbit, 2),  # legacy key
            config=config_name,
        )

    # ---- extra: f32 emit throughput (fail-soft, informational) ------------
    # The precise-display emit (float frames, no display quantization) —
    # the headline number above is the reference-protocol RGBA8 write-out.
    if mrays is not None and config_name == ladder[0][0]:
        try:
            _log("extra: f32 emit throughput")
            mf, _ = run_throughput(grid, trs_list, payloads, static_pf,
                                   fx, fy, opt, N_POSES, out_dtype=None)
            result["mrays_f32"] = round(mf, 3)
        except Exception as e:
            errors.append(f"f32: {type(e).__name__}: {e}")
            _log(f"f32 extra FAILED: {e}")
            traceback.print_exc(file=sys.stderr)

    # ---- steep split-frame pose gate (fail-soft) --------------------------
    try:
        _log("quality gate: steep split-frame pose")
        psnr_steep = gate_steep(dev, grid, opt, out_dtype=out_dtype)
        _log(f"psnr_steep {psnr_steep:.2f} dB (floor {FLOOR_STEEP})")
        result["psnr_steep_db"] = round(psnr_steep, 2)
        if psnr_steep < FLOOR_STEEP:
            errors.append(f"steep gate: {psnr_steep:.2f} dB < {FLOOR_STEEP}")
    except Exception as e:
        errors.append(f"steep: {type(e).__name__}: {e}")
        _log(f"steep gate FAILED: {e}")
        traceback.print_exc(file=sys.stderr)

    # ---- sparse solid-scene throughput + gate (fail-soft) -----------------
    # Realistic-occupancy scene (solid objects in empty space, ~6% voxel
    # occupancy at G=256): the slab-culling path the dense fog scene can't
    # exercise. Throughput reported as an extra key; PSNR gated.
    try:
        _log("sparse scene: loading tree")
        stree = get_sparse_tree()
        sdev, sgrid = setup_scene(stree, "sparse")
        scams = orbit_poses(N_POSES_SPARSE)
        strs, spays, spf = group_poses(sgrid, scams, opt)
        sm, _ = run_throughput(sgrid, strs, spays, spf,
                               scams[0].fx, scams[0].fy, opt,
                               N_POSES_SPARSE, out_dtype=out_dtype)
        result["sparse_mrays"] = round(sm, 3)
        _log("quality gate: sparse orbit pose")
        p_sparse = gate_orbit(sdev, sgrid, scams[0], opt, out_dtype,
                              stride=8)
        _log(f"psnr_sparse {p_sparse:.2f} dB (floor {FLOOR_SPARSE})")
        result["psnr_sparse_db"] = round(p_sparse, 2)
        if p_sparse < FLOOR_SPARSE:
            errors.append(f"sparse gate: {p_sparse:.2f} dB < {FLOOR_SPARSE}")
    except Exception as e:
        errors.append(f"sparse: {type(e).__name__}: {e}")
        _log(f"sparse scene FAILED: {e}")
        traceback.print_exc(file=sys.stderr)

    # ---- NDC/LLFF pose gate (fail-soft; VERDICT r4 item 6) ----------------
    # The forward-facing NDC warp class (volrend.cu:34-54 /
    # n3tree.cpp:131-148) on the slab fast path, gated with the SAME
    # display dtype as the headline so a knob flip can't silently burn
    # NDC quality without the round record noticing.
    try:
        _log("ndc scene: loading tree")
        ntree = get_ndc_tree()
        ndev, ngrid = setup_scene(ntree, "ndc")
        ncam = ndc_pose()
        from volrend_tpu.ops import slab_render as _sr
        nperm, nflip, nslope = _sr.choose_axis(
            ngrid, ncam.transform, ncam.fx, ncam.fy, W, H)
        assert np.isfinite(nslope), "NDC pose not slab-renderable"
        _log("quality gate: NDC forward-facing pose")
        nframe = _as_float_frame(_sr.render_frame(
            ngrid, jnp.asarray(ncam.transform), ncam.fx, ncam.fy,
            nperm, nflip, W, H, opt, gi=GI, out_dtype=out_dtype))
        nsel, nexact = _exact_rays(ndev, ncam, opt, stride=8)
        ngot = nframe.reshape(-1, 4)[nsel]
        p_ndc = _psnr(ngot[:, :3], nexact[:, :3])
        _log(f"psnr_ndc {p_ndc:.2f} dB (floor {FLOOR_NDC})")
        result["psnr_ndc_db"] = round(p_ndc, 2)
        if p_ndc < FLOOR_NDC:
            errors.append(f"ndc gate: {p_ndc:.2f} dB < {FLOOR_NDC}")
    except Exception as e:
        errors.append(f"ndc: {type(e).__name__}: {e}")
        _log(f"ndc gate FAILED: {e}")
        traceback.print_exc(file=sys.stderr)

    # ANY recorded error degrades the run — a gate-section crash (e.g. a
    # Mosaic compile failure in the steep/sparse render) means a quality
    # class was never gated, which is as degraded as a failed gate. The
    # fast8/fast rungs are both full-quality configs (they differ only in
    # the display write-out dtype); only the last-resort 'safe' rung (or
    # no number at all) marks the run degraded by itself.
    degraded = (mrays is None or config_name == "safe" or bool(errors))
    if errors:
        result["errors"] = errors[:4]
    if degraded:
        result["degraded"] = True
    print(json.dumps(result))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # the JSON line must survive anything
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "render_throughput_800x800_sh16",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "degraded": True,
            "errors": [f"{type(e).__name__}: {e}"],
        }))
    sys.exit(0)
