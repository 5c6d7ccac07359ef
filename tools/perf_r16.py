"""r5 on-chip A/B probe: superquad cascade candidates, in-plane crop,
NDC floor measurement.

Decides the r5 production knobs BEFORE bench.py runs them (kernel-knob
policy: measure on chip, then commit the flip):

  A. display cascade: r4 production ((2,2),(2,4))x(4,4) vs the r5
     candidate appending ((4,4),(5,5)) (1/4 the gather rows; fits all
     200 bench poses on the CPU geometry check)
  B. sparse-scene in-plane occupancy crop: _INPLANE_CROP off/on
  C. NDC forward-facing pose: PSNR vs exact (sets bench FLOOR_NDC) +
     throughput

Reuses bench.py's scene/pose/throughput machinery. One chip claim, no
timeout wrappers (chip_session protocol).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def _log(m):
    print(f"[perf_r16 +{time.perf_counter() - _T0:6.1f}s] {m}",
          file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from volrend_tpu.ops import display_warp, slab_render
    from volrend_tpu.utils.options import RenderOptions

    n_poses = int(os.environ.get("R16_POSES", "48"))
    opt = RenderOptions(max_steps=1024)
    out = {}

    # ---- dense scene ------------------------------------------------------
    _log("dense scene setup")
    tree = bench.get_tree()
    dev, grid = bench.setup_scene(tree, "dense")
    cams = bench.orbit_poses(n_poses)
    trs_list, payloads, static_pf = bench.group_poses(grid, cams, opt)
    fx, fy = cams[0].fx, cams[0].fy

    cascades = {
        "r4_24w44": (((2, 2), (4, 4)), ((2, 4), (4, 4))),
        "r5_44w55": (((2, 2), (4, 4)), ((4, 4), (5, 5))),
        "r5_44w54": (((2, 2), (4, 4)), ((4, 4), (5, 4))),
    }
    for name, casc in cascades.items():
        display_warp._CASCADE = casc
        jax.clear_caches()
        try:
            m, dts = bench.run_throughput(
                grid, trs_list, payloads, static_pf, fx, fy, opt,
                n_poses, out_dtype=jnp.uint8)
            out[f"dense_{name}_mrays"] = round(m, 1)
            _log(f"dense {name}: {m:.1f} Mrays/s")
        except Exception as e:
            out[f"dense_{name}_mrays"] = f"FAIL: {e}"
            _log(f"dense {name} FAILED: {e}")
    display_warp._CASCADE = cascades["r4_24w44"]
    jax.clear_caches()

    # quality spot-check for the candidate cascade (orbit pose vs exact)
    try:
        display_warp._CASCADE = cascades["r5_44w55"]
        jax.clear_caches()
        p = bench.gate_orbit(dev, grid, cams[0], opt, jnp.uint8)
        out["dense_r5_44w55_psnr_orbit"] = round(p, 2)
        _log(f"candidate cascade psnr_orbit {p:.2f} dB")
    except Exception as e:
        out["dense_r5_44w55_psnr_orbit"] = f"FAIL: {e}"
    finally:
        display_warp._CASCADE = cascades["r4_24w44"]
        jax.clear_caches()

    # ---- sparse scene: crop off/on ---------------------------------------
    _log("sparse scene setup")
    stree = bench.get_sparse_tree()
    sdev, sgrid = bench.setup_scene(stree, "sparse")
    scams = bench.orbit_poses(min(n_poses, 48))
    for crop_on in (False, True):
        slab_render._INPLANE_CROP = crop_on
        jax.clear_caches()
        try:
            strs, spays, spf = bench.group_poses(sgrid, scams, opt)
            if crop_on:
                crops = {perm: slab_render.inplane_crop(
                    sgrid, perm, float(opt.sigma_thresh))
                    for (perm, _f) in spf}
                out["sparse_crops"] = {str(k): v for k, v in crops.items()}
                _log(f"crops: {crops}")
            m, _ = bench.run_throughput(
                sgrid, strs, spays, spf, scams[0].fx, scams[0].fy, opt,
                len(scams), out_dtype=jnp.uint8)
            key = "sparse_crop_on" if crop_on else "sparse_crop_off"
            out[f"{key}_mrays"] = round(m, 1)
            _log(f"{key}: {m:.1f} Mrays/s")
            if crop_on:
                p = bench.gate_orbit(sdev, sgrid, scams[0], opt,
                                     jnp.uint8, stride=8)
                out["sparse_crop_on_psnr"] = round(p, 2)
                _log(f"sparse crop-on psnr {p:.2f} dB")
        except Exception as e:
            out[f"sparse_crop_{'on' if crop_on else 'off'}_mrays"] = \
                f"FAIL: {e}"
            _log(f"sparse crop={crop_on} FAILED: {e}")
    slab_render._INPLANE_CROP = False
    jax.clear_caches()

    # crop + candidate cascade together (the r5 production config)
    try:
        slab_render._INPLANE_CROP = True
        display_warp._CASCADE = cascades["r5_44w55"]
        jax.clear_caches()
        strs, spays, spf = bench.group_poses(sgrid, scams, opt)
        m, _ = bench.run_throughput(
            sgrid, strs, spays, spf, scams[0].fx, scams[0].fy, opt,
            len(scams), out_dtype=jnp.uint8)
        out["sparse_crop_cascade_mrays"] = round(m, 1)
        _log(f"sparse crop+cascade: {m:.1f} Mrays/s")
        # dense with crop enabled must be unchanged (fog scene: no crop)
        dtrs, dpays, dpf = bench.group_poses(grid, cams[:8], opt)
        m, _ = bench.run_throughput(grid, dtrs, dpays, dpf, fx, fy, opt,
                                    8, out_dtype=jnp.uint8)
        out["dense_crop_cascade_mrays_8p"] = round(m, 1)
        _log(f"dense crop+cascade (8 poses): {m:.1f} Mrays/s")
    except Exception as e:
        out["sparse_crop_cascade_mrays"] = f"FAIL: {e}"
        _log(f"crop+cascade FAILED: {e}")
    finally:
        slab_render._INPLANE_CROP = False
        display_warp._CASCADE = cascades["r4_24w44"]
        jax.clear_caches()

    # ---- NDC pose: floor measurement + throughput -------------------------
    try:
        _log("ndc scene setup")
        ntree = bench.get_ndc_tree()
        ndev, ngrid = bench.setup_scene(ntree, "ndc")
        ncam = bench.ndc_pose()
        nperm, nflip, nslope = slab_render.choose_axis(
            ngrid, ncam.transform, ncam.fx, ncam.fy, bench.W, bench.H)
        assert np.isfinite(nslope)
        frame = bench._as_float_frame(slab_render.render_frame(
            ngrid, jnp.asarray(ncam.transform), ncam.fx, ncam.fy,
            nperm, nflip, bench.W, bench.H, opt, gi=bench.GI,
            out_dtype=jnp.uint8))
        nsel, nexact = bench._exact_rays(ndev, ncam, opt, stride=8)
        p = bench._psnr(frame.reshape(-1, 4)[nsel][:, :3],
                        nexact[:, :3])
        out["ndc_psnr_u8"] = round(p, 2)
        _log(f"ndc psnr (u8 display) {p:.2f} dB")
    except Exception as e:
        out["ndc_psnr_u8"] = f"FAIL: {e}"
        _log(f"ndc FAILED: {e}")

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "PERF_R16.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    _log(f"wrote {path}")


if __name__ == "__main__":
    main()
