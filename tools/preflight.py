"""TPU kernel-config preflight: compile + run every Pallas kernel variant
the product surfaces actually use, on the real chip, at small scale.

Round 3 shipped a knob flip (in-kernel f32->uint8 emit) whose Mosaic
lowering crash was invisible to the CPU suite (interpret mode cannot catch
lowering failures) and erased the round's benchmark. This gate makes that
failure mode structurally impossible: run it on the chip BEFORE committing
any kernel-knob default change (policy in CLAUDE.md).

Matrix covered (one small scene, W=H=256, gi=128):
  display warp : {f32, uint8 out} x {int8, bf16 table} x {fast, exact emit}
  mesh         : compositing on the display warp fast path
  march        : SH16 forward, depth mode, split-frame steep pose
  training     : fused Pallas fwd+bwd (slab_grad step) at G=64

Exit code: 0 iff every variant compiles AND executes; prints a PASS/FAIL
line per variant plus one JSON summary line.

Usage: python tools/preflight.py            (on the TPU; ~3-6 min)
       python tools/preflight.py --cpu      (interpret-mode dry run)
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def _log(msg):
    print(f"[preflight +{time.perf_counter() - _T0:6.1f}s] {msg}",
          flush=True)


W = H = 256
GI = 128
DEPTH = 5


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_test_tree
    from volrend_tpu.ops import dense_grid, display_warp, pallas_slab, \
        slab_render
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.utils.options import RenderOptions

    on_tpu = pallas_slab.available()
    if not on_tpu and "--cpu" not in sys.argv:
        _log("no TPU available; rerun with --cpu for an interpret dry run")
        print(json.dumps({"preflight": "skipped", "reason": "no TPU"}))
        return 0
    if not on_tpu:
        pallas_slab._FORCE_INTERPRET = True

    _log(f"scene: depth={DEPTH} grid, {W}x{H}, gi={GI}, "
         f"{'TPU' if on_tpu else 'CPU interpret'}")
    tree = make_test_tree(max_depth=DEPTH, basis_dim=16, seed=3,
                          n_blobs=6, sigma_scale=60.0)
    dev = tree.to_device(lut_depth=None)
    grid = dense_grid.bake_dense(dev, dtype="int8")
    np.asarray(grid.data[:1, :1])  # force the bake through the tunnel
    opt = RenderOptions(max_steps=512)

    cam = Camera.from_vectors(center=(2.0, 1.2, 1.4),
                              v_back=(0.74, 0.45, 0.5),
                              width=W, height=H)
    perm, flip, _ = slab_render.choose_axis(
        grid, cam.transform, cam.fx, cam.fy, W, H)
    tr = jnp.asarray(cam.transform, jnp.float32)

    results = {}

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            out = np.asarray(fn())
            assert np.all(np.isfinite(out.astype(np.float32))), "non-finite"
            results[name] = "PASS"
            _log(f"PASS {name} ({time.perf_counter() - t0:.1f}s)")
        except Exception as e:
            results[name] = f"FAIL: {type(e).__name__}: {e}"
            _log(f"FAIL {name}: {e}")
            traceback.print_exc()

    def render(out_dtype=None, table_int8=True, exact=False,
               mesh=False, depth_mode=False):
        old = (display_warp._TABLE_INT8, display_warp._EXACT_EMIT)
        display_warp._TABLE_INT8 = table_int8
        display_warp._EXACT_EMIT = exact
        try:
            jax.clear_caches()
            kw = {}
            if mesh:
                md = np.full((H, W), np.inf, np.float32)
                md[H // 3: H // 2, W // 3: W // 2] = 1.2
                mc = np.zeros((H, W, 3), np.float32)
                mc[H // 3: H // 2, W // 3: W // 2] = 0.5
                kw = dict(mesh_dist=jnp.asarray(md), mesh_rgb=jnp.asarray(mc))
            ropt = (opt if not depth_mode
                    else opt.replace(render_depth=True))
            return slab_render.render_frame(
                grid, tr, cam.fx, cam.fy, perm, flip, W, H, ropt,
                gi=GI, out_dtype=out_dtype, **kw)
        finally:
            display_warp._TABLE_INT8, display_warp._EXACT_EMIT = old

    # -- display warp matrix (the r3 failure surface) -----------------------
    check("warp_f32_int8_fast", lambda: render())
    check("warp_u8_int8_fast", lambda: render(out_dtype=jnp.uint8))
    check("warp_f32_bf16_exact",
          lambda: render(table_int8=False, exact=True))
    check("warp_u8_bf16_exact",
          lambda: render(out_dtype=jnp.uint8, table_int8=False, exact=True))
    check("warp_u8_mesh", lambda: render(out_dtype=jnp.uint8, mesh=True))
    # -- r5 cascade candidate: (4,4)-block x (5,5)-window superquad ---------
    def render_cascade(out_dtype=None):
        old = display_warp._CASCADE
        display_warp._CASCADE = (((2, 2), (4, 4)), ((4, 4), (5, 5)))
        try:
            jax.clear_caches()
            return slab_render.render_frame(
                grid, tr, cam.fx, cam.fy, perm, flip, W, H, opt,
                gi=GI, out_dtype=out_dtype)
        finally:
            display_warp._CASCADE = old
            jax.clear_caches()

    check("warp_sq44w55_f32", render_cascade)
    check("warp_sq44w55_u8", lambda: render_cascade(jnp.uint8))

    # -- r5 in-plane occupancy crop (sparse-scene march) --------------------
    def render_cropped():
        from volrend_tpu.models.synthetic import make_solid_tree
        old = slab_render._INPLANE_CROP
        slab_render._INPLANE_CROP = True
        try:
            jax.clear_caches()
            stree = make_solid_tree(max_depth=DEPTH, basis_dim=16, seed=3)
            sdev = stree.to_device(lut_depth=None)
            sgrid = dense_grid.bake_dense(sdev, dtype="int8")
            sperm, sflip, sl = slab_render.choose_axis(
                sgrid, cam.transform, cam.fx, cam.fy, W, H)
            assert np.isfinite(sl)
            crop = slab_render.inplane_crop(sgrid, sperm,
                                            float(opt.sigma_thresh))
            _log(f"  crop={crop} (G={sgrid.G})")
            return slab_render.render_frame(
                sgrid, tr, cam.fx, cam.fy, sperm, sflip, W, H, opt, gi=GI)
        finally:
            slab_render._INPLANE_CROP = old
            jax.clear_caches()

    check("march_inplane_crop", render_cropped)

    # -- march modes ---------------------------------------------------------
    check("march_depth", lambda: render(depth_mode=True))

    def split():
        back = np.asarray([np.cos(1.2), 0.2, np.sin(1.2)])
        back /= np.linalg.norm(back)
        scam = Camera.from_vectors(
            center=tuple(1.35 * back), v_back=tuple(back),
            v_world_up=(0.0, 1.0, 0.0), width=W, height=H, fx=140.0)
        return slab_render.render_image(grid, scam, opt, gi=GI)

    check("march_split_steep", split)

    # -- training fused fwd+bwd kernels (G=16 probe scale) -------------------
    def train_step():
        from volrend_tpu.ops import slab_grad
        ttree = make_test_tree(max_depth=4, basis_dim=16, seed=5,
                               n_blobs=3, sigma_scale=40.0)
        tdev = ttree.to_device(lut_depth=None)
        tgrid = dense_grid.bake_dense(tdev)
        bmap = slab_grad.build_bake_map(tdev)
        data32 = jnp.asarray(tdev.data, jnp.float32)
        tcam = Camera.from_vectors(center=(2.0, 1.2, 1.4),
                                   v_back=(0.74, 0.45, 0.5),
                                   width=128, height=128)
        tperm, tflip, _ = slab_render.choose_axis(
            tgrid, tcam.transform, tcam.fx, tcam.fy, 128, 128)
        topt = opt.replace(renormalize=False)

        def loss_fn(d):
            out = slab_grad.render_frame_train(
                d, bmap, tgrid, jnp.asarray(tcam.transform, jnp.float32),
                tcam.fx, tcam.fy, tperm, tflip, 128, 128, topt, gi=128,
                backend="pallas" if on_tpu else "auto")
            return jnp.mean(out[..., :3] ** 2)

        return jax.grad(loss_fn)(data32)

    check("train_fused_fwd_bwd", train_step)

    # -- r5 lean-training bwd kernel (bf16 payload cotangent) ----------------
    def train_step_bf16():
        from volrend_tpu.ops import slab_grad
        old = slab_grad._GRAD_BF16
        slab_grad._GRAD_BF16 = True
        try:
            jax.clear_caches()
            return train_step()
        finally:
            slab_grad._GRAD_BF16 = old
            jax.clear_caches()

    check("train_bwd_bf16", train_step_bf16)

    failed = {k: v for k, v in results.items() if v != "PASS"}
    print(json.dumps({
        "preflight": "FAIL" if failed else "PASS",
        "platform": "tpu" if on_tpu else "cpu-interpret",
        "variants": results,
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
