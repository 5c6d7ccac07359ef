"""Training-throughput benchmark: FrameTrainer ms/step at 800^2, G=128.

The differentiable stack (bake -> Pallas slab march fwd+bwd -> precise
superquad warp VJP -> optax update) has parity gates but, before round 4,
no perf artifact. This captures train_ms_per_step single-chip at the scale
CLAUDE.md says fits one 16 GB chip (G=128; bench scale G=256 is the
leaf-sharded multi-chip regime).

Protocol mirrors bench.py: one pose group, steps dispatched in sequence,
each step ending in the loss host transfer (the only real sync on the
axon tunnel); steady-state median over the timed steps. Writes
docs/BENCH_TRAIN.json and prints one JSON line.

Round 5 adds the bench-scale attempt (VERDICT r4 item 4):
``--depth 7 --lean --key g256_lean`` tries a G=256 step on one chip with
the lean memory mode (bf16 Adam moments + bf16 backward payload
cotangent, FrameTrainer(lean=True)); an OOM is recorded as a parked
entry with the failure text instead of crashing the artifact.

Usage: python tools/bench_train.py [--steps 30] [--size 800] [--cpu-smoke]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_T0 = time.perf_counter()


def _log(m):
    print(f"[train-bench +{time.perf_counter() - _T0:6.1f}s] {m}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--gi", type=int, default=256)
    ap.add_argument("--poses", type=int, default=4)
    ap.add_argument("--cpu-smoke", action="store_true",
                    help="tiny CPU run to validate the script")
    ap.add_argument("--out", default=None,
                    help="write the JSON artifact here "
                         "(default docs/BENCH_TRAIN.json on TPU)")
    ap.add_argument("--lean", action="store_true",
                    help="FrameTrainer(lean=True): bf16 Adam moments + "
                         "bf16 backward payload cotangent")
    ap.add_argument("--key", default=None,
                    help="merge the record under this key in the artifact "
                         "instead of overwriting it (e.g. g256_lean)")
    args = ap.parse_args()

    import jax
    if args.cpu_smoke:
        jax.config.update("jax_platforms", "cpu")
        args.size, args.depth, args.gi = 64, 4, 32
        args.steps, args.poses = 3, 2
    import jax.numpy as jnp
    from volrend_tpu.models.synthetic import make_solid_tree
    from volrend_tpu.ops.camera import Camera
    from volrend_tpu.train import FrameTrainer
    from volrend_tpu.utils.options import RenderOptions

    W = H = args.size
    _log(f"scene: depth={args.depth}, {W}x{H}, gi={args.gi}, "
         f"backend={jax.default_backend()}")
    tree = make_solid_tree(max_depth=args.depth, basis_dim=9, seed=7)
    dev = tree.to_device(lut_depth=None)
    opt = RenderOptions(max_steps=1024)
    try:
        tr = FrameTrainer(dev, opt=opt, lr=5e-2, gi=args.gi,
                          lean=args.lean)
    except Exception as e:
        _write(args, {
            "metric": "train_ms_per_step", "value": None, "unit": "ms",
            "status": "parked",
            "error": f"{type(e).__name__}: {e}"[:500],
            "grid": 2 ** (args.depth + 1), "lean": args.lean,
            "resolution": [args.size, args.size], "gi": args.gi,
        })
        return

    cams, targets = [], []
    for i in range(args.poses):
        th = 0.25 + 0.1 * i
        back = np.array([np.cos(th), np.sin(th), 0.45])
        back /= np.linalg.norm(back)
        cams.append(Camera.from_vectors(
            center=tuple(2.6 * back), v_back=tuple(back),
            width=W, height=H))
        targets.append(jnp.asarray(
            np.full((H, W, 4), 0.5, np.float32)))

    _log("compiling first step")
    try:
        for s in range(args.warmup):
            loss = tr.step_frame(cams[s % args.poses],
                                 targets[s % args.poses])
    except Exception as e:
        # fail-soft: an OOM at bench scale is a PARKED artifact entry,
        # not a crashed script (VERDICT r4 item 4)
        _write(args, {
            "metric": "train_ms_per_step", "value": None, "unit": "ms",
            "status": "parked",
            "error": f"{type(e).__name__}: {e}"[:500],
            "grid": int(tr.grid.G), "lean": args.lean,
            "resolution": [args.size, args.size], "gi": args.gi,
            "memory_arithmetic": _mem_arithmetic(int(tr.grid.G), 28,
                                                 args.lean),
        })
        return
    _log(f"warm (loss {loss:.5f}); timing {args.steps} steps")

    dts = []
    for s in range(args.steps):
        t0 = time.perf_counter()
        loss = tr.step_frame(cams[s % args.poses],
                             targets[s % args.poses])  # float() = sync
        dts.append(time.perf_counter() - t0)
    assert np.isfinite(loss), "non-finite training loss"
    ms_sync = float(np.median(dts) * 1e3)
    _log(f"synced median {ms_sync:.1f} ms/step (min {min(dts) * 1e3:.1f}, "
         f"max {max(dts) * 1e3:.1f})")

    # pipelined: steps enqueue without per-step host syncs (sync=False) —
    # the steady-state regime of a real training loop; the per-step sync
    # above additionally pays the full dispatch round trip (~26 ms on the
    # axon tunnel) every step. One loss fetch at the end synchronizes.
    t0 = time.perf_counter()
    for s in range(args.steps):
        loss = tr.step_frame(cams[s % args.poses],
                             targets[s % args.poses], sync=False)
    loss = float(loss)
    ms = (time.perf_counter() - t0) / args.steps * 1e3
    assert np.isfinite(loss), "non-finite training loss (pipelined)"
    _log(f"pipelined {ms:.1f} ms/step over {args.steps} steps")

    rec = {
        "metric": "train_ms_per_step",
        "value": round(ms, 2),
        "unit": "ms",
        "timing": "pipelined (no per-step host sync; loss fetched once "
                  "at the end — the steady-state training-loop regime)",
        "ms_per_step_synced": round(ms_sync, 2),
        "resolution": [H, W],
        "grid": int(tr.grid.G),
        "gi": args.gi,
        "steps_timed": args.steps,
        "rays_per_s": round(W * H / (ms / 1e3) / 1e6, 2),
        "platform": jax.default_backend(),
    }
    if args.lean:
        rec["lean"] = True
    _write(args, rec)


def _mem_arithmetic(G, D, lean):
    """Static HBM budget of one FrameTrainer step (GB), for the parked
    OOM record: the measured options and what each bought."""
    gb = 1 / 2 ** 30
    vox = G ** 3 * D
    pyr = 1.14 * vox * 4 * gb          # f32 pyramid params (all levels)
    mom = 1.14 * vox * (2 if lean else 8) * gb   # adam m+v (bf16 if lean)
    pay = vox * (2 if lean else 4) * gb          # planar payload (+copy)
    cot = vox * (2 if lean else 4) * gb          # bwd payload cotangent
    pgrad = 1.14 * vox * 4 * gb        # f32 pyramid grads
    bake_t = vox * 4 * gb              # f32 bake transient pre-cast
    return {
        "voxels": vox,
        "pyramid_f32_gb": round(pyr, 2),
        "adam_moments_gb": round(mom, 2),
        "planar_payload_gb": round(pay, 2),
        "payload_cotangent_gb": round(cot, 2),
        "pyramid_grads_f32_gb": round(pgrad, 2),
        "bake_transient_f32_gb": round(bake_t, 2),
        "sum_gb": round(pyr + mom + pay + cot + pgrad + bake_t, 2),
        "hbm_gb": 16,
        "levers_applied": (["bf16 moments (lean_adam)",
                            "bf16 planar + residual",
                            "bf16 bwd cotangent (_GRAD_BF16)",
                            "display-bake payload dropped"] if lean
                           else []),
        "note": ("z-sharded training (step_frame_zsharded) is the "
                 "designed multi-chip configuration for this scale"),
    }


def _write(args, rec):
    import json as _json
    out = args.out or (None if args.cpu_smoke
                       else os.path.join(os.path.dirname(
                           os.path.dirname(os.path.abspath(__file__))),
                           "docs", "BENCH_TRAIN.json"))
    if out:
        doc = {}
        if os.path.isfile(out):
            try:
                with open(out) as f:
                    doc = _json.load(f)
            except Exception:
                doc = {}
        if args.key:
            doc[args.key] = rec
        else:
            # merge: update the base record's fields but PRESERVE keyed
            # sub-records (a plain rerun must not delete e.g. g256_lean).
            # memory_arithmetic belongs to a parked base record only —
            # never carry it into a later healthy one
            doc = {k: v for k, v in doc.items()
                   if isinstance(v, dict) and k != "memory_arithmetic"}
            doc.update(rec)
        with open(out, "w") as f:
            _json.dump(doc, f, indent=1)
        _log(f"wrote {out}")
    print(_json.dumps(rec))


if __name__ == "__main__":
    main()
