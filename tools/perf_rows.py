"""Gather row-width sweep: does widening quad rows raise row throughput?

Measured so far (640k rows unless noted): 8 B rows 86 Mrow/s, 32 B rows
457 Mrow/s, 128 B rows (160k) 667 Mrow/s — the row rate seems to GROW
with width. If a padded 64/128 B quad row gathers at the wide-row rate,
the 800^2 display warp's gather drops from 1.4 ms toward ~1.0.

  r32   (gi-1)^2 x 16ch f16 table (current production)
  r64f  16ch f32 table (64 B rows, no padding waste, f32 combine)
  r64p  32ch f16 table (64 B rows, 2x padded)
  r128p 64ch f16 table (128 B rows, 4x padded)
All with salted smooth indices, 640k rows, 24-pose lax.map.

RESULT (v5e): r32 449, r64f 403, r64p 441, r128p 444 Mrow/s — FLAT.
Row width does NOT raise the per-row rate at 640k rows; the earlier
667 Mrow/s reading was a 160k-row (superquad) effect. The 800^2 display
warp's ~1.43 ms gather is the design's floor.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import bench as bench_mod
from volrend_tpu.ops import dense_grid, slab_render
from volrend_tpu.utils.options import RenderOptions

t0 = time.perf_counter()
def log(m):
    print(f"[+{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

FLOOR = 0.027
def sync_time(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    ts = []
    for _i in range(reps):
        tt = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - tt - FLOOR)
    return min(ts)


def main():
    W = H = 800
    gi = 448
    # tiny setup: no tree needed, pure gather micro-bench on the chip
    _ = bench_mod  # imported for consistency; unused
    n = 24
    rows = (gi - 1) * (gi - 1)
    rng = np.random.RandomState(0)
    yy = np.clip((np.arange(H) * (gi - 2) / H).astype(np.int32), 0, gi - 2)
    xx = np.clip((np.arange(W) * (gi - 2) / W).astype(np.int32), 0, gi - 2)
    idx = jnp.asarray(yy[:, None] * (gi - 1) + xx[None, :], jnp.int32)
    salts = jnp.arange(n, dtype=jnp.float32)
    base = rng.rand(rows, 16).astype(np.float32)

    tables = {
        "r32   16ch f16": jnp.asarray(base, jnp.float16),
        "r64f  16ch f32": jnp.asarray(base, jnp.float32),
        "r64p  32ch f16": jnp.asarray(
            np.concatenate([base, base], -1), jnp.float16),
        "r128p 64ch f16": jnp.asarray(
            np.tile(base, (1, 4)), jnp.float16),
    }

    for name, tab in tables.items():
        def g(tb, salt):
            i2 = jnp.minimum(idx + salt.astype(jnp.int32), rows - 1)
            return jnp.sum(tb[i2][..., :16].astype(jnp.float32))

        f = jax.jit(lambda tb, s: lax.map(lambda salt: g(tb, salt), s))
        t = sync_time(f, tab, salts, reps=3)
        nbytes = tab.shape[1] * tab.dtype.itemsize
        log(f"{name} ({nbytes:3d} B rows): {t/n*1e3:7.2f} ms "
            f"({H*W/(t/n)/1e6:5.0f} Mrow/s)")


if __name__ == "__main__":
    main()
