"""Find the pallas grid-step cost floor + validate the 'flat steps' design:
steps decoupled from chunks, per-step partial y written to out[step],
chunk reduction done outside the kernel.

Usage: python scripts/pallas_floor_bench.py [n=64]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from uspmv_tpu.io.generators import laplace3d
from uspmv_tpu.formats.scs import convert_to_scs
from uspmv_tpu.ops.pallas_scs import build_device_lane_tiles
from uspmv_tpu.ops.gather_primitive import gather_lanes, gather_sublanes
from uspmv_tpu.ops.packer import CHUNK_ROWS, LANES, TILE_J


def measure(f, args, n1=20, n2=100):
    def run(args, eps, n):
        def body(i, c):
            y = f(args, c * eps)
            return jnp.sum(y, dtype=jnp.float32) * eps + c + 1.0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jr = jax.jit(run)
    eps = jnp.float32(0.0)
    float(jr(args, eps, 2))
    out = []
    for _ in range(3):
        ts = {}
        for n in (n1, n2):
            t0 = time.perf_counter()
            float(jr(args, eps, n))
            ts[n] = time.perf_counter() - t0
        out.append((ts[n2] - ts[n1]) / (n2 - n1))
    return min(out)


def flat_kernel(mode, tps):
    """One grid step = tps tiles; partial sums to out[step]; no chunk logic."""
    def kernel(w_row_ref, vals_ref, src_ref, x_ref, out_ref):
        step = pl.program_id(0)
        base = step * tps
        reg = None
        for k in range(tps):
            if mode == "stream":
                partial = vals_ref[k]
            else:
                w = w_row_ref[base + k]
                window = x_ref[pl.ds(w, TILE_J), :]
                packed = src_ref[k]
                lane_tab = jnp.bitwise_and(packed, LANES - 1)
                sub_tab = jnp.right_shift(packed, 7)
                t1 = gather_sublanes(window, sub_tab)
                g = gather_lanes(t1, lane_tab)
                partial = vals_ref[k] * g
            reg = partial if reg is None else reg + partial
        out_ref[0] = reg

    return kernel


def build_flat(dev, mode, x2d, tps):
    nt_used = dev.n_tiles  # already chunk-padded; we just re-step it
    ns = nt_used // tps if nt_used % tps == 0 else nt_used // tps + 1
    nt = ns * tps
    # re-pad to multiple of tps only
    def pad(a):
        if a.shape[0] == nt:
            return a
        pad_shape = (nt - a.shape[0],) + a.shape[1:]
        return jnp.concatenate([a, jnp.zeros(pad_shape, a.dtype)])

    vals = pad(dev.vals)
    src = pad(dev.src_tab)
    w_row = pad(dev.w_row)
    Z = np.int32(0)
    tile_spec = pl.BlockSpec((tps, TILE_J, LANES), lambda s: (s, Z, Z),
                             memory_space=pltpu.VMEM)

    def fn(args, c):
        vals, src, w_row, x2d = args
        return pl.pallas_call(
            flat_kernel(mode, tps),
            grid=(ns,),
            in_specs=[
                pl.BlockSpec((nt,), lambda s: (Z,), memory_space=pltpu.SMEM),
                tile_spec,
                tile_spec,
                pl.BlockSpec(x2d.shape, lambda s: (Z, Z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE_J, LANES), lambda s: (s, Z, Z),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ns, TILE_J, LANES), jnp.float32),
        )(w_row, vals, src, x2d + c)

    return fn, (vals, src, w_row, x2d), ns, nt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mtx = laplace3d(n)
    scs = convert_to_scs(mtx, CHUNK_ROWS, 1, dtype=np.float32)
    dev = build_device_lane_tiles(scs, tiles_per_step=2)  # min chunk padding
    n_pad = dev.n_rows_padded
    x_rows = max(n_pad // LANES, TILE_J)
    x = np.random.default_rng(0).standard_normal(x_rows * LANES)
    x2d = jnp.asarray(x.reshape(x_rows, LANES), dtype=jnp.float32)
    print(f"rows={mtx.n_rows} nnz={mtx.nnz} used_tiles={dev.n_tiles}")

    for mode in ("stream", "full"):
        for tps in (8, 16, 32, 64, 128):
            fn, args, ns, nt = build_flat(dev, mode, x2d, tps)
            dt = measure(fn, args)
            elems = nt * CHUNK_ROWS
            sb = nt * 4096 * (2 if mode == "full" else 1)
            print(f"{mode:6s} tps={tps:3d}: steps={ns:5d} {dt*1e6:8.1f} us "
                  f"{dt/ns*1e9:6.0f} ns/step {elems/dt/1e9:6.1f} Gelem/s "
                  f"{sb/dt/1e9:6.1f} GB/s "
                  f"{2*mtx.nnz/dt/1e9:6.1f} GFLOP/s")


if __name__ == "__main__":
    main()
