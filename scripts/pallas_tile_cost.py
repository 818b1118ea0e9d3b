"""Diagnose per-tile cost composition of the production kernel on TPU:
full kernel vs variants with fixed window (no SMEM meta read / dynamic x
slice) and fixed output slot (no dynamic RMW addressing).

Usage: python scripts/pallas_tile_cost.py [n=64]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from uspmv_tpu.io.generators import laplace3d
from uspmv_tpu.formats.scs import convert_to_scs, permute_scs_cols
from uspmv_tpu.ops.pallas_scs import build_device_lane_tiles, CL_BITS
from uspmv_tpu.ops.gather_primitive import gather_lanes, gather_sublanes
from uspmv_tpu.ops.packer import CHUNK_ROWS, LANES, TILE_J


def kernel(meta_ref, sg_ref, sf_ref, vals_ref, src_ref, x_ref, out_ref, *,
           tps, fixed_w, fixed_cl, no_gather):
    step = pl.program_id(0)

    @pl.when(sf_ref[step] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = step * tps
    for k in range(tps):
        if fixed_w:
            window = x_ref[pl.ds(0, TILE_J), :]
        else:
            m = meta_ref[base + k]
            window = x_ref[pl.ds(m >> CL_BITS, TILE_J), :]
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        if no_gather:
            g = window * 0.0 + packed.astype(jnp.float32)
        else:
            lane_tab = jnp.bitwise_and(packed, LANES - 1)
            sub_tab = jnp.right_shift(packed, 7)
            g = gather_lanes(gather_sublanes(window, sub_tab), lane_tab)
        partial = vals_ref[k] * g
        if fixed_cl:
            out_ref[0] = out_ref[0] + partial
        else:
            m2 = meta_ref[base + k]
            cl = jnp.bitwise_and(m2, (1 << CL_BITS) - 1)
            out_ref[cl] = out_ref[cl] + partial


def run(dev, x2d, fixed_w, fixed_cl, no_gather):
    nt, tps, G = dev.n_tiles, dev.tiles_per_step, dev.chunks_per_group
    ns = nt // tps
    Z = np.int32(0)

    def fn(args, c):
        meta, sg, sf, vals, src, x2d = args
        return pl.pallas_call(
            functools.partial(kernel, tps=tps, fixed_w=fixed_w,
                              fixed_cl=fixed_cl, no_gather=no_gather),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(ns,),
                in_specs=[
                    pl.BlockSpec((tps, TILE_J, LANES),
                                 lambda s, m, g, f: (s, Z, Z),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tps // 2, 2 * TILE_J, LANES),
                                 lambda s, m, g, f: (s, Z, Z),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(x2d.shape, lambda s, m, g, f: (Z, Z),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((G, TILE_J, LANES),
                                       lambda s, m, g, f: (g[s], Z, Z),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (dev.n_groups * G, TILE_J, LANES), jnp.float32),
        )(meta, sg, sf, vals, src, x2d + c)

    args = (dev.meta, dev.step_group, dev.step_first, dev.vals, dev.src16,
            x2d)

    def loop(args, eps, n):
        def body(i, c):
            y = fn(args, c * eps)
            return jnp.sum(y, dtype=jnp.float32) * eps + c + 1.0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jr = jax.jit(loop)
    eps = jnp.float32(0.0)
    float(jr(args, eps, 2))
    best = 1e18
    for _ in range(4):
        t0 = time.perf_counter(); float(jr(args, eps, 100)); t1 = time.perf_counter()
        float(jr(args, eps, 500)); t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / 400)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mtx = laplace3d(n)
    scs = convert_to_scs(mtx.astype(np.float32), CHUNK_ROWS, 1)
    fp = np.arange(scs.n_rows_padded, dtype=np.int32)
    fp[: scs.n_rows] = scs.old_to_new_idx
    permute_scs_cols(scs, fp)
    dev = build_device_lane_tiles(scs)
    x_rows = max(scs.n_rows_padded // LANES, TILE_J)
    x2d = jnp.asarray(
        np.random.default_rng(0).standard_normal((x_rows, LANES)),
        dtype=jnp.float32,
    )
    print(f"tiles={dev.n_tiles} tps={dev.tiles_per_step} "
          f"steps={dev.n_tiles//dev.tiles_per_step}")
    for name, fw, fc, ng in (
        ("full", False, False, False),
        ("fixed_w", True, False, False),
        ("fixed_cl", False, True, False),
        ("fixed_both", True, True, False),
        ("no_gather", False, False, True),
        ("bare", True, True, True),
    ):
        dt = run(dev, x2d, fw, fc, ng)
        print(f"{name:11s}: {dt*1e6:7.1f} us  "
              f"{dt/dev.n_tiles*1e9:5.1f} ns/tile  "
              f"{2*mtx.nnz/dt/1e9:6.1f} GFLOP/s")


if __name__ == "__main__":
    main()
