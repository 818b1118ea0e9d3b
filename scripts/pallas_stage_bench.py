"""Isolate per-stage costs of the lane-tile Pallas SpMV kernel on real TPU.

Variants (cumulative):
  stream  : vals tiles only, accumulate sum          (HBM stream ceiling)
  window  : + dynamic x-window slice, mul window     (adds dynamic ds load)
  gather1 : + lane gather only                       (adds 1 VPU shuffle)
  full    : + unpack + sublane gather (the real kernel)

Usage: python scripts/pallas_stage_bench.py [n=64] [tps=...]
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
from uspmv_tpu.config import Config
from uspmv_tpu.io.generators import laplace3d
from uspmv_tpu.formats.scs import convert_to_scs
from uspmv_tpu.ops.pallas_scs import build_device_lane_tiles
from uspmv_tpu.ops.gather_primitive import gather_lanes, gather_sublanes
from uspmv_tpu.ops.packer import CHUNK_ROWS, LANES, TILE_J


def make_kernel(mode, tps, acc_dtype=jnp.float32):
    def kernel(w_row_ref, step_chunk_ref, step_flags_ref, vals_ref, src_ref,
               x_ref, out_ref, acc_ref):
        step = pl.program_id(0)
        base = step * tps
        reg = None
        for k in range(tps):
            t = base + k
            if mode == "stream":
                partial = vals_ref[k]
            else:
                w = w_row_ref[t]
                window = x_ref[pl.ds(w, TILE_J), :]
                if mode == "window":
                    partial = vals_ref[k] * window
                elif mode == "gather1":
                    packed = src_ref[k]
                    lane_tab = jnp.bitwise_and(packed, LANES - 1)
                    g = gather_lanes(window, lane_tab)
                    partial = vals_ref[k] * g
                else:  # full
                    packed = src_ref[k]
                    lane_tab = jnp.bitwise_and(packed, LANES - 1)
                    sub_tab = jnp.right_shift(packed, 7)
                    t1 = gather_sublanes(window, sub_tab)
                    g = gather_lanes(t1, lane_tab)
                    partial = vals_ref[k] * g
            reg = partial if reg is None else reg + partial

        flags = step_flags_ref[step]
        ck = step_chunk_ref[step]

        @pl.when((flags & 1) == 1)
        def _():
            acc_ref[:] = reg

        @pl.when(jnp.logical_not((flags & 1) == 1))
        def _():
            acc_ref[:] = acc_ref[:] + reg

        @pl.when((flags & 2) == 2)
        def _():
            out_ref[ck] = acc_ref[:].astype(out_ref.dtype)

    return kernel


def build_fn(dev, mode, x2d_shape):
    nt = dev.n_tiles
    tps = dev.tiles_per_step
    ns = nt // tps
    Z = np.int32(0)
    tile_spec = pl.BlockSpec((tps, TILE_J, LANES), lambda s: (s, Z, Z),
                             memory_space=pltpu.VMEM)

    def fn(args, c):
        vals, src, w_row, step_chunk, step_flags, x2d = args
        y2d = pl.pallas_call(
            make_kernel(mode, tps),
            grid=(ns,),
            in_specs=[
                pl.BlockSpec((nt,), lambda s: (Z,), memory_space=pltpu.SMEM),
                pl.BlockSpec((ns,), lambda s: (Z,), memory_space=pltpu.SMEM),
                pl.BlockSpec((ns,), lambda s: (Z,), memory_space=pltpu.SMEM),
                tile_spec,
                tile_spec,
                pl.BlockSpec(x2d_shape, lambda s: (Z, Z),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((dev.n_chunks, TILE_J, LANES),
                                   lambda s: (Z, Z, Z),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (dev.n_chunks, TILE_J, LANES), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TILE_J, LANES), jnp.float32)],
        )(w_row, step_chunk, step_flags, vals, src, x2d + c)
        return y2d

    return fn


def measure(f, args, n1=20, n2=100):
    def run(args, eps, n):
        def body(i, c):
            y = f(args, c * eps)
            return jnp.sum(y, dtype=jnp.float32) * eps + c + 1.0
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jr = jax.jit(run)
    eps = jnp.float32(0.0)
    float(jr(args, eps, 2))
    ts = {}
    for n in (n1, n2):
        t0 = time.perf_counter()
        float(jr(args, eps, n))
        ts[n] = time.perf_counter() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    tps_arg = int(sys.argv[2]) if len(sys.argv) > 2 else None
    mtx = laplace3d(n)
    scs = convert_to_scs(mtx, CHUNK_ROWS, 1, dtype=np.float32)
    dev = build_device_lane_tiles(scs, tiles_per_step=tps_arg)
    n_pad = dev.n_rows_padded
    x_rows = max(n_pad // LANES, TILE_J)
    x = np.random.default_rng(0).standard_normal(x_rows * LANES)
    x2d = jnp.asarray(x.reshape(x_rows, LANES), dtype=jnp.float32)

    nt, tps = dev.n_tiles, dev.tiles_per_step
    elems = nt * CHUNK_ROWS
    print(f"rows={mtx.n_rows} nnz={mtx.nnz} tiles={nt} tps={tps} "
          f"steps={nt//tps} elems={elems} fill={dev.fill:.3f}")
    args = (dev.vals, dev.src_tab, dev.w_row, dev.step_chunk,
            dev.step_flags, x2d)
    for mode in ("stream", "window", "gather1", "full"):
        f = build_fn(dev, mode, x2d.shape)
        dt = measure(f, args)
        stream_b = float(dev.vals.nbytes + (dev.src_tab.nbytes
                         if mode in ("gather1", "full") else 0))
        gbs = (stream_b + x2d.nbytes + dev.n_chunks * 4096) / dt / 1e9
        print(f"{mode:8s}: {dt*1e6:8.1f} us  {elems/dt/1e9:6.1f} Gelem/s  "
              f"{gbs:6.1f} GB/s(stream)  {2*mtx.nnz/dt/1e9:6.1f} GFLOP/s")


if __name__ == "__main__":
    main()
