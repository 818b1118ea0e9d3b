"""Throughput of tiled (8,128) dynamic_gather inside a Pallas kernel,
with large blocks per grid step to amortize overheads.

Layout under test = the SpMV inner loop shape:
  per (8,128) element tile: gather from an (8,128) slice-local table.
Compared against a pure copy kernel (gather replaced by direct read).
"""

import time
import numpy as np
import jax, jax.numpy as jnp
from jax._src import core as jax_core
from jax._src.pallas.mosaic.lowering import register_lowering_rule, aval_to_ir_type
from jax.experimental.mosaic.dialects import tpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

gather_dim_p = jax_core.Primitive("uspmv_gather_dim")


def gather_dim(src, idx, dim):
    return gather_dim_p.bind(src, idx, dim=dim)


@gather_dim_p.def_abstract_eval
def _abs(src, idx, *, dim):
    return jax_core.ShapedArray(idx.shape, src.dtype)


@register_lowering_rule(gather_dim_p)
def _low(ctx, src, idx, *, dim):
    out_type = aval_to_ir_type(
        ctx.lowering_context.dynamic_shape_replacement_fn, ctx.avals_out[0]
    )
    return tpu.dynamic_gather(src, idx, [dim], results=[out_type])


ROWS_PER_BLOCK = 512  # (512, 128) block = 64 native tiles


def make_kernel(mode):
    def kernel(vals_ref, idx_ref, x_ref, out_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for t in range(ROWS_PER_BLOCK // 8):
            sl = slice(t * 8, (t + 1) * 8)
            v = vals_ref[sl, :]
            if mode == "gather":
                i = idx_ref[sl, :]
                xt = x_ref[sl, :]
                g = gather_dim(xt, i, 1)
            else:
                g = x_ref[sl, :]
            acc = acc + v * g
        out_ref[:] = acc

    return kernel


def bench(mode, n_blocks=256, iters=(5, 25)):
    rng = np.random.default_rng(0)
    N = n_blocks * ROWS_PER_BLOCK
    vals = jnp.asarray(rng.standard_normal((N, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (N, 128)).astype(np.int32))
    x = jnp.asarray(rng.standard_normal((N, 128)).astype(np.float32))

    f = pl.pallas_call(
        make_kernel(mode),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_BLOCK, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PER_BLOCK, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS_PER_BLOCK, 128), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )

    def run(vals, idx, x, eps, n):
        def body(k, c):
            y = f(vals, idx, x + c * eps)
            return c + jnp.sum(y) * eps

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    jr = jax.jit(run)
    eps = jnp.float32(0.0)
    float(jr(vals, idx, x, eps, 1))
    t = {}
    for n in iters:
        t0 = time.perf_counter()
        float(jr(vals, idx, x, eps, n))
        t[n] = time.perf_counter() - t0
    dt = (t[iters[1]] - t[iters[0]]) / (iters[1] - iters[0])
    E = N * 128
    bytes_moved = E * (4 + (4 if mode == "gather" else 0) + 4)  # vals+idx+x
    print(
        f"{mode:7s}: {dt*1e3:8.3f} ms  {E/dt/1e9:6.2f} Gelem/s  "
        f"{bytes_moved/dt/1e9:6.1f} GB/s HBM"
    )


if __name__ == "__main__":
    bench("copy")
    bench("gather")
