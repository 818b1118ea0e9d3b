"""Probe Mosaic single-dim dynamic_gather shapes + throughput on TPU.

 - sublane gather dims=[0]: out[i,j] = src[idx[i,j], j]  (src (H,128), idx (h,128))
 - lane    gather dims=[1]: out[i,j] = src[i, idx[i,j]]  (src (8,W),  idx (8,w))
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


def test_shape(src_shape, idx_shape, dim):
    rng = np.random.default_rng(0)
    src = rng.standard_normal(src_shape).astype(np.float32)
    hi = src_shape[dim]
    idx = rng.integers(0, hi, idx_shape).astype(np.int32)

    def kernel(s, i, o):
        o[:] = gather_dim(s[:], i[:], dim)

    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(idx_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.asarray(src), jnp.asarray(idx))
        got = np.asarray(out)
        want = (
            np.take_along_axis(src, idx % hi, axis=dim)
            if src.shape[1 - dim] == idx.shape[1 - dim]
            else None
        )
        if want is None:
            # manual expected
            if dim == 0:
                want = src[idx % hi, np.arange(idx_shape[1])[None, :] % src_shape[1]]
            else:
                want = src[np.arange(idx_shape[0])[:, None] % src_shape[0], idx % hi]
        ok = np.allclose(got, want)
        print(f"dim={dim} src{src_shape} idx{idx_shape}: correct={ok}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"dim={dim} src{src_shape} idx{idx_shape}: FAILED  {msg}")
        return False


def bench_gather(src_shape, idx_shape, dim, n_tiles=512, iters=(5, 20)):
    """Throughput: grid over n_tiles index tiles, one shared src."""
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal(src_shape).astype(np.float32))
    hi = src_shape[dim]
    idx = jnp.asarray(
        rng.integers(0, hi, (n_tiles,) + idx_shape).astype(np.int32)
    )

    def kernel(s, i, o):
        o[0] = gather_dim(s[:], i[0], dim) * 2.0

    f = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(src_shape, lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + idx_shape, lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1,) + idx_shape, lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles,) + idx_shape, jnp.float32),
    )

    def run(src, idx, eps, n):
        def body(k, c):
            y = f(src, idx)
            return c + jnp.sum(y[0, 0, :8]) * eps  # keep alive cheaply

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # NOTE: pallas_call can't be DCE'd partially — the kernel writes whole o
    jr = jax.jit(run)
    eps = jnp.float32(0.0)
    float(jr(src, idx, eps, 1))
    t = {}
    for n in iters:
        t0 = time.perf_counter()
        float(jr(src, idx, eps, n))
        t[n] = time.perf_counter() - t0
    dt = (t[iters[1]] - t[iters[0]]) / (iters[1] - iters[0])
    E = n_tiles * idx_shape[0] * idx_shape[1]
    print(
        f"bench dim={dim} src{src_shape} idx{idx_shape} x{n_tiles}: "
        f"{dt*1e3:.3f} ms  {E/dt/1e9:.2f} Gelem/s  {E*8/dt/1e9:.1f} GB/s(equiv)"
    )


if __name__ == "__main__":
    # shape support matrix
    test_shape((8, 128), (8, 128), 0)
    test_shape((8, 128), (8, 128), 1)
    test_shape((64, 128), (8, 128), 0)     # tall src, small idx
    test_shape((2048, 128), (8, 128), 0)   # very tall src
    test_shape((2048, 128), (64, 128), 0)
    test_shape((8, 1024), (8, 128), 1)     # wide src, small idx
    test_shape((8, 32768), (8, 128), 1)
    test_shape((16, 128), (16, 128), 0)
    test_shape((32, 128), (8, 128), 0)
    # throughput
    bench_gather((8, 128), (8, 128), 1)
    bench_gather((8, 128), (8, 128), 0)
    bench_gather((2048, 128), (8, 128), 0)
    bench_gather((2048, 128), (64, 128), 0, n_tiles=64)
    bench_gather((8, 32768), (8, 128), 1)
