"""Experiment: full-table gather inside Pallas via tpu.dynamic_gather
with dimensions=[0,1] (collapse both source dims). The jax gather lowering
only emits single-dim take_along_axis; the underlying Mosaic op is general.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax._src import core as jax_core
from jax._src.pallas.mosaic.lowering import (
    register_lowering_rule,
    aval_to_ir_type,
)
from jax.experimental.mosaic.dialects import tpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---- custom primitive -------------------------------------------------

gather2d_p = jax_core.Primitive("uspmv_gather2d")


def gather2d(src, idx):
    """out[i, j] = src.reshape(-1)[idx[i, j] mod src.size]"""
    return gather2d_p.bind(src, idx)


@gather2d_p.def_abstract_eval
def _g2d_abstract(src, idx):
    assert idx.dtype in (jnp.int32.dtype, jnp.uint32.dtype), idx.dtype
    return jax_core.ShapedArray(idx.shape, src.dtype)


@register_lowering_rule(gather2d_p)
def _g2d_lowering(ctx, src, idx):
    out_type = aval_to_ir_type(
        ctx.lowering_context.dynamic_shape_replacement_fn, ctx.avals_out[0]
    )
    return tpu.dynamic_gather(src, idx, [0, 1], results=[out_type])


# ---- test kernel -------------------------------------------------------


def kernel(src_ref, idx_ref, out_ref):
    out_ref[:] = gather2d(src_ref[:], idx_ref[:])


def run(H, W, h, w):
    rng = np.random.default_rng(0)
    src = rng.standard_normal((H, W)).astype(np.float32)
    idx = rng.integers(0, H * W, (h, w)).astype(np.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(src), jnp.asarray(idx))
    got = np.asarray(out)
    want = src.reshape(-1)[idx.reshape(-1) % (H * W)].reshape(h, w)
    ok = np.allclose(got, want)
    print(f"H={H} W={W} h={h} w={w}: correct={ok}")
    return ok


if __name__ == "__main__":
    run(8, 128, 8, 128)       # table == tile
    run(64, 128, 8, 128)      # table 8k entries, tile 1k
    run(2048, 128, 8, 128)    # table 262k entries (1 MB)
    run(2048, 128, 64, 512)   # big tile
    print("ALL GATHER2D TESTS DONE")
