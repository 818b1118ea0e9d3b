"""Pallas TPU SpMV kernel over j-plane lane tiles.

The TPU-native replacement for the reference's hot loop (scs_impl_cpu<C>,
kernels.hpp:216-301). Design (see ops/packer.py and SURVEY.md §7):

  * chunk = 1024 rows; a tile is one j-plane — the j-th stored element of
    each row — reshaped (8, 128) with row r at slot (r>>7, r&127);
  * per tile, a two-step hardware dynamic_gather (ops/gather_primitive.py)
    fetches x from a 1024-entry window at a per-tile offset; both gather
    tables travel in ONE packed int32 stream (8 bytes/element total);
  * y accumulation is elementwise into the chunk's (8, 128) VMEM block —
    the row reduction costs nothing and there is no scatter anywhere;
  * x is VMEM-resident; TILES_PER_STEP tiles are processed per grid step
    (unrolled) to amortize grid overheads.

Interpret mode (CPU) runs the same kernel with the primitive's
take_along_axis fallback, so tests validate exact device semantics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_primitive import gather_lanes, gather_sublanes
from .packer import (
    CHUNK_ROWS,
    LANES,
    TILE_J,
    LaneTiles,
    pack_lane_tiles,
)


def pallas_supported() -> bool:
    """True if the compiled Mosaic path is usable (TPU default device)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceLaneTiles:
    """Device-side arrays of the packed lane tiles. A JAX pytree."""

    vals: jax.Array  # [nt, 8, 128]
    src_tab: jax.Array  # [nt, 8, 128] int32 packed (sub<<7)|lane
    w_row: jax.Array  # [nt] int32
    tile_chunk: jax.Array  # [nt] int32 ascending
    step_chunk: jax.Array  # [nt/tps] int32: chunk of each grid step
    step_flags: jax.Array  # [nt/tps] int32: bit0 = first step of chunk,
    #                         bit1 = last step of chunk

    tiles_per_step: int = dataclasses.field(metadata=dict(static=True))
    n_chunks: int = dataclasses.field(metadata=dict(static=True))
    n_rows_padded: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.vals.shape[0]

    @property
    def device_beta(self) -> float:
        return self.fill

    def stream_bytes(self) -> int:
        """Matrix bytes streamed per SpMV (vals + packed gather tables)."""
        return int(self.vals.nbytes + self.src_tab.nbytes)


def build_device_lane_tiles(
    scs, dtype=np.float32, device=None, tiles_per_step=None
) -> DeviceLaneTiles:
    lt = pack_lane_tiles(scs, dtype=dtype, tiles_per_step=tiles_per_step)
    step_chunk = lt.tile_chunk[:: lt.tiles_per_step].astype(np.int32)
    ns = step_chunk.shape[0]
    first = np.ones(ns, dtype=np.int32)
    first[1:] = (step_chunk[1:] != step_chunk[:-1]).astype(np.int32)
    last = np.ones(ns, dtype=np.int32)
    last[:-1] = (step_chunk[:-1] != step_chunk[1:]).astype(np.int32)
    flags = first | (last << 1)
    put = lambda a: jax.device_put(a, device) if device else jnp.asarray(a)
    return DeviceLaneTiles(
        vals=put(lt.vals),
        src_tab=put(lt.src_tab),
        w_row=put(lt.w_row),
        tile_chunk=put(lt.tile_chunk),
        step_chunk=put(step_chunk),
        step_flags=put(flags),
        tiles_per_step=lt.tiles_per_step,
        n_chunks=lt.n_chunks,
        n_rows_padded=lt.n_rows_padded,
        nnz=lt.nnz,
        fill=lt.fill,
    )


def _kernel(
    w_row_ref,  # [nt] int32 in SMEM
    step_chunk_ref,  # [n_steps] int32 in SMEM
    step_flags_ref,  # [n_steps] int32 in SMEM (bit0 first, bit1 last)
    vals_ref,  # (TILES_PER_STEP, 8, 128)
    src_ref,  # (TILES_PER_STEP, 8, 128) int32
    x_ref,  # (x_rows, 128) whole x in VMEM
    out_ref,  # (n_chunks, 8, 128) whole y in VMEM; row r at (c, r>>7, r&127)
    acc_ref,  # (8, 128) scratch: running chunk accumulator (persists
    #           across grid steps)
    *,
    acc_dtype,
    tps,
):
    step = pl.program_id(0)
    base = step * tps
    # one grid step = tps tiles of ONE chunk: the hot loop is branch-free
    # (per-tile conditionals measured at ~50 ns/tile)
    reg = None
    for k in range(tps):
        t = base + k
        w = w_row_ref[t]
        window = x_ref[pl.ds(w, TILE_J), :]
        packed = src_ref[k]
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        sub_tab = jnp.right_shift(packed, 7)
        t1 = gather_sublanes(window, sub_tab)
        g = gather_lanes(t1, lane_tab)
        partial = vals_ref[k].astype(acc_dtype) * g.astype(acc_dtype)
        reg = partial if reg is None else reg + partial

    flags = step_flags_ref[step]
    ck = step_chunk_ref[step]
    is_first = (flags & 1) == 1
    is_last = (flags & 2) == 2

    @pl.when(is_first)
    def _():
        acc_ref[:] = reg

    @pl.when(jnp.logical_not(is_first))
    def _():
        acc_ref[:] = acc_ref[:] + reg

    @pl.when(is_last)
    def _():
        out_ref[ck] = acc_ref[:].astype(out_ref.dtype)


def spmv_lane_tiles(
    dev: DeviceLaneTiles, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """y = A @ x for a single vector. x: [n_rows_padded] (permuted, padded);
    returns y: [n_rows_padded]."""
    if interpret is None:
        interpret = not pallas_supported()
    n_pad = dev.n_rows_padded
    x_rows = max(n_pad // LANES, TILE_J)
    x2d = x
    if x.shape[0] < x_rows * LANES:
        x2d = jnp.pad(x, (0, x_rows * LANES - x.shape[0]))
    x2d = x2d.reshape(x_rows, LANES)

    acc_dtype = jnp.float32 if x.dtype != jnp.float64 else jnp.float64

    # NOTE: index maps must produce int32 — under jax_enable_x64 python
    # literals trace as i64, which this libtpu's legalizer rejects
    Z = np.int32(0)
    nt = dev.n_tiles
    tps = dev.tiles_per_step
    assert nt % tps == 0
    tile_spec = pl.BlockSpec(
        (tps, TILE_J, LANES),
        lambda s: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    ns = nt // tps
    y2d = pl.pallas_call(
        functools.partial(_kernel, acc_dtype=acc_dtype, tps=tps),
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((nt,), lambda s: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns,), lambda s: (Z,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ns,), lambda s: (Z,), memory_space=pltpu.SMEM),
            tile_spec,  # vals
            tile_spec,  # src_tab
            pl.BlockSpec(
                x2d.shape, lambda s: (Z, Z), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (dev.n_chunks, TILE_J, LANES),
            lambda s: (Z, Z, Z),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((dev.n_chunks, TILE_J, LANES), x.dtype),
        scratch_shapes=[pltpu.VMEM((TILE_J, LANES), acc_dtype)],
        interpret=interpret,
    )(dev.w_row, dev.step_chunk, dev.step_flags, dev.vals, dev.src_tab, x2d)
    return y2d.reshape(-1)[:n_pad]


def spmv_pallas(dev, x, interpret: Optional[bool] = None):
    """Operator-facing entry: dispatch on device-format type and vector
    shape. Block vectors are vmapped over the RHS dimension (v1)."""
    if not isinstance(dev, DeviceLaneTiles):
        # operator passed an XLA DeviceScs (config fallback)
        from .spmv_xla import spmv_tiled

        return spmv_tiled(dev, x)
    if x.ndim == 1:
        return spmv_lane_tiles(dev, x, interpret=interpret)
    # [n, bs] rowwise: vmap over the minor dim
    return jax.vmap(
        lambda xv: spmv_lane_tiles(dev, xv, interpret=interpret),
        in_axes=1,
        out_axes=1,
    )(x)
