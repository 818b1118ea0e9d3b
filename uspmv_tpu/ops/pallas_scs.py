"""Pallas TPU SpMV kernel over j-plane lane tiles (grouped-flat grid).

The TPU-native replacement for the reference's hot loop (scs_impl_cpu<C>,
kernels.hpp:216-301). Design (see ops/packer.py and SURVEY.md §7):

  * chunk = 1024 rows; a tile is one j-plane — the j-th stored element of
    each row — reshaped (8, 128) with row r at slot (r>>7, r&127);
  * per tile, a two-step hardware dynamic_gather (ops/gather_primitive.py)
    fetches x from a 1024-entry window at a per-tile offset; both gather
    tables travel in ONE packed int32 stream (8 bytes/element total);
  * grid steps are decoupled from chunk boundaries: one step processes
    TILES_PER_STEP tiles of one chunk-GROUP (CHUNKS_PER_GROUP chunks) and
    accumulates each tile into its chunk's (8, 128) slice of the group's
    VMEM output block (dynamic read-modify-write; the row reduction costs
    nothing and there is no scatter anywhere). The output block index is
    data-driven via scalar prefetch (PrefetchScalarGridSpec), so Pallas
    keeps it resident in VMEM across the group's consecutive steps;
  * fat steps (up to 128 tiles) amortize the measured ~250-500 ns/step
    grid overhead; only group tile counts are padded (~1% waste) instead
    of per-chunk padding (up to 2x waste on short chunks);
  * x is VMEM-resident when it fits the budget; larger matrices stream
    per-group x windows from HBM, double-buffered into VMEM scratch with
    manual async DMA (one copy per group, prefetched a group ahead);
  * the 10-bit gather tables ride an int16 stream; 2-byte value dtypes
    (hp = bfloat16) pair two j-plane tiles per native (16, 128) tile.

Interpret mode (CPU) runs the same kernels with the primitive's
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


class LaneTileBudgetError(ValueError):
    """The matrix exceeds a lane-tile hardware budget (SMEM meta words or
    the VMEM x-window footprint). Callers catch THIS — not bare ValueError,
    which would also swallow genuine programming errors — and fall back to
    the XLA path with a warning."""


def pallas_supported() -> bool:
    """True if the compiled Mosaic path is usable (TPU default device)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class MosaicBlockShapeError(ValueError):
    """A BlockSpec block shape violates the static Mosaic TPU constraint:
    each of the last two block dims must be a multiple of (8, 128)
    respectively OR equal the full array dim. Raised at TRACE time on
    every platform (interpret mode included), so the CPU test suite
    catches the class of failure that shipped round 4's transpose-stream
    regression (VERDICT r5 item 2a) instead of it surfacing as a Mosaic
    lowering error on real hardware only."""


def _lint_block_specs(name: str, specs) -> None:
    """specs: iterable of (block_shape, array_shape). Pure host check of
    the Mosaic (8, 128) trailing-dim divisibility rule."""
    for block, full in specs:
        if block is None or len(block) < 2:
            continue
        for dim, quantum in ((-1, LANES), (-2, TILE_J)):
            b = block[dim]
            if b is None:
                continue
            f = full[dim] if len(full) >= -dim else b
            if b != f and b % quantum:
                raise MosaicBlockShapeError(
                    f"{name}: block shape {tuple(block)} over array "
                    f"{tuple(full)} — dim {dim} is {b}, neither a "
                    f"multiple of {quantum} nor the full array dim {f}"
                )


def _pallas_call(name, kernel, *, grid_spec, out_shape, interpret, **kw):
    """``pl.pallas_call`` with the Mosaic block-shape lint applied to
    every in/out BlockSpec at TRACE time — interpret mode included, so
    the CPU suite rejects block shapes real hardware would refuse.
    Every kernel in this module routes through here."""

    def run(*args):
        nsp = int(getattr(grid_spec, "num_scalar_prefetch", 0) or 0)
        arrs = args[nsp:]
        pairs = []
        for spec, a in zip(tuple(grid_spec.in_specs), arrs):
            block = getattr(spec, "block_shape", None)
            if block is not None:
                pairs.append((block, a.shape))
        outs = (
            tuple(out_shape)
            if isinstance(out_shape, (list, tuple))
            else (out_shape,)
        )
        o_specs = grid_spec.out_specs
        if not isinstance(o_specs, (list, tuple)):
            o_specs = (o_specs,)
        for spec, o in zip(o_specs, outs):
            block = getattr(spec, "block_shape", None)
            if block is not None:
                pairs.append((block, o.shape))
        _lint_block_specs(name, pairs)
        return pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret, **kw,
        )(*args)

    return run


CL_BITS = 8  # chunk-local index bits in the packed meta word (G <= 256)

# budget for keeping all RHS vectors of x resident in VMEM (~16 MB/core,
# leaving room for the output block, double-buffered tile streams and
# compiler slack). Beyond this the builder switches to per-group x windows
# streamed from HBM; if even one group's window footprint exceeds the
# budget, it falls back to the XLA path.
X_VMEM_BUDGET_BYTES = 12 * 1024 * 1024
# the per-tile meta word is a scalar-prefetch SMEM operand (~1 MB SMEM);
# tile counts beyond this bound (t.ex. power-law rows at sigma=1, whose SCS
# fill explodes — the pathology sigma-sorting exists to fix) fall back
MAX_META_TILES = 128 * 1024


def lane_tiles_fit(x_len: int, block_vec_size: int = 1,
                   itemsize: int = 4, n_elements: int = 0) -> bool:
    """Whether the whole (padded) x block fits the kernel's VMEM budget and
    the tile metadata fits SMEM."""
    if n_elements // CHUNK_ROWS > MAX_META_TILES:
        return False
    return x_len * max(block_vec_size, 1) * itemsize <= X_VMEM_BUDGET_BYTES


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceLaneTiles:
    """Device-side arrays of the packed lane tiles. A JAX pytree."""

    vals: jax.Array  # [nt, 8, 128] f32, or [nt/2, 16, 128] for 2-byte value
    #                   dtypes (hp=bfloat16) — paired like src16
    src16: jax.Array  # [nt/2, 16, 128] int16: packed (sub<<7)|lane gather
    #                   tables, two (8, 128) tiles per native i16 tile —
    #                   2 bytes/element of index stream
    meta: jax.Array  # [nt] int32 packed (w_row << CL_BITS) | chunk_local;
    #                   w_row is relative to the group's x-window base in
    #                   windowed mode
    step_group: jax.Array  # [ns] int32: output group of each grid step
    step_first: jax.Array  # [ns] int32: 1 = first step of its group
    group_xbase: jax.Array  # [n_groups] int32: x-window base row per group
    #                         (all zeros in whole-x mode)

    tiles_per_step: int = dataclasses.field(metadata=dict(static=True))
    chunks_per_group: int = dataclasses.field(metadata=dict(static=True))
    n_groups: int = dataclasses.field(metadata=dict(static=True))
    n_chunks: int = dataclasses.field(metadata=dict(static=True))
    n_rows_padded: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))
    # 0 = whole-x-in-VMEM mode; else the static x-window height (x2d rows)
    # double-buffered HBM->VMEM per group (matrices beyond the VMEM budget)
    x_block_rows: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    x_rows_total: int = dataclasses.field(
        default=0, metadata=dict(static=True)
    )
    # gather window height in x2d rows: 8 = narrow (one (8,128) window),
    # 16 = wide (two halves selected by the sublane table's bit 3 — chosen
    # when narrow packing spills too much on scattered-column matrices)
    window_rows: int = dataclasses.field(
        default=TILE_J, metadata=dict(static=True)
    )
    # double-float dp emulation: vals is [2*nt, 8, 128] f32 hi/lo tile
    # pairs, x/y travel as [n, 2] f32 pairs (see _kernel_df64)
    df64: bool = dataclasses.field(default=False, metadata=dict(static=True))
    # all-ones matrices (the transpose-stream B' row maps) drop the value
    # stream entirely: slot validity rides bit 15 of src16 (negative =
    # padding), the kernel selects gathered-or-zero — 2 bytes/slot instead
    # of 6. vals is a (2, 8, 128) zero placeholder.
    unit_vals: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )

    @property
    def n_tiles(self) -> int:
        return self.meta.shape[0]

    @property
    def device_beta(self) -> float:
        return self.fill

    def stream_bytes(self) -> int:
        """Matrix bytes streamed per SpMV (vals + packed gather tables)."""
        return int(self.vals.nbytes + self.src16.nbytes)


def build_device_lane_tiles(
    scs,
    dtype=np.float32,
    device=None,
    tiles_per_step=None,
    chunks_per_group=None,
    x_len=None,
    x_window=None,  # None=auto, False=whole-x, True=force windowed
    block_vec_size=1,
    window_rows=None,  # None = auto (retry wide when narrow fill is poor)
    x_block_rows_force=None,  # common window height across stacked shards
    packer="two-pointer",  # "colwalk" = column-sorted sliding greedy
    unit_values=False,  # all-ones matrix: drop the value stream (B' maps)
) -> DeviceLaneTiles:
    from .packer import pack_lane_tiles_colwalk, pack_with_window_retry

    def pack(wr):
        if packer == "colwalk":
            return pack_lane_tiles_colwalk(
                scs,
                dtype=dtype,
                tiles_per_step=tiles_per_step,
                chunks_per_group=chunks_per_group,
                x_len=x_len,
                window_rows=wr,
            )
        return pack_lane_tiles(
            scs,
            dtype=dtype,
            tiles_per_step=tiles_per_step,
            chunks_per_group=chunks_per_group,
            x_len=x_len,
            window_rows=wr,
        )

    if window_rows is not None:
        lt = pack(window_rows)
    else:
        lt = pack_with_window_retry(pack)
    if packer != "colwalk" and lt.fill < 0.95:
        # the column-sorted walk packs some classes tighter than the
        # plane-binned two-pointer (banded-imbalanced: 0.586 vs 0.553 at
        # wr=16); try it at the chosen width and keep the better pack
        alt = pack_lane_tiles_colwalk(
            scs, dtype=dtype, tiles_per_step=tiles_per_step,
            chunks_per_group=chunks_per_group, x_len=x_len,
            window_rows=lt.window_rows,
        )
        if alt.fill > lt.fill * 1.02:
            lt = alt
    tps = lt.tiles_per_step
    G = lt.chunks_per_group
    if lt.n_tiles > MAX_META_TILES:
        # spill tiles can balloon past any pre-pack estimate on matrices
        # with no gather locality (random columns); the meta word is an
        # SMEM operand, so refuse and let the caller fall back to XLA
        raise LaneTileBudgetError(
            f"packed tile count {lt.n_tiles} exceeds the SMEM meta budget "
            f"({MAX_META_TILES}); this matrix has too little column "
            "locality for the lane-tile kernel"
        )
    if G > (1 << CL_BITS):
        raise ValueError(f"chunks_per_group > {1 << CL_BITS} breaks meta packing")
    tile_group = lt.tile_chunk // G
    tile_cl = (lt.tile_chunk - tile_group * G).astype(np.int32)

    # --- x windowing decision (whole-x VMEM residence vs per-group HBM
    # windows double-buffered into VMEM scratch) ---
    df64 = np.dtype(dtype) == np.float64
    if x_len is None:
        x_len = lt.n_rows_padded
    x_rows = max((int(x_len) + LANES - 1) // LANES, lt.window_rows)
    if x_window is None:
        # df64 carries x as an (hi, lo) pair -> 2x the VMEM footprint
        x_window = not lane_tiles_fit(
            x_rows * LANES, block_vec_size * (2 if df64 else 1)
        )
    if x_window and df64 and block_vec_size > 1:
        raise LaneTileBudgetError(
            "windowed-x dp emulation supports bs=1 only"
        )
    if x_window:
        # window DMA bases are sublane-aligned and blocks are 8-row
        # multiples; align the padded x extent too so [base, base+XB)
        # can never read past the buffer spmv_lane_tiles pads to
        x_rows = ((x_rows + 7) // 8) * 8
    w_abs = lt.w_row.astype(np.int64)
    gxb = np.zeros(lt.n_groups, dtype=np.int32)
    x_block_rows = 0
    if x_window:
        # per-group footprint over REAL tiles (zero-padding tiles carry the
        # w of a real neighbor or 0; a 0 would widen the footprint, so
        # compute min over tiles with any nonzero value... padding tiles
        # have all-zero vals)
        real = (
            np.asarray(lt.vals).reshape(lt.n_tiles, -1) != 0
        ).any(axis=1)
        wr = lt.window_rows
        base = np.zeros(lt.n_groups, dtype=np.int64)
        top = np.full(lt.n_groups, wr, dtype=np.int64)
        for g in range(lt.n_groups):
            sel = real & (tile_group == g)
            if sel.any():
                base[g] = w_abs[sel].min() & ~7  # sublane-align the base
                top[g] = w_abs[sel].max() + wr
        foot = int(np.max(top - base)) if lt.n_groups else TILE_J
        x_block_rows = min(((foot + 7) // 8) * 8, x_rows)
        if x_block_rows_force is not None:
            # stacked shards share one kernel program, hence one window
            # height; the caller passes the max over shards
            if x_block_rows_force < x_block_rows:
                raise ValueError(
                    "x_block_rows_force below this shard's footprint"
                )
            x_block_rows = min(int(x_block_rows_force), x_rows)
        base = np.minimum(base, max(x_rows - x_block_rows, 0)) & ~7
        if (
            x_block_rows * LANES * 4 * max(block_vec_size, 1)
            * (4 if df64 else 2)  # df64 windows carry (hi, lo) planes
            > X_VMEM_BUDGET_BYTES
        ):
            raise LaneTileBudgetError(
                "x window footprint exceeds the VMEM budget "
                f"({x_block_rows} rows x bs={block_vec_size})"
            )
        gxb = base.astype(np.int32)
        w_abs = w_abs - base[tile_group]
        # zero-padding tiles may go negative relative to the base; clamp
        # (they multiply by 0)
        w_abs = np.maximum(w_abs, 0)
    meta = (w_abs.astype(np.int32) << CL_BITS) | tile_cl
    # the 10-bit gather tables ride an int16 stream, two j-plane tiles per
    # native (16, 128) i16 tile; 2-byte value dtypes (hp = bfloat16) pair
    # the same way so the value stream is 2 bytes/element too
    assert lt.n_tiles % 2 == 0
    if unit_values:
        if df64 or np.dtype(dtype).itemsize != 4:
            raise ValueError("unit_values requires plain f32 tiles")
        valid = lt.vals != 0
        if not np.all(lt.vals[valid] == 1):
            raise ValueError("unit_values requires an all-ones matrix")
        src_i = lt.src_tab.astype(np.int32) | (
            (~valid).astype(np.int32) << 15
        )
        src16 = (
            (src_i & 0xFFFF).astype(np.uint16).view(np.int16)
        ).reshape(lt.n_tiles // 2, 2 * TILE_J, LANES)
    else:
        src16 = lt.src_tab.astype(np.int16).reshape(
            lt.n_tiles // 2, 2 * TILE_J, LANES
        )
    vals = lt.vals
    if unit_values:
        vals = np.zeros((2, TILE_J, LANES), dtype=np.float32)
    elif df64:
        # split each f64 tile into an exact (hi, lo) f32 pair, interleaved
        # as consecutive tiles (tile 2k = hi, 2k+1 = lo)
        hi = vals.astype(np.float32)
        lo = (vals - hi.astype(np.float64)).astype(np.float32)
        vals = np.empty((2 * lt.n_tiles, TILE_J, LANES), dtype=np.float32)
        vals[0::2] = hi
        vals[1::2] = lo
    elif vals.dtype.itemsize == 2:
        vals = vals.reshape(lt.n_tiles // 2, 2 * TILE_J, LANES)
    step_group = tile_group[::tps].astype(np.int32)
    ns = step_group.shape[0]
    first = np.ones(ns, dtype=np.int32)
    first[1:] = (step_group[1:] != step_group[:-1]).astype(np.int32)
    put = lambda a: jax.device_put(a, device) if device else jnp.asarray(a)
    return DeviceLaneTiles(
        vals=put(vals),
        src16=put(src16),
        meta=put(meta),
        step_group=put(step_group),
        step_first=put(first),
        group_xbase=put(gxb),
        tiles_per_step=tps,
        chunks_per_group=G,
        n_groups=lt.n_groups,
        n_chunks=lt.n_chunks,
        n_rows_padded=lt.n_rows_padded,
        nnz=lt.nnz,
        fill=lt.fill,
        x_block_rows=int(x_block_rows),
        x_rows_total=int(x_rows),
        window_rows=lt.window_rows,
        df64=df64,
        unit_vals=unit_values,
    )


def stack_device_lane_tiles(devs: list) -> DeviceLaneTiles:
    """Stack per-shard DeviceLaneTiles on a new leading 'rows' axis for
    shard_map execution. Shards are padded to common tile/step/group counts
    with no-op steps (zero tiles targeting group 0 of slot cl=0, flagged
    non-first so they neither zero nor corrupt anything — but note padded
    TRAILING steps re-target the LAST group so its block stays resident).

    All shards must share tiles_per_step and chunks_per_group (callers build
    them with explicit common values)."""
    tps = devs[0].tiles_per_step
    G = devs[0].chunks_per_group
    WR = max(d.window_rows for d in devs)
    df64 = devs[0].df64
    unit = devs[0].unit_vals
    assert all(d.tiles_per_step == tps and d.chunks_per_group == G
               and d.df64 == df64 and d.unit_vals == unit for d in devs)
    # a narrow-packed shard running under a wide stacked kernel reads
    # window_rows further into x; extend the padded extent accordingly
    x_rows_total = max(
        d.x_rows_total + (WR - d.window_rows) for d in devs
    )
    NG = max(d.n_groups for d in devs)
    # each shard needs one extra zero-init step per group it doesn't have,
    # so the common [0, NG*G) output row range is fully defined everywhere
    NS = max(d.n_tiles // tps + (NG - d.n_groups) for d in devs)
    NT = NS * tps
    vp = devs[0].vals.shape[1] == 2 * TILE_J  # paired 2-byte values

    def pad_to(a, n, fill=0):
        a = np.asarray(a)
        if a.shape[0] == n:
            return a
        width = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    vals, src, meta, sg, sf = [], [], [], [], []
    for d in devs:
        if unit:
            # value stream is the pinned (2, J, L) placeholder; padding
            # tiles must set bit 15 (int16 sign) = invalid slot
            vals.append(np.asarray(d.vals))
            src.append(pad_to(d.src16, NT // 2, fill=np.int16(-32768)))
        else:
            nv = 2 * NT if df64 else (NT // 2 if vp else NT)
            vals.append(pad_to(d.vals, nv))
            src.append(pad_to(d.src16, NT // 2))
        meta.append(pad_to(d.meta, NT))  # zero meta = += 0 into slot cl=0
        g = list(np.asarray(d.step_group))
        f = list(np.asarray(d.step_first))
        # zero-init steps for the groups this shard doesn't have...
        for m in range(d.n_groups, NG):
            g.append(m)
            f.append(1)
        # ...then park leftover no-op steps on the final group
        while len(g) < NS:
            g.append(g[-1] if g else 0)
            f.append(0)
        sg.append(np.asarray(g, dtype=np.int32))
        sf.append(np.asarray(f, dtype=np.int32))
    XB = 0
    if any(d.x_block_rows for d in devs):
        # windowed-x shards (halo-extended x beyond the VMEM budget): the
        # stacked kernel is ONE program, so all shards must share the
        # window height (callers rebuild with x_block_rows_force = max)
        # and the per-group window bases stack per shard
        XB = max(d.x_block_rows for d in devs)
        if any(d.x_block_rows not in (0, XB) for d in devs):
            raise ValueError(
                "stacked windowed shards must share x_block_rows "
                "(rebuild with x_block_rows_force)"
            )
        if any(d.x_block_rows == 0 for d in devs):
            raise ValueError(
                "cannot stack windowed and whole-x shards together "
                "(force x_window=True on all)"
            )
        if any(d.window_rows != WR for d in devs):
            raise ValueError(
                "windowed stacked shards must share window_rows (a "
                "narrow-packed shard would read past the common window)"
            )
        gxb = np.stack(
            [pad_to(np.asarray(d.group_xbase), NG) for d in devs]
        ).astype(np.int32)
    else:
        gxb = np.zeros((len(devs), NG), dtype=np.int32)
    return DeviceLaneTiles(
        vals=jnp.asarray(np.stack(vals)),
        src16=jnp.asarray(np.stack(src)),
        meta=jnp.asarray(np.stack(meta)),
        step_group=jnp.asarray(np.stack(sg)),
        step_first=jnp.asarray(np.stack(sf)),
        group_xbase=jnp.asarray(gxb),
        window_rows=WR,
        x_rows_total=x_rows_total,
        x_block_rows=XB,
        tiles_per_step=tps,
        chunks_per_group=G,
        n_groups=NG,
        n_chunks=max(d.n_chunks for d in devs),
        n_rows_padded=max(d.n_rows_padded for d in devs),
        nnz=sum(d.nnz for d in devs),
        fill=float(np.mean([d.fill for d in devs])),
        df64=df64,
        unit_vals=unit,
    )



@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceMixedTiles:
    """Mixed-chunk tiles for zero-column-locality matrices (see
    ops/packer.py pack_mixed_tiles). Each tile pools elements from up to
    ``m_mixed`` chunks of one output group; the per-element chunk selector
    rides bits 12-14 of the src16 stream and the kernel applies
    ``m_mixed`` masked read-modify-writes per tile."""

    vals: jax.Array  # [nt, 8, 128] (or [nt/2, 16, 128] for 2-byte dtypes)
    src16: jax.Array  # [nt/2, 16, 128] int16 (sel<<12)|(sub<<7)|lane
    # [nt] int32 packed (w_row << 6) | band; the tile's chunk-local output
    # ids are band*m_mixed + q (banded selectors), so no per-tile id table
    # is needed — a 2-D SMEM operand would pad its minor dim to 128 and
    # blow the 1 MB SMEM budget (measured)
    meta: jax.Array
    step_group: jax.Array  # [ns] int32
    step_first: jax.Array  # [ns] int32

    tiles_per_step: int = dataclasses.field(metadata=dict(static=True))
    chunks_per_group: int = dataclasses.field(metadata=dict(static=True))
    n_groups: int = dataclasses.field(metadata=dict(static=True))
    n_chunks: int = dataclasses.field(metadata=dict(static=True))
    n_rows_padded: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))
    window_rows: int = dataclasses.field(metadata=dict(static=True))
    m_mixed: int = dataclasses.field(metadata=dict(static=True))
    x_rows_total: int = dataclasses.field(default=0, metadata=dict(static=True))
    df64: bool = dataclasses.field(default=False, metadata=dict(static=True))

    @property
    def n_tiles(self) -> int:
        return self.meta.shape[0]

    @property
    def device_beta(self) -> float:
        return self.fill

    def stream_bytes(self) -> int:
        return int(self.vals.nbytes + self.src16.nbytes)


def build_device_mixed_tiles(
    scs,
    dtype=np.float32,
    device=None,
    tiles_per_step=None,
    chunks_per_group=None,
    x_len=None,
    window_rows=64,
    m_mixed=None,
    block_vec_size=1,
) -> DeviceMixedTiles:
    """Pack + upload mixed-chunk tiles. Whole-x VMEM residence only (the
    class this serves has x far below the budget; larger x falls back)."""
    from .packer import M_MIXED, pack_mixed_tiles

    if np.dtype(dtype) == np.float64:
        raise LaneTileBudgetError(
            "mixed-chunk tiles have no df64 variant; dp runs the CPU path"
        )
    if m_mixed is None:
        m_mixed = M_MIXED
    if x_len is None:
        x_len = scs.n_rows_padded
    if not lane_tiles_fit(int(x_len), block_vec_size):
        raise LaneTileBudgetError(
            "mixed-chunk tiles require the whole x in VMEM "
            f"({x_len} rows x bs={block_vec_size} exceeds the budget)"
        )
    mt = pack_mixed_tiles(
        scs, dtype=dtype, tiles_per_step=tiles_per_step,
        chunks_per_group=chunks_per_group, x_len=x_len,
        window_rows=window_rows, m_mixed=m_mixed,
    )
    if mt.n_tiles > MAX_META_TILES:
        raise LaneTileBudgetError(
            f"mixed-tile count {mt.n_tiles} exceeds the SMEM meta budget "
            f"({MAX_META_TILES})"
        )
    tps = mt.tiles_per_step
    assert mt.n_tiles % 2 == 0
    src16 = mt.src_tab.astype(np.uint16).view(np.int16).reshape(
        mt.n_tiles // 2, 2 * TILE_J, LANES
    )
    vals = mt.vals
    if vals.dtype.itemsize == 2:
        vals = vals.reshape(mt.n_tiles // 2, 2 * TILE_J, LANES)
    step_group = mt.tile_group[::tps].astype(np.int32)
    ns = step_group.shape[0]
    first = np.ones(ns, dtype=np.int32)
    first[1:] = (step_group[1:] != step_group[:-1]).astype(np.int32)
    x_rows = max((int(x_len) + LANES - 1) // LANES, mt.window_rows)
    band = (mt.cls[:, 0] // max(m_mixed, 1)).astype(np.int32)
    assert int(band.max(initial=0)) < 64
    meta = (mt.w_row.astype(np.int32) << 6) | band
    put = lambda a: jax.device_put(a, device) if device else jnp.asarray(a)
    return DeviceMixedTiles(
        vals=put(vals),
        src16=put(src16),
        meta=put(meta),
        step_group=put(step_group),
        step_first=put(first),
        tiles_per_step=tps,
        chunks_per_group=mt.chunks_per_group,
        n_groups=mt.n_groups,
        n_chunks=mt.n_chunks,
        n_rows_padded=mt.n_rows_padded,
        nnz=mt.nnz,
        fill=mt.fill,
        window_rows=mt.window_rows,
        m_mixed=m_mixed,
        x_rows_total=int(x_rows),
    )


def stack_device_mixed_tiles(devs: list) -> DeviceMixedTiles:
    """Stack per-shard DeviceMixedTiles on a leading 'rows' axis for
    shard_map execution (same no-op-step padding scheme as
    stack_device_lane_tiles; zero meta/vals tiles are += 0 into band 0)."""
    tps = devs[0].tiles_per_step
    G = devs[0].chunks_per_group
    WR = max(d.window_rows for d in devs)
    m = devs[0].m_mixed
    assert all(
        d.tiles_per_step == tps and d.chunks_per_group == G
        and d.m_mixed == m for d in devs
    )
    x_rows_total = max(
        d.x_rows_total + (WR - d.window_rows) for d in devs
    )
    NG = max(d.n_groups for d in devs)
    NS = max(d.n_tiles // tps + (NG - d.n_groups) for d in devs)
    NT = NS * tps
    vp = devs[0].vals.shape[1] == 2 * TILE_J

    def pad_to(a, n, fill=0):
        a = np.asarray(a)
        if a.shape[0] == n:
            return a
        width = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    vals, src, meta, sg, sf = [], [], [], [], []
    for d in devs:
        nv = NT // 2 if vp else NT
        vals.append(pad_to(d.vals, nv))
        src.append(pad_to(d.src16, NT // 2))
        meta.append(pad_to(d.meta, NT))
        g = list(np.asarray(d.step_group))
        f = list(np.asarray(d.step_first))
        for q in range(d.n_groups, NG):
            g.append(q)
            f.append(1)
        while len(g) < NS:
            g.append(g[-1] if g else 0)
            f.append(0)
        sg.append(np.asarray(g, dtype=np.int32))
        sf.append(np.asarray(f, dtype=np.int32))
    return DeviceMixedTiles(
        vals=jnp.asarray(np.stack(vals)),
        src16=jnp.asarray(np.stack(src)),
        meta=jnp.asarray(np.stack(meta)),
        step_group=jnp.asarray(np.stack(sg)),
        step_first=jnp.asarray(np.stack(sf)),
        tiles_per_step=tps,
        chunks_per_group=G,
        n_groups=NG,
        n_chunks=max(d.n_chunks for d in devs),
        n_rows_padded=max(d.n_rows_padded for d in devs),
        nnz=sum(d.nnz for d in devs),
        fill=float(np.mean([d.fill for d in devs])),
        window_rows=WR,
        m_mixed=m,
        x_rows_total=x_rows_total,
    )


def _gather_window(window, sub_tab, lane_tab, wr, acc_dtype=None):
    """Two-step gather from an (wr, 128) window value.

    narrow (wr=8): one sublane gather + one lane gather. wide (wr=16/32):
    the window splits into wr/8 (8,128) pieces; sublane gathers run on each
    and the sublane table's high bits select between them (multi-level
    select: +1 gather +1 VPU select per extra piece per element-tile)
    before the lane gather. Wider windows trade a little VPU work for far
    fewer spill tiles on scattered-column matrices (VERDICT r1 item 2)."""
    if wr == TILE_J:
        t1 = gather_sublanes(window, sub_tab)
    else:
        t1 = gather_sublanes(window[0:TILE_J], sub_tab)
        for p in range(1, wr // TILE_J):
            hi = gather_sublanes(
                window[p * TILE_J : (p + 1) * TILE_J], sub_tab
            )
            t1 = jnp.where(sub_tab >= p * TILE_J, hi, t1)
    return gather_lanes(t1, lane_tab)


def _two_sum(a, b):
    """Error-free f32 addition: returns (s, err) with a + b == s + err
    exactly (Knuth TwoSum, 6 flops, no FMA needed)."""
    s = a + b
    bv = s - a
    err = (a - (s - bv)) + (b - bv)
    return s, err


def _two_prod(a, b):
    """Error-free f32 product via Dekker/Veltkamp splitting (no FMA on the
    VPU): returns (p, err) with a * b == p + err exactly for normal
    inputs. 4097 = 2^12 + 1 splits the 24-bit mantissa into 12 + 12 so the
    partial products are exact in f32."""
    split = np.float32(4097.0)
    p = a * b
    ah = a * split
    ah = ah - (ah - a)
    al = a - ah
    bh = b * split
    bh = bh - (bh - b)
    bl = b - bh
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def df64_pair_add(a, b):
    """Double-float addition of two (hi, lo) pair arrays ([..., 2]).

    Used OUTSIDE kernels to merge two df64 partial results — e.g. the
    interior and halo contributions under comm/compute overlap — without
    rounding at f32: TwoSum keeps the hi-component roundoff, so the only
    loss is the final f32 round of the combined lo terms (~2^-48 relative,
    the same order as the kernel's internal accumulation). This is what
    lets -dp_emu keep overlap on; a componentwise ``+`` would silently
    discard the error-free structure (VERDICT r3 item 4). The result pair
    may be unnormalized, which to_host's exact per-component f64 summation
    absorbs."""
    s, e = _two_sum(a[..., 0], b[..., 0])
    lo = e + (a[..., 1] + b[..., 1])
    return jnp.stack([s, lo], axis=-1)


def _kernel_df64(
    # scalar-prefetch refs (SMEM)
    meta_ref,
    sg_ref,
    sf_ref,
    # blocked inputs
    vals_ref,  # (2*TILES_PER_STEP, 8, 128) f32: tile 2k = hi, 2k+1 = lo
    src_ref,  # (TILES_PER_STEP/2, 16, 128) int16 gather tables
    x_ref,  # (2, bs, x_rows, 128) f32: plane 0 = hi, plane 1 = lo
    out_ref,  # (2, bs, G, 8, 128) f32 running double-float accumulator
    *,
    tps,
    wr,
    bs,
):
    """Double-float (f32, f32) SpMV — the dp-on-TPU emulation path.

    The TPU has no native f64 (the axon plugin silently computes f64 as
    f32), so the reference's dp benchmark line normally runs on CPU here
    (SURVEY.md §7). With -dp_emu, matrix values and x travel as hi/lo f32
    pairs and each element does an error-free TwoProd + TwoSum into a
    double-float accumulator: ~2^-48 relative accuracy (vs f64's 2^-53)
    at ~2x the stream bytes and ~25 VPU ops/element instead of 1 FMA."""
    del sg_ref
    step = pl.program_id(0)

    @pl.when(sf_ref[step] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = step * tps
    I32_0 = np.int32(0)
    I32_1 = np.int32(1)
    for k in range(tps):
        m = meta_ref[base + k]
        w = m >> CL_BITS
        cl = jnp.bitwise_and(m, (1 << CL_BITS) - 1)
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        sub_tab = jnp.right_shift(packed, 7)
        vh = vals_ref[2 * k]
        vl = vals_ref[2 * k + 1]
        for b in range(bs):
            bi = np.int32(b)
            gh = _gather_window(
                x_ref[I32_0, bi, pl.ds(w, wr), :], sub_tab, lane_tab, wr
            )
            gl = _gather_window(
                x_ref[I32_1, bi, pl.ds(w, wr), :], sub_tab, lane_tab, wr
            )
            ph, pe = _two_prod(vh, gh)
            plo = pe + vh * gl + vl * gh  # v*x to ~2^-48 (vl*gl dropped)
            sh = out_ref[I32_0, bi, cl]
            th, te = _two_sum(sh, ph)
            out_ref[I32_0, bi, cl] = th
            out_ref[I32_1, bi, cl] = out_ref[I32_1, bi, cl] + (te + plo)


def _kernel(
    # scalar-prefetch refs (SMEM)
    meta_ref,  # [nt] int32 packed (w_row << CL_BITS) | chunk_local
    sg_ref,  # [ns] int32 (consumed by the out index map)
    sf_ref,  # [ns] int32: 1 = first step of group
    # blocked inputs
    vals_ref,  # (TILES_PER_STEP, 8, 128)
    src_ref,  # (TILES_PER_STEP/2, 16, 128) int16 gather tables
    x_ref,  # (bs, x_rows, 128) all RHS vectors in VMEM
    out_ref,  # (bs, G, 8, 128) the step's group output block (VMEM-resident
    #           across the group's consecutive steps)
    *,
    acc_dtype,
    tps,
    bs,
    wr,
    unit=False,
):
    del sg_ref
    step = pl.program_id(0)

    @pl.when(sf_ref[step] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = step * tps
    vals_paired = vals_ref.shape[1] == 2 * TILE_J
    # the hot loop is branch-free; each tile does 1 SMEM meta read, 2 unpack
    # ops, and per RHS vector 2 hardware gathers, 1 fma and 1 dynamic VMEM
    # read-modify-write. Block vectors (SpMMV) share one matrix stream —
    # the whole point of the reference's block kernels (kernels.hpp:306-551)
    for k in range(tps):
        m = meta_ref[base + k]
        w = m >> CL_BITS
        cl = jnp.bitwise_and(m, (1 << CL_BITS) - 1)
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        if unit:
            # all-ones matrix: no value stream; bit 15 (int16 sign) marks
            # padding slots, the select replaces the v*g multiply
            sub_tab = jnp.bitwise_and(jnp.right_shift(packed, 7), 63)
            for b in range(bs):
                window = x_ref[b, pl.ds(w, wr), :]
                g = _gather_window(window, sub_tab, lane_tab, wr)
                g = jnp.where(packed >= 0, g, jnp.zeros_like(g))
                out_ref[b, cl] = out_ref[b, cl] + g.astype(acc_dtype)
            continue
        sub_tab = jnp.right_shift(packed, 7)
        if vals_paired:  # 2-byte dtypes ride (16,128) tiles like src16
            v = vals_ref[k // 2, pl.ds(half, TILE_J), :].astype(acc_dtype)
        else:
            v = vals_ref[k].astype(acc_dtype)
        for b in range(bs):
            window = x_ref[b, pl.ds(w, wr), :]
            g = _gather_window(window, sub_tab, lane_tab, wr)
            out_ref[b, cl] = out_ref[b, cl] + v * g.astype(acc_dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceProductTiles:
    """Phase-1 of the transpose-stream mode (see ops/packer.py
    pack_product_tiles): per tile, gather x from one narrow window and
    write the products SEQUENTIALLY — no output read-modify-write at
    all. Phases 2/3 (XLA transpose + the regular lane-tile kernel over
    the 0/1 row map) turn the product stream into y."""

    vals: jax.Array  # [nt, 8, 128]
    src16: jax.Array  # [nt/2, 16, 128] int16 (sub<<7)|lane
    meta: jax.Array  # [nt] int32: window start row

    tiles_per_step: int = dataclasses.field(metadata=dict(static=True))
    n_tiles_static: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))
    window_rows: int = dataclasses.field(metadata=dict(static=True))
    x_rows_total: int = dataclasses.field(metadata=dict(static=True))

    def stream_bytes(self) -> int:
        return int(self.vals.nbytes + self.src16.nbytes)


def build_device_product_tiles(pt, dtype=np.float32, device=None):
    from .packer import auto_tiles_per_step

    nt = pt.n_tiles
    tps = auto_tiles_per_step(nt)
    # pad to a multiple of tps (and even, for src16 pairing)
    nt_pad = ((nt + tps - 1) // tps) * tps
    vals = pt.vals.astype(dtype)
    src = pt.src_tab
    w = pt.w_row
    if nt_pad != nt:
        vals = np.pad(vals, ((0, nt_pad - nt), (0, 0), (0, 0)))
        src = np.pad(src, ((0, nt_pad - nt), (0, 0), (0, 0)))
        w = np.pad(w, (0, nt_pad - nt))
    src16 = src.astype(np.uint16).view(np.int16).reshape(
        nt_pad // 2, 2 * TILE_J, LANES
    )
    put = lambda a: jax.device_put(a, device) if device else jnp.asarray(a)
    x_rows = int(w.max(initial=0)) + pt.window_rows
    return DeviceProductTiles(
        vals=put(vals),
        src16=put(src16),
        meta=put(w.astype(np.int32)),
        tiles_per_step=tps,
        n_tiles_static=nt_pad,
        nnz=pt.nnz_packed,
        fill=pt.fill,
        window_rows=pt.window_rows,
        x_rows_total=x_rows,
    )


def stack_device_product_tiles(devs: list) -> DeviceProductTiles:
    """Stack per-shard UNFUSED product tiles on a leading 'rows' axis for
    shard_map execution (the fused stacker is
    :func:`stack_device_product_tiles_t`). The caller forces a common
    grid geometry, so every array already has identical shape."""
    d0 = devs[0]
    assert all(
        d.tiles_per_step == d0.tiles_per_step
        and d.n_tiles_static == d0.n_tiles_static
        and d.window_rows == d0.window_rows
        for d in devs
    ), "product-tile shards must share forced grid geometry"
    return DeviceProductTiles(
        vals=jnp.asarray(np.stack([np.asarray(d.vals) for d in devs])),
        src16=jnp.asarray(np.stack([np.asarray(d.src16) for d in devs])),
        meta=jnp.asarray(np.stack([np.asarray(d.meta) for d in devs])),
        tiles_per_step=d0.tiles_per_step,
        n_tiles_static=d0.n_tiles_static,
        nnz=sum(d.nnz for d in devs),
        fill=float(np.mean([d.fill for d in devs])),
        window_rows=d0.window_rows,
        x_rows_total=max(d.x_rows_total for d in devs),
    )


def _kernel_products(
    meta_ref,  # [nt] int32 window start row
    # blocked inputs
    vals_ref,
    src_ref,
    x_ref,  # (x_rows, 128) whole x in VMEM
    out_ref,  # (tps, 8, 128) — this step's product block, written once
    *,
    tps,
    wr,
):
    step = pl.program_id(0)
    base = step * tps
    for k in range(tps):
        w = meta_ref[base + k]
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        sub_tab = jnp.bitwise_and(jnp.right_shift(packed, 7), 63)
        v = vals_ref[k]
        window = x_ref[pl.ds(w, wr), :]
        g = _gather_window(window, sub_tab, lane_tab, wr)
        out_ref[k] = v * g


def spmv_product_tiles(
    dev: DeviceProductTiles, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """Phase 1: products p[tile, a, j] = val * x[col]. x: [n] f32."""
    if interpret is None:
        interpret = not pallas_supported()
    x_rows = max((x.shape[0] + LANES - 1) // LANES, dev.x_rows_total)
    x2 = x.astype(jnp.float32)
    if x2.shape[0] < x_rows * LANES:
        x2 = jnp.pad(x2, (0, x_rows * LANES - x2.shape[0]))
    x2 = x2.reshape(x_rows, LANES)
    Z = np.int32(0)
    tps = dev.tiles_per_step
    nt = dev.n_tiles_static
    ns = nt // tps
    vals_spec = pl.BlockSpec(
        (tps, TILE_J, LANES), lambda s, m_: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    src_spec = pl.BlockSpec(
        (tps // 2, 2 * TILE_J, LANES), lambda s, m_: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec(
        x2.shape, lambda s, m_: (Z, Z), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (tps, TILE_J, LANES), lambda s, m_: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns,),
        in_specs=[vals_spec, src_spec, x_spec],
        out_specs=out_spec,
    )
    return _pallas_call(
        "spmv_product_tiles",
        functools.partial(_kernel_products, tps=tps, wr=dev.window_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, TILE_J, LANES), jnp.float32),
        interpret=interpret,
    )(dev.meta, dev.vals, dev.src16, x2)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceProductTilesT:
    """Transposed-write variant of DeviceProductTiles: each grid step
    computes the product tiles of ``gb`` consecutive column blocks x
    ``m_blocks`` chunk groups, stages them in a VMEM scratch as a
    (gb*s_pad, 128) stack, and writes the transpose STRAIGHT to the PT
    slab — the separate XLA transpose pass of the 3-pass mode (an extra
    HBM read+write of the whole padded grid) disappears.

    Mosaic legality (the round-4 regression, VERDICT r5 item 1): the
    output block is (m*128, gb*s_pad) with gb = 128/gcd(s_pad, 128), so
    BOTH trailing block dims are multiples of 128 — a single column
    block's s_pad (8*odd under the odd-s8 lane spreading) never is. The
    in-kernel transpose moves whole (128, 128) slices, the one shape the
    crossbar handles natively. Requires NB % gb == 0 (the callers pad NB
    to a multiple of 128/gcd(s_pad,128) already, for the free flat PT
    reshape)."""

    vals: jax.Array  # [nt, 8, 128], nt = NB * NCg_pad * s8
    src16: jax.Array  # [nt/2, 16, 128] int16 (sub<<7)|lane
    meta: jax.Array  # [nt] int32: window start row

    m_blocks: int = dataclasses.field(metadata=dict(static=True))
    s8: int = dataclasses.field(metadata=dict(static=True))
    gb: int = dataclasses.field(metadata=dict(static=True))
    NB: int = dataclasses.field(metadata=dict(static=True))
    NCg_pad: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    fill: float = dataclasses.field(metadata=dict(static=True))
    window_rows: int = dataclasses.field(metadata=dict(static=True))
    x_rows_total: int = dataclasses.field(metadata=dict(static=True))

    @property
    def s_pad(self) -> int:
        return 8 * self.s8

    def stream_bytes(self) -> int:
        return int(self.vals.nbytes + self.src16.nbytes)


def product_tiles_t_group(s_pad: int) -> int:
    """Column blocks one fused-kernel step must cover so the output
    block's trailing dim gb*s_pad is a multiple of 128 (Mosaic)."""
    import math

    return LANES // math.gcd(s_pad, LANES)


def product_tiles_t_vmem_bytes(s_pad: int, n_rows_padded: int) -> int:
    """Per-step VMEM estimate for the fused kernel (double-buffered
    16-tile vals/src blocks + resident out block + scratch + whole-x);
    callers fall back to the unfused phase-1 + XLA transpose when this
    exceeds the budget. The trace depth is constant (the tile sweep is
    a grid dimension, FUSED_P1_TILE_UNROLL tiles per inner step), so
    VMEM is the only refusal criterion."""
    s8 = s_pad // 8
    gb = product_tiles_t_group(s_pad)
    m = max(1, 64 // (gb * s8))
    vals_b = FUSED_P1_TILE_UNROLL * TILE_J * LANES * 4
    src_b = vals_b // 2
    out_b = m * LANES * gb * s_pad * 4
    scratch_b = gb * s_pad * LANES * 4
    x_b = ((n_rows_padded + LANES - 1) // LANES) * LANES * 4
    return 2 * (vals_b + src_b) + out_b + scratch_b + x_b


def build_device_product_tiles_t(pt, dtype=np.float32, device=None):
    """pt: a ProductTiles whose NB satisfies NB * s_pad % 128 == 0."""
    s8 = pt.s_pad // 8
    if (pt.NB * pt.s_pad) % LANES:
        raise ValueError("transposed product tiles need NB*s_pad % 128 == 0")
    gb = product_tiles_t_group(pt.s_pad)
    if pt.NB % gb:
        raise ValueError(
            f"transposed product tiles need NB % {gb} == 0 (got {pt.NB})"
        )
    # chunk groups per grid step: ~64+ tiles/step amortizes the SMEM meta
    # reads; gb*s8 tiles per (step, chunk group) already exceed that for
    # the odd-s8 slabs. tps = gb*m*s8 is even whenever gb is even; the
    # gb == 1 case (s_pad % 128 == 0) has s8 % 16 == 0, so the src16
    # pairing stays intact in every case.
    m = max(1, 64 // (gb * s8))
    NCg_p = ((pt.NCg + m - 1) // m) * m
    v5 = pt.vals.astype(dtype).reshape(pt.NB, pt.NCg, s8, TILE_J, LANES)
    s5 = pt.src_tab.reshape(pt.NB, pt.NCg, s8, TILE_J, LANES)
    w2 = pt.w_row.reshape(pt.NB, pt.NCg, s8)
    if NCg_p != pt.NCg:
        pad = ((0, 0), (0, NCg_p - pt.NCg), (0, 0))
        v5 = np.pad(v5, pad + ((0, 0), (0, 0)))
        s5 = np.pad(s5, pad + ((0, 0), (0, 0)))
        w2 = np.pad(w2, pad, mode="edge")  # keep windows in range
    # reorder tiles (NB, NCg_p, s8) -> (NBg, gpb, m, gb, s8) so one grid
    # step reads its gb column blocks x m chunk groups contiguously AND
    # the kernel's rolled loop index is affine: for chunk group cb, tile
    # q = cb*gb*s8 + t with t enumerating (bb, k1) — the lax.fori_loop
    # needs this (the unrolled kernel's per-op lowering nested past the
    # remote compiler's recursion limit at production tile counts)
    NBg = pt.NB // gb
    gpb = NCg_p // m

    def regroup(a5):
        # (NB, NCg_p, s8, ...) -> (NBg, gpb, m, gb, s8, ...)
        a7 = a5.reshape((NBg, gb, gpb, m) + a5.shape[2:])
        return a7.transpose((0, 2, 3, 1) + tuple(range(4, a7.ndim)))

    v5 = regroup(v5)
    s5 = regroup(s5)
    w2 = regroup(w2)
    nt = pt.NB * NCg_p * s8
    vals = v5.reshape(nt, TILE_J, LANES)
    src16 = (
        s5.reshape(nt, TILE_J, LANES)
        .astype(np.uint16)
        .view(np.int16)
        .reshape(nt // 2, 2 * TILE_J, LANES)
    )
    w = w2.reshape(nt).astype(np.int32)
    put = lambda a: jax.device_put(a, device) if device else jnp.asarray(a)
    x_rows = int(w.max(initial=0)) + pt.window_rows
    return DeviceProductTilesT(
        vals=put(np.ascontiguousarray(vals)),
        src16=put(np.ascontiguousarray(src16)),
        meta=put(w),
        m_blocks=m,
        s8=s8,
        gb=gb,
        NB=pt.NB,
        NCg_pad=NCg_p,
        nnz=pt.nnz_packed,
        fill=pt.fill,
        window_rows=pt.window_rows,
        x_rows_total=x_rows,
    )


def stack_device_product_tiles_t(devs: list) -> DeviceProductTilesT:
    """Stack per-shard DeviceProductTilesT on a leading 'rows' axis for
    shard_map execution. Unlike lane tiles, no tile padding happens here:
    the caller (runtime/tstream.build_tstream_shards) forces a COMMON
    grid geometry (NB, s_pad, n_rows_padded) across shards so every
    array already has identical shape."""
    d0 = devs[0]
    assert all(
        d.m_blocks == d0.m_blocks and d.s8 == d0.s8 and d.NB == d0.NB
        and d.gb == d0.gb
        and d.NCg_pad == d0.NCg_pad and d.window_rows == d0.window_rows
        for d in devs
    ), "product-tile shards must share forced grid geometry"
    return DeviceProductTilesT(
        vals=jnp.asarray(np.stack([np.asarray(d.vals) for d in devs])),
        src16=jnp.asarray(np.stack([np.asarray(d.src16) for d in devs])),
        meta=jnp.asarray(np.stack([np.asarray(d.meta) for d in devs])),
        m_blocks=d0.m_blocks,
        s8=d0.s8,
        gb=d0.gb,
        NB=d0.NB,
        NCg_pad=d0.NCg_pad,
        nnz=sum(d.nnz for d in devs),
        fill=float(np.mean([d.fill for d in devs])),
        window_rows=d0.window_rows,
        x_rows_total=max(d.x_rows_total for d in devs),
    )


# tiles one inner grid step processes: 16 tiles = a (128, 128) block of
# the 2D value/src views. gb*s8 % 16 == 0 always (gb*s_pad % 128 == 0 by
# construction => gb*s8 % 16 == 0), so FUSED_P1_TILE_UNROLL | gb*s8.
FUSED_P1_TILE_UNROLL = 16


def _kernel_products_t(
    meta_ref,  # [nt] int32 window start row
    ot1_ref,  # [n_steps] int32 out-block row index per flat step
    ot2_ref,  # [n_steps] int32 out-block col index per flat step
    vals_ref,  # (u*8, 128) — this step's u tiles
    src_ref,  # (u*8, 128) int16
    x_ref,  # (x_rows, 128) whole x in VMEM
    out_ref,  # (m*128, gb*s_pad) — transposed PT blocks, VMEM-resident
    scratch_ref,  # (gb*s_pad, 128) f32 VMEM staging, persists across grid
    *,
    m,
    s8,
    gb,
    wr,
):
    """The tile sweep is the GRID, not an in-kernel loop. Three
    formulations fail to lower for real TPUs (bisected on the v5e,
    BASELINE.md round 5): a Python unroll at production tile counts
    (~100-200/step) nests Mosaic's per-op lowering past the Python
    recursion limit; a lax.fori_loop trips a Mosaic verifier bug on
    tpu.dynamic_gather inside a loop region ("'arith.muli' op requires
    the same type for all operands"); and ANY arithmetic inside a
    BlockSpec index map under jax_enable_x64 (which this package turns
    on for f64 host I/O) recurses infinitely in Mosaic's
    convert_element_type rule — the weak-i64 literals the arithmetic
    promotes produce an i64->i32 convert whose lowering helper re-emits
    itself. Hence: a FLAT 1D grid where the vals/src block index IS the
    step id (the build already orders tiles step-major), the out block
    index comes from two tiny prefetched SMEM tables (the proven
    mixed-tile pattern, spmv_mixed_tiles), and the body — where
    arithmetic lowers fine — derives (cb, t) from the step id with a
    constant FUSED_P1_TILE_UNROLL-tile unroll so every gather sits in
    straight-line code. Each chunk group stages its gb*s8 product tiles
    into the persistent VMEM scratch; the last inner position flushes
    the stack through whole (128, 128) transposes (the native crossbar
    shape — gb*s_pad is a multiple of 128 by construction) into the out
    block, whose table-mapped index is constant across the m*nti
    consecutive steps so Pallas keeps it resident."""
    q = pl.program_id(0)
    u = FUSED_P1_TILE_UNROLL
    gbs8 = gb * s8
    nti = gbs8 // u
    # raw lax.rem/div on strong-i32 operands, NOT jnp's %/'//': the jnp
    # wrappers promote through weak-i64 literals under jax_enable_x64
    # and the resulting i64->i32 convert infinitely recurses in Mosaic's
    # convert_element_type lowering (same bug the index maps hit)
    t = jax.lax.rem(q, jnp.int32(nti))  # position within the tile sweep
    cb = jax.lax.rem(  # chunk group within the resident out block
        jax.lax.div(q, jnp.int32(nti)), jnp.int32(m)
    )
    base = q * u  # meta is tile-ordered: gbs8 = nti*u makes this exact

    for k in range(u):
        w = meta_ref[base + k]
        packed = src_ref[pl.ds(k * TILE_J, TILE_J), :].astype(jnp.int32)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        sub_tab = jnp.bitwise_and(jnp.right_shift(packed, 7), 63)
        v = vals_ref[pl.ds(k * TILE_J, TILE_J), :]
        window = x_ref[pl.ds(w, wr), :]
        g = _gather_window(window, sub_tab, lane_tab, wr)
        scratch_ref[pl.ds((t * u + k) * TILE_J, TILE_J), :] = v * g

    @pl.when(t == nti - 1)
    def _():
        for i in range((gbs8 * TILE_J) // LANES):
            out_ref[
                pl.ds(cb * LANES, LANES), pl.ds(i * LANES, LANES)
            ] = scratch_ref[pl.ds(i * LANES, LANES), :].T


def spmv_product_tiles_t(
    dev: DeviceProductTilesT, x: jax.Array,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Phase 1+2 fused: returns PT as [NCg_pad*128, NB*s_pad] f32 whose
    free flat view is the phase-3 x vector (rows past NC are zero)."""
    if interpret is None:
        interpret = not pallas_supported()
    x_rows = max((x.shape[0] + LANES - 1) // LANES, dev.x_rows_total)
    x2 = x.astype(jnp.float32)
    if x2.shape[0] < x_rows * LANES:
        x2 = jnp.pad(x2, (0, x_rows * LANES - x2.shape[0]))
    x2 = x2.reshape(x_rows, LANES)
    Z = np.int32(0)
    m = dev.m_blocks
    s8 = dev.s8
    gb = dev.gb
    gbs8 = gb * s8
    u = FUSED_P1_TILE_UNROLL
    nti = gbs8 // u  # inner grid steps per (outer step, chunk group)
    gpb = dev.NCg_pad // m  # steps (row blocks) per column-block group
    NBg = dev.NB // gb
    ns = NBg * gpb
    s_pad = dev.s_pad
    # FLAT 1D grid: one step per 16-tile block, in build order, so the
    # vals/src block index IS the step id (u=16 => native (128, 128) f32
    # / legal (128, 128) int16 blocks). The out block index comes from
    # two tiny prefetched tables — index maps must stay arithmetic-free:
    # under jax_enable_x64 any index-map arithmetic hits an infinite
    # recursion in Mosaic's convert_element_type lowering (see kernel
    # docstring); table lookups by a bare program id are the proven
    # pattern (spmv_mixed_tiles)
    n_steps = ns * m * nti
    sidx = np.arange(n_steps, dtype=np.int32) // (m * nti)
    ot1 = (sidx % gpb).astype(np.int32)  # out row-block per step
    ot2 = (sidx // gpb).astype(np.int32)  # out col-block per step
    vals2d = dev.vals.reshape(-1, LANES)
    src2d = dev.src16.reshape(-1, LANES)
    vals_spec = pl.BlockSpec(
        (u * TILE_J, LANES),
        lambda q, m_, o1_, o2_: (q, Z),
        memory_space=pltpu.VMEM,
    )
    src_spec = pl.BlockSpec(
        (u * TILE_J, LANES),
        lambda q, m_, o1_, o2_: (q, Z),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec(
        x2.shape, lambda q, m_, o1_, o2_: (Z, Z), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (m * LANES, gb * s_pad),
        lambda q, m_, o1_, o2_: (o1_[q], o2_[q]),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_steps,),
        in_specs=[vals_spec, src_spec, x_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((gb * s_pad, LANES), jnp.float32)],
    )
    return _pallas_call(
        "spmv_product_tiles_t",
        functools.partial(
            _kernel_products_t, m=m, s8=s8, gb=gb, wr=dev.window_rows
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (dev.NCg_pad * LANES, dev.NB * s_pad), jnp.float32
        ),
        interpret=interpret,
    )(dev.meta, jnp.asarray(ot1), jnp.asarray(ot2), vals2d, src2d, x2)


def _kernel_mixed(
    # scalar-prefetch refs (SMEM)
    meta_ref,  # [nt] int32 packed (w_row << 6) | band
    sg_ref,  # [ns] int32 (consumed by the out index map)
    sf_ref,  # [ns] int32: 1 = first step of group
    # blocked inputs
    vals_ref,
    src_ref,  # [tps/2, 16, 128] int16 (sel<<13)|(sub<<7)|lane
    x_ref,  # (bs, x_rows, 128)
    out_ref,  # (bs, G, 8, 128)
    *,
    acc_dtype,
    tps,
    bs,
    wr,
    m,
    G,
):
    """Mixed-chunk tile SpMV: one gather per tile, then ``m`` masked
    read-modify-writes route each element's product to its chunk's output
    block — chunk-local id = band*m + selector (banded selectors;
    selector = src16 bits 12-14). ~3 extra VPU ops per chunk slot buys an
    m-fold candidate pool for zero-column-locality matrices (see
    ops/packer.py pack_mixed_tiles; reference CRS kernels degrade
    gracefully on such matrices via cachelines, kernels.hpp:22-63 — this
    is the TPU equivalent of that graceful degradation)."""
    del sg_ref
    step = pl.program_id(0)

    @pl.when(sf_ref[step] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    base = step * tps
    vals_paired = vals_ref.shape[1] == 2 * TILE_J
    for k in range(tps):
        mword = meta_ref[base + k]
        band = jnp.bitwise_and(mword, 63)
        w = jnp.right_shift(mword, 6)
        cl0 = band * m
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        # masks make int16 sign-extension harmless (bits are preserved)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        sub_tab = jnp.bitwise_and(jnp.right_shift(packed, 7), 63)
        sel = jnp.bitwise_and(jnp.right_shift(packed, 13), 7)
        if vals_paired:
            v = vals_ref[k // 2, pl.ds(half, TILE_J), :].astype(acc_dtype)
        else:
            v = vals_ref[k].astype(acc_dtype)
        for b in range(bs):
            window = x_ref[b, pl.ds(w, wr), :]
            g = _gather_window(window, sub_tab, lane_tab, wr)
            p = v * g.astype(acc_dtype)
            for q in range(m):
                cl = jnp.minimum(cl0 + np.int32(q), np.int32(G - 1))
                out_ref[b, cl] = out_ref[b, cl] + jnp.where(
                    sel == q, p, jnp.zeros_like(p)
                )


def spmv_mixed_tiles(
    dev: DeviceMixedTiles, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """y = A @ x through mixed-chunk tiles (whole-x VMEM residence)."""
    if interpret is None:
        interpret = not pallas_supported()
    n_pad = dev.n_rows_padded
    x_rows = max(
        (x.shape[0] + LANES - 1) // LANES, dev.window_rows, dev.x_rows_total
    )
    block = x.ndim == 2
    bs = x.shape[1] if block else 1
    x3d = x if block else x[:, None]
    if x3d.dtype.itemsize == 2:
        x3d = x3d.astype(jnp.float32)
    if x3d.shape[0] < x_rows * LANES:
        x3d = jnp.pad(x3d, ((0, x_rows * LANES - x3d.shape[0]), (0, 0)))
    x3d = x3d.T.reshape(bs, x_rows, LANES)
    acc_dtype = jnp.float32 if x.dtype != jnp.float64 else jnp.float64

    Z = np.int32(0)
    nt = dev.n_tiles
    tps = dev.tiles_per_step
    G = dev.chunks_per_group
    assert nt % tps == 0
    ns = nt // tps
    vals_spec = pl.BlockSpec(
        (tps // 2, 2 * TILE_J, LANES)
        if dev.vals.shape[1] == 2 * TILE_J
        else (tps, TILE_J, LANES),
        lambda s, m_, g_, f_: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    src_spec = pl.BlockSpec(
        (tps // 2, 2 * TILE_J, LANES),
        lambda s, m_, g_, f_: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec(
        x3d.shape, lambda s, m_, g_, f_: (Z, Z, Z),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (bs, G, TILE_J, LANES),
        lambda s, m_, g_, f_: (Z, g_[s], Z, Z),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns,),
        in_specs=[vals_spec, src_spec, x_spec],
        out_specs=out_spec,
    )
    y = _pallas_call(
        "spmv_mixed_tiles",
        functools.partial(
            _kernel_mixed, acc_dtype=acc_dtype, tps=tps, bs=bs,
            wr=dev.window_rows, m=dev.m_mixed, G=G,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bs, dev.n_groups * G, TILE_J, LANES), acc_dtype
        ),
        interpret=interpret,
    )(dev.meta, dev.step_group, dev.step_first,
      dev.vals, dev.src16, x3d)
    y = y.reshape(bs, -1)[:, :n_pad].T.astype(x.dtype)
    return y if block else y[:, 0]


def _kernel_windowed(
    # scalar-prefetch refs (SMEM)
    meta_ref,  # [nt] int32 packed (w_rel << CL_BITS) | chunk_local
    sg_ref,  # [ns] int32 group of each step
    sf_ref,  # [ns] int32: 1 = first step of group
    gxb_ref,  # [n_groups] int32: x-window base row per group
    # blocked inputs
    vals_ref,
    src_ref,
    x_ref,  # (bs, x_rows, 128) in ANY (HBM); windows DMA'd per group
    out_ref,  # (bs, G, 8, 128)
    # scratch
    xwin_ref,  # (2, bs, XB, 128) VMEM double buffer
    sems,  # DMA semaphores (2,)
    *,
    acc_dtype,
    tps,
    bs,
    XB,
    n_groups,
    wr,
    unit=False,
):
    step = pl.program_id(0)
    g = sg_ref[step]
    I32_0 = np.int32(0)
    I32_1 = np.int32(1)

    def copy(slot, grp):
        # NOTE: slot/grp must be int32 — python literals trace as i64 under
        # jax_enable_x64, which Mosaic's memref_slice verifier rejects
        return pltpu.make_async_copy(
            x_ref.at[:, pl.ds(gxb_ref[grp], XB), :],
            xwin_ref.at[slot],
            sems.at[slot],
        )

    # one DMA per group: group g's window was started at group g-1's first
    # step (or the prologue); wait for it, then prefetch group g+1 into the
    # other buffer slot. Buffer slots alternate with group parity.
    @pl.when(sf_ref[step] == 1)
    def _():
        par = jnp.bitwise_and(g, I32_1)

        @pl.when(g == 0)
        def _():
            copy(I32_0, I32_0).start()

        @pl.when(par == 0)
        def _():
            copy(I32_0, g).wait()

        @pl.when(par == 1)
        def _():
            copy(I32_1, g).wait()

        @pl.when(g + I32_1 < n_groups)
        def _():
            nxt = jnp.bitwise_and(g + I32_1, I32_1)

            @pl.when(nxt == 0)
            def _():
                copy(I32_0, g + I32_1).start()

            @pl.when(nxt == 1)
            def _():
                copy(I32_1, g + I32_1).start()

        out_ref[...] = jnp.zeros_like(out_ref)

    slot = jnp.bitwise_and(g, I32_1)
    base = step * tps
    vals_paired = vals_ref.shape[1] == 2 * TILE_J
    for k in range(tps):
        m = meta_ref[base + k]
        w = m >> CL_BITS
        cl = jnp.bitwise_and(m, (1 << CL_BITS) - 1)
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        if unit:
            sub_tab = jnp.bitwise_and(jnp.right_shift(packed, 7), 63)
            for b in range(bs):
                bi = np.int32(b)
                window = xwin_ref[slot, bi, pl.ds(w, wr), :]
                gth = _gather_window(window, sub_tab, lane_tab, wr)
                gth = jnp.where(packed >= 0, gth, jnp.zeros_like(gth))
                out_ref[bi, cl] = out_ref[bi, cl] + gth.astype(acc_dtype)
            continue
        sub_tab = jnp.right_shift(packed, 7)
        if vals_paired:
            v = vals_ref[k // 2, pl.ds(half, TILE_J), :].astype(acc_dtype)
        else:
            v = vals_ref[k].astype(acc_dtype)
        for b in range(bs):
            window = xwin_ref[slot, np.int32(b), pl.ds(w, wr), :]
            gth = _gather_window(window, sub_tab, lane_tab, wr)
            bi = np.int32(b)
            out_ref[bi, cl] = out_ref[bi, cl] + v * gth.astype(acc_dtype)


def _kernel_df64_windowed(
    # scalar-prefetch refs (SMEM)
    meta_ref,
    sg_ref,
    sf_ref,
    gxb_ref,  # [n_groups] int32 x-window base row per group
    # blocked inputs
    vals_ref,  # (2*tps, 8, 128) hi/lo tile pairs
    src_ref,
    x_ref,  # (2, x_rows, 128) in ANY (HBM); both planes DMA'd per group
    out_ref,  # (2, G, 8, 128)
    # scratch
    xwin_ref,  # (2, 2, XB, 128): [buffer slot, hi/lo plane, rows, lanes]
    sems,
    *,
    tps,
    XB,
    n_groups,
    wr,
):
    """Double-float SpMV with per-group HBM->VMEM x windows — the same
    double-buffered DMA scheme as _kernel_windowed, shipping BOTH (hi,
    lo) planes per copy. Closes the round-2 gap where dp emulation
    refused matrices whose paired x exceeded the VMEM budget."""
    step = pl.program_id(0)
    g = sg_ref[step]
    I32_0 = np.int32(0)
    I32_1 = np.int32(1)

    def copy(slot, grp):
        return pltpu.make_async_copy(
            x_ref.at[:, pl.ds(gxb_ref[grp], XB), :],
            xwin_ref.at[slot],
            sems.at[slot],
        )

    @pl.when(sf_ref[step] == 1)
    def _():
        par = jnp.bitwise_and(g, I32_1)

        @pl.when(g == 0)
        def _():
            copy(I32_0, I32_0).start()

        @pl.when(par == 0)
        def _():
            copy(I32_0, g).wait()

        @pl.when(par == 1)
        def _():
            copy(I32_1, g).wait()

        @pl.when(g + I32_1 < n_groups)
        def _():
            nxt = jnp.bitwise_and(g + I32_1, I32_1)

            @pl.when(nxt == 0)
            def _():
                copy(I32_0, g + I32_1).start()

            @pl.when(nxt == 1)
            def _():
                copy(I32_1, g + I32_1).start()

        out_ref[...] = jnp.zeros_like(out_ref)

    slot = jnp.bitwise_and(g, I32_1)
    base = step * tps
    for k in range(tps):
        m = meta_ref[base + k]
        w = m >> CL_BITS
        cl = jnp.bitwise_and(m, (1 << CL_BITS) - 1)
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        sub_tab = jnp.right_shift(packed, 7)
        vh = vals_ref[2 * k]
        vl = vals_ref[2 * k + 1]
        gh = _gather_window(
            xwin_ref[slot, I32_0, pl.ds(w, wr), :], sub_tab, lane_tab, wr
        )
        gl = _gather_window(
            xwin_ref[slot, I32_1, pl.ds(w, wr), :], sub_tab, lane_tab, wr
        )
        ph, pe = _two_prod(vh, gh)
        plo = pe + vh * gl + vl * gh
        sh = out_ref[I32_0, cl]
        th, te = _two_sum(sh, ph)
        out_ref[I32_0, cl] = th
        out_ref[I32_1, cl] = out_ref[I32_1, cl] + (te + plo)


def _spmv_lane_tiles_df64(dev, x, interpret):
    """Double-float SpMV: x is an [n, 2] f32 (hi, lo) pair — or
    [n, bs, 2] for a rowwise block vector — returns the matching
    [n_rows_padded(, bs), 2] pair (see _kernel_df64)."""
    assert x.shape[-1] == 2, "df64 x must be an (n[, bs], 2) pair"
    block = x.ndim == 3
    bs = x.shape[1] if block else 1
    n_pad = dev.n_rows_padded
    x_rows = max(
        (x.shape[0] + LANES - 1) // LANES, dev.window_rows, dev.x_rows_total
    )
    x3d = x.astype(jnp.float32)
    if not block:
        x3d = x3d[:, None, :]  # (n, 1, 2)
    if x3d.shape[0] < x_rows * LANES:
        x3d = jnp.pad(
            x3d, ((0, x_rows * LANES - x3d.shape[0]), (0, 0), (0, 0))
        )
    # (n, bs, 2) -> (2, bs, x_rows, 128)
    x4d = jnp.transpose(x3d, (2, 1, 0)).reshape(2, bs, x_rows, LANES)
    Z = np.int32(0)
    nt = dev.n_tiles
    tps = dev.tiles_per_step
    G = dev.chunks_per_group
    assert nt % tps == 0
    ns = nt // tps
    windowed = dev.x_block_rows > 0
    if windowed:
        assert bs == 1, "windowed df64 supports bs=1 only"
        XB = dev.x_block_rows
        vals_spec = pl.BlockSpec(
            (2 * tps, TILE_J, LANES), lambda s, m, g, f, xb: (s, Z, Z),
            memory_space=pltpu.VMEM,
        )
        src_spec = pl.BlockSpec(
            (tps // 2, 2 * TILE_J, LANES),
            lambda s, m, g, f, xb: (s, Z, Z),
            memory_space=pltpu.VMEM,
        )
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        out_spec = pl.BlockSpec(
            (2, G, TILE_J, LANES), lambda s, m, g, f, xb: (Z, g[s], Z, Z),
            memory_space=pltpu.VMEM,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(ns,),
            in_specs=[vals_spec, src_spec, x_spec],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((2, 2, XB, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        y = _pallas_call(
            "spmv_lane_tiles_df64_windowed",
            functools.partial(
                _kernel_df64_windowed, tps=tps, XB=XB,
                n_groups=dev.n_groups, wr=dev.window_rows,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (2, dev.n_groups * G, TILE_J, LANES), jnp.float32
            ),
            interpret=interpret,
        )(dev.meta, dev.step_group, dev.step_first, dev.group_xbase,
          dev.vals, dev.src16, x4d[:, 0])
        return y.reshape(2, -1)[:, :n_pad].T
    vals_spec = pl.BlockSpec(
        (2 * tps, TILE_J, LANES), lambda s, m, g, f: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    src_spec = pl.BlockSpec(
        (tps // 2, 2 * TILE_J, LANES), lambda s, m, g, f: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec(
        x4d.shape, lambda s, m, g, f: (Z, Z, Z, Z),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (2, bs, G, TILE_J, LANES), lambda s, m, g, f: (Z, Z, g[s], Z, Z),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns,),
        in_specs=[vals_spec, src_spec, x_spec],
        out_specs=out_spec,
    )
    y = _pallas_call(
        "spmv_lane_tiles_df64",
        functools.partial(
            _kernel_df64, tps=tps, wr=dev.window_rows, bs=bs
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (2, bs, dev.n_groups * G, TILE_J, LANES), jnp.float32
        ),
        interpret=interpret,
    )(dev.meta, dev.step_group, dev.step_first, dev.vals, dev.src16, x4d)
    y = jnp.transpose(y.reshape(2, bs, -1)[:, :, :n_pad], (2, 1, 0))
    return y if block else y[:, 0, :]


def spmv_lane_tiles(
    dev: DeviceLaneTiles, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """y = A @ x. x: [n_rows_padded] (permuted, padded) for one vector, or
    [n_rows_padded, bs] for a rowwise block vector (SpMMV) — all vectors
    share one matrix stream. Returns y of the same shape. df64 devices
    take/return [n, 2] f32 (hi, lo) pairs instead."""
    if interpret is None:
        interpret = not pallas_supported()
    if dev.df64:
        return _spmv_lane_tiles_df64(dev, x, interpret)
    n_pad = dev.n_rows_padded
    # x may be longer than the matrix's rows (halo-extended buffer in the
    # distributed path); windows were clamped to its length at pack time.
    # Windowed mode pads x up to the build-time extent so every group's
    # [base, base+XB) DMA stays in range.
    x_rows = max(
        (x.shape[0] + LANES - 1) // LANES, dev.window_rows, dev.x_rows_total
    )
    block = x.ndim == 2
    bs = x.shape[1] if block else 1
    x3d = x if block else x[:, None]
    # 2-byte x (hp mode) is widened to f32 for the kernel: dynamic window
    # slices need f32 sublane alignment, and accumulating in f32 makes our
    # hp strictly more accurate than the reference's all-half path
    if x3d.dtype.itemsize == 2:
        x3d = x3d.astype(jnp.float32)
    if x3d.shape[0] < x_rows * LANES:
        x3d = jnp.pad(x3d, ((0, x_rows * LANES - x3d.shape[0]), (0, 0)))
    x3d = x3d.T.reshape(bs, x_rows, LANES)

    acc_dtype = jnp.float32 if x.dtype != jnp.float64 else jnp.float64

    # NOTE: index maps must produce int32 — under jax_enable_x64 python
    # literals trace as i64, which this libtpu's legalizer rejects
    Z = np.int32(0)
    nt = dev.n_tiles
    tps = dev.tiles_per_step
    G = dev.chunks_per_group
    assert nt % tps == 0
    ns = nt // tps
    windowed = dev.x_block_rows > 0
    npf = 4 if windowed else 3
    if dev.unit_vals:
        # placeholder (2, 8, 128) zero block pinned at index 0 — the
        # kernel never reads it; the value stream lives in src16's sign
        vals_spec = pl.BlockSpec(
            (2, TILE_J, LANES),
            (lambda s, m, g, f, xb: (Z, Z, Z)) if windowed
            else (lambda s, m, g, f: (Z, Z, Z)),
            memory_space=pltpu.VMEM,
        )
    else:
        vals_spec = pl.BlockSpec(
            (tps // 2, 2 * TILE_J, LANES)
            if dev.vals.shape[1] == 2 * TILE_J
            else (tps, TILE_J, LANES),
            (lambda s, m, g, f, xb: (s, Z, Z)) if windowed
            else (lambda s, m, g, f: (s, Z, Z)),
            memory_space=pltpu.VMEM,
        )
    src_spec = pl.BlockSpec(
        (tps // 2, 2 * TILE_J, LANES),
        (lambda s, m, g, f, xb: (s, Z, Z)) if windowed
        else (lambda s, m, g, f: (s, Z, Z)),
        memory_space=pltpu.VMEM,
    )
    if windowed:
        XB = dev.x_block_rows
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        out_spec = pl.BlockSpec(
            (bs, G, TILE_J, LANES),
            lambda s, m, g, f, xb: (Z, g[s], Z, Z),
            memory_space=pltpu.VMEM,
        )
        kernel = functools.partial(
            _kernel_windowed, acc_dtype=acc_dtype, tps=tps, bs=bs,
            XB=XB, n_groups=dev.n_groups, wr=dev.window_rows,
            unit=dev.unit_vals,
        )
        scratch = [
            pltpu.VMEM((2, bs, XB, LANES), x3d.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
        extra = (dev.group_xbase,)
    else:
        x_spec = pl.BlockSpec(
            x3d.shape, lambda s, m, g, f: (Z, Z, Z),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (bs, G, TILE_J, LANES),
            lambda s, m, g, f: (Z, g[s], Z, Z),
            memory_space=pltpu.VMEM,
        )
        kernel = functools.partial(
            _kernel, acc_dtype=acc_dtype, tps=tps, bs=bs,
            wr=dev.window_rows, unit=dev.unit_vals,
        )
        scratch = []
        extra = ()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npf,
        grid=(ns,),
        in_specs=[vals_spec, src_spec, x_spec],
        out_specs=out_spec,
        scratch_shapes=scratch,
    )
    y = _pallas_call(
        "spmv_lane_tiles",
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bs, dev.n_groups * G, TILE_J, LANES), acc_dtype
        ),
        interpret=interpret,
    )(dev.meta, dev.step_group, dev.step_first, *extra,
      dev.vals, dev.src16, x3d)
    y = y.reshape(bs, -1)[:, :n_pad].T.astype(x.dtype)
    return y if block else y[:, 0]


def _kernel_solve(
    # scalar-prefetch refs (SMEM)
    meta_ref,
    sg_ref,
    sf_ref,
    # blocked inputs
    vals_ref,  # (tps, 8, 128) or (tps/2, 16, 128) for 2-byte dtypes
    src_ref,  # (tps/2, 16, 128) int16 gather tables
    x_ref,  # (bs, x_rows, 128) the initial x, whole-VMEM resident
    out_ref,  # (2, bs, NB8, 128): [0] = A^k x0, [1] = A^(k-1) x0
    xy_ref,  # VMEM scratch (2, bs, xr, 128): ping-pong x/y buffers
    *,
    acc_dtype,
    tps,
    bs,
    wr,
    G,
    NB8,
    k_iters,
    ns,
):
    """k solve iterations (y = A x; x <- y) inside ONE Pallas launch.

    The TPU-native redesign of the reference's swap_local_vectors solve
    loop (classes_structs.hpp:1130-1165, main.cpp:528-607): instead of k
    kernel launches each paying dispatch overhead — which dominates on
    the reference's own bundled matrices (bcsstk13: ~9.4 us/iteration of
    which the kernel is ~1 us) — grid=(k, ns) sweeps the matrix k times
    while x and y ping-pong between the halves of one VMEM scratch
    buffer, selected by iteration parity. Grid steps execute sequentially
    on the core, so iteration i+1 reads exactly iteration i's output.

    Intermediate vectors stay in the f32 accumulator dtype (hp mode never
    round-trips through bf16 between iterations — strictly more accurate
    than the reference's all-half swap, documented deviation)."""
    it = pl.program_id(0)
    step = pl.program_id(1)
    x_rows = x_ref.shape[1]
    xr = xy_ref.shape[2]

    @pl.when(jnp.logical_and(it == 0, step == 0))
    def _():
        # load x0 into buffer 0; buffer 1 and the padding tail start zero
        xy_ref[0, :, pl.ds(0, x_rows), :] = x_ref[...].astype(acc_dtype)
        if xr > x_rows:
            xy_ref[0, :, pl.ds(x_rows, xr - x_rows), :] = jnp.zeros(
                (bs, xr - x_rows, LANES), acc_dtype
            )
        xy_ref[1] = jnp.zeros((bs, xr, LANES), acc_dtype)

    rpar = jax.lax.rem(it, np.int32(2)).astype(jnp.int32)
    wpar = np.int32(1) - rpar
    g_out = sg_ref[step]

    @pl.when(sf_ref[step] == 1)
    def _():
        # first step of this output group in this sweep: zero its rows
        xy_ref[wpar, :, pl.ds(g_out * (G * TILE_J), G * TILE_J), :] = (
            jnp.zeros((bs, G * TILE_J, LANES), acc_dtype)
        )

    base = step * tps
    vals_paired = vals_ref.shape[1] == 2 * TILE_J
    for k in range(tps):
        m = meta_ref[base + k]
        w = m >> CL_BITS
        cl = jnp.bitwise_and(m, (1 << CL_BITS) - 1)
        half = (k % 2) * TILE_J
        packed = src_ref[k // 2, pl.ds(half, TILE_J), :].astype(jnp.int32)
        lane_tab = jnp.bitwise_and(packed, LANES - 1)
        sub_tab = jnp.right_shift(packed, 7)
        if vals_paired:
            v = vals_ref[k // 2, pl.ds(half, TILE_J), :].astype(acc_dtype)
        else:
            v = vals_ref[k].astype(acc_dtype)
        row0 = (g_out * G + cl) * TILE_J
        for b in range(bs):
            window = xy_ref[rpar, b, pl.ds(w, wr), :]
            g = _gather_window(window, sub_tab, lane_tab, wr)
            cur = xy_ref[wpar, b, pl.ds(row0, TILE_J), :]
            xy_ref[wpar, b, pl.ds(row0, TILE_J), :] = (
                cur + v * g.astype(acc_dtype)
            )

    @pl.when(
        jnp.logical_and(it == np.int32(k_iters - 1), step == np.int32(ns - 1))
    )
    def _():
        out_ref[0] = xy_ref[wpar, :, pl.ds(0, NB8), :]
        out_ref[1] = xy_ref[rpar, :, pl.ds(0, NB8), :]


def solve_tiles_fit(dev: DeviceLaneTiles, bs: int = 1) -> bool:
    """Whether the fused k-iteration solve kernel applies: whole-x mode,
    plain value stream, and both ping-pong buffers + the 2-vector output
    block within the VMEM budget."""
    if dev.df64 or dev.unit_vals or dev.x_block_rows > 0:
        return False
    NB8 = dev.n_groups * dev.chunks_per_group * TILE_J
    xr = max(dev.x_rows_total, dev.window_rows, NB8)
    vmem = (2 * xr + 2 * NB8) * LANES * max(bs, 1) * 4
    return vmem <= X_VMEM_BUDGET_BYTES


def solve_lane_tiles(
    dev: DeviceLaneTiles,
    x: jax.Array,
    k_iters: int,
    interpret: Optional[bool] = None,
) -> tuple:
    """k_iters iterations of y = A x with on-chip x<->y swap in a single
    Pallas launch. Returns (y_prev, y_final) = (A^(k-1) x0, A^k x0) in the
    same device vector layout as x — the same contract as the scan-of-
    launches solve (runtime/operator.py SpmvOperator.solve). Use
    solve_tiles_fit() to gate eligibility."""
    if interpret is None:
        interpret = not pallas_supported()
    assert k_iters >= 1
    n_pad = dev.n_rows_padded
    x_rows = max(
        (x.shape[0] + LANES - 1) // LANES, dev.window_rows, dev.x_rows_total
    )
    block = x.ndim == 2
    bs = x.shape[1] if block else 1
    x3d = x if block else x[:, None]
    if x3d.dtype.itemsize == 2:
        x3d = x3d.astype(jnp.float32)
    if x3d.shape[0] < x_rows * LANES:
        x3d = jnp.pad(x3d, ((0, x_rows * LANES - x3d.shape[0]), (0, 0)))
    x3d = x3d.T.reshape(bs, x_rows, LANES)
    acc_dtype = jnp.float32 if x.dtype != jnp.float64 else jnp.float64

    Z = np.int32(0)
    nt = dev.n_tiles
    tps = dev.tiles_per_step
    G = dev.chunks_per_group
    assert nt % tps == 0
    ns = nt // tps
    NB8 = dev.n_groups * G * TILE_J
    xr = max(x_rows, NB8)

    vals_spec = pl.BlockSpec(
        (tps // 2, 2 * TILE_J, LANES)
        if dev.vals.shape[1] == 2 * TILE_J
        else (tps, TILE_J, LANES),
        lambda i, s, m, g, f: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    src_spec = pl.BlockSpec(
        (tps // 2, 2 * TILE_J, LANES),
        lambda i, s, m, g, f: (s, Z, Z),
        memory_space=pltpu.VMEM,
    )
    x_spec = pl.BlockSpec(
        x3d.shape, lambda i, s, m, g, f: (Z, Z, Z),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (2, bs, NB8, LANES),
        lambda i, s, m, g, f: (Z, Z, Z, Z),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k_iters, ns),
        in_specs=[vals_spec, src_spec, x_spec],
        out_specs=out_spec,
        scratch_shapes=[pltpu.VMEM((2, bs, xr, LANES), acc_dtype)],
    )
    out = _pallas_call(
        "solve_lane_tiles",
        functools.partial(
            _kernel_solve, acc_dtype=acc_dtype, tps=tps, bs=bs,
            wr=dev.window_rows, G=G, NB8=NB8, k_iters=k_iters, ns=ns,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((2, bs, NB8, LANES), acc_dtype),
        interpret=interpret,
    )(dev.meta, dev.step_group, dev.step_first,
      dev.vals, dev.src16, x3d)
    out = out.reshape(2, bs, -1)[:, :, :n_pad].astype(x.dtype)
    y_final = out[0].T if block else out[0, 0]
    y_prev = out[1].T if block else out[1, 0]
    return y_prev, y_final


def spmv_pallas(dev, x, interpret: Optional[bool] = None):
    """Operator-facing entry: dispatch on device-format type. Rowwise block
    vectors ([n, bs]) run the fused SpMMV kernel — one matrix stream shared
    by all RHS columns."""
    if type(dev).__name__ == "TStreamDev":
        from ..runtime.tstream import spmv_tstream

        return spmv_tstream(dev, x, interpret=interpret)
    if isinstance(dev, DeviceMixedTiles):
        return spmv_mixed_tiles(dev, x, interpret=interpret)
    if not isinstance(dev, DeviceLaneTiles):
        # operator passed an XLA DeviceScs (config fallback)
        from .spmv_xla import spmv_tiled

        return spmv_tiled(dev, x)
    return spmv_lane_tiles(dev, x, interpret=interpret)
