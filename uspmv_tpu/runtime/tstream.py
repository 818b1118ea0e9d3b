"""Transpose-stream (3-pass) SpMV for zero-column-locality matrices.

The masked mixed-tile mode is VMEM-RMW-bound at ~4-11 GFLOP/s on
random/power-law column matrices (BASELINE.md round 3). This mode pays the
randomness once, in a layout change, instead of every output update:

  phase 1  ``spmv_product_tiles``: p = val * x[col] written sequentially
           into a padded (column-block x row-chunk) cell grid — narrow
           gather windows (one column block per tile), NO output RMW;
  phase 2  one XLA transpose of the cell grid from column-block-major to
           row-chunk-major (PT);
  phase 3  y = B' @ PT through the REGULAR lane-tile kernel: B' is the
           0/1 matrix mapping each row to its PT positions. Chunk c's
           sources all live in its own contiguous slab, so B' has
           banded-like locality; heavy rows split into virtual rows and
           fold back through the vectorized ±1-matrix fold.

Elements the phase-1 greedy cannot place (gather-pin saturation or cell
overflow — hub columns) spill to a mixed-tile term on the original x.

Reference parity note: this whole mode is the TPU answer to the graceful
degradation the reference's CRS kernels get for free from CPU cachelines
(kernels.hpp:22-63) — there is no reference analogue to cite for the
mechanism, only for the requirement.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.coo import MtxData, align_split_rows
from ..formats.scs import ScsData, convert_to_scs
from ..ops.packer import CHUNK_ROWS, LANES, TILE_J, pack_product_tiles
from ..ops.pallas_scs import (
    DeviceLaneTiles,
    DeviceMixedTiles,
    LaneTileBudgetError,
    build_device_lane_tiles,
    build_device_mixed_tiles,
    build_device_product_tiles,
    build_device_product_tiles_t,
    lane_tiles_fit,
    spmv_lane_tiles,
    spmv_mixed_tiles,
    spmv_product_tiles,
)

B_SPLIT_TH = 8  # B' heavy-row split threshold (slot-multiplicity bound)
# Group sizes tuned for the windowed-x DMA pipeline: at ~1 grid step per
# group every step stalls on its window copy (measured: phase 3 ran at
# 47-57 ns/tile, 75% of the whole iteration). Fewer/larger groups plus
# tps=64 give ~5-15 steps per group so the next window prefetches behind
# real work.
B_CHUNKS_PER_GROUP = 32  # real part: per-group PT window = 32 slabs
B_VIRT_CHUNKS_PER_GROUP = 8  # virtual part: parent slabs spread wider
B_TILES_PER_STEP = 64
# B' gather-window height (x2d rows). Wider windows pack slightly tighter
# (fill 0.224 at 64 vs 0.213 at 32 on RandomImbalanced) but the gather
# ladder costs ~2 VPU ops per 8 window rows per tile, and phase 3 is
# VPU-bound, not stream-bound (measured: dropping B's value stream moved
# the iteration <5%), so the cheaper ladder wins.
B_WINDOW_ROWS = 32
# Hub-dominated matrices overflow the capped cells and spill a few
# percent of their elements; the spill term then costs more than the
# 3-pass saves over the masked mixed mode (measured: PowerLawCols 3.5 vs
# 10.9 GFLOP/s mixed), so the mode only engages when spills are rare.
MAX_SPILL_FRACTION = 0.02
# Output-sparse spill sets don't suit chunked-output kernels (measured:
# 10k scattered spills became 9.7k one-element colwalk tiles). Up to
# this many spills run as a direct XLA gather + scatter-add term
# (~9 ns/index, i.e. ~9 us at 1k — noise next to the 3-pass kernels).
SPILL_XLA_MAX = 2000


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TStreamDev:
    """Device pytree for the 3-pass operator."""

    p1: object  # DeviceProductTiles
    b1: object  # DeviceLaneTiles over B' (real rows)
    bv: object  # DeviceLaneTiles over B' virtual rows (split pieces), or None
    fold: object  # DeviceLaneTiles for the virtual-row fold, or None
    spill: object  # DeviceMixedTiles/DeviceLaneTiles on original x, or None

    NB: int = dataclasses.field(metadata=dict(static=True))
    NCg: int = dataclasses.field(metadata=dict(static=True))
    NC: int = dataclasses.field(metadata=dict(static=True))
    s_pad: int = dataclasses.field(metadata=dict(static=True))
    n_rows_padded: int = dataclasses.field(metadata=dict(static=True))
    fold_region: int = dataclasses.field(metadata=dict(static=True))
    nnz: int = dataclasses.field(metadata=dict(static=True))
    # hub-column peel (operator._try_tstream): lane tiles over the k
    # heaviest columns, whose x values gather into a compact window the
    # whole kernel can hold in VMEM — the escape hatch for power-law hub
    # columns that overflow phase-1's capped cells (VERDICT r3 item 3b)
    hub: object = None  # DeviceLaneTiles over hub columns, or None
    hub_pos: object = None  # int32 device positions of hub x values
    # small spill sets as raw (rows, cols, vals) for the XLA term
    spill_coo: object = None
    # distributed >2048-nnz row pre-split: (virt_pos, parent_pos) int32
    # arrays in the EXECUTION row order; y[parent] += y[virt] after all
    # terms (the single-chip path folds these at the operator level via
    # split_plan instead)
    split_scatter: object = None

    def stream_bytes(self) -> int:
        total = self.p1.stream_bytes() + self.b1.stream_bytes()
        # the product stream is written and re-read through HBM
        total += 2 * self.p1.vals.size * 4
        if self.bv is not None:
            total += self.bv.stream_bytes()
        if self.fold is not None:
            total += self.fold.stream_bytes()
        if self.spill is not None:
            total += self.spill.stream_bytes()
        if self.hub is not None:
            total += self.hub.stream_bytes()
        return int(total)

    @property
    def fill(self) -> float:
        return self.p1.fill

    @property
    def device_beta(self) -> float:
        return self.p1.fill

    @property
    def df64(self) -> bool:
        return False


def _pad_product_nb(pt):
    """Pad the column-block count so NB * s_pad is lane-aligned
    (% 128 == 0): the transposed-write phase-1 kernel then yields a PT
    whose flat view is a FREE reshape (no XLA relayout copy between
    phases). The padding blocks are all-zero tiles; element positions are
    remapped to the widened slabs."""
    import dataclasses as _dc
    import math

    g = math.gcd(pt.s_pad, LANES)
    need = LANES // g
    NBp = ((pt.NB + need - 1) // need) * need
    if NBp == pt.NB:
        return pt
    s8 = pt.s_pad // 8
    add = (NBp - pt.NB) * pt.NCg * s8
    vals = np.concatenate(
        [pt.vals, np.zeros((add, TILE_J, LANES), dtype=pt.vals.dtype)]
    )
    src = np.concatenate(
        [pt.src_tab, np.zeros((add, TILE_J, LANES), dtype=pt.src_tab.dtype)]
    )
    w = np.concatenate([pt.w_row, np.zeros(add, dtype=pt.w_row.dtype)])
    cb = pt.elem_pos // pt.s_pad
    k = pt.elem_pos - cb * pt.s_pad
    c = cb // pt.NB
    b = cb - c * pt.NB
    elem_pos = (c * NBp + b) * pt.s_pad + k
    return _dc.replace(
        pt, vals=vals, src_tab=src, w_row=w, NB=NBp, elem_pos=elem_pos
    )


def _pad_product_grid(pt, NB_c: int, s_pad_c: int):
    """Pad a shard's product grid to the COMMON (NB, s_pad) geometry so
    stacked shards share one kernel program (generalizes
    :func:`_pad_product_nb`). Extra k-slots and column blocks are
    all-zero tiles; element positions remap to the widened slabs."""
    import dataclasses as _dc

    if NB_c == pt.NB and s_pad_c == pt.s_pad:
        return pt
    assert NB_c >= pt.NB and s_pad_c >= pt.s_pad and s_pad_c % 8 == 0
    s8 = pt.s_pad // 8
    s8c = s_pad_c // 8
    v = pt.vals.reshape(pt.NB, pt.NCg, s8, TILE_J, LANES)
    s = pt.src_tab.reshape(pt.NB, pt.NCg, s8, TILE_J, LANES)
    pad = ((0, NB_c - pt.NB), (0, 0), (0, s8c - s8), (0, 0), (0, 0))
    v = np.pad(v, pad)
    s = np.pad(s, pad)
    nt = NB_c * pt.NCg * s8c
    w = (
        np.arange(nt) // (pt.NCg * s8c) * pt.window_rows
    ).astype(np.int32)
    cb = pt.elem_pos // pt.s_pad
    k = pt.elem_pos - cb * pt.s_pad
    c = cb // pt.NB
    b = cb - c * pt.NB
    elem_pos = (c * NB_c + b) * s_pad_c + k
    return _dc.replace(
        pt,
        vals=v.reshape(nt, TILE_J, LANES),
        src_tab=s.reshape(nt, TILE_J, LANES),
        w_row=w,
        NB=NB_c,
        s_pad=s_pad_c,
        elem_pos=elem_pos,
    )


def _spread_slab(pt):
    """Lay cells out at an ODD-s8 stride (gcd(s_pad, 128) = 8).

    B' gather lanes are ``position mod 128`` with position = b*s_pad + k;
    cells are only ~60% full (k clusters low), so with gcd(s_pad, 128) =
    32 (e.g. s_pad 96) the occupied band repeats at just 4 lane offsets
    and elements pile onto half the lanes (measured cv 0.26). The
    two-step gather pins ONE sublane per (tile row, lane), so phase 3's
    packers fight pin conflicts exactly on those popular lanes. An odd
    s8 gives 16 offsets (cv 0.01) — colwalk packs the SAME B' in 1.37x
    fewer tiles (2816 -> 2048 on RandomImbalanced-120k). Cell capacity
    is unchanged (extra slots are zero padding); NB pads to a multiple
    of 16 so the PT flat view stays a free reshape."""
    import math

    s8 = pt.s_pad // 8
    if s8 % 2 == 0:
        s8 += 1
    s_pad_c = 8 * s8
    need = LANES // math.gcd(s_pad_c, LANES)
    NB_c = ((pt.NB + need - 1) // need) * need
    return _pad_product_grid(pt, NB_c, s_pad_c)


def _cell_cap_factor(scs: ScsData) -> float:
    """s_cap_factor for pack_product_tiles, derived from the exact
    (column-block x chunk) cell-size distribution: the smallest capacity
    whose total overflow stays within half the XLA spill budget, never
    above the packer's legacy 4x-mean bound."""
    from ..ops.packer import PRODUCT_WINDOW_ROWS

    W = PRODUCT_WINDOW_ROWS * LANES
    if hasattr(scs, "row_ptrs"):  # CompactScs
        cols = scs.cols.astype(np.int64)
        cnt = scs.row_counts_new.astype(np.int64)
        rows = np.repeat(np.arange(cnt.size, dtype=np.int64), cnt)
    else:
        idx, rows = scs.nonpad_index()
        cols = scs.col_idxs[idx].astype(np.int64)
    chunk = rows // scs.C
    n_cols = max(int(cols.max(initial=0)) + 1, 1)
    NB = (n_cols + W - 1) // W
    cell = (cols // W) * scs.n_chunks + chunk
    csize = np.bincount(cell, minlength=NB * scs.n_chunks)
    lam = max(float(csize.mean()), 1.0)
    cmax = int(csize.max(initial=1))
    budget = min(SPILL_XLA_MAX // 2, max(int(2e-4 * cols.size), 64))
    hist = np.bincount(csize, minlength=cmax + 2).astype(np.int64)
    s = np.arange(hist.size, dtype=np.int64)
    tail_cnt = np.cumsum(hist[::-1])[::-1]  # cells with size >= cap
    tail_sum = np.cumsum((hist * s)[::-1])[::-1]
    caps = np.arange(hist.size, dtype=np.int64)
    # overflow(cap) = sum over cells>cap of (size - cap)
    overflow = np.zeros(hist.size, dtype=np.int64)
    overflow[:-1] = tail_sum[1:] - caps[:-1] * tail_cnt[1:]
    ok = np.flatnonzero(overflow <= budget)
    cap = int(ok[0]) if ok.size else cmax
    return float(min(max(cap, 16) / lam, 4.0))


def _pack_phase1(scs: ScsData, dtype):
    """Cap + pack the phase-1 product grid, with the legacy-cap retry and
    the spill-fraction gate.

    Cap phase-1 cells from the ACTUAL cell-size distribution instead of
    the max cell: the global capacity was set by the tail of the
    fullest of ~60k cells (measured s_pad 104 vs mean 59.5 on
    RandomImbalanced-500k; capped: 80 at p1 fill 0.71), diluting the
    product grid everything downstream streams and gathers. The cap is
    the smallest capacity whose overflow fits the small-spill XLA-term
    budget, so tightening never turns into a spill-kernel regression
    (a Poisson-quantile guess under-capped overdispersed cells 16%).
    """
    cap_factor = _cell_cap_factor(scs)
    pt = pack_product_tiles(scs, dtype=dtype, s_cap_factor=cap_factor)
    n_el = pt.nnz_packed + pt.spill_rows.size
    if (pt.spill_rows.size > MAX_SPILL_FRACTION * max(n_el, 1)
            and cap_factor < 4.0):
        # a tighter slab also removes k-slot freedom the greedy uses to
        # dodge gather-pin conflicts; if THAT spill source now trips the
        # gate, fall back to the legacy bound before giving up the mode
        pt = pack_product_tiles(scs, dtype=dtype, s_cap_factor=4.0)
        n_el = pt.nnz_packed + pt.spill_rows.size
    if pt.spill_rows.size > MAX_SPILL_FRACTION * max(n_el, 1):
        raise LaneTileBudgetError(
            f"phase-1 spills {pt.spill_rows.size}/{n_el} elements; the "
            "cell layout is not paying for itself (hub-dominated matrix)"
        )
    return pt


def _bsplit_host(scs: ScsData, pt, NPT: int):
    """B': rows -> PT positions, round-robin split + aligned fold.

    Pieces take STRIDED elements (j mod q) instead of consecutive column
    ranges: a consecutive piece's <= 8 positions are co-located in the
    slab, so every window sees the full slot multiplicity and bv fill
    collapsed to 0.035 (measured); strided pieces spread each virtual
    row's elements across the whole slab (~1 per window).

    Returns ``(n_real, Bre, Bvi_or_None, fold_idx_or_None)``. The real
    and virtual halves run as SEPARATE kernels: real chunks read their
    own contiguous PT slab (tight windows, larger groups) while virtual
    chunks read their PARENTS' slabs, which spread ~2-4x wider — a
    combined matrix would blow the group-window budget at the
    real/virtual boundary (measured)."""
    n_real = scs.n_rows_padded
    ord2 = np.lexsort((pt.elem_pos, pt.elem_rows))
    r_s = pt.elem_rows[ord2]
    p_s = pt.elem_pos[ord2]
    cnt = np.bincount(r_s, minlength=n_real).astype(np.int64)
    if cnt.max(initial=0) > B_SPLIT_TH * 1023:
        raise LaneTileBudgetError(
            "a row exceeds the foldable piece budget (pre-split upstream)"
        )
    q = np.maximum((cnt + B_SPLIT_TH - 1) // B_SPLIT_TH, 1)
    starts = np.concatenate(([0], np.cumsum(cnt)))
    j_in_row = np.arange(r_s.size, dtype=np.int64) - starts[r_s]
    bucket = j_in_row % q[r_s]
    vcount = q - 1
    vstart = np.concatenate(([0], np.cumsum(vcount)))
    new_row = np.where(
        bucket == 0, r_s, n_real + vstart[r_s] + bucket - 1
    )
    n_virtual = int(vcount.sum())
    parent = np.repeat(
        np.arange(n_real, dtype=np.int64), vcount
    ) if n_virtual else None
    m2 = MtxData.from_arrays(
        new_row, p_s, np.ones(new_row.size),
        n_rows=n_real + n_virtual, n_cols=NPT,
    ).sort_by_row()
    fold_idx = None
    if parent is not None and n_virtual:
        try:
            m2, e_idx, s_idx, region, _virt, _par2 = align_split_rows(
                m2, n_real, parent
            )
            fold_idx = (e_idx, s_idx, region)
        except ValueError:
            raise LaneTileBudgetError(
                "B' split produced an unfoldable parent"
            )
    real_mask = m2.I < n_real
    Bre = MtxData.from_arrays(
        m2.I[real_mask], m2.J[real_mask], m2.values[real_mask],
        n_rows=n_real, n_cols=NPT,
    )
    Bvi = None
    if fold_idx is not None:
        virt_mask = m2.I >= n_real
        Bvi = MtxData.from_arrays(
            m2.I[virt_mask] - n_real, m2.J[virt_mask],
            m2.values[virt_mask], n_rows=fold_idx[2], n_cols=NPT,
        )
    return n_real, Bre, Bvi, fold_idx


# per-step VMEM budget for the FUSED phase-1+2 kernel; beyond it the
# build keeps the round-3 unfused kernel + XLA transpose (correct at a
# ~16 us extra HBM round trip of the product grid)
FUSED_P1_VMEM_BUDGET = 13 * 1024 * 1024


def build_tstream(
    scs: ScsData, dtype=np.float32, device=None,
    fused: Optional[bool] = None,
) -> TStreamDev:
    """Build the 3-pass operator from a (column-permuted) SCS at C=1024.
    Raises LaneTileBudgetError when the mode does not apply (x beyond the
    VMEM budget, excessive spills, or B' windows beyond the group
    budget). ``fused=None`` fuses phases 1+2 when the fused kernel's
    per-step VMEM estimate fits; the unfused phase 1 + XLA transpose is
    the fallback (and the round-3 measured configuration)."""
    from ..ops.pallas_scs import (
        build_device_product_tiles,
        product_tiles_t_vmem_bytes,
    )

    if np.dtype(dtype) == np.float64:
        raise LaneTileBudgetError("transpose-stream has no df64 variant")
    if not lane_tiles_fit(scs.n_rows_padded, 1):
        raise LaneTileBudgetError(
            "transpose-stream requires the whole x in VMEM"
        )
    pt = _spread_slab(_pack_phase1(scs, dtype))
    n_el = pt.nnz_packed + pt.spill_rows.size
    NC = pt.n_chunks
    NPT = NC * pt.NB * pt.s_pad
    if fused is None:
        # the fused phase-1+2 kernel LOWERS AND RUNS on real TPUs since
        # the round-5 flat-grid reformulation (tile sweep as the grid,
        # table-mapped out blocks, lax.rem/div body arithmetic — see
        # _kernel_products_t's docstring for the three upstream Mosaic
        # pitfalls it sidesteps), but it is MEASURED SLOWER than the
        # unfused phase 1 + XLA transpose on the v5e: 20.8 vs 23.7
        # GFLOP/s on RandomImbalanced-500k (spmv_bench.jsonl
        # tstream_fused_probe rows, 2026-08-19) — the in-kernel
        # (128,128) crossbar transposes plus the finer-grained grid
        # cost more than the 52 MB/iter transpose round trip they
        # remove, and the fused device build is ~4x slower (95 s vs
        # 22 s). Unfused therefore stays the default; fused remains
        # opt-in (USPMV_TSTREAM_FUSED=1) for re-evaluation on hardware
        # where the crossbar/HBM ratio differs.
        import os

        fused = bool(os.environ.get("USPMV_TSTREAM_FUSED")) and (
            product_tiles_t_vmem_bytes(pt.s_pad, scs.n_rows_padded)
            <= FUSED_P1_VMEM_BUDGET
        )
    if fused:
        p1 = build_device_product_tiles_t(pt, dtype=dtype, device=device)
    else:
        p1 = build_device_product_tiles(pt, dtype=dtype, device=device)

    n_real, Bre, Bvi, fold_idx = _bsplit_host(scs, pt, NPT)
    scs_b = convert_to_scs(Bre.astype(np.float32), CHUNK_ROWS, 1)
    b1 = build_device_lane_tiles(
        scs_b, dtype=np.float32, device=device, x_len=NPT,
        chunks_per_group=B_CHUNKS_PER_GROUP, packer="colwalk",
        window_rows=B_WINDOW_ROWS, tiles_per_step=B_TILES_PER_STEP,
        unit_values=True,
    )

    bv_dev = None
    fold_dev = None
    region = 0
    if fold_idx is not None:
        from .operator import _build_fold_dev

        region = fold_idx[2]
        scs_v = convert_to_scs(Bvi.astype(np.float32), CHUNK_ROWS, 1)
        # a tiny virtual part must not pay the fat-step grid quantum
        # (measured: 1.6k elements padded to 320 tiles = 5 steps of 64)
        from ..ops.packer import auto_tiles_per_step

        tps_v = min(
            B_TILES_PER_STEP,
            auto_tiles_per_step(max(scs_v.n_elements // CHUNK_ROWS, 1)),
        )
        try:
            bv_dev = build_device_lane_tiles(
                scs_v, dtype=np.float32, device=device, x_len=NPT,
                chunks_per_group=B_VIRT_CHUNKS_PER_GROUP,
                packer="colwalk", window_rows=B_WINDOW_ROWS,
                tiles_per_step=tps_v, unit_values=True,
            )
        except LaneTileBudgetError:
            # parent slabs spread too wide for the large group: halve it
            bv_dev = build_device_lane_tiles(
                scs_v, dtype=np.float32, device=device, x_len=NPT,
                chunks_per_group=B_VIRT_CHUNKS_PER_GROUP // 2,
                packer="colwalk", window_rows=B_WINDOW_ROWS,
                tiles_per_step=tps_v, unit_values=True,
            )
        fold_dev = _build_fold_dev(fold_idx, n_real, device)
        if fold_dev is None:
            raise LaneTileBudgetError("B' fold matrix exceeded budgets")

    spill_dev = None
    spill_coo = None
    if pt.spill_rows.size and pt.spill_rows.size <= SPILL_XLA_MAX:
        spill_coo = (
            jnp.asarray(pt.spill_rows.astype(np.int32)),
            jnp.asarray(pt.spill_cols.astype(np.int32)),
            jnp.asarray(pt.spill_vals.astype(dtype)),
        )
        if device is not None:
            spill_coo = tuple(jax.device_put(a, device) for a in spill_coo)
    elif pt.spill_rows.size:
        sm = MtxData.from_arrays(
            pt.spill_rows, pt.spill_cols, pt.spill_vals,
            n_rows=scs.n_rows_padded, n_cols=scs.n_rows_padded,
        ).sort_by_row()
        scs_s = convert_to_scs(sm.astype(dtype), CHUNK_ROWS, 1)
        try:
            spill_dev = build_device_mixed_tiles(
                scs_s, dtype=dtype, device=device
            )
        except LaneTileBudgetError:
            # sparse scattered spills can de-densify mixed tiles past the
            # SMEM budget; the colwalk lane packer handles them at ~1
            # element per tile-window without any budget risk
            spill_dev = build_device_lane_tiles(
                scs_s, dtype=dtype, device=device,
                x_len=scs.n_rows_padded, packer="colwalk", window_rows=B_WINDOW_ROWS,
            )

    return TStreamDev(
        p1=p1,
        b1=b1,
        bv=bv_dev,
        fold=fold_dev,
        spill=spill_dev,
        NB=pt.NB,
        NCg=pt.NCg,
        NC=NC,
        s_pad=pt.s_pad,
        n_rows_padded=scs.n_rows_padded,
        fold_region=region,
        nnz=n_el,
        spill_coo=spill_coo,
    )


def build_tstream_shards(
    scs_list, dtype=np.float32, split_scatter=None
) -> TStreamDev:
    """Stacked 3-pass operators for sharded execution — ONE SPMD program
    over a leading 'rows' axis (parallel/distributed.py shard_map).

    Every shard must share ``n_rows_padded`` (the distributed builder
    pads local COOs to the common n_loc) and the shards' x buffers share
    the halo-extended length, so the COMMON grid geometry (NB, s_pad,
    NC) is forced by padding each shard's product grid
    (:func:`_pad_product_grid`). Heterogeneous optional parts (B' virtual
    half, fold, spills) are unified: shards without splits get harmless
    dummy structs, and spills are stacked-XLA-term only. Raises
    :class:`LaneTileBudgetError` when any shard refuses a budget
    (callers fall back to stacked mixed tiles).

    Reference contract: dp/sp SpMV under MPI row partitioning
    (/root/reference/code/main.cpp:1345, mpi_funcs.hpp:424-622) makes no
    distinction for gather-hostile matrices — CPU cachelines degrade
    gracefully (kernels.hpp:22-63). This gives the sharded TPU path the
    same graceful coverage the single-chip tstream mode has.
    """
    import math

    from ..ops.packer import auto_tiles_per_step, resolve_chunks_per_group
    from ..ops.pallas_scs import (
        build_device_lane_tiles,
        stack_device_lane_tiles,
        stack_device_product_tiles_t,
    )

    if np.dtype(dtype) == np.float64:
        raise LaneTileBudgetError("transpose-stream has no df64 variant")
    n_loc = scs_list[0].n_rows_padded
    if any(s.n_rows_padded != n_loc for s in scs_list):
        raise ValueError(
            "stacked tstream shards must share n_rows_padded "
            "(pad local COOs to the common n_loc)"
        )
    for s in scs_list:
        cols_arr = s.cols if hasattr(s, "row_ptrs") else s.col_idxs
        if not lane_tiles_fit(int(cols_arr.max(initial=0)) + 1, 1):
            raise LaneTileBudgetError(
                "a shard's halo-extended x exceeds the VMEM budget"
            )
    pts = [_pack_phase1(s, dtype) for s in scs_list]
    if any(pt.spill_rows.size > SPILL_XLA_MAX for pt in pts):
        raise LaneTileBudgetError(
            "stacked tstream supports only XLA-term spills "
            "(a shard spilled past the budget)"
        )
    s_pad_c = max(pt.s_pad for pt in pts)
    if (s_pad_c // 8) % 2 == 0:  # odd-s8 lane spreading (_spread_slab)
        s_pad_c += 8
    NB_c = max(pt.NB for pt in pts)
    g = math.gcd(s_pad_c, LANES)
    need = LANES // g
    NB_c = ((NB_c + need - 1) // need) * need
    pts = [_pad_product_grid(pt, NB_c, s_pad_c) for pt in pts]
    NC = pts[0].n_chunks
    assert all(pt.n_chunks == NC for pt in pts)
    NPT = NC * NB_c * s_pad_c
    parts = [_bsplit_host(s, pt, NPT) for s, pt in zip(scs_list, pts)]
    import os as _os

    from ..ops.pallas_scs import (
        product_tiles_t_vmem_bytes,
        stack_device_product_tiles,
    )

    fused_c = bool(_os.environ.get("USPMV_TSTREAM_FUSED")) and (
        product_tiles_t_vmem_bytes(s_pad_c, n_loc) <= FUSED_P1_VMEM_BUDGET
    )  # same policy as the single-chip build (fused measured slower)
    if fused_c:
        p1 = stack_device_product_tiles_t(
            [build_device_product_tiles_t(pt, dtype=dtype) for pt in pts]
        )
    else:
        p1 = stack_device_product_tiles(
            [build_device_product_tiles(pt, dtype=dtype) for pt in pts]
        )

    scs_bs = [
        convert_to_scs(Bre.astype(np.float32), CHUNK_ROWS, 1)
        for (_n, Bre, _bv, _fi) in parts
    ]

    def mk_b1(xbf=None):
        return [
            build_device_lane_tiles(
                sb, dtype=np.float32, x_len=NPT,
                chunks_per_group=B_CHUNKS_PER_GROUP, packer="colwalk",
                window_rows=B_WINDOW_ROWS,
                tiles_per_step=B_TILES_PER_STEP,
                unit_values=True, x_block_rows_force=xbf,
            )
            for sb in scs_bs
        ]

    devs_b = mk_b1()
    if any(d.x_block_rows for d in devs_b):
        # one program, one window height (see distributed build_stack)
        xbf = max(d.x_block_rows for d in devs_b)
        if any(d.x_block_rows != xbf for d in devs_b):
            devs_b = mk_b1(xbf)
    b1 = stack_device_lane_tiles(devs_b)

    region_c = max(
        (fi[2] for (_n, _b, _v, fi) in parts if fi is not None), default=0
    )
    bv_dev = None
    fold_dev = None
    if region_c:
        from .operator import _build_fold_dev

        scs_vs = []
        for (_n, _b, Bvi, _fi) in parts:
            if Bvi is None:
                # harmless dummy so split-free shards still stack: one
                # zero-value element (invalid under unit_values)
                Bvi = MtxData.from_arrays(
                    np.zeros(1, np.int64), np.zeros(1, np.int64),
                    np.zeros(1), n_rows=1, n_cols=NPT,
                )
            scs_vs.append(convert_to_scs(Bvi.astype(np.float32),
                                         CHUNK_ROWS, 1))
        tps_v = min(
            B_TILES_PER_STEP,
            min(auto_tiles_per_step(max(sv.n_elements // CHUNK_ROWS, 1))
                for sv in scs_vs),
        )

        def mk_bv(cpg):
            return [
                build_device_lane_tiles(
                    sv, dtype=np.float32, x_len=NPT,
                    chunks_per_group=cpg, packer="colwalk",
                    window_rows=B_WINDOW_ROWS, tiles_per_step=tps_v,
                    unit_values=True,
                )
                for sv in scs_vs
            ]

        try:
            devs_v = mk_bv(B_VIRT_CHUNKS_PER_GROUP)
        except LaneTileBudgetError:
            devs_v = mk_bv(B_VIRT_CHUNKS_PER_GROUP // 2)
        bv_dev = stack_device_lane_tiles(devs_v)

        cpg_f = resolve_chunks_per_group(n_loc // CHUNK_ROWS)
        folds = []
        for (_n, _b, _v, fi) in parts:
            if fi is not None:
                e, s_, _r = fi
                q = np.flatnonzero(e != s_)
            else:
                q = np.zeros(0, dtype=np.int64)
            if q.size:
                rows = np.repeat(q.astype(np.int64), 2)
                cols = np.stack([s_[q], e[q]], axis=1).reshape(-1)
                vals = np.tile(np.array([-1.0, 1.0]), q.size)
            else:  # harmless dummy so split-free shards still stack
                rows = np.zeros(1, dtype=np.int64)
                cols = np.zeros(1, dtype=np.int64)
                vals = np.zeros(1)
            F = MtxData.from_arrays(
                rows, cols.astype(np.int64), vals,
                n_rows=n_loc, n_cols=region_c,
            )
            scs_f = convert_to_scs(F.astype(np.float32), CHUNK_ROWS, 1)
            folds.append(build_device_lane_tiles(
                scs_f, dtype=np.float32, tiles_per_step=8,
                chunks_per_group=cpg_f, x_len=region_c,
                x_window=False, window_rows=8,
            ))
        fold_dev = stack_device_lane_tiles(folds)

    spill_coo = None
    L = max(pt.spill_rows.size for pt in pts)
    if L:
        R = len(pts)
        # pad rows to n_loc: out of y's range, dropped by the scatter-add
        sr = np.full((R, L), n_loc, dtype=np.int32)
        sc = np.zeros((R, L), dtype=np.int32)
        sv = np.zeros((R, L), dtype=dtype)
        for r, pt in enumerate(pts):
            k = pt.spill_rows.size
            sr[r, :k] = pt.spill_rows.astype(np.int32)
            sc[r, :k] = pt.spill_cols.astype(np.int32)
            sv[r, :k] = pt.spill_vals.astype(dtype)
        spill_coo = (jnp.asarray(sr), jnp.asarray(sc), jnp.asarray(sv))

    if split_scatter is not None:
        split_scatter = (
            jnp.asarray(np.asarray(split_scatter[0], dtype=np.int32)),
            jnp.asarray(np.asarray(split_scatter[1], dtype=np.int32)),
        )

    return TStreamDev(
        p1=p1,
        b1=b1,
        bv=bv_dev,
        fold=fold_dev,
        spill=None,
        NB=NB_c,
        NCg=pts[0].NCg,
        NC=NC,
        s_pad=s_pad_c,
        n_rows_padded=n_loc,
        fold_region=region_c,
        nnz=sum(pt.nnz_packed + pt.spill_rows.size for pt in pts),
        spill_coo=spill_coo,
        split_scatter=split_scatter,
    )


def spmv_tstream(
    dev: TStreamDev, x: jax.Array, interpret: Optional[bool] = None
) -> jax.Array:
    """y = A @ x through the 3 passes (+ spill term)."""
    from .operator import block_prefix_sums

    from ..ops.pallas_scs import DeviceProductTilesT, spmv_product_tiles_t

    if isinstance(dev.p1, DeviceProductTilesT):
        # fused phase 1+2: the kernel wrote PT directly (transposed
        # blocks); NB*s_pad % 128 == 0 makes this reshape a free view
        PT = spmv_product_tiles_t(dev.p1, x, interpret=interpret).reshape(
            -1
        )
    else:
        p = spmv_product_tiles(dev.p1, x, interpret=interpret)
        s8 = dev.s_pad // 8
        # [nt, 8, 128] where nt = NB*NCg*s8 (+ step padding, sliced off)
        P = p[: dev.NB * dev.NCg * s8].reshape(
            dev.NB, dev.NCg, s8, TILE_J, LANES
        )
        # cell (b, c=g2*128+j) element k=k1*8+a sits at P[b, g2, k1, a, j];
        # PT wants [c, b, k] so chunk c's sources form one contiguous slab
        PT = jnp.transpose(P, (1, 4, 0, 2, 3)).reshape(
            dev.NCg * 128, dev.NB * dev.s_pad
        )[: dev.NC].reshape(-1)
    y = spmv_lane_tiles(dev.b1, PT, interpret=interpret)
    n_real = dev.n_rows_padded
    y = y[:n_real]
    if dev.fold is not None:
        partials = spmv_lane_tiles(
            dev.bv, PT, interpret=interpret
        )[: dev.fold_region]
        cs = block_prefix_sums(partials, dev.fold_region)
        y = y + spmv_lane_tiles(
            dev.fold, cs, interpret=interpret
        )[:n_real]
    if dev.spill is not None:
        if isinstance(dev.spill, DeviceMixedTiles):
            ys = spmv_mixed_tiles(dev.spill, x, interpret=interpret)
        else:
            ys = spmv_lane_tiles(dev.spill, x, interpret=interpret)
        y = y + ys[:n_real]
    if dev.spill_coo is not None:
        # the handful of cell-cap overflows: one small gather + one
        # sorted scatter-add (~9 ns/index) — cheaper than any chunked
        # kernel for an output-sparse set
        sr, sc, sv = dev.spill_coo
        y = y.at[sr].add(
            (sv.astype(y.dtype) * x[sc].astype(y.dtype)), mode="drop"
        )
    if dev.hub is not None:
        # hub term: the k heaviest columns' x values, gathered to one
        # compact VMEM-resident window; the hub matrix's column locality
        # is perfect by construction so the regular lane-tile kernel
        # runs it at banded-class rates
        xh = jnp.take(x, dev.hub_pos)
        y = y + spmv_lane_tiles(dev.hub, xh, interpret=interpret)[:n_real]
    if dev.split_scatter is not None:
        # distributed >2048-nnz pre-split: fold virtual partials into
        # their parents (padding entries: vp clamps to a real gather, pp
        # is out of range and drops the add)
        vp, pp = dev.split_scatter
        y = y.at[pp].add(y[vp], mode="drop")
    return y.astype(x.dtype)
