"""Host-side tile packer for the Pallas SCS kernel.

Layout ("j-plane tiles"): chunks of CHUNK_ROWS=1024 rows; the SCS flat
stream for chunk c is (L_c, 1024) j-major, so the j-th plane — the j-th
stored element of each of the 1024 rows — is 1024 contiguous elements that
reshape directly to a native (8, 128) tile, with row r at slot
(r >> 7, r & 127). y for a chunk is the matching (8, 128) block, and the
kernel simply accumulates vals * gathered(x) elementwise over the chunk's
j-planes: the row reduction costs nothing and there is no scatter anywhere
(the TPU answer to the reference's per-chunk accumulator, kernels.hpp:
159-211).

Because SCS stores each row's columns ascending, a j-plane is a
quasi-diagonal: for banded/FEM/stencil matrices its columns span ~1024+w
entries, which almost always fits the kernel's 1024-entry gather window
(two-step dynamic_gather, ops/gather_primitive.py). Elements that miss the
window — or violate the per-(sublane, source-lane) consistency the two-step
gather needs — are spilled into extra partially-filled tiles. The packed
fill ratio is reported so callers can fall back to the XLA path for hostile
structures.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..formats.scs import ScsData

TILE_J = 8  # sublanes
LANES = 128  # lanes
CHUNK_ROWS = TILE_J * LANES  # rows per chunk = elements per tile
WINDOW = CHUNK_ROWS  # x entries per narrow gather window (8 x2d rows)
# wide mode: 16/32-row (2048/4096-entry) windows — the kernel gathers each
# (8,128) piece and multi-level-selects by the sublane table's high bits
# (+1 gather +1 select per extra piece per tile); chosen automatically when
# narrower packing spills too much (scattered columns)
WINDOW_LADDER = (TILE_J, 16, 32)
WIDE_RETRY_FILL = 0.6  # climb the ladder while fill is below this
WIDE_ACCEPT_FACTOR = 1.25  # keep a wider pack only if fill improves this much


def pack_with_window_retry(pack):
    """Single-sourced window-width policy: ``pack(window_rows)`` is called
    narrow first and re-called wider while fill is poor enough and the
    wider pack actually helps (each widening costs ~2 VPU ops per tile)."""
    lt = pack(WINDOW_LADDER[0])
    for wr in WINDOW_LADDER[1:]:
        if lt.fill >= WIDE_RETRY_FILL:
            break
        wide = pack(wr)
        if wide.fill > lt.fill * WIDE_ACCEPT_FACTOR:
            lt = wide
        else:
            break
    return lt
# Grid structure (grouped-flat): grid steps are decoupled from chunk
# boundaries — a step processes TILES_PER_STEP tiles of ONE chunk-GROUP
# (CHUNKS_PER_GROUP consecutive chunks) and accumulates each tile into its
# chunk's (8, 128) slice of the group's VMEM output block via a dynamic
# read-modify-write. Only group tile counts are padded (to a multiple of
# tiles_per_step), so padding waste is ~1% instead of the up-to-2x waste of
# per-chunk padding. Fat steps amortize the measured ~250-500 ns/step grid
# overhead (scripts/pallas_tile_cost.py).
MAX_CHUNKS_PER_GROUP = 256  # output block = (256, 8, 128) f32 = 1 MiB VMEM
MAX_TILES_PER_STEP = 128  # 2x(128,8,128)x2 double-buffered = 2 MiB VMEM
MIN_PIPELINE_STEPS = 16  # keep enough steps for DMA/compute overlap


def resolve_chunks_per_group(n_chunks: int, block_vec_size: int = 1) -> int:
    """Fewer, larger output groups are faster (fewer block transitions /
    zero-inits — measured +29% at G=256 vs 64), bounded by the VMEM budget
    of the (bs, G, 8, 128) output block and by the matrix itself."""
    budget = max(MAX_CHUNKS_PER_GROUP // max(block_vec_size, 1), 32)
    return max(min(budget, n_chunks), 1)


def auto_tiles_per_step(n_tiles: int) -> int:
    """Fattest power-of-two step that still leaves MIN_PIPELINE_STEPS grid
    steps (measured ~200-500 ns fixed cost per step; fewer, fatter steps
    win until the pipeline runs out of overlap)."""
    tps = 8
    while tps < MAX_TILES_PER_STEP and n_tiles // (tps * 2) >= MIN_PIPELINE_STEPS:
        tps *= 2
    return tps


@dataclasses.dataclass
class LaneTiles:
    """Packed device arrays (numpy; device placement happens later).

    ``src_tab`` packs both gather tables into one int32 per slot:
      bits 0-6  : L[i, j]   — source lane of the element at slot (i, j)
      bits 7-9  : S[i, l=j] — source sublane table, addressed by lane
    (the two tables have disjoint addressing but both live on the same
    (8, 128) slots, so one stream carries both — 8 bytes/element total.)
    """

    vals: np.ndarray  # [nt, 8, 128] value dtype
    src_tab: np.ndarray  # [nt, 8, 128] int32 packed (sub << 7) | lane
    w_row: np.ndarray  # [nt] int32, window start row of x2d (x row = 128 cols)
    tile_chunk: np.ndarray  # [nt] int32, ascending
    n_chunks: int
    n_rows_padded: int
    nnz: int
    n_spilled: int
    tiles_per_step: int = 32
    chunks_per_group: int = 64
    window_rows: int = TILE_J  # 8 = narrow, 16 = wide gather windows

    @property
    def n_tiles(self) -> int:
        return self.vals.shape[0]

    @property
    def n_groups(self) -> int:
        g = self.chunks_per_group
        return max((self.n_chunks + g - 1) // g, 1)

    @property
    def fill(self) -> float:
        sz = self.vals.size
        return self.nnz / sz if sz else 1.0


def pack_lane_tiles(
    scs: ScsData,
    dtype=np.float32,
    tiles_per_step: int | None = None,
    chunks_per_group: int | None = None,
    x_len: int | None = None,
    native: bool | None = None,
    window_rows: int = TILE_J,
) -> LaneTiles:
    """``x_len``: length of the x buffer the kernel will gather from
    (defaults to n_rows_padded; the distributed path passes the halo-extended
    buffer length so windows may reach into the halo region).

    ``native``: None = use the C++ packer when available (bit-identical to
    this Python path for every dtype — values travel as f64 and are rounded
    once to the target), True = require it, False = pure Python."""
    if scs.C != CHUNK_ROWS:
        raise ValueError(
            f"lane-tile packing requires C={CHUNK_ROWS}, got C={scs.C}"
        )
    if native is not False:
        from ..native import pack_lane_tiles_native

        out = pack_lane_tiles_native(
            scs, dtype, tiles_per_step=tiles_per_step,
            chunks_per_group=chunks_per_group, x_len=x_len,
            window_rows=window_rows,
        )
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native host library unavailable")
    n_chunks = scs.n_chunks
    window = window_rows * LANES
    if x_len is None:
        x_len = scs.n_rows_padded
    x_rows = max((x_len + LANES - 1) // LANES, window_rows)
    max_wrow = max(x_rows - window_rows, 0)

    # --- flat j-plane view of the SCS stream ---
    nt_base = scs.n_elements // CHUNK_ROWS
    assert nt_base * CHUNK_ROWS == scs.n_elements
    t_vals = scs.values.astype(dtype).reshape(nt_base, TILE_J, LANES)
    t_cols = scs.col_idxs.astype(np.int64).reshape(nt_base, TILE_J, LANES)
    # mark structural padding empty so it can't widen windows
    empty = scs.padding_mask().reshape(nt_base, TILE_J, LANES)
    t_cols = np.where(empty, -1, t_cols)
    lens = scs.chunk_lengths.astype(np.int64)
    plane_start = np.concatenate(([0], np.cumsum(lens)))  # tile id of plane 0
    has_elem = t_cols >= 0

    # --- two-pointer bin assignment, per chunk ---
    # An element may land in ANY plane-bin of its chunk whose 1024-entry
    # window covers its column (not just its own j-plane) — rows whose
    # sparsity differs from their chunk-mates would otherwise miss windows
    # en masse (measured 23% of elements on a 7-pt stencil with boundary
    # rows). Each row's elements are first sorted by column (row-internal
    # order is semantically free — contributions sum), which makes the
    # plane-min windows provably non-decreasing in j, so a per-row
    # two-pointer greedy (interval scheduling) is optimal for the window
    # constraint. assign[k, r] = bin index within the chunk, or -1 (spill).
    assign = np.full((nt_base, TILE_J, LANES), -1, dtype=np.int64)
    w_row = np.zeros(nt_base, dtype=np.int64)
    INF = np.iinfo(np.int64).max
    for c in range(n_chunks):
        L = int(lens[c])
        if L == 0:
            continue
        t0 = int(plane_start[c])
        cols = t_cols[t0 : t0 + L].reshape(L, CHUNK_ROWS)  # [k, row]
        vals = t_vals[t0 : t0 + L].reshape(L, CHUNK_ROWS)
        # sort each row's elements by column, padding (-1 -> INF) last
        key = np.where(cols >= 0, cols, INF)
        if L > 1 and (np.diff(key, axis=0) < 0).any():
            order = np.argsort(key, axis=0, kind="stable")
            cols = np.take_along_axis(cols, order, axis=0)
            vals = np.take_along_axis(vals, order, axis=0)
            t_cols[t0 : t0 + L] = cols.reshape(L, TILE_J, LANES)
            t_vals[t0 : t0 + L] = vals.reshape(L, TILE_J, LANES)
        valid = cols >= 0
        # plane windows: min col of each (sorted) j-plane, non-decreasing
        mc = np.where(valid, cols, INF).min(axis=1)
        mc = np.where(mc == INF, 0, mc)
        wr = np.minimum(mc // LANES, max_wrow)
        w_row[t0 : t0 + L] = wr
        W = wr * LANES
        # bin range covering each element's column
        bmin = np.searchsorted(W + window, cols, side="right")
        bmax = np.searchsorted(W, cols, side="right") - 1
        ptr = np.zeros(CHUNK_ROWS, dtype=np.int64)
        out = np.full((L, CHUNK_ROWS), -1, dtype=np.int64)
        for k in range(L):
            b = np.maximum(ptr, bmin[k])
            ok = valid[k] & (b <= bmax[k]) & (b < L)
            out[k] = np.where(ok, b, -1)
            ptr = np.where(ok, b + 1, ptr)
        assign[t0 : t0 + L] = out.reshape(L, TILE_J, LANES)

    # destination tile of each element (global plane-bin id)
    chunk_of_plane = np.repeat(np.arange(n_chunks, dtype=np.int64), lens)
    dest = np.where(
        assign >= 0, plane_start[chunk_of_plane][:, None, None] + assign, -1
    )
    off = t_cols - w_row[np.maximum(dest, 0)] * LANES
    in_window = dest >= 0

    lane = np.where(in_window, off & (LANES - 1), 0).astype(np.int64)
    sub = np.where(in_window, off >> 7, 0).astype(np.int64)

    # --- two-step-gather consistency: one sublane per (dest, i, lane) ---
    ii_idx = np.broadcast_to(
        np.arange(TILE_J)[None, :, None], assign.shape
    )
    skey = (
        np.maximum(dest, 0) * (TILE_J * LANES) + ii_idx * LANES + lane
    )
    S_first = np.full(nt_base * TILE_J * LANES, -1, dtype=np.int64)
    flat_key = skey.reshape(-1)
    flat_sub = sub.reshape(-1)
    order = np.flatnonzero(in_window.reshape(-1))
    uniq, first_idx = np.unique(flat_key[order], return_index=True)
    S_first[uniq] = flat_sub[order[first_idx]]
    conflict = in_window.reshape(-1) & (S_first[flat_key] != flat_sub)
    conflict = conflict.reshape(assign.shape)

    keep = in_window & ~conflict
    spill_mask = has_elem & ~keep

    sub_tab = np.zeros((nt_base, TILE_J, LANES), dtype=np.int32)
    lane_tab = np.zeros((nt_base, TILE_J, LANES), dtype=np.int32)
    vals_out = np.zeros((nt_base, TILE_J, LANES), dtype=dtype)
    ti, ii, ji = np.nonzero(keep)  # ti = source plane, ii/ji = row slot
    di = dest[ti, ii, ji]
    sub_tab[di, ii, lane[ti, ii, ji]] = sub[ti, ii, ji].astype(np.int32)
    lane_tab[di, ii, ji] = lane[ti, ii, ji].astype(np.int32)
    vals_out[di, ii, ji] = t_vals[ti, ii, ji]
    base_chunk = chunk_of_plane.astype(np.int32)

    # --- spill retry into BASE bins (before opening spill tiles) ---
    # The two-pointer assigns a row's k-th element to bin >= k (monotone
    # heuristic); when that misses, ANY bin of the chunk is still legal
    # (free slot + window + sublane consistency). Without this pass a
    # 7-point stencil leaves ~1 spill tile per chunk at <1% occupancy —
    # 13% of the whole value stream on the headline matrix.
    used = np.zeros(nt_base, dtype=bool)
    if di.size:
        used[np.unique(di)] = True
    n_spilled = int(spill_mask.sum())
    if n_spilled:
        occ_base = np.zeros((nt_base, TILE_J, LANES), dtype=bool)
        s_set = np.zeros((nt_base, TILE_J, LANES), dtype=bool)
        if ti.size:
            occ_base[di, ii, ji] = True
            s_set[di, ii, lane[ti, ii, ji]] = True
        sti, sii, sji = np.nonzero(spill_mask)
        s_chunk = base_chunk[sti]
        s_col = t_cols[sti, sii, sji]
        s_val = t_vals[sti, sii, sji]
        order = np.lexsort((s_col, s_chunk))
        still = []
        for idx in order:
            c = int(s_chunk[idx])
            i, j = int(sii[idx]), int(sji[idx])
            col = int(s_col[idx])
            t0b = int(plane_start[c])
            placed = False
            for b in range(t0b, t0b + int(lens[c])):
                off = col - int(w_row[b]) * LANES
                if not (0 <= off < window) or occ_base[b, i, j]:
                    continue
                l, s = off & (LANES - 1), off >> 7
                if s_set[b, i, l] and sub_tab[b, i, l] != s:
                    continue
                vals_out[b, i, j] = s_val[idx]
                lane_tab[b, i, j] = l
                sub_tab[b, i, l] = s
                s_set[b, i, l] = True
                occ_base[b, i, j] = True
                used[b] = True
                placed = True
                break
            if not placed:
                still.append(idx)
        order = np.asarray(still, dtype=np.int64)
        # n_spilled reports elements in DEDICATED spill tiles (post-retry)
        n_spilled = int(order.size)

    # --- spill packing (greedy per chunk) ---
    extra = {"vals": [], "sub": [], "lane": [], "w": [], "chunk": []}
    if n_spilled and order.size:
        for c in np.unique(s_chunk[order]):
            sel = order[s_chunk[order] == c]
            _pack_spills(
                extra, int(c),
                s_col[sel], s_val[sel], sii[sel], sji[sel],
                max_wrow, dtype, window,
            )

    # drop bins that ended up empty (all their elements moved elsewhere)
    if not used.all():
        vals_out = vals_out[used]
        sub_tab = sub_tab[used]
        lane_tab = lane_tab[used]
        w_row = w_row[used]
        base_chunk = base_chunk[used]

    if extra["vals"]:
        vals_out = np.concatenate([vals_out, np.stack(extra["vals"])])
        sub_tab = np.concatenate([sub_tab, np.stack(extra["sub"])])
        lane_tab = np.concatenate([lane_tab, np.stack(extra["lane"])])
        w_row = np.concatenate([w_row, np.asarray(extra["w"], dtype=np.int64)])
        base_chunk = np.concatenate(
            [base_chunk, np.asarray(extra["chunk"], dtype=np.int32)]
        )

    if chunks_per_group is None:
        chunks_per_group = resolve_chunks_per_group(n_chunks)

    # order tiles group-major, then ROUND-ROBIN across the group's chunks
    # (rank-within-chunk major): consecutive tiles then accumulate into
    # different output slots, breaking the read-after-write chain on the
    # dynamic VMEM RMW (measured ~4 ns/tile when chunk-major)
    order0 = np.argsort(base_chunk, kind="stable")
    bc = base_chunk[order0].astype(np.int64)
    starts = np.concatenate(([0], np.flatnonzero(np.diff(bc)) + 1))
    lens_run = np.diff(np.append(starts, bc.size))
    rank = np.arange(bc.size) - np.repeat(starts, lens_run)
    key = (bc // chunks_per_group) * (1 << 42) + rank * (1 << 21) + bc
    reorder = order0[np.argsort(key, kind="stable")]
    vals_out = vals_out[reorder]
    src_tab = ((sub_tab.astype(np.int32) << 7) | lane_tab.astype(np.int32))[
        reorder
    ]
    w_row = w_row[reorder].astype(np.int32)
    base_chunk = base_chunk[reorder].astype(np.int32)

    # pad each GROUP's tile count to a non-zero multiple of tiles_per_step
    # with no-op tiles (vals 0, chunk = group's first chunk — a harmless
    # += 0). Steps never straddle groups; empty groups keep one all-zero
    # step so their output block still gets zero-initialized.
    if tiles_per_step is None:
        tiles_per_step = auto_tiles_per_step(vals_out.shape[0])
    n_groups = max((n_chunks + chunks_per_group - 1) // chunks_per_group, 1)
    tile_group = base_chunk // chunks_per_group
    cnt = np.bincount(tile_group, minlength=n_groups)
    cnt_pad = np.maximum(
        (cnt + tiles_per_step - 1) // tiles_per_step, 1
    ) * tiles_per_step
    nt_pad = int(cnt_pad.sum())
    nt = vals_out.shape[0]
    if nt_pad != nt:
        ends = np.cumsum(cnt)
        ends_pad = np.cumsum(cnt_pad)
        # position of each original tile in the padded stream
        src_pos = np.arange(nt) + (ends_pad - ends)[tile_group] - (
            cnt_pad - cnt
        )[tile_group]
        v = np.zeros((nt_pad, TILE_J, LANES), dtype=dtype)
        s = np.zeros((nt_pad, TILE_J, LANES), dtype=np.int32)
        w = np.zeros(nt_pad, dtype=np.int32)
        # padding tiles target their group's first chunk with zero values
        c = np.repeat(
            np.arange(n_groups, dtype=np.int32) * chunks_per_group, cnt_pad
        )
        v[src_pos] = vals_out
        s[src_pos] = src_tab
        w[src_pos] = w_row
        c[src_pos] = base_chunk
        vals_out, src_tab, w_row, base_chunk = v, s, w, c

    return LaneTiles(
        vals=vals_out,
        src_tab=src_tab,
        w_row=w_row,
        tile_chunk=base_chunk,
        n_chunks=n_chunks,
        n_rows_padded=scs.n_rows_padded,
        nnz=scs.nnz,
        n_spilled=n_spilled,
        tiles_per_step=tiles_per_step,
        chunks_per_group=chunks_per_group,
        window_rows=window_rows,
    )


# --- mixed-chunk tiles: the zero-column-locality mode -------------------
#
# Chunk-local packing caps fill at chunk_nnz * window / n_cols: a chunk of
# 1024 rows x ~8 nnz over 500k random columns puts only ~60 elements into
# any 4096-entry gather window, so tiles cannot fill no matter how the
# packer arranges them (RandomImbalanced measured fill 0.018 -> XLA
# fallback at 0.2 GFLOP/s). Mixed-chunk tiles pool elements from up to
# M_MIXED chunks of one output GROUP into a single tile — the candidate
# pool per (window, tile) grows M_MIXED-fold — at the cost of a per-element
# 3-bit chunk selector (spare high bits of the src16 stream) and M_MIXED
# masked read-modify-writes per tile in the kernel (~3 VPU ops each).
#
# Per-tile state: one gather window w; a chunk SET (chunk-local ids,
# <= M_MIXED, stored in cls[nt, M_MIXED]); slot occupancy (an element's
# slot (i, j) is fixed by its row-within-chunk, the chunk given by the
# selector); and the usual one-sublane-per-(tile-row, source-lane) gather
# consistency.

M_MIXED = 8  # chunk slots per mixed tile (3 selector bits, hard cap)
MIXED_SEL_SHIFT = 13  # selector bits 13-15 of src16; sub (<= 63, wr <= 64) uses 7-12


@dataclasses.dataclass
class MixedTiles:
    """Packed mixed-chunk tiles (numpy). Same layout as LaneTiles plus the
    per-tile chunk-slot table ``cls`` and per-element selectors packed into
    ``src_tab`` bits 12-14."""

    vals: np.ndarray  # [nt, 8, 128]
    src_tab: np.ndarray  # [nt, 8, 128] int32 (sel << 12) | (sub << 7) | lane
    w_row: np.ndarray  # [nt] int32
    tile_group: np.ndarray  # [nt] int32, ascending
    cls: np.ndarray  # [nt, M_MIXED] int32 chunk-local ids (pad: repeat 0)
    n_chunks: int
    n_rows_padded: int
    nnz: int
    tiles_per_step: int
    chunks_per_group: int
    window_rows: int

    @property
    def n_tiles(self) -> int:
        return self.vals.shape[0]

    @property
    def n_groups(self) -> int:
        g = self.chunks_per_group
        return max((self.n_chunks + g - 1) // g, 1)

    @property
    def fill(self) -> float:
        sz = self.vals.size
        return self.nnz / sz if sz else 1.0


def pack_mixed_tiles(
    scs: ScsData,
    dtype=np.float32,
    tiles_per_step: int | None = None,
    chunks_per_group: int | None = None,
    x_len: int | None = None,
    window_rows: int = 32,
    m_mixed: int = M_MIXED,
    native: bool | None = None,
) -> MixedTiles:
    """Pack an SCS (C=1024) into mixed-chunk tiles (column-sorted greedy
    per group with a pruned open-tile list; open tiles whose window the
    ascending column walk has passed can never accept another element, so
    the scan stays short)."""
    if scs.C != CHUNK_ROWS:
        raise ValueError(
            f"mixed-tile packing requires C={CHUNK_ROWS}, got C={scs.C}"
        )
    if native is not False:
        from ..native import pack_mixed_tiles_native

        out = pack_mixed_tiles_native(
            scs, dtype, tiles_per_step=tiles_per_step,
            chunks_per_group=chunks_per_group, x_len=x_len,
            window_rows=window_rows, m_mixed=m_mixed,
        )
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native host library unavailable")
    n_chunks = scs.n_chunks
    window = window_rows * LANES
    if x_len is None:
        x_len = scs.n_rows_padded
    x_rows = max((x_len + LANES - 1) // LANES, window_rows)
    max_wrow = max(x_rows - window_rows, 0)
    if chunks_per_group is None:
        chunks_per_group = resolve_chunks_per_group(n_chunks)
    G = chunks_per_group

    # flat element view (drop structural padding)
    keep = ~scs.padding_mask()
    cols_all = scs.col_idxs[keep].astype(np.int64)
    vals_all = scs.values[keep].astype(dtype)
    chunk, _j, i_slot = scs.element_coords()
    chunk = chunk[keep]
    rows_in_chunk = i_slot[keep]  # row-within-chunk of each element
    si_all = (rows_in_chunk >> 7).astype(np.int64)  # slot sublane
    sj_all = (rows_in_chunk & (LANES - 1)).astype(np.int64)  # slot lane
    group_all = (chunk // G).astype(np.int64)
    cl_all = (chunk - group_all * G).astype(np.int64)

    n_groups = max((n_chunks + G - 1) // G, 1)
    # BANDED selectors: chunk band = cl // m, selector = cl % m. A tile
    # serves exactly one band (its cls row is the band's m chunk ids), so
    # there is no per-tile chunk-set bookkeeping and — for uniform column
    # scatter — the per-(window, band) pool equals the optimal chunk
    # partition (free chunk-sets measured 3.6x WORSE fill: first-come
    # chunk sets fragment the pool)
    band_all = cl_all // m_mixed
    order = np.lexsort((cols_all, band_all, group_all))
    gb_all = group_all * (1 << 20) + band_all
    gb = gb_all[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(np.diff(gb)) + 1, [gb.size])
    )

    grp_w: list = []
    grp_cls: list = []  # tile dicts, emitted at creation time
    grp_of_tile: list = []
    for seg in range(starts.size - 1):
        sel_idx = order[starts[seg] : starts[seg + 1]]
        if sel_idx.size == 0:
            continue
        g = int(group_all[sel_idx[0]])
        band = int(band_all[sel_idx[0]])
        cls_row = np.minimum(
            band * m_mixed + np.arange(m_mixed, dtype=np.int32), G - 1
        )
        cols = cols_all[sel_idx]
        vals = vals_all[sel_idx]
        sels = (cl_all[sel_idx] - band * m_mixed).astype(np.int64)
        sis = si_all[sel_idx]
        sjs = sj_all[sel_idx]
        open_tiles: list = []
        head = 0
        for col, val, sel, i, j in zip(cols, vals, sels, sis, sjs):
            col = int(col)
            sel = int(sel)
            i = int(i)
            j = int(j)
            # skip tiles the ascending walk has passed (they can never
            # accept another element; they stay in the emit lists)
            while head < len(open_tiles) and (
                open_tiles[head]["w"] * LANES + window <= col
            ):
                head += 1
            placed = False
            for t in open_tiles[head:]:
                off = col - t["w"] * LANES
                if off >= window or t["occ"][i, j]:
                    continue
                lane, s = off & (LANES - 1), off >> 7
                if t["s_set"][i, lane] and t["sub"][i, lane] != s:
                    continue
                t["vals"][i, j] = val
                # lane + selector are slot-addressed at (i, j); the
                # sublane table is addressed by SOURCE LANE at (i, lane)
                # (two tables share the packed word, original layout —
                # see LaneTiles.src_tab)
                t["lane"][i, j] = lane
                t["sel"][i, j] = sel
                t["sub"][i, lane] = s
                t["s_set"][i, lane] = True
                t["occ"][i, j] = True
                placed = True
                break
            if not placed:
                w = min(col // LANES, max_wrow)
                t = {
                    "w": w,
                    "vals": np.zeros((TILE_J, LANES), dtype=dtype),
                    "lane": np.zeros((TILE_J, LANES), dtype=np.int32),
                    "sel": np.zeros((TILE_J, LANES), dtype=np.int32),
                    "sub": np.zeros((TILE_J, LANES), dtype=np.int32),
                    "s_set": np.zeros((TILE_J, LANES), dtype=bool),
                    "occ": np.zeros((TILE_J, LANES), dtype=bool),
                }
                off = col - w * LANES
                lane, s = off & (LANES - 1), off >> 7
                t["vals"][i, j] = val
                t["lane"][i, j] = lane
                t["sel"][i, j] = sel
                t["sub"][i, lane] = s
                t["s_set"][i, lane] = True
                t["occ"][i, j] = True
                t["cls"] = cls_row
                open_tiles.append(t)
                grp_w.append(t["w"])
                grp_cls.append(t)
                grp_of_tile.append(g)

    nt = len(grp_cls)
    if nt == 0:
        vals_out = np.zeros((1, TILE_J, LANES), dtype=dtype)
        src_tab = np.zeros((1, TILE_J, LANES), dtype=np.int32)
        w_row = np.zeros(1, dtype=np.int32)
        tile_group = np.zeros(1, dtype=np.int32)
        cls_arr = np.zeros((1, m_mixed), dtype=np.int32)
        nt = 1
    else:
        cls_arr = np.zeros((nt, m_mixed), dtype=np.int32)
        vals_out = np.empty((nt, TILE_J, LANES), dtype=dtype)
        src_tab = np.empty((nt, TILE_J, LANES), dtype=np.int32)
        for k, t in enumerate(grp_cls):
            cls_arr[k] = t["cls"]
            vals_out[k] = t["vals"]
            src_tab[k] = (
                (t["sel"] << MIXED_SEL_SHIFT) | (t["sub"] << 7) | t["lane"]
            )
        w_row = np.asarray(grp_w, dtype=np.int32)
        tile_group = np.asarray(grp_of_tile, dtype=np.int32)

    return _finalize_mixed_tiles(
        vals_out, src_tab, w_row, tile_group, cls_arr, scs, dtype,
        tiles_per_step, G, n_groups, window_rows, m_mixed,
    )


def _finalize_mixed_tiles(
    vals_out, src_tab, w_row, tile_group, cls_arr, scs, dtype,
    tiles_per_step, G, n_groups, window_rows, m_mixed,
):
    """Shared tail of the Python and native mixed packers: interleave
    within groups and pad per group to the step width."""
    n_chunks = scs.n_chunks
    # interleave consecutive tiles of a group ACROSS BANDS: tiles of one
    # band all accumulate into the same m output blocks, so band-major
    # order chains read-after-writes on every masked RMW (measured ~45
    # ns/tile of stall); round-robin by rank-within-band makes
    # consecutive tiles target disjoint blocks
    band_of_tile = (cls_arr[:, 0] // max(m_mixed, 1)).astype(np.int64)
    order0 = np.lexsort((band_of_tile, tile_group))
    tg = tile_group[order0].astype(np.int64)
    gb_key = tg * (1 << 20) + band_of_tile[order0]
    starts = np.concatenate(([0], np.flatnonzero(np.diff(gb_key)) + 1))
    lens_run = np.diff(np.append(starts, gb_key.size))
    rank = np.arange(gb_key.size) - np.repeat(starts, lens_run)
    key = (tg * (1 << 40) + rank * (1 << 20) + band_of_tile[order0])
    reorder = order0[np.argsort(key, kind="stable")]
    vals_out = vals_out[reorder]
    src_tab = src_tab[reorder]
    w_row = w_row[reorder]
    tile_group = tile_group[reorder]
    cls_arr = cls_arr[reorder]

    # pad each group's tile count to a multiple of tiles_per_step; every
    # group needs >= 1 step so its output block gets zero-initialized
    if tiles_per_step is None:
        tiles_per_step = auto_tiles_per_step(vals_out.shape[0])
    cnt = np.bincount(tile_group, minlength=n_groups)
    cnt_pad = np.maximum(
        (cnt + tiles_per_step - 1) // tiles_per_step, 1
    ) * tiles_per_step
    nt_pad = int(cnt_pad.sum())
    nt = vals_out.shape[0]
    if nt_pad != nt:
        ends = np.cumsum(cnt)
        ends_pad = np.cumsum(cnt_pad)
        src_pos = np.arange(nt) + (ends_pad - ends)[tile_group] - (
            cnt_pad - cnt
        )[tile_group]
        v = np.zeros((nt_pad, TILE_J, LANES), dtype=dtype)
        s = np.zeros((nt_pad, TILE_J, LANES), dtype=np.int32)
        w = np.zeros(nt_pad, dtype=np.int32)
        c = np.zeros((nt_pad, m_mixed), dtype=np.int32)
        tgp = np.repeat(np.arange(n_groups, dtype=np.int32), cnt_pad)
        v[src_pos] = vals_out
        s[src_pos] = src_tab
        w[src_pos] = w_row
        c[src_pos] = cls_arr
        vals_out, src_tab, w_row, cls_arr, tile_group = v, s, w, c, tgp

    return MixedTiles(
        vals=vals_out,
        src_tab=src_tab,
        w_row=w_row,
        tile_group=tile_group,
        cls=cls_arr,
        n_chunks=n_chunks,
        n_rows_padded=scs.n_rows_padded,
        nnz=scs.nnz,
        tiles_per_step=tiles_per_step,
        chunks_per_group=G,
        window_rows=window_rows,
    )


def _pack_spills(extra, chunk, cols, vals, iis, jjs, max_wrow, dtype,
                 window=WINDOW):
    """Greedy spill packing for one chunk. Each spill must land at its
    fixed y slot (i, j); constraints: window, free slot, S-consistency.
    cols sorted ascending."""
    open_tiles = []  # indices into extra arrays

    def new_tile(col0):
        w = min(int(col0) // LANES, max_wrow)
        extra["vals"].append(np.zeros((TILE_J, LANES), dtype=dtype))
        extra["sub"].append(np.zeros((TILE_J, LANES), dtype=np.int32))
        extra["lane"].append(np.zeros((TILE_J, LANES), dtype=np.int32))
        extra["w"].append(w)
        extra["chunk"].append(chunk)
        open_tiles.append(
            {
                "k": len(extra["vals"]) - 1,
                "w": w,
                "s_set": np.zeros((TILE_J, LANES), dtype=bool),
                "occ": np.zeros((TILE_J, LANES), dtype=bool),
            }
        )
        return open_tiles[-1]

    for col, val, i, j in zip(cols, vals, iis, jjs):
        placed = False
        for t in open_tiles:
            off = int(col) - t["w"] * LANES
            if not (0 <= off < window) or t["occ"][i, j]:
                continue
            l, s = off & (LANES - 1), off >> 7
            if t["s_set"][i, l] and extra["sub"][t["k"]][i, l] != s:
                continue
            k = t["k"]
            extra["vals"][k][i, j] = val
            extra["lane"][k][i, j] = l
            extra["sub"][k][i, l] = s
            t["s_set"][i, l] = True
            t["occ"][i, j] = True
            placed = True
            break
        if not placed:
            t = new_tile(col)
            off = int(col) - t["w"] * LANES
            l, s = off & (LANES - 1), off >> 7
            k = t["k"]
            extra["vals"][k][i, j] = val
            extra["lane"][k][i, j] = l
            extra["sub"][k][i, l] = s
            t["s_set"][i, l] = True
            t["occ"][i, j] = True


# --- product tiles: phase 1 of the transpose-stream (3-pass) mode --------
#
# The masked mixed-tile mode is VMEM-RMW-bound (~4-11 GFLOP/s on
# zero-locality matrices). The 3-pass mode sidesteps output RMW entirely:
#
#   phase 1  products kernel: p[pos] = val * x[col], written SEQUENTIALLY
#            to a padded cell grid P[block b][cell-group g2][k1][a][j]
#            (cell = (column-block b, row-chunk c); j = c%128, g2 = c//128;
#            k = k1*8 + a indexes the element within its cell) — elements
#            of a tile share one column block, so gather windows are
#            narrow and slots carry no row constraint at all;
#   phase 2  one XLA transpose of P to PT[c][b][k] (row-chunk-major);
#   phase 3  y = B' @ PT through the REGULAR lane-tile kernel, where B'
#            is the 0/1 matrix mapping each row to its PT positions —
#            chunk c's sources all live in its own contiguous slab, so B'
#            has banded-like locality (plus heavy-row splitting + fold).
#
# The k slot of each element is chosen to satisfy the two-step gather's
# one-sublane-per-(tile-row, source-lane) pin; elements that cannot place
# within their cell's k slots (pin saturation or cell overflow beyond
# S_CAP) are SPILLED to a COO tail the operator runs through the mixed
# path against the original x.

PRODUCT_WINDOW_ROWS = 32  # column block = 4096 x entries


@dataclasses.dataclass
class ProductTiles:
    """Phase-1 packed tiles + the cell geometry phases 2/3 need."""

    vals: np.ndarray  # [nt, 8, 128]
    src_tab: np.ndarray  # [nt, 8, 128] int32 (sub<<7)|lane
    w_row: np.ndarray  # [nt] int32 window start (x2d rows)
    NB: int  # column blocks
    NCg: int  # cell groups (ceil(n_chunks/128))
    s_pad: int  # padded cell capacity (multiple of 8)
    n_chunks: int
    nnz_packed: int
    # packed element map for B' (phase 3): row + PT position per element
    elem_rows: np.ndarray  # [n_packed] int64 (permuted row space)
    elem_pos: np.ndarray  # [n_packed] int64: (c*NB + b)*s_pad + k
    # spilled elements (original column space, PERMUTED row space)
    spill_rows: np.ndarray
    spill_cols: np.ndarray
    spill_vals: np.ndarray
    window_rows: int = PRODUCT_WINDOW_ROWS

    @property
    def n_tiles(self) -> int:
        return self.vals.shape[0]

    @property
    def fill(self) -> float:
        return self.nnz_packed / max(self.vals.size, 1)


def pack_product_tiles(
    scs: ScsData,
    dtype=np.float32,
    s_cap_factor: float = 4.0,
    native: bool | None = None,
) -> ProductTiles:
    """Pack phase-1 product tiles from an SCS (C=1024, any row perm).

    Layout: per (b, g2) the positions form an [s_pad/8, 8, 128] grid —
    tile t = (b, g2, k1) holds k-slots [8*k1, 8*k1+8) of 128 cells, so a
    cell's elements spread across tile-rows AND tiles, giving the greedy
    k-assignment the freedom to dodge gather-pin conflicts (a cell laid
    contiguously would pin its whole population to one tile-row, measured
    ~18% conflicts on random columns)."""
    if scs.C != CHUNK_ROWS:
        raise ValueError("product tiles require C=1024")
    if native is not False:
        from ..native import pack_product_tiles_native

        out = pack_product_tiles_native(scs, dtype, s_cap_factor)
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native host library unavailable")
    W = PRODUCT_WINDOW_ROWS * LANES
    n_chunks = scs.n_chunks
    compact = hasattr(scs, "row_ptrs")  # CompactScs (formats/scs.py)
    if compact:
        # per-row compact (cols, values): enumerate (row, k) directly;
        # the padded flat layout was never materialized
        cols = scs.cols.astype(np.int64)
        vals = scs.values.astype(dtype)
        cnt = scs.row_counts_new.astype(np.int64)
        rows = np.repeat(np.arange(cnt.size, dtype=np.int64), cnt)
        ends = np.cumsum(cnt)
        ks = np.arange(int(ends[-1]) if cnt.size else 0, dtype=np.int64)
        ks -= np.repeat(ends - cnt, cnt)
        chunk = rows // CHUNK_ROWS
    else:
        keep = ~scs.padding_mask()
        cols = scs.col_idxs[keep].astype(np.int64)
        vals = scs.values[keep].astype(dtype)
        chunk, _j, r_in = scs.element_coords()
        chunk = chunk[keep].astype(np.int64)
        rows = (chunk * CHUNK_ROWS + r_in[keep]).astype(np.int64)
        ks = None
    n_cols = max(int(cols.max(initial=0)) + 1, 1)
    NB = (n_cols + W - 1) // W
    NCg = (n_chunks + 127) // 128

    b_of = cols // W
    cell = b_of * n_chunks + chunk  # global cell id (b-major)
    # cell sizes -> padded capacity
    csize = np.bincount(cell, minlength=NB * n_chunks)
    lam = max(float(csize.mean()), 1.0)
    s_cap = int(min(max(csize.max(initial=1), 8),
                    max(s_cap_factor * lam, 16)))
    s_pad = ((s_cap + 7) // 8) * 8
    s8 = s_pad // 8

    nt = NB * NCg * s8
    out_vals = np.zeros((nt, TILE_J, LANES), dtype=dtype)
    lane_tab = np.zeros((nt, TILE_J, LANES), dtype=np.int32)
    sub_tab = np.zeros((nt, TILE_J, LANES), dtype=np.int32)
    s_set = np.zeros((nt, TILE_J, LANES), dtype=bool)
    w_row = np.zeros(nt, dtype=np.int32)
    # tile (b, g2, k1) index and its window
    tb = np.arange(nt) // (NCg * s8)
    w_row[:] = (tb * PRODUCT_WINDOW_ROWS).astype(np.int32)

    if compact:
        # compact elements arrive row-major; the padded flat enumeration
        # (and the native twin) traverse cells in (k, row) order
        order = np.lexsort((rows, ks, cell))
    else:
        order = np.argsort(cell, kind="stable")
    bounds = np.searchsorted(cell[order], np.arange(NB * n_chunks + 1))
    sp_r, sp_c, sp_v = [], [], []
    n_el = cols.size
    elem_rows = np.empty(n_el, dtype=np.int64)
    elem_pos = np.empty(n_el, dtype=np.int64)
    n_packed = 0
    for ci in range(NB * n_chunks):
        lo, hi = bounds[ci], bounds[ci + 1]
        if lo == hi:
            continue
        b = ci // n_chunks
        c = ci % n_chunks
        g2 = c // 128
        j = c % 128
        tile0 = (b * NCg + g2) * s8
        pos0 = (c * NB + b) * s_pad
        used_k = np.zeros(s_pad, dtype=bool)
        for e in order[lo:hi]:
            col = int(cols[e])
            l_e = col & (LANES - 1)
            s_e = (col - b * W) >> 7
            placed = False
            # first-fit from 0: a forward-only pointer would strand the
            # k slots skipped over pin conflicts and spill later elements
            # that those slots could still take
            for k in range(s_pad):
                if used_k[k]:
                    continue
                t = tile0 + (k >> 3)
                a = k & 7
                if not s_set[t, a, l_e] or sub_tab[t, a, l_e] == s_e:
                    out_vals[t, a, j] = vals[e]
                    lane_tab[t, a, j] = l_e
                    sub_tab[t, a, l_e] = s_e
                    s_set[t, a, l_e] = True
                    used_k[k] = True
                    placed = True
                    elem_rows[n_packed] = rows[e]
                    elem_pos[n_packed] = pos0 + k
                    n_packed += 1
                    break
            if not placed:
                sp_r.append(rows[e])
                sp_c.append(col)
                sp_v.append(vals[e])
    spill_rows = np.asarray(sp_r, dtype=np.int64)
    spill_cols = np.asarray(sp_c, dtype=np.int64)
    spill_vals = np.asarray(sp_v, dtype=np.float64)
    return ProductTiles(
        vals=out_vals,
        src_tab=(sub_tab << 7) | lane_tab,
        w_row=w_row,
        NB=NB,
        NCg=NCg,
        s_pad=s_pad,
        n_chunks=n_chunks,
        nnz_packed=n_packed,
        elem_rows=elem_rows[:n_packed],
        elem_pos=elem_pos[:n_packed],
        spill_rows=spill_rows,
        spill_cols=spill_cols,
        spill_vals=spill_vals,
    )


def pack_lane_tiles_colwalk(
    scs: ScsData,
    dtype=np.float32,
    tiles_per_step: int | None = None,
    chunks_per_group: int | None = None,
    x_len: int | None = None,
    window_rows: int = 32,
    native: bool | None = None,
) -> LaneTiles:
    """Column-sorted sliding-window packing into standard LaneTiles.

    The two-pointer packer bins elements by j-plane, whose windows are the
    per-plane column minima; when a chunk's rows hit near-uniform random
    positions inside a wide band (the B' matrices of the transpose-stream
    mode: each chunk reads its own contiguous PT slab), the plane minima
    spread by half the band and most elements spill (measured fill 0.11).
    Walking each chunk's elements in column order with a head-pruned open
    tile list instead keeps windows sliding smoothly (same greedy as the
    mixed packer at band size 1 — no selectors needed since a tile serves
    one chunk). Slot (i, j) stays fixed by the row; the one-sublane-per-
    (tile-row, source-lane) pin applies as usual."""
    if scs.C != CHUNK_ROWS:
        raise ValueError("colwalk packing requires C=1024")
    if native is not False:
        from ..native import pack_colwalk_native

        out = pack_colwalk_native(
            scs, dtype, tiles_per_step=tiles_per_step,
            chunks_per_group=chunks_per_group, x_len=x_len,
            window_rows=window_rows,
        )
        if out is not None:
            return out
        if native is True:
            raise RuntimeError("native host library unavailable")
    window = window_rows * LANES
    if x_len is None:
        x_len = scs.n_rows_padded
    x_rows = max((x_len + LANES - 1) // LANES, window_rows)
    max_wrow = max(x_rows - window_rows, 0)
    n_chunks = scs.n_chunks
    if chunks_per_group is None:
        chunks_per_group = resolve_chunks_per_group(n_chunks)
    G = chunks_per_group

    keep = ~scs.padding_mask()
    cols_all = scs.col_idxs[keep].astype(np.int64)
    vals_all = scs.values[keep].astype(dtype)
    chunk, _j, r_in = scs.element_coords()
    chunk = chunk[keep].astype(np.int64)
    si_all = (r_in[keep] >> 7).astype(np.int64)
    sj_all = (r_in[keep] & (LANES - 1)).astype(np.int64)

    order = np.lexsort((cols_all, chunk))
    starts = np.searchsorted(chunk[order], np.arange(n_chunks + 1))

    t_vals: list = []
    t_lane: list = []
    t_sub: list = []
    t_w: list = []
    t_chunk: list = []
    n_spilled = 0
    for c in range(n_chunks):
        seg = order[starts[c] : starts[c + 1]]
        if seg.size == 0:
            continue
        open_tiles: list = []
        head = 0
        for e in seg:
            col = int(cols_all[e])
            i = int(si_all[e])
            j = int(sj_all[e])
            while head < len(open_tiles) and (
                open_tiles[head]["w"] * LANES + window <= col
            ):
                head += 1
            placed = False
            for t in open_tiles[head:]:
                off = col - t["w"] * LANES
                if off >= window or t["occ"][i, j]:
                    continue
                lane, s = off & (LANES - 1), off >> 7
                if t["s_set"][i, lane] and t["sub"][i, lane] != s:
                    continue
                t["vals"][i, j] = vals_all[e]
                t["lane"][i, j] = lane
                t["sub"][i, lane] = s
                t["s_set"][i, lane] = True
                t["occ"][i, j] = True
                placed = True
                break
            if not placed:
                w = min(col // LANES, max_wrow)
                t = {
                    "w": w,
                    "vals": np.zeros((TILE_J, LANES), dtype=dtype),
                    "lane": np.zeros((TILE_J, LANES), dtype=np.int32),
                    "sub": np.zeros((TILE_J, LANES), dtype=np.int32),
                    "s_set": np.zeros((TILE_J, LANES), dtype=bool),
                    "occ": np.zeros((TILE_J, LANES), dtype=bool),
                }
                off = col - w * LANES
                lane, s = off & (LANES - 1), off >> 7
                t["vals"][i, j] = vals_all[e]
                t["lane"][i, j] = lane
                t["sub"][i, lane] = s
                t["s_set"][i, lane] = True
                t["occ"][i, j] = True
                open_tiles.append(t)
                t_vals.append(t["vals"])
                t_lane.append(t["lane"])
                t_sub.append(t["sub"])
                t_w.append(w)
                t_chunk.append(c)

    nt = len(t_vals)
    if nt == 0:
        vals_out = np.zeros((1, TILE_J, LANES), dtype=dtype)
        src_tab = np.zeros((1, TILE_J, LANES), dtype=np.int32)
        w_row = np.zeros(1, dtype=np.int64)
        base_chunk = np.zeros(1, dtype=np.int32)
    else:
        vals_out = np.stack(t_vals)
        src_tab = np.stack(
            [(s.astype(np.int32) << 7) | l for s, l in zip(t_sub, t_lane)]
        )
        w_row = np.asarray(t_w, dtype=np.int64)
        base_chunk = np.asarray(t_chunk, dtype=np.int32)

    return _finalize_colwalk(
        vals_out, src_tab, w_row, base_chunk, scs, tiles_per_step,
        chunks_per_group, window_rows, n_spilled,
    )


def _finalize_colwalk(vals_out, src_tab, w_row, base_chunk, scs,
                      tiles_per_step, chunks_per_group, window_rows,
                      n_spilled=0):
    """Shared tail of the Python and native colwalk packers: ordering +
    per-group step padding (same scheme as pack_lane_tiles — round-robin
    across the group's chunks to break the RMW RAW chain)."""
    n_chunks = scs.n_chunks
    G = chunks_per_group if chunks_per_group is not None else (
        resolve_chunks_per_group(n_chunks)
    )
    order0 = np.argsort(base_chunk, kind="stable")
    bc = base_chunk[order0].astype(np.int64)
    starts2 = np.concatenate(([0], np.flatnonzero(np.diff(bc)) + 1))
    lens_run = np.diff(np.append(starts2, bc.size))
    rank = np.arange(bc.size) - np.repeat(starts2, lens_run)
    key = (bc // G) * (1 << 42) + rank * (1 << 21) + bc
    reorder = order0[np.argsort(key, kind="stable")]
    vals_out = vals_out[reorder]
    src_tab = src_tab[reorder]
    w_row = w_row[reorder]
    base_chunk = base_chunk[reorder]

    if tiles_per_step is None:
        tiles_per_step = auto_tiles_per_step(vals_out.shape[0])
    n_groups = max((n_chunks + G - 1) // G, 1)
    tile_group = base_chunk // G
    cnt = np.bincount(tile_group, minlength=n_groups)
    cnt_pad = np.maximum(
        (cnt + tiles_per_step - 1) // tiles_per_step, 1
    ) * tiles_per_step
    nt_pad = int(cnt_pad.sum())
    nt = vals_out.shape[0]
    if nt_pad != nt:
        ends = np.cumsum(cnt)
        ends_pad = np.cumsum(cnt_pad)
        src_pos = np.arange(nt) + (ends_pad - ends)[tile_group] - (
            cnt_pad - cnt
        )[tile_group]
        v = np.zeros((nt_pad, TILE_J, LANES), dtype=vals_out.dtype)
        s = np.zeros((nt_pad, TILE_J, LANES), dtype=np.int32)
        w = np.zeros(nt_pad, dtype=np.int64)
        cch = np.repeat(
            np.arange(n_groups, dtype=np.int32) * G, cnt_pad
        )
        v[src_pos] = vals_out
        s[src_pos] = src_tab
        w[src_pos] = w_row
        cch[src_pos] = base_chunk
        vals_out, src_tab, w_row, base_chunk = v, s, w, cch

    return LaneTiles(
        vals=vals_out,
        src_tab=src_tab,
        w_row=w_row.astype(np.int64),
        tile_chunk=base_chunk.astype(np.int32),
        n_chunks=n_chunks,
        n_rows_padded=scs.n_rows_padded,
        nnz=scs.nnz,
        n_spilled=n_spilled,
        tiles_per_step=tiles_per_step,
        chunks_per_group=G,
        window_rows=window_rows,
    )
