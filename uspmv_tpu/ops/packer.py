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
WINDOW = CHUNK_ROWS  # x entries per gather window
# tiles per pallas grid step: each chunk's tile count is padded to a
# multiple of this, so one grid step never straddles a chunk boundary —
# keeping conditionals out of the inner loop. Large steps amortize the
# ~100 ns per-step grid overhead (measured); auto-choice rounds the average
# tiles/chunk up to a power of two in [MIN_..MAX_TILES_PER_STEP].
MIN_TILES_PER_STEP = 4
MAX_TILES_PER_STEP = 16


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
    tiles_per_step: int = 4

    @property
    def n_tiles(self) -> int:
        return self.vals.shape[0]

    @property
    def fill(self) -> float:
        sz = self.vals.size
        return self.nnz / sz if sz else 1.0


def pack_lane_tiles(
    scs: ScsData, dtype=np.float32, tiles_per_step: int | None = None
) -> LaneTiles:
    if scs.C != CHUNK_ROWS:
        raise ValueError(
            f"lane-tile packing requires C={CHUNK_ROWS}, got C={scs.C}"
        )
    n_chunks = scs.n_chunks
    x_rows = max(scs.n_rows_padded // LANES, TILE_J)
    max_wrow = max(x_rows - TILE_J, 0)

    # --- base tiles: direct reshape of the flat SCS stream ---
    nt_base = scs.n_elements // CHUNK_ROWS
    assert nt_base * CHUNK_ROWS == scs.n_elements
    t_vals = scs.values.astype(dtype).reshape(nt_base, TILE_J, LANES)
    t_cols = scs.col_idxs.astype(np.int64).reshape(nt_base, TILE_J, LANES)
    # mark structural padding empty so it can't widen windows
    empty = scs.padding_mask().reshape(nt_base, TILE_J, LANES)
    t_cols = np.where(empty, -1, t_cols)
    lens = scs.chunk_lengths.astype(np.int64)
    base_chunk = np.repeat(np.arange(n_chunks, dtype=np.int32), lens)
    has_elem = t_cols >= 0

    # --- window per tile ---
    big = np.where(has_elem, t_cols, np.iinfo(np.int64).max)
    min_col = big.reshape(nt_base, -1).min(axis=1)
    min_col = np.where(min_col == np.iinfo(np.int64).max, 0, min_col)
    w_row = np.minimum(min_col // LANES, max_wrow).astype(np.int64)
    off = t_cols - (w_row * LANES)[:, None, None]
    in_window = has_elem & (off >= 0) & (off < WINDOW)

    lane = np.where(in_window, off & (LANES - 1), 0).astype(np.int64)
    sub = np.where(in_window, off >> 7, 0).astype(np.int64)

    # --- two-step-gather consistency: one sublane per (tile, i, lane) ---
    skey = (
        np.arange(nt_base)[:, None, None] * (TILE_J * LANES)
        + np.arange(TILE_J)[None, :, None] * LANES
        + lane
    )
    S_first = np.full(nt_base * TILE_J * LANES, -1, dtype=np.int64)
    flat_key = skey.reshape(-1)
    flat_sub = sub.reshape(-1)
    order = np.flatnonzero(in_window.reshape(-1))
    uniq, first_idx = np.unique(flat_key[order], return_index=True)
    S_first[uniq] = flat_sub[order[first_idx]]
    conflict = in_window.reshape(-1) & (S_first[flat_key] != flat_sub)
    conflict = conflict.reshape(nt_base, TILE_J, LANES)

    keep = in_window & ~conflict
    spill_mask = has_elem & ~keep

    sub_tab = np.zeros((nt_base, TILE_J, LANES), dtype=np.int32)
    lane_tab = np.zeros((nt_base, TILE_J, LANES), dtype=np.int32)
    ti, ii, ji = np.nonzero(keep)
    sub_tab[ti, ii, lane[ti, ii, ji]] = sub[ti, ii, ji].astype(np.int32)
    lane_tab[ti, ii, ji] = lane[ti, ii, ji].astype(np.int32)
    vals_out = np.where(keep, t_vals, 0).astype(dtype)

    # --- spill packing (greedy per chunk) ---
    n_spilled = int(spill_mask.sum())
    extra = {"vals": [], "sub": [], "lane": [], "w": [], "chunk": []}
    if n_spilled:
        sti, sii, sji = np.nonzero(spill_mask)
        s_chunk = base_chunk[sti]
        s_col = t_cols[sti, sii, sji]
        s_val = t_vals[sti, sii, sji]
        s_i, s_j = sii, sji  # fixed y slot (r>>7, r&127) of the row
        order = np.lexsort((s_col, s_chunk))
        for c in np.unique(s_chunk):
            sel = order[s_chunk[order] == c]
            _pack_spills(
                extra, int(c),
                s_col[sel], s_val[sel], s_i[sel], s_j[sel],
                max_wrow, dtype,
            )

    if extra["vals"]:
        vals_out = np.concatenate([vals_out, np.stack(extra["vals"])])
        sub_tab = np.concatenate([sub_tab, np.stack(extra["sub"])])
        lane_tab = np.concatenate([lane_tab, np.stack(extra["lane"])])
        w_row = np.concatenate([w_row, np.asarray(extra["w"], dtype=np.int64)])
        base_chunk = np.concatenate(
            [base_chunk, np.asarray(extra["chunk"], dtype=np.int32)]
        )

    # ensure every chunk owns >= 1 tile (empty chunks still need their y
    # block zeroed) — append an all-zero tile for chunks with no tiles
    present = np.zeros(n_chunks, dtype=bool)
    present[base_chunk] = True
    missing = np.flatnonzero(~present)
    if missing.size:
        z = np.zeros((missing.size, TILE_J, LANES), dtype=dtype)
        zi = np.zeros((missing.size, TILE_J, LANES), dtype=np.int32)
        vals_out = np.concatenate([vals_out, z])
        sub_tab = np.concatenate([sub_tab, zi])
        lane_tab = np.concatenate([lane_tab, zi])
        w_row = np.concatenate([w_row, np.zeros(missing.size, dtype=np.int64)])
        base_chunk = np.concatenate([base_chunk, missing.astype(np.int32)])

    reorder = np.argsort(base_chunk, kind="stable")
    vals_out = vals_out[reorder]
    src_tab = ((sub_tab.astype(np.int32) << 7) | lane_tab.astype(np.int32))[
        reorder
    ]
    w_row = w_row[reorder].astype(np.int32)
    base_chunk = base_chunk[reorder].astype(np.int32)

    # pad EVERY chunk's tile count to a multiple of tiles_per_step with
    # no-op tiles, so one grid step processes tiles of exactly one chunk
    # and the kernel's chunk bookkeeping happens once per step, not per
    # tile (measured: per-tile conditionals cost ~50 ns/tile)
    cnt = np.bincount(base_chunk, minlength=n_chunks)
    if tiles_per_step is None:
        avg = max(float(cnt.mean()), 1.0)
        tiles_per_step = int(
            min(
                MAX_TILES_PER_STEP,
                max(MIN_TILES_PER_STEP, 1 << int(np.ceil(np.log2(avg)))),
            )
        )
    cnt_pad = ((cnt + tiles_per_step - 1) // tiles_per_step) * tiles_per_step
    nt_pad = int(cnt_pad.sum())
    nt = vals_out.shape[0]
    if nt_pad != nt:
        ends = np.cumsum(cnt)
        ends_pad = np.cumsum(cnt_pad)
        # position of each original tile in the padded stream
        src_pos = np.arange(nt) + (ends_pad - ends)[base_chunk] - (
            cnt_pad - cnt
        )[base_chunk]
        v = np.zeros((nt_pad, TILE_J, LANES), dtype=dtype)
        s = np.zeros((nt_pad, TILE_J, LANES), dtype=np.int32)
        w = np.zeros(nt_pad, dtype=np.int32)
        c = np.repeat(
            np.arange(n_chunks, dtype=np.int32), cnt_pad
        )
        v[src_pos] = vals_out
        s[src_pos] = src_tab
        w[src_pos] = w_row
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
    )


def _pack_spills(extra, chunk, cols, vals, iis, jjs, max_wrow, dtype):
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
            if not (0 <= off < WINDOW) or t["occ"][i, j]:
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
