"""SpmvOperator — the kernel dispatch / execution object.

TPU-native re-design of the reference's ``SpmvKernel`` (classes_structs.hpp:
280-1166): owns the per-precision device matrices, selects the kernel
implementation from (format x precision x block size x backend), and exposes
a jitted ``spmv`` plus the x<->y swap used by solve mode. Distribution
(multi-shard) is layered on top in parallel/distributed.py.

Pipeline (reference init_local_structs, main.cpp:1074-1334):
  ingest COO -> [jacobi|equilibrate] -> [AP partition] -> convert_to_scs
  (shared permutation across precisions) -> symmetric column permutation ->
  device arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, dtype_for
from ..formats.coo import (
    MtxData,
    equilibrate_matrix,
    extract_matrix_min_mean_max,
    jacobi_scale_matrix,
    split_heavy_rows,
)
from ..formats.scs import (
    ScsData,
    convert_to_scs,
    convert_to_scs_retiled,
    permute_scs_cols,
)
from ..ops.device_format import DeviceScs, build_device_scs
from ..ops.spmv_xla import spmv_flat, spmv_tiled
from ..ops.vectors import from_device_layout, init_x_host, to_device_layout
from ..precision.partition import partition_precisions


def resolve_device(config: Config):
    """Pick the execution device.

    TPUs have no native f64 (and the axon plugin silently computes f64 as
    f32), so 'auto' places double-precision work on CPU — the reference's
    dp path maps to our CPU/jax-f64 validation path (SURVEY.md §7) — and
    everything else on the accelerator when present.

    Backend init is outage-hardened (runtime/backend.py): ``-backend
    cpu`` pins ``jax_platforms=cpu`` before the first device query so a
    down TPU tunnel can't hang the CPU path, and TPU/auto queries retry
    with backoff before raising BackendUnavailableError.
    """
    from .backend import devices_with_retry, pin_cpu

    if config.backend == "cpu":
        pin_cpu()
        return jax.devices("cpu")[0]
    if config.backend == "tpu":
        return devices_with_retry()[0]
    # auto
    needs_f64 = np.dtype(config.working_dtype()) == np.float64
    default = devices_with_retry()[0]
    if needs_f64 and not config.dp_emulation and default.platform != "cpu":
        return jax.devices("cpu")[0]
    return default


def use_lane_tiles(config: Config) -> bool:
    """Whether the Pallas lane-tile kernel applies.

    The kernel's physical chunk height is fixed at 1024 rows (8 sublanes x
    128 lanes). With ``config.retile`` (default), ANY logical (C, sigma) —
    CRS included — is re-packed into physical 1024-row chunks for
    execution while the logical format keeps defining the row permutation
    and the reported beta (formats.scs.convert_to_scs_retiled), so the
    reference's canonical ``-c 16 -s 512`` line runs at lane-tile speed
    instead of the scalarized XLA gather path. f64 still runs the CPU/XLA
    validation path (SURVEY.md §7) unless -dp_emu selects the df64 kernel.
    """
    from ..ops.packer import CHUNK_ROWS

    if not (config.use_pallas and config.impl == "auto"):
        return False
    if (np.dtype(config.working_dtype()) == np.float64
            and not config.dp_emulation):
        return False
    if config.kernel_format == "scs":
        return config.retile or config.chunk_size == CHUNK_ROWS
    return config.retile  # crs re-tiles through the same engine


# Probe alternative split thresholds below this fill. Gate deliberately
# conservative: measured on a v5e, splitting at fill ~0.5-0.6 (FemTet3D,
# StokesSaddle) is NEUTRAL end-to-end (fill gain ~ fold cost, within the
# tunnel's +-20% noise) while costing 60-80 s of probe time; below ~0.5
# (power-law tails) it wins 4-5x.
AUTOTUNE_FILL = 0.5


def _post_split_lengths(counts: np.ndarray, th: int) -> np.ndarray:
    """Exact row-length sequence after splitting at ``th``, in layout
    order: originals clamped to th, then each parent's virtual pieces
    ([th]*(k-2) full pieces + the remainder) in parent order. Remainders
    matter: counting them as full th (the old approximation) overstates
    the tile bound ~2x on block matrices whose rows are just over th
    (e.g. 27-nnz velocity rows at th=24 leave 3-element pieces, not 24)."""
    n_pieces = np.maximum((counts + th - 1) // th, 1)
    have_virt = n_pieces > 1
    reps = np.where(have_virt, n_pieces - 1, 0)
    tot = int(reps.sum())
    virt = np.full(tot, th, dtype=np.int64)
    if tot:
        ends = np.cumsum(reps[have_virt]) - 1
        rem = counts[have_virt] - th * (n_pieces[have_virt] - 1)
        virt[ends] = rem
    return np.concatenate([np.minimum(counts, th), virt])


# Per-virtual-row fold cost in tile-equivalents. The virtual-row fold is a
# scatter-add; XLA lowers TPU scatters to ~9 ns/index (measured 2.3 ms at
# 267k indices, sorted + hinted) versus ~11.7 ns/tile kernel streaming, so
# one virtual row "costs" about 0.75 tiles of runtime.
FOLD_TILE_EQUIV = 0.75


def _autotune_lane_split(mtx: MtxData, config: Config, C: int, sigma: int):
    """Pick (split_threshold, window_rows) for the lane-tile packer by
    MEASURED runtime proxy, not a model.

    The packed fill is bounded by avg_len/max_len per 1024-row chunk (a
    row of length L needs L distinct tiles), so heavy-tailed matrices want
    aggressive splitting — but splitting multiplies rows, costs a
    per-virtual-row fold after every SpMV, and its pieces can spill
    gather windows, so regular matrices (FEM blocks) want none. The
    tradeoff is structure-dependent; probing candidate thresholds with
    the real (native, fast) packer and minimizing

        cost = streamed_tiles + fold_cost(threshold)

    (both in units of kernel tile-time; throughput is stream-bound at
    ~11 ns/tile — measured 635 GB/s on fill 0.49 and 0.61 alike) is both
    simpler and more accurate than modeling the packing. Probes only run
    when the default pack lands below AUTOTUNE_FILL, so regular matrices
    pay one pack.
    """
    from ..formats.scs import permute_scs_cols
    from ..ops.packer import (
        pack_lane_tiles,
        pack_with_window_retry,
        resolve_chunks_per_group,
    )

    mean = max(mtx.nnz // max(mtx.n_rows, 1), 1)
    default_th = int(min(max(4 * mean, 32), 1024))
    eff_bs = (config.block_vec_size
              if config.vector_layout == "rowwise" else 1)
    counts = np.bincount(mtx.I, minlength=mtx.n_rows).astype(np.int64)
    n_real = mtx.n_rows

    def fold_cost(th, n_virtual):
        """Tile-equivalents the per-SpMV fold will cost at this threshold.
        sigma=1 gets the vectorized fold (±1 lane-tile matrix + prefix
        matmul: ~2 tiles/chunk of real rows + ~1 tile-equiv per 1024
        virtual rows + launch overhead); otherwise the XLA scatter at
        FOLD_TILE_EQUIV per virtual row."""
        if n_virtual == 0:
            return 0.0
        max_run = int(-(-counts.max() // th)) - 1
        if sigma == 1 and max_run < 1024:
            return (2.0 * -(-n_real // 1024)
                    + n_virtual / 1024.0 + 64.0)
        return FOLD_TILE_EQUIV * n_virtual

    def cost_lower_bound(th):
        """Exact spill-free tile count after splitting at th (chunk maxes
        over the post-split length sequence), in O(n) — prunes hopeless
        probes without paying their conversion (a no-split probe on a
        1308-max-row matrix would otherwise convert 400M padded
        elements)."""
        lens2 = _post_split_lengths(counts, th)
        n_virtual = lens2.size - counts.size
        n_pad = ((lens2.size + C - 1) // C) * C
        lens2 = np.pad(lens2, (0, n_pad - lens2.size))
        tiles = int(lens2.reshape(-1, C).max(axis=1).sum())
        return tiles + fold_cost(th, n_virtual)

    def probe(th):
        m2, _parent = split_heavy_rows(mtx, th)
        n_virtual = m2.n_rows - mtx.n_rows
        scs = convert_to_scs(m2.astype(np.float32), C, sigma)
        fp = np.arange(scs.n_rows_padded, dtype=np.int32)
        fp[: scs.n_rows] = scs.old_to_new_idx
        permute_scs_cols(scs, fp)
        cpg = resolve_chunks_per_group(scs.n_rows_padded // C, eff_bs)
        lt = pack_with_window_retry(
            lambda wr: pack_lane_tiles(
                scs, chunks_per_group=cpg, window_rows=wr
            )
        )
        cost = lt.n_tiles + fold_cost(th, n_virtual)
        return cost, lt.fill, th, lt.window_rows

    best = probe(default_th)
    if best[1] < AUTOTUNE_FILL:
        for th in sorted({max(mean, 2), max(2 * mean, 4),
                          max(8 * mean, 16), 1024} - {default_th}):
            if cost_lower_bound(th) > 0.7 * best[0]:
                # a candidate must promise >= 30% improvement even
                # spill-free before we pay its probe: splitting pieces
                # routinely spill part of the promise away, and each probe
                # costs a full convert+pack of the matrix
                continue
            cand = probe(th)
            if cand[0] < best[0] * 0.95:
                best = cand
    return best[2], best[3]


def analytic_split_threshold(mtx: MtxData, C: int) -> Optional[int]:
    """Pick a heavy-row split threshold WITHOUT packing probes, from the
    row-length histogram alone: minimize the spill-free tile bound
    tiles(th) + vectorized-fold cost (see _autotune_lane_split, which
    additionally probes spills — this cheap variant serves the distributed
    path, where probing R shards is too expensive). Returns None when no
    candidate promises >= 30% over the 4*mean default (splitting pieces
    routinely spill part of the promise away)."""
    counts = np.bincount(mtx.I, minlength=mtx.n_rows).astype(np.int64)
    if counts.size == 0:
        return None
    mean = max(int(counts.mean()), 1)
    default_th = int(min(max(4 * mean, 32), 1024))

    def bound(th):
        lens2 = _post_split_lengths(counts, th)
        nv = lens2.size - counts.size
        n_pad = ((lens2.size + C - 1) // C) * C
        lens2 = np.pad(lens2, (0, n_pad - lens2.size))
        tiles = int(lens2.reshape(-1, C).max(axis=1).sum())
        fold = 0.0 if nv == 0 else (
            2.0 * -(-counts.size // 1024) + nv / 1024.0 + 64.0
        )
        return tiles + fold

    b0 = bound(default_th)
    best_th, best_b = default_th, b0
    for th in sorted({max(mean, 2), max(2 * mean, 4), max(8 * mean, 16)}
                     - {default_th}):
        b = bound(th)
        if b < best_b:
            best_th, best_b = th, b
    if best_th != default_th and best_b < 0.7 * b0:
        return best_th
    return None


def block_prefix_sums(partials, region: int):
    """Inclusive prefix sums within each 1024-entry block of the virtual
    region, as TWO plain triangular matmuls: a (nb*8, 128) x (128, 128)
    intra-row prefix and an (nb, 8) x (8, 8) strictly-lower carry across
    sublane rows. 8x fewer flops than one 1024-wide triangular matmul
    (which measured ~64 us at V=800k) and — measured — lowered better
    than the batched-einsum + cumsum formulation (banded-500k end-to-end:
    85.3 vs 51 GFLOP/s). HIGHEST precision keeps f32 semantics on the
    MXU. Supports trailing block-vector dims."""
    nb = region // 1024
    rest = partials.shape[1:]
    io = jnp.arange(128)
    U = (io[:, None] <= io[None, :]).astype(partials.dtype)
    io8 = jnp.arange(8)
    S = (io8[:, None] < io8[None, :]).astype(partials.dtype)
    if rest:
        flat = partials.reshape((nb * 8, 128) + rest)
        cs1 = jnp.einsum(
            "rjb,jk->rkb", flat, U, precision=jax.lax.Precision.HIGHEST
        )
        rowtot = cs1[:, -1, :].reshape((nb, 8) + rest)
        carry = jnp.einsum(
            "njb,jk->nkb", rowtot, S, precision=jax.lax.Precision.HIGHEST
        )
        return (cs1.reshape((nb, 8, 128) + rest)
                + carry[:, :, None]).reshape((region,) + rest)
    flat = partials.reshape(nb * 8, 128)
    cs1 = jnp.matmul(flat, U, precision=jax.lax.Precision.HIGHEST)
    rowtot = cs1[:, -1].reshape(nb, 8)
    carry = jnp.matmul(rowtot, S, precision=jax.lax.Precision.HIGHEST)
    return (cs1.reshape(nb, 8, 128) + carry[:, :, None]).reshape(-1)


def _build_fold_dev(fold_idx, n_rows_padded, device, block_vec_size=1):
    """Lane-tile device struct for the VECTORIZED virtual-row fold.

    With block-aligned virtual rows (formats.coo.align_split_rows), the
    per-parent fold is ``y[p] += cs[e_p] - cs[s_p]`` over block-local
    inclusive prefix sums cs of the virtual partials — i.e. an SpMV by a
    ±1 matrix with <= 2 nnz/row. e/s are monotone in p, so the matrix
    packs at near-full fill with near-perfect gather windows, and the fold
    costs ~2 tiles/chunk of kernel streaming instead of the ~9 ns/index
    XLA TPU scatter (which at 100k+ virtual rows costs more than the
    whole SpMV). Rows without pieces are simply absent. Returns None when
    the fold matrix itself exceeds a lane-tile budget (the caller keeps
    the scatter fold)."""
    from ..ops.packer import CHUNK_ROWS
    from ..ops.pallas_scs import LaneTileBudgetError, build_device_lane_tiles

    e, s, region_len = fold_idx
    q = np.flatnonzero(e != s)
    if q.size == 0:
        return None
    rows = np.repeat(q.astype(np.int64), 2)
    cols = np.stack([s[q], e[q]], axis=1).reshape(-1).astype(np.int64)
    vals = np.tile(np.array([-1.0, 1.0]), q.size)
    F = MtxData.from_arrays(
        rows, cols, vals, n_rows=n_rows_padded, n_cols=region_len
    )
    scs_f = convert_to_scs(F.astype(np.float32), CHUNK_ROWS, 1)
    try:
        return build_device_lane_tiles(
            scs_f, dtype=np.float32, device=device, x_len=region_len,
            block_vec_size=block_vec_size,
        )
    except LaneTileBudgetError:
        return None


# Engage mixed-chunk tiles below this estimated per-chunk window fill:
# chunk-local packing cannot beat chunk_nnz * window / col_span, so when
# that bound is hopeless (random columns) the regular packer would grind
# through millions of spills only to blow the SMEM tile budget
MIXED_EST_CUTOFF = 0.10


def _window_fill_estimate(
    mtx: MtxData, window: int = 32 * 128, sample: int = 16
) -> float:
    """Upper-bound estimate of the chunk-local lane-tile fill: per sampled
    1024-row block, nnz / (windows-spanned * 1024) with the span taken as
    the P5-P95 column range (outliers spill anyway)."""
    n_blocks = max(mtx.n_rows // 1024, 1)
    step = max(n_blocks // sample, 1)
    counts = np.bincount(mtx.I // 1024, minlength=n_blocks)
    starts = np.concatenate(([0], np.cumsum(counts)))  # row-sorted COO
    ests = []
    for b in range(0, n_blocks, step):
        lo, hi = int(starts[b]), int(starts[min(b + 1, n_blocks)])
        if hi - lo < 32:
            continue
        cols = mtx.J[lo:hi]
        p5, p95 = np.percentile(cols, [5, 95])
        span = max(float(p95 - p5), 1.0)
        windows = max(span / window, 1.0)
        ests.append((hi - lo) / (windows * 1024.0))
    return float(np.median(ests)) if ests else 1.0


MAX_SCS_EXPANSION = 16.0  # n_elements / nnz beyond which SCS is refused


def _guard_scs_explosion(mtx: MtxData, C: int, sigma: int):
    """Estimate SCS padding before converting; degrade to CRS when the
    chosen (C, sigma) would explode (e.g. power-law rows at C=1024: one
    17k-nnz row inflates its whole 1024-row chunk to 17M elements). The
    reference would happily allocate the padding (its sigma exists to fix
    this); we refuse to hang and fall back with a warning."""
    if C <= 1 or mtx.nnz == 0:
        return C, sigma
    counts = np.bincount(mtx.I, minlength=mtx.n_rows).astype(np.int64)
    n_pad = ((mtx.n_rows + C - 1) // C) * C
    counts = np.pad(counts, (0, n_pad - counts.size))
    if sigma > 1:
        # sigma-window descending sort, window-aligned like the converter
        # (vectorized: pad to a multiple of sigma and sort each window row)
        n_sig = ((n_pad + sigma - 1) // sigma) * sigma
        w = np.pad(counts, (0, n_sig - counts.size)).reshape(-1, sigma)
        counts = -np.sort(-w, axis=1).reshape(-1)[:n_pad]
    est = int(counts.reshape(-1, C).max(axis=1).sum()) * C
    if est > mtx.nnz * MAX_SCS_EXPANSION and est > (1 << 24):
        import warnings

        warnings.warn(
            f"SCS with C={C}, sigma={sigma} would pad {mtx.nnz} nonzeros to "
            f"{est} elements ({est / mtx.nnz:.0f}x); falling back to CRS. "
            "Increase sigma (row sorting) or use a smaller C for this "
            "matrix.",
            stacklevel=3,
        )
        return 1, 1
    return C, sigma


def _impl_for(config: Config, device=None):
    """Kernel implementation selection (reference SpmvKernel ctor decision
    tree, classes_structs.hpp:435-688, collapsed: XLA/Pallas tiling replaces
    the templated-C dispatch).

    The Mosaic-vs-interpret decision keys on the operator's actual device,
    not the process default (the axon TPU plugin force-prepends itself over
    JAX_PLATFORMS, so a CPU-placed operator can coexist with a visible TPU).
    """
    if use_lane_tiles(config):
        import functools

        from ..ops.pallas_scs import spmv_pallas

        interpret = None if device is None else (device.platform != "tpu")
        return functools.partial(spmv_pallas, interpret=interpret)
    if config.kernel_format == "crs":
        return spmv_flat
    return spmv_tiled


@dataclasses.dataclass
class SpmvOperator:
    config: Config
    n_rows: int
    n_rows_padded: int
    scs: Dict[str, ScsData]  # host structs per precision
    devs: Dict[str, DeviceScs]  # device structs per precision
    old_to_new: np.ndarray
    matrix_stats: tuple
    nnz: int
    n_dropped: int = 0
    jacobi_diag: Optional[np.ndarray] = None
    equilib: Optional[tuple] = None
    device: Optional[object] = None
    # re-tiling engine: the user's logical (C, sigma) beta values when the
    # matrix executes as physical 1024-row lane-tile chunks
    logical_beta: Optional[Dict[str, float]] = None
    retiled: bool = False
    # rowwise SpMMV RHS grouping: when > 0 and < block_vec_size, the spmv
    # closure processes the RHS in column groups of this width (the full
    # block blew the kernel's VMEM budget)
    rhs_group: int = 0
    # heavy-row splitting: (virtual_pos, parent_pos) in permuted row space;
    # each SpMV adds y[virtual_pos] into y[parent_pos] (scatter fold —
    # the fallback when the vectorized fold below is unavailable)
    split_plan: Optional[tuple] = None
    # vectorized fold (lane-tile path, sigma=1): prefix-sum the virtual
    # region on the MXU, then apply the ±1 difference matrix
    fold_dev: Optional[object] = None
    fold_region: int = 0
    _jit_spmv: Optional[object] = None

    # ----------------------------------------------------------------- build

    @classmethod
    def from_mtx(cls, config: Config, mtx: MtxData) -> "SpmvOperator":
        config.validate()
        if config.value_type == "ap[dp_sp_hp]" and use_lane_tiles(config):
            import warnings

            warnings.warn(
                "ap[dp_sp_hp] measured DOMINATED by ap[dp_sp] on the v5e "
                "at every tested threshold (WideSpectrum-40: 58.5 vs 65.2 "
                "and 78.3 vs 99.8 GFLOP/s at equal-or-worse accuracy, "
                "ap_bench.jsonl round 5): under the shared row "
                "permutation each extra partition loses lane-tile fill "
                "(0.73 -> ~0.60) and adds a kernel launch, eating the "
                "2-byte hp stream's bandwidth win. Prefer ap[dp_sp] "
                "(accuracy) or ap[sp_hp] (speed); the 3-way mode remains "
                "for reference parity (utilities.hpp:3042-3121).",
                stacklevel=2,
            )
        mtx = mtx.copy()
        if not mtx.is_sorted:
            mtx = mtx.sort_by_row()
        stats = extract_matrix_min_mean_max(mtx)

        jac = None
        if config.jacobi_scale:
            jac = jacobi_scale_matrix(mtx)
        equilib = None
        lr = lc = None
        if config.equilibrate:
            lr, lc = equilibrate_matrix(mtx)
            equilib = (lr, lc)

        from ..ops.packer import CHUNK_ROWS

        C_log = config.chunk_size if config.kernel_format == "scs" else 1
        sigma_log = config.sigma if config.kernel_format == "scs" else 1
        # re-tiling engine: the user's (C, sigma) stays the LOGICAL format
        # (row order + reported beta); execution packs physical 1024-row
        # chunks in whichever row order packs tighter
        # (convert_to_scs_retiled). sigma > 1 at C=1024 routes through it
        # too, so a sigma sort that only scrambles the gather windows is
        # not executed.
        retiled = use_lane_tiles(config) and (
            C_log != CHUNK_ROWS or sigma_log != 1
        )
        C = CHUNK_ROWS if retiled else C_log
        sigma = sigma_log

        # heavy-row splitting (after scaling, which is per ORIGINAL row;
        # before conversion, whose padding it is there to bound)
        n_real = mtx.n_rows
        split_parent = None
        tuned_window_rows = None
        fold_idx = None
        virt_ids = None
        # df64 accumulates (hi, lo) pairs; the scatter/vectorized folds
        # would renormalize incorrectly, so splitting is off under -dp_emu
        # zero-column-locality detection: when chunk-local window fill is
        # hopeless (random/power-law columns), skip the regular packer's
        # split probes (they grind through millions of spills) and build
        # mixed-chunk tiles instead
        use_mixed = False
        if (use_lane_tiles(config) and not config.is_ap
                and not config.dp_emulation):
            if config.mixed_tiles is not None:
                use_mixed = bool(config.mixed_tiles)
            else:
                use_mixed = (
                    _window_fill_estimate(mtx) < MIXED_EST_CUTOFF
                )
        # zero-locality tier 1: the 3-pass transpose-stream mode with its
        # own LOAD-BALANCING row permutation (chunk loads even out so the
        # phase-1 cell padding stays tight; heavy rows are handled by the
        # B' split inside the mode, so no pre-splitting here). Falls
        # through to the split + mixed-tile tier on any budget refusal.
        if (use_mixed and config.block_vec_size == 1
                and config.split_rows_threshold >= 0):
            op = cls._try_tstream(
                config, mtx, stats, jac, equilib, C_log, sigma_log, n_real
            )
            if op is not None:
                gate_err = op.compile_gate()
                if gate_err is not None and any(
                    type(getattr(d, "p1", None)).__name__
                    == "DeviceProductTilesT"
                    for d in op.devs.values()
                ):
                    # the FUSED phase-1+2 kernel failed to lower: retry
                    # the tier with the unfused phase 1 + XLA transpose
                    # (the round-3 measured configuration) before giving
                    # up a ~3x-over-mixed mode
                    import warnings

                    warnings.warn(
                        "fused transpose-stream kernel failed to compile "
                        f"({gate_err}); retrying unfused",
                        stacklevel=2,
                    )
                    op = cls._try_tstream(
                        config, mtx, stats, jac, equilib, C_log,
                        sigma_log, n_real, fused=False,
                    )
                    gate_err = op.compile_gate() if op is not None else (
                        "unfused tstream build refused"
                    )
                if gate_err is None:
                    return op
                import warnings

                warnings.warn(
                    "transpose-stream tier failed to compile on this "
                    f"backend ({gate_err}); degrading to mixed tiles",
                    stacklevel=2,
                )
        if (C > 1 and config.split_rows_threshold >= 0
                and not config.dp_emulation):
            th = config.split_rows_threshold
            if th == 0:
                if (use_lane_tiles(config) and not config.is_ap
                        and not use_mixed):
                    th, tuned_window_rows = _autotune_lane_split(
                        mtx, config, C, sigma
                    )
                else:
                    mean = max(mtx.nnz // max(mtx.n_rows, 1), 1)
                    th = int(min(max(4 * mean, 32), 1024))
            mtx, split_parent = split_heavy_rows(mtx, th)
            if split_parent is not None:
                virt_ids = np.arange(n_real, mtx.n_rows, dtype=np.int64)
                if use_lane_tiles(config) and sigma == 1:
                    # vectorized fold layout (block-aligned virtual rows;
                    # needs the identity permutation sigma=1 gives)
                    from ..formats.coo import align_split_rows

                    try:
                        (mtx, e_idx, s_idx, region_len, virt_ids,
                         split_parent) = align_split_rows(
                            mtx, n_real, split_parent
                        )
                        fold_idx = (e_idx, s_idx, region_len)
                    except ValueError:
                        pass  # a parent with >= 1024 pieces: scatter fold
        C, sigma = _guard_scs_explosion(mtx, C, sigma)
        retiled = retiled and C == CHUNK_ROWS

        n_dropped = 0
        scs: Dict[str, ScsData] = {}
        logical_beta: Optional[Dict[str, float]] = None
        if config.is_ap:
            subs, n_dropped = partition_precisions(
                mtx,
                config.value_type,
                config.ap_threshold_1,
                config.ap_threshold_2,
                equilibrate=config.equilibrate,
                largest_row_elems=lr,
                largest_col_elems=lc,
                dropout=config.dropout,
                dropout_threshold=config.dropout_threshold,
            )
            # highest precision defines the permutation; the rest reuse it
            # (reference main.cpp:1170-1221)
            precs = list(subs)
            if retiled:
                primary, lperm, le0 = convert_to_scs_retiled(
                    subs[precs[0]], C_log, sigma_log
                )
                scs[precs[0]] = primary
                logical_beta = {
                    precs[0]: subs[precs[0]].nnz / le0 if le0 else 1.0
                }
                for p in precs[1:]:
                    scs[p], _, le = convert_to_scs_retiled(
                        subs[p], C_log, sigma_log,
                        fixed_logical_perm=lperm,
                    )
                    logical_beta[p] = subs[p].nnz / le if le else 1.0
            else:
                primary = convert_to_scs(subs[precs[0]], C, sigma)
                scs[precs[0]] = primary
                for p in precs[1:]:
                    scs[p] = convert_to_scs(
                        subs[p], C, sigma,
                        fixed_permutation=primary.old_to_new_idx,
                    )
        else:
            prec = config.value_type
            if retiled:
                scs[prec], _, le = convert_to_scs_retiled(
                    mtx, C_log, sigma_log, dtype=dtype_for(prec)
                )
                logical_beta = {prec: mtx.nnz / le if le else 1.0}
            else:
                scs[prec] = convert_to_scs(
                    mtx.astype(dtype_for(prec)), C, sigma
                )

        primary = next(iter(scs.values()))
        old_to_new = primary.old_to_new_idx
        split_plan = None
        if split_parent is not None:
            split_plan = (
                old_to_new[virt_ids],
                old_to_new[split_parent],
            )
        # symmetric column permutation so x can live in permuted order
        # (reference main.cpp:1308 -> permute_scs_cols)
        full_perm = np.arange(primary.n_rows_padded, dtype=np.int32)
        full_perm[: primary.n_rows] = old_to_new
        for s in scs.values():
            permute_scs_cols(s, full_perm)

        device = resolve_device(config)
        from ..ops.pallas_scs import MAX_META_TILES

        devs = None
        rhs_group = 0
        if use_lane_tiles(config) and primary.C == CHUNK_ROWS and (
            max(s.n_elements for s in scs.values()) // CHUNK_ROWS
            <= MAX_META_TILES
        ):
            from ..ops.packer import resolve_chunks_per_group
            from ..ops.pallas_scs import build_device_lane_tiles

            # colwise SpMMV is vmapped per vector: one RHS resident at a
            # time, so VMEM budgets use the effective per-launch bs
            eff_bs = (config.block_vec_size
                      if config.vector_layout == "rowwise" else 1)
            cpg = resolve_chunks_per_group(
                primary.n_rows_padded // CHUNK_ROWS, eff_bs
            )
            from ..ops.pallas_scs import (
                LaneTileBudgetError,
                build_device_mixed_tiles,
            )

            def _build_mixed():
                # masked mixed tiles (the transpose-stream tier is tried
                # earlier in from_mtx with its own load-balancing row
                # permutation; this is the fallback tier)
                return {
                    p: build_device_mixed_tiles(
                        s, dtype=dtype_for(p), device=device,
                        chunks_per_group=cpg, block_vec_size=eff_bs,
                    )
                    for p, s in scs.items()
                }

            if use_mixed:
                try:
                    devs = _build_mixed()
                except LaneTileBudgetError:
                    devs = None  # fall through to the regular packer
            if devs is None:
                g = eff_bs
                while devs is None:
                    try:
                        cpg_g = resolve_chunks_per_group(
                            primary.n_rows_padded // CHUNK_ROWS, g
                        )
                        devs = {
                            # values stream in the precision's own dtype
                            # (hp = bfloat16, the _Float16 analogue); the
                            # kernel accumulates in f32 like the
                            # reference's AP kernels. x beyond the VMEM
                            # budget switches to per-group HBM->VMEM
                            # windows automatically (x_window auto)
                            p: build_device_lane_tiles(
                                s, dtype=dtype_for(p), device=device,
                                chunks_per_group=cpg_g,
                                block_vec_size=g,
                                window_rows=tuned_window_rows,
                            )
                            for p, s in scs.items()
                        }
                        if g != eff_bs:
                            # RHS column grouping: the full block vector
                            # blew the VMEM budget (measured: rowwise
                            # bs=32 on Laplace3D-96 fell to XLA at 5.2
                            # GFLOP/s where two bs=16 passes run at ~197
                            # each); the closure runs ceil(bs/g) passes of
                            # g columns over one matrix stream each.
                            # Reference contract: arbitrary
                            # block_vec_size, kernels.hpp:306-551.
                            rhs_group = g
                            import warnings

                            warnings.warn(
                                f"block vector bs={eff_bs} exceeds the "
                                f"VMEM budget; processing the RHS in "
                                f"{-(-eff_bs // g)} groups of {g} columns",
                                stacklevel=2,
                            )
                    except Exception as e:
                        if not isinstance(e, LaneTileBudgetError):
                            raise
                        if g > 1:
                            g //= 2
                            continue
                        if (not use_mixed and not config.is_ap
                                and not config.dp_emulation
                                and config.mixed_tiles is not False):
                            # second chance: a spill blow-up IS the
                            # zero-locality signature the estimator missed
                            try:
                                devs = _build_mixed()
                            except LaneTileBudgetError:
                                devs = None
                        else:
                            devs = None
                        if devs is None:
                            import warnings

                            warnings.warn(
                                f"lane-tile kernel unavailable ({e}); "
                                "falling back to the XLA SpMV path "
                                "(expect lower throughput)",
                                stacklevel=2,
                            )
                        break
        fold_dev = None
        if devs is not None and fold_idx is not None:
            from ..ops.pallas_scs import DeviceLaneTiles, DeviceMixedTiles
            from .tstream import TStreamDev

            if all(isinstance(d,
                              (DeviceLaneTiles, DeviceMixedTiles,
                               TStreamDev))
                   for d in devs.values()):
                fold_dev = _build_fold_dev(
                    fold_idx, primary.n_rows_padded, device,
                    block_vec_size=(
                        (rhs_group or config.block_vec_size)
                        if config.vector_layout == "rowwise" else 1
                    ),
                )
        pallas_tier = devs is not None
        if devs is None:
            if config.dp_emulation and device.platform != "cpu":
                # the XLA fallback would run f64 as f32 on the axon TPU;
                # honest dp means CPU when the df64 kernel can't build
                device = jax.devices("cpu")[0]
            devs = {
                p: build_device_scs(
                    s, tile_elems=config.tile_elems, device=device
                )
                for p, s in scs.items()
            }
        op = cls(
            config=config,
            n_rows=n_real,
            n_rows_padded=primary.n_rows_padded,
            scs=scs,
            devs=devs,
            old_to_new=old_to_new[:n_real],
            matrix_stats=stats,
            split_plan=split_plan,
            fold_dev=fold_dev,
            fold_region=(fold_idx[2] if fold_idx is not None else 0),
            nnz=mtx.nnz,
            n_dropped=n_dropped,
            jacobi_diag=jac,
            equilib=equilib,
            device=device,
            logical_beta=logical_beta,
            retiled=retiled,
            rhs_group=rhs_group,
        )
        if pallas_tier:
            gate_err = op.compile_gate()
            if gate_err is not None:
                # the last Pallas tier failed to lower/compile: degrade to
                # the XLA path (always lowers) like the reference's
                # always-runs CRS — slow beats broken
                import dataclasses as _dc
                import warnings

                warnings.warn(
                    "Pallas kernel tier failed to compile on this backend "
                    f"({gate_err}); degrading to the XLA SpMV path "
                    "(expect much lower throughput)",
                    stacklevel=2,
                )
                xdev = device
                if config.dp_emulation and device.platform != "cpu":
                    xdev = jax.devices("cpu")[0]
                op = _dc.replace(
                    op,
                    devs={
                        p: build_device_scs(
                            s, tile_elems=config.tile_elems, device=xdev
                        )
                        for p, s in scs.items()
                    },
                    fold_dev=None,
                    fold_region=0,
                    device=xdev,
                    _jit_spmv=None,
                )
        return op

    @classmethod
    def _try_tstream(cls, config, mtx, stats, jac, equilib, C_log,
                     sigma_log, n_real, fused=None):
        """Build the 3-pass transpose-stream operator (runtime/tstream.py)
        with a LOAD-BALANCING row permutation: rows dealt round-robin by
        descending nnz so every 1024-chunk carries ~equal load — the
        phase-1 cell capacity is a single global constant, so uneven
        chunks would inflate the padded product grid (measured: pareto
        row clustering pushed the cell cap 4x over the mean and spilled
        10% of the elements). Returns None when any budget refuses."""
        from ..formats.scs import logical_elements, sigma_window_perm
        from ..ops.packer import CHUNK_ROWS, LANES
        from ..ops.pallas_scs import LaneTileBudgetError
        from .tstream import build_tstream

        prec = config.value_type
        split_plan = None
        n_orig = mtx.n_rows
        counts_orig = np.bincount(mtx.I, minlength=n_orig).astype(np.int64)

        # hub-column peel (VERDICT r3 item 3b): power-law hub columns
        # overflow phase-1's capped cells and used to disqualify the
        # whole mode (spill gate). Peel the heaviest columns into their
        # own lane-tile term whose x values gather into ONE compact
        # VMEM window (perfect column locality by construction); the
        # residual then passes the 3-pass gates. Reference requirement:
        # CRS graceful degradation on scattered columns
        # (kernels.hpp:22-63); the mechanism is TPU-first.
        # defaults swept on a v5e (BASELINE.md round 5 hub sweep); env
        # overrides exist for re-tuning on other chips
        import os as _os

        HUB_MAX_COLS = int(_os.environ.get("USPMV_HUB_MAX_COLS", 4096))
        HUB_MIN_FRAC = float(_os.environ.get("USPMV_HUB_MIN_FRAC", 0.04))
        HUB_MULT = float(_os.environ.get("USPMV_HUB_MULT", 8))
        counts_col = np.bincount(mtx.J, minlength=mtx.n_cols)
        mean_c = max(mtx.nnz / max(mtx.n_cols, 1), 1.0)
        cand = np.flatnonzero(counts_col > HUB_MULT * mean_c)
        hub_cols = None
        if cand.size:
            cand = cand[np.argsort(-counts_col[cand], kind="stable")]
            cand = cand[:HUB_MAX_COLS]
            if counts_col[cand].sum() >= HUB_MIN_FRAC * mtx.nnz:
                hub_cols = np.sort(cand)
        hub_coo = None
        if hub_cols is not None:
            rank = np.full(mtx.n_cols, -1, dtype=np.int64)
            rank[hub_cols] = np.arange(hub_cols.size, dtype=np.int64)
            hmask = rank[mtx.J] >= 0
            if hmask.all():  # degenerate: everything is hub -> no peel
                hub_cols = None
            else:
                hub_coo = (mtx.I[hmask], rank[mtx.J[hmask]],
                           mtx.values[hmask])
                mtx = MtxData.from_arrays(
                    mtx.I[~hmask], mtx.J[~hmask], mtx.values[~hmask],
                    n_rows=mtx.n_rows, n_cols=mtx.n_cols,
                ).sort_by_row()

        # cap EXTREME rows first: a monster row's elements concentrate in
        # ONE chunk's cells and inflate the global cell capacity (the
        # B' fold also supports <= 1023 pieces of 8 per row); the few
        # virtual rows fold by a tiny scatter-add afterwards
        mtx, sp_parent = split_heavy_rows(mtx, 2048)
        counts = np.bincount(mtx.I, minlength=mtx.n_rows).astype(np.int64)
        nch = (mtx.n_rows + CHUNK_ROWS - 1) // CHUNK_ROWS
        n_pad = nch * CHUNK_ROWS
        cpad = np.zeros(n_pad, dtype=np.int64)
        cpad[: mtx.n_rows] = counts
        order = np.argsort(-cpad, kind="stable")
        bperm = np.empty(n_pad, dtype=np.int32)
        i = np.arange(n_pad, dtype=np.int64)
        bperm[order] = ((i % nch) * CHUNK_ROWS + i // nch).astype(np.int32)

        # symmetric column permutation composed at the COO level (O(nnz))
        # instead of permute_scs_cols on the padded SCS, whose element
        # array is ~100-400x nnz here (measured 22.8 s at 200k rows)
        m_perm = MtxData.from_arrays(
            mtx.I, bperm[mtx.J], mtx.values,
            n_rows=mtx.n_rows, n_cols=n_pad, is_sorted=True,
        )
        # CompactScs: the padded SCS extent under the balance perm
        # reaches ~120x nnz on pareto rows (448M elements at 500k) and
        # materializing it cost ~560 s of the 644 s build (round-5
        # profile); the compact form carries the same semantics
        from ..formats.scs import convert_to_scs_compact

        scs_t = convert_to_scs_compact(
            m_perm, CHUNK_ROWS, bperm, dtype=dtype_for(prec)
        )
        device = resolve_device(config)
        try:
            ts = build_tstream(scs_t, dtype=dtype_for(prec), device=device,
                               fused=fused)
        except LaneTileBudgetError:
            return None
        nnz_total = mtx.nnz
        if hub_coo is not None:
            import dataclasses as _dc

            from ..ops.pallas_scs import build_device_lane_tiles

            hI, hJ, hV = hub_coo
            K_pad = ((hub_cols.size + LANES - 1) // LANES) * LANES
            hub_mtx = MtxData.from_arrays(
                hI, hJ, hV, n_rows=mtx.n_rows, n_cols=K_pad
            ).sort_by_row()
            scs_h = convert_to_scs(
                hub_mtx.astype(dtype_for(prec)), CHUNK_ROWS, 1,
                fixed_permutation=bperm,
            )
            try:
                hub_dev = build_device_lane_tiles(
                    scs_h, dtype=dtype_for(prec), device=device,
                    x_len=K_pad, window_rows=32,
                )
            except LaneTileBudgetError:
                return None
            pos = np.zeros(K_pad, dtype=np.int32)
            pos[: hub_cols.size] = bperm[hub_cols]
            hub_pos = jnp.asarray(pos)
            if device is not None:
                hub_pos = jax.device_put(hub_pos, device)
            ts = _dc.replace(
                ts, hub=hub_dev, hub_pos=hub_pos,
                nnz=ts.nnz + hub_mtx.nnz,
            )
            nnz_total += hub_mtx.nnz
        # logical (user C, sigma) beta is format accounting, independent
        # of the execution permutation
        if sp_parent is not None:
            virt_ids = np.arange(n_orig, mtx.n_rows, dtype=np.int64)
            split_plan = (
                bperm[virt_ids].astype(np.int64),
                bperm[sp_parent].astype(np.int64),
            )
        # logical beta reflects the UNsplit user format
        lperm, _lpad = sigma_window_perm(
            counts_orig, n_orig, C_log, sigma_log
        )
        le = logical_elements(counts_orig, lperm, C_log)
        return cls(
            config=config,
            n_rows=n_real,
            n_rows_padded=scs_t.n_rows_padded,
            scs={prec: scs_t},
            devs={prec: ts},
            old_to_new=bperm[:n_real],
            matrix_stats=stats,
            nnz=nnz_total,
            split_plan=split_plan,
            jacobi_diag=jac,
            equilib=equilib,
            device=device,
            logical_beta={prec: nnz_total / le if le else 1.0},
            retiled=(C_log != CHUNK_ROWS),
        )

    # ------------------------------------------------------------- execution

    @property
    def working_dtype(self):
        return self.config.working_dtype()

    @property
    def kernel_args(self):
        return {"devs": self.devs, "fold": self.fold_dev}

    def build_spmv_closure(self):
        """The unjitted spmv function ``fn(kernel_args, x)`` (precisions
        summed for AP, colwise layouts vmapped per vector).

        IMPORTANT: device arrays must flow in as ARGUMENTS, never as closure
        captures — jit embeds captured arrays as constants, which the axon
        TPU tunnel re-uploads on every execution (measured 500x slowdown).
        """
        impl = _impl_for(self.config, self.device)
        layout = self.config.vector_layout
        bs = self.config.block_vec_size
        split = self.split_plan
        n_real = self.n_rows
        region = self.fold_region
        use_fold = self.fold_dev is not None
        # AP x df64 (-dp_emu with ap[dp_*]): the dp stream runs the
        # double-float kernel on (hi, lo) x pairs while the sp/hp streams
        # read the hi component and accumulate in f32 (the reference
        # accumulates everything in double, ap_kernels.hpp:204; our
        # low-precision partials carry f32 accumulation — documented
        # deviation, the dp partition keeps ~2^-48)
        mixed_df64 = any(
            getattr(d, "df64", False) for d in self.devs.values()
        ) and any(
            not getattr(d, "df64", False) for d in self.devs.values()
        )

        def one(args, x):
            devs = args["devs"]
            y_pair = None  # df64 (hi, lo) result of the dp stream
            y = None
            for dev in devs.values():
                if getattr(dev, "df64", False):
                    y_pair = impl(dev, x)
                    continue
                yk = impl(dev, x[..., 0] if mixed_df64 else x)
                y = yk if y is None else y + yk
            if y_pair is not None:
                if y is not None:
                    # fold the low-precision partials into the lo slot; the
                    # pair may become unnormalized, which to_host's exact
                    # per-component f64 summation absorbs
                    y = jnp.stack(
                        [y_pair[..., 0], y_pair[..., 1] + y], axis=-1
                    )
                else:
                    y = y_pair
            if use_fold:
                # vectorized fold: block-local inclusive prefix sums of
                # the virtual partials (one triangular matmul on the MXU),
                # then the ±1 difference matrix through the lane-tile
                # kernel. ~2 orders of magnitude faster than the XLA
                # scatter at 100k+ virtual rows.
                partials = jax.lax.dynamic_slice_in_dim(y, n_real, region)
                cs = block_prefix_sums(partials, region)
                return y + impl(args["fold"], cs)
            if split is not None:
                # heavy-row splitting: fold virtual-row partials into their
                # parents. vp is CONTIGUOUS under sigma=1 (virtual rows
                # append after the real rows and the permutation is
                # identity) — read it as a static slice, not a gather: XLA
                # lowers a 267k-index gather on TPU to a ~4 ms serial loop,
                # versus ~us for the slice. The scatter-add keeps its
                # sorted-indices hint for the same reason.
                vp, pp = split
                contig = vp.size and np.array_equal(
                    vp, np.arange(vp[0], vp[0] + vp.size, dtype=vp.dtype)
                )
                if contig:
                    partials = jax.lax.dynamic_slice_in_dim(
                        y, int(vp[0]), vp.size
                    )
                else:
                    partials = y[vp]
                sorted_pp = bool(np.all(np.diff(pp) >= 0))
                y = y.at[pp].add(
                    partials,
                    indices_are_sorted=sorted_pp,
                    mode="promise_in_bounds",
                )
            return y

        if bs > 1 and layout == "colwise":
            return lambda devs, x: jax.vmap(lambda xv: one(devs, xv))(x)
        g = self.rhs_group
        if bs > 1 and g and g < bs:
            # RHS column grouping (see from_mtx): the kernels were built
            # for g columns; run ceil(bs/g) passes, zero-padding the last
            # group. One matrix stream per pass — still ceil(bs/g)x fewer
            # streams than colwise, and ~38x over the XLA fallback the
            # budget overflow used to cause (perf_sweep.jsonl round 5).
            ngroups = -(-bs // g)

            def grouped(args, x):
                outs = []
                for i in range(ngroups):
                    xs = jax.lax.slice_in_dim(
                        x, i * g, min((i + 1) * g, bs), axis=1
                    )
                    if xs.shape[1] < g:
                        pad = [(0, 0)] * xs.ndim
                        pad[1] = (0, g - xs.shape[1])
                        xs = jnp.pad(xs, pad)
                    outs.append(one(args, xs))
                return jnp.concatenate(outs, axis=1)[:, :bs]

            return grouped
        return one

    def _spmv_fn(self):
        if self._jit_spmv is None:
            self._jit_spmv = jax.jit(self.build_spmv_closure())
        return self._jit_spmv

    def spmv(self, x: jax.Array) -> jax.Array:
        """One y = A x in device layout (permuted/padded)."""
        return self._spmv_fn()(self.kernel_args, x)

    def compile_gate(self) -> Optional[str]:
        """Compile AND execute one SpMV at build time on accelerator
        platforms; returns None on success, else the error string.

        Round 4 shipped a kernel whose BlockSpec could not lower on real
        TPU, and the operator's LaneTileBudgetError ladder never saw it —
        lowering happens at first execution, after every build-time
        fallback has passed (VERDICT r5 weak #2). This gate moves first
        execution INTO the build so `from_mtx` can degrade a tier on ANY
        lowering/compile failure, mirroring the reference's guarantee
        that some kernel always runs (kernels.hpp:22-63). The compiled
        program is the same cached jit later calls use, so success costs
        nothing extra; CPU interpret mode skips (nothing lowers there).
        Disable with USPMV_NO_COMPILE_GATE=1."""
        import os

        from ..ops.pallas_scs import pallas_supported

        if os.environ.get("USPMV_NO_COMPILE_GATE"):
            return None
        if not pallas_supported():
            return None
        try:
            jax.block_until_ready(self.spmv(self.make_x()))
            return None
        except Exception as e:  # noqa: BLE001 — ANY failure must degrade
            return f"{type(e).__name__}: {str(e)[:300]}"

    def _fused_solve_eligible(self) -> bool:
        """Whether solve mode can run k iterations inside ONE Pallas launch
        (ops/pallas_scs.solve_lane_tiles): a single plain lane-tile stream
        (no AP sum, no row-split fold, whole-x VMEM mode) whose ping-pong
        buffers fit the VMEM budget. This is the TPU-native answer to the
        launch-bound small-matrix class (VERDICT r3 weak #4): the
        reference's swap_local_vectors costs nothing per iteration
        (classes_structs.hpp:1130-1165) while a scan of kernel launches
        pays ~us dispatch overhead per iteration.

        MEASURED (round 5, scripts/solve_diag.py on the v5e,
        spmv_bench.jsonl): the premise does not hold on this hardware —
        per chained iteration inside one jitted call, scan-of-launches
        costs 5.1 us on bcsstk13 where the fused grid=(k, ns) sweep
        costs 10.5 us (it re-streams the value/gather arrays HBM->VMEM
        every sweep and pays the xy ping-pong zero-inits), and round 4's
        "69 us/iter" was the ~30 ms per-CALL tunnel sync divided by
        k=512, not kernel time. The scan path wins at both tested
        scales, so it is the default; set USPMV_FUSED_SOLVE=1 to force
        the fused kernel (kept tested — solve contract parity in
        tests/test_pallas.py)."""
        import os

        from ..ops.pallas_scs import DeviceLaneTiles, solve_tiles_fit

        if not os.environ.get("USPMV_FUSED_SOLVE"):
            return False
        if len(self.devs) != 1:
            return False
        dev = next(iter(self.devs.values()))
        if not isinstance(dev, DeviceLaneTiles):
            return False
        if self.split_plan is not None or self.fold_dev is not None:
            return False
        bs = self.config.block_vec_size
        if bs > 1 and self.config.vector_layout != "rowwise":
            return False
        return solve_tiles_fit(dev, bs)

    def _solve_fn(self):
        if getattr(self, "_jit_solve", None) is None:
            if self._fused_solve_eligible():
                from ..ops.pallas_scs import solve_lane_tiles

                interpret = (
                    None if self.device is None
                    else (self.device.platform != "tpu")
                )

                def solve(args, x, n):
                    dev = next(iter(args["devs"].values()))
                    return solve_lane_tiles(dev, x, n, interpret=interpret)

            else:
                fn = self.build_spmv_closure()

                def solve(args, x, n):
                    def body(carry, _):
                        x, _y = carry
                        return (fn(args, x), x), None

                    (x_fin, y_fin), _ = jax.lax.scan(
                        body, (x, jnp.zeros_like(x)), None, length=n
                    )
                    return y_fin, x_fin

            self._jit_solve = jax.jit(solve, static_argnums=2)
        return self._jit_solve

    def solve(self, x: jax.Array, n_repetitions: int) -> tuple:
        """Solve mode: n_repetitions of y = A x with x<->y swap (reference
        main.cpp:528-607 + swap_local_vectors). Returns (x_last_input,
        y_result) after the final iteration, device layout."""
        return self._solve_fn()(self.kernel_args, x, n_repetitions)

    # ------------------------------------------------------------- vectors

    def _is_df64(self) -> bool:
        from ..ops.pallas_scs import DeviceLaneTiles

        d = next(iter(self.devs.values()))
        return isinstance(d, DeviceLaneTiles) and d.df64

    def make_x(self, x_in: Optional[np.ndarray] = None) -> jax.Array:
        host = init_x_host(
            self.config,
            self.n_rows,
            self.matrix_stats,
            x_in=x_in,
            dtype=self.working_dtype,
        )
        dev = to_device_layout(
            host, self.config.vector_layout, self.n_rows_padded, self.old_to_new
        )
        if self._is_df64():
            # exact f64 -> (hi, lo) f32 pair split for the df64 kernel
            hi = dev.astype(np.float32)
            lo = (dev - hi.astype(np.float64)).astype(np.float32)
            dev = np.stack([hi, lo], axis=-1)
        if self.device is not None:
            return jax.device_put(dev, self.device)
        return jnp.asarray(dev)

    def to_host(self, y: jax.Array) -> np.ndarray:
        y = np.asarray(y)
        if self._is_df64():
            y = y[..., 0].astype(np.float64) + y[..., 1].astype(np.float64)
        return from_device_layout(
            y, self.config.vector_layout, self.old_to_new
        )

    # ------------------------------------------------------------- metrics

    def flops_per_spmv(self) -> int:
        """Useful flops only, padding excluded (reference main.cpp:521-526)."""
        return 2 * (self.nnz) * self.config.block_vec_size

    def bytes_per_spmv(self) -> int:
        """Minimum traffic: matrix stream + x + y (reference memory
        footprint accounting, main.cpp:655-668)."""
        total = 0
        bs = self.config.block_vec_size
        for p, dev in self.devs.items():
            total += dev.stream_bytes()
        xw = np.dtype(self.working_dtype).itemsize
        total += self.n_rows_padded * bs * xw * 2
        return total

    def beta(self) -> Dict[str, float]:
        """Fill efficiency of the user's LOGICAL (C, sigma) format
        (reference main.cpp:693) — under re-tiling the physical 1024-row
        packing differs; see device_beta() for what actually streams."""
        if self.logical_beta is not None:
            return dict(self.logical_beta)
        return {p: s.beta for p, s in self.scs.items()}

    def device_beta(self) -> Dict[str, float]:
        return {p: d.device_beta for p, d in self.devs.items()}

    def nnz_per_precision(self) -> Dict[str, int]:
        return {p: s.nnz for p, s in self.scs.items()}

    def comm_volume_per_spmv(self) -> dict:
        return {}

    def impl_name(self) -> str:
        """Which kernel implementation executes (printed in the bench block
        so a user can see e.g. that dp landed on the CPU/XLA path)."""
        from ..ops.pallas_scs import DeviceLaneTiles, DeviceMixedTiles

        if any(type(d).__name__ == "TStreamDev"
               for d in self.devs.values()):
            return "pallas-tstream"
        if any(isinstance(d, DeviceMixedTiles) for d in self.devs.values()):
            return "pallas-mixed-tiles"
        if any(isinstance(d, DeviceLaneTiles) for d in self.devs.values()):
            return "pallas-lane-tiles-df64" if self._is_df64() \
                else "pallas-lane-tiles"
        if self.config.kernel_format == "crs":
            return "xla-flat-crs"
        return "xla-tiled-scs"

    def per_shard_nnz(self):
        return None

    def dump_sparsity(self, outdir: str) -> list:
        """OUTPUT_SPARSITY analogue (reference main.cpp:1225-1254): dump each
        precision's SCS struct back to .mtx in original row/col indices."""
        import os

        primary = next(iter(self.scs.values()))
        paths = []
        for p, s in self.scs.items():
            path = os.path.join(outdir, f"{p}_local_scs.mtx")
            if hasattr(s, "row_ptrs"):  # CompactScs (tstream tier)
                self._write_compact_mtx(path, s)
            else:
                s.write_to_mtx_file(path, col_unperm=primary.new_to_old_idx)
            paths.append(path)
        return paths

    @staticmethod
    def _write_compact_mtx(path: str, s) -> None:
        """-output_sparsity for the tstream tier's CompactScs: rebuild the
        original-index COO from the compact per-row arrays."""
        from ..io.mmio import write_mtx

        cnt = s.row_counts_new.astype(np.int64)
        rows_new = np.repeat(np.arange(cnt.size, dtype=np.int64), cnt)
        rows_old = s.new_to_old_idx[rows_new].astype(np.int64)
        cols_old = s.new_to_old_idx[s.cols].astype(np.int64)
        m = MtxData.from_arrays(
            rows_old, cols_old, s.values.astype(np.float64),
            n_rows=s.n_rows, n_cols=s.n_rows,
        ).sort_by_row()
        write_mtx(path, m)
