"""Distributed SpMV over a 1-D JAX device mesh.

Re-design of the reference's MPI execution model (SURVEY.md §2 parallelism
table): 1-D row partitioning (seg-rows/seg-nnz/seg-metis) across a
``Mesh(..., ('rows',))``; remote x entries are deduplicated, renumbered into
a per-shard halo appended after the local (padded) rows, and exchanged each
iteration through a static schedule of ``ppermute`` rounds over ICI/DCN
(reference Isend/Irecv halo exchange, classes_structs.hpp:857-995). The
pack step (pack_send_buf) is the gather by precomputed send indices; the
recv-into-halo is a scatter at precomputed halo positions; ring offsets with
zero traffic are pruned from the schedule at plan time.

Comm modes (reference MPI_MODE, Makefile:199-218):
  bulkvec   : one exchange carries all RHS columns (rowwise block vectors)
  singlevec/multivec : per-vector exchange, vmapped (colwise layout); in
              XLA's async model both reduce to the same schedule
  allgather : no halo plan — all-gather the permuted local x blocks and
              gather columns from the concatenation (robust baseline; this
              mode has no reference analogue)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config, dtype_for
from ..formats.coo import (
    MtxData,
    equilibrate_matrix,
    extract_matrix_min_mean_max,
    generate_inv_perm,
    jacobi_scale_matrix,
)
from ..formats.scs import ScsData, convert_to_scs, convert_to_scs_retiled
from ..ops.device_format import DeviceScs, build_device_scs
from ..ops.spmv_xla import spmv_flat, spmv_tiled
from ..ops.vectors import init_x_host
from ..precision.partition import partition_precisions
from .halo import HaloPlan, build_allgather_col_map, build_halo_plan
from .partition import seg_work_sharing


def _shard_map(fn, mesh, in_specs, out_specs):
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, and the halo exchange's ppermutes make the data movement
    # explicit anyway
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except (AttributeError, TypeError):  # older jax
        from jax.experimental.shard_map import shard_map

        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def _stack_device_scs(devs: List[DeviceScs]) -> DeviceScs:
    """Pad per-shard device structs to common shapes and stack on a new
    leading 'rows' axis. Padding elements are (value 0, col 0) pointed at a
    padding row, so they contribute nothing."""
    n_loc = max(d.n_rows_padded for d in devs)
    n_chunks = max(d.n_chunks for d in devs)
    E = max(d.values.shape[0] for d in devs)
    NT = max(d.t_values.shape[0] for d in devs)
    jt, C = devs[0].jt, devs[0].C

    def pad1(a, n, fill=0):
        return np.pad(np.asarray(a), (0, n - a.shape[0]), constant_values=fill)

    vals, cols, rows, tv, tc, tchunk = [], [], [], [], [], []
    for d in devs:
        vals.append(pad1(d.values, E))
        cols.append(pad1(d.col_idxs, E))
        rows.append(pad1(d.row_idxs, E, fill=n_loc - 1))
        ntd = d.t_values.shape[0]
        tv.append(
            np.pad(np.asarray(d.t_values), ((0, NT - ntd), (0, 0), (0, 0)))
        )
        tc.append(
            np.pad(np.asarray(d.t_col_idxs), ((0, NT - ntd), (0, 0), (0, 0)))
        )
        tchunk.append(pad1(d.t_chunk, NT, fill=n_chunks - 1))
    return DeviceScs(
        values=jnp.asarray(np.stack(vals)),
        col_idxs=jnp.asarray(np.stack(cols)),
        row_idxs=jnp.asarray(np.stack(rows)),
        t_values=jnp.asarray(np.stack(tv)),
        t_col_idxs=jnp.asarray(np.stack(tc)),
        t_chunk=jnp.asarray(np.stack(tchunk)),
        C=C,
        jt=jt,
        n_rows=sum(d.n_rows for d in devs),
        n_rows_padded=n_loc,
        n_chunks=n_chunks,
        n_elements=E,
        nnz=sum(d.nnz for d in devs),
    )


@dataclasses.dataclass
class _PrecPlan:
    """Static + array data for one precision's halo exchange."""

    H: int  # x-buffer length (dump slot at H)
    offsets: List[int]
    gathers: List[jax.Array]  # per offset: [R, max_d] int32
    scatters: List[jax.Array]  # per offset: [R, max_d] int32


def _split_scs_for_overlap(scs: ScsData):
    """Split a halo-renumbered local SCS into (interior, halo) element
    structs over the same permuted row space (comm/compute overlap,
    SURVEY.md §7 stage 8: interior SpMV runs while ppermutes are in
    flight). Returns (interior ScsData, halo ScsData or None if the shard
    needs no remote columns)."""
    boundary = scs.n_rows_padded
    keep = ~scs.padding_mask()
    rows = scs.flat_row_idx()
    is_halo = keep & (scs.col_idxs >= boundary)
    is_int = keep & ~is_halo
    n_cols = max(int(scs.col_idxs.max(initial=0)) + 1, boundary)
    ident = np.arange(scs.n_rows_padded, dtype=np.int32)

    def build(mask):
        sub = MtxData.from_arrays(
            rows[mask], scs.col_idxs[mask], scs.values[mask],
            n_rows=scs.n_rows_padded, n_cols=n_cols,
        )
        return convert_to_scs(sub, scs.C, 1, fixed_permutation=ident)

    return build(is_int), build(is_halo)


@dataclasses.dataclass
class DistributedSpmvOperator:
    """Drop-in sharded analogue of SpmvOperator (same public surface)."""

    config: Config
    mesh: Mesh
    n_rows: int
    n_rows_padded: int  # common per-shard local padded length
    work_sharing: np.ndarray
    scs: Dict[str, List[ScsData]]  # per precision, per shard (host)
    devs: Dict[str, DeviceScs]  # stacked [R, ...] (interior when overlapped)
    devs_halo: Dict[str, Optional[DeviceScs]]  # halo-column elements, or None
    plans: Dict[str, Optional[_PrecPlan]]
    halo_plans: Dict[str, Optional[HaloPlan]]
    shard_perms: List[np.ndarray]  # per-shard old_to_new (local rows)
    global_perm: Optional[np.ndarray]  # seg-metis permutation (old->new)
    matrix_stats: tuple
    nnz: int
    n_dropped: int = 0
    # heavy-row splitting (per-shard, lane-tile path): stacked ±1 fold
    # matrix + (common region offset V0, common region length)
    fold_dev: Optional[object] = None
    fold_region: tuple = (0, 0)
    # re-tiling engine: logical (user C, sigma) beta per precision
    logical_beta: Optional[Dict[str, float]] = None
    retiled: bool = False
    _jit_spmv: Optional[object] = None

    # ------------------------------------------------------------------ build

    @classmethod
    def from_mtx(cls, config: Config, mtx: MtxData) -> "DistributedSpmvOperator":
        config.validate()
        R = config.n_shards
        mtx_in = mtx  # kept for the rare no-split retry
        mtx = mtx.copy()
        if not mtx.is_sorted:
            mtx = mtx.sort_by_row()
        stats = extract_matrix_min_mean_max(mtx)

        ws, gperm = seg_work_sharing(mtx, R, config.seg_method)
        if gperm is not None:
            mtx = mtx.permute(gperm, None).sort_by_row()

        if config.jacobi_scale:
            jacobi_scale_matrix(mtx)
        lr = lc = None
        if config.equilibrate:
            # the reference equilibrates each rank's local rows with local
            # column maxima; we scale globally (identical row scaling —
            # rows are disjoint — and cleaner column scaling)
            lr, lc = equilibrate_matrix(mtx)

        from ..ops.packer import CHUNK_ROWS

        C_log = config.chunk_size if config.kernel_format == "scs" else 1
        sigma_log = config.sigma if config.kernel_format == "scs" else 1

        # --- heavy-row splitting plan (lane-tile shards only) ---
        # virtual rows are LOCAL to each shard, placed at a COMMON region
        # offset V0 so one shard_map program can slice every shard's
        # partials at the same position for the vectorized fold
        from ..runtime.operator import analytic_split_threshold, use_lane_tiles

        # re-tiling engine (see runtime/operator.py): each shard's logical
        # (C, sigma) packs into physical 1024-row lane-tile chunks
        retiled = use_lane_tiles(config) and (
            C_log != CHUNK_ROWS or sigma_log != 1
        )
        C = CHUNK_ROWS if retiled else C_log
        sigma = sigma_log

        do_split = (
            config.split_rows_threshold >= 0
            and not config.is_ap
            and not config.dp_emulation  # folds would renormalize pairs
            and sigma == 1
            and use_lane_tiles(config)
        )
        split_th = config.split_rows_threshold
        if do_split and split_th == 0:
            tuned = analytic_split_threshold(mtx, C)
            if tuned is None:
                do_split = False
            else:
                split_th = tuned
        V0 = int(np.diff(ws).max()) if do_split else 0
        fold_info: List[Optional[tuple]] = []

        # --- per-shard local COO (global cols) -> per-precision SCS ---
        precisions = config.ap_precisions
        scs: Dict[str, List[ScsData]] = {p: [] for p in precisions}
        logical_elems: Dict[str, int] = {p: 0 for p in precisions}
        shard_perms: List[np.ndarray] = []
        n_dropped = 0
        for r in range(R):
            local = mtx.slice_rows(int(ws[r]), int(ws[r + 1]))
            n_real_r = local.n_rows
            if do_split:
                from ..formats.coo import align_split_rows, split_heavy_rows

                m2, par = split_heavy_rows(local, split_th)
                fi = None
                if par is not None:
                    try:
                        local, e_idx, s_idx, region, _virt, _par2 = (
                            align_split_rows(m2, n_real_r, par, base=V0)
                        )
                        fi = (e_idx, s_idx, region)
                    except ValueError:
                        pass  # a parent with >= 1024 pieces: skip this shard
                fold_info.append(fi)
            if config.is_ap:
                subs, dr = partition_precisions(
                    local,
                    config.value_type,
                    config.ap_threshold_1,
                    config.ap_threshold_2,
                    equilibrate=config.equilibrate,
                    largest_row_elems=lr[ws[r] : ws[r + 1]] if lr is not None else None,
                    largest_col_elems=lc,
                    dropout=config.dropout,
                    dropout_threshold=config.dropout_threshold,
                )
                n_dropped += dr
                if retiled:
                    primary, lperm, le = convert_to_scs_retiled(
                        subs[precisions[0]], C_log, sigma_log
                    )
                    scs[precisions[0]].append(primary)
                    logical_elems[precisions[0]] += le
                    for p in precisions[1:]:
                        s_p, _, le = convert_to_scs_retiled(
                            subs[p], C_log, sigma_log,
                            fixed_logical_perm=lperm,
                        )
                        scs[p].append(s_p)
                        logical_elems[p] += le
                else:
                    primary = convert_to_scs(subs[precisions[0]], C, sigma)
                    scs[precisions[0]].append(primary)
                    for p in precisions[1:]:
                        scs[p].append(
                            convert_to_scs(
                                subs[p], C, sigma,
                                fixed_permutation=primary.old_to_new_idx,
                            )
                        )
            else:
                p = precisions[0]
                if retiled:
                    primary, _, le = convert_to_scs_retiled(
                        local, C_log, sigma_log, dtype=dtype_for(p)
                    )
                    logical_elems[p] += le
                else:
                    primary = convert_to_scs(
                        local.astype(dtype_for(p)), C, sigma
                    )
                scs[p].append(primary)
            # truncated to the REAL rows: virtual rows never appear in
            # make_x/to_host (sigma=1 keeps the identity prefix)
            shard_perms.append(
                scs[precisions[0]][r].old_to_new_idx[: int(ws[r + 1] - ws[r])]
            )

        n_loc = max(s.n_rows_padded for s in scs[precisions[0]])
        fold_region_max = max(
            (fi[2] for fi in fold_info if fi is not None), default=0
        )

        # --- communication plan + column renumbering (per precision) ---
        plans: Dict[str, Optional[_PrecPlan]] = {}
        halo_plans: Dict[str, Optional[HaloPlan]] = {}
        for p in precisions:
            # lower-precision structs share the shard's row permutation but
            # have their own column sets, hence their own plan
            if config.comm_mode == "allgather":
                build_allgather_col_map(scs[p], ws, stride=n_loc)
                plans[p] = None
                halo_plans[p] = None
            else:
                hp = build_halo_plan(scs[p], ws)
                halo_plans[p] = hp
                plans[p] = _PrecPlan(
                    H=max(hp.H, n_loc),
                    offsets=list(hp.offsets),
                    gathers=[jnp.asarray(hp.send_gather_idx[d]) for d in hp.offsets],
                    scatters=[jnp.asarray(hp.recv_scatter_idx[d]) for d in hp.offsets],
                )

        # df64 partial sums are (hi, lo) pairs: the interior + halo merge
        # uses the TwoSum pair add (ops/pallas_scs.df64_pair_add) instead
        # of a componentwise ``+`` that would round away the error-free
        # structure, so overlap stays ON under -dp_emu (VERDICT r3 item 4;
        # reference dp-under-MPI baseline main.cpp:1345)
        overlap = config.overlap_comm and config.comm_mode != "allgather"
        from ..ops.pallas_scs import MAX_META_TILES
        from ..runtime.operator import use_lane_tiles

        # shards whose halo-extended x exceeds the VMEM budget use
        # per-group HBM->VMEM x windows (the same machinery as single-chip
        # large-x, stacked with a common window height); only the SMEM
        # meta budget gates the lane path now
        lane = use_lane_tiles(config) and (
            max(s.n_elements for lst in scs.values() for s in lst)
            // CHUNK_ROWS
            <= MAX_META_TILES
        )
        # zero-column-locality shards pack MIXED tiles per shard and stack
        # them (round 2 dropped this whole class to the XLA path when
        # sharded); requires every shard's halo-extended x in VMEM
        from ..runtime.operator import MIXED_EST_CUTOFF, _window_fill_estimate

        mixed_dist = lane and not config.dp_emulation and (
            config.mixed_tiles
            if config.mixed_tiles is not None
            else _window_fill_estimate(mtx) < MIXED_EST_CUTOFF
        )
        # zero-locality tier 1, sharded (round 4): the stacked 3-pass
        # transpose-stream — single-chip tstream beat mixed tiles 11.7 vs
        # ~5 GFLOP/s on RandomImbalanced (BASELINE.md r3), and before
        # this the sharded path could only run the mixed tier. Falls
        # through to stacked mixed tiles on any budget refusal.
        if (mixed_dist and not config.is_ap
                and config.block_vec_size == 1
                and config.comm_mode != "allgather"
                and config.split_rows_threshold >= 0):
            op = cls._try_tstream_dist(
                config, mtx, ws, gperm, stats, C_log, sigma_log,
                n_dropped,
            )
            if op is not None:
                return op
        if lane:
            from ..ops.packer import (
                auto_tiles_per_step,
                resolve_chunks_per_group,
            )
            from ..ops.pallas_scs import (
                LaneTileBudgetError,
                build_device_lane_tiles,
                stack_device_lane_tiles,
            )

            # common step width + group size across shards (the stacked
            # kernel is one program); estimated from the average shard
            est_tiles = max(mtx.nnz // R // (C or 1), 1)
            tps = auto_tiles_per_step(est_tiles)
            # colwise SpMMV runs vmapped per vector: only one RHS is ever
            # resident, so VMEM budgets use the effective per-launch bs
            eff_bs = (config.block_vec_size
                      if config.vector_layout == "rowwise" else 1)
            cpg = resolve_chunks_per_group(n_loc // C, eff_bs)

            def build_stack(structs, p, x_len):
                # one window size for the whole stack (the stacked kernel
                # is a single program); single-sourced narrow-vs-wide
                # policy. x beyond the VMEM budget engages per-group
                # HBM->VMEM x windows — all shards share x_len, so the
                # auto decision is uniform; a second pass forces the max
                # window height onto every shard (one program, one XB).
                from ..ops.packer import pack_with_window_retry
                from ..ops.pallas_scs import lane_tiles_fit

                eff = (config.block_vec_size
                       if config.vector_layout == "rowwise" else 1)
                # df64 x travels as (hi, lo) pairs -> 2x the VMEM footprint
                df64_p = np.dtype(dtype_for(p)) == np.float64
                windowed = not lane_tiles_fit(
                    int(x_len), eff * (2 if df64_p else 1)
                )
                if windowed and df64_p and eff > 1:
                    # the windowed df64 kernel (r3) is bs=1 only
                    raise LaneTileBudgetError(
                        "windowed-x dp emulation (df64) supports bs=1 "
                        "only; per-shard paired x exceeds the VMEM budget"
                    )

                def mk(wr, xb_force=None):
                    return [
                        build_device_lane_tiles(
                            s, dtype=dtype_for(p), tiles_per_step=tps,
                            chunks_per_group=cpg, x_len=x_len,
                            x_window=windowed,
                            block_vec_size=eff,
                            window_rows=wr,
                            x_block_rows_force=xb_force,
                        )
                        for s in structs
                    ]

                def one(wr):
                    devs_l = mk(wr)
                    if windowed:
                        xb = max(d.x_block_rows for d in devs_l)
                        if any(d.x_block_rows != xb for d in devs_l):
                            devs_l = mk(wr, xb_force=xb)
                    return stack_device_lane_tiles(devs_l)

                if mixed_dist:
                    from ..ops.pallas_scs import (
                        build_device_mixed_tiles,
                        stack_device_mixed_tiles,
                    )

                    return stack_device_mixed_tiles([
                        build_device_mixed_tiles(
                            s, dtype=dtype_for(p), tiles_per_step=tps,
                            chunks_per_group=cpg, x_len=x_len,
                            window_rows=64, block_vec_size=eff,
                        )
                        for s in structs
                    ])
                return pack_with_window_retry(one)
        def _build_all(use_lane):
            devs: Dict[str, DeviceScs] = {}
            devs_halo: Dict[str, Optional[DeviceScs]] = {}
            for p in precisions:
                # halo-extended x buffer length for this precision's plan
                H1 = (plans[p].H + 1) if plans[p] is not None else R * n_loc
                if overlap:
                    pairs = [_split_scs_for_overlap(s) for s in scs[p]]
                    interior = [a for a, _ in pairs]
                    halos = [b for _, b in pairs]
                    if use_lane:
                        devs[p] = build_stack(interior, p, n_loc)
                    else:
                        devs[p] = _stack_device_scs(
                            [build_device_scs(s, tile_elems=config.tile_elems)
                             for s in interior]
                        )
                    if any(h.nnz for h in halos):
                        if use_lane:
                            devs_halo[p] = build_stack(halos, p, H1)
                        else:
                            devs_halo[p] = _stack_device_scs(
                                [build_device_scs(
                                    h, tile_elems=config.tile_elems)
                                 for h in halos]
                            )
                    else:
                        devs_halo[p] = None
                else:
                    if use_lane:
                        devs[p] = build_stack(scs[p], p, H1)
                    else:
                        devs[p] = _stack_device_scs(
                            [build_device_scs(s, tile_elems=config.tile_elems)
                             for s in scs[p]]
                        )
                    devs_halo[p] = None
            return devs, devs_halo

        try:
            devs, devs_halo = _build_all(lane)
        except Exception as e:
            from ..ops.pallas_scs import LaneTileBudgetError

            if not isinstance(e, LaneTileBudgetError):
                raise
            # lane-tile SMEM/VMEM budgets exceeded (e.g. spill blow-up on
            # gather-hostile matrices): fall back to the XLA path, loudly —
            # a silent downgrade would read as a perf regression
            import warnings

            warnings.warn(
                f"lane-tile kernel unavailable ({e}); falling back to the "
                "XLA SpMV path (expect lower throughput)",
                stacklevel=2,
            )
            devs, devs_halo = _build_all(False)

        fold_dev = None
        if fold_region_max:
            from ..ops.packer import resolve_chunks_per_group
            from ..ops.pallas_scs import (
                LaneTileBudgetError,
                build_device_lane_tiles,
                stack_device_lane_tiles,
            )

            try:
                # fold devices are built with x_window=False, which skips
                # the builder's own VMEM fit check; a cs buffer beyond the
                # budget would otherwise die at Mosaic compile time with an
                # opaque error instead of engaging the no-split rebuild
                # below (ADVICE r2)
                from ..ops.pallas_scs import lane_tiles_fit as _fit

                eff_bs_fold = (config.block_vec_size
                               if config.vector_layout == "rowwise" else 1)
                if not _fit(fold_region_max, eff_bs_fold):
                    raise LaneTileBudgetError(
                        f"fold virtual region ({fold_region_max} rows x "
                        f"bs={eff_bs_fold}) exceeds the VMEM x budget"
                    )
                cpg_f = resolve_chunks_per_group(n_loc // C)
                folds = []
                for r in range(R):
                    fi = fold_info[r]
                    if fi is not None:
                        e, s, _region = fi
                        q = np.flatnonzero(e != s)
                    else:
                        q = np.zeros(0, dtype=np.int64)
                    if q.size:
                        rows = np.repeat(q.astype(np.int64), 2)
                        cols = np.stack([s[q], e[q]], axis=1).reshape(-1)
                        vals = np.tile(np.array([-1.0, 1.0]), q.size)
                    else:
                        # harmless dummy so empty shards still stack
                        rows = np.zeros(1, dtype=np.int64)
                        cols = np.zeros(1, dtype=np.int64)
                        vals = np.zeros(1)
                    F = MtxData.from_arrays(
                        rows, cols.astype(np.int64), vals,
                        n_rows=n_loc, n_cols=fold_region_max,
                    )
                    scs_f = convert_to_scs(F.astype(np.float32), C, 1)
                    folds.append(build_device_lane_tiles(
                        scs_f, dtype=np.float32, tiles_per_step=8,
                        chunks_per_group=cpg_f, x_len=fold_region_max,
                        x_window=False, window_rows=8,
                    ))
                fold_dev = stack_device_lane_tiles(folds)
            except LaneTileBudgetError as e:
                # can't fold -> splitting would produce WRONG results;
                # rebuild the whole operator without splitting
                import dataclasses as _dc
                import warnings

                warnings.warn(
                    f"distributed fold build failed ({e}); rebuilding "
                    "without heavy-row splitting", stacklevel=2,
                )
                return cls.from_mtx(
                    _dc.replace(config, split_rows_threshold=-1), mtx_in
                )

        devices = _mesh_devices(config, R)
        mesh = Mesh(devices, ("rows",))
        op = cls(
            config=config,
            mesh=mesh,
            n_rows=mtx.n_rows,
            n_rows_padded=n_loc,
            work_sharing=ws,
            scs=scs,
            devs=devs,
            devs_halo=devs_halo,
            plans=plans,
            halo_plans=halo_plans,
            shard_perms=shard_perms,
            global_perm=gperm,
            matrix_stats=stats,
            nnz=mtx.nnz,
            n_dropped=n_dropped,
            fold_dev=fold_dev,
            fold_region=(V0, fold_region_max),
            logical_beta=(
                {
                    p: (sum(s.nnz for s in scs[p]) / logical_elems[p]
                        if logical_elems[p] else 1.0)
                    for p in precisions
                }
                if retiled else None
            ),
            retiled=retiled,
        )
        op._place()
        return op

    @classmethod
    def _try_tstream_dist(cls, config, mtx, ws, gperm, stats, C_log,
                          sigma_log, n_dropped):
        """Stacked transpose-stream for sharded zero-locality matrices.

        Mirrors the single-chip runtime/operator._try_tstream: per shard,
        rows > 2048 nnz pre-split (folded by a scatter-add inside
        shard_fn via TStreamDev.split_scatter), then a LOAD-BALANCING
        row permutation (rows dealt round-robin by descending nnz over
        the COMMON padded height n_loc, so every shard shares the chunk
        grid), SCS conversion, the ordinary halo plan (which composes
        local columns with the balance perm exactly as with any shard
        perm), and runtime/tstream.build_tstream_shards. Returns None
        when any budget refuses — the caller continues with the stacked
        mixed-tile path. Reference contract: row-partitioned dp/sp SpMV
        under MPI (/root/reference/code/mpi_funcs.hpp:424-622) with the
        CRS kernels' graceful degradation on gather-hostile matrices
        (kernels.hpp:22-63)."""
        from ..formats.coo import split_heavy_rows
        from ..formats.scs import logical_elements, sigma_window_perm
        from ..ops.packer import CHUNK_ROWS
        from ..ops.pallas_scs import LaneTileBudgetError, lane_tiles_fit
        from ..runtime.tstream import build_tstream_shards

        R = config.n_shards
        p = config.ap_precisions[0]

        # --- global hub-column detection (the single-chip recipe,
        # runtime/operator._try_tstream): the heaviest columns overflow
        # phase-1's capped cells and would trip the spill gate; peel them
        # into a per-shard lane-tile term whose x values gather into one
        # compact VMEM window. Hub x positions that the residual matrix
        # alone would not fetch ride the halo plan via extra_cols.
        HUB_MAX_COLS = 4096
        HUB_MIN_FRAC = 0.04
        counts_col = np.bincount(mtx.J, minlength=mtx.n_cols)
        mean_c = max(mtx.nnz / max(mtx.n_cols, 1), 1.0)
        cand = np.flatnonzero(counts_col > 8 * mean_c)
        hub_cols = None
        if cand.size:
            cand = cand[np.argsort(-counts_col[cand], kind="stable")]
            cand = cand[:HUB_MAX_COLS]
            if counts_col[cand].sum() >= HUB_MIN_FRAC * mtx.nnz:
                hub_cols = np.sort(cand)
        hub_rank = None
        if hub_cols is not None:
            # a shard with nothing but hub elements cannot build a
            # residual tstream — disable the peel up front
            for r in range(R):
                lj = mtx.slice_rows(int(ws[r]), int(ws[r + 1])).J
                if lj.size and np.isin(lj, hub_cols).all():
                    hub_cols = None
                    break
        if hub_cols is not None:
            hub_rank = np.full(mtx.n_cols, -1, dtype=np.int64)
            hub_rank[hub_cols] = np.arange(hub_cols.size, dtype=np.int64)

        locals_, parents, nreals, hub_coos = [], [], [], []
        for r in range(R):
            local = mtx.slice_rows(int(ws[r]), int(ws[r + 1]))
            nreals.append(local.n_rows)
            hub_coo = None
            if hub_rank is not None:
                hmask = hub_rank[local.J] >= 0
                if hmask.any():
                    hub_coo = (local.I[hmask], hub_rank[local.J[hmask]],
                               local.values[hmask])
                    local = MtxData.from_arrays(
                        local.I[~hmask], local.J[~hmask],
                        local.values[~hmask],
                        n_rows=local.n_rows, n_cols=local.n_cols,
                        is_sorted=True,
                    )
            hub_coos.append(hub_coo)
            m_r, par = split_heavy_rows(local, 2048)
            locals_.append(m_r)
            parents.append(par)
        n_loc = max(
            ((m.n_rows + CHUNK_ROWS - 1) // CHUNK_ROWS) * CHUNK_ROWS
            for m in locals_
        )
        scs_list: List[ScsData] = []
        shard_perms: List[np.ndarray] = []
        vps, pps = [], []
        scs_hs: List[Optional[ScsData]] = []
        hub_refs: List[Optional[np.ndarray]] = []
        K_pad = 0
        if hub_cols is not None:
            K_pad = ((hub_cols.size + 127) // 128) * 128
        logical_le = 0
        for r, m_r in enumerate(locals_):
            counts = np.bincount(m_r.I, minlength=n_loc).astype(np.int64)
            nch = n_loc // CHUNK_ROWS
            order = np.argsort(-counts, kind="stable")
            bperm = np.empty(n_loc, dtype=np.int32)
            i = np.arange(n_loc, dtype=np.int64)
            bperm[order] = (
                (i % nch) * CHUNK_ROWS + i // nch
            ).astype(np.int32)
            # pad the local COO to the common height so every shard
            # shares the chunk grid (required by the stacked kernels)
            m_pad = MtxData.from_arrays(
                m_r.I, m_r.J, m_r.values,
                n_rows=n_loc, n_cols=m_r.n_cols, is_sorted=True,
            )
            scs_r = convert_to_scs(
                m_pad.astype(dtype_for(p)), CHUNK_ROWS, 1,
                fixed_permutation=bperm,
            )
            scs_list.append(scs_r)
            shard_perms.append(
                scs_r.old_to_new_idx[: int(ws[r + 1] - ws[r])]
            )
            par = parents[r]
            if par is not None:
                virt = np.arange(nreals[r], m_r.n_rows, dtype=np.int64)
                vps.append(bperm[virt])
                pps.append(bperm[par])
            else:
                vps.append(np.zeros(0, np.int32))
                pps.append(np.zeros(0, np.int32))
            if hub_coos[r] is not None:
                hI, hJ, hV = hub_coos[r]
                hub_mtx = MtxData.from_arrays(
                    hI, hJ, hV, n_rows=n_loc, n_cols=K_pad,
                ).sort_by_row()
                scs_hs.append(convert_to_scs(
                    hub_mtx.astype(dtype_for(p)), CHUNK_ROWS, 1,
                    fixed_permutation=bperm,
                ))
                # the GLOBAL hub columns this shard's hub term reads —
                # folded into the halo plan's needed set (extra_cols)
                hub_refs.append(hub_cols[np.unique(hJ)])
            else:
                scs_hs.append(None)
                hub_refs.append(None)
            # logical (user C, sigma) element accounting for beta
            c_orig = np.bincount(
                mtx.slice_rows(int(ws[r]), int(ws[r + 1])).I,
                minlength=nreals[r],
            ).astype(np.int64)
            lp, _ = sigma_window_perm(c_orig, nreals[r], C_log, sigma_log)
            logical_le += logical_elements(c_orig, lp, C_log)

        hp = build_halo_plan(
            scs_list, ws,
            extra_cols=hub_refs if hub_cols is not None else None,
        )
        plan = _PrecPlan(
            H=max(hp.H, n_loc),
            offsets=list(hp.offsets),
            gathers=[jnp.asarray(hp.send_gather_idx[d]) for d in hp.offsets],
            scatters=[jnp.asarray(hp.recv_scatter_idx[d]) for d in hp.offsets],
        )
        if not lane_tiles_fit(plan.H + 1, 1):
            return None
        Ls = max((v.size for v in vps), default=0)
        split_scatter = None
        if Ls:
            vp = np.zeros((R, Ls), np.int32)
            pp = np.full((R, Ls), n_loc, np.int32)
            for r in range(R):
                k = vps[r].size
                vp[r, :k] = vps[r]
                pp[r, :k] = pps[r]
            split_scatter = (vp, pp)
        try:
            ts = build_tstream_shards(
                scs_list, dtype=dtype_for(p), split_scatter=split_scatter
            )
        except LaneTileBudgetError:
            return None

        if hub_cols is not None:
            # stacked hub term: each shard's hub x values gather into one
            # compact VMEM window (x positions local or halo, fetched via
            # extra_cols above); ranks a shard never references point at
            # slot 0 and are never multiplied
            import dataclasses as _dc

            from ..ops.packer import (
                auto_tiles_per_step,
                resolve_chunks_per_group,
            )
            from ..ops.pallas_scs import (
                build_device_lane_tiles,
                stack_device_lane_tiles,
            )

            K = hub_cols.size
            pos = np.zeros((R, K_pad), dtype=np.int32)
            for r in range(R):
                lo, hi = int(ws[r]), int(ws[r + 1])
                loc = (hub_cols >= lo) & (hub_cols < hi)
                row = np.zeros(K, dtype=np.int32)
                row[loc] = scs_list[r].old_to_new_idx[hub_cols[loc] - lo]
                urc = hp.halo_cols[r]
                rem = hub_cols[~loc]
                idx = np.searchsorted(urc, rem)
                found = idx < urc.size
                found[found] = urc[idx[found]] == rem[found]
                rempos = np.zeros(rem.size, dtype=np.int32)
                rempos[found] = (
                    scs_list[r].n_rows_padded + idx[found]
                ).astype(np.int32)
                row[~loc] = rempos
                pos[r, :K] = row
            hub_scs = []
            for s_h in scs_hs:
                if s_h is None:  # harmless dummy so hub-free shards stack
                    dummy = MtxData.from_arrays(
                        np.zeros(1, np.int64), np.zeros(1, np.int64),
                        np.zeros(1), n_rows=1, n_cols=K_pad,
                    )
                    s_h = convert_to_scs(
                        dummy.astype(dtype_for(p)), CHUNK_ROWS, 1
                    )
                hub_scs.append(s_h)
            tps_h = min(
                auto_tiles_per_step(max(s.n_elements // CHUNK_ROWS, 1))
                for s in hub_scs
            )
            cpg_h = resolve_chunks_per_group(n_loc // CHUNK_ROWS)
            try:
                hub_dev = stack_device_lane_tiles([
                    build_device_lane_tiles(
                        s, dtype=dtype_for(p), x_len=K_pad,
                        window_rows=32, tiles_per_step=tps_h,
                        chunks_per_group=cpg_h,
                    )
                    for s in hub_scs
                ])
            except LaneTileBudgetError:
                return None
            ts = _dc.replace(
                ts, hub=hub_dev, hub_pos=jnp.asarray(pos),
                nnz=ts.nnz + sum(s.nnz for s in hub_scs),
            )

        devices = _mesh_devices(config, R)
        mesh = Mesh(devices, ("rows",))
        retiled = C_log != CHUNK_ROWS or sigma_log != 1
        op = cls(
            config=config,
            mesh=mesh,
            n_rows=mtx.n_rows,
            n_rows_padded=n_loc,
            work_sharing=ws,
            scs={p: scs_list},
            devs={p: ts},
            devs_halo={p: None},
            plans={p: plan},
            halo_plans={p: hp},
            shard_perms=shard_perms,
            global_perm=gperm,
            matrix_stats=stats,
            nnz=mtx.nnz,
            n_dropped=n_dropped,
            fold_dev=None,
            fold_region=(0, 0),
            # always logical: the balance-permuted intermediate's raw
            # beta reflects chunk padding the kernels never stream
            logical_beta={p: mtx.nnz / logical_le if logical_le else 1.0},
            retiled=retiled,
        )
        op._place()
        return op

    def _place(self):
        """Shard the stacked arrays over the mesh."""
        sh = NamedSharding(self.mesh, P("rows"))
        self.devs = {
            p: jax.tree.map(lambda a: jax.device_put(a, sh), d)
            for p, d in self.devs.items()
        }
        self.devs_halo = {
            p: (jax.tree.map(lambda a: jax.device_put(a, sh), d)
                if d is not None else None)
            for p, d in self.devs_halo.items()
        }
        for p, plan in self.plans.items():
            if plan is not None:
                plan.gathers = [jax.device_put(g, sh) for g in plan.gathers]
                plan.scatters = [jax.device_put(s, sh) for s in plan.scatters]
        if self.fold_dev is not None:
            self.fold_dev = jax.tree.map(
                lambda a: jax.device_put(a, sh), self.fold_dev
            )

    # -------------------------------------------------------------- execution

    @property
    def working_dtype(self):
        return self.config.working_dtype()

    @property
    def R(self) -> int:
        return self.config.n_shards

    def _exchange(self, x_loc, plan: Optional[_PrecPlan], gathers, scatters):
        """Inside shard_map: local x [n_loc(, bs)] -> gatherable x buffer.

        bulkvec halo exchange: pack (gather) -> ppermute per ring offset ->
        scatter into halo region; padding lanes land in the dump slot at H.
        allgather mode: all-gather the local blocks.
        """
        R = self.R
        cfg = self.config
        if plan is None:  # allgather mode
            xg = jax.lax.all_gather(x_loc, "rows", axis=0, tiled=False)
            return xg.reshape((-1,) + x_loc.shape[1:])
        H = plan.H
        pad = [(0, H + 1 - x_loc.shape[0])] + [(0, 0)] * (x_loc.ndim - 1)
        xb = jnp.pad(x_loc, pad)
        if not cfg.comm_halos:
            return xb  # benchmark knob: skip communication entirely
        for d, gather, scatter in zip(plan.offsets, gathers, scatters):
            if cfg.no_pack:
                # perf experiment (reference -no_pack): send a contiguous
                # slice instead of packing — results are wrong on purpose
                buf = jax.lax.dynamic_slice_in_dim(xb, 0, gather.shape[0], 0)
            else:
                buf = jnp.take(xb, gather, axis=0)
            perm = [(r, (r + d) % R) for r in range(R)]
            buf = jax.lax.ppermute(buf, "rows", perm)
            xb = xb.at[scatter].set(buf, mode="drop")
        return xb

    @property
    def kernel_args(self):
        """Device-array pytree passed as a jit ARGUMENT (closure captures
        would be re-uploaded by the tunnel on every call)."""
        plan_arrays = {
            p: {
                "g": (self.plans[p].gathers if self.plans[p] else []),
                "s": (self.plans[p].scatters if self.plans[p] else []),
            }
            for p in self.devs
        }
        return (self.devs, self.devs_halo, plan_arrays,
                self.fold_dev if self.fold_dev is not None else {})

    def build_spmv_closure(self):
        """Raw (unjitted) sharded step fn(args, x):
        [R, n_loc(, bs)] -> [R, n_loc(, bs)]."""
        cfg = self.config
        from ..ops.pallas_scs import DeviceLaneTiles
        from ..runtime.tstream import TStreamDev as _TS

        lane = any(
            isinstance(d, (DeviceLaneTiles, _TS))
            for d in self.devs.values()
        )
        if cfg.kernel_format == "crs" and not lane:
            # literal CRS execution (-no_retile / XLA fallback)
            impl = spmv_flat
        else:
            # spmv_pallas dispatches on struct type: lane tiles run the
            # Pallas kernel (Mosaic iff the mesh devices are TPUs, interpret
            # elsewhere), stacked DeviceScs falls through to the XLA path
            from ..ops.pallas_scs import spmv_pallas
            from ..runtime.tstream import TStreamDev, spmv_tstream

            interpret = self.mesh.devices.flat[0].platform != "tpu"
            if any(isinstance(d, TStreamDev) for d in self.devs.values()):
                impl = partial(spmv_tstream, interpret=interpret)
            else:
                impl = partial(spmv_pallas, interpret=interpret)
        precisions = list(self.devs)
        n_loc = self.n_rows_padded
        V0, region = self.fold_region
        has_fold = self.fold_dev is not None

        # mixed AP x df64 (-dp_emu with ap[dp_*]): same policy as the
        # single-chip operator (runtime/operator.py) — the dp stream runs
        # the double-float kernel on (hi, lo) pairs, lower-precision
        # streams read the hi component, and their partials fold into the
        # lo slot of the pair (exactly absorbed by to_host's f64 sum)
        from ..ops.pallas_scs import df64_pair_add

        df64_flags = {
            p: bool(getattr(self.devs[p], "df64", False)) for p in precisions
        }
        mixed_df64 = any(df64_flags.values()) and not all(df64_flags.values())

        def shard_fn(x_blk, devs_blk, halo_blk, plan_arrays, fold_blk):
            # shard_map gives blocks with leading dim 1
            x = x_blk[0]
            y = None
            y_pair = None
            for p in precisions:
                dev = jax.tree.map(lambda a: a[0], devs_blk[p])
                plan = self.plans[p]
                ga = [a[0] for a in plan_arrays[p]["g"]]
                sc = [a[0] for a in plan_arrays[p]["s"]]
                halo = halo_blk.get(p)
                df64_p = df64_flags[p]
                xin = x[..., 0] if (mixed_df64 and not df64_p) else x
                if halo is not None:
                    # comm/compute overlap: the interior part reads only
                    # local x, so XLA schedules it while the ppermutes of
                    # _exchange are in flight (async collectives); the small
                    # halo part runs after the exchange completes
                    halo_dev = jax.tree.map(lambda a: a[0], halo)
                    yk = impl(dev, xin)[:n_loc]
                    xb = self._exchange(xin, plan, ga, sc)
                    yh = impl(halo_dev, xb)[:n_loc]
                    yk = df64_pair_add(yk, yh) if df64_p else yk + yh
                else:
                    xb = self._exchange(xin, plan, ga, sc)
                    yk = impl(dev, xb)[:n_loc]
                if df64_p:
                    y_pair = (yk if y_pair is None
                              else df64_pair_add(y_pair, yk))
                else:
                    y = yk if y is None else y + yk
            if y_pair is not None:
                y = (y_pair if y is None else jnp.stack(
                    [y_pair[..., 0], y_pair[..., 1] + y], axis=-1
                ))
            if has_fold:
                # vectorized virtual-row fold (see runtime/operator.py):
                # block-local prefix sums of the shard's virtual region
                # via one triangular MXU matmul, then the shard's ±1
                # difference matrix through the lane-tile kernel
                from ..ops.pallas_scs import spmv_pallas
                from ..runtime.operator import block_prefix_sums

                fdev = jax.tree.map(lambda a: a[0], fold_blk)
                partials = jax.lax.dynamic_slice_in_dim(y, V0, region)
                cs = block_prefix_sums(partials, region)
                interp = self.mesh.devices.flat[0].platform != "tpu"
                y = y + spmv_pallas(fdev, cs, interpret=interp)[:n_loc]
            return y[None]

        fn = _shard_map(
            shard_fn,
            self.mesh,
            in_specs=(P("rows"), P("rows"), P("rows"), P("rows"), P("rows")),
            out_specs=P("rows"),
        )

        bs = cfg.block_vec_size
        if bs > 1 and cfg.vector_layout == "colwise":
            # per-vector exchange+kernel sweep = singlevec/multivec modes
            def step(args, x):  # x: [bs, R, n_loc]
                devs, devs_halo, plan_arrays, fold = args
                return jax.vmap(
                    lambda xv: fn(xv, devs, devs_halo, plan_arrays, fold)
                )(x)

        else:

            def step(args, x):  # x: [R, n_loc(, bs)]
                devs, devs_halo, plan_arrays, fold = args
                return fn(x, devs, devs_halo, plan_arrays, fold)

        return step

    def _spmv_fn(self):
        if self._jit_spmv is None:
            self._jit_spmv = jax.jit(self.build_spmv_closure())
        return self._jit_spmv

    def spmv(self, x):
        return self._spmv_fn()(self.kernel_args, x)

    def _solve_fn(self):
        if getattr(self, "_jit_solve", None) is None:
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

    def solve(self, x, n_repetitions: int):
        return self._solve_fn()(self.kernel_args, x, n_repetitions)

    # ---------------------------------------------------------------- vectors

    def _is_df64(self) -> bool:
        from ..ops.pallas_scs import DeviceLaneTiles

        d = next(iter(self.devs.values()))
        return isinstance(d, DeviceLaneTiles) and d.df64

    def make_x(self, x_in: Optional[np.ndarray] = None):
        host = init_x_host(
            self.config, self.n_rows, self.matrix_stats,
            x_in=x_in, dtype=self.working_dtype,
        )
        if self.global_perm is not None:
            host = host[generate_inv_perm(self.global_perm)]
        bs = self.config.block_vec_size
        shape = (self.R, self.n_rows_padded) + ((bs,) if bs > 1 else ())
        out = np.zeros(shape, dtype=host.dtype)
        ws = self.work_sharing
        for r in range(self.R):
            lo, hi = int(ws[r]), int(ws[r + 1])
            out[r][self.shard_perms[r]] = host[lo:hi]
        if self._is_df64():
            # exact f64 -> (hi, lo) f32 pair split for the df64 kernel;
            # the halo exchange is dtype-agnostic and ships the pairs
            hi_ = out.astype(np.float32)
            lo_ = (out - hi_.astype(np.float64)).astype(np.float32)
            out = np.stack([hi_, lo_], axis=-1)
        if bs > 1 and self.config.vector_layout == "colwise":
            out = np.moveaxis(out, -1, 0)  # [bs, R, n_loc]
            spec = P(None, "rows")
        else:
            spec = P("rows")
        return jax.device_put(out, NamedSharding(self.mesh, spec))

    def to_host(self, y) -> np.ndarray:
        from .multihost import fetch_global

        # multi-host: shards owned by other processes are gathered first
        # (reference MPI_Gatherv, main.cpp:968-990)
        y = fetch_global(y)
        bs = self.config.block_vec_size
        if bs > 1 and self.config.vector_layout == "colwise":
            y = np.moveaxis(y, 0, -1)  # [R, n_loc, bs]
        out_shape = (self.n_rows,) + y.shape[2:]
        out = np.zeros(out_shape, dtype=y.dtype)
        ws = self.work_sharing
        for r in range(self.R):
            lo, hi = int(ws[r]), int(ws[r + 1])
            out[lo:hi] = y[r][self.shard_perms[r]]
        if self._is_df64():
            out = (out[..., 0].astype(np.float64)
                   + out[..., 1].astype(np.float64))
        if self.global_perm is not None:
            out = out[self.global_perm]
        return out

    # ---------------------------------------------------------------- metrics

    def flops_per_spmv(self) -> int:
        return 2 * self.nnz * self.config.block_vec_size

    def bytes_per_spmv(self) -> int:
        total = 0
        for dev in self.devs.values():
            total += dev.stream_bytes()
        for dev in self.devs_halo.values():
            if dev is not None:
                total += dev.stream_bytes()
        xw = np.dtype(self.working_dtype).itemsize
        total += self.R * self.n_rows_padded * self.config.block_vec_size * xw * 2
        return total

    def comm_volume_per_spmv(self) -> dict:
        """Halo elements received per SpMV (reference -print_comm_vol)."""
        out = {}
        for p, hp in self.halo_plans.items():
            if hp is not None:
                out[p] = {
                    "real": hp.comm_volume_per_spmv,
                    "padded": hp.padded_comm_volume_per_spmv,
                    "per_shard": list(map(int, hp.halo_counts)),
                }
            else:
                out[p] = {
                    "real": self.R * self.n_rows_padded * (self.R - 1),
                    "padded": self.R * self.n_rows_padded * (self.R - 1),
                    "per_shard": [self.n_rows_padded * (self.R - 1)] * self.R,
                }
        return out

    def comm_volume_per_host(self) -> dict:
        """Halo elements received per HOST per SpMV — the DCN-traffic
        proxy on pod slices (reference per-rank -print_comm_vol rolled up
        to hosts; write_results.hpp:141-154). Keys are process indices."""
        procs = [d.process_index for d in self.mesh.devices.flat]
        out: Dict[str, dict] = {}
        for p, hp in self.halo_plans.items():
            if hp is None:
                continue
            acc: dict = {}
            for r, h in enumerate(hp.halo_counts):
                acc[int(procs[r])] = acc.get(int(procs[r]), 0) + int(h)
            out[p] = acc
        return out

    def impl_name(self) -> str:
        from ..ops.pallas_scs import DeviceLaneTiles, DeviceMixedTiles
        from ..runtime.tstream import TStreamDev

        if any(isinstance(d, TStreamDev) for d in self.devs.values()):
            return "pallas-tstream"
        if any(isinstance(d, DeviceMixedTiles) for d in self.devs.values()):
            return "pallas-mixed-tiles"
        if any(isinstance(d, DeviceLaneTiles) for d in self.devs.values()):
            return ("pallas-lane-tiles-df64" if self._is_df64()
                    else "pallas-lane-tiles")
        if self.config.kernel_format == "crs":
            return "xla-flat-crs"
        return "xla-tiled-scs"

    def per_shard_nnz(self) -> list:
        """Useful nonzeros per shard (per-shard gflops in the bench block,
        reference per-rank perf gather, main.cpp:833-890)."""
        R = self.R
        out = [0] * R
        for lst in self.scs.values():
            for r, s in enumerate(lst):
                out[r] += s.nnz
        return out

    def beta(self):
        """Fill efficiency of the user's LOGICAL (C, sigma) format — see
        SpmvOperator.beta(); under re-tiling the physical packing is
        reported by device_beta()."""
        if self.logical_beta is not None:
            return dict(self.logical_beta)
        return {
            p: float(np.mean([s.beta for s in lst])) for p, lst in self.scs.items()
        }

    def device_beta(self):
        return {p: d.device_beta for p, d in self.devs.items()}

    def nnz_per_precision(self):
        return {p: sum(s.nnz for s in lst) for p, lst in self.scs.items()}

    def dump_sparsity(self, outdir: str) -> list:
        import os

        paths = []
        for p, lst in self.scs.items():
            for r, s in enumerate(lst):
                path = os.path.join(outdir, f"{p}_local_scs_rank{r}.mtx")
                s.write_to_mtx_file(path)
                paths.append(path)
        return paths


def _mesh_devices(config: Config, R: int):
    """Pick R devices for the 'rows' axis, honoring backend resolution.
    Falls back to the virtual CPU mesh when the accelerator platform has
    fewer than R devices (the driver dry-runs multi-chip shardings with
    xla_force_host_platform_device_count)."""
    from ..runtime.operator import resolve_device

    dev0 = resolve_device(config)
    devs = list(jax.devices(dev0.platform))
    if len(devs) < R and dev0.platform != "cpu" and config.backend == "auto":
        devs = list(jax.devices("cpu"))
    if len(devs) < R:
        raise ValueError(
            f"need {R} devices on platform {dev0.platform!r}, have {len(devs)}"
        )
    return np.array(devs[:R])
