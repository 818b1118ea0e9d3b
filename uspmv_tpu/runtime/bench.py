"""Benchmark harness.

Replicates the reference's measurement methodology (bench_spmv,
main.cpp:50-798; SURVEY.md §6):

  * warm-up repetitions (reference WARM_UP_REPS = 100, main.cpp:22);
  * a doubling timed loop — run n_iter iterations, double n_iter until the
    elapsed time reaches ``bench_time`` (default 5 s, main.cpp:449-519);
  * perf_gflops = nnz * 2 * block_vec_size * n_iter / t / 1e9 — useful
    flops only, padding excluded (main.cpp:521-526);
  * effective GB/s from the same byte accounting the reference uses with
    LIKWID (values + col_idxs streams + x + y, main.cpp:655-668).

TPU specifics: iterations run inside one jitted ``fori_loop`` with a dynamic
trip count (no recompiles while doubling) and a per-iteration epsilon added
to x (runtime zeros) so XLA cannot hoist the loop-invariant SpMV out of the
loop. ``block_until_ready`` is the reference's barrier/timing fence.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .operator import SpmvOperator

WARM_UP_REPS = 100  # reference main.cpp:22
_EPS_LEN = 256


@dataclasses.dataclass
class BenchResult:
    """Mirrors the reference Result struct (classes_structs.hpp:1812-1888)."""

    perf_gflops: float
    effective_gbps: float
    duration_total_s: float
    duration_kernel_s: float
    n_iterations: int
    nnz: int
    block_vec_size: int
    value_type: str
    kernel_format: str
    C: int
    sigma: int
    beta: Dict[str, float]
    device_beta: Dict[str, float]
    nnz_per_precision: Dict[str, int]
    memory_footprint_bytes: int
    n_rows: int
    platform: str
    comm_volume_elems: int = 0  # halo elements received per SpMV (distributed)
    impl: str = ""  # kernel implementation actually selected
    # re-tiling engine: the logical (C, sigma) above was re-packed into
    # physical 1024-row lane-tile chunks for execution
    retiled: bool = False
    # final-batch timing samples (median is duration_kernel_s); >1 sample
    # tames the axon tunnel's ±20% run-to-run variance
    timing_samples_s: Optional[list] = None
    # per-shard breakdown (reference per-rank gather, main.cpp:833-890):
    # [{shard, nnz, gflops, halo_elems_recv}]
    per_shard: Optional[list] = None
    # multi-host: halo elements received per process per SpMV
    # {precision: {process_index: elems}} (DCN-traffic proxy)
    comm_volume_per_host: Optional[dict] = None
    n_processes: int = 1

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d


def _make_runner(op: SpmvOperator):
    """jitted (args, x, eps, n) -> y running n chained SpMVs; eps (zeros at
    runtime) varies per iteration to defeat CSE/LICM. All device arrays are
    jit ARGUMENTS (closure constants would be re-uploaded per call by the
    tunnel)."""
    fn = op.build_spmv_closure()

    def run(args, x, eps, n):
        y0 = fn(args, x)

        def body(i, y_prev):
            # eps is zero at runtime but unknown to the compiler; the
            # y_prev[0] factor creates a true loop-carried dependence so
            # XLA cannot collapse the counted loop into its last iteration
            s = jnp.ravel(y_prev)[0] * eps[i % _EPS_LEN]
            return fn(args, x + s)

        y = jax.lax.fori_loop(1, n, body, y0)
        # return a scalar: fetching it is the only TRUE device sync (the
        # axon tunnel's block_until_ready returns before execution ends)
        return jnp.sum(y, dtype=jnp.float32)

    return jax.jit(run)


def bench_solve(
    op: SpmvOperator,
    n_repetitions: int,
    x: Optional[jax.Array] = None,
    bench_time: Optional[float] = None,
    warmup: int = 2,
    timing_reps: int = 3,
) -> BenchResult:
    """Solve-mode benchmark: time y = A^k x with the x<->y swap, the way
    the reference times its solve loop (main.cpp:528-607). On the fused
    path (ops/pallas_scs.solve_lane_tiles) all k iterations run in ONE
    Pallas launch, so this measures the launch-bound small-matrix class
    honestly: GFLOP/s counts 2*nnz*bs per iteration, k*m iterations per
    wall-clock window."""
    if x is None:
        x = op.make_x()
    bench_time = bench_time if bench_time is not None else op.config.bench_time
    solve_fn = op._solve_fn()

    def run(args, xv, eps, n, m):
        # m whole solves chained INSIDE one call: the per-call device
        # sync costs ~30 ms over the axon tunnel, and round 4 divided it
        # into k=512 iterations as a phantom 69 us/iter (solve_diag.py);
        # eps (runtime zeros) re-perturbs x so XLA cannot collapse the
        # repeats, mirroring _make_runner's anti-CSE dependence
        def body(i, carry):
            xc, acc = carry
            _, y = solve_fn(args, xc, n)
            s = jnp.ravel(y)[0] * eps[i % _EPS_LEN]
            return (xv + s, acc + jnp.sum(y, dtype=jnp.float32))

        _, acc = jax.lax.fori_loop(0, m, body, (xv, jnp.float32(0)))
        return acc

    runner = jax.jit(run, static_argnums=3)
    args = op.kernel_args
    k = int(n_repetitions)
    eps = jnp.zeros(_EPS_LEN, dtype=jnp.float32)
    float(runner(args, x, eps, k, 1))  # compile; scalar fetch = true sync
    for _ in range(max(warmup - 1, 0)):
        float(runner(args, x, eps, k, 1))

    t_total0 = time.perf_counter()
    m = 1
    while True:
        t0 = time.perf_counter()
        float(runner(args, x, eps, k, m))
        elapsed = time.perf_counter() - t0
        if elapsed >= bench_time or m >= (1 << 14):
            break
        m *= 2
    samples = [elapsed]
    for _ in range(max(timing_reps, 1) - 1):
        t0 = time.perf_counter()
        float(runner(args, x, eps, k, m))
        samples.append(time.perf_counter() - t0)
    elapsed = float(np.median(samples))
    t_total = time.perf_counter() - t_total0

    bs = op.config.block_vec_size
    n_iter = k * m
    gflops = 2.0 * op.nnz * bs * n_iter / elapsed / 1e9
    mat_bytes = sum(d.stream_bytes() for d in op.devs.values())
    vec_bytes = int(
        op.n_rows_padded * bs * np.dtype(op.working_dtype).itemsize * 2
    )
    device = getattr(op, "device", None)
    platform = device.platform if device is not None else "cpu"
    fused = getattr(op, "_fused_solve_eligible", lambda: False)()
    return BenchResult(
        perf_gflops=gflops,
        effective_gbps=(mat_bytes + vec_bytes) * n_iter / elapsed / 1e9,
        duration_total_s=t_total,
        duration_kernel_s=elapsed,
        n_iterations=n_iter,
        nnz=op.nnz,
        block_vec_size=bs,
        value_type=op.config.value_type,
        kernel_format=op.config.kernel_format,
        C=op.config.chunk_size,
        sigma=op.config.sigma,
        beta=op.beta(),
        device_beta=op.device_beta(),
        nnz_per_precision=op.nnz_per_precision(),
        memory_footprint_bytes=op.bytes_per_spmv(),
        n_rows=op.n_rows,
        platform=platform,
        impl=("solve-fused[" if fused else "solve-scan[")
        + op.impl_name() + "]",
        retiled=getattr(op, "retiled", False),
        timing_samples_s=[float(s) for s in samples],
        n_processes=jax.process_count(),
    )


def bench_spmv(
    op: SpmvOperator,
    x: Optional[jax.Array] = None,
    bench_time: Optional[float] = None,
    warmup: int = WARM_UP_REPS,
    start_iters: int = 10,
    timing_reps: int = 3,
) -> BenchResult:
    if x is None:
        x = op.make_x()
    bench_time = bench_time if bench_time is not None else op.config.bench_time
    runner = _make_runner(op)
    eps = jnp.zeros((_EPS_LEN,), dtype=x.dtype)
    device = getattr(op, "device", None)
    if device is not None:
        eps = jax.device_put(eps, device)

    args = op.kernel_args
    # warm-up (compile + cache warm), excluded from timing; float() fetch
    # is the true device sync
    float(runner(args, x, eps, min(warmup, 1)))
    if warmup > 1:
        float(runner(args, x, eps, warmup))

    n_iter = max(1, start_iters)
    max_iters = 1 << 17  # guard: very long on-device loops can wedge the chip
    t_total0 = time.perf_counter()
    while True:
        t0 = time.perf_counter()
        float(runner(args, x, eps, n_iter))
        elapsed = time.perf_counter() - t0
        if elapsed >= bench_time or n_iter >= max_iters:
            break
        n_iter *= 2
    # re-run the final batch and take the MEDIAN: single-batch timing is
    # exposed to the axon tunnel's ±20% run-to-run variance
    samples = [elapsed]
    for _ in range(max(timing_reps, 1) - 1):
        t0 = time.perf_counter()
        float(runner(args, x, eps, n_iter))
        samples.append(time.perf_counter() - t0)
    elapsed = float(np.median(samples))
    t_total = time.perf_counter() - t_total0

    bs = op.config.block_vec_size
    flops = 2.0 * op.nnz * bs * n_iter
    gflops = flops / elapsed / 1e9

    # effective traffic: matrix stream (values+cols once per spmv) + x + y;
    # overlapped distributed operators split the stream into interior +
    # halo structs — count both
    mat_bytes = 0
    for dev in op.devs.values():
        mat_bytes += dev.stream_bytes()
    for dev in getattr(op, "devs_halo", {}).values():
        if dev is not None:
            mat_bytes += dev.stream_bytes()
    n_shards = getattr(op, "R", 1)
    vec_bytes = int(
        n_shards * op.n_rows_padded * bs
        * np.dtype(op.working_dtype).itemsize * 2
    )
    gbps = (mat_bytes + vec_bytes) * n_iter / elapsed / 1e9

    device = getattr(op, "device", None)
    if device is not None:
        platform = device.platform
    elif getattr(op, "mesh", None) is not None:
        platform = op.mesh.devices.flat[0].platform
    else:
        leaf = jax.tree.leaves(next(iter(op.devs.values())))[0]
        platform = leaf.devices().pop().platform
    comm = op.comm_volume_per_spmv()
    comm_elems = sum(v["real"] for v in comm.values()) if comm else 0
    per_shard = None
    shard_nnz = op.per_shard_nnz()
    if shard_nnz is not None:
        halo_per_shard = [0] * len(shard_nnz)
        for v in comm.values():
            for r, h in enumerate(v.get("per_shard", [])):
                halo_per_shard[r] += h
        per_shard = [
            {
                "shard": r,
                "nnz": int(nz),
                "gflops": 2.0 * nz * bs * n_iter / elapsed / 1e9,
                "halo_elems_recv": halo_per_shard[r],
            }
            for r, nz in enumerate(shard_nnz)
        ]
    return BenchResult(
        perf_gflops=gflops,
        effective_gbps=gbps,
        duration_total_s=t_total,
        duration_kernel_s=elapsed,
        n_iterations=n_iter,
        nnz=op.nnz,
        block_vec_size=bs,
        value_type=op.config.value_type,
        kernel_format=op.config.kernel_format,
        C=op.config.chunk_size,
        sigma=op.config.sigma,
        beta=op.beta(),
        device_beta=op.device_beta(),
        nnz_per_precision=op.nnz_per_precision(),
        memory_footprint_bytes=op.bytes_per_spmv(),
        n_rows=op.n_rows,
        platform=platform,
        comm_volume_elems=comm_elems,
        impl=op.impl_name(),
        retiled=getattr(op, "retiled", False),
        timing_samples_s=[float(s) for s in samples],
        per_shard=per_shard,
        comm_volume_per_host=(
            op.comm_volume_per_host()
            if hasattr(op, "comm_volume_per_host") else None
        ),
        n_processes=jax.process_count(),
    )
