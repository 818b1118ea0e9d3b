"""Headline benchmark — run by the driver on real TPU hardware.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Benchmark: SELL-C-sigma SpMV (C=16, sigma=512, sp) on a generated 3-D
Laplacian (the reference's intended SuiteSparse FEM workloads are
stencil-like; no network egress here, so the matrix is generated). Metric is
effective memory bandwidth (GB/s) — SpMV is bandwidth-bound, and the
BASELINE.json target is >= 80% of the per-chip HBM roofline
(TPU v5e: ~819 GB/s), so vs_baseline = gbps / (0.8 * 819).
"""

import json
import sys

HBM_ROOFLINE_GBPS = {
    # per-chip HBM bandwidth
    "TPU v5 lite": 819.0,  # v5e
    "TPU v5e": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,  # v6e
    "cpu": 50.0,  # fallback for CPU-only runs
}


def roofline_for(device) -> float:
    name = getattr(device, "device_kind", "") or ""
    for k, v in HBM_ROOFLINE_GBPS.items():
        if k.lower() in name.lower():
            return v
    if device.platform == "cpu":
        return HBM_ROOFLINE_GBPS["cpu"]
    return 819.0


def main() -> int:
    import jax

    from uspmv_tpu.config import Config
    from uspmv_tpu.io.generators import laplace3d
    from uspmv_tpu.runtime.bench import bench_spmv
    from uspmv_tpu.runtime.operator import SpmvOperator

    mtx = laplace3d(64)  # 262k rows, ~1.8M nnz
    # C=1024 is the TPU-native chunk height (8 sublanes x 128 lanes, the
    # lane-tile Pallas kernel); sigma=1 preserves the stencil's diagonal
    # slope so gather windows stay tight (SURVEY.md §7 C/sigma mapping)
    cfg = Config(
        kernel_format="scs",
        chunk_size=1024,
        sigma=1,
        value_type="sp",
        bench_time=3.0,
        use_pallas=True,
    )
    op = SpmvOperator.from_mtx(cfg, mtx)
    res = bench_spmv(op, warmup=20, start_iters=10)

    device = op.device if op.device is not None else jax.devices()[0]
    roof = roofline_for(device)
    target = 0.8 * roof
    print(
        json.dumps(
            {
                "metric": "scs_spmv_effective_bandwidth (C=1024 sigma=1 sp, "
                f"Laplace3D-64^3, {device.device_kind})",
                "value": round(res.effective_gbps, 2),
                "unit": "GB/s",
                "vs_baseline": round(res.effective_gbps / target, 4),
                "gflops": round(res.perf_gflops, 2),
                "n_iterations": res.n_iterations,
                "platform": res.platform,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
