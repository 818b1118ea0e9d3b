"""uspmv_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
RRZE-HPC/Ultimate-SpMV (reference mounted at /root/reference): CRS and
SELL-C-sigma sparse storage, single-vector SpMV and block-vector SpMMV,
adaptive mixed precision (dp/sp/hp nonzero partitioning), distributed
row-partitioned execution with halo exchange over a JAX device mesh, and a
benchmark/validation harness replicating the reference's methodology.

Precision naming follows the reference (classes_structs.hpp:47-153):
  dp = float64 (CPU/validation parity path; TPUs have no native f64)
  sp = float32
  hp = bfloat16 (the TPU half type; reference uses _Float16)
"""

import jax as _jax

# The reference is a double-precision HPC code (value_type "dp" default,
# utilities.hpp:parse_cli_inputs). Enable x64 so dp paths exist for
# validation; performance paths use sp/bf16 (see SURVEY.md §7).
_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .config import Config, DefaultValues, PRECISION_DTYPES, dtype_for
from .formats.coo import MtxData
from .formats.scs import ScsData, convert_to_scs, permute_scs_cols
from .formats.coo import (
    apply_permutation,
    apply_strided_permutation,
    equilibrate_matrix,
    extract_largest_col_elems,
    extract_largest_row_elems,
)
from .io.mmio import read_mtx, write_mtx
from .precision.partition import partition_precisions, ap_threshold_from_norm

__all__ = [
    "Config",
    "DefaultValues",
    "PRECISION_DTYPES",
    "dtype_for",
    "MtxData",
    "ScsData",
    "convert_to_scs",
    "permute_scs_cols",
    "apply_permutation",
    "apply_strided_permutation",
    "equilibrate_matrix",
    "extract_largest_row_elems",
    "extract_largest_col_elems",
    "read_mtx",
    "write_mtx",
    "partition_precisions",
    "ap_threshold_from_norm",
]
