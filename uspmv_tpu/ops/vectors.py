"""Dense (block-)vector construction and permutation.

Re-design of the reference's SimpleDenseMatrix/DenseMatrix + init helpers
(utilities.hpp:880-981, 2311-2499): padded block vectors with column- or
row-wise layout, initialized with a default value, the matrix min/max
midpoint, or deterministic uniform randoms in [matrix_min, matrix_max].

Layouts (reference Makefile:17-31):
  rowwise : x[row, vec]  — shape [n_pad, bs]; the block dim is minor
            (lane-friendly on TPU; the bulk/block kernels consume this)
  colwise : x[vec, row]  — shape [bs, n_pad]; each vector contiguous
            (maps to per-vector kernel sweeps, vmapped on device)
Single vectors (bs=1) are plain [n_pad].
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..config import Config, DefaultValues


def init_x_host(
    config: Config,
    n_rows: int,
    matrix_stats: Tuple[float, float, float] = (1.0, 1.0, 1.0),
    x_in: Optional[np.ndarray] = None,
    dtype=np.float64,
) -> np.ndarray:
    """Unpermuted, unpadded x in logical [n_rows, bs] shape (bs dropped if 1).

    init modes (reference -rand_x '0'|'1'|'m', utilities.hpp:915-981):
      default      -> DefaultValues.x (5.0)
      random_init_x-> uniform(matrix_min, matrix_max), seeded (the reference
                      seeds from time(NULL); we are deterministic)
      mean_init_x  -> the matrix |value| min/max midpoint (reference 'm',
                      default_values.x = config->matrix_mean,
                      utilities.hpp:2352,2433)
    """
    bs = config.block_vec_size
    shape = (n_rows, bs) if bs > 1 else (n_rows,)
    if x_in is not None:
        x = np.asarray(x_in, dtype=dtype).reshape(shape)
    elif config.random_init_x:
        mn, _, mx = matrix_stats
        rng = np.random.default_rng(config.seed)
        x = rng.uniform(mn, mx, size=shape).astype(dtype)
    elif config.mean_init_x:
        x = np.full(shape, matrix_stats[1], dtype=dtype)
    else:
        x = np.full(shape, DefaultValues().x, dtype=dtype)
    return x


def to_device_layout(
    x: np.ndarray, layout: str, n_pad: int, old_to_new: np.ndarray
) -> np.ndarray:
    """[n_rows(, bs)] host vector -> padded, row-permuted device layout.

    device[old_to_new[o]] = host[o]; padded slots are zero (reference
    zero-fills halo/padding rows, utilities.hpp:957-981).
    """
    n_rows = old_to_new.shape[0]
    if x.ndim == 1:
        out = np.zeros(n_pad, dtype=x.dtype)
        out[old_to_new] = x
        return out
    bs = x.shape[1]
    out = np.zeros((n_pad, bs), dtype=x.dtype)
    out[old_to_new] = x
    if layout == "colwise":
        return np.ascontiguousarray(out.T)  # [bs, n_pad]
    return out  # rowwise [n_pad, bs]


def from_device_layout(
    y: np.ndarray, layout: str, old_to_new: np.ndarray
) -> np.ndarray:
    """Device layout -> host [n_rows(, bs)], un-permuted (reference
    copy_back_result, utilities.hpp:3817-3994)."""
    y = np.asarray(y)
    if y.ndim == 1:
        return y[old_to_new]
    if layout == "colwise":
        y = y.T  # [n_pad, bs]
    return y[old_to_new]
