"""Tile-level dynamic gather primitive for Pallas TPU kernels.

Mosaic exposes ``tpu.dynamic_gather`` — a VPU shuffle that gathers within a
single (8, 128) register tile along one dimension — but jax only emits it
for equal-shape ``take_along_axis``. This module registers a thin primitive
so kernels can use it directly:

    gather_sublanes(src, idx): out[i, j] = src[idx[i, j] mod 8,   j]
    gather_lanes(src, idx):    out[i, j] = src[i, idx[i, j] mod 128]

Both require src/idx/out to be exactly (8, 128) (the native f32 vreg tile);
larger shapes crash the Mosaic compiler on v5e (measured). Throughput is
~copy speed (measured 47 Gelem/s fused with multiply-accumulate).

An arbitrary gather from a 1024-entry window ``w`` (shaped (8, 128), flat
index t = s*128 + l) composes from the two:

    t1 = gather_sublanes(w, S)      # t1[i, l] = w[S[i, l], l]
    g  = gather_lanes(t1, L)        # g[i, j]  = w[S[i, L[i,j]], L[i,j]]

which realizes g[i, j] = w[s(i,j), l(i,j)] provided the host packs at most
one distinct source sublane per (tile-row i, source lane l) — the packer in
ops/packer.py enforces this and spills conflicts to extra tiles.

Outside Mosaic (CPU jit / pallas interpret mode) the primitive falls back
to a take_along_axis composition with identical semantics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax._src import core as jax_core
from jax.interpreters import mlir

TILE = (8, 128)

gather_dim_p = jax_core.Primitive("uspmv_gather_dim")


def _gather_dim(src, idx, dim: int):
    if src.shape != TILE or idx.shape != TILE:
        raise ValueError(
            f"gather_dim requires (8,128) tiles, got {src.shape}/{idx.shape}"
        )
    return gather_dim_p.bind(src, idx, dim=dim)


def gather_sublanes(src, idx):
    """(8,128),(8,128) -> (8,128): out[i,j] = src[idx[i,j] mod 8, j]."""
    return _gather_dim(src, idx, 0)


def gather_lanes(src, idx):
    """(8,128),(8,128) -> (8,128): out[i,j] = src[i, idx[i,j] mod 128]."""
    return _gather_dim(src, idx, 1)


def gather_window(window, sub_tab, lane_tab):
    """Arbitrary gather of (8,128) elements from a (8,128) x-window.

    window  : (8,128) float   — 1024 consecutive x entries, row-major
    sub_tab : (8,128) int32   — S[i, l] = source sublane for lane l of row i
    lane_tab: (8,128) int32   — L[i, j] = source lane of element slot (i, j)
    returns g[i, j] = window[S[i, L[i,j]], L[i,j]]
    """
    t1 = gather_sublanes(window, sub_tab)
    return gather_lanes(t1, lane_tab)


@gather_dim_p.def_abstract_eval
def _abstract(src, idx, *, dim):
    if src.shape != TILE or idx.shape != TILE:
        raise ValueError(
            f"gather_dim requires (8,128) tiles, got {src.shape}/{idx.shape}"
        )
    return jax_core.ShapedArray(idx.shape, src.dtype)


@gather_dim_p.def_impl
def _impl(src, idx, *, dim):
    return _reference(src, idx, dim)


def _reference(src, idx, dim):
    m = src.shape[dim]
    return jnp.take_along_axis(src, idx % m, axis=dim)


# CPU/other-backend lowering: plain take_along_axis
mlir.register_lowering(
    gather_dim_p,
    mlir.lower_fun(
        lambda src, idx, dim: _reference(src, idx, dim), multiple_results=False
    ),
)

# Mosaic (Pallas TPU) lowering: the real VPU shuffle
try:
    from jax._src.pallas.mosaic.lowering import (
        register_lowering_rule,
        aval_to_ir_type,
    )
    from jax.experimental.mosaic.dialects import tpu as _tpu_dialect

    @register_lowering_rule(gather_dim_p)
    def _mosaic_lowering(ctx, src, idx, *, dim):
        out_type = aval_to_ir_type(
            ctx.lowering_context.dynamic_shape_replacement_fn,
            ctx.avals_out[0],
        )
        return _tpu_dialect.dynamic_gather(src, idx, [dim], results=[out_type])

    MOSAIC_GATHER_AVAILABLE = True
except (ImportError, AttributeError):  # pragma: no cover
    MOSAIC_GATHER_AVAILABLE = False
