"""ScaMaC-style scalable matrix generators.

The reference can generate inputs with the ScaMaC library instead of
reading .mtx files (scamac_generate, utilities.hpp:1585-1752: parses an
argument string like "Hubbard,n_sites=10", generates rows in parallel,
gathers a COO matrix). No external library here — representative quantum
models are generated natively in numpy with the same argument-string
interface:

  Anderson        3-D Anderson localization: -Laplacian + disorder diagonal
                  (params: Lx[,Ly,Lz], disorder, seed, pbc)
  SpinChainXXZ    Heisenberg XXZ chain, dimension 2^L
                  (params: L, Jxy, Jz, Bz, seed — Bz>0 adds a random field)
  Tridiagonal     1-D chain (params: n, diag, off)

Specs parse as "Model,key=value,key=value" (case-insensitive model names,
matching ScaMaC's option syntax).
"""

from __future__ import annotations

import numpy as np

from ..formats.coo import MtxData


def _parse_spec(spec: str):
    parts = [p.strip() for p in spec.split(",") if p.strip()]
    if not parts:
        raise ValueError("empty ScaMaC spec")
    name = parts[0].lower()
    kwargs = {}
    for p in parts[1:]:
        if "=" not in p:
            raise ValueError(f"bad ScaMaC option {p!r} (expected key=value)")
        k, v = p.split("=", 1)
        try:
            kwargs[k.strip()] = int(v)
        except ValueError:
            try:
                kwargs[k.strip()] = float(v)
            except ValueError:
                kwargs[k.strip()] = v.strip()
    return name, kwargs


def anderson(Lx: int, Ly: int = 0, Lz: int = 0, disorder: float = 16.5,
             seed: int = 1, pbc: int = 0) -> MtxData:
    """3-D Anderson model: H = -sum_<ij> |i><j| + sum_i eps_i |i><i| with
    eps_i uniform in [-disorder/2, disorder/2]."""
    Ly = Ly or Lx
    Lz = Lz or Lx
    n = Lx * Ly * Lz
    rng = np.random.default_rng(seed)
    idx = np.arange(n).reshape(Lx, Ly, Lz)
    I, J, V = [idx.reshape(-1)], [idx.reshape(-1)], [
        rng.uniform(-disorder / 2, disorder / 2, n)
    ]
    for axis, L in ((0, Lx), (1, Ly), (2, Lz)):
        if L < 2:
            continue
        nbr = np.roll(idx, -1, axis=axis)
        src, dst = idx, nbr
        if not pbc:
            sl = [slice(None)] * 3
            sl[axis] = slice(0, L - 1)
            src, dst = idx[tuple(sl)], nbr[tuple(sl)]
        s, d = src.reshape(-1), dst.reshape(-1)
        I += [s, d]
        J += [d, s]
        V += [np.full(s.size, -1.0), np.full(s.size, -1.0)]
    return MtxData.from_arrays(
        np.concatenate(I), np.concatenate(J), np.concatenate(V),
        n_rows=n, n_cols=n,
    ).sort_by_row()


def spin_chain_xxz(L: int = 12, Jxy: float = 1.0, Jz: float = 1.0,
                   Bz: float = 0.0, seed: int = 1, pbc: int = 0) -> MtxData:
    """Heisenberg XXZ chain over the full 2^L basis:
    H = sum_i [ Jxy/2 (S+_i S-_{i+1} + h.c.) + Jz Sz_i Sz_{i+1} ]
        + sum_i b_i Sz_i,  b_i uniform in [-Bz, Bz]."""
    if L > 24:
        raise ValueError("spin_chain_xxz: L > 24 would exceed memory")
    dim = 1 << L
    states = np.arange(dim, dtype=np.int64)
    rng = np.random.default_rng(seed)
    fields = rng.uniform(-Bz, Bz, L) if Bz else np.zeros(L)
    bonds = [(i, (i + 1) % L) for i in range(L if pbc else L - 1)]

    # diagonal: Jz Sz Sz + field terms (Sz = +-1/2 per bit)
    sz = ((states[:, None] >> np.arange(L)[None, :]) & 1) - 0.5
    diag = (fields[None, :] * sz).sum(axis=1)
    for i, j in bonds:
        diag = diag + Jz * sz[:, i] * sz[:, j]
    I, J, V = [states], [states], [diag]

    # off-diagonal: Jxy/2 (S+ S- + S- S+) flips anti-aligned neighbor pairs
    for i, j in bonds:
        bi, bj = 1 << i, 1 << j
        anti = ((states & bi) > 0) != ((states & bj) > 0)
        src = states[anti]
        dst = src ^ (bi | bj)
        I.append(src)
        J.append(dst)
        V.append(np.full(src.size, Jxy / 2.0))
    return MtxData.from_arrays(
        np.concatenate(I), np.concatenate(J), np.concatenate(V),
        n_rows=dim, n_cols=dim,
    ).sort_by_row()


_MODELS = {
    "anderson": lambda kw: anderson(
        Lx=int(kw.pop("lx", kw.pop("l", 8))), Ly=int(kw.pop("ly", 0)),
        Lz=int(kw.pop("lz", 0)), disorder=float(kw.pop("disorder", 16.5)),
        seed=int(kw.pop("seed", 1)), pbc=int(kw.pop("pbc", 0)), **kw,
    ),
    "spinchainxxz": lambda kw: spin_chain_xxz(
        L=int(kw.pop("l", 12)), Jxy=float(kw.pop("jxy", 1.0)),
        Jz=float(kw.pop("jz", 1.0)), Bz=float(kw.pop("bz", 0.0)),
        seed=int(kw.pop("seed", 1)), pbc=int(kw.pop("pbc", 0)), **kw,
    ),
}


def scamac_models() -> tuple:
    """Names of the available ScaMaC-style models (lowercase)."""
    return tuple(_MODELS) + ("tridiagonal",)


def scamac_generate(spec: str) -> MtxData:
    """Generate a matrix from a ScaMaC-style spec string
    (reference scamac_generate, utilities.hpp:1585-1752)."""
    name, kwargs = _parse_spec(spec)
    kwargs = {k.lower(): v for k, v in kwargs.items()}
    if name == "tridiagonal":
        from .generators import tridiag

        return tridiag(
            int(kwargs.pop("n", 1000)), float(kwargs.pop("diag", 2.0)),
            float(kwargs.pop("off", -1.0)),
        )
    if name not in _MODELS:
        raise ValueError(
            f"unknown ScaMaC model {name!r}; available: "
            f"{sorted(_MODELS) + ['tridiagonal']}"
        )
    return _MODELS[name](kwargs)
