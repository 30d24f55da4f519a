"""Implicit lattice transfers: gather-free smoothed prolongation on device.

For lattice-coarsened scalar levels the tentative prolongation P_pw is a
pure index map (fine cell (i,j,k) -> coarse cell (i//2, j//2, k//2)), i.e. a
reshape/upsample with NO gathers; the smoothed prolongation

    P = (I - omega D^-1 A) P_pw

is then applied implicitly: upsample, one DIA matvec with the level's
already-resident operator A, one diagonal scale. Restriction is the exact
transpose: diagonal scale + DIA matvec + block-sum downsample. This removes
the supernoded explicit-P gathers (the dominant per-iteration cost at 2M
DoF) and all of P/R's device memory.

The host factory builds the *same* P explicitly (scipy) for the Galerkin
product, so the device hierarchy applies exactly the operator that produced
the coarse matrices.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..sparse.formats import DiaMatrix, matvec as _matvec


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "Dinv"],
    meta_fields=["dims_f", "dims_c", "omega", "nf", "nf_pad", "nc", "nc_pad"],
)
@dataclass(frozen=True)
class LatticeProlongation:
    """x_f = (I - omega Dinv A) . upsample(x_c)."""

    A: DiaMatrix  # the fine-level operator (shared, already resident)
    Dinv: jax.Array  # (nf_pad, 1)
    dims_f: tuple
    dims_c: tuple
    omega: float
    nf: int
    nf_pad: int
    nc: int
    nc_pad: int

    # matvec() dispatch uses nrows/nrows_pad of the OUTPUT side
    @property
    def nrows(self):
        return self.nf

    @property
    def nrows_pad(self):
        return self.nf_pad


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["A", "Dinv"],
    meta_fields=["dims_f", "dims_c", "omega", "nf", "nf_pad", "nc", "nc_pad"],
)
@dataclass(frozen=True)
class LatticeRestriction:
    """x_c = downsample_sum((I - omega A Dinv) . r_f) — exact P^T."""

    A: DiaMatrix
    Dinv: jax.Array
    dims_f: tuple
    dims_c: tuple
    omega: float
    nf: int
    nf_pad: int
    nc: int
    nc_pad: int

    @property
    def nrows(self):
        return self.nc

    @property
    def nrows_pad(self):
        return self.nc_pad


def _upsample(xc: jax.Array, dims_c, dims_f) -> jax.Array:
    """coarse lattice vector -> fine lattice vector by index halving."""
    g = xc.reshape(dims_c)
    for ax, (fc, cc) in enumerate(zip(dims_f, dims_c)):
        g = jnp.repeat(g, 2, axis=ax)
        if g.shape[ax] != fc:  # odd fine dimension
            g = jax.lax.slice_in_dim(g, 0, fc, axis=ax)
    return g.reshape(-1)


def _downsample_sum(xf: jax.Array, dims_f, dims_c) -> jax.Array:
    """fine -> coarse by summing each 2^d index block (upsample^T)."""
    g = xf.reshape(dims_f)
    for ax, (fc, cc) in enumerate(zip(dims_f, dims_c)):
        if fc % 2:  # pad odd dims with a zero plane
            pads = [(0, 0)] * g.ndim
            pads[ax] = (0, 1)
            g = jnp.pad(g, pads)
        shape = list(g.shape)
        shape[ax] = cc
        shape.insert(ax + 1, 2)
        g = g.reshape(shape).sum(axis=ax + 1)
    return g.reshape(-1)


def lattice_prol_apply(P: LatticeProlongation, xc: jax.Array) -> jax.Array:
    u = _upsample(xc[: P.nc, 0], P.dims_c, P.dims_f)
    u = jnp.pad(u, (0, P.nf_pad - P.nf))[:, None]
    v = u - P.omega * P.Dinv * _matvec(P.A, u)
    return v


def lattice_restrict_apply(R: LatticeRestriction, rf: jax.Array) -> jax.Array:
    w = rf - R.omega * _matvec(R.A, R.Dinv * rf)
    wc = _downsample_sum(w[: R.nf, 0], R.dims_f, R.dims_c)
    return jnp.pad(wc, (0, R.nc_pad - R.nc))[:, None]


# ---------------------------------------------------------------------------
# host side: the matching explicit P for the Galerkin product
# ---------------------------------------------------------------------------


def host_lattice_prol(A: sp.spmatrix, idx_f, dims_f, idx_c_of_f, nc, omega):
    """Explicit scipy P = (I - omega Dinv A) P_pw (must mirror the device).

    idx_f: (nf, d) fine lattice indices; idx_c_of_f: (nf,) coarse cell id of
    each fine vertex (row-major coarse ravel). Returns (P, Dinv, omega).
    """
    nf = A.shape[0]
    P_pw = sp.csr_matrix(
        (np.ones(nf), (np.arange(nf), idx_c_of_f)), shape=(nf, nc)
    )
    d = A.diagonal()
    dinv = np.where(d > 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    P = (P_pw - omega * sp.diags(dinv) @ (A @ P_pw)).tocsr()
    P.sum_duplicates()
    return P, dinv
