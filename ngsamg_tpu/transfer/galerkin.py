"""Galerkin triple product (RAP) — setup-phase coarse operator assembly.

The reference computes the block-sparse `RestrictMatrix` P^T A P as
(P^T A) P for all block-size combinations
(/root/reference/src/base/linalg/utils_sparseMM.hpp:94-108). During the
host-side setup phase we use scipy's compiled sparse-sparse products in
float64; symmetry is restored exactly afterwards (the product is symmetric in
exact arithmetic since A is).
"""

from __future__ import annotations

import scipy.sparse as sp


def rap(A: sp.spmatrix, P: sp.spmatrix, dtype=None) -> sp.csr_matrix:
    """Coarse operator A_c = P^T A P (symmetrized).

    Uses the fused native Gustavson kernel (native/kernels.cpp rap_csr,
    f64 accumulation, one pass per product — the reference's
    `RestrictMatrix`, utils_sparseMM.hpp:94-108) when the extension is
    built; scipy matmats otherwise. ``dtype`` controls the emitted
    precision: coarse operators only serve the (f32) preconditioner, so
    float32 halves their memory without affecting the f64 outer solve.
    """
    from ..native import rap_csr as _native_rap

    Ac = _native_rap(A, P, dtype=dtype, symmetrize=True)
    if Ac is not None:
        return Ac  # symmetrized + cast in-kernel, canonical CSR
    if dtype is not None:
        A = A.astype(dtype)
        P = P.astype(dtype)
    Ac = (P.T.tocsr() @ (A.tocsr() @ P.tocsr())).tocsr()
    Ac = (Ac + Ac.T) * 0.5
    Ac = Ac.tocsr()
    Ac.sum_duplicates()
    Ac.sort_indices()
    return Ac
