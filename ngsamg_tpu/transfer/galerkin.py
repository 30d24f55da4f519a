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


def rap(A: sp.spmatrix, P: sp.spmatrix) -> sp.csr_matrix:
    """Coarse operator A_c = P^T A P (symmetrized)."""
    Ac = (P.T.tocsr() @ (A.tocsr() @ P.tocsr())).tocsr()
    Ac = (Ac + Ac.T) * 0.5
    Ac = Ac.tocsr()
    Ac.sum_duplicates()
    Ac.sort_indices()
    return Ac
