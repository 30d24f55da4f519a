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


def rap(
    A: sp.spmatrix,
    P: sp.spmatrix,
    dtype=None,
    bs_r: int = 1,
    bs_c: int | None = None,
) -> sp.csr_matrix:
    """Coarse operator A_c = P^T A P (symmetrized).

    Uses the fused native Gustavson kernel (native/kernels.cpp rap_csr,
    f64 accumulation, one pass per product — the reference's
    `RestrictMatrix`, utils_sparseMM.hpp:94-108) when the extension is
    built; scipy matmats otherwise. ``dtype`` controls the emitted
    precision: coarse operators only serve the (f32) preconditioner, so
    float32 halves their memory without affecting the f64 outer solve.

    ``bs_r``/``bs_c`` give the fine-row / coarse-column BLOCK sizes of a
    block-structured product: the triple product then runs as two
    block-entry Gustavson passes (`bsr_mm`, rectangular blocks — the
    reference's per-block-size `RestrictMatrix` instantiations) with
    ~bs^2 less index work than the scalar kernel.
    """
    if bs_r > 1 or (bs_c or 1) > 1:
        from ..native import bsr_mm as _bsr_mm

        bc = bs_c or bs_r
        # only the BSR conversions may legitimately fail (irregular
        # blocking); kernel errors must propagate, not silently fall back
        try:
            A_b = sp.bsr_matrix(A, blocksize=(bs_r, bs_r))
            P_b = (
                P
                if sp.issparse(P)
                and P.format == "bsr"
                and P.blocksize == (bs_r, bc)
                else sp.bsr_matrix(P, blocksize=(bs_r, bc))
            )
        except (ValueError, TypeError):
            A_b = P_b = None
        if A_b is not None:
            AP = _bsr_mm(A_b, P_b)
            if AP is not None:
                Pt_b = P_b.transpose().tobsr(blocksize=(bc, bs_r))
                Ac_b = _bsr_mm(Pt_b, AP)
                if Ac_b is not None:
                    Ac = Ac_b.tocsr()
                    Ac = ((Ac + Ac.T) * 0.5).tocsr()
                    Ac.sum_duplicates()
                    Ac.sort_indices()
                    if dtype is not None:
                        Ac = Ac.astype(dtype)
                    return Ac
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
