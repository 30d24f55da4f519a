"""Optional native (C++) setup kernels with numpy fallbacks.

Build with `python setup.py build_ext --inplace` from the repo root. The
wrappers here validate/convert dtypes and silently fall back when the
extension is missing, so the framework works identically (just slower on
the host setup path) without a toolchain.
"""

from __future__ import annotations

import numpy as np

try:
    from . import _ngsamg_native as _nat

    HAVE_NATIVE = True
except ImportError:  # pragma: no cover - environment dependent
    _nat = None
    HAVE_NATIVE = False


def greedy_color(indptr, indices) -> np.ndarray | None:
    """Sequential greedy coloring; None when the extension is absent."""
    if not HAVE_NATIVE:
        return None
    return _nat.greedy_color(
        np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int64),
    )


def rap_csr(A, P):
    """Fused P^T A P; returns a scipy CSR or None (extension absent).

    Accumulates in f64; the caller handles symmetrization/dtype."""
    if not HAVE_NATIVE:
        return None
    import scipy.sparse as sp

    A = A.tocsr()
    P = P.tocsr()
    nc = P.shape[1]
    indptr, indices, data = _nat.rap_csr(
        np.ascontiguousarray(A.indptr, dtype=np.int64),
        np.ascontiguousarray(A.indices, dtype=np.int64),
        np.ascontiguousarray(A.data, dtype=np.float64),
        np.ascontiguousarray(P.indptr, dtype=np.int64),
        np.ascontiguousarray(P.indices, dtype=np.int64),
        np.ascontiguousarray(P.data, dtype=np.float64),
        int(nc),
    )
    return sp.csr_matrix(
        (data, indices.astype(np.int32), indptr), shape=(nc, nc)
    )


def handshake_match(indptr, indices, weights, can_match, theta, iters=8,
                    jitter=False):
    if not HAVE_NATIVE:
        return None
    return _nat.handshake_match(
        np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int64),
        np.ascontiguousarray(weights, dtype=np.float64),
        np.ascontiguousarray(can_match, dtype=np.uint8),
        float(theta),
        int(iters),
        1 if jitter else 0,
    )


def edges_to_adj(edges, weights, n):
    """Symmetric CSR adjacency from an (i < j) edge list; CSR or None."""
    if not HAVE_NATIVE:
        return None
    import scipy.sparse as sp

    indptr, indices, data = _nat.edges_to_adj(
        np.ascontiguousarray(edges[:, 0], dtype=np.int64),
        np.ascontiguousarray(edges[:, 1], dtype=np.int64),
        np.ascontiguousarray(weights, dtype=np.float64),
        int(n),
    )
    M = sp.csr_matrix((data, indices, indptr), shape=(n, n))
    M.has_canonical_format = True
    return M


def map_edges_agg(edges, v2agg, n_agg):
    """(coarse_edges, e2ce) under aggregation; None when ext absent."""
    if not HAVE_NATIVE:
        return None
    lo, hi, e2ce = _nat.map_edges_agg(
        np.ascontiguousarray(edges[:, 0], dtype=np.int64),
        np.ascontiguousarray(edges[:, 1], dtype=np.int64),
        np.ascontiguousarray(v2agg, dtype=np.int64),
        int(n_agg),
    )
    return np.stack([lo, hi], axis=1), e2ce


def rho_power_h1(edges, w, d, x0, iters=10):
    """Power-iteration rho(Dhat^-1 A-hat) from edges; None when absent."""
    if not HAVE_NATIVE:
        return None
    return float(
        _nat.rho_power_h1(
            np.ascontiguousarray(edges[:, 0], dtype=np.int64),
            np.ascontiguousarray(edges[:, 1], dtype=np.int64),
            np.ascontiguousarray(w, dtype=np.float64),
            np.ascontiguousarray(d, dtype=np.float64),
            np.ascontiguousarray(x0, dtype=np.float64),
            int(iters),
        )
    )


def tile_ell_pack(A, M, T):
    """(data (T,K,M) f32, cols (T,K) i32, K) or None (extension absent)."""
    if not HAVE_NATIVE:
        return None
    A = A.tocsr()
    return _nat.tile_ell_pack(
        np.ascontiguousarray(A.indptr, dtype=np.int64),
        np.ascontiguousarray(A.indices, dtype=np.int64),
        np.ascontiguousarray(A.data, dtype=np.float64),
        int(M),
        int(T),
    )


def collapse_graph(S, v2agg, n_agg):
    """C^T S C with the diagonal dropped; scipy CSR or None."""
    if not HAVE_NATIVE:
        return None
    import scipy.sparse as sp

    S = S.tocsr()
    indptr, indices, data = _nat.collapse_graph(
        np.ascontiguousarray(S.indptr, dtype=np.int64),
        np.ascontiguousarray(S.indices, dtype=np.int64),
        np.ascontiguousarray(S.data, dtype=np.float64),
        np.ascontiguousarray(v2agg, dtype=np.int64),
        int(n_agg),
    )
    return sp.csr_matrix(
        (data, indices.astype(np.int32), indptr), shape=(n_agg, n_agg)
    )


def smoothed_prol_scalar(
    A, edges, edge_w, l2wt, v2agg, n_agg,
    scale_aux, scale_real, max_per_row, max_classic, min_frac,
):
    """Fused scalar semi-aux smoothed prolongation; CSR or None.

    ``scale_aux``/``scale_real`` are omega already divided by the
    respective spectral-radius estimates (the caller computes those so the
    numpy fallback and this kernel share them bit-for-bit)."""
    if not HAVE_NATIVE:
        return None
    import scipy.sparse as sp

    A = A.tocsr()
    indptr, indices, data = _nat.smoothed_prol_scalar(
        np.ascontiguousarray(A.indptr, dtype=np.int64),
        np.ascontiguousarray(A.indices, dtype=np.int64),
        np.ascontiguousarray(A.data, dtype=np.float64),
        np.ascontiguousarray(edges[:, 0], dtype=np.int64),
        np.ascontiguousarray(edges[:, 1], dtype=np.int64),
        np.ascontiguousarray(edge_w, dtype=np.float64),
        np.ascontiguousarray(l2wt, dtype=np.float64),
        np.ascontiguousarray(v2agg, dtype=np.int64),
        int(n_agg),
        float(scale_aux),
        float(scale_real),
        int(max_per_row),
        int(max_classic),
        float(min_frac),
    )
    return sp.csr_matrix(
        (data, indices, indptr), shape=(A.shape[0], int(n_agg))
    )
