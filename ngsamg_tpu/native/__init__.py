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


def handshake_match(indptr, indices, weights, can_match, theta, iters=8):
    if not HAVE_NATIVE:
        return None
    return _nat.handshake_match(
        np.ascontiguousarray(indptr, dtype=np.int64),
        np.ascontiguousarray(indices, dtype=np.int64),
        np.ascontiguousarray(weights, dtype=np.float64),
        np.ascontiguousarray(can_match, dtype=np.uint8),
        float(theta),
        int(iters),
    )
