"""Interpret-mode parity tests for the Pallas SpMV kernels.

The fused stencil kernel (ops/stencil_pallas.py) and the DIA kernels
(ops/dia_pallas.py) replace the XLA matvec on TPU for the hottest levels;
these tests run the SAME kernel code through the Pallas interpreter on CPU
and compare against the XLA lowerings (`formats._stencil_dia_matvec` /
`formats._dia_matvec_xla`) on small lattices covering odd dims, negative
offsets, lane/tile-boundary offsets, and pad tails.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from ngsamg_tpu.ops.dia_pallas import (
    LANES,
    ROWS_PER_TILE,
    dia_matvec_pallas,
    sym_halo_tiles,
)
from ngsamg_tpu.ops.stencil_pallas import stencil_matvec_pallas
from ngsamg_tpu.sparse import formats

TILE = LANES * ROWS_PER_TILE  # 8192


def _dia_manual(offsets, data, n, sym_half):
    """Dense reference matvec for a DiaMatrix's storage convention."""
    A = np.zeros((n, n))
    for d, off in enumerate(offsets):
        for i in range(n):
            j = i + off
            if 0 <= j < n:
                A[i, j] = data[d, i]
            if sym_half and off > 0 and 0 <= i - off:
                A[i, i - off] = data[d, i - off]
    return A


def _mk_dia(offsets, n, n_pad, sym_half, seed=0):
    rng = np.random.default_rng(seed)
    data = np.zeros((len(offsets), n_pad), dtype=np.float32)
    for d, off in enumerate(offsets):
        lo, hi = max(0, -off), min(n, n - off)
        data[d, lo:hi] = rng.standard_normal(hi - lo).astype(np.float32)
    return formats.DiaMatrix(
        data=jnp.asarray(data),
        offsets=tuple(int(o) for o in offsets),
        nrows=n,
        nrows_pad=n_pad,
        use_pallas=False,
        sym_half=sym_half,
    ), data


@pytest.mark.parametrize(
    "offsets,n",
    [
        ((-200, -128, -3, 0, 3, 128, 200), TILE - 77),  # pad tail
        ((-LANES, -1, 0, 1, LANES), TILE),  # lane-boundary offsets
        ((-300, 0, 300), 2 * TILE - 5),  # multi-tile
    ],
)
def test_dia_general_interpret_matches_xla(offsets, n):
    n_pad = -(-n // TILE) * TILE
    A, data = _mk_dia(offsets, n, n_pad, sym_half=False)
    rng = np.random.default_rng(1)
    x = np.zeros((n_pad, 1), dtype=np.float32)
    x[:n, 0] = rng.standard_normal(n).astype(np.float32)
    xd = jnp.asarray(x)
    y_xla = np.asarray(formats._dia_matvec_xla(A, xd))[:, 0]
    y_pl = np.asarray(dia_matvec_pallas(A, xd, interpret=True))[:, 0]
    np.testing.assert_allclose(y_pl[:n], y_xla[:n], rtol=1e-5, atol=1e-5)
    dense = _dia_manual(A.offsets, data, n, False)
    np.testing.assert_allclose(
        y_pl[:n], dense @ x[:n, 0], rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize(
    "offsets,n,ktiles",
    [
        ((0, 1, 127, 128, 500), TILE - 13, 1),  # within one halo tile
        ((0, 128, TILE + 37), 3 * TILE - 9, 2),  # K=2 deep data halo
    ],
)
def test_dia_sym_half_interpret_matches_xla(offsets, n, ktiles):
    assert sym_halo_tiles(max(offsets)) == ktiles
    n_pad = -(-n // TILE) * TILE
    A, data = _mk_dia(offsets, n, n_pad, sym_half=True)
    rng = np.random.default_rng(2)
    x = np.zeros((n_pad, 1), dtype=np.float32)
    x[:n, 0] = rng.standard_normal(n).astype(np.float32)
    xd = jnp.asarray(x)
    y_xla = np.asarray(formats._dia_matvec_xla(A, xd))[:, 0]
    y_pl = np.asarray(dia_matvec_pallas(A, xd, interpret=True))[:, 0]
    np.testing.assert_allclose(y_pl[:n], y_xla[:n], rtol=1e-5, atol=1e-5)
    dense = _dia_manual(A.offsets, data, n, True)
    np.testing.assert_allclose(
        y_pl[:n], dense @ x[:n, 0], rtol=1e-4, atol=1e-4
    )


def _mk_stencil(dims, offs, seed=0):
    rng = np.random.default_rng(seed)
    n = int(np.prod(dims))
    vals = rng.standard_normal(len(offs)).astype(np.float32)
    row_align = 8
    n_pad = -(-n // row_align) * row_align
    return formats.StencilDia(
        vals=jnp.asarray(vals),
        offs=tuple(tuple(int(x) for x in o) for o in offs),
        dims=tuple(int(d) for d in dims),
        nrows=n,
        nrows_pad=n_pad,
    )


def _stencil_dense(A):
    d = len(A.dims)
    n = A.nrows
    idx = np.stack(
        np.meshgrid(*[np.arange(s) for s in A.dims], indexing="ij"),
        axis=-1,
    ).reshape(n, d)
    strides = np.ones(d, dtype=np.int64)
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * A.dims[k + 1]
    M = np.zeros((n, n))
    vals = np.asarray(A.vals)
    for t, off in enumerate(A.offs):
        tgt = idx + np.asarray(off)
        ok = np.all((tgt >= 0) & (tgt < np.asarray(A.dims)), axis=1)
        rows = np.flatnonzero(ok)
        cols = (tgt[ok] * strides).sum(axis=1)
        M[rows, cols] += vals[t]
    return M


@pytest.mark.parametrize(
    "dims,offs",
    [
        # odd dims, 7-point Laplacian-like stencil (negative offsets)
        ((7, 9, 11), [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0),
                      (0, -1, 0), (0, 0, 1), (0, 0, -1)]),
        # axis-0 stride (4*38=152) crosses the 128-lane boundary
        ((5, 4, 38), [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 0, 2),
                      (1, 1, -1), (-1, -1, 1)]),
        # 2-d lattice with pad tail and long diagonals
        ((33, 131), [(0, 0), (2, 0), (-2, 0), (0, 3), (0, -3), (1, 1),
                     (-1, -1)]),
    ],
)
def test_stencil_interpret_matches_xla(dims, offs):
    A = _mk_stencil(dims, offs)
    rng = np.random.default_rng(3)
    x = np.zeros((A.nrows_pad, 1), dtype=np.float32)
    x[: A.nrows, 0] = rng.standard_normal(A.nrows).astype(np.float32)
    xd = jnp.asarray(x)
    # CPU backend: formats.matvec takes the XLA shift path
    y_xla = np.asarray(formats.matvec(A, xd))[:, 0]
    y_pl = np.asarray(stencil_matvec_pallas(A, xd, interpret=True))[:, 0]
    np.testing.assert_allclose(
        y_pl[: A.nrows], y_xla[: A.nrows], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        y_pl[A.nrows:], 0.0, atol=0.0
    )
    dense = _stencil_dense(A)
    np.testing.assert_allclose(
        y_pl[: A.nrows], dense @ x[: A.nrows, 0], rtol=1e-4, atol=1e-4
    )
