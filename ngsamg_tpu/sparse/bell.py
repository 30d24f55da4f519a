"""Device-resident block-ELL sparse format + SpMV (the TPU compute path).

Replaces the reference's block-entry `SparseMatrix<Mat<N,M>>` instantiations
(/root/reference/src/base/linalg/utils_sparseLA.hpp:56-441) with a padded
ELL layout that keeps all shapes static for XLA:

* ``data``: (n, K, br, bc) — K blocks per block row, zero-padded
* ``cols``: (n, K) int32 — block-column index per slot (0 for padding)

SpMV is a gather + batched small matmul, which XLA fuses into a single
bandwidth-bound kernel; the block dimension contractions (br, bc in
{1, 2, 3, 6}) vectorize on the VPU. Block vectors are (n, bc) arrays.

Row counts are padded to a multiple of ``row_align`` so that multi-chip row
sharding (:mod:`ngsamg_tpu.parallel`) divides evenly; padded rows are
entirely zero and stay zero through every operation.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import host as _host


def to_scipy(A: "BlockELL"):
    """Padded block-ELL -> scipy BSR->CSR (introspection/debugging)."""
    import scipy.sparse as sp

    data = np.asarray(A.data, dtype=np.float64)[: A.nrows]
    cols = np.asarray(A.cols)[: A.nrows]
    n, K, br, bc = data.shape
    rows = np.repeat(np.arange(n), K)
    B = sp.bsr_matrix(
        (
            data.reshape(n * K, br, bc),
            cols.reshape(-1),
            np.arange(n + 1) * K,
        ),
        shape=(n * br, A.ncols * bc),
    )
    C = B.tocsr()
    C.eliminate_zeros()  # padding slots are all-zero blocks at col 0
    return C


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "cols"],
    meta_fields=["nrows", "ncols", "nrows_pad"],
)
@dataclass(frozen=True)
class BlockELL:
    """Padded block-ELL sparse matrix (block rows x block cols)."""

    data: jax.Array  # (n_pad, K, br, bc)
    cols: jax.Array  # (n_pad, K) int32
    nrows: int  # logical number of block rows
    ncols: int  # logical number of block cols
    nrows_pad: int  # padded number of block rows (= data.shape[0])

    @property
    def ell_width(self) -> int:
        return self.data.shape[1]

    @property
    def block_shape(self) -> tuple[int, int]:
        return self.data.shape[2], self.data.shape[3]

    @property
    def shape(self) -> tuple[int, int]:
        br, bc = self.block_shape
        return self.nrows * br, self.ncols * bc

    def __matmul__(self, x: jax.Array) -> jax.Array:
        return spmv(self, x)


def from_scipy(
    A,
    bs_r: int = 1,
    bs_c: int = 1,
    dtype=jnp.float32,
    row_align: int = 8,
    width: int | None = None,
    stage: bool = False,
) -> BlockELL:
    """Build a BlockELL from a host scipy matrix.

    ``stage=True`` keeps numpy leaves (host staging) so a whole hierarchy
    can be shipped with ONE `jax.device_put` — on remote-TPU tunnels each
    individual transfer pays a round trip.
    """
    data, cols = _host.pad_to_ell(A, bs_r, bs_c, width=width, dtype=dtype)
    n = data.shape[0]
    n_pad = -(-n // row_align) * row_align
    if n_pad != n:
        pad = n_pad - n
        data = np.concatenate(
            [data, np.zeros((pad,) + data.shape[1:], data.dtype)]
        )
        cols = np.concatenate([cols, np.zeros((pad, cols.shape[1]), cols.dtype)])
    ncols = A.shape[1] // bs_c
    data = np.asarray(data, dtype=np.dtype(dtype))
    cols = np.asarray(cols, dtype=np.int32)
    if not stage:
        data, cols = jnp.asarray(data), jnp.asarray(cols)
    return BlockELL(
        data=data,
        cols=cols,
        nrows=n,
        ncols=ncols,
        nrows_pad=n_pad,
    )


def spmv(A: BlockELL, x: jax.Array) -> jax.Array:
    """y = A @ x for a block vector x of shape (ncols_pad?, bc).

    ``x`` may be longer than ``A.ncols`` (padded); gathered columns are always
    < ncols so padding never contaminates the product.
    """
    xg = x[A.cols]  # (n, K, bc)
    y = jnp.einsum(
        "nkij,nkj->ni", A.data, xg, preferred_element_type=A.data.dtype
    )
    return y


def spmv_rows(A: BlockELL, x: jax.Array, rows: jax.Array) -> jax.Array:
    """(A @ x) restricted to the given block rows — used by multicolor GS."""
    d = A.data[rows]  # (m, K, br, bc)
    c = A.cols[rows]  # (m, K)
    xg = x[c]
    return jnp.einsum("mkij,mkj->mi", d, xg, preferred_element_type=d.dtype)


def block_vec(v: np.ndarray | jax.Array, bs: int, nrows_pad: int, dtype):
    """Reshape a flat DOF vector into a padded (nrows_pad, bs) block vector."""
    v = jnp.asarray(v, dtype=dtype).reshape(-1, bs)
    n = v.shape[0]
    if n < nrows_pad:
        v = jnp.concatenate(
            [v, jnp.zeros((nrows_pad - n, bs), dtype=dtype)], axis=0
        )
    return v


def flat_vec(v: jax.Array, nrows: int) -> jax.Array:
    """Inverse of :func:`block_vec`: drop row padding and flatten."""
    return v[:nrows].reshape(-1)
