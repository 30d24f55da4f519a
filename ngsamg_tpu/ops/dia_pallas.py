"""Fused DIA SpMV Pallas kernel.

The XLA lowering of diagonal-storage matvec materializes one shifted copy of
x per diagonal (~2.6 ms at 250k rows x 15 diagonals); this kernel makes a
single pass: x lives in VMEM, each grid step streams one row-tile of the
diagonal data from HBM and accumulates all diagonals in registers —
  y[i] = sum_d data[d, i] * x[i + off_d]
with the flat index decomposed into (row, lane) = (i // 128, i % 128); a
lane shift is a `pltpu.roll` + two-row select, a row shift is a VMEM slice.
Traffic = data once + x once + y once (bandwidth-optimal).

Reference role: the scalar SpMV inner loop of the reference's CPU solve
path (utils_sparseMM.hpp / SparseMatrix::Mult) — here fused per stencil
structure instead of CSR rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS_PER_TILE = 64  # (64, 128) f32 tile = 32 KB per buffer


def _dia_kernel(offsets, pl_rows, data_ref, x_ref, o_ref):
    """One row tile: accumulate every diagonal. offsets are static."""
    r0 = pl.program_id(0) * ROWS_PER_TILE
    acc = jnp.zeros((ROWS_PER_TILE, LANES), dtype=o_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS_PER_TILE, LANES), 1)
    for d, off in enumerate(offsets):
        eff = off + pl_rows * LANES  # >= 0 by construction
        q, s = divmod(eff, LANES)
        rows = x_ref[pl.ds(r0 + q, ROWS_PER_TILE + 1), :]
        if s == 0:
            shifted = rows[:ROWS_PER_TILE]
        else:
            # want rolled[i, j] = rows[i, (j + s) mod LANES]; pltpu.roll
            # requires a non-negative shift, and roll(a, k)[j] = a[j - k].
            # int32: under jax_enable_x64 a bare python int traces as i64,
            # which tpu.dynamic_rotate rejects
            rolled = pltpu.roll(rows, np.int32(LANES - s), axis=1)
            shifted = jnp.where(
                lane < LANES - s,
                rolled[:ROWS_PER_TILE],
                rolled[1 : ROWS_PER_TILE + 1],
            )
        acc = acc + data_ref[d] * shifted
    o_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("offsets", "n_pad", "pl_rows", "xp_rows")
)
def _dia_matvec_call(data2d, xflat, offsets, n_pad, pl_rows, xp_rows):
    """data2d: (ndiag, n_pad); xflat: (n_pad,). Returns y: (n_pad,)."""
    ndiag = data2d.shape[0]
    nrows = n_pad // LANES
    # pad x on both sides so every (row+q, lane+s) access is in range
    xp = jnp.pad(xflat, (pl_rows * LANES, xp_rows * LANES - n_pad - pl_rows * LANES))
    X = xp.reshape(xp_rows, LANES)
    D = data2d.reshape(ndiag, nrows, LANES)
    ntiles = nrows // ROWS_PER_TILE

    kern = functools.partial(_dia_kernel, offsets, pl_rows)
    y = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(
                (ndiag, ROWS_PER_TILE, LANES),
                lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x: full, resident
        ],
        out_specs=pl.BlockSpec(
            (ROWS_PER_TILE, LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), data2d.dtype),
    )(D, X)
    return y.reshape(n_pad)


def dia_matvec_pallas(A, x: jax.Array) -> jax.Array:
    """Pallas DIA matvec for a :class:`ngsamg_tpu.sparse.formats.DiaMatrix`.

    ``A.nrows_pad`` must be a multiple of LANES * ROWS_PER_TILE; x is the
    (nrows_pad, 1) block vector.
    """
    n_pad = A.nrows_pad
    off_min = min(A.offsets)
    off_max = max(A.offsets)
    pl_rows = max(0, -(off_min // LANES))  # left pad, whole rows
    extra_hi = (off_max + LANES - 1) // LANES + 1
    xp_rows = pl_rows + n_pad // LANES + max(extra_hi, 1)
    y = _dia_matvec_call(
        A.data, x[:, 0], A.offsets, n_pad, pl_rows, xp_rows
    )
    return y[:, None]
