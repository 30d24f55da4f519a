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
    jax.jit,
    static_argnames=("offsets", "n_pad", "pl_rows", "xp_rows", "interpret"),
)
def _dia_matvec_call(
    data2d, xflat, offsets, n_pad, pl_rows, xp_rows, interpret=False
):
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
        interpret=interpret,
    )(D, X)
    return y.reshape(n_pad)


def _roll_rows(rows, lane, s, nrows_out):
    """rolled[i, j] = rows[i + (j + s) // LANES, (j + s) % LANES]."""
    if s == 0:
        return rows[:nrows_out]
    rolled = pltpu.roll(rows, np.int32(LANES - s), axis=1)
    return jnp.where(
        lane < LANES - s, rolled[:nrows_out], rolled[1: nrows_out + 1]
    )


def _dia_sym_kernel(offsets, pl_rows, tile_rows, K, *refs):
    """Symmetric half-storage tile: offsets are the NON-NEGATIVE half.

    The minus-direction term uses A[g, g-o] = A[g-o, g] = data_o[g-o]:
    the positive diagonal's array read with a backward shift, streamed
    through a K-tile-deep data halo (refs = d_{i-K}..d_i blocks, clamped
    at 0; the clamp keeps trailing window slots aligned for the first
    tiles, and rows the clamp garbles are exactly the g < o masked ones).
    """
    d_refs = refs[: K + 1]
    x_ref = refs[K + 1]
    o_ref = refs[K + 2]
    dc_ref = d_refs[-1]
    i = pl.program_id(0)
    r0 = i * tile_rows
    acc = jnp.zeros((tile_rows, LANES), dtype=o_ref.dtype)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    g = (r0 + row) * LANES + lane
    win_d = jnp.concatenate([r[:] for r in d_refs], axis=1)
    for d, off in enumerate(offsets):
        # + direction: y[g] += data[d, g] * x[g + off]
        eff = off + pl_rows * LANES
        q, s = divmod(eff, LANES)
        xs = _roll_rows(
            x_ref[pl.ds(r0 + q, tile_rows + 1), :], lane, s, tile_rows
        )
        acc = acc + dc_ref[d] * xs
        if off == 0:
            continue
        # - direction: y[g] += data[d, g - off] * x[g - off]  (g >= off)
        eff_x = pl_rows * LANES - off  # >= 0: pl_rows covers -off_max
        qx, sx = divmod(eff_x, LANES)
        xs2 = _roll_rows(
            x_ref[pl.ds(r0 + qx, tile_rows + 1), :], lane, sx, tile_rows
        )
        eff_d = K * tile_rows * LANES - off  # window-relative position
        qd, sd = divmod(eff_d, LANES)
        ds_ = _roll_rows(
            win_d[d, qd: qd + tile_rows + 1, :], lane, sd, tile_rows
        )
        acc = acc + jnp.where(g >= off, ds_ * xs2, 0)
    o_ref[:] = acc


def sym_halo_tiles(off_max: int) -> int:
    """Data-halo depth K: the minus shift reaches K tiles back."""
    return -(-int(off_max) // (ROWS_PER_TILE * LANES))


# VMEM of the data window scales with (K+1) * ndiag tiles; keep it under
# ~7 MB ((K+1) * ndiag * 64 * 128 * 4 B)
_SYM_PALLAS_MAX_TILES = 220


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "n_pad", "pl_rows", "xp_rows", "n", "K", "interpret"
    ),
)
def _dia_sym_matvec_call(
    data2d, xflat, offsets, n_pad, pl_rows, xp_rows, n, K, interpret=False
):
    """Half-storage DIA matvec: data2d holds the offsets >= 0 rows only."""
    ndiag = data2d.shape[0]
    nrows = n_pad // LANES
    xp = jnp.pad(
        xflat, (pl_rows * LANES, xp_rows * LANES - n_pad - pl_rows * LANES)
    )
    X = xp.reshape(xp_rows, LANES)
    D = data2d.reshape(ndiag, nrows, LANES)
    ntiles = nrows // ROWS_PER_TILE

    kern = functools.partial(
        _dia_sym_kernel, offsets, pl_rows, ROWS_PER_TILE, K
    )

    def dspec(k):
        return pl.BlockSpec(
            (ndiag, ROWS_PER_TILE, LANES),
            lambda i, _k=k: (0, jnp.maximum(i - _k, 0), 0),
            memory_space=pltpu.VMEM,
        )

    y = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[dspec(k) for k in range(K, -1, -1)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (ROWS_PER_TILE, LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), data2d.dtype),
        interpret=interpret,
    )(*([D] * (K + 1)), X)
    return y.reshape(n_pad)


def dia_matvec_pallas(A, x: jax.Array, interpret=False) -> jax.Array:
    """Pallas DIA matvec for a :class:`ngsamg_tpu.sparse.formats.DiaMatrix`.

    ``A.nrows_pad`` must be a multiple of LANES * ROWS_PER_TILE; x is the
    (nrows_pad, 1) block vector. ``sym_half`` matrices store only the
    offsets >= 0 diagonals (exact symmetry verified at construction).
    """
    n_pad = A.nrows_pad
    if getattr(A, "sym_half", False):
        off_max = max(A.offsets)
        pl_rows = (off_max + LANES - 1) // LANES  # covers -off_max
        xp_rows = pl_rows + n_pad // LANES + pl_rows + 1
        y = _dia_sym_matvec_call(
            A.data, x[:, 0], A.offsets, n_pad, pl_rows, xp_rows,
            A.nrows, sym_halo_tiles(off_max), interpret=interpret,
        )
        return y[:, None]
    off_min = min(A.offsets)
    off_max = max(A.offsets)
    pl_rows = max(0, -(off_min // LANES))  # left pad, whole rows
    extra_hi = (off_max + LANES - 1) // LANES + 1
    xp_rows = pl_rows + n_pad // LANES + max(extra_hi, 1)
    y = _dia_matvec_call(
        A.data, x[:, 0], A.offsets, n_pad, pl_rows, xp_rows,
        interpret=interpret,
    )
    return y[:, None]
