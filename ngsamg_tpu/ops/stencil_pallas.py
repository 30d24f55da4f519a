"""Fused uniform-stencil SpMV Pallas kernel (the finest-level hot op).

The XLA lowering of :func:`ngsamg_tpu.sparse.formats._stencil_dia_matvec`
pads x to the halo box and emits one strided-slice FMA per stencil offset
— measured ~19 GB/s effective at 10M rows (the 3-d strided slices defeat
clean vectorization). This kernel makes ONE pass over x in flat row-major
form:

  y[g] = sum_t vals[t] * x[g + off_lin_t] * in_lattice(g, off_t)

with the flat index decomposed to lattice coordinates in-kernel (iota +
div/mod) for the Dirichlet clip masks. x is streamed as three row-tiles
(prev/cur/next) so any |linear offset| < TILE_ROWS*128 stays in-window;
the lane-subshift uses the same roll + two-row select as the fused DIA
kernel (ops/dia_pallas.py). Traffic = x three times + y once — still ~6x
less than the XLA form's padded copies and slices, and one kernel launch
instead of a fused-loop chain.

Reference role: the finest-level SpMV inside smoothers/residuals — the
sequential CSR row loop of the reference's `SparseMatrix::Mult`
(/root/reference/src/base/linalg/utils_sparseLA.hpp) recast as a
lattice-structured TPU kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _stencil_kernel(
    offs, dims, tile_rows, vals_ref, xm_ref, xc_ref, xp_ref, o_ref
):
    """One (tile_rows, LANES) output tile; offs/dims static."""
    i = pl.program_id(0)
    d = len(dims)
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * dims[k + 1]
    g0 = i * tile_rows * LANES
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    g = g0 + row * LANES + lane
    # lattice coordinates of each output row
    coords = []
    rem = g
    for k in range(d):
        if k < d - 1:
            ck = rem // np.int32(strides[k])
            rem = rem - ck * np.int32(strides[k])
        else:
            ck = rem
        coords.append(ck)
    window = jnp.concatenate([xm_ref[:], xc_ref[:], xp_ref[:]], axis=0)
    acc = jnp.zeros((tile_rows, LANES), dtype=o_ref.dtype)
    for t, off in enumerate(offs):
        off_lin = int(sum(int(off[k]) * strides[k] for k in range(d)))
        valid = None
        for k in range(d):
            ok = int(off[k])
            if ok == 0:
                continue
            ck = coords[k] + ok
            v = (ck >= 0) & (ck < dims[k])
            valid = v if valid is None else (valid & v)
        eff = tile_rows * LANES + off_lin  # >= 0: |off_lin| < tile span
        q, s = divmod(eff, LANES)
        rows = window[q: q + tile_rows + 1]
        if s == 0:
            shifted = rows[:tile_rows]
        else:
            rolled = pltpu.roll(rows, np.int32(LANES - s), axis=1)
            shifted = jnp.where(
                lane < LANES - s,
                rolled[:tile_rows],
                rolled[1: tile_rows + 1],
            )
        if valid is not None:
            shifted = jnp.where(valid, shifted, 0)
        acc = acc + vals_ref[t] * shifted
    o_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("offs", "dims", "tile_rows", "n_fit", "interpret"),
)
def _stencil_matvec_call(
    vals, xflat, offs, dims, tile_rows, n_fit, interpret=False
):
    """vals: (m,); xflat: (n_fit,) with n_fit % (tile_rows*LANES) == 0."""
    nrows = n_fit // LANES
    ntiles = nrows // tile_rows
    X = xflat.reshape(nrows, LANES)
    kern = functools.partial(_stencil_kernel, offs, dims, tile_rows)

    def clamp(lo, hi):
        return lambda i: (jnp.clip(i + lo, 0, hi), 0)

    y = pl.pallas_call(
        kern,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # vals scalars
            pl.BlockSpec(
                (tile_rows, LANES), clamp(-1, ntiles - 1),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_rows, LANES), clamp(0, ntiles - 1),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_rows, LANES), clamp(1, ntiles - 1),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, LANES), lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, LANES), xflat.dtype),
        interpret=interpret,
    )(vals, X, X, X)
    return y.reshape(n_fit)


def stencil_tile_rows(offs, dims) -> int:
    """Smallest sublane-aligned tile covering the stencil reach."""
    d = len(dims)
    strides = [1] * d
    for k in range(d - 2, -1, -1):
        strides[k] = strides[k + 1] * dims[k + 1]
    max_off = max(
        (abs(sum(int(o[k]) * strides[k] for k in range(d))) for o in offs),
        default=0,
    )
    t = (max_off + LANES) // LANES + 1  # strict: max_off < t * LANES
    return max(8, -(-t // 8) * 8)


def stencil_matvec_pallas(A, x: jax.Array, interpret=False) -> jax.Array:
    """Fused matvec for :class:`ngsamg_tpu.sparse.formats.StencilDia`.

    ``x``: (nrows_pad, 1). The flat vector is padded up to a whole number
    of tiles (zero fill — the clip masks make over-reads harmless: rows
    past ``nrows`` have out-of-range axis-0 coordinates for every offset
    with a nonzero component, and the zero padding kills the rest).
    """
    tr = stencil_tile_rows(A.offs, A.dims)
    tile = tr * LANES
    n_fit = -(-A.nrows_pad // tile) * tile
    xf = x[:, 0]
    if n_fit != A.nrows_pad:
        xf = jnp.pad(xf, (0, n_fit - A.nrows_pad))
    # rows in [nrows, n_fit) must produce 0: zero the input tail so the
    # offset-(0,..,0) term (which carries no mask) reads zeros there
    y = _stencil_matvec_call(
        A.vals, xf, A.offs, A.dims, tr, n_fit, interpret=interpret
    )
    n = A.nrows
    y = jnp.where(
        jnp.arange(A.nrows_pad) < n, y[: A.nrows_pad], 0
    )
    return y[:, None]
