"""Host-side graph coloring for parallel Gauss-Seidel sweeps.

The reference runs shared-memory block-GS with graph-colored block partitions
(/root/reference/src/base/smoothers/block_gssmoother.hpp:30-37
`block_colors`). On TPU the colored sweep *is* the Gauss-Seidel
parallelization: rows of one color update concurrently (vectorized), colors
run sequentially — the same dependency-breaking idea, minus threads.

Coloring uses vectorized Jones-Plassmann rounds (random priorities; every
round, uncolored vertices that are local maxima among their uncolored
neighbors take the round's color), O(nnz) numpy work per color.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def jones_plassmann_coloring(
    W: sp.csr_matrix, max_colors: int = 256, seed: int = 0
) -> np.ndarray:
    """Distance-1 coloring of a symmetric graph; returns (n,) color ids."""
    n = W.shape[0]
    rng = np.random.default_rng(seed)
    prio = rng.random(n)
    indptr, indices = W.indptr, W.indices
    rows = np.repeat(np.arange(n), np.diff(indptr))
    colors = np.full(n, -1, dtype=np.int32)
    uncolored = np.ones(n, dtype=bool)
    for c in range(max_colors):
        if not uncolored.any():
            break
        nbr_p = np.where(uncolored[indices], prio[indices], -1.0)
        # per-row max over uncolored neighbors
        nbr_max = np.full(n, -1.0)
        valid_rows = np.flatnonzero(np.diff(indptr) > 0)
        if len(valid_rows):
            nbr_max[valid_rows] = np.maximum.reduceat(
                nbr_p, indptr[valid_rows]
            )
        take = uncolored & (prio > nbr_max)
        colors[take] = c
        uncolored &= ~take
    if uncolored.any():
        raise RuntimeError("coloring did not converge within max_colors")
    return colors


def color_row_lists(colors: np.ndarray, pad_row: int, align: int = 8):
    """Per-color row index arrays, padded (with ``pad_row``) to ``align``.

    ``pad_row`` must point to an all-zero padded matrix row so that padded
    entries are no-ops in the sweep.
    """
    ncol = int(colors.max()) + 1 if len(colors) else 0
    out = []
    for c in range(ncol):
        rows = np.flatnonzero(colors == c).astype(np.int32)
        npad = -(-len(rows) // align) * align - len(rows)
        if npad:
            rows = np.concatenate(
                [rows, np.full(npad, pad_row, dtype=np.int32)]
            )
        out.append(rows)
    return out
