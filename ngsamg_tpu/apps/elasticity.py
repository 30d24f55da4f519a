"""Elasticity AMG energy (2D: 3 DOFs/vertex, 3D: 6 DOFs/vertex).

TPU-native re-creation of the reference elasticity component
(/root/reference/src/elasticity/): `EpsEpsEnergy`
(elasticity_energy.hpp:11-150) with DPV = 3 (2D: 2 displacements + 1
rotation) / 6 (3D: 3 + 3), vertex data = position + weight
(`ElastVData`, elasticity_mesh.hpp:20-56), edge data = scalar energy weight
extracted from the assembled matrix (the reference projects matrix entries
onto the edge tangent, elasticity_pc_impl.hpp:226-310; here the Frobenius
norm of the displacement coupling block serves the same role).

The *rigid-body transport* Q(a -> b) moves a (translation, rotation)
coefficient vector between points (elasticity_energy.hpp:31-150 `GetQiToj`):
a rigid motion u(x) = t + omega x (x - a) parameterized at a equals the
motion (t - skew(d) omega, omega) parameterized at b, d = b - a. Piecewise
prolongation blocks are exactly these transports; the finest-level embedding
E keeps only the displacement rows (disp-only FEM space -> disp+rot AMG
space, the reference's `BuildEmbedding` E_D, elasticity_pc_impl.hpp:539-708).

The replacement matrix penalizes the difference of coefficients transported
to the edge midpoint — its kernel is exactly the global rigid-body modes, so
smoothed prolongation + kernel-preserving truncation keep RBMs representable
on every level (the reference's `CheckKVecs` invariant, elasticity_3d.cpp:682).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from ..mesh.topo import AlgebraicMesh
from ..sparse.host import to_bsr
from .base import Energy


def _skew(d: np.ndarray) -> np.ndarray:
    """Batched 3D skew matrices: skew(d) @ v = d x v. d: (m, 3)."""
    m = len(d)
    S = np.zeros((m, 3, 3))
    S[:, 0, 1] = -d[:, 2]
    S[:, 0, 2] = d[:, 1]
    S[:, 1, 0] = d[:, 2]
    S[:, 1, 2] = -d[:, 0]
    S[:, 2, 0] = -d[:, 1]
    S[:, 2, 1] = d[:, 0]
    return S


class ElasticityEnergy(Energy):
    """dim=2 -> dpv=3, dim=3 -> dpv=6."""

    def __init__(self, dim: int):
        if dim not in (2, 3):
            raise ValueError("dim must be 2 or 3")
        self.dim = dim
        self.dpv = 3 if dim == 2 else 6

    # -- transport --------------------------------------------------------
    def transport(self, pos_from, pos_to) -> np.ndarray:
        """Q(a -> b): (m, dpv, dpv) rigid-body coefficient transport."""
        d = np.asarray(pos_to, float) - np.asarray(pos_from, float)
        m = len(d)
        Q = np.tile(np.eye(self.dpv), (m, 1, 1))
        if self.dim == 2:
            # u(b) = t + omega * perp(d), perp(d) = (-dy, dx)
            Q[:, 0, 2] = -d[:, 1]
            Q[:, 1, 2] = d[:, 0]
        else:
            # u(b) = t + omega x d = t - skew(d) omega
            Q[:, :3, 3:] = -_skew(d)
        return Q

    def embed_blocks(self, m: int) -> np.ndarray:
        """E_v = [I_dim | 0]: take displacement rows of the rigid coeff."""
        E = np.zeros((m, self.dim, self.dpv))
        E[:, : self.dim, : self.dim] = np.eye(self.dim)
        return E

    def embedding_matrix(self, mesh: AlgebraicMesh) -> sp.spmatrix:
        nv = mesh.nv
        E = self.embed_blocks(nv)
        return sp.bsr_matrix(
            (E, np.arange(nv, dtype=np.int32), np.arange(nv + 1)),
            shape=(nv * self.dim, nv * self.dpv),
        )

    # -- finest-level mesh -------------------------------------------------
    def build_finest_mesh(self, A, coords=None) -> AlgebraicMesh:
        if coords is None:
            raise ValueError("elasticity needs vertex coordinates")
        dim = self.dim
        B = to_bsr(A, dim)
        nv = B.shape[0] // dim
        if len(coords) != nv:
            raise ValueError(
                f"coords rows {len(coords)} != vertices {nv}"
            )
        # scalar connectivity: Frobenius norms of displacement blocks
        norms = np.sqrt((B.data.astype(np.float64) ** 2).sum(axis=(1, 2)))
        W = sp.csr_matrix((norms, B.indices, B.indptr), shape=(nv, nv))
        diag = W.diagonal().copy()
        W.setdiag(0.0)
        W.eliminate_zeros()
        U = sp.triu(W, k=1).tocoo()
        mesh = AlgebraicMesh(
            nv=nv,
            edges=np.stack([U.row, U.col], axis=1).astype(np.int64),
        )
        mesh.edge_data["wt"] = U.data.copy()
        # vertex weight: excess of diagonal over incident couplings — the
        # Dirichlet/L2 part (same construction as H1; near the clamped
        # boundary this correctly breaks rigid-mode preservation)
        vwt = diag.copy()
        np.subtract.at(vwt, mesh.edges[:, 0], mesh.edge_data["wt"])
        np.subtract.at(vwt, mesh.edges[:, 1], mesh.edge_data["wt"])
        mesh.vertex_data["l2wt"] = np.maximum(vwt, 0.0)
        mesh.vertex_data["pos"] = np.asarray(coords, dtype=np.float64)
        return mesh

    # -- strength of connection -------------------------------------------
    def soc(self, mesh: AlgebraicMesh) -> np.ndarray:
        w = mesh.edge_data["wt"]
        i, j = mesh.edges[:, 0], mesh.edges[:, 1]
        d = mesh.vertex_data["l2wt"].copy()
        np.add.at(d, i, w)
        np.add.at(d, j, w)
        d = np.maximum(d, 1e-300)
        return w * 0.5 * (1.0 / d[i] + 1.0 / d[j])

    # -- replacement (aux) matrix -----------------------------------------
    def replacement_matrix(self, mesh: AlgebraicMesh) -> sp.spmatrix:
        """A-hat from rigid-body edge energies.

        Edge (i,j), midpoint m: K_e = w_e * [Qim, -Qjm]^T [Qim, -Qjm]
        (the reference's `CalcRMBlock`, elasticity_energy.hpp /
        aux_mat.hpp) + vertex-weight * identity on displacement DOFs.
        """
        nv, dpv = mesh.nv, self.dpv
        pos = mesh.vertex_data["pos"]
        i, j = mesh.edges[:, 0], mesh.edges[:, 1]
        w = mesh.edge_data["wt"]
        mid = 0.5 * (pos[i] + pos[j])
        Qim = self.transport(pos[i], mid)
        Qjm = self.transport(pos[j], mid)
        wQi = w[:, None, None] * Qim
        Bii = np.einsum("eki,ekj->eij", Qim, wQi)
        Bjj = np.einsum("eki,ekj->eij", Qjm, w[:, None, None] * Qjm)
        Bij = -np.einsum("eki,ekj->eij", Qim, w[:, None, None] * Qjm)
        Bji = np.transpose(Bij, (0, 2, 1))

        ne = mesh.ne
        rows = np.concatenate([i, j, i, j, np.arange(nv)])
        cols = np.concatenate([i, j, j, i, np.arange(nv)])
        vwt = mesh.vertex_data["l2wt"]
        Dv = np.zeros((nv, dpv, dpv))
        idx = np.arange(self.dim)
        Dv[:, idx, idx] = vwt[:, None]
        blocks = np.concatenate([Bii, Bjj, Bij, Bji, Dv], axis=0)
        # assemble BSR via COO-of-blocks
        order = np.lexsort((cols, rows))
        rows, cols, blocks = rows[order], cols[order], blocks[order]
        # sum duplicate (row, col) blocks
        key = rows * nv + cols
        uniq, first = np.unique(key, return_index=True)
        summed = np.add.reduceat(blocks, first, axis=0)
        urows, ucols = uniq // nv, uniq % nv
        indptr = np.zeros(nv + 1, dtype=np.int64)
        np.add.at(indptr, urows + 1, 1)
        indptr = np.cumsum(indptr)
        return sp.bsr_matrix(
            (summed, ucols.astype(np.int32), indptr),
            shape=(nv * dpv, nv * dpv),
        )

    # -- coarse data mapping ----------------------------------------------
    def map_data(self, mesh, v2agg, n_agg, coarse_edges, e2ce):
        cmesh = AlgebraicMesh(nv=n_agg, edges=coarse_edges)
        wt = np.zeros(len(coarse_edges))
        m = e2ce >= 0
        np.add.at(wt, e2ce[m], mesh.edge_data["wt"][m])
        cmesh.edge_data["wt"] = wt
        l2 = np.zeros(n_agg)
        act = v2agg >= 0
        np.add.at(l2, v2agg[act], mesh.vertex_data["l2wt"][act])
        cmesh.vertex_data["l2wt"] = l2
        pos = mesh.vertex_data["pos"]
        cpos = np.zeros((n_agg, pos.shape[1]))
        cnt = np.zeros(n_agg)
        np.add.at(cpos, v2agg[act], pos[act])
        np.add.at(cnt, v2agg[act], 1.0)
        cmesh.vertex_data["pos"] = cpos / np.maximum(cnt, 1.0)[:, None]
        return cmesh
