"""Staggered-grid (MAC) Stokes test problems: facet-flux velocity systems.

The reference's Stokes AMG operates on facet-based velocity DOFs of
HDiv/nonconforming discretizations with a grad-grad + div-penalty ("GG")
bilinear form (/root/reference/src/stokes/, exports stokes_gg_2d etc.). The
standalone analog here is the classical MAC scheme on a structured grid:
one normal-velocity DOF per cell face, vector Laplacian + alpha * div^T div
penalty, Dirichlet (no-slip) boundary:

    K = L + alpha * D^T W D,   D = cell-wise discrete divergence.

K is SPD on the free facet DOFs and its kernel structure (near-null
divergence-free fields) is exactly what the divergence-preserving AMG must
handle. The generator also returns the geometric data the Stokes energy
needs: the dual mesh (cells x faces), face flows (areas), and cell volumes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp


@dataclass
class StokesProblem:
    A: sp.csr_matrix  # velocity system on free facet DOFs (SPD)
    b: np.ndarray
    D: sp.csr_matrix  # divergence: (ncells, nfacets) on free DOFs
    cell_pos: np.ndarray  # (ncells, dim) cell centers
    cell_vol: np.ndarray  # (ncells,)
    facet_cells: np.ndarray  # (nfacets, 2) adjacent cells, -1 = boundary
    facet_flow: np.ndarray  # (nfacets,) face area (flow weight)
    facet_pos: np.ndarray  # (nfacets, dim) face centers
    alpha: float

    @property
    def n(self):
        return self.A.shape[0]


def stokes_mac_2d(n: int = 16, alpha: float = 10.0, nu: float = 1.0):
    """MAC Stokes velocity block on an n x n unit-square grid.

    Free DOFs are the interior faces (no-slip boundary eliminated):
    vertical faces carry u_x, horizontal faces carry u_y.
    """
    h = 1.0 / n
    ncell = n * n

    def cid(i, j):
        return i * n + j

    # interior vertical faces: between cells (i,j) and (i+1,j) -> u_x
    # interior horizontal faces: between (i,j) and (i,j+1)     -> u_y
    vi, vj = np.meshgrid(np.arange(n - 1), np.arange(n), indexing="ij")
    hi, hj = np.meshgrid(np.arange(n), np.arange(n - 1), indexing="ij")
    nv = (n - 1) * n  # vertical faces
    nh = n * (n - 1)
    nf = nv + nh

    fc = np.full((nf, 2), -1, dtype=np.int64)
    fc[:nv, 0] = cid(vi, vj).ravel()
    fc[:nv, 1] = cid(vi + 1, vj).ravel()
    fc[nv:, 0] = cid(hi, hj).ravel()
    fc[nv:, 1] = cid(hi, hj + 1).ravel()

    fpos = np.zeros((nf, 2))
    fpos[:nv, 0] = (vi.ravel() + 1.0) * h
    fpos[:nv, 1] = (vj.ravel() + 0.5) * h
    fpos[nv:, 0] = (hi.ravel() + 0.5) * h
    fpos[nv:, 1] = (hj.ravel() + 1.0) * h

    flow = np.full(nf, h)  # face length in 2D

    # divergence: for cell c, sum of outgoing fluxes / vol
    rows = np.concatenate([fc[:, 0], fc[:, 1]])
    cols = np.concatenate([np.arange(nf), np.arange(nf)])
    data = np.concatenate([flow, -flow])  # out of cell0, into cell1
    D = sp.coo_matrix((data, (rows, cols)), shape=(ncell, nf)).tocsr()

    # component Laplacians on the staggered grids (5-point, no-slip):
    # u_x on the (n-1) x n vertical-face lattice, u_y on n x (n-1)
    def lap(nx, ny):
        ex = np.ones(nx)
        ey = np.ones(ny)
        Tx = sp.diags([-ex[:-1], 2 * ex, -ex[:-1]], [-1, 0, 1])
        Ty = sp.diags([-ey[:-1], 2 * ey, -ey[:-1]], [-1, 0, 1])
        # no-slip tangential walls add +1 to the boundary-normal weight;
        # keep the standard 2/h^2 scaling (constant h): factor nu
        return sp.kron(Tx, sp.eye(ny)) + sp.kron(sp.eye(nx), Ty)

    L = sp.block_diag([lap(n - 1, n), lap(n, n - 1)]).tocsr() * nu
    W = sp.diags(1.0 / (h * h) * np.ones(ncell))  # 1/vol weights
    K = (L + alpha * (D.T @ W @ D)).tocsr()
    K = (K + K.T) * 0.5

    rng = np.random.default_rng(0)
    b = rng.standard_normal(nf)
    # make the rhs consistent-ish: remove the mean flux component
    b -= b.mean()

    ii, jj = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    cpos = np.stack(
        [(ii.ravel() + 0.5) * h, (jj.ravel() + 0.5) * h], axis=1
    )
    return StokesProblem(
        A=K.tocsr(),
        b=b,
        D=D,
        cell_pos=cpos,
        cell_vol=np.full(ncell, h * h),
        facet_cells=fc,
        facet_flow=flow,
        facet_pos=fpos,
        alpha=alpha,
    )


def stokes_mac_2d_hdiv(n: int = 16, alpha: float = 10.0, nu: float = 1.0):
    """HDG-flavored facet space: normal flux + tangential trace per facet.

    The test vehicle for the HDiv-variant AMG (reference src/stokes/hdiv):
    every interior facet carries its MAC normal-flux dof; facets away from
    the domain boundary additionally carry a tangential-trace dof
    (boundary-adjacent tangential traces are eliminated by no-slip), so
    the per-facet DOF counts are VARIABLE. The operator is the MAC
    velocity block on the flux dofs plus a facet-lattice Laplacian on the
    tangential dofs (the two families decouple, as in an HDG aux space).

    Returns (StokesProblem over the joint dof space, dof_counts (nf_int,),
    preserved (ndof, 2): the facet coordinates of the constant velocity
    fields e_x, e_y).
    """
    base = stokes_mac_2d(n, alpha=alpha, nu=nu)
    nf = base.A.shape[0]
    h = 1.0 / n
    interior = (base.facet_cells >= 0).all(axis=1)
    assert interior.all()  # stokes_mac_2d already eliminates boundary
    # tangential dofs only away from the boundary (variable counts)
    p = base.facet_pos
    has_t = (p.min(axis=1) > 1.1 * h) & (p.max(axis=1) < 1.0 - 1.1 * h)
    counts = 1 + has_t.astype(np.int64)
    off = np.zeros(nf + 1, dtype=np.int64)
    off[1:] = np.cumsum(counts)
    ndof = int(off[-1])
    # scatter maps: flux dof = off[e], tangential dof = off[e]+1
    flux_dofs = off[:-1]
    tang_dofs = off[:-1][has_t] + 1
    Sf = sp.coo_matrix(
        (np.ones(nf), (flux_dofs, np.arange(nf))), shape=(ndof, nf)
    ).tocsr()
    nt = int(has_t.sum())
    St = sp.coo_matrix(
        (np.ones(nt), (tang_dofs, np.arange(nt))), shape=(ndof, nt)
    ).tocsr()
    # tangential operator: graph Laplacian over same-family facet adjacency
    # (facets sharing a cell), restricted to tangential-carrying facets
    i, j = base.facet_cells[:, 0], base.facet_cells[:, 1]
    inc = sp.coo_matrix(
        (
            np.ones(2 * nf),
            (np.concatenate([i, j]), np.concatenate([np.arange(nf)] * 2)),
        ),
        shape=(len(base.cell_vol), nf),
    ).tocsr()
    Adj = (inc.T @ inc).tolil()
    Adj.setdiag(0)
    Adj = Adj.tocsr()
    Adj.eliminate_zeros()
    Adj = Adj[has_t][:, has_t]
    deg = np.asarray(Adj.sum(axis=1)).ravel()
    Lt = (sp.diags(deg + 1.0) - Adj) * nu  # +1: no-slip boundary weight
    A = (Sf @ base.A @ Sf.T + St @ Lt @ St.T).tocsr()
    A = (A + A.T) * 0.5
    # preserved vectors: constant fields e_x, e_y in facet coordinates
    vertical = base.facet_cells[:, 1] == base.facet_cells[:, 0] + n
    V = np.zeros((ndof, 2))
    V[flux_dofs[vertical], 0] = base.facet_flow[vertical]  # ex normal flux
    V[flux_dofs[~vertical], 1] = base.facet_flow[~vertical]
    vt = vertical[has_t]
    V[tang_dofs[vt], 1] = 1.0  # vertical facet tangent = e_y
    V[tang_dofs[~vt], 0] = 1.0
    rng = np.random.default_rng(1)
    b = rng.standard_normal(ndof)
    b -= b.mean()
    prob = StokesProblem(
        A=A,
        b=b,
        D=base.D @ Sf.T,  # divergence acts on the flux components
        cell_pos=base.cell_pos,
        cell_vol=base.cell_vol,
        facet_cells=base.facet_cells,
        facet_flow=base.facet_flow,
        facet_pos=base.facet_pos,
        alpha=alpha,
    )
    return prob, counts, V


def stokes_mac_3d(n: int = 8, alpha: float = 10.0, nu: float = 1.0):
    """3D MAC Stokes velocity block on an n^3 unit-cube grid."""
    h = 1.0 / n
    ncell = n**3

    def cid(i, j, k):
        return (i * n + j) * n + k

    axes = []
    for ax in range(3):
        dims = [n, n, n]
        dims[ax] -= 1
        I, J, K = np.meshgrid(
            np.arange(dims[0]), np.arange(dims[1]), np.arange(dims[2]),
            indexing="ij",
        )
        step = [0, 0, 0]
        step[ax] = 1
        c0 = cid(I, J, K).ravel()
        c1 = cid(I + step[0], J + step[1], K + step[2]).ravel()
        pos = np.stack(
            [
                (I.ravel() + (1.0 if ax == 0 else 0.5)) * h,
                (J.ravel() + (1.0 if ax == 1 else 0.5)) * h,
                (K.ravel() + (1.0 if ax == 2 else 0.5)) * h,
            ],
            axis=1,
        )
        axes.append((c0, c1, pos, dims))

    fc = np.concatenate(
        [np.stack([a[0], a[1]], axis=1) for a in axes]
    ).astype(np.int64)
    fpos = np.concatenate([a[2] for a in axes])
    nf = len(fc)
    flow = np.full(nf, h * h)  # face area

    rows = np.concatenate([fc[:, 0], fc[:, 1]])
    cols = np.concatenate([np.arange(nf), np.arange(nf)])
    data = np.concatenate([flow, -flow])
    D = sp.coo_matrix((data, (rows, cols)), shape=(ncell, nf)).tocsr()

    def lap3(dims):
        mats = []
        for d in dims:
            e = np.ones(d)
            mats.append(sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1]))
        L = (
            sp.kron(sp.kron(mats[0], sp.eye(dims[1])), sp.eye(dims[2]))
            + sp.kron(sp.kron(sp.eye(dims[0]), mats[1]), sp.eye(dims[2]))
            + sp.kron(sp.kron(sp.eye(dims[0]), sp.eye(dims[1])), mats[2])
        )
        return L

    L = sp.block_diag([lap3(a[3]) for a in axes]).tocsr() * nu * h
    W = sp.diags(np.full(ncell, 1.0 / h**3))
    Kmat = (L + alpha * (D.T @ W @ D)).tocsr()
    Kmat = (Kmat + Kmat.T) * 0.5

    rng = np.random.default_rng(0)
    b = rng.standard_normal(nf)
    b -= b.mean()

    I, J, K2 = np.meshgrid(
        np.arange(n), np.arange(n), np.arange(n), indexing="ij"
    )
    cpos = np.stack(
        [(I.ravel() + 0.5) * h, (J.ravel() + 0.5) * h, (K2.ravel() + 0.5) * h],
        axis=1,
    )
    return StokesProblem(
        A=Kmat.tocsr(),
        b=b,
        D=D,
        cell_pos=cpos,
        cell_vol=np.full(ncell, h**3),
        facet_cells=fc,
        facet_flow=flow,
        facet_pos=fpos,
        alpha=alpha,
    )
