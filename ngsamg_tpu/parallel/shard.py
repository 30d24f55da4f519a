"""Multi-chip sharding of the AMG hierarchy (jax.sharding / GSPMD).

TPU-native replacement for the reference's MPI layer (SURVEY.md 2.1): the
domain decomposition of `ParallelDofs`/EQC row ownership becomes *row
sharding* of each level's block-ELL arrays over a 1-D device mesh; the
DCC/halo exchanges of `HybridMatrix`/`DCCMap`
(/root/reference/src/base/linalg/hybrid_matrix.hpp:28-144, dcc_map.hpp:20-134)
become XLA collectives inserted by GSPMD from sharding annotations; the
processor *contraction* on coarse levels (`GridContractMap`,
grid_contract.cpp:20) becomes the REPLICATION of levels smaller than
``replicate_below`` — coarse work is cheap and duplicating it removes all
communication, exactly the effect NgsAMG gets by shrinking its communicator.

Levels whose padded row count divides the mesh size are sharded row-wise;
vectors inherit the row sharding through the jitted solve (gathers of x
trigger all-gathers over ICI). An explicit ppermute-based halo-exchange
SpMV for bandwidth-bound scaling lives in :mod:`ngsamg_tpu.parallel.halo`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solve.cycle import AMGOperator, DeviceLevel
from ..smoothers.core import ChebyshevSmoother, GSSmoother, JacobiSmoother
from ..sparse.bell import BlockELL
from ..sparse.formats import (
    DenseMatrix,
    DiaMatrix,
    StencilDia,
    SupernodeELL,
    TileELL,
)


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _put(x, sharding):
    return jax.device_put(x, sharding)


def _shard_bell(A: BlockELL, mesh: Mesh, axis: str, shard: bool) -> BlockELL:
    row = (
        NamedSharding(mesh, P(axis, None, None, None))
        if shard
        else NamedSharding(mesh, P())
    )
    rowc = (
        NamedSharding(mesh, P(axis, None))
        if shard
        else NamedSharding(mesh, P())
    )
    return BlockELL(
        data=_put(A.data, row),
        cols=_put(A.cols, rowc),
        nrows=A.nrows,
        ncols=A.ncols,
        nrows_pad=A.nrows_pad,
    )


def _shard_mat(A, mesh: Mesh, axis: str, shard: bool):
    """Place any level operator format on the mesh (rows sharded or repl)."""
    repl = NamedSharding(mesh, P())
    if isinstance(A, BlockELL):
        return _shard_bell(A, mesh, axis, shard)
    if isinstance(A, SupernodeELL):
        return SupernodeELL(
            inner=_shard_bell(A.inner, mesh, axis, shard),
            nrows=A.nrows,
            nrows_pad=A.nrows_pad,
            tile_r=A.tile_r,
            tile_c=A.tile_c,
        )
    if isinstance(A, TileELL):
        rowd = (
            NamedSharding(mesh, P(axis, None, None))
            if shard
            else repl
        )
        rowc = NamedSharding(mesh, P(axis, None)) if shard else repl
        return TileELL(
            data=_put(A.data, rowd),
            cols=_put(A.cols, rowc),
            nrows=A.nrows,
            nrows_pad=A.nrows_pad,
            ncols_pad=A.ncols_pad,
            tile_m=A.tile_m,
        )
    if isinstance(A, DiaMatrix):
        sh = NamedSharding(mesh, P(None, axis)) if shard else repl
        return DiaMatrix(
            data=_put(A.data, sh),
            offsets=A.offsets,
            nrows=A.nrows,
            nrows_pad=A.nrows_pad,
            use_pallas=A.use_pallas and not shard,
            sym_half=A.sym_half,
        )
    if isinstance(A, StencilDia):
        # scalar stencil values are tiny — replicate; the n-d shift matvec
        # partitions over the leading lattice dim with x's row sharding
        return StencilDia(
            vals=_put(A.vals, repl),
            offs=A.offs,
            dims=A.dims,
            nrows=A.nrows,
            nrows_pad=A.nrows_pad,
        )
    if isinstance(A, DenseMatrix):
        return DenseMatrix(
            data=_put(A.data, repl),
            nrows=A.nrows,
            nrows_pad=A.nrows_pad,
            bs=A.bs,
        )
    from ..transfer.lattice_transfer import (
        LatticeProlongation,
        LatticeRestriction,
    )

    if isinstance(A, (LatticeProlongation, LatticeRestriction)):
        import dataclasses as _dc

        rows2 = (
            NamedSharding(mesh, P(axis, None))
            if shard and A.Dinv.shape[0] != 1
            else repl
        )
        return _dc.replace(
            A,
            A=_shard_mat(A.A, mesh, axis, shard),
            Dinv=_put(A.Dinv, rows2),
        )
    raise TypeError(type(A))


def _shard_smoother(sm, mesh: Mesh, axis: str, shard: bool):
    if sm is None:
        return None
    rows3 = (
        NamedSharding(mesh, P(axis, None, None))
        if shard
        else NamedSharding(mesh, P())
    )
    repl = NamedSharding(mesh, P())

    def dinv_sh(Dinv):
        # broadcast-scalar Dinv (uniform stencil levels) replicates
        return repl if Dinv.shape[0] == 1 else rows3

    if isinstance(sm, JacobiSmoother):
        return JacobiSmoother(
            Dinv=_put(sm.Dinv, dinv_sh(sm.Dinv)),
            omega=sm.omega,
            steps=sm.steps,
        )
    if isinstance(sm, ChebyshevSmoother):
        return ChebyshevSmoother(
            Dinv=_put(sm.Dinv, dinv_sh(sm.Dinv)),
            lam_max=_put(sm.lam_max, repl),
            lam_min=_put(sm.lam_min, repl),
            order=sm.order,
        )
    from ..smoothers.block import BlockGSSmoother

    if isinstance(sm, BlockGSSmoother):
        # block sweeps gather arbitrary rows; keep the (small) block data
        # replicated — the level matrix itself may still be sharded
        return BlockGSSmoother(
            blocks=_put(sm.blocks, repl),
            Binv=_put(sm.Binv, repl),
            color_bounds=sm.color_bounds,
            steps=sm.steps,
        )
    from ..smoothers.hiptmair import HiptmairSmoother

    if isinstance(sm, HiptmairSmoother):
        # two-space smoother: C's rows live in the level's (range) row
        # space and follow its sharding; the potential space (loops) is
        # its own row space — shard its operator/CT/pot-smoother when the
        # padded pot dimension divides the mesh, else replicate (the
        # coarse-level/contraction rule applied to the pot space)
        n = mesh.devices.size
        pot_ok = (
            shard
            and sm.A_pot.nrows_pad % n == 0
        )
        return HiptmairSmoother(
            range_sm=_shard_smoother(sm.range_sm, mesh, axis, shard),
            pot_sm=_shard_smoother(sm.pot_sm, mesh, axis, pot_ok),
            A_pot=_shard_mat(sm.A_pot, mesh, axis, pot_ok),
            C=_shard_mat(sm.C, mesh, axis, shard),
            CT=_shard_mat(sm.CT, mesh, axis, pot_ok),
        )
    if isinstance(sm, GSSmoother):
        # GS shards fine: the coloring is GLOBAL, so rows of one color are
        # mutually independent across shards — simultaneous updates within
        # a color slice need no interface modification (a stronger
        # guarantee than the reference's l1-modified interface rows,
        # hybrid_smoother.hpp CalcModDiag). GSPMD partitions each color
        # slice across the row shards; the x gathers ride ICI. This is the
        # TPU answer to the 3-stage interior/interface overlap of
        # hybrid_base_smoother.hpp:56-61 — XLA overlaps the collective
        # with the independent per-color compute.
        return GSSmoother(
            Dinv=_put(sm.Dinv, rows3),
            color_bounds=sm.color_bounds,
            steps=sm.steps,
        )
    raise TypeError(type(sm))


def shard_operator(
    op: AMGOperator,
    A0: BlockELL,
    mesh: Mesh,
    *,
    axis: str = "rows",
    replicate_below: int = 4096,
) -> tuple[AMGOperator, BlockELL]:
    """Place the hierarchy on a device mesh: fine levels row-sharded,
    coarse levels replicated (the contraction analog)."""
    n = mesh.devices.size
    repl = NamedSharding(mesh, P())

    def shardable(fmt) -> bool:
        if isinstance(fmt, DenseMatrix):
            return False
        return fmt.nrows_pad % n == 0 and fmt.nrows >= replicate_below

    new_levels = []
    for lev in op.levels:
        sa = shardable(lev.A)
        A_s = _shard_mat(lev.A, mesh, axis, sa)
        sm_s = _shard_smoother(lev.smoother, mesh, axis, sa)
        P_s = R_s = None
        if lev.P is not None:
            # P rows live on this (fine) level; R rows on the coarse level
            P_s = _shard_mat(lev.P, mesh, axis, sa)
            R_s = _shard_mat(lev.R, mesh, axis, False)
        new_levels.append(DeviceLevel(A=A_s, smoother=sm_s, P=P_s, R=R_s))
    cinv = None if op.coarse_inv is None else _put(op.coarse_inv, repl)
    op_s = AMGOperator(
        levels=tuple(new_levels), coarse_inv=cinv, cycle=op.cycle
    )
    A0_s = new_levels[0].A
    return op_s, A0_s
