"""Distributed (shard-local) setup vs serial setup equality.

VERDICT round-1 #2: the hierarchy built from row-sharded inputs must match
the serial hierarchy — same aggregates, same coarse nnz (values to fp
roundoff; summation orders differ).
"""

import numpy as np
import pytest
import scipy.sparse as sp

from ngsamg_tpu import AMGOptions, SpecOpt
from ngsamg_tpu.apps.h1 import H1Energy
from ngsamg_tpu.config import CoarsenType
from ngsamg_tpu.factory.levels import setup_levels
from ngsamg_tpu.parallel.dist_setup import dist_setup_levels
from ngsamg_tpu.utils import fem


def _opts():
    # f64 so the serial Galerkin products match the distributed f64 ones
    o = AMGOptions(dtype="float64")
    o.coarsen.algo = SpecOpt(CoarsenType.SPW)  # force the algebraic path
    o.levels.max_coarse_size = 40
    return o


@pytest.mark.parametrize("n_shards", [2, 4, 7])
def test_dist_equals_serial_unstructured(n_shards):
    prob = fem.unstructured_poisson(20, dim=2)
    _check_equal(prob.A, n_shards)


@pytest.mark.parametrize("n_shards", [4])
def test_dist_equals_serial_structured(n_shards):
    # structured grids have massively tied strengths — the hash tie-break
    # must keep the shard-local matching identical to the serial one
    prob = fem.poisson_3d(8)
    _check_equal(sp.csr_matrix(prob.A), n_shards)


def _check_equal(A, n_shards):
    opts = _opts()
    en = H1Energy(bs=1)
    s_levels, s_log = setup_levels(A.tocsr(), en, opts)
    d_levels, d_log = dist_setup_levels(A, en, opts, n_shards)
    assert len(s_levels) == len(d_levels), (s_log.nvs, d_log.nvs)
    assert s_log.nvs == d_log.nvs
    for sl, dl in zip(s_levels[:-1], d_levels[:-1]):
        np.testing.assert_array_equal(sl.v2agg, dl.v2agg)
    for i, (sl, dl) in enumerate(zip(s_levels, d_levels)):
        if i == 0:
            continue
        assert sl.A.nnz == dl.A.nnz, f"level {i} nnz"
        diff = abs(sl.A - dl.A).max()
        scale = abs(sl.A).max()
        assert diff < 1e-10 * scale, f"level {i} values differ {diff:.2e}"


def test_dist_vector_h1_matches_serial_aggregates():
    """Vector (bs=2) H1 distributed setup: same aggregates and coarse nnz
    as the serial path (values agree up to the vertex-space rho estimate)."""
    base = fem.poisson_2d(20)
    prob = fem.vector_poisson(base, 2)
    opts = _opts()
    en = H1Energy(bs=2)
    s_levels, s_log = setup_levels(prob.A.tocsr(), en, opts)
    d_levels, d_log = dist_setup_levels(prob.A, en, opts, 4)
    assert s_log.nvs == d_log.nvs
    for sl, dl in zip(s_levels[:-1], d_levels[:-1]):
        np.testing.assert_array_equal(sl.v2agg, dl.v2agg)
    for i, (sl, dl) in enumerate(zip(s_levels, d_levels)):
        if i:
            assert sl.A.nnz == dl.A.nnz, f"level {i}"
    # and the hierarchy solves
    from ngsamg_tpu import AMGPreconditioner
    from ngsamg_tpu.config import SmootherOptions, SmootherType

    opts2 = _opts()
    opts2.smoother = SmootherOptions(type=SmootherType.CHEBYSHEV)
    opts2.dist_setup = 4
    pc = AMGPreconditioner(
        prob.A, block_size=2, coords=prob.coords, options=opts2
    ).setup()
    x, info = pc.solve(prob.b, tol=1e-8, maxiter=40)
    r = np.linalg.norm(prob.A @ x - prob.b) / np.linalg.norm(prob.b)
    assert info.converged and r < 1e-7, (info.iterations, r)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_dist_elasticity_equals_serial(n_shards):
    """Block-energy (elasticity) distributed setup: robust per-round
    matching, transported coarse energies, block smoothed prolongation and
    the embedding fold must reproduce the serial hierarchy — same
    aggregates per level, coarse operators to fp roundoff."""
    from ngsamg_tpu.apps.elasticity import ElasticityEnergy

    prob = fem.unstructured_elasticity(10, dim=2)
    opts = _opts()
    en_s = ElasticityEnergy(dim=2)
    s_levels, s_log = setup_levels(
        prob.A.tocsr(), en_s, opts, coords=prob.coords
    )
    en_d = ElasticityEnergy(dim=2)
    d_levels, d_log = dist_setup_levels(
        prob.A, en_d, opts, n_shards, coords=prob.coords
    )
    assert en_d._s == en_s._s  # rot_scale auto median parity
    assert s_log.nvs == d_log.nvs, (s_log.nvs, d_log.nvs)
    for sl, dl in zip(s_levels[:-1], d_levels[:-1]):
        np.testing.assert_array_equal(sl.v2agg, dl.v2agg)
    for i, (sl, dl) in enumerate(zip(s_levels, d_levels)):
        if i == 0:
            continue
        assert sl.A.nnz == dl.A.nnz, f"level {i} nnz"
        diff = abs(sl.A - dl.A).max()
        scale = abs(sl.A).max()
        assert diff < 1e-9 * scale, f"level {i} values differ {diff:.2e}"


def test_dist_elasticity_hierarchy_solves():
    """The distributed elasticity hierarchy plugs into the device solve."""
    from ngsamg_tpu import AMGPreconditioner
    from ngsamg_tpu.config import SmootherOptions, SmootherType

    prob = fem.unstructured_elasticity(9, dim=2)
    opts = _opts()
    opts.smoother = SmootherOptions(type=SmootherType.CHEBYSHEV)
    opts.dist_setup = 4
    pc = AMGPreconditioner(
        prob.A, coords=prob.coords, options=opts
    ).setup()
    x, info = pc.solve(prob.b, tol=1e-8, maxiter=80)
    r = np.linalg.norm(prob.A @ x - prob.b) / np.linalg.norm(prob.b)
    assert info.converged and r < 1e-7, (info.iterations, r)


def test_dist_hierarchy_solves():
    """The distributed-setup hierarchy plugs into the device solve."""
    from ngsamg_tpu import AMGPreconditioner
    from ngsamg_tpu.config import SmootherOptions, SmootherType

    prob = fem.unstructured_poisson(24, dim=2)
    opts = _opts()
    opts.smoother = SmootherOptions(type=SmootherType.CHEBYSHEV)
    pc = AMGPreconditioner(prob.A, coords=prob.coords, options=opts)
    pc.setup_levels_, pc.log_ = dist_setup_levels(
        prob.A, H1Energy(bs=1), opts, 4
    )
    pc._compile_device()
    pc._is_setup = True
    x, info = pc.solve(prob.b, tol=1e-8, maxiter=60)
    r = np.linalg.norm(prob.A @ x - prob.b) / np.linalg.norm(prob.b)
    assert info.converged and r < 1e-7, (info.iterations, r)


def test_collective_transport_parity():
    """The SAME setup program over the XLA-collective transport.

    Every exchange runs as a jitted shard_map/all_to_all program on the
    8-virtual-device mesh (parallel/transport.py) — the multi-controller
    communication pattern — and must reproduce the LocalTransport
    hierarchy exactly (payloads are bit-cast, so arithmetic is identical;
    only CSR duplicate coalescing order may differ -> fp-tolerance check).
    """
    import jax

    from ngsamg_tpu.parallel.transport import (
        CollectiveTransport,
        use_transport,
    )

    prob = fem.unstructured_poisson(14, dim=2)
    opts = _opts()
    en = H1Energy(bs=1)
    n_shards = len(jax.devices())
    l_levels, l_log = dist_setup_levels(prob.A, en, opts, n_shards)
    t = CollectiveTransport()
    with use_transport(t):
        c_levels, c_log = dist_setup_levels(prob.A, en, opts, n_shards)
    assert t.calls > 0, "collective transport never exercised"
    assert l_log.nvs == c_log.nvs
    for ll, cl in zip(l_levels[:-1], c_levels[:-1]):
        np.testing.assert_array_equal(ll.v2agg, cl.v2agg)
    for i, (ll, cl) in enumerate(zip(l_levels, c_levels)):
        if i == 0:
            continue
        diff = abs(ll.A - cl.A).max()
        scale = abs(ll.A).max()
        assert diff < 1e-12 * scale, f"level {i} values differ {diff:.2e}"


def test_dist_setup_shard_residency():
    """Per-shard peak memory stays ~1/n of the global matrix."""
    prob = fem.unstructured_poisson(24, dim=2)
    opts = _opts()
    # at toy scale EVERY coarse level is below the contraction floor and
    # would concentrate on shard 0; pin the TryContractStep knobs off so
    # the test measures the uncontracted residency scaling (production
    # problems only contract levels far smaller than the finest)
    opts.levels.rd_min_rows = 1
    opts.levels.rd_slow_ratio = 2.0
    n_shards = 8
    _levels, log = dist_setup_levels(prob.A, H1Energy(bs=1), opts, n_shards)
    assert log.finest_global_bytes > 0 and log.peak_shard_bytes > 0
    # one shard's whole level-loop state (its rows of A, W, l2, P, Ac
    # across the active level pair) must be far below the global matrix;
    # 4/n covers the ~3.5x per-rank working-set factor, and scales 1/n
    assert log.peak_shard_bytes < log.finest_global_bytes * 4.0 / n_shards


def test_try_contract_step_in_loop():
    """TryContractStep analog (base_factory.cpp:573-682): the level loop
    itself decides to concentrate coarse levels onto fewer shards —
    earlier under slow coarsening — logging each decision; ownership
    changes, values don't."""
    from ngsamg_tpu.parallel.dist_setup import (
        _scalar_levels_parts,
        split_rows,
    )

    prob = fem.unstructured_poisson(40, dim=2)
    A = prob.A.tocsr().astype(np.float64)

    def run(rd_min_rows, rd_slow_ratio):
        o = _opts()
        o.levels.max_coarse_size = 20
        o.levels.rd_min_rows = rd_min_rows
        o.levels.rd_slow_ratio = rd_slow_ratio
        parts, starts = split_rows(A, 4)
        recs, log = _scalar_levels_parts(parts, starts, o, H1Energy(bs=1))
        return recs, log

    # no contraction: huge slow threshold, tiny min-rows floor
    r_none, log_none = run(rd_min_rows=1, rd_slow_ratio=2.0)
    assert log_none.contract_decisions == []
    assert all(k == 4 for k in log_none.shards_per_level)

    # min-rows floor triggers: coarse levels concentrate
    r_min, log_min = run(rd_min_rows=200, rd_slow_ratio=2.0)
    assert log_min.contract_decisions, "min_rows must trigger contraction"
    assert log_min.shards_per_level[-1] < 4
    assert any("min_rows" in d[3] for d in log_min.contract_decisions)

    # slow coarsening contracts where the floor alone would not: with the
    # floor disabled (rd_min_rows=1), lowering the slow threshold from
    # 2.0 (never) to 0.2 makes the loop contract
    r_slow, log_slow = run(rd_min_rows=1, rd_slow_ratio=0.2)
    assert log_slow.contract_decisions, (
        "slow-coarsening trigger must contract where the floor did not"
    )
    assert any(
        "slow_coarsening" in d[3] for d in log_slow.contract_decisions
    )

    # contraction is ownership-only: the assembled hierarchy equals the
    # no-contraction one (same sparsity; values to fp roundoff — scipy's
    # COO->CSR duplicate summation order shifts with the per-owner row
    # counts)
    assert len(r_none) == len(r_min)
    for ra, rb in zip(r_none, r_min):
        Aa = sp.vstack(ra["Ac_parts"], format="csr")
        Ab = sp.vstack(rb["Ac_parts"], format="csr")
        assert Aa.nnz == Ab.nnz
        assert abs(Aa - Ab).max() < 1e-12 * abs(Aa).max()
        Pa = sp.vstack(ra["P_parts"], format="csr")
        Pb = sp.vstack(rb["P_parts"], format="csr")
        assert abs(Pa - Pb).max() < 1e-12 * max(abs(Pa).max(), 1.0)
    # ...with trailing shards owning EMPTY ranges after contraction
    last = r_min[-1]
    k = log_min.shards_per_level[-1]
    for t in range(k, 4):
        assert last["Ac_parts"][t].shape[0] == 0


def test_try_contract_under_mp_transport():
    """Contracted levels run one-process-per-rank: ranks beyond the
    active group keep participating with empty ranges (the reference's
    idle dropped ranks) and the hierarchy equals the single-controller
    one bitwise."""
    from ngsamg_tpu.parallel.mp_runtime import mp_dist_setup_levels

    prob = fem.unstructured_poisson(24, dim=2)
    A = prob.A.tocsr()
    o = _opts()
    o.levels.max_coarse_size = 20
    o.levels.rd_min_rows = 60  # forces contraction on coarse levels
    s_levels, s_log = dist_setup_levels(A, H1Energy(bs=1), o, 4)
    m_levels, m_log = mp_dist_setup_levels(A, H1Energy(bs=1), o, 4)
    assert s_log.contract_decisions and (
        s_log.contract_decisions == m_log.contract_decisions
    )
    for sl, ml in zip(s_levels, m_levels):
        assert abs(sl.A - ml.A).max() == 0.0
