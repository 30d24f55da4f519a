"""H1 AMG convergence tests.

Mirrors the reference H1 test matrix (/root/reference/tests/h1/simple and
tests/h1/jump; budgets from test_2d_lo.py:12 (<30), jump tests (<30-60),
test_vec.py:54-69 (<30)). Oracle = iteration counts + relative residual, as
in the reference (amg_utils.py:361-362).
"""

import pytest

from amg_utils import solve_and_check
from ngsamg_tpu import AMGOptions, CycleType, SpecOpt
from ngsamg_tpu.utils import fem


def test_2d_lo():
    pc, _x, info = solve_and_check(fem.poisson_2d(48), ms=30)
    assert pc.num_levels >= 2
    assert pc.operator_complexity < 2.5


def test_2d_lo_bigger():
    solve_and_check(fem.poisson_2d(96), ms=30)


def test_2d_jump():
    solve_and_check(fem.poisson_2d(64, jump=True), ms=60)


def test_3d_lo():
    solve_and_check(fem.poisson_3d(12), ms=30)


def test_3d_jump():
    solve_and_check(fem.poisson_3d(14, jump=True), ms=60)


@pytest.mark.parametrize("bs", [2, 3])
def test_vec_h1(bs):
    """Vector-valued (multidim) H1 — identical graph per component."""
    prob = fem.vector_poisson(fem.poisson_2d(32), bs)
    solve_and_check(prob, ms=30)


def test_w_cycle():
    opts = AMGOptions(cycle=CycleType.W)
    solve_and_check(fem.poisson_2d(48), ms=30, options=opts)


def test_bs_cycle():
    opts = AMGOptions(cycle=CycleType.BS)
    solve_and_check(fem.poisson_2d(48), ms=30, options=opts)


def test_piecewise_prol():
    """Piecewise-only prolongation converges (more iterations allowed)."""
    opts = AMGOptions()
    opts.prol.type = SpecOpt("piecewise")
    solve_and_check(fem.poisson_2d(48), ms=60, options=opts)


def test_eig_bounds():
    """Spectral self-test (the reference's ngs_amg_do_test)."""
    pc, _x, _info = solve_and_check(fem.poisson_2d(48), ms=30)
    lmin, lmax = pc.test(40)
    assert lmax < 1.05
    assert lmin > 0.05
    assert lmax / max(lmin, 1e-12) < 20.0
