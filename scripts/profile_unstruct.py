"""Profile the unstructured (tile-ELL-stack) V-cycle on the TPU.

Diagnoses the bench's unstructured solve_s: times one jitted cycle
apply, one finest-level SpMV, and reports the compiled HLO op count of
the cycle (the axon backend pays ~0.55 ms fixed overhead per op
EXECUTION, so cycle op count — not FLOPs — can dominate at ~1M DoF).

Usage:  python scripts/profile_unstruct.py [n [refine]]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from ngsamg_tpu.utils.jaxcfg import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
import jax  # noqa: E402

from ngsamg_tpu import AMGOptions, AMGPreconditioner  # noqa: E402
from ngsamg_tpu.config import SmootherOptions, SmootherType  # noqa: E402
from ngsamg_tpu.solve.cycle import amg_apply  # noqa: E402
from ngsamg_tpu.sparse.formats import matvec  # noqa: E402
from ngsamg_tpu.utils import fem  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    refine = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    import pickle
    import os

    tag = f".bench_cache/unstruct3d_{n}_r{refine}.pkl"
    if os.path.exists(tag):
        with open(tag, "rb") as f:
            prob = pickle.load(f)
    else:
        prob = fem.unstructured_poisson(n, dim=3, refine=refine)
    opts = AMGOptions()
    opts.smoother = SmootherOptions(type=SmootherType.CHEBYSHEV)
    t0 = time.perf_counter()
    pc = AMGPreconditioner(prob.A, coords=prob.coords, options=opts).setup()
    print(f"setup {time.perf_counter()-t0:.1f}s  levels={pc.num_levels}")
    for i, lev in enumerate(pc.op.levels):
        nb = (
            len(lev.A.blocks)
            if hasattr(lev.A, "blocks")
            else 1
        )
        print(f"  L{i} {type(lev.A).__name__:14s} nrows={lev.A.nrows:9d} "
              f"buckets={nb} sm={type(lev.smoother).__name__ if lev.smoother else None}")
    b = pc._to_dev(prob.b)

    # compiled cycle: op count + timed applies
    fn = jax.jit(amg_apply)
    lowered = fn.lower(pc.op, b)
    comp = lowered.compile()
    try:
        hlo = comp.as_text()
        nops = hlo.count("\n  ")  # rough HLO instruction count
        print(f"cycle HLO ~{nops} instructions")
    except Exception as e:
        print("hlo dump failed:", e)
    z = fn(pc.op, b)
    jax.block_until_ready(z)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        z = fn(pc.op, b)
        jax.block_until_ready(z)
        ts.append(time.perf_counter() - t0)
    print(f"cycle apply: min {min(ts)*1e3:.1f} ms over 5 "
          f"(all: {[round(t*1e3,1) for t in ts]})")

    # finest-level SpMV alone
    A0 = pc.op.levels[0].A
    mv = jax.jit(lambda x: matvec(A0, x))
    y = mv(b)
    jax.block_until_ready(y)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        y = mv(b)
        jax.block_until_ready(y)
        ts.append(time.perf_counter() - t0)
    print(f"L0 SpMV: min {min(ts)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
