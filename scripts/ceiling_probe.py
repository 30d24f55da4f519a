"""Single-chip DoF ceiling probe (docs/SCALING.md).

Runs the structured 3D-Poisson pipeline at a given N (n_dof = N^3) on the
real TPU: setup + a few PCG iterations + the f64 defect-correction path,
reporting peak HBM if available. Round-2 ceiling was ~83M (N=436)
compile-OOM in the f64 refinement temporaries; the slab-chunked f64
residual (precond/amg.py, commit 9c37185) is expected to move it past
100M (N=465 -> 100.5M, N=480 -> 110.6M).

Usage: timeout 3000 python scripts/ceiling_probe.py 465
"""

import sys
import time

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 465
    from ngsamg_tpu.utils.jaxcfg import enable_persistent_cache

    enable_persistent_cache()
    from ngsamg_tpu import AMGOptions, AMGPreconditioner
    from ngsamg_tpu.config import SmootherOptions, SmootherType
    from ngsamg_tpu.utils import fem

    t0 = time.perf_counter()
    prob = fem.poisson_3d(n)
    print(f"assembled n={prob.n:,} in {time.perf_counter()-t0:.1f}s",
          flush=True)
    opts = AMGOptions()
    opts.smoother = SmootherOptions(type=SmootherType("chebyshev"))
    t0 = time.perf_counter()
    pc = AMGPreconditioner(prob.A, coords=prob.coords, options=opts).setup()
    t_setup = time.perf_counter() - t0
    print(f"setup {t_setup:.1f}s, levels={pc.num_levels}", flush=True)
    t0 = time.perf_counter()
    x_dev, info = pc.solve(prob.b, tol=1e-8, return_device=True)
    t_solve = time.perf_counter() - t0
    print(
        f"solve {t_solve:.1f}s iters={info.iterations} "
        f"converged={info.converged} relres={info.relres:.2e}",
        flush=True,
    )
    # spot-verify the residual on a host readback of a slice-free norm:
    # the device-computed true relres is authoritative here (readback of
    # ~n*8 bytes through the tunnel takes minutes at this scale)
    print(
        {
            "n_dof": prob.n,
            "setup_s": round(t_setup, 2),
            "solve_s": round(t_solve, 2),
            "iterations": int(info.iterations),
            "converged": bool(info.converged),
        },
        flush=True,
    )


if __name__ == "__main__":
    main()
