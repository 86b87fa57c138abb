#!/usr/bin/env python
"""Fleet calibration throughput on the real TPU: one vmapped solve vs the
best sequential alternative (64 enqueued single-rig solves, one final
fetch — the dispatch pipeline already overlaps them, so this is the
strongest baseline a host loop can reach).

Each rig is 4 cams x 16 images, grid 10 (~5.4k detections) — the regime
where a solo solve sits on the tunnel/dispatch floor (~3-8 ms regardless
of compute). Batching R rigs into one jitted jax.vmap'd LM amortises that
floor across the fleet.

Run: python benchmarks/fleet_bench.py [n_rigs]
Results land in docs/performance.md (manual; not part of bench.py —
bench.py exports the fleet solve time as its own metric line).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import fetch_scalar, fleet_problem, log, perturbed  # noqa: E402


def main():
    import jax

    n_rigs = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    log(f"backend={jax.default_backend()} n_rigs={n_rigs}")

    solve, pieces, args, n_real, solve1 = fleet_problem(n_rigs=n_rigs)
    uv, mask, tpl = args

    # --- fleet: one vmapped solve ---------------------------------------
    t0 = time.perf_counter()
    res = solve(pieces, *args)
    cost = fetch_scalar(res.cost)
    log(f"fleet first call {time.perf_counter() - t0:.1f}s "
        f"rms={np.sqrt(cost / (2 * n_real)):.4f} "
        f"nit_max={int(np.asarray(res.nit).max())}")
    plist = perturbed(pieces, 4)

    def run_fleet(k):
        t0 = time.perf_counter()
        r = None
        for i in range(k):
            r = solve(plist[i % len(plist)], *args)
        fetch_scalar(r.cost)
        return time.perf_counter() - t0

    t_lo, t_hi = run_fleet(1), run_fleet(4)
    fleet_s = max((t_hi - t_lo) / 3, 1e-9)
    log(f"fleet solve: {fleet_s * 1e3:.1f} ms for {n_rigs} rigs "
        f"= {n_rigs / fleet_s:.0f} rigs/s")

    # --- sequential: n_rigs enqueued single-rig solves ------------------
    from pycamset_tpu.optim.structured import ParamPieces

    def rig_slice(r):
        p = ParamPieces(*(a[r] for a in pieces))
        return p, uv[r], mask[r], tpl[r]

    rigs = [rig_slice(r) for r in range(n_rigs)]

    def run_seq(k):
        t0 = time.perf_counter()
        r = None
        for _ in range(k):
            for p, u, m, t in rigs:
                r = solve1(p, u, m, t)
        fetch_scalar(r.cost)
        return time.perf_counter() - t0

    run_seq(1)  # compile + bring-up
    t_lo, t_hi = run_seq(1), run_seq(3)
    seq_s = max((t_hi - t_lo) / 2, 1e-9)
    log(f"sequential solve: {seq_s * 1e3:.1f} ms for {n_rigs} rigs "
        f"= {n_rigs / seq_s:.0f} rigs/s")
    log(f"fleet speedup: {seq_s / fleet_s:.2f}x")


if __name__ == "__main__":
    main()
