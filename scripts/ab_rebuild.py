#!/usr/bin/env python
"""A/B the neighbor-rebuild placement on the real TPU, one process:
  A: bare 64-step scan, neighbors invariant (floor)
  B: segmented in-scan rebuilds (make_multi_step with neighbor_fn)
  C: host loop of [jitted rebuild] + [16-step scan] x 4
  D: segmented, but rebuild REUSES the carried cellsort (sort-free
     re-reference: only ref_positions/image refresh)  [lower bound for
     in-scan refresh cost]
"""
import os
import time

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")

import jax
import jax.numpy as jnp


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    return best * 1e3


def main():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    import openmm_drudenose_tpu as dn  # noqa
    from openmm_drudenose_tpu.integrators import tgnh

    ctx, integ = bench.build_context(100_000, "single", None)
    ctx, integ = bench.equilibrate(ctx, integ, 100_000, "single", 1000)
    ctx._ensure_forces()
    spec, static, st = ctx._spec, ctx._static, ctx._state

    # A: bare
    bare = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces, 64,
                                        forces_fn=ctx._forces_only))
    tA = timeit(lambda: bare(spec, st))
    print(f"A bare 64-scan            : {tA/64:7.2f} ms/step")

    # B: segmented in-scan rebuilds
    seg = ctx._get_step_fn(64)
    tB = timeit(lambda: seg(spec, st))
    print(f"B segmented in-scan       : {tB/64:7.2f} ms/step")

    # C: host loop rebuild + 16-scan
    reb = jax.jit(ctx._neighbor_fn)
    s16 = jax.jit(tgnh.make_multi_step(static, ctx._energy_and_forces, 16,
                                       forces_fn=ctx._forces_only))

    def host_loop(state):
        for _ in range(4):
            nbl = reb(state.positions, state.box)
            state = state._replace(neighbors=nbl)
            state = s16(spec, state)
        return state
    tC = timeit(host_loop, st)
    print(f"C host rebuild + 16-scans : {tC/64:7.2f} ms/step")

    # D: segmented with sort-free refresh (not physics-correct; cost probe)
    def fake_neighbor_fn(positions, box):
        return st.neighbors._replace(
            ref_positions=positions,
            image=jnp.floor(positions / jnp.diagonal(box)).astype(
                st.neighbors.image.dtype))
    segD = jax.jit(tgnh.make_multi_step(
        static, ctx._energy_and_forces, 64,
        neighbor_fn=fake_neighbor_fn, rebuild_interval=16,
        forces_fn=ctx._forces_only, skin=ctx._cp_cfg.skin))
    tD = timeit(lambda: segD(spec, st))
    print(f"D segmented, sort-free    : {tD/64:7.2f} ms/step")

    # rebuild alone
    tR = timeit(lambda: reb(st.positions, st.box))
    print(f"rebuild alone             : {tR:7.2f} ms")


if __name__ == "__main__":
    main()
