#!/usr/bin/env python
"""1M-atom sharded-step demonstration (BASELINE.md scale-out row).

Builds a 1,000,000-atom (200k-molecule) SWM4-NDP water box, shards the
force pass over an 8-device mesh (work-sharded engine: slab-sharded sweep,
sharded PME spreading, psum-merged forces), and runs one full TGNH step.
On a CPU host this uses 8 virtual devices (run directly:
`python scripts/dryrun_1m.py`); on a v5e-8 slice the same code uses the
real chips.  Memory: the replicated per-device state at 1M atoms is
~100 MB — far below a v5e's 16 GB HBM, which is why the work-sharded
(replicated-state) decomposition is the performance-correct cut at this
scale (parallel/sharded.py docstring)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the collective-call timeouts matter on a low-core host: 8 virtual
# devices time-slice the cores, so heavy per-device programs reach a
# ppermute rendezvous minutes apart (XLA's default 40 s terminate timeout
# kills the process; a virtual-device artifact, not a program property)
_FLAGS = ("--xla_force_host_platform_device_count=8"
          " --xla_cpu_collective_call_warn_stuck_timeout_seconds=3600"
          " --xla_cpu_collective_call_terminate_timeout_seconds=7200")

if "--cpu" in sys.argv and _FLAGS not in os.environ.get("XLA_FLAGS", ""):
    if "jax" in sys.modules:
        # a sitecustomize (e.g. the axon TPU plugin's) already imported
        # jax, so env edits are too late — re-exec with the flags set
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " " + _FLAGS)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " " + _FLAGS)

import time

import numpy as np


def main():
    import jax
    if "--cpu" in sys.argv:
        # the axon plugin overrides JAX_PLATFORMS; force CPU after import
        jax.config.update("jax_platforms", "cpu")
    from openmm_drudenose_tpu.utils import compile_cache
    # persistent executables make repeat 1M attempts cheap (the XLA-CPU
    # resident compile alone is ~15 min on this 1-core host)
    compile_cache.enable("/tmp/jaxcache")
    if "--log-compiles" in sys.argv:
        # stamp each XLA compile start (which program OOMs the CPU host?)
        jax.config.update("jax_log_compiles", True)
    if jax.device_count() < 8:
        raise SystemExit("need 8 devices (run with --cpu and "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8"
                         " set before jax initializes)")
    import jax.numpy as jnp
    from jax.sharding import Mesh

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel import sharded

    n_mol = 200_000
    for a in sys.argv:
        # --mol=N: smaller demonstrations (the CPU backend OOMs compiling
        # the 1M-atom RESIDENT programs on a 125 GB host — an emulation
        # artifact; the work-sharded 1M path compiles and runs)
        if a.startswith("--mol="):
            n_mol = int(a.split("=")[1])
    t0 = time.time()
    system, positions = builders.build_water_box(n_mol)
    print(f"built 1M-atom system ({time.time()-t0:.0f}s)")

    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    # gx % 8 == 0 makes the x-slab resident decomposition valid AND the
    # work-sharded engine's flattened cell count divisible by the mesh
    nb_options = {"grid_x_multiple": 8}
    for a in sys.argv:
        # --cap=N: cell capacity override.  A fresh-lattice start has
        # near-uniform occupancy (~30/cell), so the equilibrium-headroom
        # default (48) only inflates the (cells, C, C) sweep temporaries
        # that OOM the emulation host; the cs_overflow latch raises
        # honestly if the cap is wrong
        if a.startswith("--cap="):
            nb_options["capacity"] = int(a.split("=")[1])
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair",
                     nb_options=nb_options)
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    print(f"context ready: grid {ctx._cp_cfg.grid}, "
          f"capacity {ctx._cp_cfg.capacity} ({time.time()-t0:.0f}s)")

    n_slabs = 8
    for a in sys.argv:
        # --slabs=N: smaller boxes need fewer slabs (each slab must span
        # >= the 4-plane halo)
        if a.startswith("--slabs="):
            n_slabs = int(a.split("=")[1])
    mesh = Mesh(np.array(jax.devices()[:n_slabs]), ("atom",))
    if "--resident" in sys.argv:
        # state-resident decomposition: molecule-sharded state + migration
        # (box ~18 nm -> 32 cell planes = 4 planes/slab, the halo minimum)
        # --rc= / --ec= override the per-slab molecule / migration
        # capacities: the XLA-CPU compile footprint at 1M atoms scales
        # with them, and a one-step demonstration needs no migration slack
        # (VERDICT round-3 item 4)
        from openmm_drudenose_tpu.parallel import resident
        Rc = Ec = None
        for a in sys.argv:
            if a.startswith("--rc="):
                Rc = int(a.split("=")[1])
            if a.startswith("--ec="):
                Ec = int(a.split("=")[1])
        rctx = resident.ResidentContext(ctx, mesh, Rc=Rc, Ec=Ec)
        rctx.step(1)
        pos = rctx.positions()
        assert bool(np.all(np.isfinite(pos))), "non-finite positions"
        print(f"1M-atom STATE-RESIDENT TGNH step OK over {mesh.shape} mesh "
              f"({time.time()-t0:.0f}s total)")
        return
    sctx = sharded.ShardedContext(ctx, mesh)
    sctx.step(1)
    pos = sctx.state.positions
    assert bool(jnp.all(jnp.isfinite(pos))), "non-finite positions"
    print(f"1M-atom sharded TGNH step OK over {mesh.shape} mesh "
          f"({time.time()-t0:.0f}s total)")


if __name__ == "__main__":
    main()
