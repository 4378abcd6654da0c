#!/usr/bin/env python
"""64-replica vmap ensemble throughput on the current device — the
single-chip half of BASELINE.md's scale-out row ("64-replica vmap
ensemble" / BASELINE.json config 5).

Runs N independent SWM4-NDP water replicas (~4k atoms each, PME +
cellpair, TGNH, hard wall — BASELINE.json config 2's system) as one
vmapped multi-step with per-replica in-scan neighbor rebuilds, and
reports per-replica step time and AGGREGATE ensemble ns/day.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--replicas", type=int, default=64)
    p.add_argument("--molecules", type=int, default=800)  # 4k atoms
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--strategy", default="auto",
                   help="nonbonded strategy (auto resolves to the dense "
                        "all-pairs sweep at <= 4096 atoms)")
    p.add_argument("--flat", action="store_true",
                   help="use the flattened embedded-grid ensemble "
                        "(parallel/flatrep.py) instead of the vmap one")
    p.add_argument("--rx", type=int, default=None,
                   help="flat ensemble replica-grid factor along x "
                        "(default: auto)")
    p.add_argument("--capacity", type=int, default=0)
    args = p.parse_args()

    import jax
    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel.ensemble import ReplicaEnsemble
    from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble

    system, positions = builders.build_water_box(args.molecules)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    nb = {"capacity": args.capacity} if args.capacity else {}
    ctx = dn.Context(system, integ, precision="single",
                     strategy=args.strategy, nb_options=nb)
    ctx.setPositions(positions)
    # settle the lattice start per replica before timing
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    integ.step(500)

    n_atoms = args.molecules * 5
    if args.flat:
        ens = FlatReplicaEnsemble(ctx, n_replicas=args.replicas,
                                  rx=args.rx, seed=7)
        state_pos = lambda: ens.context._state.positions
    else:
        ens = ReplicaEnsemble(ctx, n_replicas=args.replicas, seed=7)
        state_pos = lambda: ens.state.positions
    ens.setVelocitiesToTemperature(300.0, seed=3)

    ens.step(args.steps)           # compile + settle divergent replicas
    ke = np.asarray(ens.kinetic_energies())
    assert np.all(np.isfinite(ke)), "non-finite replica KE"

    best = 0.0
    for _ in range(args.repeats):
        t0 = time.time()
        ens.step(args.steps)
        jax.block_until_ready(state_pos())
        best = max(best, args.steps / (time.time() - t0))
    ke = np.asarray(ens.kinetic_energies())
    assert np.all(np.isfinite(ke)), "non-finite replica KE after timing"

    ns_day_each = best * 1e-3 * 1e-3 * 86400.0     # 1 fs steps
    print(f"{args.replicas} replicas x {n_atoms} atoms "
          f"({args.replicas * n_atoms} total):")
    print(f"  ensemble step rate : {best:8.1f} steps/s "
          f"({1e3 / best:.2f} ms/step)")
    print(f"  per-replica        : {ns_day_each:8.3f} ns/day")
    print(f"  AGGREGATE          : {ns_day_each * args.replicas:8.2f} "
          f"ns/day across the ensemble")


if __name__ == "__main__":
    main()
