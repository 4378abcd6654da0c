#!/usr/bin/env python
"""On-chip numerical parity of the Pallas force-only sweep vs the XLA
half-stencil sweep (the interpret-mode test runs on CPU; this one runs the
real Mosaic kernel).  Run on the TPU:

    python scripts/check_pallas_tpu.py [--atoms 20000]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=50000)
    ap.add_argument("--debug", action="store_true")
    args = ap.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.forces import cellpair as cp
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.ops import pallas_sweep

    system, positions = builders.build_water_box(args.atoms // 5)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    ctx._ensure_forces()
    # a few dynamics steps so positions have drifted off the rebuild
    integ.step(5)

    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    cfg = nb_fn.cellpair_cfg
    assert pallas_sweep.supports(cfg, jnp.float32), "config unsupported"
    st = ctx._state
    box_diag = jnp.diagonal(st.box)
    pme = nb_fn.pme_setup

    f_pal = jax.jit(lambda p: pallas_sweep.pair_forces_pallas(
        nb_params, p, box_diag, st.neighbors, cfg, "ewald",
        alpha=pme.alpha))(st.positions)
    _, f_xla = jax.jit(lambda p: cp.pair_energy_forces(
        nb_params, p, box_diag, st.neighbors, cfg, nb_fn.pair_eg,
        nb_fn.coulomb_scale, with_energy=False))(st.positions)
    f_pal, f_xla = np.asarray(f_pal), np.asarray(f_xla)
    scale = np.abs(f_xla).max()
    err = np.abs(f_pal - f_xla).max() / scale
    print(f"atoms={ctx._static.n_atoms} grid={cfg.grid} C={cfg.capacity} "
          f"max|F|={scale:.1f} rel err={err:.3e}")
    if args.debug:
        gx, gy, gz = cfg.grid
        C = cfg.capacity
        perr = np.abs(f_pal - f_xla).max(axis=1) / scale
        bad = perr > 1e-4
        slots = np.asarray(st.neighbors.inv_slot)
        cell = slots // C
        sic = slots % C
        cx = cell // (gy * gz)
        cy = (cell // gz) % gy
        cz = cell % gz
        print(f"bad atoms: {bad.sum()} / {len(bad)}")
        for name, v, nbins in (("cx", cx, gx), ("cy", cy, gy),
                               ("cz", cz, gz), ("slot", sic, C)):
            h = np.bincount(v[bad], minlength=nbins)
            ha = np.bincount(v, minlength=nbins)
            frac = h / np.maximum(ha, 1)
            print(f"  by {name}: " + " ".join(f"{x:.2f}" for x in frac))
    assert err < 5e-5, f"Pallas/XLA force mismatch {err}"
    print("PASS: Pallas sweep matches the XLA sweep on chip")


if __name__ == "__main__":
    main()
