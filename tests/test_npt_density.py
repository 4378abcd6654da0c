"""NPT statistical validation: SWM4-NDP water density under the MC barostat.

The reference example's whole point is an NPT density equilibration
(/root/reference/example/nacl_tg.py:56-95); this pins the barostat +
force-field combination to the published SWM4-NDP observables
(Lamoureux et al. 2006: rho = 0.994 g/mL, U = -41.5 kJ/mol at 298 K).
A 500-molecule f32 TPU run reproduces rho = 0.987 g/mL and
U = -41.3 kJ/mol at 300 K; this CI version uses a small box + short
sampling, so tolerances are wide — it exists to catch systematic errors
(the TIP4P-Ew-weights M-site bug it was written against produced 1.17 g/mL
and -82 kJ/mol, far outside the band).
"""

import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import builders


@pytest.mark.slow
def test_swm4_npt_density():
    n_mol = 64
    system, positions = builders.build_water_box(n_mol, cutoff=0.58)
    system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 25))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double", strategy="dense")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=2)

    integ.step(6000)  # equilibrate
    mass_g = n_mol * 18.0154 / 6.02214076e23
    dens = []
    pe = []
    for _ in range(16):
        integ.step(500)
        box = np.asarray(ctx._state.box)
        vol_ml = np.prod(np.diagonal(box)) * 1e-21
        dens.append(mass_g / vol_ml)
        pe.append(ctx.getState(energy=True).getPotentialEnergy() / n_mol)
    rho = float(np.mean(dens))
    u = float(np.mean(pe))
    # wide bands: 64 molecules, ~8 ps sampling
    assert 0.90 < rho < 1.08, (rho, dens)
    assert -50.0 < u < -33.0, (u, pe)


@pytest.mark.slow
def test_flat_ensemble_npt_density():
    """Per-replica NPT through the flattened ensemble
    (SimState.rep_scale): each replica's box must relax to liquid-water
    density independently — the statistical companion to the exact
    parity pins in tests/test_flatnpt.py."""
    from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble

    n_mol = 200
    system, positions = builders.build_water_box(
        n_mol, method=dn.NonbondedForce.PME, cutoff=0.55)
    system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 25))
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="double",
                     strategy="cellpair")
    ctx.setPositions(positions)
    ens = FlatReplicaEnsemble(ctx, 2, rx=2, rz=1)
    ens.setVelocitiesToTemperature(300.0, seed=2)
    # kept short: ~2.4 ps total (this is a smoke-statistical pin — the
    # quantitative on-chip validation is scripts/validate_flatnpt_tpu.py)
    ens.step(1200)
    dens = []
    for _ in range(4):
        ens.step(300)
        dens.append(ens.densities())
    dens = np.array(dens)              # (4, 2)
    rho = dens.mean(axis=0)            # per replica
    s = np.asarray(ens.context._state.rep_scale)
    assert np.all(np.isfinite(dens)), dens
    assert np.all((0.88 < rho) & (rho < 1.10)), (rho, dens)
    # both replicas' boxes moved off the template (lattice start is
    # under-dense, so accepted moves must have fired)
    assert np.all(np.abs(s - 1.0) > 1e-4), s
