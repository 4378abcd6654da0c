"""Pallas block-sweep kernel vs the XLA sweep (interpret mode on CPU)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import cellpair as cp
from openmm_drudenose_tpu.ops import pallas_cellpair
from openmm_drudenose_tpu.units import ONE_4PI_EPS0

from util import swm4_water_box


@pytest.mark.skipif(not pallas_cellpair.HAVE_PALLAS,
                    reason="pallas unavailable")
def test_pallas_matches_xla_sweep():
    system, positions = swm4_water_box(grid_size=3)
    rng = np.random.default_rng(5)
    positions = jnp.asarray(positions + rng.normal(0, 0.005, positions.shape),
                            jnp.float32)
    nb = [f for f in system.getForces() if isinstance(f, dn.NonbondedForce)][0]
    _, params = nb.compile(system, jnp.float32, strategy="cellpair",
                           nb_kwargs={"capacity": 24})
    exc = [nb.getExceptionParameters(i)[:2]
           for i in range(nb.getNumExceptions())]
    exc_i = [e[0] for e in exc]
    exc_j = [e[1] for e in exc]
    box = np.array(system.getDefaultPeriodicBoxVectors())
    box_diag = jnp.asarray(np.diagonal(box), jnp.float32)
    cfg = cp.make_config(1.0, np.diagonal(box), system.getNumParticles(),
                         exc_i, exc_j, capacity=24)
    # pallas needs the full stencil: rebuild config without half stencil
    if cfg.half_stencil:
        full = cp.make_config(1.0, np.diagonal(box),
                              system.getNumParticles(), exc_i, exc_j,
                              capacity=24)
        # regenerate by monkeypatching: force half_stencil off via rebuild
        import numpy as _np
        offsets = cp._neighbor_offsets(cfg.grid, (2, 2, 2))
        cz = _np.arange(cfg.n_cells)
        g = cfg.grid
        c3 = _np.stack([cz // (g[1] * g[2]), (cz // g[2]) % g[1],
                        cz % g[2]], axis=1)
        nb3 = (c3[:, None, :] + offsets[None, :, :]) % _np.array(g)
        nbr = (nb3[..., 0] * g[1] + nb3[..., 1]) * g[2] + nb3[..., 2]
        cfg = dataclasses.replace(
            cfg, nbr_map=(tuple(nbr.reshape(-1).tolist()), nbr.shape),
            n_offsets=len(offsets), half_stencil=False)

    cs = cp.build_cellsort(positions, box_diag, cfg)
    assert not bool(cs.overflow)
    eps_rf = 78.3
    peg = cp.make_pair_eg(
        "rf", 1.0, krf=(1 / 1.0**3) * (eps_rf - 1) / (2 * eps_rf + 1),
        crf=(1 / 1.0) * 3 * eps_rf / (2 * eps_rf + 1))

    e_ref, f_ref = cp.pair_energy_forces(params, positions, box_diag, cs,
                                         cfg, peg, ONE_4PI_EPS0)
    e_pl, f_pl = pallas_cellpair.pair_energy_forces_pallas(
        params, positions, box_diag, cs, cfg, peg, ONE_4PI_EPS0,
        interpret=True)
    np.testing.assert_allclose(float(e_pl), float(e_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               rtol=2e-4, atol=2e-2)
