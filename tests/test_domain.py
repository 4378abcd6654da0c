"""Spatial domain decomposition (shard_map + ppermute halos) must reproduce
the single-device cell-pair sweep exactly.  Runs on the virtual 8-device
CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import cellpair as cp
from openmm_drudenose_tpu.io import builders
from openmm_drudenose_tpu.parallel import domain
from openmm_drudenose_tpu.units import ONE_4PI_EPS0


def _setup(n_devices=4):
    # box big enough that the grid x-dim is divisible by n_devices and
    # each slab is at least `window` planes wide
    system, positions = builders.build_water_box(
        600, method=dn.NonbondedForce.CutoffPeriodic, cutoff=0.55)
    rng = np.random.default_rng(0)
    positions = positions + rng.normal(0, 0.01, positions.shape)
    nb = [f for f in system.getForces()
          if isinstance(f, dn.NonbondedForce)][0]
    fn, params = nb.compile(system, jnp.float64, strategy="cellpair",
                            nb_kwargs={"capacity": 32})
    cfg = fn.cellpair_cfg
    box = np.array(system.getDefaultPeriodicBoxVectors())
    box_diag = jnp.asarray(np.diagonal(box))
    cs = cp.build_cellsort(jnp.asarray(positions), box_diag, cfg)
    assert not bool(cs.overflow)
    peg = cp.make_pair_eg("rf", cfg.cutoff,
                          krf=(1 / cfg.cutoff**3) * (78.3 - 1) / (2 * 78.3 + 1),
                          crf=(1 / cfg.cutoff) * 3 * 78.3 / (2 * 78.3 + 1))
    return system, positions, params, cfg, box_diag, cs, peg


def test_sharded_sweep_matches_local():
    (system, positions, params, cfg, box_diag, cs, peg) = _setup()
    n = system.getNumParticles()

    e_ref, f_ref = cp.pair_energy_forces(
        params, jnp.asarray(positions), box_diag, cs, cfg, peg, ONE_4PI_EPS0)

    gx = cfg.grid[0]
    n_dev = 4 if gx % 4 == 0 else (2 if gx % 2 == 0 else 1)
    assert n_dev > 1, f"grid {cfg.grid} not shardable in test"
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("atom",))
    window = domain.stencil_window(cfg, box_diag)
    sweep = domain.make_sharded_pair_sweep(
        mesh, "atom", cfg, peg, ONE_4PI_EPS0, n, window)
    blocks = domain.sorted_blocks_from_cellsort(
        params, jnp.asarray(positions), cs, cfg, n)
    with mesh:
        e_sh, f_slots = jax.jit(sweep)(blocks, box_diag)
    f_sh = np.asarray(f_slots)[np.asarray(cs.inv_slot)]

    np.testing.assert_allclose(float(e_sh), float(e_ref), rtol=1e-12)
    np.testing.assert_allclose(f_sh, np.asarray(f_ref), atol=1e-9)
