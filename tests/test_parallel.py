"""Replica ensembles (vmap) and mesh sharding (BASELINE.md config 5).

Runs on the 8 virtual CPU devices configured in conftest.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.integrators import tgnh
from openmm_drudenose_tpu.parallel import ensemble

from util import swm4_water_box


def _context():
    system, positions = swm4_water_box(grid_size=2, add_cm_motion=False)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(200.0, seed=0)
    ctx._ensure_forces()
    return ctx


@pytest.mark.slow
def test_vmap_ensemble_matches_single():
    """A vmapped replica ensemble must evolve each member exactly like a
    single simulation."""
    ctx = _context()
    spec, static = ctx._spec, ctx._static
    n_rep = 4
    batched = ensemble.replicate_state(ctx._state, n_rep, seed=7)
    # give replicas distinct velocities
    keys = jax.random.split(jax.random.PRNGKey(3), n_rep)
    sigma = jnp.sqrt(8.314e-3 * 200.0 * spec.inv_mass)[:, None]
    vels = jnp.stack([jax.random.normal(k, ctx._state.velocities.shape,
                                        ctx._state.velocities.dtype) * sigma
                      for k in keys])
    batched = batched._replace(velocities=vels)

    multi = tgnh.make_multi_step(static, ctx._energy_and_forces, 10)
    vstep = jax.jit(jax.vmap(lambda st: multi(spec, st)))
    out = jax.block_until_ready(vstep(batched))

    # replica 2 vs the same run un-batched
    single = ctx._state._replace(velocities=vels[2])
    out_single = jax.jit(lambda s: multi(spec, s))(single)
    np.testing.assert_allclose(np.asarray(out.positions[2]),
                               np.asarray(out_single.positions), atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.eta[2]),
                               np.asarray(out_single.eta), atol=1e-12)
    # replicas with different velocities diverge
    assert not np.allclose(np.asarray(out.positions[0]),
                           np.asarray(out.positions[1]))


@pytest.mark.slow
def test_sharded_ensemble_runs_on_mesh():
    """replica x atom sharded step executes on an 8-device mesh and matches
    the unsharded result."""
    ctx = _context()
    spec, static = ctx._spec, ctx._static
    devices = jax.devices()
    assert len(devices) >= 8, "conftest must force 8 virtual devices"
    mesh = Mesh(np.array(devices[:8]).reshape(2, 4), ("replica", "atom"))
    n_rep = 2
    batched = ensemble.replicate_state(ctx._state, n_rep, seed=1)
    step = tgnh.make_step(static, ctx._energy_and_forces)

    with mesh:
        shardings = ensemble.state_sharding(mesh, batched)
        sharded = ensemble.shard_ensemble(mesh, batched)
        vstep = jax.jit(jax.vmap(lambda st: step(spec, st)),
                        in_shardings=(shardings,), out_shardings=shardings)
        out = jax.block_until_ready(vstep(sharded))

    plain = jax.jit(jax.vmap(lambda st: step(spec, st)))(batched)
    np.testing.assert_allclose(np.asarray(out.positions),
                               np.asarray(plain.positions), atol=1e-12)
    # positions really are sharded over the atom axis
    shd = out.positions.sharding
    assert shd.spec == P("replica", "atom")


@pytest.mark.slow
def test_replica_ensemble_api():
    ctx = _context()
    from openmm_drudenose_tpu.parallel.ensemble import ReplicaEnsemble
    ens = ReplicaEnsemble(ctx, n_replicas=3, seed=5)
    ens.setVelocitiesToTemperature(200.0, seed=9)
    ens.step(5)
    ke = ens.kinetic_energies()
    assert ke.shape == (3,)
    assert np.all(np.isfinite(ke))
    assert not np.allclose(ens.positions()[0], ens.positions()[1])


@pytest.mark.slow
def test_replica_ensemble_cellpair():
    """Replica ensembles over a cell-pair (neighbor-structure) system:
    per-replica cellsorts rebuilt at chunk boundaries must evolve each
    member like an independent simulation (round-1 gap: ensembles refused
    any neighbor-list strategy)."""
    system, positions = swm4_water_box(grid_size=2, add_cm_motion=False)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(200.0, seed=0)
    ctx._ensure_forces()
    assert ctx._neighbor_fn is not None  # really exercising the cell path

    from openmm_drudenose_tpu.parallel.ensemble import ReplicaEnsemble
    ens = ReplicaEnsemble(ctx, n_replicas=3, seed=5)
    ens.setVelocitiesToTemperature(200.0, seed=9)
    v2 = np.asarray(ens.state.velocities[2]).copy()
    ens.step(20)
    ke = ens.kinetic_energies()
    assert ke.shape == (3,)
    assert np.all(np.isfinite(ke))
    assert not np.allclose(ens.positions()[0], ens.positions()[1])

    # replica 2 vs the same run through the plain Context path
    ctx.setVelocities(v2)
    integ.step(20)
    np.testing.assert_allclose(ens.positions()[2], ctx.getPositions(),
                               atol=1e-10)


def test_replica_ensemble_dense():
    """Replica ensembles over the dense all-pairs strategy: no neighbor
    structure, so the whole run is one vmapped scan (the BASELINE config-5
    small-replica fast path); trajectories must match the Context path and
    stale potential energies must be recomputed on demand."""
    system, positions = swm4_water_box(grid_size=2, add_cm_motion=False)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.0005, 20, 2)
    integ.setMaxDrudeDistance(0.05)
    ctx = dn.Context(system, integ, precision="double", strategy="dense")
    ctx.setPositions(positions)
    ctx.applyConstraints(1e-6)
    ctx.setVelocitiesToTemperature(200.0, seed=0)
    ctx._ensure_forces()
    assert ctx._neighbor_fn is None           # really the dense path
    assert ctx._forces_only is not None       # force-only fast path wired

    from openmm_drudenose_tpu.parallel.ensemble import ReplicaEnsemble
    ens = ReplicaEnsemble(ctx, n_replicas=3, seed=5)
    ens.setVelocitiesToTemperature(200.0, seed=9)
    v2 = np.asarray(ens.state.velocities[2]).copy()
    ens.step(12)
    pe = ens.potential_energies()             # recomputed (stale after step)
    assert pe.shape == (3,)
    assert np.all(np.isfinite(pe))

    ctx.setVelocities(v2)
    integ.step(12)
    np.testing.assert_allclose(ens.positions()[2], ctx.getPositions(),
                               atol=1e-10)
    st = ctx.getState(energy=True)
    np.testing.assert_allclose(pe[2], st.getPotentialEnergy(), rtol=1e-10)


@pytest.mark.slow
def test_flat_ensembles_sharded_over_mesh():
    """Composition closing BASELINE config 5 at scale: D flat sub-ensembles
    (each an embedded-grid FlatReplicaEnsemble, parallel/flatrep.py) sharded
    over an 8-device 'replica' mesh via ReplicaEnsemble — 8 x 2 = 16
    independent replicas, full lane efficiency per device, zero inter-device
    communication.  Member 5's trajectory must match the standalone flat
    ensemble run with the same velocities."""
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.parallel.ensemble import ReplicaEnsemble
    from openmm_drudenose_tpu.parallel.flatrep import FlatReplicaEnsemble

    system, positions = builders.build_water_box(
        200, method=dn.NonbondedForce.PME, cutoff=0.55)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.005, 0.001, 20, 2,
                                   False)
    integ.setMaxDrudeDistance(0.02)
    nb = {"capacity": 48, "skin": 0.1}
    tctx = dn.Context(system, integ, precision="double",
                      strategy="cellpair", nb_options=dict(nb))
    tctx.setPositions(positions)
    flat = FlatReplicaEnsemble(tctx, 2)
    assert flat.context._static.ensemble_r == 2

    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.array(devices[:8]), ("replica",))
    rens = ReplicaEnsemble(flat.context, n_replicas=8, mesh=mesh, seed=3)
    rens.setVelocitiesToTemperature(300.0, seed=9)
    v5 = np.asarray(rens.state.velocities[5]).copy()
    rens.step(4)
    ke = rens.kinetic_energies()
    assert ke.shape == (8, 2)          # (device replicas, embedded replicas)
    assert np.all(np.isfinite(ke))
    assert not np.allclose(rens.positions()[0], rens.positions()[1])

    # member 5 == the standalone flat ensemble with the same velocities
    flat.context.setVelocities(v5)
    flat.step(4)
    np.testing.assert_allclose(rens.positions()[5],
                               flat.context._state.positions, atol=1e-10)
    np.testing.assert_allclose(ke[5], flat.kinetic_energies(), rtol=1e-10)
