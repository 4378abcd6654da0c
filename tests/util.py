"""Shared system builders for tests (mirroring the reference's test systems,
platforms/reference/tests/TestReferenceDrudeTGNHIntegrator.cpp)."""

import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.units import ONE_4PI_EPS0


def single_pair_system(charge=0.1, k_over=1.5, mass1=1.0, mass2=0.1):
    """1 core + 1 Drude shell with only the Drude spring
    (Test*DrudeTGNHIntegrator.cpp:54-75)."""
    k = ONE_4PI_EPS0 * k_over
    alpha = ONE_4PI_EPS0 * charge * charge / k
    system = dn.System()
    system.addParticle(mass1)
    system.addParticle(mass2)
    drude = dn.DrudeForce()
    drude.addParticle(1, 0, -1, -1, -1, charge, alpha, 1, 1)
    system.addForce(drude)
    return system


def swm4_water_box(grid_size=3, spacing=0.6, cutoff=1.0, add_cm_motion=True,
                   rigid_hh=True):
    """Box of SWM4-NDP water: constraints, ThreeParticleAverageSite virtual
    sites, Drude on O, CutoffPeriodic nonbonded
    (Test*DrudeTGNHIntegrator.cpp:111-161).

    rigid_hh=False drops the H-H constraint, turning each water's
    constraint cluster from a SETTLE triangle into a 2-bond chain solved by
    Jacobi SHAKE — used to exercise the general-cluster path."""
    num_molecules = grid_size ** 3
    box_size = spacing * (grid_size + 1)
    system = dn.System()
    nonbonded = dn.NonbondedForce()
    drude = dn.DrudeForce()
    system.addForce(nonbonded)
    system.addForce(drude)
    system.setDefaultPeriodicBoxVectors((box_size, 0, 0), (0, box_size, 0),
                                        (0, 0, box_size))
    nonbonded.setNonbondedMethod(dn.NonbondedForce.CutoffPeriodic)
    nonbonded.setCutoffDistance(cutoff)
    for i in range(num_molecules):
        start = system.getNumParticles()
        system.addParticle(15.6)  # O
        system.addParticle(0.4)   # D
        system.addParticle(1.0)   # H1
        system.addParticle(1.0)   # H2
        system.addParticle(0.0)   # M (virtual)
        nonbonded.addParticle(1.71636, 0.318395, 0.21094 * 4.184)
        nonbonded.addParticle(-1.71636, 1, 0)
        nonbonded.addParticle(0.55733, 1, 0)
        nonbonded.addParticle(0.55733, 1, 0)
        nonbonded.addParticle(-1.11466, 1, 0)
        for j in range(5):
            for k in range(j):
                nonbonded.addException(start + j, start + k, 0, 1, 0)
        system.addConstraint(start, start + 2, 0.09572)
        system.addConstraint(start, start + 3, 0.09572)
        if rigid_hh:
            system.addConstraint(start + 2, start + 3, 0.15139)
        system.setVirtualSite(start + 4, dn.ThreeParticleAverageSite(
            start, start + 2, start + 3, 0.786646558, 0.106676721, 0.106676721))
        drude.addParticle(start + 1, start, -1, -1, -1, -1.71636,
                          ONE_4PI_EPS0 * 1.71636**2 / (100000 * 4.184), 1, 1)
    positions = []
    for i in range(grid_size):
        for j in range(grid_size):
            for k in range(grid_size):
                pos = np.array([i * spacing, j * spacing, k * spacing])
                positions.append(pos)
                positions.append(pos)
                positions.append(pos + [0.09572, 0, 0])
                positions.append(pos + [-0.023999, 0.092663, 0])
                positions.append(pos)
    if add_cm_motion:
        system.addForce(dn.CMMotionRemover())
    return system, np.array(positions)


def ion_pair_pme_box(grid_size=3, spacing=0.6):
    """Box of polarizable core-shell pairs with PME + switching
    (testForceEnergyConsistency, Test*DrudeTGNHIntegrator.cpp:194-231)."""
    num_atoms = grid_size ** 3
    box_size = spacing * (grid_size + 1)
    system = dn.System()
    nonbonded = dn.NonbondedForce()
    drude = dn.DrudeForce()
    system.addForce(nonbonded)
    system.addForce(drude)
    system.setDefaultPeriodicBoxVectors((box_size, 0, 0), (0, box_size, 0),
                                        (0, 0, box_size))
    nonbonded.setNonbondedMethod(dn.NonbondedForce.PME)
    nonbonded.setCutoffDistance(1.0)
    nonbonded.setUseSwitchingFunction(True)
    nonbonded.setSwitchingDistance(0.9)
    nonbonded.setEwaldErrorTolerance(5e-5)
    for i in range(num_atoms):
        start = system.getNumParticles()
        system.addParticle(1.0)
        system.addParticle(1.0)
        nonbonded.addParticle(1.0, 0.3, 1.0)
        nonbonded.addParticle(-1.0, 0.3, 1.0)
        nonbonded.addException(start, start + 1, 0, 1, 0)
        drude.addParticle(start + 1, start, -1, -1, -1, -1.0, 0.001, 1, 1)
    positions = []
    for i in range(grid_size):
        for j in range(grid_size):
            for k in range(grid_size):
                pos = [i * spacing, j * spacing, k * spacing]
                positions.append(pos)
                positions.append(pos)
    return system, np.array(positions, np.float64)
