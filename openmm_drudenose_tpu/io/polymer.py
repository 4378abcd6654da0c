"""Solvated polarizable polymer builder (BASELINE.md config 4: '100k-atom
solvated polymer with Drude-2013 FF: constraints + hard-wall Drude clamp +
per-group KE reductions at scale').

Builds united-atom polarizable polymer chains (PEO-like: backbone beads with
Drude shells, harmonic bonds/angles, torsions) solvated in SWM4-NDP water.
Two natural temperature groups: polymer (0) and water (defaults to 0 too
unless assigned; use `make_tgnh_integrator` for the per-group setup).
"""

from __future__ import annotations

import numpy as np

from ..forces.bonded import (HarmonicAngleForce, HarmonicBondForce,
                             PeriodicTorsionForce)
from ..forces.cmmotion import CMMotionRemover
from ..forces.drude import DrudeForce
from ..forces.nonbonded import NonbondedForce
from ..system import System
from ..units import KCAL_PER_MOL, ONE_4PI_EPS0
from .builders import add_swm4_molecule, swm4_molecule_positions

K_DRUDE = 1000 * KCAL_PER_MOL * 100


def build_solvated_polymer(n_chains: int, chain_length: int, n_water: int,
                           method: int = NonbondedForce.PME,
                           cutoff: float = 1.0,
                           density: float = 33.33):
    """Returns (system, positions, polymer_atoms, water_atoms)."""
    n_sites = n_chains + n_water  # lattice sites (a chain occupies a column)
    grid = int(np.ceil((n_water + n_chains * chain_length) ** (1 / 3)
                       / 1.35))
    box = ((n_water + n_chains * chain_length * 3) / density) ** (1 / 3)
    box = max(box, 0.45 * chain_length / 2 + 1.0)  # fit the chains
    spacing_w = box / max(int(np.ceil(n_water ** (1 / 3))), 1)

    system = System()
    nonbonded = NonbondedForce()
    drude = DrudeForce()
    bonds = HarmonicBondForce()
    angles = HarmonicAngleForce()
    torsions = PeriodicTorsionForce()
    for f in (nonbonded, drude, bonds, angles, torsions):
        system.addForce(f)
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    nonbonded.setNonbondedMethod(method)
    nonbonded.setCutoffDistance(cutoff)

    alpha = 0.0012  # nm^3 per backbone bead
    q_d = -np.sqrt(alpha * K_DRUDE / ONE_4PI_EPS0)
    polymer_atoms = []
    positions = []
    rng = np.random.default_rng(17)

    bead_spacing = 0.36
    for c in range(n_chains):
        origin = rng.uniform(0.5, box - 0.5, 3)
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        prev = []
        for m in range(chain_length):
            base = system.getNumParticles()
            bead, shell = base, base + 1
            system.addParticle(44.0 - 0.4)   # CH2-O-CH2 monomer bead
            system.addParticle(0.4)
            qb = 0.0
            nonbonded.addParticle(qb - q_d, 0.41, 0.6 * KCAL_PER_MOL * 4.184
                                  / 4.184)
            nonbonded.addParticle(q_d, 1.0, 0.0)
            nonbonded.addException(bead, shell, 0, 1, 0)
            drude.addParticle(shell, bead, -1, -1, -1, q_d, alpha, 1, 1)
            polymer_atoms.extend([bead, shell])
            if prev:
                pb = prev[-1]
                bonds.addBond(pb, bead, bead_spacing, 60000.0)
                nonbonded.addException(pb, bead, 0, 1, 0)
                nonbonded.addException(pb, shell, 0, 1, 0)
                nonbonded.addException(prev[-1] + 1, bead, 0, 1, 0)
            if len(prev) >= 2:
                angles.addAngle(prev[-2], prev[-1], bead,
                                np.deg2rad(130.0), 300.0)
                nonbonded.addException(prev[-2], bead, 0, 1, 0)
            if len(prev) >= 3:
                torsions.addTorsion(prev[-3], prev[-2], prev[-1], bead,
                                    3, 0.0, 2.0)
            prev.append(bead)
            # mild random walk to avoid a perfectly straight rod
            step_dir = direction + rng.normal(0, 0.25, 3)
            step_dir /= np.linalg.norm(step_dir)
            origin = origin + step_dir * bead_spacing
            pos = np.mod(origin, box)
            positions.append(np.array([pos, pos]))

    # solvate: water lattice sites, skipping any site within 0.35 nm of a
    # polymer bead (min-image), so the initial configuration is overlap-free
    bead_pos = (np.array([p[0] for p in positions])
                if positions else np.zeros((0, 3)))
    water_atoms_start = system.getNumParticles()
    gw = int(np.ceil((n_water * 1.3) ** (1 / 3)))
    count = 0
    for i in range(gw):
        for j in range(gw):
            for k in range(gw):
                if count >= n_water:
                    break
                origin = (np.array([i, j, k]) + 0.5) * (box / gw)
                d = bead_pos - origin
                d -= box * np.round(d / box)
                if len(bead_pos) and (np.sum(d * d, axis=1)
                                      < 0.35**2).any():
                    continue
                add_swm4_molecule(system, nonbonded, drude)
                positions.append(swm4_molecule_positions(origin))
                count += 1
    water_atoms = list(range(water_atoms_start, system.getNumParticles()))
    system.addForce(CMMotionRemover())
    return (system, np.concatenate(positions, axis=0), polymer_atoms,
            water_atoms)


def make_tgnh_integrator(polymer_atoms, water_atoms, n_atoms,
                         temperature=300.0, drude_temperature=1.0,
                         step_size=0.001):
    from ..app.integrator import DrudeTGNHIntegrator
    integ = DrudeTGNHIntegrator(temperature, 0.1, drude_temperature, 0.1,
                                step_size, 20)
    integ.addTempGroup()  # polymer
    integ.addTempGroup()  # water
    for _ in range(n_atoms):
        integ.addParticleTempGroup(1)
    for i in polymer_atoms:
        integ.setParticleTempGroup(i, 0)
    return integ
