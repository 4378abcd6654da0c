"""Programmatic system builders for the benchmark/example systems.

The reference ships its systems as PDB + charmm_polar_2013.xml consumed by
OpenMM's app layer (example/nacl_tg.py:25-42); here the equivalent systems
are built directly with typed parameters (SURVEY.md section 7 layer 6).

SWM4-NDP water parameters are those of the reference's own testWater
(Test*DrudeTGNHIntegrator.cpp:130-150): O 15.6 Da (Drude 0.4), H 1.0,
massless M site as a ThreeParticleAverageSite, O-H 0.09572 nm and H-H
0.15139 nm constraints, O charge via M, O polarizability ~0.00098 nm^3.
"""

from __future__ import annotations

import numpy as np

from ..forces.cmmotion import CMMotionRemover
from ..forces.drude import DrudeForce
from ..forces.nonbonded import NonbondedForce
from ..system import System, ThreeParticleAverageSite
from ..units import ONE_4PI_EPS0

# SWM4-NDP site parameters (Lamoureux, Harder, Vorobyov, Roux, MacKerell,
# Chem. Phys. Lett. 418 (2006) 245).  NOTE the M-site weights: the
# reference's testWater uses TIP4P-Ew's weights (0.786646558/0.106676721,
# r_OM = 0.125 A — Test*DrudeTGNHIntegrator.cpp:148, a toy choice its
# temperature-only assertions never notice), but SWM4-NDP places M at
# r_OM = 0.24034 A.  With the toy weights the static dipole comes out
# ~2.5 D instead of 1.85 D and NPT water equilibrates ~17% too dense
# (measured); the weights below reproduce the published geometry.
SWM4_O_MASS = 15.6
SWM4_D_MASS = 0.4
SWM4_H_MASS = 1.0
SWM4_Q_D = -1.71636
SWM4_Q_H = 0.55733
SWM4_Q_M = -1.11466
SWM4_O_SIGMA = 0.318395
SWM4_O_EPS = 0.21094 * 4.184
SWM4_ALPHA = ONE_4PI_EPS0 * SWM4_Q_D**2 / (100000 * 4.184)
SWM4_D_OH = 0.09572
SWM4_D_HH = 0.15139
SWM4_R_OM = 0.024034  # nm
# |H1 + H2 - 2 O| = 2 sqrt(d_OH^2 - (d_HH/2)^2) -> per-H weight
_D_OHMID = float(np.sqrt(SWM4_D_OH**2 - (SWM4_D_HH / 2.0) ** 2))
SWM4_M_W23 = SWM4_R_OM / (2.0 * _D_OHMID)
SWM4_M_W1 = 1.0 - 2.0 * SWM4_M_W23

# number density of water at ~1 g/cm3, molecules / nm^3
WATER_NUMBER_DENSITY = 33.33


def add_swm4_molecule(system: System, nonbonded: NonbondedForce,
                      drude: DrudeForce) -> int:
    start = system.getNumParticles()
    system.addParticle(SWM4_O_MASS)
    system.addParticle(SWM4_D_MASS)
    system.addParticle(SWM4_H_MASS)
    system.addParticle(SWM4_H_MASS)
    system.addParticle(0.0)
    nonbonded.addParticle(-SWM4_Q_D, SWM4_O_SIGMA, SWM4_O_EPS)
    nonbonded.addParticle(SWM4_Q_D, 1.0, 0.0)
    nonbonded.addParticle(SWM4_Q_H, 1.0, 0.0)
    nonbonded.addParticle(SWM4_Q_H, 1.0, 0.0)
    nonbonded.addParticle(SWM4_Q_M, 1.0, 0.0)
    for j in range(5):
        for k in range(j):
            nonbonded.addException(start + j, start + k, 0, 1, 0)
    system.addConstraint(start, start + 2, SWM4_D_OH)
    system.addConstraint(start, start + 3, SWM4_D_OH)
    system.addConstraint(start + 2, start + 3, SWM4_D_HH)
    system.setVirtualSite(start + 4, ThreeParticleAverageSite(
        start, start + 2, start + 3, SWM4_M_W1, SWM4_M_W23, SWM4_M_W23))
    drude.addParticle(start + 1, start, -1, -1, -1, SWM4_Q_D, SWM4_ALPHA, 1, 1)
    return start


def swm4_molecule_positions(origin: np.ndarray) -> np.ndarray:
    """Site positions for one molecule at rest geometry."""
    return origin + np.array([
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0],
        [SWM4_D_OH, 0.0, 0.0],
        [-0.023999, 0.092663, 0.0],
        [0.0, 0.0, 0.0],
    ])


def build_water_box(n_molecules: int, method: int = NonbondedForce.PME,
                    cutoff: float = 1.0, ewald_tol: float = 5e-4,
                    add_cm_motion: bool = True,
                    density: float = WATER_NUMBER_DENSITY,
                    shape=(1, 1, 1)):
    """SWM4-NDP water box at the given number density on a cubic lattice.

    Returns (system, positions).  5 sites/molecule, so n_molecules=20000
    gives the 100k-atom benchmark config (BASELINE.md).  `shape` elongates
    the box: edge lengths proportional to shape at the same density
    (e.g. (8, 1, 1) gives many x cell planes from few molecules — used by
    the 8-slab resident-decomposition dryrun)."""
    s = np.asarray(shape, np.int64)
    if tuple(s) == (1, 1, 1):
        # keep the cubic path bit-identical to the historical formula
        # (the committed benchmark snapshot was built with it)
        grid = int(np.ceil(n_molecules ** (1.0 / 3.0)))
        box = (n_molecules / density) ** (1.0 / 3.0)
        spacing = box / grid
        grid3 = (grid, grid, grid)
        box3 = (box, box, box)
    else:
        g = int(np.ceil((n_molecules / float(s.prod())) ** (1.0 / 3.0)))
        grid3 = (int(g * s[0]), int(g * s[1]), int(g * s[2]))
        spacing = (n_molecules
                   / (density * float(np.prod(grid3)))) ** (1.0 / 3.0)
        box3 = tuple(gi * spacing for gi in grid3)

    system = System()
    nonbonded = NonbondedForce()
    drude = DrudeForce()
    system.addForce(nonbonded)
    system.addForce(drude)
    system.setDefaultPeriodicBoxVectors((box3[0], 0, 0), (0, box3[1], 0),
                                        (0, 0, box3[2]))
    nonbonded.setNonbondedMethod(method)
    nonbonded.setCutoffDistance(cutoff)
    nonbonded.setEwaldErrorTolerance(ewald_tol)

    positions = []
    rng = np.random.default_rng(1234)
    # occupy a uniform random subset of lattice sites: truncating the
    # (i, j, k) loop at n_molecules would leave the last x-planes empty —
    # a vacuum slab with ~10% over-density elsewhere (wrong physics for
    # the benchmark, lumpy cell occupancy for the sweep)
    n_sites = int(np.prod(grid3))
    sites = np.sort(rng.choice(n_sites, size=n_molecules, replace=False))
    for site in sites:
        i = site // (grid3[1] * grid3[2])
        j = (site // grid3[2]) % grid3[1]
        k = site % grid3[2]
        origin = (np.array([i, j, k]) + 0.5) * spacing
        mol = swm4_molecule_positions(origin)
        # random orientation to avoid a perfectly aligned lattice
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        rot = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        mol = (mol - origin) @ rot.T + origin
        add_swm4_molecule(system, nonbonded, drude)
        positions.append(mol)
    if add_cm_motion:
        system.addForce(CMMotionRemover())
    return system, np.concatenate(positions, axis=0)


def build_nacl_water_box(n_water: int, n_na: int, n_cl: int,
                         method: int = NonbondedForce.PME,
                         cutoff: float = 1.0):
    """NaCl in SWM4-NDP water — the reference's example system shape
    (example/nacl_tg.py: ~1 M NaCl).  Ion Drude parameters from the
    CHARMM Drude-2013 ion model (polarizable Na+/Cl-)."""
    density = WATER_NUMBER_DENSITY
    n_sites = n_water + n_na + n_cl  # lattice sites
    grid = int(np.ceil(n_sites ** (1.0 / 3.0)))
    box = (n_sites / density) ** (1.0 / 3.0)
    spacing = box / grid

    system = System()
    nonbonded = NonbondedForce()
    drude = DrudeForce()
    system.addForce(nonbonded)
    system.addForce(drude)
    system.setDefaultPeriodicBoxVectors((box, 0, 0), (0, box, 0), (0, 0, box))
    nonbonded.setNonbondedMethod(method)
    nonbonded.setCutoffDistance(cutoff)

    # Drude ion parameters (charge, sigma, eps, polarizability, drude mass)
    ION = {
        "NA": (1.0, 0.2430, 0.1305 * 4.184, 0.000157, 0.4, 22.5898),
        "CL": (-1.0, 0.4612, 0.0719 * 4.184, 0.003969, 0.4, 35.0527),
    }
    positions = []
    kinds = ["NA"] * n_na + ["CL"] * n_cl + ["W"] * n_water
    rng = np.random.default_rng(7)
    rng.shuffle(kinds)
    # uniform random subset of lattice sites (see build_water_box: a
    # truncated loop leaves a vacuum slab in the last x-planes)
    sites = np.sort(rng.choice(grid ** 3, size=len(kinds), replace=False))
    for count, site in enumerate(sites):
        i, j, k = (site // (grid * grid), (site // grid) % grid,
                   site % grid)
        origin = (np.array([i, j, k]) + 0.5) * spacing
        kind = kinds[count]
        if kind == "W":
            add_swm4_molecule(system, nonbonded, drude)
            positions.append(swm4_molecule_positions(origin))
        else:
            q, sigma, eps, alpha, d_mass, mass = ION[kind]
            q_d = -np.sqrt(alpha * 100000 * 4.184 / ONE_4PI_EPS0)
            start = system.getNumParticles()
            system.addParticle(mass - d_mass)
            system.addParticle(d_mass)
            nonbonded.addParticle(q - q_d, sigma, eps)
            nonbonded.addParticle(q_d, 1.0, 0.0)
            nonbonded.addException(start, start + 1, 0, 1, 0)
            drude.addParticle(start + 1, start, -1, -1, -1, q_d,
                              alpha, 1, 1)
            positions.append(np.array([origin, origin]))
    system.addForce(CMMotionRemover())
    return system, np.concatenate(positions, axis=0)
