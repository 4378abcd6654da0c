"""The reference's example workflow, run through the ForceField XML path.

This is the shape of /root/reference/example/nacl_tg.py, ported to this
engine's app layer: PDBFile -> ForceField -> Modeller.addExtraParticles ->
createSystem(PME, HBonds, rigidWater) -> hand Drude-mass repartition ->
MonteCarloBarostat -> DrudeTGNHIntegrator -> minimize -> NPT.

charmm_polar_2013.xml ships with OpenMM installations, not with the
reference plugin and not with this repo; pass its path as the first
argument.  Without it, the script falls back to tests/data/swm4_nacl.xml
(same SWM4-NDP water + Yu-2010 ion physics, authored here) so the workflow
is runnable out of the box.

Usage:
    python examples/nacl_tg_ff.py [forcefield.xml] [pdb] [n_steps]
"""

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)  # runnable as `python examples/nacl_tg_ff.py`

import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.app import ForceField, HBonds, Modeller, PDBFile, PME

ffxml = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    ROOT, "tests", "data", "swm4_nacl.xml")
pdb_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    ROOT, "..", "reference", "example", "nacl_1m.pdb")
n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 2000

temperature = 300.0   # K
pressure = 1.0        # atm (bar-equivalent handled by the barostat)
timestep = 0.001      # ps
num_drude_steps = 20

integ = dn.DrudeTGNHIntegrator(temperature, 0.1, 1.0, 0.1, timestep,
                               num_drude_steps)
integ.setMaxDrudeDistance(0.02)

pdb = PDBFile(pdb_path)
forcefield = ForceField(ffxml)
modeller = Modeller(pdb.topology, pdb.positions)
modeller.addExtraParticles(forcefield)     # Drude shells + lone pairs

system = forcefield.createSystem(modeller.topology, nonbondedMethod=PME,
                                 nonbondedCutoff=1.0, constraints=HBonds,
                                 rigidWater=True)

# Drude mass repartition, as the reference example does by hand
# (example/nacl_tg.py:49-53): charmm_polar_2013.xml leaves Drudes massless.
for i, at in enumerate(modeller.topology.atoms):
    if system.getParticleMass(i) > 1.1:
        system.setParticleMass(i, system.getParticleMass(i) - 0.4)
    if at.name.startswith("D"):
        system.setParticleMass(i, 0.4)

system.addForce(dn.MonteCarloBarostat(pressure, temperature))

sim = dn.Simulation(modeller.topology, system, integ)
sim.context.setPositions(modeller.positions)

print("Minimizing...")
sim.minimizeEnergy(maxIterations=200)
sim.context.setVelocitiesToTemperature(temperature)

sim.reporters.append(dn.StateDataReporter(
    sys.stdout, max(1, n_steps // 10), step=True, potentialEnergy=True,
    temperature=True, density=True, speed=True, groupTemperatures=True))

print("Simulating...")
sim.step(n_steps)
st = sim.context.getState(energy=True)
print("Done.  PE =", st.getPotentialEnergy(), "kJ/mol")
