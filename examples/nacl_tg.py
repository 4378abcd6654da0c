"""NaCl(aq) in SWM4-NDP Drude water with the TGNH thermostat — the TPU-native
equivalent of the reference's example/nacl_tg.py end-to-end NPT workflow
(same thermostat settings: 300 K / 0.1 ps real bath, 1 K / 0.1 ps Drude
bath, 1 fs steps, 20 Drude substeps, 0.02 nm hard wall, PME, MC barostat).
"""

import os
import sys
import time

import numpy as np

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import builders, nacl

REFERENCE_PDB = "/root/reference/example/nacl_1m_pos.pdb"


def build():
    if os.path.exists(REFERENCE_PDB):
        print(f"loading {REFERENCE_PDB}")
        system, positions, topology = nacl.load_nacl_swm4(REFERENCE_PDB)
    else:
        print("reference PDB not found; generating an equivalent box")
        system, positions = builders.build_nacl_water_box(
            n_water=492, n_na=10, n_cl=10)
        topology = None
    return system, positions, topology


def main(n_steps: int = 20000, report_every: int = 1000):
    system, positions, topology = build()
    print(f"{system.getNumParticles()} atoms, "
          f"{system.getNumConstraints()} constraints")

    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20)
    integ.setMaxDrudeDistance(0.02)

    system.addForce(dn.MonteCarloBarostat(1.01325, 300.0, 100))

    sim = dn.Simulation(topology, system, integ, precision="single")
    sim.context.setPositions(positions)

    print("minimizing...")
    sim.minimizeEnergy(maxIterations=200)
    st = sim.context.getState(energy=True)
    print(f"  PE after minimization: {st.getPotentialEnergy():.1f} kJ/mol")

    sim.context.setVelocitiesToTemperature(300.0)
    sim.reporters.append(dn.StateDataReporter(
        sys.stdout, report_every, step=True, time=True, potentialEnergy=True,
        kineticEnergy=True, temperature=True, density=True,
        groupTemperatures=True, speed=True))
    sim.reporters.append(dn.CheckpointReporter("nacl_eq.chk", 10000))

    print("simulating...")
    t0 = time.time()
    sim.step(n_steps)
    dt = time.time() - t0
    print(f"{n_steps} steps in {dt:.1f}s -> "
          f"{n_steps / dt * integ.getStepSize() * 86.4:.2f} ns/day")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20000)
