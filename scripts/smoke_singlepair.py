"""Smoke: single Drude pair, TGNH dual bath — quick version of the
reference testSinglePair (Test*DrudeTGNHIntegrator.cpp:54-109)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_enable_x64", True)

import numpy as np
import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.units import BOLTZ, ONE_4PI_EPS0

temperature = 300.0
temperature_drude = 10.0
k = ONE_4PI_EPS0 * 1.5
charge = 0.1
alpha = ONE_4PI_EPS0 * charge * charge / k
mass1, mass2 = 1.0, 0.1
total_mass = mass1 + mass2
reduced_mass = mass1 * mass2 / total_mass
max_distance = 0.05

system = dn.System()
system.addParticle(mass1)
system.addParticle(mass2)
drude = dn.DrudeForce()
drude.addParticle(1, 0, -1, -1, -1, charge, alpha, 1, 1)
system.addForce(drude)

integ = dn.DrudeTGNHIntegrator(temperature, 0.1, temperature_drude, 0.005,
                               0.003, 20, 2, False)
integ.setMaxDrudeDistance(max_distance)
ctx = dn.Context(system, integ, precision="double")
ctx.setPositions([[0, 0, 0], [0, 0, 0.01]])
ctx.setVelocities([[1, 0, 0], [1, 0, 0.01]])

integ.step(1000)

ke_cm = ke_int = 0.0
nsteps = 2000
for i in range(nsteps):
    integ.step(10)
    st = ctx.getState(positions=True, velocities=True)
    vel = st.getVelocities()
    v_cm = vel[0] * (mass1 / total_mass) + vel[1] * (mass2 / total_mass)
    ke_cm += 0.5 * total_mass * v_cm @ v_cm
    v_int = vel[0] - vel[1]
    ke_int += 0.5 * reduced_mass * v_int @ v_int
    d = st.getPositions()[0] - st.getPositions()[1]
    dist = np.sqrt(d @ d)
    assert dist <= max_distance * (1 + 1e-6), (i, dist)

print("KE_cm  ", ke_cm / nsteps, " target ", 1.5 * BOLTZ * temperature)
print("KE_int ", ke_int / nsteps, " target ", 1.5 * BOLTZ * temperature_drude)
