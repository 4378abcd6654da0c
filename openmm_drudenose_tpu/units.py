"""Units and physical constants.

We use the OpenMM "MD unit system" throughout (cf. reference
openmmapi/include/openmm/DrudeTGNHIntegrator.h:61-66 — temperatures in K,
times in ps):

  length      : nanometer (nm)
  time        : picosecond (ps)
  mass        : dalton (amu)
  charge      : proton charge (e)
  energy      : kJ/mol
  temperature : kelvin (K)

Velocities are nm/ps, forces kJ/mol/nm.
"""

# Boltzmann constant times Avogadro, kJ/(mol K).  Matches OpenMM's BOLTZ
# (SimTKOpenMMRealType.h) used by the reference at
# platforms/cuda/src/CudaDrudeTGNHKernels.cpp:80-81.
BOLTZ = 8.31446261815324e-3

# Coulomb constant 1/(4 pi eps0) in kJ nm / (mol e^2).  Matches OpenMM's
# ONE_4PI_EPS0 used in the reference tests
# (platforms/reference/tests/TestReferenceDrudeTGNHIntegrator.cpp:57).
ONE_4PI_EPS0 = 138.935456

# Unit conversions
PICOSECOND = 1.0
FEMTOSECOND = 1e-3
NANOMETER = 1.0
ANGSTROM = 0.1
KELVIN = 1.0
DALTON = 1.0
KJ_PER_MOL = 1.0
KCAL_PER_MOL = 4.184

# Pressure: bar in MD units.  1 bar = 0.0602214076 kJ/(mol nm^3)
BAR_TO_KJ_PER_MOL_NM3 = 0.06022140857
ATMOSPHERE_TO_BAR = 1.01325

# ns/day helper: steps/sec * dt(ps) -> ns/day
def ns_per_day(steps_per_second: float, step_size_ps: float) -> float:
    return steps_per_second * step_size_ps * 1e-3 * 86400.0
