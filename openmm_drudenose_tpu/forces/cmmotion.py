"""CMMotionRemover and MonteCarloBarostat.

Neither contributes potential energy; both act through the step function:
  - CMMotionRemover subtracts the system center-of-mass velocity every
    `frequency` steps (its presence also reduces the COM temperature-group
    DOF by 3 — reference CudaDrudeTGNHKernels.cpp:204-212).
  - MonteCarloBarostat proposes isotropic volume moves every `frequency`
    steps, rescaling molecule centers, with Metropolis NPT accept/reject
    (handled by integrators/barostat.py inside the jitted step — the
    reference delegates this to OpenMM via updateContextState(),
    DrudeTGNHIntegrator.cpp:186).
"""

from __future__ import annotations


class CMMotionRemover:
    def __init__(self, frequency: int = 1):
        self._frequency = int(frequency)

    def getFrequency(self) -> int:
        return self._frequency

    def setFrequency(self, freq: int) -> None:
        self._frequency = int(freq)

    def usesPeriodicBoundaryConditions(self) -> bool:
        return False

    def bonded_pairs(self):
        return []

    def compile(self, system, dtype):
        return None, None  # no potential energy


class MonteCarloBarostat:
    def __init__(self, defaultPressure: float, defaultTemperature: float,
                 frequency: int = 25):
        """defaultPressure in bar, defaultTemperature in K."""
        self._pressure = float(defaultPressure)
        self._temperature = float(defaultTemperature)
        self._frequency = int(frequency)

    def getDefaultPressure(self) -> float:
        return self._pressure

    def setDefaultPressure(self, p: float) -> None:
        self._pressure = float(p)

    def getDefaultTemperature(self) -> float:
        return self._temperature

    def setDefaultTemperature(self, t: float) -> None:
        self._temperature = float(t)

    def getFrequency(self) -> int:
        return self._frequency

    def setFrequency(self, f: int) -> None:
        self._frequency = int(f)

    def usesPeriodicBoundaryConditions(self) -> bool:
        return True

    def bonded_pairs(self):
        return []

    def compile(self, system, dtype):
        return None, None  # no potential energy
