"""openmm_drudenose_tpu — a TPU-native Drude-polarizable MD engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
scychon/openmm_drudeNose OpenMM plugin (Temperature-Grouped dual Nose-Hoover
thermostat for extended-Lagrangian Drude MD, Son et al. JPCL 2019) plus the
minimal force/constraint/virtual-site substrate the plugin borrows from the
host OpenMM library.

Quick start::

    import openmm_drudenose_tpu as dn

    system = dn.System()
    ... add particles / forces ...
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001)
    ctx = dn.Context(system, integ)
    ctx.setPositions(pos)
    integ.step(1000)
"""

from .system import (System, TwoParticleAverageSite, ThreeParticleAverageSite,
                     OutOfPlaneSite, LocalCoordinatesSite)
from .forces.drude import DrudeForce
from .forces.nonbonded import NonbondedForce
from .forces.bonded import (HarmonicBondForce, HarmonicAngleForce,
                            PeriodicTorsionForce, HarmonicTorsionForce)
from .forces.cmap import CMAPTorsionForce
from .forces.custom import (CustomBondForce, CustomAngleForce,
                            CustomTorsionForce, CustomNonbondedForce,
                            CustomExternalForce)
from .forces.cmmotion import CMMotionRemover, MonteCarloBarostat
from .app.integrator import DrudeTGNHIntegrator
from .app.context import Context, State
from .app.simulation import (Simulation, StateDataReporter,
                             CheckpointReporter, DCDReporter, PDBReporter)
from .app.serialization import (serialize_integrator, deserialize_integrator,
                                serialize_system, deserialize_system,
                                XmlSerializer,
                                save_checkpoint, load_checkpoint)
from .app.forcefield import ForceField, Modeller
from .parallel.ensemble import ReplicaEnsemble
from .parallel.flatrep import FlatReplicaEnsemble
from .units import BOLTZ, ONE_4PI_EPS0

__version__ = "0.1.0"

__all__ = [
    "System", "TwoParticleAverageSite", "ThreeParticleAverageSite",
    "OutOfPlaneSite", "LocalCoordinatesSite",
    "DrudeForce", "NonbondedForce", "HarmonicBondForce",
    "HarmonicAngleForce", "PeriodicTorsionForce", "HarmonicTorsionForce",
    "CMAPTorsionForce", "CMMotionRemover",
    "CustomBondForce", "CustomAngleForce", "CustomTorsionForce",
    "CustomNonbondedForce", "CustomExternalForce",
    "MonteCarloBarostat", "DrudeTGNHIntegrator", "Context", "State",
    "Simulation", "StateDataReporter", "CheckpointReporter", "DCDReporter",
    "PDBReporter", "ReplicaEnsemble", "FlatReplicaEnsemble", "ForceField",
    "Modeller",
    "serialize_integrator",
    "deserialize_integrator",
    "serialize_system", "deserialize_system", "XmlSerializer",
    "save_checkpoint", "load_checkpoint", "BOLTZ", "ONE_4PI_EPS0",
]
