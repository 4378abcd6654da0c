"""App layer: the OpenMM-shaped user-facing API (the roles OpenMM's app
package plays for the reference workflow, /root/reference/example/nacl_tg.py).
"""

from .forcefield import (AllBonds, CutoffPeriodic, ForceField,
                         ForceFieldError, HBonds, Modeller, NoCutoff, PME)
from ..io.pdbfile import PDBFile

__all__ = ["ForceField", "ForceFieldError", "Modeller", "PDBFile",
           "NoCutoff", "CutoffPeriodic", "PME", "HBonds", "AllBonds"]
