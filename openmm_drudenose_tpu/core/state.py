"""SimState: the complete dynamic simulation state as an immutable pytree.

Everything the step function evolves lives here — including the Nose-Hoover
chain state, which the reference keeps only in host vectors inside the kernel
object and silently loses on checkpoint (CudaDrudeTGNHKernels.h:90-93,
SURVEY.md section 5).  Because it is a pytree, checkpoint/resume via orbax or
plain numpy save is exact, and vmap over replicas is trivial.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp


class SimState(NamedTuple):
    positions: jax.Array      # (N, 3) nm
    velocities: jax.Array     # (N, 3) nm/ps
    forces: jax.Array         # (N, 3) kJ/mol/nm (cached from last force pass)
    potential_energy: jax.Array  # scalar, kJ/mol (from last force pass)
    box: jax.Array            # (3, 3) nm, rows are box vectors
    eta: jax.Array            # (G+2, M) NH chain positions
    eta_dot: jax.Array        # (G+2, M+1) NH chain velocities (dummy last col = 0)
    eta_dot_dot: jax.Array    # (G+2, M) NH chain accelerations
    ke_sum: jax.Array         # scalar, total KE at last NH half step (reporting)
    group_ke: jax.Array       # (G+2,) per-bath 2*KE at last NH half step
    step: jax.Array           # int32 scalar
    time: jax.Array           # scalar ps
    key: jax.Array            # PRNG key (barostat MC moves)
    baro_scale: jax.Array     # scalar, adaptive MC volume move size (nm^3)
    baro_naccept: jax.Array   # int32
    baro_nattempt: jax.Array  # int32
    # sticky: a Drude moved >2x past the hard wall since the last reset —
    # the Reference platform throws here (ReferenceDrudeTGNHKernels.cpp:
    # 311-312); on device we latch a flag and raise on the host
    hardwall_runaway: Any = None
    neighbors: Any = None     # Optional[forces.neighborlist.Neighbors]
    # two-float compensated positions (f32 + Drude pairs only): the true
    # position is positions + pos_err.  Restores the low bits of the tiny
    # Drude-parent displacement that f32 absolute coordinates quantize away
    # (~1e-4 relative at a 0.01 nm displacement in an ~8 nm box), which
    # otherwise noise-heats the stiff Drude springs by ~0.3 K on a 1 K bath
    # (OpenMM's posqCorrection plays the same role in mixed precision).
    pos_err: Any = None
    # flattened-ensemble NPT (parallel/flatrep.py): per-replica isotropic
    # box scale s_r — replica r's physical box is box * s_r while the cell
    # grid stays planned on the shared template box (binning and the sweep
    # run in STORED coordinates p/s with r^2 scaled per cell; see
    # forces/cellpair._sweep_regular).  None everywhere else.
    rep_scale: Any = None


def zeros_state(n_atoms: int, n_groups: int, n_chains: int, box,
                real_dtype, accum_dtype, seed: int = 0,
                ensemble_r: int = 1) -> SimState:
    # flattened replica ensembles carry per-replica NH baths: leading R
    # axis on the chain state, per-replica ke_sum/group_ke
    lead = (ensemble_r,) if ensemble_r > 1 else ()
    return SimState(
        positions=jnp.zeros((n_atoms, 3), real_dtype),
        velocities=jnp.zeros((n_atoms, 3), real_dtype),
        forces=jnp.zeros((n_atoms, 3), real_dtype),
        potential_energy=jnp.zeros((), accum_dtype),
        box=jnp.asarray(box, real_dtype),
        eta=jnp.zeros(lead + (n_groups, n_chains), accum_dtype),
        eta_dot=jnp.zeros(lead + (n_groups, n_chains + 1), accum_dtype),
        eta_dot_dot=jnp.zeros(lead + (n_groups, n_chains), accum_dtype),
        ke_sum=jnp.zeros(lead, accum_dtype),
        group_ke=jnp.zeros(lead + (n_groups,), accum_dtype),
        step=jnp.zeros((), jnp.int32),
        time=jnp.zeros((), accum_dtype),
        key=jax.random.PRNGKey(seed),
        baro_scale=jnp.zeros((), accum_dtype),
        baro_naccept=jnp.zeros((), jnp.int32),
        baro_nattempt=jnp.zeros((), jnp.int32),
        hardwall_runaway=jnp.zeros((), jnp.bool_),
    )
