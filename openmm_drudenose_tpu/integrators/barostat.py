"""Monte-Carlo isotropic barostat, executed inside the jitted step.

The reference gets NPT through OpenMM's MonteCarloBarostat via
updateContextState() (DrudeTGNHIntegrator.cpp:186-189, example
nacl_tg.py:56-57).  Here the MC volume move is a lax.cond-gated branch of
the step function: propose dV, scale molecule centers-of-mass (not atoms —
intramolecular geometry is preserved), re-evaluate the potential, Metropolis
NPT accept/reject, with OpenMM's adaptive move-size schedule."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constraints.vsites import apply_vsites


def maybe_attempt_mc_move(spec, static, state, energy_and_forces,
                          recompute_current: bool = False,
                          n_mol: int = None):
    """recompute_current: the force-only step leaves
    state.potential_energy stale, so the MC branch re-evaluates the
    current-configuration energy itself (only at attempt steps).

    n_mol: molecule count for the N kT ln(V'/V) term — defaults to
    static.n_residues; the resident (molecule-sharded) engine passes the
    GLOBAL count because its local static counts only slot capacity."""
    if n_mol is None:
        n_mol = static.n_residues
    def attempt(state):
        accum = state.eta.dtype
        r = state.positions.dtype
        key, k_dv, k_acc = jax.random.split(state.key, 3)
        box_diag = jnp.diagonal(state.box)
        vol = (box_diag[0] * box_diag[1] * box_diag[2]).astype(accum)
        scale = jnp.where(state.baro_scale > 0, state.baro_scale, 0.01 * vol)
        dv = scale * (2.0 * jax.random.uniform(k_dv, dtype=accum) - 1.0)
        new_vol = vol + dv
        ls = (new_vol / vol) ** (1.0 / 3.0)

        # scale molecule COMs, keep intramolecular geometry
        from .tgnh import residue_sum
        mom = residue_sum(spec, static, spec.mass[:, None] * state.positions)
        com = mom * spec.res_inv_mass[:, None]
        new_pos = state.positions + (ls.astype(r) - 1.0) * com[spec.resid]
        new_pos = apply_vsites(spec, static, new_pos)
        new_box = state.box * ls.astype(r)

        pe_new, forces_new = energy_and_forces(new_pos, new_box,
                                               state.neighbors,
                                               state.pos_err)
        pe_new = pe_new.astype(accum)
        if recompute_current:
            pe_old, _ = energy_and_forces(state.positions, state.box,
                                          state.neighbors, state.pos_err)
            pe_old = pe_old.astype(accum)
        else:
            pe_old = state.potential_energy
        kt = spec.baro_kt
        w = (pe_new - pe_old + spec.baro_pressure * dv
             - n_mol * kt * jnp.log(new_vol / vol))
        accept = (w <= 0) | (jax.random.uniform(k_acc, dtype=accum)
                             < jnp.exp(-w / kt))

        positions = jnp.where(accept, new_pos, state.positions)
        box = jnp.where(accept, new_box, state.box)
        forces = jnp.where(accept, forces_new, state.forces)
        pe = jnp.where(accept, pe_new, state.potential_energy)
        naccept = state.baro_naccept + accept.astype(jnp.int32)
        nattempt = state.baro_nattempt + 1

        # adaptive move size (OpenMM MonteCarloBarostatImpl schedule)
        adapt = nattempt >= 10
        frac = naccept.astype(accum) / jnp.maximum(nattempt, 1).astype(accum)
        shrink = adapt & (frac < 0.25)
        grow = adapt & (frac > 0.75)
        scale = jnp.where(shrink, scale / 1.1, scale)
        scale = jnp.where(grow, jnp.minimum(scale * 1.1, vol * 0.3), scale)
        reset = shrink | grow
        naccept = jnp.where(reset, 0, naccept)
        nattempt = jnp.where(reset, 0, nattempt)

        return state._replace(
            positions=positions, box=box, forces=forces,
            potential_energy=pe, key=key, baro_scale=scale,
            baro_naccept=naccept, baro_nattempt=nattempt)

    return jax.lax.cond(state.step % static.baro_freq == 0,
                        attempt, lambda s: s, state)
