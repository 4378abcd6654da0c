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


def maybe_attempt_mc_move_ensemble(spec, static, state, energy_and_forces,
                                   mc_energies):
    """Per-replica MC volume moves for flattened NPT ensembles
    (parallel/flatrep.py): every replica draws its own dV, scales its own
    molecules' centers of mass, and accepts/rejects against its own
    per-replica energy (R,) from `mc_energies` — all inside one jitted
    branch.  The shared cell grid stays planned on the template box;
    per-replica physics rides SimState.rep_scale (stored-coordinate
    sweep, forces/cellpair._sweep_regular)."""
    import numpy as np

    R = static.ensemble_r
    n_atoms = static.n_atoms
    n_res = static.n_residues
    n_mol0 = n_res // R
    atom_rep = jnp.asarray(np.arange(n_atoms, dtype=np.int32)
                           // (n_atoms // R))
    res_rep = jnp.asarray(np.arange(n_res, dtype=np.int32) // n_mol0)

    def attempt(state):
        accum = state.eta.dtype
        r = state.positions.dtype
        key, k_dv, k_acc = jax.random.split(state.key, 3)
        box_diag = jnp.diagonal(state.box)
        vol0 = (box_diag[0] * box_diag[1] * box_diag[2]).astype(accum)
        s_old = state.rep_scale.astype(accum)
        vol = vol0 * s_old ** 3                                  # (R,)
        scale = jnp.where(state.baro_scale > 0, state.baro_scale,
                          0.01 * vol)
        dv = scale * (2.0 * jax.random.uniform(k_dv, (R,), dtype=accum)
                      - 1.0)
        new_vol = vol + dv
        ls = (new_vol / vol) ** (1.0 / 3.0)                      # (R,)

        from .tgnh import residue_sum
        from ..constraints.vsites import apply_vsites
        mom = residue_sum(spec, static,
                          spec.mass[:, None] * state.positions)
        com = mom * spec.res_inv_mass[:, None]
        ls_atom = ls.astype(r)[res_rep][spec.resid]
        new_pos = state.positions + ((ls_atom - 1.0)[:, None]
                                     * com[spec.resid])
        new_pos = apply_vsites(spec, static, new_pos)
        s_new = state.rep_scale * ls.astype(state.rep_scale.dtype)

        pe_new = mc_energies(new_pos, state.box, state.neighbors,
                             s_new).astype(accum)
        pe_old = mc_energies(state.positions, state.box, state.neighbors,
                             state.rep_scale).astype(accum)
        kt = spec.baro_kt
        w = (pe_new - pe_old + spec.baro_pressure * dv
             - n_mol0 * kt * jnp.log(new_vol / vol))
        accept = (w <= 0) | (jax.random.uniform(k_acc, (R,), dtype=accum)
                             < jnp.exp(-w / kt))                 # (R,)

        rep_scale = jnp.where(accept.astype(state.rep_scale.dtype) > 0,
                              s_new, state.rep_scale)
        acc_atom = accept[atom_rep]
        positions = jnp.where(acc_atom[:, None], new_pos, state.positions)
        # mixed accept/reject outcome: recompute forces once at the final
        # (positions, rep_scale) — attempt steps are 1-in-baro_freq
        pe_tot, forces = energy_and_forces(positions, state.box,
                                           state.neighbors, state.pos_err,
                                           rep_scale=rep_scale)

        naccept = state.baro_naccept + accept.astype(jnp.int32)
        nattempt = state.baro_nattempt + 1

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
            positions=positions, forces=forces,
            potential_energy=pe_tot.astype(accum), key=key,
            rep_scale=rep_scale, baro_scale=scale,
            baro_naccept=naccept, baro_nattempt=nattempt)

    return jax.lax.cond(state.step % static.baro_freq == 0,
                        attempt, lambda s: s, state)
