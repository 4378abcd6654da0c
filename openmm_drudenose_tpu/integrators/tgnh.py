"""Temperature-Grouped dual Nose-Hoover (TGNH) integrator, TPU-native.

Implements the full temperature-grouped algorithm of the reference CUDA
platform (Son, McDaniel, Cui, Yethiraj, JPCL 2019) with a TPU-first design:

  * The per-step pipeline follows CudaIntegrateDrudeTGNHStepKernel::execute
    (CudaDrudeTGNHKernels.cpp:284-408): NH half-step -> velocity scale ->
    half-kick -> position constraints -> position update -> hard wall ->
    virtual sites -> force pass -> second half-kick -> velocity constraints
    -> second NH half-step.
  * The reference's 2 device->host downloads + 2 uploads per step
    (CudaDrudeTGNHKernels.cpp:490,337) are gone: per-group kinetic energies
    are on-device segment_sums and the NH multi-timestep loop
    (CudaDrudeTGNHKernels.cpp:558-642) is a lax.fori_loop over (G+2)-vectors,
    advancing ALL temperature groups in parallel instead of the reference's
    serial per-group host loop.
  * Drude pair COM/relative kinematics (drudeTGNH.cu:307-365, :249-301) are
    computed densely per atom with a partner gather — each pair member
    derives its own update, so there are no scatters and no index lists;
    everything is VPU-friendly elementwise math that XLA fuses.

All math that the reference keeps in double (NH chain state, KE reductions)
is performed in the spec's accumulation dtype.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constraints import settle, shake
from ..constraints.vsites import apply_vsites
from ..core.spec import StaticSpec, SystemSpec
from ..core.state import SimState


# ---------------------------------------------------------------------------
# kinetic energy decomposition
# ---------------------------------------------------------------------------

def _safe_inv(x):
    return jnp.where(x > 0, 1.0 / jnp.where(x > 0, x, 1.0), 0.0)


def _gather_rows(x, idx):
    """x[idx] for (N, 3) arrays via the (3, N) layout: the row gather runs
    on 2D arrays with atoms on the lane axis (a trailing size-3 axis on a
    large random gather costs ~42x in lane padding — CLAUDE.md perf
    rules).  XLA folds the transposes into neighboring elementwise work."""
    return x.T[:, idx].T


def _partner_rows_t(spec: SystemSpec, static: StaticSpec, xt):
    """xt[:, spec.partner] for (3, N) arrays — the pair-partner gather the
    kinematics runs ~10x per step.  With a uniform molecule-major layout
    (static.uniform_k, core/spec.py detection) the partner index is
    i + d[i % K] for a fixed K-periodic offset pattern, so the random
    gather becomes a select over a few lane-SHIFTED copies (pure
    elementwise work XLA fuses; random lane gathers measured ~40x a
    linear pass on v5e).  The shifts never select their cyclic wrap:
    partners stay inside the residue block, so i + d is always in range
    where the offset mask is true."""
    if not static.uniform_k:
        return xt[:, spec.partner]
    pat = np.asarray(static.partner_offsets)
    distinct = sorted(set(static.partner_offsets))
    if distinct == [0]:
        return xt
    n = static.n_atoms
    out = xt
    for d in distinct:
        if d == 0:
            continue
        mask = jnp.asarray(np.tile(pat == d, n // static.uniform_k))
        out = jnp.where(mask[None, :], jnp.roll(xt, -d, axis=1), out)
    return out


def _partner_rows(spec: SystemSpec, static: StaticSpec, x):
    """(N, 3) wrapper over _partner_rows_t."""
    return _partner_rows_t(spec, static, x.T).T


def residue_sum_t(spec: SystemSpec, xt, uniform_k: int = 0):
    """Sum a per-atom (3, N) quantity over residues -> (3, R), via the
    padded member-gather table (TPU scatters/segment_sums are slow; a
    fixed-width gather + axis-reduce is fused elementwise work).  The
    (3, N) lane-major layout is 7x faster than per-component gathers of
    (N, 3) column slices (measured on v5e, scripts/bench_layout.py).

    uniform_k > 0 (uniform molecule-major layout, core/spec.py): every
    residue is exactly K consecutive atoms, so the gather collapses to a
    pure reshape-sum (random (R, S) gathers measured ~40x a linear pass
    on v5e; 12.7 ms of group-KE at 1M atoms was mostly this table)."""
    if uniform_k:
        n = xt.shape[1]
        return jnp.sum(xt.reshape(3, n // uniform_k, uniform_k), axis=2)
    vtp = jnp.concatenate([xt, jnp.zeros((3, 1), xt.dtype)], axis=1)
    return jnp.sum(vtp[:, spec.res_members], axis=2)


def residue_sum(spec: SystemSpec, static: StaticSpec, per_atom):
    """(N, 3) -> (R, 3) wrapper over residue_sum_t."""
    return residue_sum_t(spec, per_atom.T,
                         uniform_k=static.uniform_k).T


def expand_residues_t(spec: SystemSpec, xr, uniform_k: int = 0):
    """Broadcast a per-residue (3, R) quantity back to atoms (3, N):
    reshape-broadcast for uniform layouts, resid gather otherwise."""
    if uniform_k:
        r = xr.shape[1]
        return jnp.broadcast_to(
            xr[:, :, None], (3, r, uniform_k)).reshape(3, r * uniform_k)
    return xr[:, spec.resid]


def com_and_norm_velocities_t(spec: SystemSpec, static: StaticSpec, vt):
    """Per-residue COM velocities (3, R) and residue-relative
    ('normalized') velocities (3, N) (drudeTGNH.cu:82-133).  With
    use_com_temp_group=False the COM velocities are zero and norm == lab
    velocities.  All math in (3, N): a trailing size-3 axis on 100k-atom
    elementwise chains pads lanes 3->128 (CLAUDE.md perf rules)."""
    if static.use_com_temp_group:
        mom = residue_sum_t(spec, spec.mass[None, :] * vt,
                            uniform_k=static.uniform_k)
        com_vel_t = mom * spec.res_inv_mass[None, :]
    else:
        com_vel_t = jnp.zeros((3, static.n_residues), vt.dtype)
    norm_vel_t = vt - expand_residues_t(spec, com_vel_t,
                                        uniform_k=static.uniform_k)
    return com_vel_t, norm_vel_t


def group_kinetic_energies_t(spec: SystemSpec, static: StaticSpec, vt,
                             accum_dtype):
    """Per-bath 2*KE vector of length G+2 (drudeTGNH.cu:138-200):
      slots 0..G-1 : molecular-internal real DOF per user group
      slot G       : molecular COM bath
      slot G+1     : Drude internal (relative) bath
    Plus the (3, R)/(3, N) com/norm velocities for reuse by the scale
    kernel."""
    G = static.n_temp_groups
    E = static.ensemble_r
    com_vel_t, norm_vel_t = com_and_norm_velocities_t(spec, static, vt)

    cv = com_vel_t.astype(accum_dtype)
    nv = norm_vel_t.astype(accum_dtype)
    mass = spec.mass.astype(accum_dtype)

    def rsum(x_flat):
        """Full sum (scalar) — or per-replica sums (E,) for flattened
        ensembles (replica-major layout: replica = index // block)."""
        if E == 1:
            return jnp.sum(x_flat)
        return jnp.sum(x_flat.reshape(E, -1), axis=1)

    # COM bath: sum_res M_res |v_com|^2
    ke_com = rsum(spec.res_mass.astype(accum_dtype)
                  * jnp.sum(cv * cv, axis=0))

    # normal particles: m |nv|^2 into their group
    ke_atom = mass * jnp.sum(nv * nv, axis=0)

    if static.has_pairs:
        j = spec.partner
        m_i = mass
        m_j = mass[j]
        mtot = m_i + m_j
        inv_mtot = _safe_inv(mtot)
        nv_j = _partner_rows_t(spec, static, nv)
        cm = (m_i[None, :] * nv + m_j[None, :] * nv_j) * inv_mtot[None, :]
        rel = nv - nv_j  # sign irrelevant for |rel|^2
        mu = m_i * m_j * inv_mtot
        ke_cm = 0.5 * mtot * jnp.sum(cm * cm, axis=0)       # half per member
        ke_rel = 0.5 * mu * jnp.sum(rel * rel, axis=0)
        ke_group_directed = jnp.where(spec.is_pair, ke_cm, ke_atom)
        ke_drude = rsum(jnp.where(spec.is_pair, ke_rel, 0.0))
    else:
        ke_group_directed = ke_atom
        ke_drude = jnp.zeros((E,) if E > 1 else (), accum_dtype)

    # per-group reduction: G is small and static, so masked sums beat a
    # segment_sum scatter on TPU
    if G == 1:
        ke_groups = [rsum(ke_group_directed)]
    else:
        ke_groups = [rsum(jnp.where(spec.tg == g, ke_group_directed, 0.0))
                     for g in range(G)]
    # (G+2,) — or (E, G+2) per-replica bath vectors for ensembles
    ke = jnp.stack(ke_groups + [ke_com, ke_drude], axis=-1)
    return ke, com_vel_t, norm_vel_t


def group_kinetic_energies(spec: SystemSpec, static: StaticSpec, velocities,
                           accum_dtype):
    """(N, 3) wrapper over group_kinetic_energies_t."""
    ke, cv_t, nv_t = group_kinetic_energies_t(spec, static, velocities.T,
                                              accum_dtype)
    return ke, cv_t.T, nv_t.T


# ---------------------------------------------------------------------------
# NH chain propagation (the MTS loop), vectorized over all baths
# ---------------------------------------------------------------------------

def propagate_nh_chain(spec: SystemSpec, static: StaticSpec, ke,
                       eta, eta_dot, eta_dot_dot, dt,
                       return_final_ke: bool = False):
    """Half-step NH chain update for all G+2 baths at once.

    Mirrors CudaIntegrateDrudeTGNHStepKernel::propagateNHChain
    (CudaDrudeTGNHKernels.cpp:558-642): numDrudeSteps iterations of a
    symmetric Trotter update with exp(-dtc/8) damping and dtc/4 kicks.  The
    reference loops over groups serially on the host; all baths here are
    components of (G+2,)-vectors updated together on device.  The Drude bath
    freezes chain links >= 1 unless use_drude_nh_chains (link_active mask).

    Returns (vscale, eta, eta_dot, eta_dot_dot); with return_final_ke also
    the loop's damped KE vector (== vscale^2 * ke bit-for-bit, the KE the
    system will measure after apply_vscale — the NH-pair fusion in
    make_multi_step reuses it to skip one full KE evaluation per step).
    """
    M = static.n_chains
    a = eta.dtype
    dtc = (dt / static.drude_steps).astype(a)
    dtc2, dtc4, dtc8 = dtc / 2, dtc / 4, dtc / 8

    # NH constants are per-replica (G+2,)-shaped even for flattened
    # ensembles (build_spec divides the ext accounting by R); they
    # broadcast against (..., G+2) bath vectors and (..., G+2, M) chains
    eta_mass = spec.nh_eta_mass
    nkbt = spec.nh_nkbt
    kbt_chain = spec.nh_kbt_chain
    link = spec.nh_link_active
    inv_eta_mass0 = _safe_inv(eta_mass[:, 0])
    mass0_pos = eta_mass[:, 0] > 0

    # initial etaDotDot[0] from current KE (CudaDrudeTGNHKernels.cpp:560-562,605)
    edd0 = jnp.where(mass0_pos, (ke - nkbt) * inv_eta_mass0,
                     eta_dot_dot[..., 0])
    eta_dot_dot = eta_dot_dot.at[..., 0].set(edd0)

    def one_iter(_, carry):
        eta, eta_dot, eta_dot_dot, ke, vscale = carry
        # downward sweep: links M-1 .. 0
        for i in reversed(range(M)):
            expfac = jnp.exp(-dtc8 * eta_dot[..., i + 1])
            new = (eta_dot[..., i] * expfac
                   + eta_dot_dot[..., i] * dtc4) * expfac
            eta_dot = eta_dot.at[..., i].set(
                jnp.where(link[:, i], new, eta_dot[..., i]))
        # scale velocities and KE
        damp = jnp.exp(-dtc2 * eta_dot[..., 0])
        vscale = vscale * damp
        ke = ke * damp * damp
        # advance chain positions
        eta = eta + jnp.where(link, dtc2 * eta_dot[..., :M], 0.0)
        # refresh link-0 acceleration from damped KE and re-kick link 0
        edd0 = jnp.where(mass0_pos, (ke - nkbt) * inv_eta_mass0,
                         eta_dot_dot[..., 0])
        eta_dot_dot = eta_dot_dot.at[..., 0].set(edd0)
        expfac0 = jnp.exp(-dtc8 * eta_dot[..., 1])
        eta_dot = eta_dot.at[..., 0].set(
            (eta_dot[..., 0] * expfac0 + edd0 * dtc4) * expfac0)
        # upward sweep: links 1 .. M-1
        for i in range(1, M):
            expfac = jnp.exp(-dtc8 * eta_dot[..., i + 1])
            d = eta_dot[..., i] * expfac
            eddi = ((eta_mass[:, i - 1] * eta_dot[..., i - 1] ** 2
                     - kbt_chain) * _safe_inv(eta_mass[:, i]))
            d = (d + eddi * dtc4) * expfac
            eta_dot = eta_dot.at[..., i].set(jnp.where(link[:, i], d,
                                                       eta_dot[..., i]))
            eta_dot_dot = eta_dot_dot.at[..., i].set(
                jnp.where(link[:, i], eddi, eta_dot_dot[..., i]))
        return eta, eta_dot, eta_dot_dot, ke, vscale

    vscale0 = jnp.ones_like(ke)
    eta, eta_dot, eta_dot_dot, ke, vscale = jax.lax.fori_loop(
        0, static.drude_steps, one_iter,
        (eta, eta_dot, eta_dot_dot, ke, vscale0))
    if return_final_ke:
        return vscale, eta, eta_dot, eta_dot_dot, ke
    return vscale, eta, eta_dot, eta_dot_dot


# ---------------------------------------------------------------------------
# velocity operations (dense per-atom, partner-gather for pairs)
# ---------------------------------------------------------------------------

def apply_vscale_t(spec: SystemSpec, static: StaticSpec, vt,
                   com_vel_t, norm_vel_t, vscale):
    """Rescale (3, N) velocities bath-by-bath (drudeTGNH.cu:249-301):
    molecular-internal part by the atom's group scale, COM part by the COM
    scale; pair internal parts further split into pair-COM (group scale)
    and Drude-relative (Drude scale)."""
    G = static.n_temp_groups
    r = vt.dtype
    vs = vscale.astype(r)
    if static.ensemble_r > 1:
        # per-replica bath scales (E, G+2), replica-major atoms: expand a
        # bath column to per-atom rows by broadcast+reshape and resolve the
        # group dimension by masked sums — flat (N,) gathers here measured
        # ~3x the whole-op cost on TPU (scripts/probe_flat_parts.py)
        E = static.ensemble_r
        n0 = static.n_atoms // E

        def per_atom(col):
            return jnp.broadcast_to(
                vs[:, col][:, None], (E, n0)).reshape(1, -1)

        if G == 1:
            vs_atom = per_atom(0)
        else:
            vs_atom = per_atom(0)
            for g in range(1, G):
                vs_atom = jnp.where(spec.tg[None, :] == g,
                                    per_atom(g), vs_atom)
        vs_com = per_atom(G)
        vs_drude = per_atom(G + 1)
    else:
        if G == 1:
            vs_atom = vs[0]          # scalar broadcast beats a (N,) gather
        else:
            vs_atom = vs[spec.tg][None, :]
        vs_com = vs[G]
        vs_drude = vs[G + 1]
    vel_com_part = vt - norm_vel_t  # = com_vel[resid] for massive atoms

    movable = (spec.inv_mass > 0)[None, :]
    new_v = vs_atom * norm_vel_t + vs_com * vel_com_part

    if static.has_pairs:
        j = spec.partner
        m_i = spec.mass
        m_j = spec.mass[j]
        inv_mtot = _safe_inv(m_i + m_j)
        nv_j = _partner_rows_t(spec, static, norm_vel_t)
        sign = jnp.where(spec.is_parent, 1.0, -1.0).astype(r)[None, :]
        cm = ((m_i * inv_mtot)[None, :] * norm_vel_t
              + (m_j * inv_mtot)[None, :] * nv_j)
        rel = sign * (norm_vel_t - nv_j)  # oriented parent - drude
        pair_v = (vs_atom * cm
                  + vs_drude * rel * sign * (m_j * inv_mtot)[None, :]
                  + vs_com * vel_com_part)
        new_v = jnp.where(spec.is_pair[None, :], pair_v, new_v)

    return jnp.where(movable, new_v, vt)


def apply_vscale(spec: SystemSpec, static: StaticSpec, velocities,
                 com_vel, norm_vel, vscale):
    """(N, 3) wrapper over apply_vscale_t."""
    return apply_vscale_t(spec, static, velocities.T, com_vel.T,
                          norm_vel.T, vscale).T


def half_kick_t(spec: SystemSpec, static: StaticSpec, vt, ft, dt):
    """Half-step velocity kick on (3, N) arrays (drudeTGNH.cu:307-365).
    Normal particles get v += dt/2 * F/m; Drude pairs are kicked in
    COM/relative coordinates."""
    r = vt.dtype
    fscale = (0.5 * dt).astype(r)
    new_v = vt + fscale * spec.inv_mass[None, :] * ft

    if static.has_pairs:
        j = spec.partner
        m_i = spec.mass
        m_j = spec.mass[j]
        mtot = m_i + m_j
        inv_mtot = _safe_inv(mtot)
        inv_red = mtot * spec.inv_mass * spec.inv_mass[j]  # M/(m_i m_j)
        v_j = _partner_rows_t(spec, static, vt)
        f_j = _partner_rows_t(spec, static, ft)
        sign = jnp.where(spec.is_parent, 1.0, -1.0).astype(r)[None, :]
        cm = ((m_i * inv_mtot)[None, :] * vt
              + (m_j * inv_mtot)[None, :] * v_j)
        rel = sign * (vt - v_j)                              # parent - drude
        cm_f = ft + f_j
        rel_f = sign * ((m_j * inv_mtot)[None, :] * ft
                        - (m_i * inv_mtot)[None, :] * f_j)
        cm = cm + fscale * inv_mtot[None, :] * cm_f
        rel = rel + fscale * inv_red[None, :] * rel_f
        pair_v = cm + sign * (m_j * inv_mtot)[None, :] * rel
        new_v = jnp.where(spec.is_pair[None, :], pair_v, new_v)

    movable = (spec.inv_mass > 0)[None, :]
    return jnp.where(movable, new_v, vt)


def half_kick(spec: SystemSpec, static: StaticSpec, velocities, forces, dt):
    """(N, 3) wrapper over half_kick_t."""
    return half_kick_t(spec, static, velocities.T, forces.T, dt).T


def apply_hardwall(spec: SystemSpec, static: StaticSpec, positions,
                   velocities, dt, pos_err=None):
    """Elastic bounce of the Drude-parent distance off the hard wall
    (drudeTGNH.cu:471-574).  Dense per-atom: each pair member computes the
    full two-body solution and writes only its own row."""
    r = positions.dtype
    max_dist = spec.max_drude_distance.astype(r)
    hw_scale = spec.hardwall_scale.astype(r)

    i_is_parent = spec.is_parent
    j = spec.partner
    # role-resolved views: (drude, parent) per pair member
    pos_j = _partner_rows(spec, static, positions)
    vel_j = _partner_rows(spec, static, velocities)
    pos_d = jnp.where(i_is_parent[:, None], pos_j, positions)
    pos_p = jnp.where(i_is_parent[:, None], positions, pos_j)
    vel_d = jnp.where(i_is_parent[:, None], vel_j, velocities)
    vel_p = jnp.where(i_is_parent[:, None], velocities, vel_j)
    m_d = jnp.where(i_is_parent, spec.mass[j], spec.mass)
    m_p = jnp.where(i_is_parent, spec.mass, spec.mass[j])

    delta = pos_d - pos_p
    if pos_err is not None:
        # compensate the tiny pair displacement (the hi-hi difference is
        # exact by Sterbenz; the dropped bits live in pos_err)
        err_j = _partner_rows(spec, static, pos_err)
        err_d = jnp.where(i_is_parent[:, None], err_j, pos_err)
        err_p = jnp.where(i_is_parent[:, None], pos_err, err_j)
        delta = delta + (err_d - err_p)
    r2 = jnp.sum(delta * delta, axis=-1)
    rdist = jnp.sqrt(jnp.where(spec.is_pair, r2, 1.0))
    violated = spec.is_pair & (rdist > max_dist)
    # "moved too far beyond" detection: the Reference platform throws when
    # the pre-bounce displacement exceeds twice the wall
    # (ReferenceDrudeTGNHKernels.cpp:311-312); latched as a sticky flag
    runaway = jnp.any(spec.is_pair & (rdist > 2.0 * max_dist))
    bond_dir = delta / rdist[:, None]

    dotvr1 = jnp.sum(vel_d * bond_dir, axis=-1)
    dotvr2 = jnp.sum(vel_p * bond_dir, axis=-1)
    delta_r = rdist - max_dist

    parent_massless = m_p <= 0

    # --- branch A: massless parent, move only the Drude particle ----------
    abs_v1 = jnp.abs(dotvr1)
    dt_a = jnp.where(abs_v1 > 0, delta_r / jnp.where(abs_v1 > 0, abs_v1, 1.0), dt)
    dt_a = jnp.minimum(dt_a, dt)
    new_dotvr1_a = -jnp.sign(dotvr1) * hw_scale / jnp.sqrt(jnp.where(m_d > 0, m_d, 1.0))
    dr_a = -delta_r + dt_a * new_dotvr1_a

    # --- branch B: both massive ------------------------------------------
    inv_mtot = _safe_inv(m_d + m_p)
    vb_cm = (m_d * dotvr1 + m_p * dotvr2) * inv_mtot
    dv1 = dotvr1 - vb_cm
    dv2 = dotvr2 - vb_cm
    dvrel = jnp.abs(dv1 - dv2)
    dt_b = jnp.where(dvrel > 0, delta_r / jnp.where(dvrel > 0, dvrel, 1.0), dt)
    dt_b = jnp.minimum(dt_b, dt)
    v_bond = hw_scale / jnp.sqrt(jnp.where(m_d > 0, m_d, 1.0))
    new_dv1 = -jnp.sign(dv1) * v_bond * m_p * inv_mtot
    new_dv2 = -jnp.sign(dv2) * v_bond * m_d * inv_mtot
    dr1 = -delta_r * m_p * inv_mtot + dt_b * new_dv1
    dr2 = delta_r * m_d * inv_mtot + dt_b * new_dv2

    # own-row resolution (each pair member updates only itself; a massless
    # parent is never moved — masked below via `moved`)
    is_drude_member = spec.is_pair & ~i_is_parent
    own_dotvr = jnp.where(is_drude_member, dotvr1, dotvr2)
    dr_own = jnp.where(parent_massless,
                       jnp.where(is_drude_member, dr_a, 0.0),
                       jnp.where(is_drude_member, dr1, dr2))
    new_dotvr_own = jnp.where(
        parent_massless,
        jnp.where(is_drude_member, new_dotvr1_a, own_dotvr),
        jnp.where(is_drude_member, new_dv1 + vb_cm, new_dv2 + vb_cm))
    vel_perp = velocities - own_dotvr[:, None] * bond_dir
    moved = violated & ~(parent_massless & i_is_parent)
    new_pos = jnp.where(moved[:, None], positions + bond_dir * dr_own[:, None],
                        positions)
    new_vel = jnp.where(moved[:, None],
                        vel_perp + bond_dir * new_dotvr_own[:, None],
                        velocities)
    return new_pos, new_vel, runaway


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

def make_step(static: StaticSpec,
              energy_and_forces: Callable,
              forces_fn: Callable = None,
              reduce_axis: str = None,
              baro_n_mol: int = None,
              mc_energies: Callable = None,
              ) -> Callable[[SystemSpec, SimState], SimState]:
    """Build step(spec, state) -> state.

    reduce_axis: mesh axis name when the step runs on device-LOCAL state
    inside shard_map (parallel/resident.py): the per-bath KE vector and
    the CM-removal momentum are psum'd over it — the only global
    reductions TGNH needs (SURVEY.md section 2.8).

    energy_and_forces(positions, box, neighbors) -> (potential_energy,
    forces) must already include virtual-site position composition (so
    forces on massless sites are zero and parents carry the redistributed
    force).  Neighbor-structure refresh is NOT part of the step: callers
    either rebuild on the host between scans or use make_multi_step's
    statically-segmented in-scan rebuilds.

    forces_fn(positions, box, neighbors, pos_err) -> forces, when given, is
    the in-step force pass (energy-free: ~1/3 less pair-chain work on the
    sweep); state.potential_energy then goes stale between host-level
    energy requests (Context._ensure_pe recomputes it on demand, and the
    barostat re-evaluates the current energy inside its MC branch).
    """
    G = static.n_temp_groups

    def nh_half(spec, state, vt):
        """First/second NH half step on (3, N) velocities (the whole
        kinematics path runs lane-major: a trailing size-3 axis on
        100k-atom elementwise chains pads lanes 3->128)."""
        accum = state.eta.dtype
        ke, com_vel_t, norm_vel_t = group_kinetic_energies_t(
            spec, static, vt, accum)
        if reduce_axis is not None:
            ke = jax.lax.psum(ke, reduce_axis)
        vscale, eta, eta_dot, eta_dot_dot = propagate_nh_chain(
            spec, static, ke, state.eta, state.eta_dot, state.eta_dot_dot,
            spec.dt)
        new_vt = apply_vscale_t(spec, static, vt, com_vel_t, norm_vel_t,
                                vscale)
        ke_sum = 0.5 * jnp.sum(ke, axis=-1)   # (E,) per replica / scalar
        state = state._replace(eta=eta, eta_dot=eta_dot,
                               eta_dot_dot=eta_dot_dot, ke_sum=ke_sum,
                               group_ke=ke)
        return state, new_vt

    def apply_barostat(spec, state):
        if static.baro_freq > 0:
            from . import barostat
            if getattr(state, "rep_scale", None) is not None:
                state = barostat.maybe_attempt_mc_move_ensemble(
                    spec, static, state, energy_and_forces, mc_energies)
            else:
                state = barostat.maybe_attempt_mc_move(
                    spec, static, state, energy_and_forces,
                    recompute_current=forces_fn is not None,
                    n_mol=baro_n_mol)
        return state

    def update_context_state(spec, state):
        """Barostat / CM motion removal (DrudeTGNHIntegrator.cpp:186-189)."""
        if static.cm_freq > 0:
            def remove_cm(v):
                E = static.ensemble_r
                if E > 1:
                    # per-replica CM removal (replica-major layout)
                    n0 = static.n_atoms // E
                    mv = (spec.mass[:, None] * v).reshape(E, n0, 3)
                    mom = jnp.sum(mv, axis=1, keepdims=True)   # (E, 1, 3)
                    total_mass = jnp.sum(spec.mass.reshape(E, n0),
                                         axis=1)[:, None, None]
                    vr = (v.reshape(E, n0, 3)
                          - mom / total_mass).reshape(-1, 3)
                    return jnp.where((spec.inv_mass > 0)[:, None], vr, v)
                mom = jnp.sum(spec.mass[:, None] * v, axis=0)
                total_mass = jnp.sum(spec.mass)
                if reduce_axis is not None:
                    mom = jax.lax.psum(mom, reduce_axis)
                    total_mass = jax.lax.psum(total_mass, reduce_axis)
                v_cm = mom / total_mass
                return jnp.where((spec.inv_mass > 0)[:, None], v - v_cm, v)
            state = state._replace(velocities=jax.lax.cond(
                state.step % static.cm_freq == 0, remove_cm, lambda v: v,
                state.velocities))
        return apply_barostat(spec, state)

    def core(spec, state, vt):
        """Everything between the two NH half-steps: first half kick through
        velocity constraints.  Takes post-NH1 (3, N) velocities; returns
        (state, v) with positions/forces/step/time advanced and v the
        post-velocity-constraint (N, 3) velocities (NH2 still pending)."""
        dt = spec.dt.astype(state.positions.dtype)

        # -- first half kick; position delta --------------------------------
        vt = half_kick_t(spec, static, vt, state.forces.T, dt)
        v = vt.T
        movable = (spec.inv_mass > 0)[:, None]
        delta = jnp.where(movable, dt * v, 0.0)

        # -- position constraints ------------------------------------------
        # triangle clusters: direct Newton solve (constraints/settle.py);
        # anything else: Jacobi SHAKE sweeps
        if static.n_settle:
            delta = settle.apply_position_constraints(
                state.positions, delta, spec.inv_mass, spec.settle_idx,
                spec.settle_dist, spec.settle_gather,
                uniform=getattr(static, "settle_uniform", ()))
        if static.n_shake:
            delta = shake.apply_position_constraints(
                state.positions, delta, spec.inv_mass, spec.shake_idx,
                spec.shake_dist, static.constraint_tol,
                static.shake_max_iter)

        # -- position update; velocity from constrained displacement --------
        if state.pos_err is not None:
            # compensated (two-float) update: keep the bits of the true
            # position that f32 storage drops (state.pos_err docs)
            total = state.pos_err + delta
            pos = state.positions + total
            state = state._replace(
                pos_err=(state.positions - pos) + total)
        else:
            pos = state.positions + delta
        v = jnp.where(movable, delta / dt, v)

        # -- hard wall -------------------------------------------------------
        if static.has_hardwall and static.has_pairs:
            pos, v, runaway = apply_hardwall(spec, static, pos, v, dt,
                                             pos_err=state.pos_err)
            if state.hardwall_runaway is not None:
                state = state._replace(
                    hardwall_runaway=state.hardwall_runaway | runaway)

        # -- virtual sites + force pass --------------------------------------
        pos = apply_vsites(spec, static, pos)
        # flat-ensemble NPT threads the per-replica box scale into the
        # force pass as an opt-in kwarg (None everywhere else, so engines
        # that pass their own forces_fn closures are untouched)
        fkw = ({"rep_scale": state.rep_scale}
               if getattr(state, "rep_scale", None) is not None else {})
        if forces_fn is not None:
            forces = forces_fn(pos, state.box, state.neighbors,
                               state.pos_err, **fkw)
            pe = state.potential_energy  # stale; recomputed on demand
        else:
            pe, forces = energy_and_forces(pos, state.box, state.neighbors,
                                           state.pos_err, **fkw)

        # -- second half kick -------------------------------------------------
        v = half_kick_t(spec, static, v.T, forces.T, dt).T

        # -- velocity constraints ---------------------------------------------
        if static.n_settle:
            v = settle.apply_velocity_constraints(
                pos, v, spec.inv_mass, spec.settle_idx, spec.settle_dist,
                spec.settle_gather,
                uniform=getattr(static, "settle_uniform", ()))
        if static.n_shake:
            v = shake.apply_velocity_constraints(
                pos, v, spec.inv_mass, spec.shake_idx, spec.shake_dist,
                static.constraint_tol, static.shake_max_iter)

        state = state._replace(positions=pos, forces=forces,
                               potential_energy=pe.astype(state.eta.dtype),
                               step=state.step + 1,
                               time=state.time + spec.dt)
        return state, v

    def step(spec: SystemSpec, state: SimState) -> SimState:
        state = update_context_state(spec, state)
        # -- first NH half step + velocity scaling (3, N) -------------------
        state, vt = nh_half(spec, state, state.velocities.T)
        state, v = core(spec, state, vt)
        # -- second NH half step ----------------------------------------------
        state, vt = nh_half(spec, state, v.T)
        return state._replace(velocities=vt.T)

    step.update_context_state = update_context_state
    step.apply_barostat = apply_barostat
    step.nh_half = nh_half
    step.core = core
    return step


def make_multi_step(static: StaticSpec, energy_and_forces: Callable,
                    inner_steps: int, neighbor_fn: Callable = None,
                    rebuild_interval: int = 16, forces_fn: Callable = None,
                    skin: float = None, fuse_nh: bool = True,
                    reduce_axis: str = None, baro_n_mol: int = None,
                    mc_energies: Callable = None):
    """lax.scan over `inner_steps` steps per host call.

    With neighbor_fn, rebuilds are STATICALLY SEGMENTED: the scan runs as
    `rebuild_interval`-step segments with an unconditional neighbor rebuild
    at each segment head (no per-step lax.cond — a cond carries the whole
    neighbor pytree through every step and blocks fusion across the branch).
    The caller is expected to have just rebuilt on the host
    (Context._ensure_neighbors), so the FIRST segment reuses that structure
    and the device rebuild runs only between segments.  Overflow and
    full-skin drift breaches latch into the carried Neighbors flags exactly
    as the host-side rebuild would.

    fuse_nh: the second NH half of step k and the first NH half of step
    k+1 are adjacent (nothing between them changes velocities except the
    analytically-correctable CM removal), so the scan body measures the
    per-bath KE ONCE, propagates both chain halves, and applies both bath
    scalings as one elementwise-composed apply_vscale — saving one full
    group-KE evaluation and one velocity-scaling pass per step.  The
    composition is exact in real arithmetic (bath scalings commute with
    the COM/internal/pair-relative decomposition, and CM removal shifts
    only the COM bath's KE by -M_tot |v_cm|^2); floats differ from the
    unfused path at roundoff order only.

    reduce_axis / baro_n_mol: forwarded to make_step for device-local
    state under shard_map (parallel/resident.py) — the fused body psums
    its single KE measurement and the CM momentum over the axis."""
    step = make_step(static, energy_and_forces, forces_fn=forces_fn,
                     reduce_axis=reduce_axis, baro_n_mol=baro_n_mol,
                     mc_energies=mc_energies)

    if fuse_nh and inner_steps >= 2:
        return _make_multi_step_fused(static, step, inner_steps, neighbor_fn,
                                      rebuild_interval, skin,
                                      reduce_axis=reduce_axis)

    def body_factory(spec):
        def body(s, _):
            return step(spec, s), None
        return body

    if neighbor_fn is None:
        def multi(spec: SystemSpec, state: SimState) -> SimState:
            state, _ = jax.lax.scan(body_factory(spec), state, None,
                                    length=inner_steps)
            return state
        return multi

    rebuild = _make_neighbor_rebuild(neighbor_fn, skin)
    first = min(rebuild_interval, inner_steps)
    n_seg, tail = divmod(inner_steps - first, rebuild_interval)

    def multi(spec: SystemSpec, state: SimState) -> SimState:
        body = body_factory(spec)
        state, _ = jax.lax.scan(body, state, None, length=first)
        if n_seg:
            def seg(s, _):
                s = rebuild(s)
                s, _ = jax.lax.scan(body, s, None, length=rebuild_interval)
                return s, None
            state, _ = jax.lax.scan(seg, state, None, length=n_seg)
        if tail:
            state = rebuild(state)
            state, _ = jax.lax.scan(body, state, None, length=tail)
        return state

    return multi


def _make_neighbor_rebuild(neighbor_fn, skin):
    """state -> state with a fresh neighbor structure; sticky flags
    (overflow, full-skin drift breach, excluded-pair cell span) latch
    forward across rebuilds so one host readback per chunk sees them."""
    def rebuild(state):
        rs = getattr(state, "rep_scale", None)
        if rs is not None:
            nbl = neighbor_fn(state.positions, state.box, rs)
        else:
            nbl = neighbor_fn(state.positions, state.box)
        nbl = nbl._replace(overflow=nbl.overflow | state.neighbors.overflow)
        if skin is not None and getattr(
                state.neighbors, "drift_exceeded", None) is not None:
            # atoms far outran the skin since the previous rebuild: pairs
            # may have been missed (latched).  Two criteria:
            #   (a) single atom moved > 2x skin.  Not 1x: at N=100k the
            #       thermal velocity tail reaches ~5 sigma (measured
            #       0.105 nm/16 fs max displacement in the equilibrated
            #       bench snapshot, grazing a 0.1 nm skin), so a 1x latch
            #       fires on healthy 300 K liquids.
            #   (b) the TWO largest displacements sum to > 3x skin — a
            #       missed pair is governed by the two-atom CLOSING
            #       distance, so two atoms each moving 1.5-2x skin toward
            #       each other are invisible to (a) alone.  3x, not 2x:
            #       the healthy top-two sum at N=1e5 is ~0.21 nm (order
            #       statistics put the second max within a few % of the
            #       max), which grazes a 2x-skin sum latch exactly the way
            #       the single-atom tail grazed 1x.
            # Residual blind spot (documented): two atoms closing by
            # (skin, 3x skin] combined can still miss pairs near the
            # cutoff edge, where erfc-screened coulomb + LJ tails are
            # negligible; real violence moves atoms many skins and trips
            # both latches.
            cur = state.positions
            if rs is not None:
                # ref_positions live in the STORED frame (p / s) for flat
                # NPT ensembles — compare in the same frame
                R = rs.shape[0]
                cur = (cur.reshape(R, -1, 3)
                       / rs[:, None, None].astype(cur.dtype)).reshape(-1, 3)
            d = cur - state.neighbors.ref_positions
            d2 = jnp.sum(d * d, axis=-1)
            top2, _ = jax.lax.top_k(d2, 2)
            exceeded = ((top2[0] > (2.0 * skin) * (2.0 * skin))
                        | (jnp.sqrt(top2[0]) + jnp.sqrt(top2[1])
                           > 3.0 * skin))
            nbl = nbl._replace(
                drift_exceeded=exceeded | state.neighbors.drift_exceeded)
        old_span = getattr(state.neighbors, "excl_span_exceeded", None)
        if (old_span is not None
                and getattr(nbl, "excl_span_exceeded", None) is not None):
            nbl = nbl._replace(
                excl_span_exceeded=nbl.excl_span_exceeded | old_span)
        return state._replace(neighbors=nbl)
    return rebuild


def _make_multi_step_fused(static: StaticSpec, step, inner_steps: int,
                           neighbor_fn, rebuild_interval: int, skin,
                           reduce_axis: str = None):
    """Fused-NH scan: [UCS + NH1 + core] once, then inner_steps-1 bodies of
    [NH2 of the previous step + NH1 of this one on a single KE measurement
    + one composed velocity scaling + core], then a final NH2.

    Mid-scan the carried state is 'pending': state.velocities hold the
    post-velocity-constraint velocities with the second NH half not yet
    applied.  The prologue/epilogue keep the host-visible states settled,
    so Context/ensemble/sharded semantics (KESum = the value cached at the
    last NH half-step, reference CudaDrudeTGNHKernels.cpp:654-661) are
    unchanged."""
    G = static.n_temp_groups

    def fused_body(spec, state):
        accum = state.eta.dtype
        vt = state.velocities.T

        # one KE measurement serves BOTH adjacent NH halves
        ke, com_vel_t, norm_vel_t = group_kinetic_energies_t(
            spec, static, vt, accum)
        if reduce_axis is not None:
            ke = jax.lax.psum(ke, reduce_axis)
        vs_a, eta, ed, edd, ke_a = propagate_nh_chain(
            spec, static, ke, state.eta, state.eta_dot, state.eta_dot_dot,
            spec.dt, return_final_ke=True)

        # CM motion removal between the halves: a uniform velocity shift
        # leaves internal/Drude baths untouched and lowers the COM bath's
        # 2KE by exactly M_tot |v_cm|^2 (Sum_res M_res v_com = M_tot v_cm)
        m01 = None
        E = static.ensemble_r
        if static.cm_freq > 0:
            m01 = (state.step % static.cm_freq == 0).astype(accum)
            if E > 1:
                # per-replica CM (replica-major): (3, E) momenta
                n0 = static.n_atoms // E
                mom = jnp.sum((spec.mass[None, :] * vt).astype(accum)
                              .reshape(3, E, n0), axis=2)
                total_mass = jnp.sum(spec.mass.reshape(E, n0),
                                     axis=1).astype(accum)
                v_cm = mom / total_mass[None, :]
                v_cm_s = vs_a[:, G][None, :] * v_cm
                ke_a = ke_a.at[:, G].add(
                    -m01 * total_mass * jnp.sum(v_cm_s * v_cm_s, axis=0))
            else:
                mom = jnp.sum((spec.mass[None, :] * vt).astype(accum),
                              axis=1)
                total_mass = jnp.sum(spec.mass).astype(accum)
                if reduce_axis is not None:
                    mom = jax.lax.psum(mom, reduce_axis)
                    total_mass = jax.lax.psum(total_mass, reduce_axis)
                v_cm = mom / total_mass                # of the unscaled vt
                v_cm_s = vs_a[G] * v_cm                # after the NH2 scale
                ke_a = ke_a.at[G].add(
                    -m01 * total_mass * jnp.sum(v_cm_s * v_cm_s))

        state = state._replace(eta=eta, eta_dot=ed, eta_dot_dot=edd)
        state = step.apply_barostat(spec, state)       # velocity-independent

        vs_b, eta, ed, edd = propagate_nh_chain(
            spec, static, ke_a, state.eta, state.eta_dot, state.eta_dot_dot,
            spec.dt)
        state = state._replace(eta=eta, eta_dot=ed, eta_dot_dot=edd,
                               ke_sum=0.5 * jnp.sum(ke_a, axis=-1),
                               group_ke=ke_a)

        # one composed scaling (bath scalings compose elementwise across
        # the COM/internal/pair-relative decomposition)
        new_vt = apply_vscale_t(spec, static, vt, com_vel_t, norm_vel_t,
                                vs_a * vs_b)
        if m01 is not None:
            if E > 1:
                n0 = static.n_atoms // E
                sub = ((m01 * vs_b[:, G] * vs_a[:, G])[None, :]
                       * v_cm).astype(new_vt.dtype)         # (3, E)
                shifted = (new_vt.reshape(3, E, n0)
                           - sub[:, :, None]).reshape(3, -1)
            else:
                sub = ((m01 * vs_b[G] * vs_a[G]) * v_cm).astype(new_vt.dtype)
                shifted = new_vt - sub[:, None]
            new_vt = jnp.where((spec.inv_mass > 0)[None, :], shifted,
                               new_vt)

        state, v = step.core(spec, state, new_vt)
        return state._replace(velocities=v)

    def prologue(spec, state):
        state = step.update_context_state(spec, state)
        state, vt = step.nh_half(spec, state, state.velocities.T)
        state, v = step.core(spec, state, vt)
        return state._replace(velocities=v)            # NH2 pending

    def epilogue(spec, state):
        state, vt = step.nh_half(spec, state, state.velocities.T)
        return state._replace(velocities=vt.T)

    def body_factory(spec):
        def body(s, _):
            return fused_body(spec, s), None
        return body

    if neighbor_fn is None:
        def multi(spec: SystemSpec, state: SimState) -> SimState:
            state = prologue(spec, state)
            state, _ = jax.lax.scan(body_factory(spec), state, None,
                                    length=inner_steps - 1)
            return epilogue(spec, state)
        return multi

    rebuild = _make_neighbor_rebuild(neighbor_fn, skin)
    # rebuild cadence by POSITION UPDATES: the prologue performs one, each
    # fused body one more — boundaries land exactly where the unfused
    # segmentation puts them
    first_f = min(rebuild_interval, inner_steps) - 1
    n_seg, tail = divmod(inner_steps - 1 - first_f, rebuild_interval)

    def multi(spec: SystemSpec, state: SimState) -> SimState:
        body = body_factory(spec)
        state = prologue(spec, state)
        if first_f:
            state, _ = jax.lax.scan(body, state, None, length=first_f)
        if n_seg:
            def seg(s, _):
                s = rebuild(s)
                s, _ = jax.lax.scan(body, s, None, length=rebuild_interval)
                return s, None
            state, _ = jax.lax.scan(seg, state, None, length=n_seg)
        if tail:
            state = rebuild(state)
            state, _ = jax.lax.scan(body, state, None, length=tail)
        return epilogue(spec, state)

    return multi
