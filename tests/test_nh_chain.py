"""Golden tests of the NH chain propagation.

The vectorized all-baths-at-once device implementation
(integrators/tgnh.py:propagate_nh_chain) is checked against an independent
serial transcription of the reference algorithm
(CudaDrudeTGNHKernels.cpp:558-642): per-group loops, exp(-dtc/8) damping,
dtc/4 kicks, drude-group chain gating.  Exact (non-statistical) agreement is
required — the reference's tests are purely statistical, so these golden
tests add coverage it never had (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from openmm_drudenose_tpu.core.spec import StaticSpec, SystemSpec
from openmm_drudenose_tpu.integrators.tgnh import propagate_nh_chain


def serial_reference_nh(ke, eta, eta_dot, eta_dot_dot, eta_mass, nkbt,
                        real_kbt, drude_kbt, num_drude_steps, num_chains,
                        use_drude_chains, dt):
    """Direct serial transcription of the reference host loop."""
    G2 = len(ke)  # numTempGroups + 2
    M = num_chains
    dtc = dt / num_drude_steps
    dtc2, dtc4, dtc8 = dtc / 2, dtc / 4, dtc / 8
    ke = ke.copy()
    eta = eta.copy()
    eta_dot = eta_dot.copy()
    eta_dot_dot = eta_dot_dot.copy()
    vscale = np.ones(G2)

    # real groups + COM group
    for itg in range(G2 - 1):
        if eta_mass[itg][0] > 0:
            eta_dot_dot[itg][0] = (ke[itg] - nkbt[itg]) / eta_mass[itg][0]
        for _ in range(num_drude_steps):
            for i in range(M - 1, -1, -1):
                expfac = np.exp(-dtc8 * eta_dot[itg][i + 1])
                eta_dot[itg][i] *= expfac
                eta_dot[itg][i] += eta_dot_dot[itg][i] * dtc4
                eta_dot[itg][i] *= expfac
            vscale[itg] *= np.exp(-dtc2 * eta_dot[itg][0])
            ke[itg] *= np.exp(-dtc * eta_dot[itg][0])
            for i in range(M):
                eta[itg][i] += dtc2 * eta_dot[itg][i]
            if eta_mass[itg][0] > 0:
                eta_dot_dot[itg][0] = (ke[itg] - nkbt[itg]) / eta_mass[itg][0]
            eta_dot[itg][0] *= expfac
            eta_dot[itg][0] += eta_dot_dot[itg][0] * dtc4
            eta_dot[itg][0] *= expfac
            for i in range(1, M):
                expfac = np.exp(-dtc8 * eta_dot[itg][i + 1])
                eta_dot[itg][i] *= expfac
                eta_dot_dot[itg][i] = (eta_mass[itg][i - 1]
                                       * eta_dot[itg][i - 1] ** 2
                                       - real_kbt) / eta_mass[itg][i]
                eta_dot[itg][i] += eta_dot_dot[itg][i] * dtc4
                eta_dot[itg][i] *= expfac

    # drude group
    itg = G2 - 1
    eta_dot_dot[itg][0] = (ke[itg] - nkbt[itg]) / eta_mass[itg][0]
    for _ in range(num_drude_steps):
        if use_drude_chains:
            for i in range(M - 1, 0, -1):
                expfac = np.exp(-dtc8 * eta_dot[itg][i + 1])
                eta_dot[itg][i] *= expfac
                eta_dot[itg][i] += eta_dot_dot[itg][i] * dtc4
                eta_dot[itg][i] *= expfac
        expfac = np.exp(-dtc8 * eta_dot[itg][1])
        eta_dot[itg][0] *= expfac
        eta_dot[itg][0] += eta_dot_dot[itg][0] * dtc4
        eta_dot[itg][0] *= expfac
        vscale[itg] *= np.exp(-dtc2 * eta_dot[itg][0])
        ke[itg] *= np.exp(-dtc * eta_dot[itg][0])
        eta[itg][0] += dtc2 * eta_dot[itg][0]
        if use_drude_chains:
            for i in range(1, M):
                eta[itg][i] += dtc2 * eta_dot[itg][i]
        eta_dot_dot[itg][0] = (ke[itg] - nkbt[itg]) / eta_mass[itg][0]
        eta_dot[itg][0] *= expfac
        eta_dot[itg][0] += eta_dot_dot[itg][0] * dtc4
        eta_dot[itg][0] *= expfac
        if use_drude_chains:
            for i in range(1, M):
                expfac = np.exp(-dtc8 * eta_dot[itg][i + 1])
                eta_dot[itg][i] *= expfac
                eta_dot_dot[itg][i] = (eta_mass[itg][i - 1]
                                       * eta_dot[itg][i - 1] ** 2
                                       - drude_kbt) / eta_mass[itg][i]
                eta_dot[itg][i] += eta_dot_dot[itg][i] * dtc4
                eta_dot[itg][i] *= expfac
    return vscale, eta, eta_dot, eta_dot_dot


def _mini_spec(G, M, eta_mass, nkbt, real_kbt, drude_kbt, use_drude_chains):
    """Build just the fields propagate_nh_chain touches."""
    nb = G + 2
    link = np.ones((nb, M), bool)
    if not use_drude_chains:
        link[nb - 1, 1:] = False
    kbt_chain = np.full(nb, real_kbt)
    kbt_chain[nb - 1] = drude_kbt
    dummy = jnp.zeros(())
    return SystemSpec(
        mass=dummy, inv_mass=dummy, tg=dummy, resid=dummy, res_mass=dummy,
        res_inv_mass=dummy, res_members=dummy, is_pair=dummy,
        is_parent=dummy, partner=dummy,
        nh_nkbt=jnp.asarray(nkbt), nh_eta_mass=jnp.asarray(eta_mass),
        nh_kbt_chain=jnp.asarray(kbt_chain),
        nh_link_active=jnp.asarray(link), dt=dummy,
        max_drude_distance=dummy, hardwall_scale=dummy, settle_idx=dummy,
        settle_dist=dummy, settle_gather=dummy, shake_idx=dummy, shake_dist=dummy,
        vs_avg_idx=dummy, vs_avg_p=dummy, vs_avg_w=dummy, vs_oop_idx=dummy,
        vs_oop_p=dummy, vs_oop_w=dummy, vs_lc_idx=dummy, vs_lc_p=dummy,
        vs_lc_ow=dummy, vs_lc_xw=dummy, vs_lc_yw=dummy, vs_lc_local=dummy,
        baro_pressure=dummy, baro_kt=dummy)


@pytest.mark.parametrize("use_drude_chains", [False, True])
@pytest.mark.parametrize("G,M,steps", [(1, 1, 20), (1, 2, 20), (3, 4, 7)])
def test_matches_serial_reference(G, M, steps, use_drude_chains):
    rng = np.random.default_rng(42 + G * 10 + M)
    nb = G + 2
    real_kbt = 8.314e-3 * 300.0
    drude_kbt = 8.314e-3 * 1.0
    eta_mass = np.abs(rng.normal(5.0, 1.0, (nb, M)))
    nkbt = np.abs(rng.normal(100 * real_kbt, real_kbt, nb))
    ke = np.abs(rng.normal(100 * real_kbt, 10 * real_kbt, nb))
    eta = rng.normal(0, 0.1, (nb, M))
    eta_dot = rng.normal(0, 0.5, (nb, M + 1))
    eta_dot[:, M] = 0.0  # dummy terminal element (etaDot always 0)
    if not use_drude_chains:
        eta_dot[nb - 1, 1:] = 0.0
    eta_dot_dot = rng.normal(0, 0.5, (nb, M))
    if not use_drude_chains:
        eta_dot_dot[nb - 1, 1:] = 0.0
    dt = 0.001

    exp_vscale, exp_eta, exp_eta_dot, exp_edd = serial_reference_nh(
        ke, eta, eta_dot, eta_dot_dot, eta_mass, nkbt, real_kbt, drude_kbt,
        steps, M, use_drude_chains, dt)

    static = StaticSpec(
        n_atoms=1, n_residues=1, n_temp_groups=G, n_chains=M,
        drude_steps=steps, use_drude_nh_chains=use_drude_chains,
        use_com_temp_group=True, has_pairs=True, has_hardwall=False,
        n_settle=0, n_shake=0, n_vsites_avg=0, n_vsites_oop=0, n_vsites_lc=0, cm_freq=0,
        baro_freq=0, constraint_tol=1e-5)
    spec = _mini_spec(G, M, eta_mass, nkbt, real_kbt, drude_kbt,
                      use_drude_chains)
    vscale, eta_n, eta_dot_n, edd_n = propagate_nh_chain(
        spec, static, jnp.asarray(ke), jnp.asarray(eta),
        jnp.asarray(eta_dot), jnp.asarray(eta_dot_dot), jnp.asarray(dt))

    np.testing.assert_allclose(np.asarray(vscale), exp_vscale, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(eta_n), exp_eta, rtol=1e-12,
                               atol=1e-14)
    np.testing.assert_allclose(np.asarray(eta_dot_n)[:, :M],
                               exp_eta_dot[:, :M], rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(edd_n), exp_edd, rtol=1e-12,
                               atol=1e-14)


def test_equilibrium_is_fixed_point():
    """At KE exactly NkbT with zero chain state, accelerations vanish and
    velocities are not scaled."""
    G, M = 2, 3
    nb = G + 2
    real_kbt = 8.314e-3 * 300.0
    drude_kbt = 8.314e-3 * 1.0
    eta_mass = np.ones((nb, M))
    nkbt = np.full(nb, 2.0)
    ke = nkbt.copy()
    static = StaticSpec(
        n_atoms=1, n_residues=1, n_temp_groups=G, n_chains=M, drude_steps=20,
        use_drude_nh_chains=True, use_com_temp_group=True, has_pairs=True,
        has_hardwall=False, n_settle=0, n_shake=0, n_vsites_avg=0,
        n_vsites_oop=0, n_vsites_lc=0, cm_freq=0, baro_freq=0,
        constraint_tol=1e-5)
    spec = _mini_spec(G, M, eta_mass, nkbt, real_kbt, drude_kbt, True)
    vscale, eta, eta_dot, edd = propagate_nh_chain(
        spec, static, jnp.asarray(ke), jnp.zeros((nb, M)),
        jnp.zeros((nb, M + 1)), jnp.zeros((nb, M)), jnp.asarray(0.001))
    np.testing.assert_allclose(np.asarray(vscale), 1.0, atol=1e-13)
    # link 0 must stay at rest (links >= 1 relax toward their own targets)
    np.testing.assert_allclose(np.asarray(eta_dot)[:, 0], 0.0, atol=1e-13)
