"""Pallas sweep v2 (ops/pallas_sweep.py) vs the XLA sweep, interpret mode.

Force-only half-stencil kernel with bulk layer DMA and VMEM accumulators;
must match forces/cellpair._sweep_regular(with_energy=False) to f32
reduction-order noise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.forces import cellpair as cp
from openmm_drudenose_tpu.io import builders
from openmm_drudenose_tpu.ops import pallas_sweep as ps


@pytest.fixture(scope="module")
def water_ctx():
    system, positions = builders.build_water_box(1000)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx._ensure_neighbors()
    return ctx


def test_supports(water_ctx):
    import dataclasses

    cfg = water_ctx._cp_cfg
    # the small test box has a (y,z) plane below one 128-lane tile, which
    # Mosaic's dynamic-sublane loads reject — supports() must gate on it
    assert not ps.supports(cfg, jnp.float32)
    big = dataclasses.replace(cfg, grid=(15, 15, 15))
    assert ps.supports(big, jnp.float32)
    assert not ps.supports(big, jnp.float64)


def test_forces_match_xla_sweep(water_ctx):
    ctx = water_ctx
    st = ctx._state
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    cfg = ctx._cp_cfg
    box_diag = jnp.diagonal(st.box)
    _, f_ref = cp.pair_energy_forces(
        nb_params, st.positions, box_diag, st.neighbors, cfg,
        nb_fn.pair_eg, nb_fn.coulomb_scale, with_energy=False)
    f_pl = ps.pair_forces_pallas(
        nb_params, st.positions, box_diag, st.neighbors, cfg, "ewald",
        alpha=nb_fn.pme_setup.alpha, interpret=True)
    f_ref = np.asarray(f_ref)
    f_pl = np.asarray(f_pl)
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f_pl, f_ref, atol=2e-5 * scale)


@pytest.mark.slow
def test_forces_match_drifted(water_ctx):
    """Positions moved since the rebuild (box-frame/local-coordinate
    handling must stay consistent between the two sweeps)."""
    ctx = water_ctx
    st = ctx._state
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    cfg = ctx._cp_cfg
    rng = np.random.default_rng(3)
    pos = st.positions + jnp.asarray(
        rng.uniform(-0.04, 0.04, st.positions.shape), jnp.float32)
    box_diag = jnp.diagonal(st.box)
    _, f_ref = cp.pair_energy_forces(
        nb_params, pos, box_diag, st.neighbors, cfg,
        nb_fn.pair_eg, nb_fn.coulomb_scale, with_energy=False)
    f_pl = ps.pair_forces_pallas(
        nb_params, pos, box_diag, st.neighbors, cfg, "ewald",
        alpha=nb_fn.pme_setup.alpha, interpret=True)
    scale = float(jnp.max(jnp.abs(f_ref)))
    np.testing.assert_allclose(np.asarray(f_pl), np.asarray(f_ref),
                               atol=2e-5 * scale)


@pytest.fixture(scope="module")
def drifted_plain_pallas(water_ctx):
    """Drifted positions + the full-layer kernel's forces on them: the
    oracle for the chunked variant (same pair math incl. the A&S erfc,
    so the tolerance pins only the chunk layout/overlap-add machinery;
    an f64 run matches to 3e-16)."""
    ctx = water_ctx
    st = ctx._state
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    rng = np.random.default_rng(7)
    pos = st.positions + jnp.asarray(
        rng.uniform(-0.04, 0.04, st.positions.shape), jnp.float32)
    f_ref = ps.pair_forces_pallas(
        nb_params, pos, jnp.diagonal(st.box), st.neighbors, ctx._cp_cfg,
        "ewald", alpha=nb_fn.pme_setup.alpha, interpret=True)
    return pos, np.asarray(f_ref)


@pytest.mark.slow
@pytest.mark.parametrize("cy", [1, 0])
def test_chunked_forces_match_plain_pallas(water_ctx, drifted_plain_pallas,
                                           cy):
    """The y-chunked program grid (large-plane fallback) must reproduce
    the full-layer kernel: cy=1 exercises multi-chunk halo overlap-add
    (with wy=2 > cy, halos span two chunks) and the guard rows; cy=gy
    the single-chunk wrap case."""
    ctx = water_ctx
    st = ctx._state
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    pos, f_ref = drifted_plain_pallas
    cy = cy or ctx._cp_cfg.grid[1]          # 0 -> single full-gy chunk
    f_pl = ps.pair_forces_pallas_chunked(
        nb_params, pos, jnp.diagonal(st.box), st.neighbors, ctx._cp_cfg,
        "ewald", cy, alpha=nb_fn.pme_setup.alpha, interpret=True)
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(np.asarray(f_pl), f_ref, atol=5e-6 * scale)


def test_chunked_validates_cy(water_ctx):
    """User-facing nb_kwargs {"pallas_chunk": cy} overrides arrive
    unvalidated; a non-divisor cy would silently drop the trailing
    gy % cy cell rows — it must raise instead."""
    ctx = water_ctx
    st = ctx._state
    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    gy, gz = ctx._cp_cfg.grid[1], ctx._cp_cfg.grid[2]
    bad = next(c for c in range(2, gy) if gy % c)
    with pytest.raises(ValueError, match="must divide"):
        ps.pair_forces_pallas_chunked(
            nb_params, st.positions, jnp.diagonal(st.box), st.neighbors,
            ctx._cp_cfg, "ewald", bad, alpha=nb_fn.pme_setup.alpha,
            interpret=True)
    if gz < 128:  # compiled runs additionally need >= 128 pair-tile lanes
        with pytest.raises(ValueError, match="128"):
            ps.pair_forces_pallas_chunked(
                nb_params, st.positions, jnp.diagonal(st.box),
                st.neighbors, ctx._cp_cfg, "ewald", 1,
                alpha=nb_fn.pme_setup.alpha, interpret=False)


def test_choose_chunk(water_ctx):
    import dataclasses

    # a 1M-atom-class cube: the full-layer kernel's VMEM gate fails at
    # n_yz = 1024, the chunked chooser must find an exact-lane-fill cy
    ctx = water_ctx
    big = dataclasses.replace(ctx._cp_cfg, grid=(32, 32, 32))
    assert not ps.supports(big, jnp.float32)
    cyv = ps.choose_chunk(big, jnp.float32)
    assert cyv == 16            # 512 lanes, zero pad, VMEM-fitting
    assert ps.choose_chunk(big, jnp.float64) is None
    # where the full-layer kernel engages, the chooser defers to it
    mid = dataclasses.replace(ctx._cp_cfg, grid=(15, 15, 15))
    assert ps.supports(mid, jnp.float32)
    assert ps.choose_chunk(mid, jnp.float32) is None
    assert ps.choose_chunk(mid, jnp.float32, force=True) is not None


def test_triclinic_forces_match_xla_sweep():
    """Triclinic cells through the SAME kernel: geometry enters only via
    the cell-local field construction and the 6-scalar per-offset shift
    pack (o/g)@box (_centers_and_hvec) — interpret-mode parity vs the
    XLA triclinic sweep on a sheared box with exceptions (round 4)."""
    rng = np.random.default_rng(23)
    box2 = 2.0 * np.array([[2.0, 0.0, 0.0],
                           [0.7, 1.9, 0.0],
                           [-0.5, 0.6, 2.1]])
    n = 220
    system = dn.System()
    nb = dn.NonbondedForce()
    charges = rng.normal(0, 0.4, n)
    charges -= charges.mean()
    for i in range(n):
        system.addParticle(1.0)
        nb.addParticle(charges[i], 0.25, 0.4)
    for i in range(0, 30, 3):
        nb.addException(i, i + 1, 0.1 * charges[i] * charges[i + 1],
                        0.25, 0.1)
        nb.addException(i, i + 2, 0.0, 1.0, 0.0)
    nb.setNonbondedMethod(dn.NonbondedForce.PME)
    nb.setCutoffDistance(0.9)
    system.addForce(nb)
    system.setDefaultPeriodicBoxVectors(*box2)
    # jittered fractional lattice: physical separations (~0.5 nm), so the
    # f32 parity tolerance is meaningful (uniform-random placements give
    # overlapping pairs with 1e11-scale forces that drown the comparison)
    m = 7
    f = (np.stack(np.meshgrid(*[np.arange(m)] * 3, indexing="ij"),
                  axis=-1).reshape(-1, 3) + 0.5) / m
    pos = (f[:n] + rng.normal(0, 0.04, (n, 3))) @ box2
    for i in range(0, 30, 3):
        pos[i + 1] = pos[i] + np.array([0.12, 0.05, -0.04])
        pos[i + 2] = pos[i] + np.array([-0.06, 0.14, 0.08])

    fn_c, params_c = nb.compile(system, jnp.float32, strategy="cellpair")
    cfg = fn_c.cellpair_cfg
    assert cfg.triclinic and cfg.regular and cfg.half_stencil
    box_j = jnp.asarray(box2, jnp.float32)
    p0 = jnp.asarray(pos, jnp.float32)
    nbl = cp.build_cellsort(p0, box_j, cfg)
    assert not bool(nbl.overflow) and not bool(nbl.stencil_invalid)

    _, f_ref = cp.pair_energy_forces(
        params_c, p0, box_j, nbl, cfg, fn_c.pair_eg, fn_c.coulomb_scale,
        with_energy=False)
    f_pl = ps.pair_forces_pallas(
        params_c, p0, box_j, nbl, cfg, "ewald",
        alpha=fn_c.pme_setup.alpha, interpret=True)
    f_ref = np.asarray(f_ref)
    f_pl = np.asarray(f_pl)
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(f_pl, f_ref, atol=3e-5 * scale)

    # y-chunked variant on the same config
    cy = None
    gy = cfg.grid[1]
    offs = np.array(cfg.offsets)
    wy = int(np.max(np.abs(offs[:, 1])))
    for cand in range(gy, 0, -1):
        if gy % cand == 0 and cand >= max(wy, 1) \
                and cand + 2 * wy + 2 <= 2 * gy:
            cy = cand
            break
    f_ch = ps.pair_forces_pallas_chunked(
        params_c, p0, box_j, nbl, cfg, "ewald", cy,
        alpha=fn_c.pme_setup.alpha, interpret=True)
    np.testing.assert_allclose(np.asarray(f_ch), f_ref,
                               atol=3e-5 * scale)
