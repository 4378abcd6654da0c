"""Static pair-list energy terms with scatter-free analytic forces.

OpenMM exceptions and the Ewald/PME reciprocal-space exclusion corrections
are O(n_pairs) terms over index lists fixed at compile time.  Differentiating
the naive gather formulation produces a scatter-add transpose (slow on TPU);
here each term is a custom_vjp whose forward computes per-pair forces
analytically and accumulates them through a precomputed atom -> incident-pair
gather table, so the backward pass is just g * (-forces).

Replaces the in-sweep Ewald exclusion branch (forces/cellpair.make_pair_eg
excl_in_sweep) on the fast path: the correction runs over the ~n_exclusions
pairs instead of adding ~6 vector passes to every O(N * stencil * C^2) tile.

Reference force math: exceptions are plain Coulomb chargeProd/r + LJ
(OpenMM semantics the reference systems rely on); the exclusion correction
is -qq erf(ar)/r with the r -> 0 limit -qq 2a/sqrt(pi) (overlapping
shell/core at setup).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def build_incidence(n_atoms: int, i_idx, j_idx):
    """(N, K) int32 table of incident pair rows: row k for atom i_k, row
    P + k for atom j_k, padded with 2P (a zero row)."""
    i_idx = np.asarray(i_idx, np.int64)
    j_idx = np.asarray(j_idx, np.int64)
    P = len(i_idx)
    lists: list[list[int]] = [[] for _ in range(n_atoms)]
    for k in range(P):
        lists[i_idx[k]].append(k)
        lists[j_idx[k]].append(P + k)
    K = max((len(l) for l in lists), default=0)
    K = max(K, 1)
    table = np.full((n_atoms, K), 2 * P, np.int32)
    for a, l in enumerate(lists):
        table[a, :len(l)] = l
    return table


def make_pair_list_term(n_atoms: int, i_idx, j_idx, eg_fn,
                        periodic: bool = True):
    """energy(positions, box_diag) -> scalar with custom VJP returning the
    analytic forces.  eg_fn(r2_safe, r2_raw) -> (e, g = dE/dr^2) closes over
    the per-pair parameters; r2_safe is clamped away from 0."""
    i_np = np.asarray(i_idx, np.int32)
    j_np = np.asarray(j_idx, np.int32)
    inc = jnp.asarray(build_incidence(n_atoms, i_np, j_np))
    ii = jnp.asarray(i_np)
    jj = jnp.asarray(j_np)

    def e_and_f(positions, box_diag):
        # (3, .) layout throughout: pair and incidence gathers on 2D arrays
        # with atoms/pairs on the lane axis (a trailing size-3 axis on a
        # large gather costs ~42x in lane padding — CLAUDE.md perf rules)
        pos_t = positions.T                           # (3, N)
        delta = pos_t[:, ii] - pos_t[:, jj]           # (3, P)
        if periodic:
            from .boxutils import min_image_t
            delta = min_image_t(delta, box_diag)
        r2 = jnp.sum(delta * delta, axis=0)
        r2s = jnp.maximum(r2, 1e-10)
        e, g = eg_fn(r2s, r2)
        energy = jnp.sum(e)
        fpair = (-2.0 * g)[None, :] * delta           # force on i; -f on j
        flat = jnp.concatenate(
            [fpair, -fpair, jnp.zeros((3, 1), fpair.dtype)], axis=1)
        forces = jnp.sum(flat[:, inc], axis=2).T      # (3, N, K) -> (N, 3)
        return energy, forces

    @jax.custom_vjp
    def energy(positions, box_diag):
        return e_and_f(positions, box_diag)[0]

    def fwd(positions, box_diag):
        e, f = e_and_f(positions, box_diag)
        return e, (f, box_diag)

    def bwd(res, g):
        f, box_diag = res
        return (g * (-f), jnp.zeros_like(box_diag))

    energy.defvjp(fwd, bwd)
    return energy


def make_pair_list_energies_rep(R: int, i_idx, j_idx, eg_fn,
                                periodic: bool = True):
    """(positions, box_diag) -> (R,) PER-REPLICA pair-list energy sums for
    flattened replica ensembles (parallel/flatrep.py): the pair list must
    be replica-major with equal counts per replica (replicate_system
    appends each replica's pairs in order), so attribution is a pure
    reshape-sum.  Energy-only (no custom VJP) — used by the flat-NPT MC
    Metropolis delta, where intermolecular terms (NBFIX overrides,
    NBTHOLE) change under per-replica volume moves."""
    ii = jnp.asarray(np.asarray(i_idx, np.int32))
    jj = jnp.asarray(np.asarray(j_idx, np.int32))
    P = len(np.asarray(i_idx))
    if P % R:
        raise ValueError("pair list is not replica-uniform")

    def energies(positions, box_diag):
        pos_t = positions.T
        delta = pos_t[:, ii] - pos_t[:, jj]
        if periodic:
            from .boxutils import min_image_t
            delta = min_image_t(delta, box_diag)
        r2 = jnp.sum(delta * delta, axis=0)
        r2s = jnp.maximum(r2, 1e-10)
        e, _ = eg_fn(r2s, r2)
        return e.reshape(R, P // R).sum(axis=1)

    return energies


def uniform_pair_shifts(n_atoms: int, K: int, i_idx, j_idx):
    """Shift grouping for uniform molecule-major layouts: when every pair
    row is intra-block (i // K == j // K), rows with the same lane shift
    d = |j - i| can be hosted at their lower atom's lane and evaluated as
    ONE elementwise pass over (N,)-arrays (delta = x - roll(x, -d)) — no
    pair gathers, no incidence table.  Returns a list of
    (d, host_rows, row_ids) or None when the structure doesn't hold
    (cross-block rows, or two rows sharing a host lane)."""
    i_np = np.asarray(i_idx, np.int64)
    j_np = np.asarray(j_idx, np.int64)
    if n_atoms % K or len(i_np) == 0:
        return None
    if not np.array_equal(i_np // K, j_np // K):
        return None
    lo = np.minimum(i_np, j_np)
    hi = np.maximum(i_np, j_np)
    d_all = hi - lo
    groups = []
    for d in sorted(set(d_all.tolist())):
        rows = np.nonzero(d_all == d)[0]
        hosts = lo[rows]
        if len(np.unique(hosts)) != len(hosts):
            return None  # two rows of the same shift share a host lane
        groups.append((int(d), hosts, rows))
    return groups


def make_uniform_pair_term(n_atoms: int, K: int, i_idx, j_idx,
                           row_params: dict, eg_factory,
                           periodic: bool = True):
    """Lane-shift variant of make_pair_list_term for uniform layouts.

    row_params: dict of per-row (P,) numpy parameter arrays (values
    symmetric in i/j).  eg_factory(**lane_params) must build the same
    eg(r2s, r2) closure the gather path uses — the factories here are all
    elementwise, so handing them (N,)-shaped lane-hosted parameters (0/1
    defaults at non-host lanes) evaluates every shift group in one pass.
    Non-host lanes are masked out of both energy and force, so junk values
    there (including NaN from pathological r2) never propagate."""
    groups = uniform_pair_shifts(n_atoms, K, i_idx, j_idx)
    assert groups is not None
    param_defaults = {"sigma": 1.0, "sig": 1.0}
    terms = []
    for d, hosts, rows in groups:
        lane = {}
        for name, arr in row_params.items():
            full = np.full((n_atoms,),
                           param_defaults.get(name, 0.0), np.float64)
            full[hosts] = np.asarray(arr, np.float64)[rows]
            lane[name] = full
        mask = np.zeros((n_atoms,), bool)
        mask[hosts] = True
        terms.append((d, jnp.asarray(mask), eg_factory(**lane)))

    def e_and_f(positions, box_diag):
        pos_t = positions.T                           # (3, N)
        dtype = positions.dtype
        e_total = jnp.zeros((), dtype)
        f = jnp.zeros_like(pos_t)
        for d, mask, eg in terms:
            delta = pos_t - jnp.roll(pos_t, -d, axis=1)
            if periodic:
                from .boxutils import min_image_t
                delta = min_image_t(delta, box_diag)
            r2 = jnp.sum(delta * delta, axis=0)
            r2s = jnp.maximum(r2, 1e-10)
            e, g = eg(r2s, r2)
            e_total = e_total + jnp.sum(jnp.where(mask, e, 0.0))
            g2 = jnp.where(mask, -2.0 * g, 0.0)
            fpair = g2[None, :] * delta
            f = f + fpair - jnp.roll(fpair, d, axis=1)
        return e_total, f.T

    @jax.custom_vjp
    def energy(positions, box_diag):
        return e_and_f(positions, box_diag)[0]

    def fwd(positions, box_diag):
        e, f = e_and_f(positions, box_diag)
        return e, (f, box_diag)

    def bwd(res, g):
        f, box_diag = res
        return (g * (-f), jnp.zeros_like(box_diag))

    energy.defvjp(fwd, bwd)
    return energy


def exception_eg(qq, sigma, eps):
    """OpenMM exception pair: LJ + plain Coulomb (qq pre-scaled by
    ONE_4PI_EPS0)."""
    qq = jnp.asarray(qq)
    sigma = jnp.asarray(sigma)
    eps = jnp.asarray(eps)

    def eg(r2s, r2):
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        x6 = (sigma * sigma * inv_r2) ** 3
        e_lj = 4.0 * eps * x6 * (x6 - 1.0)
        g_lj = -4.0 * eps * (6.0 * x6 * x6 - 3.0 * x6) * inv_r2
        e_c = qq * inv_r
        g_c = -0.5 * qq * inv_r2 * inv_r
        return e_lj + e_c, g_lj + g_c

    return eg


def lj_override_eg(sig_new, eps_new, sig_old, eps_old, cutoff: float,
                   use_switch: bool = False, r_switch: float = 0.0):
    """NBFIX correction: LJ(new params) - LJ(combination-rule params),
    truncated and switched exactly like the main pair sum so the override
    replaces (not augments) the combined interaction inside the cutoff."""
    sig_new = jnp.asarray(sig_new)
    eps_new = jnp.asarray(eps_new)
    sig_old = jnp.asarray(sig_old)
    eps_old = jnp.asarray(eps_old)

    def lj(sig, eps, inv_r2):
        x6 = (sig * sig * inv_r2) ** 3
        e = 4.0 * eps * x6 * (x6 - 1.0)
        g = -4.0 * eps * (6.0 * x6 * x6 - 3.0 * x6) * inv_r2
        return e, g

    def eg(r2s, r2):
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        e_n, g_n = lj(sig_new, eps_new, inv_r2)
        e_o, g_o = lj(sig_old, eps_old, inv_r2)
        e, g = e_n - e_o, g_n - g_o
        if use_switch:
            r = r2s * inv_r
            t = jnp.clip((r - r_switch) / (cutoff - r_switch), 0.0, 1.0)
            s = 1.0 + t * t * t * (-10.0 + t * (15.0 - 6.0 * t))
            ds_dt = t * t * (-30.0 + t * (60.0 - 30.0 * t))
            ds_dr2 = ds_dt / (cutoff - r_switch) * 0.5 * inv_r
            g = g * s + e * ds_dr2
            e = e * s
        inside = r2 < cutoff * cutoff
        return jnp.where(inside, e, 0.0), jnp.where(inside, g, 0.0)

    return eg


def nbthole_eg(qq, scale):
    """NBTHOLE correction between non-bonded core-shell pairs (CHARMM
    semantics): the plain qq/r is already in the main sum, so only the
    screening deficit qq (S(u) - 1)/r = -qq (1 + u/2) e^{-u} / r is added;
    u = scale * r with scale = thole / (alpha1 alpha2)^(1/6)."""
    qq = jnp.asarray(qq)
    scale = jnp.asarray(scale)

    def eg(r2s, r2):
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        r = r2s * inv_r
        u = scale * r
        expu = jnp.exp(-u)
        e = -qq * (1.0 + 0.5 * u) * expu * inv_r
        # dE/dr = qq e^{-u} [ (1+u/2)(1/r^2) + (u/2)(1/r)... ]:
        # d/dr [-(1+u/2)e^{-u}/r] =
        #   e^{-u} [ (1+u/2)/r^2 - s/2 e^{0}... ] -> derive via product rule:
        #   f = (1+u/2) e^{-u} / r; df/dr = [s/2 e^{-u} - s(1+u/2)e^{-u}]/r
        #                                   - (1+u/2)e^{-u}/r^2
        dfdr = (expu * (0.5 * scale - scale * (1.0 + 0.5 * u)) * inv_r
                - (1.0 + 0.5 * u) * expu * inv_r2)
        dedr = -qq * dfdr
        g = 0.5 * dedr * inv_r
        return e, g

    return eg


def ewald_correction_eg(qq, alpha: float):
    """Reciprocal-space exclusion correction -qq erf(ar)/r (qq pre-scaled
    by ONE_4PI_EPS0); r -> 0 limit -qq 2a/sqrt(pi), zero force."""
    qq = jnp.asarray(qq)
    two_over_sqrt_pi = 2.0 / np.sqrt(np.pi)

    def eg(r2s, r2):
        near0 = r2 < 1e-10
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        r = r2s * inv_r
        ar = alpha * r
        erf_ar = jax.scipy.special.erf(ar)
        e = -qq * jnp.where(near0, two_over_sqrt_pi * alpha,
                            erf_ar * inv_r)
        # d/dr [-qq erf(ar)/r] = -qq (2a/sqrt(pi) e^{-a^2 r^2} - erf/r)/r
        dedr = -qq * (two_over_sqrt_pi * alpha * jnp.exp(-ar * ar)
                      - erf_ar * inv_r) * inv_r
        g = jnp.where(near0, 0.0, 0.5 * dedr * inv_r)
        return e, g

    return eg
