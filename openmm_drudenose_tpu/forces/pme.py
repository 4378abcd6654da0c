"""Smooth Particle-Mesh Ewald reciprocal space, TPU-native.

Essmann et al. (1995) smooth PME with cardinal B-splines of order 5 (OpenMM's
order).  The reciprocal sum is a 3D FFT (jnp.fft.fftn) over a charge grid
built by scatter-add of separable B-spline weights; forces come from autodiff
of the energy through the spreading and the FFT, so there is no hand-written
interpolation-force kernel.

Parameter selection follows OpenMM's NonbondedForceImpl:
  alpha  = sqrt(-log(2 tol)) / cutoff
  grid_i = ceil(2 alpha L_i / (3 tol^(1/5))), rounded up to a 2,3,5-smooth size

Used by forces/nonbonded.py when the method is Ewald or PME (the reference's
example systems use PME: /root/reference/example/nacl_tg.py:42).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..units import ONE_4PI_EPS0

PME_ORDER = 5

# MXU precision of the spread/interpolation contractions.  HIGHEST because
# TPU f32 dot_general defaults to BFLOAT16 inputs, which would round the
# B-spline weights to ~0.4% — far above f32 (see CLAUDE.md / the round-2
# bf16 matmul-precision bug).  Module-level so perf probes can A/B it
# (scripts/probe_mm_precision.py); production paths must keep HIGHEST
# unless an on-chip accuracy study says otherwise.
MM_PRECISION = jax.lax.Precision.HIGHEST


def find_fft_dimension(minimum: int) -> int:
    """Smallest 2,3,5-smooth integer >= minimum (good jnp.fft sizes)."""
    n = max(int(minimum), 5)
    while True:
        m = n
        for f in (2, 3, 5):
            while m % f == 0:
                m //= f
        if m == 1:
            return n
        n += 1


def choose_alpha(cutoff: float, tol: float) -> float:
    return math.sqrt(-math.log(2.0 * tol)) / cutoff


def choose_grid(alpha: float, box_diag, tol: float):
    return tuple(find_fft_dimension(int(math.ceil(2.0 * alpha * L / (3.0 * tol ** 0.2))))
                 for L in box_diag)


def _Mn_np(n: int, x: np.ndarray) -> np.ndarray:
    """Cardinal B-spline M_n(x) (numpy, for host-side moduli)."""
    if n == 2:
        return np.clip(1.0 - np.abs(x - 1.0), 0.0, None)
    return (x * _Mn_np(n - 1, x) + (n - x) * _Mn_np(n - 1, x - 1.0)) / (n - 1)


def _bspline_moduli(order: int, K: int) -> np.ndarray:
    """|b(m)|^2, b(m) = exp(2 pi i (n-1) m / K) / sum_k M_n(k+1) e^{2 pi i m k / K}."""
    knots = _Mn_np(order, np.arange(1, order, dtype=np.float64))  # M_n(1..n-1)
    m = np.arange(K)
    k = np.arange(order - 1)
    denom = np.sum(knots[None, :] * np.exp(2j * np.pi * m[:, None] * k[None, :] / K),
                   axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        bm2 = 1.0 / np.abs(denom) ** 2
    # zeros of the denominator (odd order at K/2): interpolate like OpenMM
    bad = ~np.isfinite(bm2) | (np.abs(denom) < 1e-7)
    if bad.any():
        for i in np.nonzero(bad)[0]:
            bm2[i] = 0.5 * (bm2[(i - 1) % K] + bm2[(i + 1) % K])
    return bm2


import functools


@functools.partial(jax.custom_jvp, nondiff_argnums=(1,))
def _bspline_weights(w, order: int):
    """M_order(w + j) for j = 0..order-1, vectorized over w in [0,1).

    Cox-de Boor: M_2(x) = 1 - |x - 1| on [0,2);
    M_n(x) = [x M_{n-1}(x) + (n - x) M_{n-1}(x-1)] / (n-1).
    Returns array shaped w.shape + (order,).

    CUSTOM JVP, not autodiff through the recursion: at w = 0 EXACTLY the
    recursion's inner arguments land on the M_2 triangle peaks, where
    jnp.abs' gives sign(0) = 0 instead of the one-sided +-1 — the raw
    autodiff derivative is then wrong by O(1) while the VALUE is exact.
    f64 positions never land exactly on a grid knot, but f32 rounding of
    lattice starts does (measured on chip: +88 vs the true -18 kJ/mol/nm
    reciprocal z-force on knot-aligned atoms, identical on CPU f32 — a
    pure autodiff-at-the-kink artifact).  The derivative identity
    dM_n(x) = M_{n-1}(x) - M_{n-1}(x-1) only EVALUATES splines (values
    are continuous and exact at knots), so it is kink-free."""
    j = jnp.arange(order, dtype=w.dtype)
    x = w[..., None] + j  # M_n support is [0, n]; these are the nonzero knots

    def M(n, x):
        if n == 2:
            return jnp.clip(1.0 - jnp.abs(x - 1.0), 0.0, None)
        return (x * M(n - 1, x) + (n - x) * M(n - 1, x - 1.0)) / (n - 1)

    return M(order, x)


@_bspline_weights.defjvp
def _bspline_weights_jvp(order, primals, tangents):
    (w,) = primals
    (dw,) = tangents
    return (_bspline_weights(w, order),
            _bspline_weights_d(w, order) * dw[..., None])


@dataclasses.dataclass(frozen=True)
class PmeSetup:
    alpha: float
    grid: tuple  # (K1, K2, K3)
    bm2x: np.ndarray
    bm2y: np.ndarray
    bm2z: np.ndarray
    cell_grid: tuple = None  # cellsort grid the K's are multiples of

    def reciprocal_energy(self, charges, positions, box_diag):
        return _reciprocal_energy(self.grid, self.alpha,
                                  jnp.asarray(self.bm2x), jnp.asarray(self.bm2y),
                                  jnp.asarray(self.bm2z),
                                  charges, positions, box_diag)

    def reciprocal_energy_sorted(self, charges, positions, box_diag,
                                 cellsort, capacity: int):
        """Pencil-spread variant: uses the cell-sorted slot structure (the
        sweep's CellSort) so spreading is per-(x,y)-cell-column local-window
        matmuls instead of full-grid one-hots — ~10x less HBM traffic.
        When the cellsort carries the compact per-pencil atom packing
        (CellSort.pen_atom), the contraction runs over ~5x fewer rows than
        the gz*C slot form.  Requires setup_pme(..., cell_grid=...)."""
        if getattr(cellsort, "pen_atom", None) is not None:
            Q = spread_pencils_packed(self.grid, self.cell_grid,
                                      charges, positions, box_diag,
                                      cellsort)
        else:
            Q = spread_pencils(self.grid, self.cell_grid, capacity,
                               charges, positions, box_diag, cellsort)
        return grid_energy(self.grid, self.alpha,
                           jnp.asarray(self.bm2x), jnp.asarray(self.bm2y),
                           jnp.asarray(self.bm2z), Q, box_diag)

    def recip_forces(self, charges, positions, box_diag, cellsort):
        """Hand-written reciprocal-space forces (and the energy, free):
        spread -> grid energy+adjoint (one rfftn/irfftn pair) -> analytic
        B-spline derivative interpolation.  Replaces reverse-mode autodiff
        through the spread's one-hot construction (the force-only step's
        dominant non-sweep cost).  Requires the packed pencil structure
        (cellsort.pen_atom/pen_inv + cell_grid)."""
        return recip_energy_forces_packed(
            self.grid, self.alpha, jnp.asarray(self.bm2x),
            jnp.asarray(self.bm2y), jnp.asarray(self.bm2z), self.cell_grid,
            charges, positions, box_diag, cellsort)

    def recip_ens(self, R, charges, positions, box_diag, cellsort,
                  rep_scale=None, with_forces=False):
        """Replica-batched pencil reciprocal sum for flattened ensembles
        (recip_ens_packed): (energies (R,), forces or None).  `positions`
        in the STORED frame, `box_diag` the per-replica template box."""
        return recip_ens_packed(
            self.grid, self.alpha, jnp.asarray(self.bm2x),
            jnp.asarray(self.bm2y), jnp.asarray(self.bm2z), self.cell_grid,
            R, charges, positions, box_diag, cellsort,
            rep_scale=rep_scale, with_forces=with_forces)

    def spread(self, charges, positions, box_diag):
        return spread_charge_grid(self.grid, charges, positions, box_diag)

    def energy_of_grid(self, Q, box_diag):
        return grid_energy(self.grid, self.alpha,
                           jnp.asarray(self.bm2x), jnp.asarray(self.bm2y),
                           jnp.asarray(self.bm2z), Q, box_diag)


def setup_pme(cutoff: float, tol: float, box_diag, alpha=None, grid=None,
              cell_grid=None) -> PmeSetup:
    a = alpha if alpha else choose_alpha(cutoff, tol)
    g = grid if grid else choose_grid(a, box_diag, tol)
    g = tuple(int(k) for k in g)
    if cell_grid is not None:
        # round each K up to a multiple of the cell grid so the pencil
        # spread's local windows are cell-aligned (denser grid = only more
        # accurate); keep pencils viable (window < K) or drop the hint
        g = tuple(-(-k // c) * c for k, c in zip(g, cell_grid))
        plan = _pencil_plan(g, cell_grid)
        if plan is None:
            cell_grid = None
    return PmeSetup(alpha=a, grid=g,
                    bm2x=_bspline_moduli(PME_ORDER, g[0]),
                    bm2y=_bspline_moduli(PME_ORDER, g[1]),
                    bm2z=_bspline_moduli(PME_ORDER, g[2]),
                    cell_grid=tuple(cell_grid) if cell_grid else None)


def _reciprocal_energy(grid, alpha, bm2x, bm2y, bm2z, charges, positions, box_diag):
    Q = spread_charge_grid(grid, charges, positions, box_diag)
    return grid_energy(grid, alpha, bm2x, bm2y, bm2z, Q, box_diag)


def spread_charge_grid(grid, charges, positions, box_diag):
    """B-spline charge spreading -> (K1, K2, K3) grid, as MXU matmuls.

    Separable from the reciprocal sum so the sharded engine
    (parallel/sharded.py) can spread disjoint atom chunks per device and
    psum the grids."""
    K1, K2, K3 = grid
    n = positions.shape[0]
    dtype = positions.dtype

    # fractional coordinates scaled to the grid (wrapped into the box);
    # box_diag may be a (3,) diagonal or a (3, 3) reduced triclinic matrix
    from .boxutils import frac_coords
    u = frac_coords(positions, box_diag)  # (N, 3)
    u = (u - jnp.floor(u)) * jnp.asarray([K1, K2, K3], dtype)
    ti = jnp.floor(u)
    w = u - ti  # in [0, 1)
    ti = ti.astype(jnp.int32)

    # separable B-spline weights, (N, order) per dimension
    wx = _bspline_weights(w[:, 0], PME_ORDER)
    wy = _bspline_weights(w[:, 1], PME_ORDER)
    wz = _bspline_weights(w[:, 2], PME_ORDER)

    # grid indices for offset j: (floor(u) - j) mod K
    j = jnp.arange(PME_ORDER, dtype=jnp.int32)
    ix = jnp.mod(ti[:, 0:1] - j, K1)  # (N, order)
    iy = jnp.mod(ti[:, 1:2] - j, K2)
    iz = jnp.mod(ti[:, 2:3] - j, K3)

    # Spread as matmuls (MXU-native, no scatter): per-dimension dense
    # one-hot weight matrices W[i, k] = sum_j w_ij [k == idx_ij], then
    #   Q[a, bc] = (q Wx)^T @ (Wy (x) Wz)
    # chunked over atoms to bound the (chunk, K2*K3) intermediate.
    chunk = min(4096, n)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def padded(x, fill=0):
        if pad == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)

    qWx_all = padded(charges[:, None] * wx)      # (Np, o)
    wy_all = padded(wy)
    wz_all = padded(wz)
    ix_all = padded(ix)
    iy_all = padded(iy)
    iz_all = padded(iz)

    kx = jnp.arange(K1, dtype=jnp.int32)
    ky = jnp.arange(K2, dtype=jnp.int32)
    kz = jnp.arange(K3, dtype=jnp.int32)

    def one_hot_weights(idx_c, w_c, k):
        # (chunk, K): sum over the `order` taps of w * [k == idx]
        acc = jnp.zeros((idx_c.shape[0], k.shape[0]), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_c[:, t:t + 1] * (idx_c[:, t:t + 1] == k[None, :])
        return acc

    def body(Q, c):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk)
        Wx = one_hot_weights(sl(ix_all), sl(qWx_all), kx)   # (chunk, K1)
        Wy = one_hot_weights(sl(iy_all), sl(wy_all), ky)    # (chunk, K2)
        Wz = one_hot_weights(sl(iz_all), sl(wz_all), kz)    # (chunk, K3)
        Wyz = (Wy[:, :, None] * Wz[:, None, :]).reshape(chunk, K2 * K3)
        # precision=HIGHEST: TPU f32 matmuls default to bfloat16 inputs,
        # which would round the B-spline weights to ~0.4% (grid charge and
        # interpolation-force error far above f32)
        return Q + jnp.dot(Wx.T, Wyz, preferred_element_type=dtype,
                           precision=MM_PRECISION), None

    # scan (not fori_loop) so reverse-mode autodiff works through the
    # chunks; jax.checkpoint(body) so the backward RECOMPUTES each
    # chunk's one-hot products instead of storing them — without it the
    # scan saves a (chunk, K2*K3) residual PER CHUNK, which at 1M atoms
    # is ~0.5 GB x 34 chunks = the ~17 GB/device XLA temp arena that
    # OOM-killed the 8-slab resident artifact on the 125 GB emulation
    # host (scripts/mem_1m.py measured it; the backward is two extra
    # matmul passes, trivially cheaper than the memory)
    Q, _ = jax.lax.scan(jax.checkpoint(body),
                        jnp.zeros((K1, K2 * K3), dtype),
                        jnp.arange(n_chunks))
    return Q.reshape(K1, K2, K3)


def _pencil_plan(grid, cell_grid, order: int = PME_ORDER):
    """Static plan for the pencil spread: per-dim points-per-cell, local
    window width (a multiple of ppc so same-color tiles tile contiguously),
    and color count for x/y.  Returns None when the box is too small for
    local windows (fall back to the generic spread)."""
    K1, K2, K3 = grid
    gx, gy = cell_grid[0], cell_grid[1]
    if K1 % gx or K2 % gy:
        return None
    plan = []
    for K, g in ((K1, gx), (K2, gy)):
        ppc = K // g
        # the symmetric window offset (lw - ppc) // 2 must cover the
        # order-1 left tap spill plus >= 1 point of inter-rebuild drift
        # margin on each side: lw >= ppc + 2 * order
        need = ppc + 2 * order
        ncolor = -(-need // ppc)
        lw = ncolor * ppc
        if lw >= K:
            return None
        plan.append((ppc, lw, ncolor))
    return tuple(plan)


def spread_pencils(grid, cell_grid, capacity, charges, positions, box_diag,
                   cellsort):
    """Charge spreading using the sweep's cell-sorted slot structure.

    Atoms are gathered into (x,y)-pencil-major slot order (exactly the
    CellSort layout: cells are (cx, cy, cz)-major, so a pencil's gz*C slots
    are contiguous).  Each pencil spreads onto a local (LWx, LWy, K3)
    window via one batched MXU matmul; windows are assembled into the full
    grid by an (ncolor_x * ncolor_y)-pass reshape + roll (same-color tiles
    are disjoint and contiguous by construction).  Against the generic
    spread_charge_grid this avoids the (N, K2*K3) one-hot materialization:
    traffic drops from O(N*K2*K3) to O(S*LWx*LWy).

    Fully differentiable: interpolation forces arrive by autodiff through
    the weight polynomials and matmuls."""
    K1, K2, K3 = grid
    gx, gy, gz = cell_grid
    (ppcx, lwx, ncx), (ppcy, lwy, ncy) = _pencil_plan(grid, cell_grid)
    n = positions.shape[0]
    dtype = positions.dtype
    C = capacity
    n_pencils = gx * gy
    sp = gz * C  # slots per pencil

    # slot-ordered charge and box-frame coordinates (pads: q = 0)
    sa = cellsort.slot_atom
    pad = sa >= n
    safe = jnp.where(pad, 0, sa)
    qs = jnp.where(pad, 0.0, charges[safe])
    pos_bf = positions - cellsort.image.astype(dtype) * box_diag

    # per-dim scaled coordinates, integer parts, B-spline weights
    Ks = jnp.asarray([K1, K2, K3], dtype)
    u = (pos_bf / box_diag * Ks)[safe]               # (S, 3)
    u = jnp.where(pad[:, None], -1e6, u)             # pads: outside windows
    ti = jnp.floor(u)
    w = u - ti
    ti = ti.astype(jnp.int32)

    wx = _bspline_weights(w[:, 0], PME_ORDER)        # (S, order)
    wy = _bspline_weights(w[:, 1], PME_ORDER)
    wz = _bspline_weights(w[:, 2], PME_ORDER)

    # local window bases per slot (static per pencil)
    S = sa.shape[0]
    slot = np.arange(S)
    cx = (slot // (gy * sp)).astype(np.int32)
    cy = ((slot // sp) % gy).astype(np.int32)
    offx = (lwx - ppcx) // 2
    offy = (lwy - ppcy) // 2
    base_x = jnp.asarray(cx * ppcx - offx)
    base_y = jnp.asarray(cy * ppcy - offy)

    j = jnp.arange(PME_ORDER, dtype=jnp.int32)

    def one_hot_local_t(ti_d, w_d, base, lw):
        # transposed (lw, S) layout: slots on the lane axis, so the batched
        # contraction below needs no relayout of the big operand
        col = ti_d[None, :] - base[None, :]                # (1, S)
        k = jnp.arange(lw, dtype=jnp.int32)[:, None]       # (lw, 1)
        acc = jnp.zeros((lw, S), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[None, :, t] * (col - t == k)
        return acc

    def one_hot_wrap(ti_d, w_d, K):
        col = jnp.mod(ti_d[:, None] - j[None, :], K)
        k = jnp.arange(K, dtype=jnp.int32)
        acc = jnp.zeros((S, K), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[:, t:t + 1] * (col[:, t:t + 1] == k[None, :])
        return acc

    WxT = one_hot_local_t(ti[:, 0], wx, base_x, lwx)   # (lwx, S)
    WyT = one_hot_local_t(ti[:, 1], wy, base_y, lwy)   # (lwy, S)
    Wz = one_hot_wrap(ti[:, 2], qs[:, None] * wz, K3)  # (S, K3), q-weighted

    WxT = jnp.moveaxis(WxT.reshape(lwx, n_pencils, sp), 1, 0)
    WyT = jnp.moveaxis(WyT.reshape(lwy, n_pencils, sp), 1, 0)
    Wz = Wz.reshape(n_pencils, sp, K3)
    # (P, lwx*lwy, S): outer product built directly in contraction layout
    WxyT = (WxT[:, :, None, :] * WyT[:, None, :, :]).reshape(
        n_pencils, lwx * lwy, sp)
    # batched MXU contraction over slots: (P, lwx*lwy, K3)
    T = jax.lax.dot_general(
        WxyT, Wz, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=MM_PRECISION,
        preferred_element_type=dtype)
    T = T.reshape(gx, gy, lwx, lwy, K3)
    return _assemble_colors(T, grid, (ppcx, lwx, ncx), (ppcy, lwy, ncy))


def spread_pencils_packed(grid, cell_grid, charges, positions, box_diag,
                          cellsort):
    """Pencil spread over the COMPACT per-pencil atom packing
    (CellSort.pen_atom) instead of the gz*C cell-slot structure.

    The slot form's contraction axis carries the cell capacity's
    (C/avg)-fold slack times gz; the packed form is one fixed-capacity
    list per (x, y) pencil (Cp ~ 1.35x the mean pencil population, rounded
    to a 128-lane multiple), so the (P, lwx*lwy, axis) one-hot outer
    product — the spread's dominant HBM object — shrinks ~5x at the
    benchmark density.  Math, windows and color assembly are identical to
    spread_pencils."""
    K1, K2, K3 = grid
    gx, gy, gz = cell_grid
    (ppcx, lwx, ncx), (ppcy, lwy, ncy) = _pencil_plan(grid, cell_grid)
    n = positions.shape[0]
    dtype = positions.dtype
    n_pencils = gx * gy
    pa = cellsort.pen_atom
    Cp = pa.shape[0] // n_pencils

    pad = pa >= n
    safe = jnp.where(pad, 0, pa)
    qs = jnp.where(pad, 0.0, charges[safe])
    pos_bf = positions - cellsort.image.astype(dtype) * box_diag

    Ks = jnp.asarray([K1, K2, K3], dtype)
    u = (pos_bf / box_diag * Ks)[safe]               # (S, 3)
    u = jnp.where(pad[:, None], -1e6, u)             # pads: weights -> 0
    ti = jnp.floor(u)
    w = u - ti
    ti = ti.astype(jnp.int32)

    wx = _bspline_weights(w[:, 0], PME_ORDER)        # (S, order)
    wy = _bspline_weights(w[:, 1], PME_ORDER)
    wz = _bspline_weights(w[:, 2], PME_ORDER)

    S = pa.shape[0]
    slot = np.arange(S)
    cx = (slot // (gy * Cp)).astype(np.int32)
    cy = ((slot // Cp) % gy).astype(np.int32)
    offx = (lwx - ppcx) // 2
    offy = (lwy - ppcy) // 2
    base_x = jnp.asarray(cx * ppcx - offx)
    base_y = jnp.asarray(cy * ppcy - offy)

    j = jnp.arange(PME_ORDER, dtype=jnp.int32)

    def one_hot_local_t(ti_d, w_d, base, lw):
        col = ti_d[None, :] - base[None, :]                # (1, S)
        k = jnp.arange(lw, dtype=jnp.int32)[:, None]       # (lw, 1)
        acc = jnp.zeros((lw, S), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[None, :, t] * (col - t == k)
        return acc

    def one_hot_wrap(ti_d, w_d, K):
        col = jnp.mod(ti_d[:, None] - j[None, :], K)
        k = jnp.arange(K, dtype=jnp.int32)
        acc = jnp.zeros((S, K), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[:, t:t + 1] * (col[:, t:t + 1] == k[None, :])
        return acc

    WxT = one_hot_local_t(ti[:, 0], wx, base_x, lwx)   # (lwx, S)
    WyT = one_hot_local_t(ti[:, 1], wy, base_y, lwy)   # (lwy, S)
    Wz = one_hot_wrap(ti[:, 2], qs[:, None] * wz, K3)  # (S, K3), q-weighted

    WxT = jnp.moveaxis(WxT.reshape(lwx, n_pencils, Cp), 1, 0)
    WyT = jnp.moveaxis(WyT.reshape(lwy, n_pencils, Cp), 1, 0)
    Wz = Wz.reshape(n_pencils, Cp, K3)
    WxyT = (WxT[:, :, None, :] * WyT[:, None, :, :]).reshape(
        n_pencils, lwx * lwy, Cp)
    T = jax.lax.dot_general(
        WxyT, Wz, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=MM_PRECISION,
        preferred_element_type=dtype)
    T = T.reshape(gx, gy, lwx, lwy, K3)
    return _assemble_colors(T, grid, (ppcx, lwx, ncx), (ppcy, lwy, ncy))


def _bspline_weights_d(w, order: int):
    """dM_order/du at the taps x = w + j: M_{n-1}(x) - M_{n-1}(x - 1)
    (standard cardinal B-spline derivative identity).  Shape w + (order,)."""
    j = jnp.arange(order, dtype=w.dtype)
    x = w[..., None] + j

    def M(n, x):
        if n == 2:
            return jnp.clip(1.0 - jnp.abs(x - 1.0), 0.0, None)
        return (x * M(n - 1, x) + (n - x) * M(n - 1, x - 1.0)) / (n - 1)

    return M(order - 1, x) - M(order - 1, x - 1.0)


def _extract_windows(Phi, grid, cell_grid, plan_x, plan_y):
    """Inverse of _assemble_colors: per-(x,y)-pencil local windows
    (gx, gy, lwx, lwy, K3) of a real grid.  Same-color pencils along a
    dim are exactly lw apart (lw = ncolor * ppc), so each color's windows
    are one circular roll + reshape — no gathers."""
    K1, K2, K3 = grid
    gx, gy = cell_grid[0], cell_grid[1]
    (ppcx, lwx, ncx), (ppcy, lwy, ncy) = plan_x, plan_y
    offx = (lwx - ppcx) // 2
    offy = (lwy - ppcy) // 2
    gxp = -(-gx // ncx) * ncx
    gyp = -(-gy // ncy) * ncy

    def circ(A, rows, axis):
        # circularly extend axis to `rows` length
        L = A.shape[axis]
        if rows == L:
            return A
        reps = [1] * A.ndim
        reps[axis] = -(-rows // L)
        return jax.lax.slice_in_dim(jnp.tile(A, reps), 0, rows, axis=axis)

    cols = []
    for r in range(ncx):
        rowsA = []
        Ar = jnp.roll(Phi, offx - r * ppcx, axis=0)
        Ar = circ(Ar, gxp // ncx * lwx, 0)
        for s in range(ncy):
            A = jnp.roll(Ar, offy - s * ppcy, axis=1)
            A = circ(A, gyp // ncy * lwy, 1)
            rowsA.append(A.reshape(gxp // ncx, lwx, gyp // ncy, lwy, K3)
                         .transpose(0, 2, 1, 3, 4))
        cols.append(jnp.stack(rowsA, axis=1))   # (gxp/ncx, ncy, gyp/ncy,...)
    T = jnp.stack(cols, axis=1)                  # (gxp/ncx, ncx, ncy, ...)
    T = T.transpose(0, 1, 3, 2, 4, 5, 6).reshape(gxp, gyp, lwx, lwy, K3)
    return T[:gx, :gy]


def recip_energy_forces_packed(grid, alpha, bm2x, bm2y, bm2z, cell_grid,
                               charges, positions, box_diag, cellsort):
    """(energy, forces): packed pencil spread -> grid energy + its adjoint
    grid Phi = dE/dQ (one rfftn forward reused, one irfftn-shaped adjoint)
    -> analytic interpolation forces
        F_d[i] = -q_i * (K_d / L_d) * sum_taps dM_d * M_e * M_f * Phi[tap]
    contracted with the same batched-MXU pencil structure as the spread
    (cf. Essmann et al. 1995 eq. 4.9; the reference delegates this to
    OpenMM's CudaPmeSlicedForce equivalent)."""
    K1, K2, K3 = grid
    gx, gy, gz = cell_grid
    plan_x, plan_y = _pencil_plan(grid, cell_grid)
    (ppcx, lwx, ncx), (ppcy, lwy, ncy) = plan_x, plan_y
    n = positions.shape[0]
    dtype = positions.dtype
    n_pencils = gx * gy
    pa = cellsort.pen_atom
    Cp = pa.shape[0] // n_pencils

    pad = pa >= n
    safe = jnp.where(pad, 0, pa)
    qs = jnp.where(pad, 0.0, charges[safe])
    pos_bf = positions - cellsort.image.astype(dtype) * box_diag

    Ks = jnp.asarray([K1, K2, K3], dtype)
    u = (pos_bf / box_diag * Ks)[safe]               # (S, 3)
    u = jnp.where(pad[:, None], -1e6, u)             # pads: weights -> 0
    ti = jnp.floor(u)
    w = u - ti
    ti = ti.astype(jnp.int32)

    wx = _bspline_weights(w[:, 0], PME_ORDER)        # (S, order)
    wy = _bspline_weights(w[:, 1], PME_ORDER)
    wz = _bspline_weights(w[:, 2], PME_ORDER)
    dwx = _bspline_weights_d(w[:, 0], PME_ORDER)
    dwy = _bspline_weights_d(w[:, 1], PME_ORDER)
    dwz = _bspline_weights_d(w[:, 2], PME_ORDER)

    S = pa.shape[0]
    slot = np.arange(S)
    cx = (slot // (gy * Cp)).astype(np.int32)
    cy = ((slot // Cp) % gy).astype(np.int32)
    offx = (lwx - ppcx) // 2
    offy = (lwy - ppcy) // 2
    base_x = jnp.asarray(cx * ppcx - offx)
    base_y = jnp.asarray(cy * ppcy - offy)

    j = jnp.arange(PME_ORDER, dtype=jnp.int32)

    def one_hot_local_t(ti_d, w_d, base, lw):
        col = ti_d[None, :] - base[None, :]                # (1, S)
        k = jnp.arange(lw, dtype=jnp.int32)[:, None]       # (lw, 1)
        acc = jnp.zeros((lw, S), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[None, :, t] * (col - t == k)
        return jnp.moveaxis(acc.reshape(lw, n_pencils, Cp), 1, 0)

    def one_hot_wrap(ti_d, w_d, K):
        col = jnp.mod(ti_d[:, None] - j[None, :], K)
        k = jnp.arange(K, dtype=jnp.int32)
        acc = jnp.zeros((S, K), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[:, t:t + 1] * (col[:, t:t + 1] == k[None, :])
        return acc.reshape(n_pencils, Cp, K)

    WxT = one_hot_local_t(ti[:, 0], wx, base_x, lwx)     # (P, lwx, Cp)
    WyT = one_hot_local_t(ti[:, 1], wy, base_y, lwy)     # (P, lwy, Cp)
    Wz = one_hot_wrap(ti[:, 2], qs[:, None] * wz, K3)    # (P, Cp, K3), q-wt

    # ---- spread + grid energy and adjoint --------------------------------
    WxyT = (WxT[:, :, None, :] * WyT[:, None, :, :]).reshape(
        n_pencils, lwx * lwy, Cp)
    T = jax.lax.dot_general(
        WxyT, Wz, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=MM_PRECISION, preferred_element_type=dtype)
    Q = _assemble_colors(T.reshape(gx, gy, lwx, lwy, K3), grid,
                         plan_x, plan_y)
    energy, Phi = jax.value_and_grad(
        lambda q: grid_energy(grid, alpha, bm2x, bm2y, bm2z, q, box_diag))(Q)

    # ---- interpolation forces --------------------------------------------
    Win = _extract_windows(Phi, grid, cell_grid, plan_x, plan_y).reshape(
        n_pencils, lwx * lwy, K3)

    dWxT = one_hot_local_t(ti[:, 0], dwx, base_x, lwx)
    dWyT = one_hot_local_t(ti[:, 1], dwy, base_y, lwy)
    dWz = one_hot_wrap(ti[:, 2], qs[:, None] * dwz, K3)

    def contract(AxyT):
        # (P, Cp, K3) <- sum_lwxy AxyT[p, lwxy, c] * Win[p, lwxy, k3]
        return jax.lax.dot_general(
            AxyT, Win, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=MM_PRECISION,
            preferred_element_type=dtype)

    V = contract(WxyT)                                   # shared by fz
    fz = jnp.sum(V * dWz, axis=2) * (Ks[2] / box_diag[2])
    dWxyT_x = (dWxT[:, :, None, :] * WyT[:, None, :, :]).reshape(
        n_pencils, lwx * lwy, Cp)
    fx = jnp.sum(contract(dWxyT_x) * Wz, axis=2) * (Ks[0] / box_diag[0])
    dWxyT_y = (WxT[:, :, None, :] * dWyT[:, None, :, :]).reshape(
        n_pencils, lwx * lwy, Cp)
    fy = jnp.sum(contract(dWxyT_y) * Wz, axis=2) * (Ks[1] / box_diag[1])

    # slot forces -> atom order (pads gather clamped garbage rows only when
    # the overflow latch is already set)
    f_slots = jnp.stack([fx.reshape(S), fy.reshape(S), fz.reshape(S)],
                        axis=1)
    return energy, -f_slots[cellsort.pen_inv]


def recip_ens_packed(grid, alpha, bm2x, bm2y, bm2z, cell_grid, R,
                     charges, positions, box_diag, cellsort,
                     rep_scale=None, with_forces=False):
    """Replica-batched packed-pencil reciprocal sum for FLATTENED replica
    ensembles (parallel/flatrep.py): per-(x, y, z-band) pencils — built by
    build_cellsort with the per-replica z period and renumbered
    replica-major (cellpair.pencil_perm) — reshape directly into R
    independent per-replica pencil sets, so ONE batched MXU spread
    produces (R, K1, K2, K3) grids and a vmapped grid_energy applies
    per-replica boxes (template * s_r under flat NPT).

    `positions` are STORED-frame coordinates (physical / s_r — fractional
    coordinates are scale-invariant, so the spread runs entirely on the
    template box); `box_diag` is the per-replica TEMPLATE (3,) box.
    Returns (energies (R,), forces (N, 3) physical or None).

    Replaces the per-replica vmapped generic spread (the (n0, K2*K3)
    one-hot materialization R times over) with the same local-window
    color machinery the single-system pencil path uses — the force side
    additionally replaces reverse-mode autodiff through the spread with
    the analytic B-spline derivative interpolation
    (recip_energy_forces_packed's math, batched)."""
    K1, K2, K3 = grid
    gx, gy = cell_grid[0], cell_grid[1]
    plan_x, plan_y = _pencil_plan(grid, cell_grid)
    (ppcx, lwx, ncx), (ppcy, lwy, ncy) = plan_x, plan_y
    n = positions.shape[0]
    dtype = positions.dtype
    P0 = gx * gy                       # per-replica pencils
    pa = cellsort.pen_atom
    Cp = pa.shape[0] // (R * P0)

    pad = pa >= n
    safe = jnp.where(pad, 0, pa)
    qs = jnp.where(pad, 0.0, charges[safe])
    pos_bf = positions - cellsort.image.astype(dtype) * box_diag

    Ks = jnp.asarray([K1, K2, K3], dtype)
    u = (pos_bf / box_diag * Ks)[safe]               # (S, 3)
    u = jnp.where(pad[:, None], -1e6, u)             # pads: weights -> 0
    ti = jnp.floor(u)
    w = u - ti
    ti = ti.astype(jnp.int32)

    wx = _bspline_weights(w[:, 0], PME_ORDER)        # (S, order)
    wy = _bspline_weights(w[:, 1], PME_ORDER)
    wz = _bspline_weights(w[:, 2], PME_ORDER)

    # static local-window bases per slot (replica-major pencil order:
    # slot -> (r, lx, y, rank))
    S = pa.shape[0]
    slot = np.arange(S)
    lx_s = ((slot // (gy * Cp)) % gx).astype(np.int32)
    cy_s = ((slot // Cp) % gy).astype(np.int32)
    offx = (lwx - ppcx) // 2
    offy = (lwy - ppcy) // 2
    base_x = jnp.asarray(lx_s * ppcx - offx)
    base_y = jnp.asarray(cy_s * ppcy - offy)

    j = jnp.arange(PME_ORDER, dtype=jnp.int32)
    NP = R * P0

    def one_hot_local_t(ti_d, w_d, base, lw):
        col = ti_d[None, :] - base[None, :]                # (1, S)
        k = jnp.arange(lw, dtype=jnp.int32)[:, None]       # (lw, 1)
        acc = jnp.zeros((lw, S), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[None, :, t] * (col - t == k)
        return jnp.moveaxis(acc.reshape(lw, NP, Cp), 1, 0)

    def one_hot_wrap(ti_d, w_d, K):
        col = jnp.mod(ti_d[:, None] - j[None, :], K)
        k = jnp.arange(K, dtype=jnp.int32)
        acc = jnp.zeros((S, K), dtype)
        for t in range(PME_ORDER):
            acc = acc + w_d[:, t:t + 1] * (col[:, t:t + 1] == k[None, :])
        return acc.reshape(NP, Cp, K)

    WxT = one_hot_local_t(ti[:, 0], wx, base_x, lwx)     # (NP, lwx, Cp)
    WyT = one_hot_local_t(ti[:, 1], wy, base_y, lwy)     # (NP, lwy, Cp)
    Wz = one_hot_wrap(ti[:, 2], qs[:, None] * wz, K3)    # (NP, Cp, K3)

    WxyT = (WxT[:, :, None, :] * WyT[:, None, :, :]).reshape(
        NP, lwx * lwy, Cp)
    T = jax.lax.dot_general(
        WxyT, Wz, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=MM_PRECISION, preferred_element_type=dtype)
    T = T.reshape(R, gx, gy, lwx, lwy, K3)
    Q = jax.vmap(lambda t: _assemble_colors(t, grid, plan_x, plan_y))(T)

    boxes = (jnp.broadcast_to(box_diag, (R, 3)) if rep_scale is None
             else box_diag[None, :] * rep_scale[:, None].astype(dtype))

    def e_of(q, b):
        return grid_energy(grid, alpha, bm2x, bm2y, bm2z, q, b)

    if not with_forces:
        return jax.vmap(e_of)(Q, boxes), None

    energies, Phi = jax.vmap(jax.value_and_grad(e_of), in_axes=(0, 0),
                             out_axes=(0, 0))(Q, boxes)
    Win = jax.vmap(lambda p: _extract_windows(p, grid, cell_grid,
                                              plan_x, plan_y))(Phi)
    Win = Win.reshape(NP, lwx * lwy, K3)

    dwx = _bspline_weights_d(w[:, 0], PME_ORDER)
    dwy = _bspline_weights_d(w[:, 1], PME_ORDER)
    dwz = _bspline_weights_d(w[:, 2], PME_ORDER)
    dWxT = one_hot_local_t(ti[:, 0], dwx, base_x, lwx)
    dWyT = one_hot_local_t(ti[:, 1], dwy, base_y, lwy)
    dWz = one_hot_wrap(ti[:, 2], qs[:, None] * dwz, K3)

    def contract(AxyT):
        return jax.lax.dot_general(
            AxyT, Win, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            precision=MM_PRECISION, preferred_element_type=dtype)

    # per-replica physical box lengths L_r = box0 * s_r enter the
    # K/L interpolation factors: broadcast per slot via the replica-major
    # pencil order (slot replica = slot // (P0 * Cp))
    if rep_scale is None:
        inv_s = jnp.ones((R,), dtype)
    else:
        inv_s = 1.0 / rep_scale.astype(dtype)
    inv_s_slot = jnp.repeat(inv_s, P0)[:, None]          # (NP, 1) per pencil

    V = contract(WxyT)                                   # (NP, Cp, K3)
    fz = jnp.sum(V * dWz, axis=2) * (Ks[2] / box_diag[2]) * inv_s_slot
    dWxyT_x = (dWxT[:, :, None, :] * WyT[:, None, :, :]).reshape(
        NP, lwx * lwy, Cp)
    fx = (jnp.sum(contract(dWxyT_x) * Wz, axis=2)
          * (Ks[0] / box_diag[0]) * inv_s_slot)
    dWxyT_y = (WxT[:, :, None, :] * dWyT[:, None, :, :]).reshape(
        NP, lwx * lwy, Cp)
    fy = (jnp.sum(contract(dWxyT_y) * Wz, axis=2)
          * (Ks[1] / box_diag[1]) * inv_s_slot)

    f_slots = jnp.stack([fx.reshape(S), fy.reshape(S), fz.reshape(S)],
                        axis=1)
    return energies, -f_slots[cellsort.pen_inv]


def _assemble_colors(T, grid, plan_x, plan_y):
    """Color assembly shared by the slot and packed pencil spreads:
    same-color window tiles are disjoint and contiguous; fold the
    wrap-around tails and roll into grid position."""
    K1, K2, K3 = grid
    (ppcx, lwx, ncx), (ppcy, lwy, ncy) = plan_x, plan_y
    gx, gy = T.shape[0], T.shape[1]
    offx = (lwx - ppcx) // 2
    offy = (lwy - ppcy) // 2
    gxp = -(-gx // ncx) * ncx
    gyp = -(-gy // ncy) * ncy
    if gxp != gx or gyp != gy:
        T = jnp.pad(T, ((0, gxp - gx), (0, gyp - gy), (0, 0), (0, 0),
                        (0, 0)))

    def fold(A, K, axis):
        L = A.shape[axis]
        if L == K:
            return A
        head = jax.lax.slice_in_dim(A, 0, K, axis=axis)
        tail = jax.lax.slice_in_dim(A, K, L, axis=axis)
        pads = [(0, 0)] * A.ndim
        pads[axis] = (0, 2 * K - L)
        return head + jnp.pad(tail, pads)

    Q = jnp.zeros((K1, K2, K3), T.dtype)
    for r in range(ncx):
        for s in range(ncy):
            sub = T[r::ncx, s::ncy]
            A = sub.transpose(0, 2, 1, 3, 4).reshape(
                gxp // ncx * lwx, gyp // ncy * lwy, K3)
            A = fold(A, K1, 0)
            A = fold(A, K2, 1)
            Q = Q + jnp.roll(A, ((r * ppcx - offx) % K1,
                                 (s * ppcy - offy) % K2), axis=(0, 1))
    return Q


def grid_energy(grid, alpha, bm2x, bm2y, bm2z, Q, box_diag):
    """Reciprocal-space energy of a spread charge grid.

    Q is real, so the transform is rfftn over the half-spectrum
    (z-frequencies 0..K3/2) with Hermitian double-counting weights —
    half the FFT work and memory of the full fftn; the z-moduli are
    symmetric (|b(-m)|^2 = |b(m)|^2) so the half slice is exact."""
    K1, K2, K3 = grid
    dtype = Q.dtype
    F = jnp.fft.rfftn(Q)
    K3h = K3 // 2 + 1
    m1 = jnp.fft.fftfreq(K1, d=1.0 / K1).astype(dtype)  # signed integer freqs
    m2 = jnp.fft.fftfreq(K2, d=1.0 / K2).astype(dtype)
    m3 = jnp.arange(K3h).astype(dtype)                  # rfft: 0..K3/2
    if jnp.ndim(box_diag) == 2:
        # triclinic: m* = m1 a* + m2 b* + m3 c* with a*_j = column j of
        # the inverse box (rows of box are a, b, c) — boxutils.inv_box
        from .boxutils import inv_box
        ib = inv_box(box_diag).astype(dtype)
        f1 = m1[:, None, None]
        f2 = m2[None, :, None]
        f3 = m3[None, None, :]
        mx = f1 * ib[0, 0] + f2 * ib[0, 1] + f3 * ib[0, 2]
        my = f1 * ib[1, 0] + f2 * ib[1, 1] + f3 * ib[1, 2]
        mz = f1 * ib[2, 0] + f2 * ib[2, 1] + f3 * ib[2, 2]
    else:
        mx = m1[:, None, None] / box_diag[0]
        my = m2[None, :, None] / box_diag[1]
        mz = m3[None, None, :] / box_diag[2]
    m_sq = mx * mx + my * my + mz * mz
    bm2 = (bm2x[:, None, None].astype(dtype) * bm2y[None, :, None].astype(dtype)
           * bm2z[:K3h][None, None, :].astype(dtype))
    from .boxutils import volume as _vol
    volume = _vol(box_diag)
    pi = jnp.asarray(np.pi, dtype)
    m_sq_safe = jnp.where(m_sq > 0, m_sq, 1.0)
    # conjugate-pair weight: interior z-frequencies represent +-m3
    double = (jnp.arange(K3h) >= 1) & (jnp.arange(K3h) <= (K3 - 1) // 2)
    eterm = jnp.where(m_sq > 0,
                      jnp.exp(-pi * pi * m_sq_safe / (alpha * alpha))
                      / m_sq_safe * bm2, 0.0)
    eterm = eterm * jnp.where(double, 2.0, 1.0).astype(dtype)[None, None, :]
    S2 = jnp.real(F) ** 2 + jnp.imag(F) ** 2
    return ONE_4PI_EPS0 / (2.0 * pi * volume) * jnp.sum(eterm * S2)
