"""Pallas TPU kernel v2 for the cell-pair sweep: force-only, half stencil,
one pair-chain evaluation per block, VMEM-resident accumulators.

Why the XLA sweep (forces/cellpair._sweep_regular) leaves ~2x on the
table: its pair chain has one fusion consumer per force contraction and
XLA rematerializes the whole ~50-pass chain inside each (measured; an
optimization_barrier materializing g2 to HBM was slower still).  Here the
chain runs once per (offset, b-slot) block with both the row forces and
the Newton's-third-law reaction accumulated in VMEM.

Layout (the round-1 kernel died on per-slot row-copy gathers; this one
does bulk layer DMA):

  * HBM fields arrive TRANSPOSED, (C, n_cells): slots on sublanes, cells
    on lanes, cell-major (x, y, z).  Coordinates are CELL-LOCAL (box-frame
    position minus cell center), so for stencil offset o the displacement
    is a_loc - (b_loc + o*h) with a per-offset constant o*h — ghost copies
    and wraps need no coordinate fixups.
  * grid = gx programs, one per x-layer.  Each program DMAs the 2w+1
    surrounding layers (wrapped indices via scalar prefetch) of every
    field into a VMEM slab (C, n_lay*n_yz), then doubles each layer along
    lanes so wrap-around b-views are single dynamic slices.
  * in-layer (y, z) wrap: src(l) = l + d0 with a +-gz correction where
    cz + oz wraps (the y wrap folds into the layer-length modulus) —
    three slice variants selected by per-offset lane masks.
  * pair tile per (offset, b-slot): (C, n_yz) — full-lane cell axis.
    Row forces accumulate in registers/VMEM; reactions are inverse-mapped
    rows accumulated into a (3C, n_lay*n_yz) slab emitted per program and
    overlap-added by XLA afterwards (programs must not scatter into each
    other's outputs).

f32, regular half-stencil grids, single-word exclusion masks only; the
XLA sweep remains the fallback.  Opt-in: nb_kwargs {"use_pallas": 2}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def supports(cfg, dtype) -> bool:
    return (HAVE_PALLAS and cfg.regular and cfg.half_stencil
            and cfg.excl_words == 1 and 2 * cfg.excl_window + 1 <= 31
            and dtype == jnp.float32
            and cfg.grid[0] >= 2 * cfg.window[0] + 1)


def _make_pair_g(method, cutoff, alpha=0.0, krf=0.0, crf=0.0):
    """Force-only pair kernel: returns dE/dr^2 (excluded pairs -> 0; the
    Ewald exclusion correction runs in forces/pairterms.py)."""
    two_over_sqrt_pi = 2.0 / np.sqrt(np.pi)

    def g_fn(qq, sig, eps, r2, inv_r, inv_r2):
        s2 = sig * sig * inv_r2
        x6 = s2 * s2 * s2
        g_lj = -4.0 * eps * (6.0 * x6 * x6 - 3.0 * x6) * inv_r2
        if method == "ewald":
            ar = alpha * r2 * inv_r
            # A&S 7.1.26 rational erfc (|err| < 1.5e-7, below f32 eps)
            t = 1.0 / (1.0 + 0.3275911 * ar)
            expm = jnp.exp(-ar * ar)
            erfc_ar = t * (0.254829592 + t * (-0.284496736 + t * (
                1.421413741 + t * (-1.453152027 + t * 1.061405429)))) * expm
            g_c = -0.5 * qq * inv_r2 * (erfc_ar * inv_r
                                        + two_over_sqrt_pi * alpha * expm)
        elif method == "rf":
            g_c = qq * (-0.5 * inv_r2 * inv_r + krf)
        else:
            g_c = -0.5 * qq * inv_r2 * inv_r
        return g_lj + g_c

    return g_fn


def pair_forces_pallas(params, positions, box_diag, cellsort, cfg,
                       method, alpha=0.0, krf=0.0, crf=0.0,
                       coulomb_scale=None, interpret=False):
    """forces (N, 3) for the direct-space sum — Pallas half-stencil sweep.

    Same physics as forces/cellpair._sweep_regular with with_energy=False
    (pinned by tests/test_pallas_sweep.py)."""
    from ..forces import cellpair as cp

    n = positions.shape[0]
    gx, gy, gz = cfg.grid
    C = cfg.capacity
    W = cfg.excl_window
    w = cfg.window[0]
    n_lay = 2 * w + 1
    n_yz = gy * gz
    n_cells = cfg.n_cells
    dtype = positions.dtype
    if coulomb_scale is None:
        from ..units import ONE_4PI_EPS0 as coulomb_scale
    pair_g = _make_pair_g(method, cfg.cutoff, alpha=alpha, krf=krf, crf=crf)

    # ---- XLA pre-work: sorted fields, cell-local coords, transposes -----
    s = cp._sorted_arrays(params, positions, cellsort, cfg, n,
                          box_diag=box_diag)
    blocks = {k: v.reshape(n_cells, C) for k, v in s.items()}
    h = box_diag.astype(dtype) / jnp.asarray(np.array(cfg.grid), dtype)
    cz_ = np.arange(n_cells)
    c3 = np.stack([cz_ // (gy * gz), (cz_ // gz) % gy, cz_ % gz],
                  axis=1).astype(np.float64) + 0.5
    fields = []
    for d, k in enumerate("xyz"):
        centers = jnp.asarray(c3[:, d], dtype) * h[d]
        fields.append((blocks[k] - centers[:, None]).T)      # (C, n_cells)
    fields.append(blocks["q"].T)
    fields.append(blocks["sig"].T)
    fields.append(jnp.sqrt(blocks["eps"]).T)
    gid_t = blocks["gid"].T
    ew_t = blocks["ew0"].T if W > 0 else jnp.zeros_like(gid_t)

    offsets = np.array(cfg.offsets, np.int32)
    n_off = len(offsets)
    lay_idx = np.stack([(np.arange(gx)[:, None] + np.arange(-w, w + 1)[None])
                        % gx], axis=0)[0].astype(np.int32)   # (gx, n_lay)
    off_tab = jnp.asarray(offsets)                           # (n_off, 3)
    hvec = jnp.asarray([h[0], h[1], h[2]], dtype)

    two_nyz = 2 * n_yz
    cutoff2 = cfg.cutoff * cfg.cutoff

    def kernel(lay_ref, off_ref, hvec_ref,
               x_ref, y_ref, z_ref, q_ref, sig_ref, seps_ref, gid_ref,
               ew_ref,
               fown_ref, freact_ref,
               xs, ys, zs, qs, sigs, sepss, gids, ews, sem):
        i = pl.program_id(0)

        # ---- bulk DMA: layer columns into doubled slabs -----------------
        # slab layout per field: (C, n_lay * 2 * n_yz); each layer stored
        # twice back-to-back so wrapped b-views are single dynamic slices
        def load(field_ref, slab):
            for li in range(n_lay):
                src = lay_ref[i, li]
                for half in range(2):
                    cp_ = pltpu.make_async_copy(
                        field_ref.at[:, pl.ds(src * n_yz, n_yz)],
                        slab.at[:, pl.ds(li * two_nyz + half * n_yz, n_yz)],
                        sem)
                    cp_.start()
                    cp_.wait()

        load(x_ref, xs)
        load(y_ref, ys)
        load(z_ref, zs)
        load(q_ref, qs)
        load(sig_ref, sigs)
        load(seps_ref, sepss)
        load(gid_ref, gids)
        # A-side exclusion words: own layer only
        cp_ = pltpu.make_async_copy(
            ew_ref.at[:, pl.ds(lay_ref[i, w] * n_yz, n_yz)],
            ews.at[:, :], sem)
        cp_.start()
        cp_.wait()

        own0 = w * two_nyz
        xa = xs[:, pl.ds(own0, n_yz)]
        ya = ys[:, pl.ds(own0, n_yz)]
        za = zs[:, pl.ds(own0, n_yz)]
        qa = coulomb_scale * qs[:, pl.ds(own0, n_yz)]
        siga = sigs[:, pl.ds(own0, n_yz)]
        sepsa = sepss[:, pl.ds(own0, n_yz)]
        gida = gids[:, pl.ds(own0, n_yz)]
        ewa = ews[:, :]

        cz_lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_yz), 1) % gz

        hx = hvec_ref[0]
        hy = hvec_ref[1]
        hz = hvec_ref[2]

        freact_ref[0, :, :] = jnp.zeros((3 * C, n_lay * n_yz), dtype)

        # ---- self block -------------------------------------------------
        rows = jax.lax.broadcasted_iota(jnp.int32, (C, n_yz), 0)

        def self_body(bj, acc):
            fx, fy, fz = acc
            dx = xa - xs[pl.ds(bj, 1), pl.ds(own0, n_yz)]
            dy = ya - ys[pl.ds(bj, 1), pl.ds(own0, n_yz)]
            dz = za - zs[pl.ds(bj, 1), pl.ds(own0, n_yz)]
            r2 = dx * dx + dy * dy + dz * dz
            valid = (r2 < cutoff2) & (rows != bj)
            dg = gids[pl.ds(bj, 1), pl.ds(own0, n_yz)] - gida
            in_win = jnp.abs(dg) <= W
            bit = jnp.where(in_win, dg + W, 0)
            excl = in_win & (((ewa >> bit) & 1) == 1)
            r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            inv_r2 = inv_r * inv_r
            qq = qa * qs[pl.ds(bj, 1), pl.ds(own0, n_yz)]
            sig = 0.5 * (siga + sigs[pl.ds(bj, 1), pl.ds(own0, n_yz)])
            eps = sepsa * sepss[pl.ds(bj, 1), pl.ds(own0, n_yz)]
            g = pair_g(qq, sig, eps, r2s, inv_r, inv_r2)
            g2 = jnp.where(valid & ~excl, -2.0 * g, 0.0)
            # explicit casts: under jax_enable_x64 weak-typed constants can
            # promote the accumulators and break the fori carry types
            return (jnp.asarray(fx + g2 * dx, dtype),
                    jnp.asarray(fy + g2 * dy, dtype),
                    jnp.asarray(fz + g2 * dz, dtype))

        zero = jnp.zeros((C, n_yz), dtype)
        fx, fy, fz = jax.lax.fori_loop(0, C, self_body, (zero, zero, zero))

        # ---- stencil offsets -------------------------------------------
        def off_body(oi, acc):
            fx, fy, fz = acc
            ox = off_ref[oi, 0]
            oy = off_ref[oi, 1]
            oz = off_ref[oi, 2]
            tx = ox.astype(dtype) * hx
            ty = oy.astype(dtype) * hy
            tz = oz.astype(dtype) * hz
            lcol = (ox + w) * two_nyz
            # forward view: src(l) = l + d0 (+-gz where cz+oz wraps),
            # modulo the doubled-layer trick
            d0 = oy * gz + oz
            mz_hi = (cz_lane + oz) >= gz
            mz_lo = (cz_lane + oz) < 0
            dA = jnp.remainder(d0, n_yz)
            dB = jnp.remainder(d0 - gz, n_yz)
            dC = jnp.remainder(d0 + gz, n_yz)
            # inverse view (for the reaction): offsets negated
            d0i = -d0
            mzi_hi = (cz_lane - oz) >= gz
            mzi_lo = (cz_lane - oz) < 0
            dAi = jnp.remainder(d0i, n_yz)
            dBi = jnp.remainder(d0i - gz, n_yz)
            dCi = jnp.remainder(d0i + gz, n_yz)

            def bview(slab, bj):
                base = lcol
                vA = slab[pl.ds(bj, 1), pl.ds(base + dA, n_yz)]
                vB = slab[pl.ds(bj, 1), pl.ds(base + dB, n_yz)]
                vC = slab[pl.ds(bj, 1), pl.ds(base + dC, n_yz)]
                return jnp.where(mz_hi, vB, jnp.where(mz_lo, vC, vA))

            def slot_body(bj, acc2):
                fx, fy, fz = acc2
                dx = xa - (bview(xs, bj) + tx)
                dy = ya - (bview(ys, bj) + ty)
                dz = za - (bview(zs, bj) + tz)
                r2 = dx * dx + dy * dy + dz * dz
                valid = r2 < cutoff2
                dg = bview(gids, bj) - gida
                in_win = jnp.abs(dg) <= W
                bit = jnp.where(in_win, dg + W, 0)
                excl = in_win & (((ewa >> bit) & 1) == 1)
                r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
                inv_r = jax.lax.rsqrt(r2s)
                inv_r2 = inv_r * inv_r
                qq = qa * bview(qs, bj)
                sig = 0.5 * (siga + bview(sigs, bj))
                eps = sepsa * bview(sepss, bj)
                g = pair_g(qq, sig, eps, r2s, inv_r, inv_r2)
                g2 = jnp.where(valid & ~excl, -2.0 * g, 0.0)
                # reaction rows (1, n_yz) in the ROW frame -> inverse-map
                # into the b frame and accumulate into the reaction slab
                rx = jnp.asarray(-jnp.sum(g2 * dx, axis=0,
                                          keepdims=True), dtype)
                ry = jnp.asarray(-jnp.sum(g2 * dy, axis=0,
                                          keepdims=True), dtype)
                rz = jnp.asarray(-jnp.sum(g2 * dz, axis=0,
                                          keepdims=True), dtype)

                zero_i = jnp.int32(0)

                def inv_map(r):
                    r2x = jnp.concatenate([r, r], axis=1)
                    vA = jax.lax.dynamic_slice(r2x, (zero_i, dAi), (1, n_yz))
                    vB = jax.lax.dynamic_slice(r2x, (zero_i, dBi), (1, n_yz))
                    vC = jax.lax.dynamic_slice(r2x, (zero_i, dCi), (1, n_yz))
                    return jnp.where(mzi_hi, vB, jnp.where(mzi_lo, vC, vA))

                rcol = (ox + w) * n_yz
                for comp, r in enumerate((rx, ry, rz)):
                    row = comp * C + bj
                    cur = freact_ref[0, pl.ds(row, 1), pl.ds(rcol, n_yz)]
                    freact_ref[0, pl.ds(row, 1), pl.ds(rcol, n_yz)] = (
                        jnp.asarray(cur + inv_map(r), dtype))
                return (jnp.asarray(fx + g2 * dx, dtype),
                        jnp.asarray(fy + g2 * dy, dtype),
                        jnp.asarray(fz + g2 * dz, dtype))

            return jax.lax.fori_loop(0, C, slot_body, (fx, fy, fz))

        fx, fy, fz = jax.lax.fori_loop(1, n_off, off_body, (fx, fy, fz))
        fown_ref[0, pl.ds(0, C), :] = fx
        fown_ref[0, pl.ds(C, C), :] = fy
        fown_ref[0, pl.ds(2 * C, C), :] = fz

    slab = lambda dt: pltpu.VMEM((C, n_lay * two_nyz), dt)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(gx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
            out_specs=[
                pl.BlockSpec((1, 3 * C, n_yz), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C, n_lay * n_yz),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                slab(dtype), slab(dtype), slab(dtype), slab(dtype),
                slab(dtype), slab(dtype), slab(jnp.int32),
                pltpu.VMEM((C, n_yz), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((gx, 3 * C, n_yz), dtype),
            jax.ShapeDtypeStruct((gx, 3 * C, n_lay * n_yz), dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(lay_idx), off_tab, hvec,
      *fields, gid_t, ew_t)

    fown, freact = out
    # overlap-add the reaction slabs: program i's layer block L belongs to
    # absolute layer (i + L - w) mod gx
    fr = freact.reshape(gx, 3, C, n_lay, n_yz)
    total = fown.reshape(gx, 3, C, n_yz)
    for L in range(n_lay):
        total = total + jnp.roll(fr[:, :, :, L, :], L - w, axis=0)
    # (gx, 3, C, n_yz) -> (3, n_cells*C) slot-major forces -> atom order
    f = jnp.transpose(total, (1, 0, 3, 2)).reshape(3, n_cells * C)
    f_slots = jnp.stack([f[0], f[1], f[2]], axis=1)
    return f_slots[cellsort.inv_slot]
