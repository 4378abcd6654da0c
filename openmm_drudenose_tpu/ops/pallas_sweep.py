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
    # embedded replica-ensemble grids: layers wrap per x band
    # (cfg.x_period) and the in-layer z wrap has period cfg.z_period —
    # both static, so the kernel handles them with per-band index tables;
    # a band must still span a full stencil in x
    px = getattr(cfg, "x_period", 0) or cfg.grid[0]
    # VMEM budget: 8 doubled-layer slabs (C, n_lay*lay_stride) + the
    # reaction output block (3C, n_lay*fr_stride) must fit the ~16 MB
    # scoped-vmem limit (huge extended-ensemble (y,z) planes blow it —
    # measured OOM at n_yz = 1600, C = 48)
    n_yz = cfg.grid[1] * cfg.grid[2]
    n_lay = 2 * cfg.window[0] + 1
    lay_stride = -(-2 * n_yz // 128) * 128
    fr_stride = -(-n_yz // 128) * 128
    vmem = 4 * cfg.capacity * n_lay * (8 * lay_stride + 2 * 3 * fr_stride)
    # triclinic configs ride the SAME kernel: geometry enters only
    # through the cell-local field construction and the per-offset shift
    # (o/g) @ box — both handled by _centers_and_hvec; the layer DMA /
    # wrap machinery is pure index space (validated on chip vs CPU f64,
    # scripts/check_triclinic_tpu.py --pallas)
    return (HAVE_PALLAS and cfg.regular and cfg.half_stencil
            and cfg.excl_words == 1 and 2 * cfg.excl_window + 1 <= 31
            and dtype == jnp.float32
            and px >= 2 * cfg.window[0] + 1
            and vmem <= 12 * 1024 * 1024
            # Mosaic rejects dynamic-sublane loads narrower than one
            # 128-lane tile ("dynamic load with unaligned indices"); the
            # (y,z) plane is the kernel's lane axis
            and n_yz >= 128)


def _centers_and_hvec(cfg, box_diag, c3, dtype):
    """Cell centers (3 x (n_cells,)) and the 6-scalar cell-vector pack
    [hax, hby, hcz, hbx, hcx, hcy] = rows(box)/grid in OpenMM's reduced
    row-vector form.  The per-offset pair shift is then the static linear
    combination tx = ox*hax + oy*hbx + oz*hcx, ty = oy*hby + oz*hcy,
    tz = oz*hcz — orthorhombic boxes zero the off-diagonals, so ONE
    kernel serves both geometries.  Centers are computed ELEMENTWISE
    (boxutils.rows_combo_elem): a (n,3)@(3,3) matmul here would hit the
    TPU bf16 dot_general default and misbin atoms (CLAUDE.md)."""
    from ..forces import cellpair as cp  # noqa: F401 (doc cross-ref)
    g_inv = 1.0 / np.asarray(cfg.phys_grid, np.float64)
    if getattr(cfg, "triclinic", False):
        from ..forces.boxutils import rows_combo_elem
        c3f = jnp.asarray((c3 * g_inv).T, dtype)            # (3, nc)
        cen = rows_combo_elem(c3f, box_diag)                # (3, nc)
        centers_d = [cen[d] for d in range(3)]
        H = box_diag.astype(dtype) * jnp.asarray(g_inv, dtype)[:, None]
        hvec = jnp.stack([H[0, 0], H[1, 1], H[2, 2],
                          H[1, 0], H[2, 0], H[2, 1]])
    else:
        h = box_diag.astype(dtype) / jnp.asarray(
            np.array(cfg.phys_grid), dtype)
        centers_d = [jnp.asarray(c3[:, d], dtype) * h[d] for d in range(3)]
        zero = jnp.zeros((), dtype)
        hvec = jnp.stack([h[0], h[1], h[2], zero, zero, zero])
    return centers_d, hvec


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
                       coulomb_scale=None, interpret=False,
                       debug_outputs=False, excl_skip=True,
                       debug_lmax_clamp=None):
    """forces (N, 3) for the direct-space sum — Pallas half-stencil sweep.

    Same physics as forces/cellpair._sweep_regular with with_energy=False
    (pinned by tests/test_pallas_sweep.py).

    Mosaic constraints shape the v3 design (v2 failed to lower):
      * memref (DMA) slices must be lane-tile aligned (128) in offset and
        width -> each x-layer is stored doubled (period n_yz, so wrapped
        b-windows are contiguous) and padded to a 128-multiple stride by
        XLA pre-work; the kernel then does one aligned full-stride DMA per
        (field, layer)
      * lane offsets of loads must be compile-time constants -> the
        stencil-offset loop is statically unrolled (the offset table is
        static anyway); in-layer shifts become static slice positions
      * no dynamic-sublane stores -> Newton's-third-law reactions
        accumulate in fori-carry VALUES via one-hot(b-slot) outer products
        instead of scattered row writes
    """
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

    lay_stride = -(-2 * n_yz // 128) * 128
    fr_stride = -(-n_yz // 128) * 128

    # ---- XLA pre-work: sorted fields, cell-local coords, layer doubling --
    s = cp._sorted_arrays(params, positions, cellsort, cfg, n,
                          box_diag=box_diag)
    blocks = {k: v.reshape(n_cells, C) for k, v in s.items()}
    # cell centers / cell size in the PER-REPLICA frame (phys == grid for
    # plain systems; embedded ensembles repeat per-replica centers per band)
    c3 = cp._local_c3(cfg) + 0.5
    centers_d, hvec = _centers_and_hvec(cfg, box_diag, c3, dtype)
    px = cfg.x_period or gx        # x-band layer-wrap period
    pz = cfg.z_period or gz        # in-layer z-wrap period

    def layer_double(ft):
        # (C, n_cells) -> (C, gx*lay_stride): per x-layer [cells|cells|pad]
        v = ft.reshape(C, gx, n_yz)
        v2 = jnp.concatenate([v, v], axis=2)
        if lay_stride > 2 * n_yz:
            v2 = jnp.pad(v2, ((0, 0), (0, 0), (0, lay_stride - 2 * n_yz)))
        return v2.reshape(C, gx * lay_stride)

    fields = []
    for d, k in enumerate("xyz"):
        fields.append(layer_double((blocks[k] - centers_d[d][:, None]).T))
    fields.append(layer_double(blocks["q"].T))
    fields.append(layer_double(blocks["sig"].T))
    fields.append(layer_double(jnp.sqrt(blocks["eps"]).T))
    fields.append(layer_double(blocks["gid"].T))
    fields.append(layer_double(blocks["ew0"].T) if W > 0
                  else jnp.zeros_like(fields[-1]))

    offsets = np.array(cfg.offsets, np.int32)
    n_off = len(offsets)
    # offsets with any |o| >= 2 have a cell-to-cell gap of >= one cell edge
    # (>= r_list/2 > any bonded-exclusion span), so the exclusion bitmask
    # test is skipped there: excluded pairs are intramolecular and short,
    # and pairs beyond the cutoff are zeroed by the r2 test anyway.  The
    # rebuild latches CellSort.excl_span_exceeded if an excluded pair ever
    # stretches past (min cell edge - skin), making the skip unsound
    # (forces/cellpair.build_cellsort).
    off_needs_excl = (np.max(np.abs(offsets), axis=1) <= 1
                      if excl_skip else np.ones(n_off, bool))
    # halo layer indices wrap within each x band (period px): replicas
    # embedded along x never read each other's layers
    _lx = np.arange(gx)
    lay_idx = ((_lx[:, None] // px) * px
               + (_lx[:, None] % px + np.arange(-w, w + 1)[None]) % px
               ).astype(np.int32)                            # (gx, n_lay)
    cutoff2 = cfg.cutoff * cfg.cutoff

    # per-LAYER slot-loop bounds: pad slots fill from the top, so slots
    # >= a layer's max occupancy are no-ops; bounding each offset's b-loop
    # by its OWN b-layer's max (instead of the max over the whole halo)
    # trims the (C/avg)-fold capacity slack per offset
    occ = jnp.sum((cellsort.slot_atom < n).reshape(n_cells, C),
                  axis=1).reshape(gx, n_yz)
    lay_max = jnp.max(occ, axis=1).astype(jnp.int32)         # (gx,)
    if debug_lmax_clamp is not None:
        # probe-only: cap the b-slot loop bound without changing the tile
        # height, isolating which dimension the sweep cost scales with
        # (scripts/probe_split.py) — NOT physics-safe
        lay_max = jnp.minimum(lay_max, jnp.int32(debug_lmax_clamp))

    def kernel(lay_ref, lmax_ref, hvec_ref,
               x_ref, y_ref, z_ref, q_ref, sig_ref, seps_ref, gid_ref,
               ew_ref,
               fown_ref, freact_ref,
               xs, ys, zs, qs, sigs, sepss, gids, ews, sem):
        i = pl.program_id(0)

        # ---- bulk DMA: one aligned full-stride copy per (field, layer) --
        copies = []
        for field_ref, slab_ in ((x_ref, xs), (y_ref, ys), (z_ref, zs),
                                 (q_ref, qs), (sig_ref, sigs),
                                 (seps_ref, sepss), (gid_ref, gids)):
            for li in range(n_lay):
                src = lay_ref[i, li]
                copies.append(pltpu.make_async_copy(
                    field_ref.at[:, pl.ds(src * lay_stride, lay_stride)],
                    slab_.at[:, pl.ds(li * lay_stride, lay_stride)],
                    sem))
        copies.append(pltpu.make_async_copy(
            ew_ref.at[:, pl.ds(lay_ref[i, w] * lay_stride, lay_stride)],
            ews.at[:, :], sem))
        for cp_ in copies:
            cp_.start()
        for cp_ in copies:
            cp_.wait()

        own0 = w * lay_stride
        xa = xs[:, pl.ds(own0, n_yz)]
        ya = ys[:, pl.ds(own0, n_yz)]
        za = zs[:, pl.ds(own0, n_yz)]
        qa = coulomb_scale * qs[:, pl.ds(own0, n_yz)]
        siga = sigs[:, pl.ds(own0, n_yz)]
        sepsa = sepss[:, pl.ds(own0, n_yz)]
        gida = gids[:, pl.ds(own0, n_yz)]
        ewa = ews[:, pl.ds(0, n_yz)]

        # local z within the wrap period (gz % pz == 0, so iota % pz is
        # the per-replica z index directly)
        cz_lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_yz), 1) % pz
        col = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

        hx = hvec_ref[0]
        hy = hvec_ref[1]
        hz = hvec_ref[2]
        hbx = hvec_ref[3]   # triclinic tilts (0 for orthorhombic)
        hcx = hvec_ref[4]
        hcy = hvec_ref[5]

        freact_ref[0, :, :] = jnp.zeros((3 * C, n_lay * fr_stride), dtype)

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
        fx, fy, fz = jax.lax.fori_loop(0, lmax_ref[lay_ref[i, w]],
                                       self_body, (zero, zero, zero))

        # ---- stencil offsets (statically unrolled) ----------------------
        react_layers = {}
        for oi in range(1, n_off):
            ox, oy, oz = (int(offsets[oi, 0]), int(offsets[oi, 1]),
                          int(offsets[oi, 2]))
            # minimum-image shift between cells o apart = (o/g) @ box:
            # exact across wraps (a full lattice vector IS the image
            # correction), so one static linear combination per offset
            # serves orthorhombic and triclinic alike
            tx = ox * hx + oy * hbx + oz * hcx
            ty = oy * hy + oz * hcy
            tz = oz * hz
            lcol = (ox + w) * lay_stride
            # forward view: src(l) = l + d0 (+-gz where cz+oz wraps),
            # modulo the doubled-layer trick
            d0 = oy * gz + oz
            mz_hi = (cz_lane + oz) >= pz
            mz_lo = (cz_lane + oz) < 0
            dA = d0 % n_yz
            dB = (d0 - pz) % n_yz
            dC = (d0 + pz) % n_yz
            # inverse view (for the reaction): offsets negated
            d0i = -d0
            mzi_hi = (cz_lane - oz) >= pz
            mzi_lo = (cz_lane - oz) < 0
            dAi = d0i % n_yz
            dBi = (d0i - pz) % n_yz
            dCi = (d0i + pz) % n_yz

            # z-wrap variants are statically excluded by the sign of oz:
            # cz in [0, pz) so cz+oz >= pz needs oz > 0 and cz+oz < 0
            # needs oz < 0 — one slice for oz == 0, two (+ one select)
            # otherwise, instead of three slices + two selects per field
            # per slot iteration
            def bview(slab_, bj):
                vA = slab_[pl.ds(bj, 1), pl.ds(lcol + dA, n_yz)]
                if oz == 0:
                    return vA
                if oz > 0:
                    vB = slab_[pl.ds(bj, 1), pl.ds(lcol + dB, n_yz)]
                    return jnp.where(mz_hi, vB, vA)
                vC = slab_[pl.ds(bj, 1), pl.ds(lcol + dC, n_yz)]
                return jnp.where(mz_lo, vC, vA)

            needs_excl = bool(off_needs_excl[oi])

            def slot_body(bj, acc2):
                fx, fy, fz, rxa, rya, rza = acc2
                dx = xa - (bview(xs, bj) + tx)
                dy = ya - (bview(ys, bj) + ty)
                dz = za - (bview(zs, bj) + tz)
                r2 = dx * dx + dy * dy + dz * dz
                valid = r2 < cutoff2
                if needs_excl:
                    dg = bview(gids, bj) - gida
                    in_win = jnp.abs(dg) <= W
                    bit = jnp.where(in_win, dg + W, 0)
                    excl = in_win & (((ewa >> bit) & 1) == 1)
                    keep = valid & ~excl
                else:
                    keep = valid
                r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
                inv_r = jax.lax.rsqrt(r2s)
                inv_r2 = inv_r * inv_r
                qq = qa * bview(qs, bj)
                sig = 0.5 * (siga + bview(sigs, bj))
                eps = sepsa * bview(sepss, bj)
                g = pair_g(qq, sig, eps, r2s, inv_r, inv_r2)
                g2 = jnp.where(keep, -2.0 * g, 0.0)
                # reaction rows (1, n_yz) in the ROW frame, accumulated
                # into (C, n_yz) values via a one-hot(b-slot) outer
                # product — no dynamic-sublane stores
                onehot = (col == bj).astype(dtype)
                rx = -jnp.sum(g2 * dx, axis=0, keepdims=True)
                ry = -jnp.sum(g2 * dy, axis=0, keepdims=True)
                rz = -jnp.sum(g2 * dz, axis=0, keepdims=True)
                return (jnp.asarray(fx + g2 * dx, dtype),
                        jnp.asarray(fy + g2 * dy, dtype),
                        jnp.asarray(fz + g2 * dz, dtype),
                        jnp.asarray(rxa + onehot * rx, dtype),
                        jnp.asarray(rya + onehot * ry, dtype),
                        jnp.asarray(rza + onehot * rz, dtype))

            fx, fy, fz, rxa, rya, rza = jax.lax.fori_loop(
                0, lmax_ref[lay_ref[i, ox + w]], slot_body,
                (fx, fy, fz, zero, zero, zero))

            # lane inverse-shift into the b frame (static value slices)
            # inverse z-wrap: cz - oz >= pz needs oz < 0, cz - oz < 0
            # needs oz > 0 — same static exclusion as bview
            shifted = []
            for r in (rxa, rya, rza):
                r2x = jnp.concatenate([r, r], axis=1)     # (C, 2*n_yz)
                vA = r2x[:, dAi:dAi + n_yz]
                if oz == 0:
                    shifted.append(vA)
                elif oz > 0:
                    vC = r2x[:, dCi:dCi + n_yz]
                    shifted.append(jnp.where(mzi_lo, vC, vA))
                else:
                    vB = r2x[:, dBi:dBi + n_yz]
                    shifted.append(jnp.where(mzi_hi, vB, vA))
            L = ox + w
            acc = react_layers.get(L)
            react_layers[L] = (shifted if acc is None else
                               [a + s_ for a, s_ in zip(acc, shifted)])

        for L, acc in react_layers.items():
            for comp in range(3):
                freact_ref[0, pl.ds(comp * C, C),
                           pl.ds(L * fr_stride, n_yz)] = jnp.asarray(
                               acc[comp], dtype)

        fown_ref[0, pl.ds(0, C), :] = fx
        fown_ref[0, pl.ds(C, C), :] = fy
        fown_ref[0, pl.ds(2 * C, C), :] = fz

    slab = lambda dt: pltpu.VMEM((C, n_lay * lay_stride), dt)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(gx,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
            out_specs=[
                pl.BlockSpec((1, 3 * C, n_yz), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * C, n_lay * fr_stride),
                             lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                slab(dtype), slab(dtype), slab(dtype), slab(dtype),
                slab(dtype), slab(dtype), slab(jnp.int32),
                pltpu.VMEM((C, lay_stride), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((gx, 3 * C, n_yz), dtype),
            jax.ShapeDtypeStruct((gx, 3 * C, n_lay * fr_stride), dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(lay_idx), lay_max, hvec, *fields)

    fown, freact = out
    if debug_outputs:
        return fown, freact
    # overlap-add the reaction slabs: program i's layer block L belongs to
    # absolute layer band(i)*px + (lx(i) + L - w) mod px — a per-band roll
    # (plain grids have one band, px == gx)
    fr = freact.reshape(gx, 3, C, n_lay, fr_stride)[..., :n_yz]
    total = fown.reshape(gx, 3, C, n_yz)
    n_band = gx // px
    for L in range(n_lay):
        v = fr[:, :, :, L, :]
        if n_band > 1:
            v = jnp.roll(v.reshape(n_band, px, 3, C, n_yz), L - w,
                         axis=1).reshape(gx, 3, C, n_yz)
        else:
            v = jnp.roll(v, L - w, axis=0)
        total = total + v
    # (gx, 3, C, n_yz) -> (3, n_cells*C) slot-major forces -> atom order
    f = jnp.transpose(total, (1, 0, 3, 2)).reshape(3, n_cells * C)
    f_slots = jnp.stack([f[0], f[1], f[2]], axis=1)
    return f_slots[cellsort.inv_slot]


# ---------------------------------------------------------------------------
# y-chunked variant: re-engages the Pallas sweep when the (y, z) plane is
# too large for the full-layer kernel (supports() VMEM gate) — 1M-atom
# cubes (n_yz = 1024 at 32^3 cells) and resident slabs, whose LOCAL grid
# slices x but keeps the global (y, z) plane.
# ---------------------------------------------------------------------------


def choose_chunk(cfg, dtype, force=False):
    """Pick the y-chunk height cy for pair_forces_pallas_chunked, or None.

    Engages only where the full-layer kernel disengages (unless `force`,
    for parity tests): same base gates, then the largest divisor cy of gy
    with (a) cy >= the y stencil reach, (b) >= 128 pair-tile lanes,
    (c) the per-program slabs inside the VMEM budget — preferring layouts
    whose cy*gz pair tile pads least to the 128-lane grain."""
    if not HAVE_PALLAS or dtype != jnp.float32:
        return None
    px = getattr(cfg, "x_period", 0) or cfg.grid[0]
    if not (cfg.regular and cfg.half_stencil and cfg.excl_words == 1
            and 2 * cfg.excl_window + 1 <= 31
            and px >= 2 * cfg.window[0] + 1):
        return None
    if supports(cfg, dtype) and not force:
        return None
    gx, gy, gz = cfg.grid
    C = cfg.capacity
    offs = np.array(cfg.offsets, np.int64)
    wx = int(np.max(np.abs(offs[:, 0])))
    wy = int(np.max(np.abs(offs[:, 1])))
    n_lay = 2 * wx + 1
    best = None
    for cy in range(1, gy + 1):
        if gy % cy:
            continue
        if cy < max(wy, 1) or cy + 2 * wy + 2 > 2 * gy:
            continue
        lanes = cy * gz
        if lanes < 128:
            continue
        ch_stride = -(-(cy + 2 * wy + 2) * gz // 128) * 128
        fr_stride = -(-(cy + 2 * wy) * gz // 128) * 128
        # output blocks get supports()'s x2 double-buffer factor: configs
        # near the boundary must not pass here and then OOM on chip
        vmem = 4 * C * (n_lay * 8 * ch_stride + ch_stride
                        + 2 * 3 * (-(-lanes // 128) * 128
                                   + n_lay * fr_stride))
        if vmem > 12 * 1024 * 1024:
            continue
        pad = (-(-lanes // 128) * 128) / lanes
        # least lane padding first; then keep the pair tile <= 512 lanes
        # (slot-loop live set ~ a dozen (C, lanes) values — big tiles
        # pressure VMEM well beyond the explicit slabs); then larger cy
        # (smaller halo-DMA fraction, fewer programs)
        key = (pad, lanes > 512, -cy)
        if best is None or key < best[0]:
            best = (key, cy)
    return None if best is None else best[1]


def pair_forces_pallas_chunked(params, positions, box_diag, cellsort, cfg,
                               method, cy, alpha=0.0, krf=0.0, crf=0.0,
                               coulomb_scale=None, interpret=False,
                               excl_skip=True):
    """forces (N, 3) — the half-stencil Pallas sweep with a 2D program
    grid (x-layer, y-chunk).

    Same physics as pair_forces_pallas (pinned against the XLA sweep by
    tests/test_pallas_sweep.py); the layout differs:

      * XLA pre-work lays each field out per (x-layer, y-chunk): the
        chunk's cy y-rows plus wy halo rows AND one guard row on each
        side (so every statically-offset b-view slice stays in bounds;
        guard lanes are mask-discarded), flattened to a 128-padded
        chunk_stride.  DMA offsets are then (layer*n_chunk + chunk) *
        chunk_stride — always lane-tile aligned, Mosaic's hard rule.
      * In-chunk b-views are static slices at (wy+1+oy)*gz + oz with the
        same +-pz z-wrap variant masks as the full-layer kernel; the
        y wrap is materialized in the halo rows by the pre-work, so no
        doubled-layer modulus is needed.
      * Newton reactions accumulate in the a-frame and are inverse-
        embedded into a (cy+2wy)-row b-frame block per (program, layer);
        XLA overlap-adds core/halo-lo/halo-hi across chunks (y) and
        layers (x) afterwards.
    """
    from ..forces import cellpair as cp

    n = positions.shape[0]
    gx, gy, gz = cfg.grid
    C = cfg.capacity
    W = cfg.excl_window
    dtype = positions.dtype
    # a non-divisor cy would silently drop the last gy % cy rows of cells
    # (n_chunk = gy // cy below); user overrides via nb_kwargs
    # {"pallas_chunk": cy} arrive unvalidated, so fail loudly here
    if gy % cy:
        raise ValueError(f"pallas_chunk cy={cy} must divide the cell "
                         f"grid's y dimension gy={gy}")
    if cy * gz < 128 and not interpret:
        raise ValueError(f"pallas_chunk cy={cy}: pair tile needs "
                         f"cy*gz >= 128 lanes (gz={gz}); Mosaic rejects "
                         "narrower dynamic-sublane loads")
    if coulomb_scale is None:
        from ..units import ONE_4PI_EPS0 as coulomb_scale
    pair_g = _make_pair_g(method, cfg.cutoff, alpha=alpha, krf=krf, crf=crf)

    offsets = np.array(cfg.offsets, np.int32)
    n_off = len(offsets)
    wx = int(np.max(np.abs(offsets[:, 0])))
    wy = int(np.max(np.abs(offsets[:, 1])))
    n_lay = 2 * wx + 1
    n_chunk = gy // cy
    R_s = cy + 2 * wy + 2                   # slab rows incl. guard rows
    ch_lanes = R_s * gz
    ch_stride = -(-ch_lanes // 128) * 128
    own_lanes = cy * gz                     # the pair tile's lane count
    fr_rows = cy + 2 * wy                   # reaction b-frame rows
    fr_lanes = fr_rows * gz
    fr_stride = -(-fr_lanes // 128) * 128
    n_cells = cfg.n_cells
    pz = cfg.z_period or gz
    px = cfg.x_period or gx

    # ---- XLA pre-work: sorted fields in (layer, chunk) slab layout ------
    s = cp._sorted_arrays(params, positions, cellsort, cfg, n,
                          box_diag=box_diag)
    blocks = {k: v.reshape(n_cells, C) for k, v in s.items()}
    c3 = cp._local_c3(cfg) + 0.5
    centers_d, hvec = _centers_and_hvec(cfg, box_diag, c3, dtype)
    row_starts = [((j * cy - wy - 1) % gy) for j in range(n_chunk)]

    def chunked(ft):
        # (C, n_cells) -> (C, gx*n_chunk*ch_stride); triple row copy so
        # start + R_s stays in bounds even when cy + 2wy + 2 > gy + 1
        v = ft.reshape(C, gx, gy, gz)
        v2 = jnp.concatenate([v, v, v], axis=2)
        sl = jnp.stack([v2[:, :, s0:s0 + R_s, :] for s0 in row_starts],
                       axis=2).reshape(C, gx, n_chunk, ch_lanes)
        if ch_stride > ch_lanes:
            sl = jnp.pad(sl, ((0, 0), (0, 0), (0, 0),
                              (0, ch_stride - ch_lanes)))
        return sl.reshape(C, gx * n_chunk * ch_stride)

    fields = []
    for d, k in enumerate("xyz"):
        fields.append(chunked((blocks[k] - centers_d[d][:, None]).T))
    fields.append(chunked(blocks["q"].T))
    fields.append(chunked(blocks["sig"].T))
    fields.append(chunked(jnp.sqrt(blocks["eps"]).T))
    fields.append(chunked(blocks["gid"].T))
    fields.append(chunked(blocks["ew0"].T) if W > 0
                  else jnp.zeros_like(fields[-1]))

    off_needs_excl = (np.max(np.abs(offsets), axis=1) <= 1
                      if excl_skip else np.ones(n_off, bool))
    _lx = np.arange(gx)
    lay_idx = ((_lx[:, None] // px) * px
               + (_lx[:, None] % px + np.arange(-wx, wx + 1)[None]) % px
               ).astype(np.int32)                            # (gx, n_lay)
    cutoff2 = cfg.cutoff * cfg.cutoff

    # per-(layer, chunk) slot-loop bounds over the chunk's b rows (+halo)
    occ = jnp.sum((cellsort.slot_atom < n).reshape(n_cells, C),
                  axis=1).reshape(gx, gy, gz)
    row_max = jnp.max(occ, axis=2)                           # (gx, gy)
    rm2 = jnp.concatenate([row_max, row_max, row_max], axis=1)
    lmax2 = jnp.stack(
        [jnp.max(jax.lax.dynamic_slice_in_dim(
            rm2, (j * cy - wy) % gy, fr_rows, axis=1), axis=1)
         for j in range(n_chunk)], axis=1).astype(jnp.int32)  # (gx, n_chunk)

    own0 = (wy + 1) * gz
    PF = (2 * wy + 2) * gz                   # inverse-embed front pad
    PB = (3 * wy + 3) * gz                   # inverse-embed back pad

    def kernel(lay_ref, lmax_ref, hvec_ref,
               x_ref, y_ref, z_ref, q_ref, sig_ref, seps_ref, gid_ref,
               ew_ref,
               fown_ref, freact_ref,
               xs, ys, zs, qs, sigs, sepss, gids, ews, sem):
        i = pl.program_id(0)
        j = pl.program_id(1)

        copies = []
        for field_ref, slab_ in ((x_ref, xs), (y_ref, ys), (z_ref, zs),
                                 (q_ref, qs), (sig_ref, sigs),
                                 (seps_ref, sepss), (gid_ref, gids)):
            for li in range(n_lay):
                src = lay_ref[i, li] * n_chunk + j
                copies.append(pltpu.make_async_copy(
                    field_ref.at[:, pl.ds(src * ch_stride, ch_stride)],
                    slab_.at[:, pl.ds(li * ch_stride, ch_stride)],
                    sem))
        copies.append(pltpu.make_async_copy(
            ew_ref.at[:, pl.ds((lay_ref[i, wx] * n_chunk + j) * ch_stride,
                               ch_stride)],
            ews.at[:, :], sem))
        for cp_ in copies:
            cp_.start()
        for cp_ in copies:
            cp_.wait()

        a0 = wx * ch_stride + own0
        xa = xs[:, pl.ds(a0, own_lanes)]
        ya = ys[:, pl.ds(a0, own_lanes)]
        za = zs[:, pl.ds(a0, own_lanes)]
        qa = coulomb_scale * qs[:, pl.ds(a0, own_lanes)]
        siga = sigs[:, pl.ds(a0, own_lanes)]
        sepsa = sepss[:, pl.ds(a0, own_lanes)]
        gida = gids[:, pl.ds(a0, own_lanes)]
        ewa = ews[:, pl.ds(own0, own_lanes)]

        # z-local lane index within the wrap period (gz % pz == 0)
        cz_lane = jax.lax.broadcasted_iota(jnp.int32, (1, own_lanes), 1) % pz
        czm = jax.lax.broadcasted_iota(jnp.int32, (1, fr_lanes), 1) % pz
        col = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)

        hx = hvec_ref[0]
        hy = hvec_ref[1]
        hz = hvec_ref[2]
        hbx = hvec_ref[3]   # triclinic tilts (0 for orthorhombic)
        hcx = hvec_ref[4]
        hcy = hvec_ref[5]

        freact_ref[0, 0, :, :] = jnp.zeros((3 * C, n_lay * fr_stride), dtype)

        # ---- self block -------------------------------------------------
        rows = jax.lax.broadcasted_iota(jnp.int32, (C, own_lanes), 0)

        def self_body(bj, acc):
            fx, fy, fz = acc
            dx = xa - xs[pl.ds(bj, 1), pl.ds(a0, own_lanes)]
            dy = ya - ys[pl.ds(bj, 1), pl.ds(a0, own_lanes)]
            dz = za - zs[pl.ds(bj, 1), pl.ds(a0, own_lanes)]
            r2 = dx * dx + dy * dy + dz * dz
            valid = (r2 < cutoff2) & (rows != bj)
            dg = gids[pl.ds(bj, 1), pl.ds(a0, own_lanes)] - gida
            in_win = jnp.abs(dg) <= W
            bit = jnp.where(in_win, dg + W, 0)
            excl = in_win & (((ewa >> bit) & 1) == 1)
            r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            inv_r2 = inv_r * inv_r
            qq = qa * qs[pl.ds(bj, 1), pl.ds(a0, own_lanes)]
            sig = 0.5 * (siga + sigs[pl.ds(bj, 1), pl.ds(a0, own_lanes)])
            eps = sepsa * sepss[pl.ds(bj, 1), pl.ds(a0, own_lanes)]
            g = pair_g(qq, sig, eps, r2s, inv_r, inv_r2)
            g2 = jnp.where(valid & ~excl, -2.0 * g, 0.0)
            return (jnp.asarray(fx + g2 * dx, dtype),
                    jnp.asarray(fy + g2 * dy, dtype),
                    jnp.asarray(fz + g2 * dz, dtype))

        zero = jnp.zeros((C, own_lanes), dtype)
        fx, fy, fz = jax.lax.fori_loop(0, lmax_ref[lay_ref[i, wx], j],
                                       self_body, (zero, zero, zero))

        # ---- stencil offsets (statically unrolled) ----------------------
        react_layers = {}
        for oi in range(1, n_off):
            ox, oy, oz = (int(offsets[oi, 0]), int(offsets[oi, 1]),
                          int(offsets[oi, 2]))
            # minimum-image shift between cells o apart = (o/g) @ box:
            # exact across wraps (a full lattice vector IS the image
            # correction), so one static linear combination per offset
            # serves orthorhombic and triclinic alike
            tx = ox * hx + oy * hbx + oz * hcx
            ty = oy * hy + oz * hcy
            tz = oz * hz
            lcol = (ox + wx) * ch_stride
            # forward view: b rows sit oy slab rows up at z + oz, with the
            # same sign-excluded +-pz z-wrap variants as the plain kernel
            bv0 = (wy + 1 + oy) * gz + oz
            mz_hi = (cz_lane + oz) >= pz
            mz_lo = (cz_lane + oz) < 0

            def bview(slab_, bj):
                vA = slab_[pl.ds(bj, 1), pl.ds(lcol + bv0, own_lanes)]
                if oz == 0:
                    return vA
                if oz > 0:
                    vB = slab_[pl.ds(bj, 1),
                               pl.ds(lcol + bv0 - pz, own_lanes)]
                    return jnp.where(mz_hi, vB, vA)
                vC = slab_[pl.ds(bj, 1), pl.ds(lcol + bv0 + pz, own_lanes)]
                return jnp.where(mz_lo, vC, vA)

            needs_excl = bool(off_needs_excl[oi])

            def slot_body(bj, acc2):
                fx, fy, fz, rxa, rya, rza = acc2
                dx = xa - (bview(xs, bj) + tx)
                dy = ya - (bview(ys, bj) + ty)
                dz = za - (bview(zs, bj) + tz)
                r2 = dx * dx + dy * dy + dz * dz
                valid = r2 < cutoff2
                if needs_excl:
                    dg = bview(gids, bj) - gida
                    in_win = jnp.abs(dg) <= W
                    bit = jnp.where(in_win, dg + W, 0)
                    excl = in_win & (((ewa >> bit) & 1) == 1)
                    keep = valid & ~excl
                else:
                    keep = valid
                r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
                inv_r = jax.lax.rsqrt(r2s)
                inv_r2 = inv_r * inv_r
                qq = qa * bview(qs, bj)
                sig = 0.5 * (siga + bview(sigs, bj))
                eps = sepsa * bview(sepss, bj)
                g = pair_g(qq, sig, eps, r2s, inv_r, inv_r2)
                g2 = jnp.where(keep, -2.0 * g, 0.0)
                onehot = (col == bj).astype(dtype)
                rx = -jnp.sum(g2 * dx, axis=0, keepdims=True)
                ry = -jnp.sum(g2 * dy, axis=0, keepdims=True)
                rz = -jnp.sum(g2 * dz, axis=0, keepdims=True)
                return (jnp.asarray(fx + g2 * dx, dtype),
                        jnp.asarray(fy + g2 * dy, dtype),
                        jnp.asarray(fz + g2 * dz, dtype),
                        jnp.asarray(rxa + onehot * rx, dtype),
                        jnp.asarray(rya + onehot * ry, dtype),
                        jnp.asarray(rza + onehot * rz, dtype))

            fx, fy, fz, rxa, rya, rza = jax.lax.fori_loop(
                0, lmax_ref[lay_ref[i, ox + wx], j], slot_body,
                (fx, fy, fz, zero, zero, zero))

            # inverse-embed the a-frame reaction into the b-frame block:
            # racc[m] += r[m - s], s = (wy+oy)*gz + oz + delta, via static
            # slices of a zero-padded copy; delta variants are excluded by
            # the sign of oz exactly as in the forward view
            sA = (wy + oy) * gz + oz
            pzero_f = jnp.zeros((C, PF), dtype)
            pzero_b = jnp.zeros((C, PB), dtype)
            shifted = []
            for r in (rxa, rya, rza):
                P = jnp.concatenate([pzero_f, r, pzero_b], axis=1)
                vA = P[:, PF - sA:PF - sA + fr_lanes]
                if oz == 0:
                    shifted.append(vA)
                elif oz > 0:
                    vC = P[:, PF - sA + pz:PF - sA + pz + fr_lanes]
                    shifted.append(jnp.where((czm - oz) < 0, vC, vA))
                else:
                    vB = P[:, PF - sA - pz:PF - sA - pz + fr_lanes]
                    shifted.append(jnp.where((czm - oz) >= pz, vB, vA))
            L = ox + wx
            acc = react_layers.get(L)
            react_layers[L] = (shifted if acc is None else
                               [a + s_ for a, s_ in zip(acc, shifted)])

        for L, acc in react_layers.items():
            for comp in range(3):
                freact_ref[0, 0, pl.ds(comp * C, C),
                           pl.ds(L * fr_stride, fr_lanes)] = jnp.asarray(
                               acc[comp], dtype)

        fown_ref[0, 0, pl.ds(0, C), :] = fx
        fown_ref[0, 0, pl.ds(C, C), :] = fy
        fown_ref[0, 0, pl.ds(2 * C, C), :] = fz

    slab = lambda dt: pltpu.VMEM((C, n_lay * ch_stride), dt)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(gx, n_chunk),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
            out_specs=[
                pl.BlockSpec((1, 1, 3 * C, own_lanes),
                             lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 3 * C, n_lay * fr_stride),
                             lambda i, j, *_: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                slab(dtype), slab(dtype), slab(dtype), slab(dtype),
                slab(dtype), slab(dtype), slab(jnp.int32),
                pltpu.VMEM((C, ch_stride), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((gx, n_chunk, 3 * C, own_lanes), dtype),
            jax.ShapeDtypeStruct((gx, n_chunk, 3 * C, n_lay * fr_stride),
                                 dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(lay_idx), lmax2, hvec, *fields)

    fown, freact = out
    # own forces: (gx, n_chunk, 3, C, cy, gz) -> (gx, 3, C, gy, gz)
    total = jnp.transpose(
        fown.reshape(gx, n_chunk, 3, C, cy, gz),
        (0, 2, 3, 1, 4, 5)).reshape(gx, 3, C, gy, gz)
    fr = freact.reshape(gx, n_chunk, 3, C, n_lay,
                        fr_stride)[..., :fr_lanes].reshape(
                            gx, n_chunk, 3, C, n_lay, fr_rows, gz)
    n_band = gx // px

    def roll_x(v, sh):
        # (gx, 3, C, gy, gz), x-layer roll within each x band
        if n_band > 1:
            return jnp.roll(v.reshape(n_band, px, 3, C, gy, gz), sh,
                            axis=1).reshape(gx, 3, C, gy, gz)
        return jnp.roll(v, sh, axis=0)

    # fold each reaction block's fr_rows rows back onto the chunks: slab
    # row rr holds global row j*cy + (rr - wy), i.e. chunk j + s at row
    # (rr - wy) mod cy with s = floor((rr - wy)/cy) — group rows by s and
    # roll the chunk axis (handles cy < wy: halos spanning several chunks)
    import math as _math
    for L in range(n_lay):
        v = fr[:, :, :, :, L]                # (gx, n_chunk, 3, C, fr_rows, gz)
        b2 = None
        for s_ in range(_math.floor(-wy / cy),
                        _math.floor((cy + wy - 1) / cy) + 1):
            lo_d = max(s_ * cy, -wy)
            hi_d = min((s_ + 1) * cy, cy + wy)
            if lo_d >= hi_d:
                continue
            rows_v = v[:, :, :, :, lo_d + wy:hi_d + wy, :]
            pos0 = lo_d - s_ * cy
            blk = jnp.pad(rows_v,
                          ((0, 0), (0, 0), (0, 0), (0, 0),
                           (pos0, cy - pos0 - (hi_d - lo_d)), (0, 0)))
            blk = jnp.roll(blk, s_, axis=1) if s_ else blk
            b2 = blk if b2 is None else b2 + blk
        b2 = jnp.transpose(b2, (0, 2, 3, 1, 4, 5)).reshape(gx, 3, C, gy, gz)
        total = total + roll_x(b2, L - wx)

    f = jnp.transpose(total.reshape(gx, 3, C, gy * gz),
                      (1, 0, 3, 2)).reshape(3, n_cells * C)
    f_slots = jnp.stack([f[0], f[1], f[2]], axis=1)
    return f_slots[cellsort.inv_slot]
