"""Pallas TPU kernel for the cell-pair block sweep.

Each program owns a row-block of 8 cells (Mosaic's sublane granularity).
For each owned cell the stencil is processed in chunks of offsets: a
fori_loop DMA-gathers the chunk's neighbor-cell rows into a contiguous
(1, OFFC*C) VMEM strip, then one fused (C, OFFC*C) tile computes pair
energies and own-row forces — full 128-lane utilization, zero HBM
intermediates, E and F in a single pass (plugged into
forces/cellpair.make_custom_energy as `impl`).  Chunking keeps the live
tile set inside the scoped-VMEM budget.

Full (+/-) stencil, 0.5x energy, row forces only.  Select via nonbonded
nb_kwargs {"use_pallas": True} or env OPENMM_DRUDENOSE_PALLAS=1; the XLA
sweep (forces/cellpair.py) is the default.
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

CELLS_PER_PROGRAM = 8


def _slot_width(C: int) -> int:
    # each stencil slot is lane-aligned: Mosaic requires strip stores at
    # indices provably divisible by 128
    return -(-C // 128) * 128


def _offsets_per_chunk(C: int) -> int:
    # keep each compute tile around (C, ~1536) so ~12 live f32 tiles stay
    # well under the scoped VMEM budget
    return max(1536 // _slot_width(C), 4)


def _kernel(n_off, C, offc, slot, cutoff2, W, n_words, pair_eg,
            coulomb_scale,
            # refs
            nbr_ref, box_ref, x_ref, y_ref, z_ref, q_ref, sig_ref, eps_ref,
            gid_ref, ew_ref,
            e_out, fx_out, fy_out, fz_out,
            xs, ys, zs, qs, sigs, epss, gids, ews):
    i = pl.program_id(0)
    bx = box_ref[0, 0]
    by = box_ref[0, 1]
    bz = box_ref[0, 2]
    n_chunks = -(-n_off // offc)
    dtype = xs.dtype

    def mi(d, L):
        return d - L * jnp.round(d / L)

    for c_loc in range(CELLS_PER_PROGRAM):
        row = i * CELLS_PER_PROGRAM + c_loc
        xa = x_ref[row, :].reshape(C, 1)
        ya = y_ref[row, :].reshape(C, 1)
        za = z_ref[row, :].reshape(C, 1)
        gid_a = gid_ref[row, :].reshape(C, 1)
        qa = coulomb_scale * q_ref[row, :].reshape(C, 1)
        siga = sig_ref[row, :].reshape(C, 1)
        epsa = eps_ref[row, :].reshape(C, 1)
        ew_a = [ew_ref[w, row, :].reshape(C, 1) for w in range(n_words)]

        def chunk_body(ch, carry):
            e_acc, fx_acc, fy_acc, fz_acc = carry

            def gather_body(oo, _):
                o = ch * offc + oo
                ok = o < n_off
                b = jnp.where(ok, nbr_ref[c_loc, jnp.minimum(o, n_off - 1)],
                              0)
                base = pl.multiple_of(oo * slot, 128)
                if slot != C:
                    # neutralize the slot gap first (stale scratch would
                    # otherwise poison the masked row sums with NaNs)
                    gap = pl.ds(base, slot)
                    xs[0, gap] = jnp.full((slot,), 1e6, xs.dtype)
                    ys[0, gap] = jnp.full((slot,), 2e6, ys.dtype)
                    zs[0, gap] = jnp.full((slot,), 3e6, zs.dtype)
                    gids[0, gap] = jnp.full((slot,), -1, jnp.int32)
                sl = pl.ds(base, C)
                xs[0, sl] = x_ref[b, :]
                ys[0, sl] = y_ref[b, :]
                zs[0, sl] = z_ref[b, :]
                qs[0, sl] = q_ref[b, :]
                sigs[0, sl] = sig_ref[b, :]
                epss[0, sl] = eps_ref[b, :]
                # sentinel gid row disables padded tail offsets entirely
                gids[0, sl] = jnp.where(ok, gid_ref[b, :],
                                        jnp.full((C,), -1, jnp.int32))
                for w in range(n_words):
                    ews[w, sl] = ew_ref[w, b, :]
                return 0

            jax.lax.fori_loop(0, offc, gather_body, 0)

            dx = mi(xa - xs[0, :].reshape(1, -1), bx)
            dy = mi(ya - ys[0, :].reshape(1, -1), by)
            dz = mi(za - zs[0, :].reshape(1, -1), bz)
            r2 = dx * dx + dy * dy + dz * dz
            gid_b = gids[0, :].reshape(1, -1)
            base_ok = (gid_a >= 0) & (gid_b >= 0) & (gid_a != gid_b)
            if W > 0:
                dg = gid_b - gid_a
                in_win = jnp.abs(dg) <= W
                bit = jnp.where(in_win, dg + W, 0)
                excl = jnp.zeros_like(base_ok)
                for w in range(n_words):
                    hit = ((bit // 31 == w)
                           & (((ew_a[w] >> (bit % 31)) & 1) == 1))
                    excl = excl | hit
                excl = base_ok & in_win & excl
            else:
                excl = jnp.zeros_like(base_ok)
            valid = base_ok & (r2 < cutoff2)
            r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
            inv_r = jax.lax.rsqrt(r2s)
            inv_r2 = inv_r * inv_r
            qq = qa * qs[0, :].reshape(1, -1)
            sig = 0.5 * (siga + sigs[0, :].reshape(1, -1))
            eps = jnp.sqrt(epsa * epss[0, :].reshape(1, -1))
            e, g = pair_eg(qq, sig, eps, r2s, inv_r, inv_r2, excl)
            e = jnp.where(valid, e, 0.0)
            g2 = jnp.where(valid, -2.0 * g, 0.0)
            return (e_acc + 0.5 * jnp.sum(e, axis=1),
                    fx_acc + jnp.sum(g2 * dx, axis=1),
                    fy_acc + jnp.sum(g2 * dy, axis=1),
                    fz_acc + jnp.sum(g2 * dz, axis=1))

        zero = jnp.zeros((C,), dtype)
        e_row, fx_row, fy_row, fz_row = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (zero, zero, zero, zero))
        e_out[c_loc, :] = e_row
        fx_out[c_loc, :] = fx_row
        fy_out[c_loc, :] = fy_row
        fz_out[c_loc, :] = fz_row


def pair_energy_forces_pallas(params, positions, box_diag, cellsort, cfg,
                              pair_eg, coulomb_scale, interpret=False):
    """Drop-in replacement for cellpair.pair_energy_forces (energy, forces),
    full-stencil Pallas sweep."""
    from ..forces import cellpair as cp

    n = positions.shape[0]
    n_cells, C = cfg.n_cells, cfg.capacity
    nbr_flat, nbr_shape = cfg.nbr_map
    if cfg.half_stencil:
        raise ValueError("pallas sweep needs a full-stencil config "
                         "(make_config(..., allow_half=False))")
    nbr_np = np.array(nbr_flat, np.int32).reshape(nbr_shape)
    n_off = nbr_shape[1]
    # pad stencil width to the lane tile and the cell count to the
    # program granularity (padded cells are inert: gid = -1)
    n_off_pad = -(-n_off // 128) * 128
    if n_off_pad != n_off:
        nbr_np = np.pad(nbr_np, ((0, 0), (0, n_off_pad - n_off)))
    ncp = -(-n_cells // CELLS_PER_PROGRAM) * CELLS_PER_PROGRAM
    pad_cells = ncp - n_cells
    if pad_cells:
        nbr_np = np.pad(nbr_np, ((0, pad_cells), (0, 0)))
    nbr_map = jnp.asarray(nbr_np)

    s = cp._sorted_arrays(params, positions, cellsort, cfg, n)
    blk = {k: v.reshape(n_cells, C) for k, v in s.items()}
    if pad_cells:
        for k in list(blk):
            fill = -1 if k == "gid" else 0
            blk[k] = jnp.concatenate(
                [blk[k], jnp.full((pad_cells, C), fill, blk[k].dtype)])
    dtype = positions.dtype
    ew = (jnp.stack([blk[f"ew{w}"] for w in range(cfg.excl_words)], axis=0)
          if cfg.excl_window > 0
          else jnp.zeros((1, ncp, C), jnp.int32))

    offc = _offsets_per_chunk(C)
    slot = _slot_width(C)
    kern = functools.partial(
        _kernel, n_off, C, offc, slot, cfg.cutoff * cfg.cutoff,
        cfg.excl_window, max(cfg.excl_words, 1), pair_eg, coulomb_scale)

    B = CELLS_PER_PROGRAM
    in_specs = ([
        pl.BlockSpec((B, n_off_pad), lambda i: (i, 0),
                     memory_space=pltpu.SMEM),   # this block's stencils
        pl.BlockSpec(memory_space=pltpu.SMEM),   # box (1, 3)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8)
    out_specs = [
        pl.BlockSpec((B, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    strip = offc * slot
    out = pl.pallas_call(
        kern,
        grid=(ncp // B,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        out_shape=[
            jax.ShapeDtypeStruct((ncp, C), dtype),
            jax.ShapeDtypeStruct((ncp, C), dtype),
            jax.ShapeDtypeStruct((ncp, C), dtype),
            jax.ShapeDtypeStruct((ncp, C), dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, strip), dtype),   # xs
            pltpu.VMEM((1, strip), dtype),   # ys
            pltpu.VMEM((1, strip), dtype),   # zs
            pltpu.VMEM((1, strip), dtype),   # qs
            pltpu.VMEM((1, strip), dtype),   # sigs
            pltpu.VMEM((1, strip), dtype),   # epss
            pltpu.VMEM((1, strip), jnp.int32),  # gids
            pltpu.VMEM((max(cfg.excl_words, 1), strip), jnp.int32),  # ews
        ],
    )(nbr_map, box_diag.astype(dtype).reshape(1, 3), blk["x"], blk["y"],
      blk["z"], blk["q"], blk["sig"], blk["eps"], blk["gid"], ew)

    e_cells, fx, fy, fz = out
    f_slots = jnp.stack([fx[:n_cells].reshape(-1), fy[:n_cells].reshape(-1),
                         fz[:n_cells].reshape(-1)], axis=1)
    forces = f_slots[cellsort.inv_slot]
    return jnp.sum(e_cells[:n_cells]), forces
