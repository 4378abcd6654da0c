"""Dense all-pairs nonbonded sweep — the TPU hot path for small systems.

For systems up to a few thousand atoms the cutoff sphere fills most of the
box, so a cell-list sweep tests barely fewer pairs than the full (N, N)
matrix while paying for the cellsort rebuild, the per-offset stencil
machinery, and badly padded small-grid tiles (a 4k-atom water box has
n_yz = 25 lanes against the 128-lane TPU tile).  This module computes the
direct-space sum as a row-block scan over the FULL ordered pair matrix:

  * each ordered pair (i, j) is evaluated in row i's block, so row forces
    are complete after one row reduction — no Newton-reaction transposes,
    no scatters, no neighbor structure, and `Context.step` collapses to a
    single scanned device program with zero host-side rebuild dispatches
  * tiles are (block_rows, N): lane-dim N is within 3% of the 128 multiple
    at typical sizes, vs the ~30% + occupancy waste of small-grid cells
  * exclusions are a static (N, N) bool mask sliced per row block
  * forces are analytic in the same pass (custom_vjp, like
    forces/cellpair.py), with a force-only variant whose energy chain is
    dead-code-eliminated by XLA

The reference delegates small systems to the same CUDA neighbor machinery
as large ones (its example is a 2.5k-atom NaCl box, example/nacl_tg.py);
vmapped over a replica ensemble this path is the BASELINE config-5
workhorse.  Pair math is shared with the cell sweep via
cellpair.make_pair_eg (A&S erfc in f32, Abramowitz-Stegun 7.1.26).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pair_energy_forces(params, positions, box_diag, pair_eg, coulomb_scale,
                       pair_mask, cutoff: float, periodic: bool,
                       use_cutoff: bool, block_rows: int = 512,
                       with_energy: bool = True):
    """Direct-space (energy, forces) over the full ordered pair matrix.

    pair_mask: static (N, N) bool, False where the pair is skipped
    (diagonal + exclusions).  Each unordered pair is evaluated twice (once
    per ordering) — energy is halved, and row forces need no reaction
    credit; at dense-path sizes the doubled pair chain is cheaper than any
    transpose machinery.
    """
    n = positions.shape[0]
    dtype = positions.dtype
    B = max(1, min(block_rows, n))
    nb = -(-n // B)
    n_pad = nb * B
    cutoff2 = cutoff * cutoff

    pt = positions.T                                     # (3, N)
    q = params["charge"]
    sig = params["sigma"]
    seps = jnp.sqrt(params["eps"])
    qa = coulomb_scale * q

    def pad(x, fill=0.0):
        if n_pad == n:
            return x
        return jnp.concatenate(
            [x, jnp.full((n_pad - n,), fill, x.dtype)])

    rpt = jnp.concatenate(
        [pt, jnp.zeros((3, n_pad - n), dtype)], axis=1) if n_pad > n else pt
    rqa, rsig, rseps = pad(qa), pad(sig, 1.0), pad(seps)
    mask = pair_mask
    if n_pad > n:
        mask = jnp.concatenate(
            [mask, jnp.zeros((n_pad - n, n), bool)], axis=0)

    excl_false = jnp.zeros((), bool)

    def body(e_acc, i):
        o = i * B
        d = []
        for c in range(3):
            rowc = jax.lax.dynamic_slice(rpt[c], (o,), (B,))
            dc = rowc[:, None] - pt[c][None, :]
            if periodic and jnp.ndim(box_diag) == 1:
                bc = box_diag[c]
                dc = dc - bc * jnp.round(dc / bc)
            d.append(dc)
        if periodic and jnp.ndim(box_diag) == 2:
            # triclinic reduced box: sequential c -> b -> a rounding
            # (forces/boxutils.min_image_t on the (3, B, N) stack)
            from .boxutils import min_image_t
            d = list(min_image_t(jnp.stack(d), box_diag))
        r2 = jnp.zeros((), dtype)
        for dc in d:
            r2 = r2 + dc * dc
        valid = jax.lax.dynamic_slice(mask, (o, 0), (B, n))
        if use_cutoff:
            valid = valid & (r2 < cutoff2)
        # clamp large enough that LJ x6^2 cannot overflow f32 (see
        # cellpair.make_block_eg); clamped pairs are masked or exploded
        r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        qq = (jax.lax.dynamic_slice(rqa, (o,), (B,))[:, None] * q[None, :])
        sg = 0.5 * (jax.lax.dynamic_slice(rsig, (o,), (B,))[:, None]
                    + sig[None, :])
        ep = (jax.lax.dynamic_slice(rseps, (o,), (B,))[:, None]
              * seps[None, :])
        e, g = pair_eg(qq, sg, ep, r2s, inv_r, inv_r2, excl_false)
        g2 = jnp.where(valid, -2.0 * g, 0.0)
        if with_energy:
            e_acc = e_acc + 0.5 * jnp.sum(jnp.where(valid, e, 0.0))
        fb = jnp.stack([jnp.sum(g2 * dc, axis=1) for dc in d])  # (3, B)
        return e_acc, fb

    e_total, fbs = jax.lax.scan(body, jnp.zeros((), dtype),
                                jnp.arange(nb))
    forces = jnp.moveaxis(fbs, 0, 1).reshape(3, n_pad)[:, :n].T
    return e_total, forces


def make_custom_energy(pair_eg, coulomb_scale, pair_mask, cutoff: float,
                       periodic: bool, use_cutoff: bool,
                       block_rows: int = 512):
    """energy(params, positions, box_diag) whose VJP returns the
    analytically computed forces (dE/dpositions = -forces), mirroring
    cellpair.make_custom_energy."""

    def efwd(params, positions, box_diag, with_energy=True):
        return pair_energy_forces(
            params, positions, box_diag, pair_eg, coulomb_scale, pair_mask,
            cutoff, periodic, use_cutoff, block_rows=block_rows,
            with_energy=with_energy)

    @jax.custom_vjp
    def energy(params, positions, box_diag):
        e, _ = efwd(params, positions, box_diag)
        return e

    def fwd(params, positions, box_diag):
        e, f = efwd(params, positions, box_diag)
        return e, (f, params, box_diag)

    def bwd(res, g):
        from .cellpair import _zero_cotangent
        f, params, box_diag = res
        return (jax.tree.map(_zero_cotangent, params), g * (-f),
                jax.tree.map(_zero_cotangent, box_diag))

    energy.defvjp(fwd, bwd)

    def forces(params, positions, box_diag):
        _, f = efwd(params, positions, box_diag, with_energy=False)
        return f

    return energy, forces
