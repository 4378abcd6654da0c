#!/usr/bin/env python
"""On-chip numerical parity of the Pallas force-only sweep vs the XLA
half-stencil sweep (the interpret-mode test runs on CPU; this one runs the
real Mosaic kernel).  Run on the TPU:

    python scripts/check_pallas_tpu.py [--atoms 20000]
"""

import argparse
import os
import sys

import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from openmm_drudenose_tpu.utils import compile_cache
# env var is ignored (axon sitecustomize imports jax first);
# probe entries go to /tmp, not the committed repo cache
compile_cache.enable("/tmp/jaxcache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--atoms", type=int, default=50000)
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--split", action="store_true",
                    help="compare the kernel's raw fown/freact outputs "
                         "against an XLA block_eg reconstruction")
    args = ap.parse_args()

    import openmm_drudenose_tpu as dn
    from openmm_drudenose_tpu.forces import cellpair as cp
    from openmm_drudenose_tpu.io import builders
    from openmm_drudenose_tpu.ops import pallas_sweep

    system, positions = builders.build_water_box(args.atoms // 5)
    integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
    integ.setMaxDrudeDistance(0.02)
    ctx = dn.Context(system, integ, precision="single", strategy="cellpair")
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, seed=0)
    ctx._ensure_forces()
    # a few dynamics steps so positions have drifted off the rebuild
    integ.step(5)

    nb_fn, nb_params = next(t for t in ctx._terms
                            if hasattr(t[0], "cellpair_cfg"))
    cfg = nb_fn.cellpair_cfg
    assert pallas_sweep.supports(cfg, jnp.float32), "config unsupported"
    st = ctx._state
    box_diag = jnp.diagonal(st.box)
    pme = nb_fn.pme_setup

    if args.split:
        _split_compare(ctx, nb_fn, nb_params, cfg, pme, st, box_diag,
                       pallas_sweep, cp)
        return

    f_pal = jax.jit(lambda p: pallas_sweep.pair_forces_pallas(
        nb_params, p, box_diag, st.neighbors, cfg, "ewald",
        alpha=pme.alpha))(st.positions)
    _, f_xla = jax.jit(lambda p: cp.pair_energy_forces(
        nb_params, p, box_diag, st.neighbors, cfg, nb_fn.pair_eg,
        nb_fn.coulomb_scale, with_energy=False))(st.positions)
    f_pal, f_xla = np.asarray(f_pal), np.asarray(f_xla)
    scale = np.abs(f_xla).max()
    err = np.abs(f_pal - f_xla).max() / scale
    print(f"atoms={ctx._static.n_atoms} grid={cfg.grid} C={cfg.capacity} "
          f"max|F|={scale:.1f} rel err={err:.3e}")
    if args.debug:
        gx, gy, gz = cfg.grid
        C = cfg.capacity
        perr = np.abs(f_pal - f_xla).max(axis=1) / scale
        bad = perr > 1e-4
        slots = np.asarray(st.neighbors.inv_slot)
        cell = slots // C
        sic = slots % C
        cx = cell // (gy * gz)
        cy = (cell // gz) % gy
        cz = cell % gz
        print(f"bad atoms: {bad.sum()} / {len(bad)}")
        for name, v, nbins in (("cx", cx, gx), ("cy", cy, gy),
                               ("cz", cz, gz), ("slot", sic, C)):
            h = np.bincount(v[bad], minlength=nbins)
            ha = np.bincount(v, minlength=nbins)
            frac = h / np.maximum(ha, 1)
            print(f"  by {name}: " + " ".join(f"{x:.2f}" for x in frac))
    # both paths sit at the common f32 noise floor vs CPU f64 (max rel
    # ~3.4e-4 from one cancellation-heavy atom, rms ~3.4e-6); the bf16
    # matmul-precision bug this script caught measured 0.17 here
    assert err < 1e-3, f"Pallas/XLA force mismatch {err}"
    print("PASS: Pallas sweep matches the XLA sweep on chip")




def _split_compare(ctx, nb_fn, nb_params, cfg, pme, st, box_diag,
                   pallas_sweep, cp):
    """Compare the kernel's raw (fown, freact) against an XLA
    reconstruction built from cellpair.make_block_eg on the same sorted
    blocks — localizes an on-chip mismatch to the row side, the reaction
    side, or a specific stencil layer."""
    gx, gy, gz = cfg.grid
    C = cfg.capacity
    w = cfg.window[0]
    n_lay = 2 * w + 1
    n_yz = gy * gz
    n_cells = cfg.n_cells

    fown, freact = jax.jit(lambda p: pallas_sweep.pair_forces_pallas(
        nb_params, p, box_diag, st.neighbors, cfg, "ewald",
        alpha=pme.alpha, debug_outputs=True))(st.positions)
    fown = np.asarray(fown).reshape(gx, 3, C, n_yz)
    fr_stride = -(-n_yz // 128) * 128
    freact = np.asarray(freact).reshape(gx, 3, C, n_lay, fr_stride)[
        ..., :n_yz]

    # XLA reconstruction on the same device/precision
    def ref_parts(p):
        s = cp._sorted_arrays(nb_params, p, st.neighbors, cfg,
                              ctx._static.n_atoms, box_diag=box_diag)
        blocks = {k: v.reshape(n_cells, C) for k, v in s.items()}
        block_eg = cp.make_block_eg(blocks, box_diag, cfg, nb_fn.pair_eg,
                                    nb_fn.coulomb_scale)
        nbr_flat, nbr_shape = cfg.nbr_map
        nbr = jnp.asarray(np.array(nbr_flat, np.int32).reshape(nbr_shape))
        rows, cols = [], []
        for o in range(cfg.n_offsets):
            e, g2, d = block_eg(nbr[:, o], self_block=(o == 0))
            rows.append(jnp.stack(
                [jnp.sum(g2 * dc, axis=2) for dc in d]))       # (3, nc, C)
            cols.append(jnp.stack(
                [-jnp.sum(g2 * dc, axis=1) for dc in d]))
        return jnp.stack(rows), jnp.stack(cols)   # (n_off, 3, nc, C)

    rows, cols = jax.jit(ref_parts)(st.positions)
    rows, cols = np.asarray(rows), np.asarray(cols)

    fown_ref = rows.sum(axis=0)                    # (3, nc, C)
    fown_ref = fown_ref.reshape(3, gx, n_yz, C).transpose(1, 0, 3, 2)
    d_own = np.abs(fown - fown_ref).max()
    print(f"fown  max diff: {d_own:.3e}  (scale {np.abs(fown_ref).max():.1f})")

    # reactions: offset o deposits cols[o] at cells nbr[:, o]; the
    # kernel's freact layer L (per program i) holds reactions destined for
    # absolute layer (i + L - w) mod gx -- rebuild the same per-layer split
    nbr_flat, nbr_shape = cfg.nbr_map
    nbr = np.array(nbr_flat, np.int32).reshape(nbr_shape)
    offsets = np.array(cfg.offsets)
    react_ref = np.zeros((gx, 3, C, n_lay, n_yz), np.float64)
    for o in range(1, cfg.n_offsets):
        ox = offsets[o, 0]
        L = ox + w
        b = nbr[:, o]                              # (nc,) destination cell
        src_layer = np.arange(n_cells) // n_yz     # program i of the row
        dest_lane = b % n_yz
        np.add.at(react_ref,
                  (src_layer, slice(None), slice(None), L, dest_lane),
                  cols[o].transpose(1, 0, 2))
    d_react = np.abs(freact - react_ref).max()
    print(f"freact max diff: {d_react:.3e}  "
          f"(scale {np.abs(react_ref).max():.1f})")
    per_layer = np.abs(freact - react_ref).reshape(-1, n_lay, n_yz).max(
        axis=(0, 2))
    print("freact per-layer max diff:", per_layer)

    # end-to-end: postpass on the kernel's own raw outputs vs (a) the
    # kernel's full output and (b) the XLA sweep total
    total = fown.copy()
    for L in range(n_lay):
        total = total + np.roll(freact[:, :, :, L, :], L - w, axis=0)
    f = total.transpose(1, 0, 3, 2).reshape(3, n_cells * C)
    f_slots = np.stack([f[0], f[1], f[2]], axis=1)
    inv_slot = np.asarray(st.neighbors.inv_slot)
    f_rebuild = f_slots[inv_slot]

    f_pal = np.asarray(jax.jit(lambda p: pallas_sweep.pair_forces_pallas(
        nb_params, p, box_diag, st.neighbors, cfg, "ewald",
        alpha=pme.alpha))(st.positions))
    _, f_xla = jax.jit(lambda p: cp.pair_energy_forces(
        nb_params, p, box_diag, st.neighbors, cfg, nb_fn.pair_eg,
        nb_fn.coulomb_scale, with_energy=False))(st.positions)
    f_xla = np.asarray(f_xla)

    total_ref = fown_ref.copy()
    for L in range(n_lay):
        total_ref = total_ref + np.roll(react_ref[:, :, :, L, :], L - w,
                                        axis=0)
    fr_ = total_ref.transpose(1, 0, 3, 2).reshape(3, n_cells * C)
    f_ref = np.stack([fr_[0], fr_[1], fr_[2]], axis=1)[inv_slot]

    scale = np.abs(f_xla).max()
    print("rebuild(pallas raw) vs pallas full :",
          np.abs(f_rebuild - f_pal).max() / scale)
    print("rebuild(pallas raw) vs XLA total   :",
          np.abs(f_rebuild - f_xla).max() / scale)
    print("rebuild(blockeg ref) vs XLA total  :",
          np.abs(f_ref - f_xla).max() / scale)


if __name__ == "__main__":
    main()
