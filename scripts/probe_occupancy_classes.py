import numpy as np, os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import openmm_drudenose_tpu as dn
from openmm_drudenose_tpu.io import builders

snap = np.load("/root/repo/data/bench_equil_100k.npz")
system, positions = builders.build_water_box(20000)
integ = dn.DrudeTGNHIntegrator(300.0, 0.1, 1.0, 0.1, 0.001, 20, 1)
integ.setMaxDrudeDistance(0.02)
nb = {"capacity": int(snap["capacity"])} if "capacity" in snap else None
ctx = dn.Context(system, integ, precision="single", strategy="cellpair", nb_options=nb)
ctx.setPositions(np.asarray(snap["positions"], np.float64))
ctx._ensure_neighbors()
cfg = ctx._cp_cfg
cs = ctx._state.neighbors
n = ctx._static.n_atoms
gx, gy, gz = cfg.grid
C = cfg.capacity
n_yz = gy*gz
occ = np.sum((np.asarray(cs.slot_atom) < n).reshape(-1, C), axis=1).reshape(gx, n_yz)
lay_max = occ.max(axis=1)
print("grid", cfg.grid, "capacity", C, "mean occ", occ.mean().round(2))
print("per-layer max: min/median/max", lay_max.min(), int(np.median(lay_max)), lay_max.max())
print("lay_max histogram:", np.bincount(lay_max)[lay_max.min():])
# per-cell occupancy distribution
oc = occ.reshape(-1)
print("cell occ percentiles 50/90/95/99/max:", *np.percentile(oc, [50,90,95,99]).round(1), oc.max())
# chunked variant: per (layer, y-chunk) maxima, chunk = gz cells (one y row) and 3*gz
for chunk in (gz, 3*gz, 5*gz):
    m = occ.reshape(gx, n_yz//chunk, chunk).max(axis=2).reshape(-1)
    print(f"per-(layer,{chunk}-cell chunk) max: median {int(np.median(m))}, "
          f"frac<=40 {np.mean(m<=40):.2f}, frac<=36 {np.mean(m<=36):.2f}, frac<=32 {np.mean(m<=32):.2f}")
