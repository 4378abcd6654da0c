"""State-resident spatial domain decomposition: each device owns an x-slab
of MOLECULES — dynamic state, cell sort, and all per-molecule tables live
sharded, so per-device memory is O(N / n_dev) and the atom count can exceed
single-device HBM (BASELINE.md scale-out row; the work-sharded engine in
parallel/sharded.py keeps state replicated and covers the smaller-N regime).

The reference is single-GPU (SURVEY.md section 2.8); this layer is a
greenfield TPU design:

  * Molecule-major local layout: each device holds Rc molecule slots of K
    atom slots each (K = the largest molecule), plus one fixed DUMMY
    molecule whose K atoms give padded constraint/vsite/pair rows
    well-conditioned targets.  Every per-atom/per-molecule table derives
    from per-TYPE templates (molecules are typed by their parameters), so
    a migration only moves (type, global-base, positions, velocities).
  * Cell-clamped binning: atoms of an owned molecule bin into the slab's
    own cell planes (their x-cell is clamped to [lo, hi)); pair distances
    always use true coordinates, so clamping only widens the stencil
    reach — the sharded sweep uses an x-window of w+2 planes (+1 clamp,
    +1 margin) and stays exact.  This removes boundary-cell co-ownership:
    no stray-atom merging, no reaction send-back.
  * Per-step communication: ppermute halo of (w+2) sorted boundary planes,
    a psum of the (G+2) per-bath KE vector (the only global reduction the
    TGNH thermostat needs), and the PME grid psum.  The NH chain state is
    replicated and advances identically on every device.
  * Migration at rebuild cadence: molecules whose anchor crossed a slab
    boundary ppermute to the adjacent device (fixed-capacity emigrant
    buffers; a latch flags overflow or a >1-slab jump).

The TGNH step itself is integrators/tgnh.make_step operating on the LOCAL
spec/state with reduce_axis psums — the physics code is shared with the
single-device path, not forked.

Scope (capability-guarded): cellpair strategy, PME or RF, SETTLE + SHAKE
clusters + virtual sites + Drude + exceptions/exclusion corrections +
bonded terms (bonds, angles, torsions) + MC barostat (replicated RNG/box;
the N kT ln V term uses the GLOBAL molecule count) + NBTHOLE when the
explicit pair list is type-complete (re-derived as class-tagged sites +
an all_gather'd dense block — see _analyze_nbthole; a static cross-
molecule pair list cannot follow migrations).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.spec import StaticSpec, SystemSpec
from ..core.state import SimState
from ..forces import cellpair as cp
from ..integrators import tgnh


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map as sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as sm
    try:
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except TypeError:  # pre-rename
        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


# ---------------------------------------------------------------------------
# host-side analysis: molecule types and per-type templates
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ResidentLayout:
    n_dev: int
    axis: str
    K: int            # atom slots per molecule
    Rc: int           # molecule slots per device
    Ec: int           # emigrant molecule capacity per direction
    s_max: int        # settle rows per molecule
    va_max: int
    vo_max: int
    vl_max: int
    lc_k: int
    d_max: int        # drude spring rows per molecule
    sp_max: int       # screened-pair rows
    e_max: int        # exclusion-correction rows
    x_max: int        # active exception rows
    b_max: int        # harmonic bond rows
    a_max: int        # harmonic angle rows
    t_max: int        # torsion rows
    sh_max: int       # SHAKE constraint rows per molecule
    inc_k: int        # incident (corr+exception) rows per atom
    n_words: int
    loc_x: int        # cell planes per device
    has_aniso1: bool
    has_aniso2: bool

    Kd: int = 5       # dummy block size (>= 5 distinct pad targets)
    nt_cap: int = 0   # NBTHOLE site capacity per device (0 = no NBTHOLE)

    @property
    def n_loc(self) -> int:
        return self.Rc * self.K + self.Kd


class Templates(NamedTuple):
    """Per-molecule-TYPE tables (all shapes lead with n_types)."""
    mass: jax.Array         # (T, K)
    inv_mass: jax.Array
    charge: jax.Array
    sigma: jax.Array
    eps: jax.Array
    tg: jax.Array           # (T, K) int32
    is_pair: jax.Array      # (T, K) bool
    is_parent: jax.Array
    partner_off: jax.Array  # (T, K) int32 member offset of pair partner
    gid_off: jax.Array      # (T, K) int32 global-id offset from base
    ew: jax.Array           # (T, K, n_words) int32
    valid: jax.Array        # (T, K) bool
    res_mass: jax.Array     # (T,)
    # settle (offsets -1 = pad)
    settle_off: jax.Array   # (T, s_max, 3) int32
    settle_dist: jax.Array  # (T, s_max, 2)
    settle_role: jax.Array  # (T, K) int32 -1 or role 0..2
    settle_cl: jax.Array    # (T, K) int32 cluster row within molecule
    # virtual sites
    vsa_site: jax.Array     # (T, va_max) int32 (-1 pad)
    vsa_p: jax.Array        # (T, va_max, 3) int32
    vsa_w: jax.Array        # (T, va_max, 3)
    vso_site: jax.Array     # (T, vo_max) int32
    vso_p: jax.Array        # (T, vo_max, 3) int32
    vso_w: jax.Array        # (T, vo_max, 3)
    vsl_site: jax.Array     # (T, vl_max) int32
    vsl_p: jax.Array        # (T, vl_max, lc_k) int32
    vsl_ow: jax.Array       # (T, vl_max, lc_k)
    vsl_xw: jax.Array
    vsl_yw: jax.Array
    vsl_local: jax.Array    # (T, vl_max, 3)
    # drude springs
    dr_d: jax.Array         # (T, d_max) int32 (-1 pad)
    dr_c: jax.Array
    dr_p2: jax.Array
    dr_p3: jax.Array
    dr_p4: jax.Array
    dr_k3: jax.Array        # (T, d_max)
    dr_k1: jax.Array
    dr_k2: jax.Array
    # screened pairs (4 cross atoms)
    sp_d1: jax.Array        # (T, sp_max) int32 (-1 pad)
    sp_c1: jax.Array
    sp_d2: jax.Array
    sp_c2: jax.Array
    sp_scale: jax.Array
    sp_qq: jax.Array
    # Ewald exclusion corrections
    exc_i: jax.Array        # (T, e_max) int32 (-1 pad)
    exc_j: jax.Array
    exc_qq: jax.Array
    # active exceptions
    x_i: jax.Array          # (T, x_max) int32 (-1 pad)
    x_j: jax.Array
    x_qq: jax.Array
    x_sig: jax.Array
    x_eps: jax.Array
    # incidence: per atom, rows of the molecule-local (corr then
    # exception) pair lists; entry = side * BIG + row, -1 pad
    inc_corr: jax.Array     # (T, K, inc_k) int32
    inc_x: jax.Array        # (T, K, inc_k) int32
    # bonded terms (offsets -1 = pad, k = 0)
    bd_i: jax.Array         # (T, b_max) int32
    bd_j: jax.Array
    bd_r0: jax.Array
    bd_k: jax.Array
    an_i: jax.Array         # (T, a_max) int32
    an_j: jax.Array
    an_k_: jax.Array
    an_t0: jax.Array
    an_k: jax.Array
    to_i: jax.Array         # (T, t_max) int32
    to_j: jax.Array
    to_k_: jax.Array
    to_l: jax.Array
    to_phase: jax.Array
    to_n: jax.Array
    to_k: jax.Array
    # SHAKE constraints (offsets -1 = pad)
    sh_i: jax.Array         # (T, sh_max) int32
    sh_j: jax.Array
    sh_d: jax.Array
    # NBTHOLE site tags (class 0 = inactive; w = signed shell charge)
    nt_class: jax.Array     # (T, K) int32
    nt_w: jax.Array         # (T, K)


def _analyze_nbthole(context, mol_of, n):
    """Type-class analysis of the DrudeForce NBTHOLE pair list.

    The explicit list (DrudeForce.addNBTholePair rows) pins pairs by
    Drude-pair index, which cannot follow molecule migration.  When the
    list is TYPE-COMPLETE — classes of involved Drude pairs defined by
    (polarizability, shell charge), one thole value per class pair, every
    cross-molecule combination of listed class pairs present exactly
    once — it is equivalent to a dense interaction over class-tagged
    SITES (CHARMM's own NBTHOLE semantics is by atom type):

        E = k_e/2 * sum over sites a != b with mol_a != mol_b of
              w_a * w_b * deficit(tab[c_a, c_b] * r_ab) / r_ab

    with w = +q_d on shells, -q_d on cores (the (+,-,-,+) sign pattern of
    forces/drude._nbthole_energy), deficit(u) = -(1 + u/2) e^{-u}, and
    tab[a, b] = thole_ab / (alpha_a * alpha_b)^(1/6) (0 = no term).

    Returns (nt_class (n,) int32 with 0 = inactive, nt_w (n,) float64,
    scale_tab (ncls+1, ncls+1) float64); raises NotImplementedError when
    the explicit list does not have this structure."""
    from ..forces.drude import DrudeForce
    df = next(f for f in context._system.getForces()
              if isinstance(f, DrudeForce))
    parts = df._particles
    ntl = df._nbthole
    involved = sorted({p for e in ntl for p in e[:2]})
    keys = {}
    cls_of = {}
    for p in involved:
        key = (float(parts[p][6]), float(parts[p][5]))  # (alpha, q_d)
        c = keys.setdefault(key, len(keys) + 1)
        cls_of[p] = c
    tab_thole = {}
    seen = set()
    for p1, p2, th in ntl:
        a, b = cls_of[p1], cls_of[p2]
        kk = (min(a, b), max(a, b))
        if tab_thole.setdefault(kk, float(th)) != float(th):
            raise NotImplementedError(
                "resident mode: NBTHOLE thole values differ within one "
                "(polarizability, charge) class pair")
        pr = (min(p1, p2), max(p1, p2))
        if p1 == p2 or pr in seen:
            raise NotImplementedError(
                "resident mode: degenerate/duplicate NBTHOLE pair")
        seen.add(pr)
        if mol_of[parts[p1][1]] == mol_of[parts[p2][1]]:
            raise NotImplementedError(
                "resident mode: NBTHOLE pair within one molecule (use "
                "addScreenedPair for bonded Thole screening)")
    for i, p in enumerate(involved):
        for q in involved[i + 1:]:
            kk = (min(cls_of[p], cls_of[q]), max(cls_of[p], cls_of[q]))
            if kk not in tab_thole:
                continue
            if (mol_of[parts[p][1]] != mol_of[parts[q][1]]
                    and (p, q) not in seen):
                raise NotImplementedError(
                    "resident mode: NBTHOLE list is not type-complete "
                    f"(missing pair of Drude pairs {p}, {q})")
    ncls = len(keys)
    alpha_of = {c: k[0] for k, c in keys.items()}
    tab = np.zeros((ncls + 1, ncls + 1))
    for (a, b), th in tab_thole.items():
        s = th / (alpha_of[a] * alpha_of[b]) ** (1.0 / 6.0)
        tab[a, b] = tab[b, a] = s
    nt_class = np.zeros(n, np.int32)
    nt_w = np.zeros(n)
    for p in involved:
        shell, core, qd = parts[p][0], parts[p][1], parts[p][5]
        nt_class[shell] = nt_class[core] = cls_of[p]
        nt_w[shell] = qd
        nt_w[core] = -qd
    return nt_class, nt_w, tab


def analyze(context):
    """Molecule-type analysis of a built Context.

    Returns (templates_np: dict of numpy arrays matching Templates,
    mol_type (R,), mol_base (R,), maxima dict)."""
    spec = context._spec
    static = context._static
    n = static.n_atoms

    nb = next(t for t in context._terms if hasattr(t[0], "cellpair_cfg"))
    nb_fn, nb_params = nb
    cfg = nb_fn.cellpair_cfg

    mass = np.asarray(spec.mass, np.float64)
    inv_mass = np.asarray(spec.inv_mass, np.float64)
    charge = np.asarray(nb_params["charge"], np.float64)
    sigma = np.asarray(nb_params["sigma"], np.float64)
    eps = np.asarray(nb_params["eps"], np.float64)
    ew = np.asarray(nb_params["excl_words"], np.int32)
    tg = np.asarray(spec.tg, np.int32)
    is_pair = np.asarray(spec.is_pair)
    is_parent = np.asarray(spec.is_parent)
    partner = np.asarray(spec.partner, np.int64)
    res_members = np.asarray(spec.res_members, np.int64)
    res_mass = np.asarray(spec.res_mass, np.float64)
    R, K = res_members.shape
    n_words = ew.shape[1]

    # per-atom -> (molecule, member offset)
    mol_of = np.full(n, -1, np.int64)
    off_of = np.full(n, -1, np.int64)
    for r in range(R):
        for k in range(K):
            a = res_members[r, k]
            if a < n:
                mol_of[a] = r
                off_of[a] = k

    # term rows grouped by molecule ------------------------------------
    def group_rows(idx_rows, owner_atom_col):
        by_mol = [[] for _ in range(R)]
        for row, atoms in enumerate(idx_rows):
            m = mol_of[atoms[owner_atom_col]]
            assert all(mol_of[a] == m for a in atoms if a >= 0), \
                "resident mode requires intra-molecular term rows"
            by_mol[m].append(row)
        return by_mol

    settle_idx = np.asarray(spec.settle_idx, np.int64)
    settle_dist = np.asarray(spec.settle_dist, np.float64)
    settle_by = group_rows(settle_idx, 0)

    shk_idx = np.asarray(spec.shake_idx, np.int64).reshape(-1, 2)
    shk_dist = np.asarray(spec.shake_dist, np.float64)
    shake_by = group_rows(shk_idx, 0)

    vsa_idx = np.asarray(spec.vs_avg_idx, np.int64)
    vsa_p = np.asarray(spec.vs_avg_p, np.int64)
    vsa_w = np.asarray(spec.vs_avg_w, np.float64)
    vsa_by = group_rows([[i] for i in vsa_idx], 0)
    vso_idx = np.asarray(spec.vs_oop_idx, np.int64)
    vso_p = np.asarray(spec.vs_oop_p, np.int64)
    vso_w = np.asarray(spec.vs_oop_w, np.float64)
    vso_by = group_rows([[i] for i in vso_idx], 0)
    vsl_idx = np.asarray(spec.vs_lc_idx, np.int64)
    vsl_p = np.asarray(spec.vs_lc_p, np.int64)
    vsl_ow = np.asarray(spec.vs_lc_ow, np.float64)
    vsl_xw = np.asarray(spec.vs_lc_xw, np.float64)
    vsl_yw = np.asarray(spec.vs_lc_yw, np.float64)
    vsl_local = np.asarray(spec.vs_lc_local, np.float64)
    vsl_by = group_rows([[i] for i in vsl_idx], 0)
    lc_k = vsl_p.shape[1] if len(vsl_idx) else 1

    # drude term: find by wants_pos_err
    drude_term = next((t for t in context._terms
                       if getattr(t[0], "wants_pos_err", False)), None)
    nt_class_a = np.zeros(n, np.int32)
    nt_w_a = np.zeros(n)
    nt_tab = None
    if drude_term is not None:
        dp = {k: np.asarray(v) for k, v in drude_term[1].items()}
        if "nt_d1" in dp:
            nt_class_a, nt_w_a, nt_tab = _analyze_nbthole(context, mol_of, n)
        has_aniso1 = "k1" in dp
        has_aniso2 = "k2" in dp
        dr_rows = [[int(dp["drude"][i]), int(dp["parent"][i])]
                   for i in range(len(dp["drude"]))]
        dr_by = group_rows(dr_rows, 0)
        if "sp_d1" in dp:
            sp_rows = [[int(dp["sp_d1"][i]), int(dp["sp_c1"][i]),
                        int(dp["sp_d2"][i]), int(dp["sp_c2"][i])]
                       for i in range(len(dp["sp_d1"]))]
            sp_by = group_rows(sp_rows, 0)
        else:
            sp_by = [[] for _ in range(R)]
    else:
        dp = {}
        has_aniso1 = has_aniso2 = False
        dr_by = [[] for _ in range(R)]
        sp_by = [[] for _ in range(R)]

    # bonded terms (array-parametrized closures; identified by key set)
    bond_term = angle_term = tors_term = None
    bd_by = [[] for _ in range(R)]
    an_by = [[] for _ in range(R)]
    to_by = [[] for _ in range(R)]
    bd_p = an_p = to_p = None
    for t in context._terms:
        if t is nb or t is drude_term:
            continue
        keys = set(t[1].keys())
        prm = {k: np.asarray(v) for k, v in t[1].items()}
        if keys == {"i", "j", "r0", "k"}:
            bond_term, bd_p = t[0], prm
            bd_by = group_rows([[int(a), int(b)] for a, b in
                                zip(prm["i"], prm["j"])], 0)
        elif keys == {"i", "j", "k_", "theta0", "k"}:
            angle_term, an_p = t[0], prm
            an_by = group_rows([[int(a), int(b), int(c)] for a, b, c in
                                zip(prm["i"], prm["j"], prm["k_"])], 0)
        elif keys == {"i", "j", "k_", "l", "phase", "n", "k"}:
            tors_term, to_p = t[0], prm
            to_by = group_rows([[int(a), int(b), int(c), int(e)]
                                for a, b, c, e in
                                zip(prm["i"], prm["j"], prm["k_"],
                                    prm["l"])], 0)
        else:
            raise NotImplementedError(
                "resident mode supports nonbonded + DrudeForce + bonded "
                f"terms (found param keys {sorted(keys)})")

    # Ewald exclusion corrections (all exclusion pairs)
    exc_i, exc_j = nb_fn.nbl_exclusions
    exc_i = np.asarray(exc_i, np.int64)
    exc_j = np.asarray(exc_j, np.int64)
    from ..units import ONE_4PI_EPS0
    pme = nb_fn.pme_setup
    corr_qq = (ONE_4PI_EPS0 * charge[exc_i] * charge[exc_j]
               if pme is not None else np.zeros(len(exc_i)))
    corr_by = group_rows([[int(a), int(b)] for a, b in zip(exc_i, exc_j)], 0)

    # active exceptions
    if nb_fn.exc_active is not None:
        xi, xj, xqq, xsig, xeps = [np.asarray(v) for v in nb_fn.exc_active]
        xqq = ONE_4PI_EPS0 * xqq
        x_by = group_rows([[int(a), int(b)] for a, b in zip(xi, xj)], 0)
    else:
        xi = xj = np.zeros(0, np.int64)
        xqq = xsig = xeps = np.zeros(0)
        x_by = [[] for _ in range(R)]

    # ---- molecule signatures -> types --------------------------------
    def fo(a):
        return int(off_of[a])

    sigs = {}
    mol_type = np.zeros(R, np.int64)
    mol_base = np.zeros(R, np.int64)
    type_data = []
    for r in range(R):
        A = [int(a) for a in res_members[r] if a < n]
        base = A[0]
        mol_base[r] = base
        atom_sig = tuple(
            (float(mass[a]), float(charge[a]), float(sigma[a]),
             float(eps[a]), int(tg[a]), bool(is_pair[a]),
             bool(is_parent[a]),
             fo(partner[a]) if is_pair[a] else k,
             int(a - base), tuple(int(x) for x in ew[a]),
             int(nt_class_a[a]), float(nt_w_a[a]))
            for k, a in enumerate(A))
        st_sig = tuple(sorted(
            (fo(settle_idx[row, 0]), fo(settle_idx[row, 1]),
             fo(settle_idx[row, 2]),
             float(settle_dist[row, 0]), float(settle_dist[row, 1]))
            for row in settle_by[r]))
        va_sig = tuple(sorted(
            (fo(vsa_idx[row]), tuple(fo(p) for p in vsa_p[row]),
             tuple(map(float, vsa_w[row]))) for row in vsa_by[r]))
        vo_sig = tuple(sorted(
            (fo(vso_idx[row]), tuple(fo(p) for p in vso_p[row]),
             tuple(map(float, vso_w[row]))) for row in vso_by[r]))
        vl_sig = tuple(sorted(
            (fo(vsl_idx[row]), tuple(fo(p) for p in vsl_p[row]),
             tuple(map(float, vsl_ow[row])), tuple(map(float, vsl_xw[row])),
             tuple(map(float, vsl_yw[row])),
             tuple(map(float, vsl_local[row]))) for row in vsl_by[r]))
        dr_sig = tuple(sorted(
            (fo(dp["drude"][row]), fo(dp["parent"][row]),
             float(dp["k3"][row]),
             fo(dp["p2"][row]) if has_aniso1 else -1,
             float(dp["k1"][row]) if has_aniso1 else 0.0,
             fo(dp["p3"][row]) if has_aniso2 else -1,
             fo(dp["p4"][row]) if has_aniso2 else -1,
             float(dp["k2"][row]) if has_aniso2 else 0.0)
            for row in dr_by[r]))
        sp_sig = tuple(sorted(
            (fo(dp["sp_d1"][row]), fo(dp["sp_c1"][row]),
             fo(dp["sp_d2"][row]), fo(dp["sp_c2"][row]),
             float(dp["sp_scale"][row]), float(dp["sp_qq"][row]))
            for row in sp_by[r]))
        corr_sig = tuple(sorted(
            (fo(exc_i[row]), fo(exc_j[row]), float(corr_qq[row]))
            for row in corr_by[r]))
        x_sig = tuple(sorted(
            (fo(xi[row]), fo(xj[row]), float(xqq[row]), float(xsig[row]),
             float(xeps[row])) for row in x_by[r]))
        bd_sig = tuple(sorted(
            (fo(bd_p["i"][row]), fo(bd_p["j"][row]),
             float(bd_p["r0"][row]), float(bd_p["k"][row]))
            for row in bd_by[r]))
        an_sig = tuple(sorted(
            (fo(an_p["i"][row]), fo(an_p["j"][row]), fo(an_p["k_"][row]),
             float(an_p["theta0"][row]), float(an_p["k"][row]))
            for row in an_by[r]))
        to_sig = tuple(sorted(
            (fo(to_p["i"][row]), fo(to_p["j"][row]), fo(to_p["k_"][row]),
             fo(to_p["l"][row]), float(to_p["phase"][row]),
             float(to_p["n"][row]), float(to_p["k"][row]))
            for row in to_by[r]))
        sh_sig = tuple(sorted(
            (fo(shk_idx[row, 0]), fo(shk_idx[row, 1]),
             float(shk_dist[row])) for row in shake_by[r]))
        sig = (atom_sig, st_sig, va_sig, vo_sig, vl_sig, dr_sig, sp_sig,
               corr_sig, x_sig, bd_sig, an_sig, to_sig, sh_sig,
               float(res_mass[r]))
        t = sigs.get(sig)
        if t is None:
            t = len(type_data)
            sigs[sig] = t
            type_data.append(sig)
        mol_type[r] = t

    T = len(type_data)
    mx = dict(
        s_max=max((len(s[1]) for s in type_data), default=0),
        va_max=max((len(s[2]) for s in type_data), default=0),
        vo_max=max((len(s[3]) for s in type_data), default=0),
        vl_max=max((len(s[4]) for s in type_data), default=0),
        d_max=max((len(s[5]) for s in type_data), default=0),
        sp_max=max((len(s[6]) for s in type_data), default=0),
        e_max=max((len(s[7]) for s in type_data), default=0),
        x_max=max((len(s[8]) for s in type_data), default=0),
        b_max=max((len(s[9]) for s in type_data), default=0),
        a_max=max((len(s[10]) for s in type_data), default=0),
        t_max=max((len(s[11]) for s in type_data), default=0),
        sh_max=max((len(s[12]) for s in type_data), default=0),
    )

    # ---- pack templates ----------------------------------------------
    z = np.zeros
    tp = dict(
        mass=z((T, K)), inv_mass=z((T, K)), charge=z((T, K)),
        sigma=np.ones((T, K)), eps=z((T, K)), tg=z((T, K), np.int32),
        is_pair=z((T, K), bool), is_parent=z((T, K), bool),
        partner_off=np.tile(np.arange(K, dtype=np.int32), (T, 1)),
        gid_off=z((T, K), np.int32),
        ew=z((T, K, n_words), np.int32), valid=z((T, K), bool),
        res_mass=z((T,)),
        settle_off=np.full((T, mx["s_max"], 3), -1, np.int32),
        settle_dist=np.full((T, mx["s_max"], 2), 0.1),
        settle_role=np.full((T, K), -1, np.int32),
        settle_cl=z((T, K), np.int32),
        vsa_site=np.full((T, mx["va_max"]), -1, np.int32),
        vsa_p=z((T, mx["va_max"], 3), np.int32),
        vsa_w=z((T, mx["va_max"], 3)),
        vso_site=np.full((T, mx["vo_max"]), -1, np.int32),
        vso_p=z((T, mx["vo_max"], 3), np.int32),
        vso_w=z((T, mx["vo_max"], 3)),
        vsl_site=np.full((T, mx["vl_max"]), -1, np.int32),
        vsl_p=z((T, mx["vl_max"], lc_k), np.int32),
        vsl_ow=z((T, mx["vl_max"], lc_k)),
        vsl_xw=z((T, mx["vl_max"], lc_k)),
        vsl_yw=z((T, mx["vl_max"], lc_k)),
        vsl_local=z((T, mx["vl_max"], 3)),
        dr_d=np.full((T, mx["d_max"]), -1, np.int32),
        dr_c=np.full((T, mx["d_max"]), -1, np.int32),
        dr_p2=np.full((T, mx["d_max"]), -1, np.int32),
        dr_p3=np.full((T, mx["d_max"]), -1, np.int32),
        dr_p4=np.full((T, mx["d_max"]), -1, np.int32),
        dr_k3=z((T, mx["d_max"])), dr_k1=z((T, mx["d_max"])),
        dr_k2=z((T, mx["d_max"])),
        sp_d1=np.full((T, mx["sp_max"]), -1, np.int32),
        sp_c1=np.full((T, mx["sp_max"]), -1, np.int32),
        sp_d2=np.full((T, mx["sp_max"]), -1, np.int32),
        sp_c2=np.full((T, mx["sp_max"]), -1, np.int32),
        sp_scale=z((T, mx["sp_max"])), sp_qq=z((T, mx["sp_max"])),
        exc_i=np.full((T, mx["e_max"]), -1, np.int32),
        exc_j=np.full((T, mx["e_max"]), -1, np.int32),
        exc_qq=z((T, mx["e_max"])),
        x_i=np.full((T, mx["x_max"]), -1, np.int32),
        x_j=np.full((T, mx["x_max"]), -1, np.int32),
        x_qq=z((T, mx["x_max"])), x_sig=np.ones((T, mx["x_max"])),
        x_eps=z((T, mx["x_max"])),
        bd_i=np.full((T, mx["b_max"]), -1, np.int32),
        bd_j=np.full((T, mx["b_max"]), -1, np.int32),
        bd_r0=np.full((T, mx["b_max"]), 0.1), bd_k=z((T, mx["b_max"])),
        an_i=np.full((T, mx["a_max"]), -1, np.int32),
        an_j=np.full((T, mx["a_max"]), -1, np.int32),
        an_k_=np.full((T, mx["a_max"]), -1, np.int32),
        an_t0=z((T, mx["a_max"])), an_k=z((T, mx["a_max"])),
        to_i=np.full((T, mx["t_max"]), -1, np.int32),
        to_j=np.full((T, mx["t_max"]), -1, np.int32),
        to_k_=np.full((T, mx["t_max"]), -1, np.int32),
        to_l=np.full((T, mx["t_max"]), -1, np.int32),
        to_phase=z((T, mx["t_max"])), to_n=np.ones((T, mx["t_max"])),
        to_k=z((T, mx["t_max"])),
        sh_i=np.full((T, mx["sh_max"]), -1, np.int32),
        sh_j=np.full((T, mx["sh_max"]), -1, np.int32),
        sh_d=np.full((T, mx["sh_max"]), 0.1),
        nt_class=z((T, K), np.int32), nt_w=z((T, K)),
    )
    inc_lists = [[[ [] for _ in range(K)] for _ in range(2)]
                 for _ in range(T)]  # [t][0=corr,1=exc][k] -> entries
    for t, sig in enumerate(type_data):
        (atom_sig, st_sig, va_sig, vo_sig, vl_sig, dr_sig, sp_sig,
         corr_sig, x_sig, bd_sig, an_sig, to_sig, sh_sig, rmass) = sig
        tp["res_mass"][t] = rmass
        for k, a in enumerate(atom_sig):
            (m, q, sg, ep, g, ip, ipar, po, go, eww, ntc, ntw) = a
            tp["nt_class"][t, k] = ntc
            tp["nt_w"][t, k] = ntw
            tp["mass"][t, k] = m
            tp["inv_mass"][t, k] = 1.0 / m if m > 0 else 0.0
            tp["charge"][t, k] = q
            tp["sigma"][t, k] = sg
            tp["eps"][t, k] = ep
            tp["tg"][t, k] = g
            tp["is_pair"][t, k] = ip
            tp["is_parent"][t, k] = ipar
            tp["partner_off"][t, k] = po
            tp["gid_off"][t, k] = go
            tp["ew"][t, k] = eww
            tp["valid"][t, k] = True
        for s, row in enumerate(st_sig):
            tp["settle_off"][t, s] = row[:3]
            tp["settle_dist"][t, s] = row[3:]
            for role in range(3):
                tp["settle_role"][t, row[role]] = role
                tp["settle_cl"][t, row[role]] = s
        for s, row in enumerate(va_sig):
            tp["vsa_site"][t, s] = row[0]
            tp["vsa_p"][t, s] = row[1]
            tp["vsa_w"][t, s] = row[2]
        for s, row in enumerate(vo_sig):
            tp["vso_site"][t, s] = row[0]
            tp["vso_p"][t, s] = row[1]
            tp["vso_w"][t, s] = row[2]
        for s, row in enumerate(vl_sig):
            tp["vsl_site"][t, s] = row[0]
            tp["vsl_p"][t, s] = row[1]
            tp["vsl_ow"][t, s] = row[2]
            tp["vsl_xw"][t, s] = row[3]
            tp["vsl_yw"][t, s] = row[4]
            tp["vsl_local"][t, s] = row[5]
        for s, row in enumerate(dr_sig):
            tp["dr_d"][t, s], tp["dr_c"][t, s] = row[0], row[1]
            tp["dr_k3"][t, s] = row[2]
            tp["dr_p2"][t, s], tp["dr_k1"][t, s] = row[3], row[4]
            tp["dr_p3"][t, s], tp["dr_p4"][t, s] = row[5], row[6]
            tp["dr_k2"][t, s] = row[7]
        for s, row in enumerate(sp_sig):
            (tp["sp_d1"][t, s], tp["sp_c1"][t, s], tp["sp_d2"][t, s],
             tp["sp_c2"][t, s]) = row[:4]
            tp["sp_scale"][t, s], tp["sp_qq"][t, s] = row[4], row[5]
        for s, row in enumerate(corr_sig):
            tp["exc_i"][t, s], tp["exc_j"][t, s] = row[0], row[1]
            tp["exc_qq"][t, s] = row[2]
            inc_lists[t][0][row[0]].append(s)
            inc_lists[t][0][row[1]].append(mx["e_max"] + s)  # side 1
        for s, row in enumerate(x_sig):
            tp["x_i"][t, s], tp["x_j"][t, s] = row[0], row[1]
            tp["x_qq"][t, s] = row[2]
            tp["x_sig"][t, s], tp["x_eps"][t, s] = row[3], row[4]
            inc_lists[t][1][row[0]].append(s)
            inc_lists[t][1][row[1]].append(mx["x_max"] + s)
        for s, row in enumerate(bd_sig):
            tp["bd_i"][t, s], tp["bd_j"][t, s] = row[0], row[1]
            tp["bd_r0"][t, s], tp["bd_k"][t, s] = row[2], row[3]
        for s, row in enumerate(an_sig):
            (tp["an_i"][t, s], tp["an_j"][t, s],
             tp["an_k_"][t, s]) = row[:3]
            tp["an_t0"][t, s], tp["an_k"][t, s] = row[3], row[4]
        for s, row in enumerate(to_sig):
            (tp["to_i"][t, s], tp["to_j"][t, s], tp["to_k_"][t, s],
             tp["to_l"][t, s]) = row[:4]
            (tp["to_phase"][t, s], tp["to_n"][t, s],
             tp["to_k"][t, s]) = row[4:]
        for s, row in enumerate(sh_sig):
            tp["sh_i"][t, s], tp["sh_j"][t, s] = row[0], row[1]
            tp["sh_d"][t, s] = row[2]

    inc_k = max([1] + [len(l) for t in range(T) for side in range(2)
                 for l in inc_lists[t][side]])
    tp["inc_corr"] = np.full((T, K, inc_k), -1, np.int32)
    tp["inc_x"] = np.full((T, K, inc_k), -1, np.int32)
    for t in range(T):
        for k in range(K):
            for s, e in enumerate(inc_lists[t][0][k]):
                tp["inc_corr"][t, k, s] = e
            for s, e in enumerate(inc_lists[t][1][k]):
                tp["inc_x"][t, k, s] = e

    mx.update(inc_k=inc_k, lc_k=lc_k, n_words=n_words, K=K,
              has_aniso1=has_aniso1, has_aniso2=has_aniso2,
              nt_tab=nt_tab)
    bonded_fns = []
    if bond_term is not None:
        bonded_fns.append((bond_term, "bond_params"))
    if angle_term is not None:
        bonded_fns.append((angle_term, "angle_params"))
    if tors_term is not None:
        bonded_fns.append((tors_term, "torsion_params"))
    mx["bonded_fns"] = bonded_fns
    return tp, mol_type, mol_base, mx


# ---------------------------------------------------------------------------
# device-side local construction
# ---------------------------------------------------------------------------

def _dummy_positions(Kd: int) -> np.ndarray:
    """K fixed, pairwise-distinct dummy coordinates: an equilateral 0.1 nm
    triangle (well-conditioned padded SETTLE rows) plus a z-line."""
    pts = np.zeros((Kd, 3))
    a = 0.1
    if Kd > 1:
        pts[1] = (a, 0.0, 0.0)
    if Kd > 2:
        pts[2] = (a / 2, a * np.sqrt(3) / 2, 0.0)
    for k in range(3, Kd):
        pts[k] = (0.0, 0.0, a * (k - 2))
    return pts


def _local_tables(tpl: Templates, layout: ResidentLayout, mol_type,
                  mol_base, n_mol, rdt):
    """Per-device atom/molecule tables gathered from the type templates.
    All inputs traced; returns a dict of local arrays."""
    Rc, K = layout.Rc, layout.K
    n_loc = layout.n_loc
    r = jnp.arange(Rc)
    used = r < n_mol
    ty = jnp.where(used, mol_type, 0)
    u_atom = jnp.repeat(used, K)                        # (Rc*K,)
    valid_atom = u_atom & tpl.valid[ty].reshape(-1)

    D = Rc * K  # dummy block slot base
    Kd = layout.Kd

    def pad_atoms(v_main, v_dummy, dt):
        return jnp.concatenate(
            [v_main, jnp.full((Kd,), v_dummy, dt)]).astype(dt)

    out = {"valid": jnp.concatenate(
        [valid_atom, jnp.zeros((Kd,), bool)])}
    out["mass"] = pad_atoms(
        jnp.where(valid_atom, tpl.mass[ty].reshape(-1), 0.0), 0.0, rdt)
    out["inv_mass"] = pad_atoms(
        jnp.where(valid_atom, tpl.inv_mass[ty].reshape(-1), 0.0), 1.0, rdt)
    out["charge"] = pad_atoms(
        jnp.where(valid_atom, tpl.charge[ty].reshape(-1), 0.0), 0.0, rdt)
    out["sigma"] = pad_atoms(
        jnp.where(valid_atom, tpl.sigma[ty].reshape(-1), 1.0), 1.0, rdt)
    out["eps"] = pad_atoms(
        jnp.where(valid_atom, tpl.eps[ty].reshape(-1), 0.0), 0.0, rdt)
    out["tg"] = pad_atoms(
        jnp.where(valid_atom, tpl.tg[ty].reshape(-1), 0), 0, jnp.int32)
    out["is_pair"] = pad_atoms(
        valid_atom & tpl.is_pair[ty].reshape(-1), False, bool)
    out["is_parent"] = pad_atoms(
        valid_atom & tpl.is_parent[ty].reshape(-1), False, bool)
    slot_base = (r * K)[:, None]
    out["partner"] = jnp.concatenate([
        jnp.where(valid_atom,
                  (slot_base + tpl.partner_off[ty]).reshape(-1),
                  jnp.arange(Rc * K)),
        jnp.arange(D, D + Kd)]).astype(jnp.int32)
    out["resid"] = jnp.concatenate(
        [jnp.repeat(jnp.arange(Rc, dtype=jnp.int32), K),
         jnp.full((Kd,), Rc, jnp.int32)])
    out["res_mass"] = jnp.concatenate(
        [jnp.where(used, tpl.res_mass[ty], 0.0),
         jnp.zeros((1,))]).astype(rdt)
    out["res_inv_mass"] = jnp.where(
        out["res_mass"] > 0, 1.0 / jnp.where(out["res_mass"] > 0,
                                             out["res_mass"], 1.0),
        0.0).astype(rdt)
    members = jnp.where(tpl.valid[ty],
                        slot_base + jnp.arange(K)[None, :], n_loc)
    out["res_members"] = jnp.concatenate(
        [members, jnp.full((1, K), n_loc)]).astype(jnp.int32)

    # settle ------------------------------------------------------------
    if layout.s_max:
        off = tpl.settle_off[ty]                      # (Rc, s_max, 3)
        ok = (off[..., 0] >= 0) & used[:, None]
        dummy_tri = jnp.asarray([D, D + 1, D + 2], jnp.int32)
        out["settle_idx"] = jnp.where(
            ok[..., None], slot_base[:, :, None] + off,
            dummy_tri[None, None, :]).reshape(-1, 3).astype(jnp.int32)
        a = 0.1
        out["settle_dist"] = jnp.where(
            ok[..., None], tpl.settle_dist[ty],
            jnp.asarray([a, a])[None, None, :]).reshape(-1, 2).astype(rdt)
        S_loc = Rc * layout.s_max
        role = tpl.settle_role[ty].reshape(-1)        # (Rc*K,)
        cl = tpl.settle_cl[ty].reshape(-1)
        g = jnp.where(valid_atom & (role >= 0),
                      role * S_loc + (jnp.repeat(r, K) * layout.s_max + cl),
                      3 * S_loc)
        out["settle_gather"] = jnp.concatenate(
            [g, jnp.full((Kd,), 3 * S_loc)]).astype(jnp.int32)
    else:
        out["settle_idx"] = jnp.zeros((0, 3), jnp.int32)
        out["settle_dist"] = jnp.zeros((0, 2), rdt)
        out["settle_gather"] = jnp.zeros((n_loc,), jnp.int32)

    # virtual sites ------------------------------------------------------
    def vs_common(site_t, p_t, ok_extra=None):
        site = site_t[ty]                             # (Rc, vmax)
        ok = (site >= 0) & used[:, None]
        # pad rows write the (otherwise unreferenced) dummy slot D+4,
        # reading only dummy parents — never colliding with the distinct
        # D0..D3 pair-pad atoms
        idx = jnp.where(ok, slot_base + site, D + 4)
        p = jnp.where(ok[..., None], slot_base[..., None] + p_t[ty], D)
        return ok, idx.reshape(-1).astype(jnp.int32), p

    if layout.va_max:
        ok, idx, p = vs_common(tpl.vsa_site, tpl.vsa_p)
        w = jnp.where(ok[..., None], tpl.vsa_w[ty],
                      jnp.asarray([1.0, 0.0, 0.0])[None, None, :])
        out["vs_avg_idx"] = idx
        out["vs_avg_p"] = p.reshape(-1, 3).astype(jnp.int32)
        out["vs_avg_w"] = w.reshape(-1, 3).astype(rdt)
    if layout.vo_max:
        ok, idx, p = vs_common(tpl.vso_site, tpl.vso_p)
        out["vs_oop_idx"] = idx
        out["vs_oop_p"] = p.reshape(-1, 3).astype(jnp.int32)
        out["vs_oop_w"] = jnp.where(
            ok[..., None], tpl.vso_w[ty], 0.0).reshape(-1, 3).astype(rdt)
    if layout.vl_max:
        site = tpl.vsl_site[ty]
        ok = (site >= 0) & used[:, None]
        lk = layout.lc_k
        # pad rows: frame from the dummy triangle (finite, orthonormal)
        pad_p = jnp.concatenate([jnp.asarray([D, D + 1, D + 2], jnp.int32),
                                 jnp.full((max(lk - 3, 0),), D, jnp.int32)]
                                )[:lk]
        pad_ow = jnp.zeros((lk,)).at[0].set(1.0)
        pad_xw = jnp.zeros((lk,)).at[0].set(-1.0).at[1].set(1.0) \
            if lk > 1 else jnp.ones((lk,))
        pad_yw = jnp.zeros((lk,)).at[0].set(-1.0).at[2].set(1.0) \
            if lk > 2 else jnp.zeros((lk,))
        out["vs_lc_idx"] = jnp.where(ok, slot_base + site,
                                     D + 4).reshape(-1).astype(jnp.int32)
        out["vs_lc_p"] = jnp.where(
            ok[..., None], slot_base[..., None] + tpl.vsl_p[ty],
            pad_p[None, None, :]).reshape(-1, lk).astype(jnp.int32)
        out["vs_lc_ow"] = jnp.where(ok[..., None], tpl.vsl_ow[ty],
                                    pad_ow).reshape(-1, lk).astype(rdt)
        out["vs_lc_xw"] = jnp.where(ok[..., None], tpl.vsl_xw[ty],
                                    pad_xw).reshape(-1, lk).astype(rdt)
        out["vs_lc_yw"] = jnp.where(ok[..., None], tpl.vsl_yw[ty],
                                    pad_yw).reshape(-1, lk).astype(rdt)
        out["vs_lc_local"] = jnp.where(
            ok[..., None], tpl.vsl_local[ty], 0.0).reshape(-1, 3).astype(rdt)

    # NBTHOLE class tags + per-atom global molecule id -------------------
    if layout.nt_cap:
        out["nt_class"] = pad_atoms(
            jnp.where(valid_atom, tpl.nt_class[ty].reshape(-1), 0),
            0, jnp.int32)
        out["nt_w"] = pad_atoms(
            jnp.where(valid_atom, tpl.nt_w[ty].reshape(-1), 0.0), 0.0, rdt)
        out["mol_gid"] = jnp.concatenate(
            [jnp.repeat(jnp.where(used, mol_base, -1), K),
             jnp.full((Kd,), -1)]).astype(jnp.int32)

    # drude ---------------------------------------------------------------
    if layout.d_max:
        dd = tpl.dr_d[ty]
        ok = (dd >= 0) & used[:, None]
        prm = {"drude": jnp.where(ok, slot_base + dd, D),
               "parent": jnp.where(ok, slot_base + tpl.dr_c[ty], D + 1),
               "k3": jnp.where(ok, tpl.dr_k3[ty], 0.0)}
        if layout.has_aniso1:
            prm["p2"] = jnp.where(ok, slot_base + tpl.dr_p2[ty], D + 2)
            prm["k1"] = jnp.where(ok, tpl.dr_k1[ty], 0.0)
        if layout.has_aniso2:
            prm["p3"] = jnp.where(ok, slot_base + tpl.dr_p3[ty], D + 2)
            prm["p4"] = jnp.where(ok, slot_base + tpl.dr_p4[ty], D)
            prm["k2"] = jnp.where(ok, tpl.dr_k2[ty], 0.0)
        if layout.sp_max:
            sd = tpl.sp_d1[ty]
            ok2 = (sd >= 0) & used[:, None]
            prm["sp_d1"] = jnp.where(ok2, slot_base + sd, D)
            prm["sp_c1"] = jnp.where(ok2, slot_base + tpl.sp_c1[ty], D + 1)
            prm["sp_d2"] = jnp.where(ok2, slot_base + tpl.sp_d2[ty], D + 2)
            prm["sp_c2"] = jnp.where(ok2, slot_base + tpl.sp_c2[ty], D + 3)
            prm["sp_scale"] = jnp.where(ok2, tpl.sp_scale[ty], 1.0)
            prm["sp_qq"] = jnp.where(ok2, tpl.sp_qq[ty], 0.0)
        out["drude_params"] = {
            k: (v.reshape(-1).astype(jnp.int32) if v.dtype in
                (jnp.int32, jnp.int64) else v.reshape(-1).astype(rdt))
            for k, v in prm.items()}

    # exclusion corrections / exceptions ---------------------------------
    def pair_rows(i_t, j_t, cap):
        ii_t = i_t[ty]
        ok = (ii_t >= 0) & used[:, None]
        ii = jnp.where(ok, slot_base + ii_t, D).reshape(-1)
        jj = jnp.where(ok, slot_base + j_t[ty], D + 1).reshape(-1)
        return ok, ii.astype(jnp.int32), jj.astype(jnp.int32)

    def incidence(inc_t, cap):
        # template entry: side * cap + row -> local flat
        # side * (Rc * cap) + r * cap + row ; pad -> 2 * Rc * cap
        e = inc_t[ty]                                  # (Rc, K, inc_k)
        side = e // cap
        row = e % cap
        base_r = (r * cap)[:, None, None]
        loc = side * (Rc * cap) + base_r + row
        loc = jnp.where((e >= 0) & used[:, None, None], loc, 2 * Rc * cap)
        return jnp.concatenate(
            [loc.reshape(Rc * K, -1),
             jnp.full((K, loc.shape[-1]), 2 * Rc * cap)]).astype(jnp.int32)

    if layout.e_max:
        ok, ii, jj = pair_rows(tpl.exc_i, tpl.exc_j, layout.e_max)
        out["corr"] = {
            "ii": ii, "jj": jj,
            "qq": jnp.where(ok, tpl.exc_qq[ty], 0.0).reshape(-1).astype(rdt),
            "inc": incidence(tpl.inc_corr, layout.e_max)}
    if layout.x_max:
        ok, ii, jj = pair_rows(tpl.x_i, tpl.x_j, layout.x_max)
        out["exc"] = {
            "ii": ii, "jj": jj,
            "qq": jnp.where(ok, tpl.x_qq[ty], 0.0).reshape(-1).astype(rdt),
            "sig": jnp.where(ok, tpl.x_sig[ty], 1.0).reshape(-1).astype(rdt),
            "eps": jnp.where(ok, tpl.x_eps[ty], 0.0).reshape(-1).astype(rdt),
            "inc": incidence(tpl.inc_x, layout.x_max)}

    # excl words + global ids for the sweep's window test
    out["ew"] = jnp.concatenate(
        [jnp.where(valid_atom[:, None], tpl.ew[ty].reshape(Rc * K, -1), 0),
         jnp.zeros((Kd, layout.n_words), jnp.int32)]).astype(jnp.int32)
    # bonded terms (pads reference distinct dummy atoms with k = 0)
    if layout.b_max:
        bi = tpl.bd_i[ty]
        ok = (bi >= 0) & used[:, None]
        out["bond_params"] = {
            "i": jnp.where(ok, slot_base + bi, D).reshape(-1).astype(
                jnp.int32),
            "j": jnp.where(ok, slot_base + tpl.bd_j[ty], D + 1).reshape(
                -1).astype(jnp.int32),
            "r0": jnp.where(ok, tpl.bd_r0[ty], 0.1).reshape(-1).astype(rdt),
            "k": jnp.where(ok, tpl.bd_k[ty], 0.0).reshape(-1).astype(rdt)}
    if layout.a_max:
        ai = tpl.an_i[ty]
        ok = (ai >= 0) & used[:, None]
        out["angle_params"] = {
            "i": jnp.where(ok, slot_base + ai, D).reshape(-1).astype(
                jnp.int32),
            "j": jnp.where(ok, slot_base + tpl.an_j[ty], D + 1).reshape(
                -1).astype(jnp.int32),
            "k_": jnp.where(ok, slot_base + tpl.an_k_[ty], D + 2).reshape(
                -1).astype(jnp.int32),
            "theta0": jnp.where(ok, tpl.an_t0[ty], 0.0).reshape(
                -1).astype(rdt),
            "k": jnp.where(ok, tpl.an_k[ty], 0.0).reshape(-1).astype(rdt)}
    if layout.t_max:
        ti_ = tpl.to_i[ty]
        ok = (ti_ >= 0) & used[:, None]
        out["torsion_params"] = {
            "i": jnp.where(ok, slot_base + ti_, D).reshape(-1).astype(
                jnp.int32),
            "j": jnp.where(ok, slot_base + tpl.to_j[ty], D + 1).reshape(
                -1).astype(jnp.int32),
            "k_": jnp.where(ok, slot_base + tpl.to_k_[ty], D + 2).reshape(
                -1).astype(jnp.int32),
            "l": jnp.where(ok, slot_base + tpl.to_l[ty], D + 3).reshape(
                -1).astype(jnp.int32),
            "phase": jnp.where(ok, tpl.to_phase[ty], 0.0).reshape(
                -1).astype(rdt),
            "n": jnp.where(ok, tpl.to_n[ty], 1.0).reshape(-1).astype(rdt),
            "k": jnp.where(ok, tpl.to_k[ty], 0.0).reshape(-1).astype(rdt)}

    # SHAKE constraints (pads reference the dummy D/D+1 pair, whose
    # separation is exactly the pad distance 0.1 — already satisfied, so
    # the Jacobi sweeps never move them or stall convergence)
    if layout.sh_max:
        si = tpl.sh_i[ty]
        ok = (si >= 0) & used[:, None]
        ii = jnp.where(ok, slot_base + si, D).reshape(-1)
        jj = jnp.where(ok, slot_base + tpl.sh_j[ty], D + 1).reshape(-1)
        out["shake_idx"] = jnp.stack([ii, jj], axis=1).astype(jnp.int32)
        out["shake_dist"] = jnp.where(ok, tpl.sh_d[ty],
                                      0.1).reshape(-1).astype(rdt)

    gid = jnp.where(valid_atom,
                    (mol_base[:, None] + tpl.gid_off[ty]).reshape(-1),
                    -1 - jnp.arange(Rc * K))
    out["gid"] = jnp.concatenate(
        [gid, -1 - jnp.arange(D, D + Kd)]).astype(jnp.int32)
    return out


def _local_spec(spec_g: SystemSpec, tables, rdt) -> SystemSpec:
    """Assemble a SystemSpec pytree from local tables + replicated NH/
    integration constants, so integrators/tgnh runs unchanged per device."""
    t = tables
    z3 = jnp.zeros((0,), jnp.int32)
    return SystemSpec(
        mass=t["mass"], inv_mass=t["inv_mass"], tg=t["tg"],
        resid=t["resid"], res_mass=t["res_mass"],
        res_inv_mass=t["res_inv_mass"], res_members=t["res_members"],
        is_pair=t["is_pair"], is_parent=t["is_parent"],
        partner=t["partner"],
        nh_nkbt=spec_g.nh_nkbt, nh_eta_mass=spec_g.nh_eta_mass,
        nh_kbt_chain=spec_g.nh_kbt_chain,
        nh_link_active=spec_g.nh_link_active,
        dt=spec_g.dt, max_drude_distance=spec_g.max_drude_distance,
        hardwall_scale=spec_g.hardwall_scale,
        settle_idx=t["settle_idx"], settle_dist=t["settle_dist"],
        settle_gather=t["settle_gather"],
        shake_idx=t.get("shake_idx", jnp.zeros((0, 2), jnp.int32)),
        shake_dist=t.get("shake_dist", jnp.zeros((0,), rdt)),
        vs_avg_idx=t.get("vs_avg_idx", z3),
        vs_avg_p=t.get("vs_avg_p", jnp.zeros((0, 3), jnp.int32)),
        vs_avg_w=t.get("vs_avg_w", jnp.zeros((0, 3), rdt)),
        vs_oop_idx=t.get("vs_oop_idx", z3),
        vs_oop_p=t.get("vs_oop_p", jnp.zeros((0, 3), jnp.int32)),
        vs_oop_w=t.get("vs_oop_w", jnp.zeros((0, 3), rdt)),
        vs_lc_idx=t.get("vs_lc_idx", z3),
        vs_lc_p=t.get("vs_lc_p", jnp.zeros((0, 1), jnp.int32)),
        vs_lc_ow=t.get("vs_lc_ow", jnp.zeros((0, 1), rdt)),
        vs_lc_xw=t.get("vs_lc_xw", jnp.zeros((0, 1), rdt)),
        vs_lc_yw=t.get("vs_lc_yw", jnp.zeros((0, 1), rdt)),
        vs_lc_local=t.get("vs_lc_local", jnp.zeros((0, 3), rdt)),
        baro_pressure=spec_g.baro_pressure, baro_kt=spec_g.baro_kt,
    )


def local_static(static_g: StaticSpec, layout: ResidentLayout) -> StaticSpec:
    return dataclasses.replace(
        static_g,
        n_atoms=layout.n_loc,
        n_residues=layout.Rc + 1,
        n_settle=layout.Rc * layout.s_max,
        n_shake=layout.Rc * layout.sh_max,
        n_vsites_avg=layout.Rc * layout.va_max,
        n_vsites_oop=layout.Rc * layout.vo_max,
        n_vsites_lc=layout.Rc * layout.vl_max,
        # the local layout appends a Kd-atom dummy tail and parks unused
        # slots, breaking the uniform-block pattern the lane-shift
        # kinematics fast path assumes (likewise the lane-shift vsite
        # composition)
        uniform_k=0,
        partner_offsets=(),
        vs_comp_shifts=(),
        settle_uniform=(),
    )


# ---------------------------------------------------------------------------
# local cell sort and the halo-exchange sweep
# ---------------------------------------------------------------------------

def _local_cellsort(positions, valid, box_diag, cfg, layout, d):
    """Sort local atoms into this slab's cell planes [lo, hi).  x-cells are
    CLAMPED into the slab (owned molecules can stray <= 1 plane past it by
    construction; pair distances use true coordinates so the clamp only
    widens the stencil reach).  Invalid slots park at sentinel."""
    gx, gy, gz = cfg.grid
    loc_x = layout.loc_x
    C = cfg.capacity
    n_cells_loc = loc_x * gy * gz
    n_loc = positions.shape[0]
    grid = jnp.asarray(cfg.grid, jnp.int32)
    lo = d * loc_x

    frac = positions / box_diag
    frac = frac - jnp.floor(frac)
    cell3 = jnp.clip((frac * grid).astype(jnp.int32), 0, grid - 1)
    # periodic clamp into [lo, lo + loc_x): an atom of an owned molecule
    # can sit just past EITHER slab edge (including across the periodic
    # x boundary), so clamp to the NEAREST edge in periodic plane distance
    rel = jnp.remainder(cell3[:, 0] - lo, gx)
    cx = jnp.where(rel < loc_x, rel,
                   jnp.where(rel - (loc_x - 1) <= gx - rel, loc_x - 1, 0))
    flat = (cx * gy + cell3[:, 1]) * gz + cell3[:, 2]
    flat = jnp.where(valid, flat, n_cells_loc)

    order = jnp.argsort(flat)
    sorted_flat = flat[order]
    starts = jnp.searchsorted(sorted_flat,
                              jnp.arange(n_cells_loc,
                                         dtype=sorted_flat.dtype))
    in_range = sorted_flat < n_cells_loc
    rank = (jnp.arange(n_loc, dtype=jnp.int32)
            - starts[jnp.minimum(sorted_flat, n_cells_loc - 1)]
            .astype(jnp.int32))
    overflow = jnp.any(in_range & (rank >= C))
    slot = jnp.where(in_range,
                     sorted_flat.astype(jnp.int32) * C
                     + jnp.minimum(rank, C - 1),
                     n_cells_loc * C)
    slot_atom = jnp.full((n_cells_loc * C,), n_loc, jnp.int32)
    slot_atom = slot_atom.at[slot].set(order.astype(jnp.int32), mode="drop")
    # invalid atoms read the appended zero force row (index S)
    inv_slot = jnp.full((n_loc,), n_cells_loc * C, jnp.int32)
    inv_slot = inv_slot.at[order].set(
        jnp.where(in_range, slot, n_cells_loc * C), mode="drop")
    return slot_atom, inv_slot, overflow


def _sweep_local_e_f(tb, positions, box_diag, slot_atom, cfg, layout,
                     pair_eg, coulomb_scale):
    """(0.5-summed local energy, COMPLETE row forces (n_loc+1, 3)) of the
    direct-space sum, full +-stencil with the x-window widened by 2 planes
    (clamped binning margin).  Runs inside shard_map; ppermutes the halo
    planes of the sorted blocks around the ring."""
    gx, gy, gz = cfg.grid
    loc_x = layout.loc_x
    plane = gy * gz
    C = cfg.capacity
    n_cells_loc = loc_x * plane
    n_loc = positions.shape[0]
    n_dev = layout.n_dev
    axis = layout.axis
    dtype = positions.dtype
    cutoff2 = cfg.cutoff * cfg.cutoff
    W = cfg.excl_window
    w2 = cfg.window[0] + 2

    sa = slot_atom
    pad = sa >= n_loc
    safe = jnp.where(pad, 0, sa)
    blocks = {}
    for c, name in enumerate("xyz"):
        blocks[name] = jnp.where(pad, 1e6 * (1 + c),
                                 positions[safe, c]).reshape(n_cells_loc, C)
    blocks["q"] = jnp.where(pad, 0.0, tb["charge"][safe]).reshape(
        n_cells_loc, C)
    blocks["sig"] = jnp.where(pad, 1.0, tb["sigma"][safe]).reshape(
        n_cells_loc, C)
    blocks["eps"] = jnp.where(pad, 0.0, tb["eps"][safe]).reshape(
        n_cells_loc, C)
    blocks["gid"] = jnp.where(
        pad, -1 - sa, tb["gid"][safe]).reshape(n_cells_loc, C)
    for word in range(layout.n_words):
        blocks[f"ew{word}"] = jnp.where(
            pad, 0, tb["ew"][safe, word]).reshape(n_cells_loc, C)

    # ring halo exchange of w2 boundary planes each side
    halo = w2 * plane
    if n_dev > 1:
        perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        ext = {}
        for k, v in blocks.items():
            left = jax.lax.ppermute(v[n_cells_loc - halo:], axis, perm_fwd)
            right = jax.lax.ppermute(v[:halo], axis, perm_bwd)
            ext[k] = jnp.concatenate([left, v, right], axis=0)
    else:
        ext = {k: jnp.concatenate([v[n_cells_loc - halo:], v, v[:halo]],
                                  axis=0) for k, v in blocks.items()}

    def per_dim(ng, wd):
        if ng >= 2 * wd + 1:
            return list(range(-wd, wd + 1))
        return list(range(0, min(ng, 2 * wd + 1)))

    offsets = [(ox, oy, oz)
               for ox in range(-w2, w2 + 1)
               for oy in per_dim(gy, cfg.window[1])
               for oz in per_dim(gz, cfg.window[2])]

    base = jnp.arange(n_cells_loc, dtype=jnp.int32) + halo
    cy = (jnp.arange(n_cells_loc, dtype=jnp.int32) // gz) % gy
    cz = jnp.arange(n_cells_loc, dtype=jnp.int32) % gz

    single_word = layout.n_words == 1 and 2 * W + 1 <= 31

    def block_eg(b, self_mask):
        d = []
        r2 = jnp.zeros((), dtype)
        for c, k in enumerate("xyz"):
            dc = blocks[k][:, :, None] - ext[k][b][:, None, :]
            dc = dc - box_diag[c] * jnp.round(dc / box_diag[c])
            d.append(dc)
            r2 = r2 + dc * dc
        gid_a = blocks["gid"][:, :, None]
        gid_b = ext["gid"][b][:, None, :]
        base_ok = (gid_a >= 0) & (gid_b >= 0) & (gid_a != gid_b)
        if W > 0:
            dg = gid_b - gid_a
            in_win = jnp.abs(dg) <= W
            bit = jnp.where(in_win, dg + W, 0)
            if single_word:
                excl = in_win & (((blocks["ew0"][:, :, None] >> bit) & 1)
                                 == 1)
            else:
                excl = jnp.zeros_like(in_win)
                for word in range(layout.n_words):
                    hit = ((bit // 31 == word)
                           & (((blocks[f"ew{word}"][:, :, None]
                                >> (bit % 31)) & 1) == 1))
                    excl = excl | hit
                excl = in_win & excl
            excl = base_ok & excl
        else:
            excl = jnp.zeros_like(base_ok)
        valid = base_ok & (r2 < cutoff2)
        r2s = jnp.where(valid, jnp.maximum(r2, 1e-6), 1.0)
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        qq = (coulomb_scale * blocks["q"][:, :, None]
              * ext["q"][b][:, None, :])
        sig = 0.5 * (blocks["sig"][:, :, None] + ext["sig"][b][:, None, :])
        eps = jnp.sqrt(blocks["eps"][:, :, None] * ext["eps"][b][:, None, :])
        e, g = pair_eg(qq, sig, eps, r2s, inv_r, inv_r2, excl)
        e = jnp.where(valid, e, 0.0)
        g2 = jnp.where(valid, -2.0 * g, 0.0)
        return e, g2, d

    off_arr = jnp.asarray(offsets, jnp.int32)

    def one_offset(carry, o_idx):
        e_total, fx, fy, fz = carry
        off = off_arr[o_idx]
        ox, oy, oz = off[0], off[1], off[2]
        ny = (cy + oy) % gy
        nz = (cz + oz) % gz
        b = base + ox * plane + (ny - cy) * gz + (nz - cz)
        e, g2, dd = block_eg(b, False)
        return (e_total + 0.5 * jnp.sum(e),
                fx + jnp.sum(g2 * dd[0], axis=2),
                fy + jnp.sum(g2 * dd[1], axis=2),
                fz + jnp.sum(g2 * dd[2], axis=2)), None

    zero = jnp.zeros((n_cells_loc, C), dtype)
    carry = (jnp.zeros((), dtype), zero, zero, zero)
    (e_total, fx, fy, fz), _ = jax.lax.scan(
        one_offset, carry, jnp.arange(len(offsets)),
        # unroll=1 on CPU: the virtual-device emulation holds every
        # unrolled iteration's (n_cells_loc, C, C) temporaries live on
        # ONE host x 8 devices — at 1M atoms/8 slabs that is the
        # difference between fitting the 125 GB host and an OOM kill
        # (round-5 execution got past compile and died here)
        unroll=(1 if jax.default_backend() == "cpu" else 2))

    f_slots = jnp.stack([fx.reshape(-1), fy.reshape(-1), fz.reshape(-1)],
                        axis=1)
    f_slots = jnp.concatenate([f_slots, jnp.zeros((1, 3), dtype)])
    return e_total, f_slots


def _make_sweep_energy(cfg, layout, pair_eg, coulomb_scale):
    """custom-vjp local sweep energy: forward = 0.5-summed local pair
    energy (psum'd by the caller for the total), backward = the COMPLETE
    analytic row forces (full stencil covers both halves of every pair, so
    no force psum or reaction exchange is needed)."""

    @jax.custom_vjp
    def energy(tb_sub, positions, box_diag, slot_atom, inv_slot):
        e, _ = _sweep_local_e_f(tb_sub, positions, box_diag, slot_atom,
                                cfg, layout, pair_eg, coulomb_scale)
        return e

    def fwd(tb_sub, positions, box_diag, slot_atom, inv_slot):
        e, f_slots = _sweep_local_e_f(tb_sub, positions, box_diag,
                                      slot_atom, cfg, layout, pair_eg,
                                      coulomb_scale)
        return e, (f_slots[inv_slot], tb_sub, box_diag, slot_atom,
                   inv_slot)

    def bwd(res, g):
        f, tb_sub, box_diag, slot_atom, inv_slot = res
        zc = cp._zero_cotangent
        return (jax.tree.map(zc, tb_sub), g * (-f),
                jax.tree.map(zc, box_diag), zc(slot_atom), zc(inv_slot))

    energy.defvjp(fwd, bwd)
    return energy


# ---------------------------------------------------------------------------
# molecule-local pair-list terms (exclusion corrections, exceptions)
# ---------------------------------------------------------------------------

def _mol_pair_e_f(positions, box_diag, ii, jj, inc, e_row, g_row):
    """Energy + incidence-gathered analytic forces for a molecule-local
    pair list ((3, .) layout per CLAUDE.md perf rules).  e_row/g_row are
    per-row energy and dE/dr^2 (already parameter-weighted)."""
    pos_t = positions.T                          # (3, n_loc)
    delta = pos_t[:, ii] - pos_t[:, jj]          # (3, P) intra-molecular:
    r2 = jnp.sum(delta * delta, axis=0)          # no imaging needed
    r2s = jnp.maximum(r2, 1e-10)
    e, g = e_row(r2s, r2), g_row(r2s, r2)
    fpair = (-2.0 * g)[None, :] * delta
    flat = jnp.concatenate([fpair, -fpair, jnp.zeros((3, 1), fpair.dtype)],
                           axis=1)
    forces = jnp.sum(flat[:, inc], axis=2).T     # (n_loc, 3)
    return jnp.sum(e), forces


def _make_mol_pair_energy(eg_maker):
    """custom-vjp energy for a molecule-local pair term.  eg_maker(prm) ->
    (e_row, g_row) closing over the traced per-row parameter arrays."""

    @jax.custom_vjp
    def energy(positions, box_diag, ii, jj, inc, prm):
        e_row, g_row = eg_maker(prm)
        return _mol_pair_e_f(positions, box_diag, ii, jj, inc,
                             e_row, g_row)[0]

    def fwd(positions, box_diag, ii, jj, inc, prm):
        e_row, g_row = eg_maker(prm)
        e, f = _mol_pair_e_f(positions, box_diag, ii, jj, inc,
                             e_row, g_row)
        return e, (f, box_diag, ii, jj, inc, prm)

    def bwd(res, g):
        f, box_diag, ii, jj, inc, prm = res
        zc = cp._zero_cotangent
        return (g * (-f), jax.tree.map(zc, box_diag), zc(ii), zc(jj),
                zc(inc), jax.tree.map(zc, prm))

    energy.defvjp(fwd, bwd)
    return energy


def _corr_eg_maker(alpha):
    """Ewald reciprocal-exclusion correction -qq erf(ar)/r
    (forces/pairterms.ewald_correction_eg, array-parametrized)."""
    two_over_sqrt_pi = 2.0 / np.sqrt(np.pi)

    def maker(prm):
        qq = prm["qq"]

        def e_row(r2s, r2):
            near0 = r2 < 1e-10
            inv_r = jax.lax.rsqrt(r2s)
            r = r2s * inv_r
            ar = alpha * r
            return -qq * jnp.where(near0, two_over_sqrt_pi * alpha,
                                   jax.scipy.special.erf(ar) * inv_r)

        def g_row(r2s, r2):
            near0 = r2 < 1e-10
            inv_r = jax.lax.rsqrt(r2s)
            inv_r2 = inv_r * inv_r
            r = r2s * inv_r
            ar = alpha * r
            erf_ar = jax.scipy.special.erf(ar)
            dedr = -qq * (two_over_sqrt_pi * alpha * jnp.exp(-ar * ar)
                          - erf_ar * inv_r) * inv_r
            return jnp.where(near0, 0.0, 0.5 * dedr * inv_r)

        return e_row, g_row

    return maker


def _exception_eg_maker(prm):
    """OpenMM exception pair LJ + plain Coulomb (qq pre-scaled)."""
    qq, sigma, eps = prm["qq"], prm["sig"], prm["eps"]

    def e_row(r2s, r2):
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        x6 = (sigma * sigma * inv_r2) ** 3
        return 4.0 * eps * x6 * (x6 - 1.0) + qq * inv_r

    def g_row(r2s, r2):
        inv_r = jax.lax.rsqrt(r2s)
        inv_r2 = inv_r * inv_r
        x6 = (sigma * sigma * inv_r2) ** 3
        return (-4.0 * eps * (6.0 * x6 * x6 - 3.0 * x6) * inv_r2
                - 0.5 * qq * inv_r2 * inv_r)

    return e_row, g_row


# ---------------------------------------------------------------------------
# the local energy/forces engine
# ---------------------------------------------------------------------------

def _make_local_eaf(layout: ResidentLayout, spec_loc, static_loc, tables,
                    cfg, pair_eg, coulomb_scale, pme, drude_energy,
                    pme_self, disp, bonded_fns=(), nt_tab=None):
    """energy_and_forces(positions, box, neighbors, pos_err) over the
    LOCAL state (inside shard_map).  Forces are complete per owned atom (no
    psum); the reported energy is the exact psum'd total."""
    from ..constraints.vsites import apply_vsites

    axis = layout.axis
    n_dev = layout.n_dev
    sweep_energy = _make_sweep_energy(cfg, layout, pair_eg, coulomb_scale)
    tb_sub = {k: tables[k] for k in ("charge", "sigma", "eps", "gid", "ew")}
    corr_energy = (_make_mol_pair_energy(_corr_eg_maker(pme.alpha))
                   if (pme is not None and layout.e_max) else None)
    exc_energy = (_make_mol_pair_energy(_exception_eg_maker)
                  if layout.x_max else None)
    valid = tables["valid"]

    @jax.custom_vjp
    def psum_grid(q):
        return jax.lax.psum(q, axis)

    def _psum_grid_fwd(q):
        return jax.lax.psum(q, axis), None

    def _psum_grid_bwd(_, g):
        return (g,)

    psum_grid.defvjp(_psum_grid_fwd, _psum_grid_bwd)

    def eaf(positions, box, neighbors, pos_err=None):
        box_diag = jnp.diagonal(box)
        slot_atom, inv_slot = neighbors.slot_atom, neighbors.inv_slot

        def local_energy(pos):
            posv = apply_vsites(spec_loc, static_loc, pos)
            e = sweep_energy(tb_sub, posv, box_diag, slot_atom, inv_slot)
            if drude_energy is not None:
                e = e + drude_energy(tables["drude_params"], posv, box,
                                     pos_err=pos_err)
            if corr_energy is not None:
                c = tables["corr"]
                e = e + corr_energy(posv, box_diag, c["ii"], c["jj"],
                                    c["inc"], {"qq": c["qq"]})
            if exc_energy is not None:
                c = tables["exc"]
                e = e + exc_energy(posv, box_diag, c["ii"], c["jj"],
                                   c["inc"], {"qq": c["qq"],
                                              "sig": c["sig"],
                                              "eps": c["eps"]})
            for fn, key in bonded_fns:
                e = e + fn(tables[key], posv, box)
            if nt_tab is not None:
                # NBTHOLE as a dense block over class-tagged sites: local
                # sites are compacted (fixed capacity, counted at rebuild
                # by the nt_overflow latch) and all_gather'd; each device
                # evaluates its rows against every global site, so the
                # backward pass (all_gather transposes to psum_scatter)
                # leaves COMPLETE forces on owned atoms.  The half factor
                # makes the psum'd energy count each pair once.  Math per
                # forces/drude._nbthole_energy (signs live in nt_w).
                from ..units import ONE_4PI_EPS0
                ncap = layout.nt_cap
                active = (tables["nt_class"] > 0) & valid
                idx = jnp.nonzero(active, size=ncap, fill_value=0)[0]
                ok = jnp.arange(ncap) < jnp.sum(active)
                w_i = jnp.where(ok, tables["nt_w"][idx], 0.0)
                c_i = jnp.where(ok, tables["nt_class"][idx], 0)
                m_i = jnp.where(ok, tables["mol_gid"][idx], -1)
                p_i = posv[idx]                                 # (ncap, 3)
                pj = jax.lax.all_gather(p_i, axis).reshape(-1, 3)
                wj = jax.lax.all_gather(w_i, axis).reshape(-1)
                cj = jax.lax.all_gather(c_i, axis).reshape(-1)
                mj = jax.lax.all_gather(m_i, axis).reshape(-1)
                delta = p_i[:, None, :] - pj[None, :, :]
                delta = delta - box_diag * jnp.round(delta / box_diag)
                r2 = jnp.sum(delta * delta, axis=-1)
                r = jnp.sqrt(jnp.maximum(r2, 1e-12))
                scale = nt_tab[c_i[:, None], cj[None, :]]
                mask = (scale > 0.0) & (m_i[:, None] != mj[None, :])
                u = scale * r
                deficit = -(1.0 + 0.5 * u) * jnp.exp(-u)
                e = e + 0.5 * ONE_4PI_EPS0 * jnp.sum(jnp.where(
                    mask, (w_i[:, None] * wj[None, :]) * deficit / r, 0.0))
            vol = box_diag[0] * box_diag[1] * box_diag[2]
            e = e + (pme_self + disp / vol) / n_dev
            if pme is not None:
                Q = psum_grid(pme.spread(tables["charge"], posv, box_diag))
                e_pme = pme.energy_of_grid(Q, box_diag)
            else:
                e_pme = jnp.zeros((), posv.dtype)
            return e + e_pme, (e, e_pme)

        (_, (e_var, e_pme)), g = jax.value_and_grad(
            local_energy, has_aux=True)(positions)
        pe = jax.lax.psum(e_var, axis) + e_pme
        forces = jnp.where(valid[:, None], -g, 0.0)
        return pe, forces

    return eaf


# ---------------------------------------------------------------------------
# migration
# ---------------------------------------------------------------------------

def _migrate(layout: ResidentLayout, cfg, box_diag, d, pos, vel, force,
             pos_err, mol_type, mol_base, n_mol):
    """Move molecules whose anchor crossed into an adjacent slab.  Returns
    (pos, vel, force, pos_err, mol_type, mol_base, n_mol, overflow)."""
    Rc, K, Kd, Ec = layout.Rc, layout.K, layout.Kd, layout.Ec
    n_dev, axis = layout.n_dev, layout.axis
    gx = cfg.grid[0]
    r = jnp.arange(Rc)
    used = r < n_mol

    def mol_view(a):
        return a[:Rc * K].reshape(Rc, K, -1)

    payload = {"type": mol_type, "base": mol_base,
               "pos": mol_view(pos), "vel": mol_view(vel),
               "force": mol_view(force)}
    if pos_err is not None:
        payload["err"] = mol_view(pos_err)

    fracx = payload["pos"][:, 0, 0] / box_diag[0]
    fracx = fracx - jnp.floor(fracx)
    plane = jnp.clip((fracx * gx).astype(jnp.int32), 0, gx - 1)
    owner = plane // layout.loc_x
    go_r = used & (owner == (d + 1) % n_dev)
    go_l = used & (owner == (d - 1 + n_dev) % n_dev)
    if n_dev <= 2:
        # left and right neighbors coincide (or are self): send right only
        go_r = go_r | go_l
        go_l = jnp.zeros_like(go_l)
    too_far = used & (owner != d) & ~go_r & ~go_l
    stay = used & ~go_r & ~go_l

    def pack(go):
        key = jnp.where(go, r, Rc + r)
        order = jnp.argsort(key)[:Ec]
        sent = jax.tree.map(lambda a: a[order], payload)
        return sent, go[order], jnp.sum(go)

    sent_r, val_r, n_r = pack(go_r)
    sent_l, val_l, n_l = pack(go_l)
    overflow = (n_r > Ec) | (n_l > Ec) | jnp.any(too_far)

    if n_dev > 1:
        perm_fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        perm_bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        recv_l = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm_fwd),
                              sent_r)
        rv_l = jax.lax.ppermute(val_r, axis, perm_fwd)
        recv_r = jax.tree.map(lambda a: jax.lax.ppermute(a, axis, perm_bwd),
                              sent_l)
        rv_r = jax.lax.ppermute(val_l, axis, perm_bwd)
    else:
        recv_l, rv_l = sent_r, val_r
        recv_r, rv_r = sent_l, val_l

    big = Rc + 2 * Ec + 1
    keys = jnp.concatenate([jnp.where(stay, r, big),
                            jnp.where(rv_l, Rc + jnp.arange(Ec), big),
                            jnp.where(rv_r, Rc + Ec + jnp.arange(Ec), big)])
    order = jnp.argsort(keys)[:Rc]
    merged = jax.tree.map(
        lambda a, bl, br: jnp.concatenate([a, bl, br])[order],
        payload, recv_l, recv_r)
    new_n = (jnp.sum(stay) + jnp.sum(rv_l) + jnp.sum(rv_r)).astype(jnp.int32)
    overflow = overflow | (new_n > Rc)

    dummy = jnp.asarray(_dummy_positions(Kd), pos.dtype)
    zero_d = jnp.zeros((Kd, 3), pos.dtype)

    def unview(m, tail):
        return jnp.concatenate([m.reshape(Rc * K, 3), tail])

    pos_n = unview(merged["pos"], dummy)
    vel_n = unview(merged["vel"], zero_d)
    force_n = unview(merged["force"], zero_d)
    err_n = unview(merged["err"], zero_d) if pos_err is not None else None
    return (pos_n, vel_n, force_n, err_n, merged["type"], merged["base"],
            new_n, overflow)


# ---------------------------------------------------------------------------
# the driver
# ---------------------------------------------------------------------------

class ResidentContext:
    """Run a Context's simulation with molecule-sharded (state-resident)
    domain decomposition over `mesh[axis]`.

        mesh = Mesh(np.array(jax.devices()).reshape(-1), ("atom",))
        rctx = ResidentContext(ctx, mesh)
        rctx.step(1000)
        pos = rctx.positions()        # global atom order

    Stepping matches the single-device Context step to reduction-order
    rounding (tests/test_resident.py).  Guards: molecule-slot or emigrant
    overflow and a >1-slab anchor jump latch and raise on the host."""

    def __init__(self, context, mesh: Mesh, axis: str = "atom",
                 Rc: int = None, Ec: int = None):
        context._ensure_forces()
        self._ctx = context
        self._mesh = mesh
        self._axis = axis
        n_dev = mesh.shape[axis]

        tp, mol_type, mol_base, mx = analyze(context)
        self._bonded_fns = tuple(mx.pop("bonded_fns"))
        nt_tab = mx.pop("nt_tab")
        nb_fn = next(t[0] for t in context._terms
                     if hasattr(t[0], "cellpair_cfg"))
        cfg = nb_fn.cellpair_cfg
        self._cfg = cfg
        gx = cfg.grid[0]
        if gx % n_dev:
            raise ValueError(f"cell grid x dim {gx} not divisible by "
                             f"{n_dev} devices")
        loc_x = gx // n_dev
        w2 = cfg.window[0] + 2
        if n_dev > 1 and loc_x < w2:
            raise ValueError(
                f"slab x-extent {loc_x} planes < halo {w2}; use fewer "
                f"devices or a larger box")

        # initial owners (anchor = first atom's x)
        pos0 = np.asarray(context._state.positions, np.float64)
        box0 = np.diagonal(np.asarray(context._state.box, np.float64))
        R = len(mol_type)
        self._n_mol_global = R
        anchor = pos0[mol_base, 0] / box0[0]
        anchor = anchor - np.floor(anchor)
        plane = np.clip((anchor * gx).astype(np.int64), 0, gx - 1)
        owner = plane // loc_x
        counts = np.bincount(owner, minlength=n_dev)
        if Rc is None:
            Rc = max(int(np.ceil(counts.max() * 1.3)) + 2, 4)
        if Ec is None:
            Ec = max(int(Rc * 0.15), 4)
        K = tp["mass"].shape[1]
        nt_cap = 0
        if nt_tab is not None:
            per_type = (tp["nt_class"] > 0).sum(axis=1)     # sites/type
            site_counts = np.array([
                per_type[mol_type[owner == dev]].sum()
                for dev in range(n_dev)])
            nt_cap = max(int(np.ceil(site_counts.max() * 1.35)) + 4, 8)
            if n_dev * nt_cap > 16384:
                raise NotImplementedError(
                    f"NBTHOLE dense fold-in would gather {n_dev * nt_cap} "
                    "sites (> 16384); too many NBTHOLE sites for resident "
                    "mode")
        self._layout = ResidentLayout(
            n_dev=n_dev, axis=axis, K=K, Rc=Rc, Ec=Ec,
            s_max=mx["s_max"], va_max=mx["va_max"], vo_max=mx["vo_max"],
            vl_max=mx["vl_max"], lc_k=mx["lc_k"], d_max=mx["d_max"],
            sp_max=mx["sp_max"], e_max=mx["e_max"], x_max=mx["x_max"],
            b_max=mx["b_max"], a_max=mx["a_max"], t_max=mx["t_max"],
            sh_max=mx["sh_max"],
            inc_k=mx["inc_k"], n_words=mx["n_words"], loc_x=loc_x,
            has_aniso1=mx["has_aniso1"], has_aniso2=mx["has_aniso2"],
            Kd=max(K, 5), nt_cap=nt_cap)
        layout = self._layout

        rdt = context._state.positions.dtype
        self._rdt = rdt
        self._tpl = Templates(**{
            k: jnp.asarray(
                v, rdt if np.asarray(v).dtype == np.float64 else None)
            for k, v in tp.items()})
        self._tp_np = tp
        self._mol_sizes = tp["valid"].sum(axis=1)

        # pieces of the force engine
        self._pair_eg = nb_fn.pair_eg
        self._coulomb_scale = nb_fn.coulomb_scale
        self._pme = nb_fn.pme_setup
        self._pme_self = nb_fn.pme_self_const
        self._disp = (float(nb_fn.disp_const)
                      if nb_fn.disp_const is not None else 0.0)
        drude_term = next((t for t in context._terms
                           if getattr(t[0], "wants_pos_err", False)), None)
        self._drude_energy = drude_term[0] if drude_term else None
        self._nt_tab = (jnp.asarray(nt_tab, rdt)
                        if nt_tab is not None else None)
        self._static_loc = local_static(context._static, layout)
        self._rebuild_interval = context._rebuild_interval

        # ---- initial resident state ----------------------------------
        st = context._state
        n_loc = layout.n_loc
        pos_g = np.zeros((n_dev, n_loc, 3), rdt)
        vel_g = np.zeros((n_dev, n_loc, 3), rdt)
        force_g = np.zeros((n_dev, n_loc, 3), rdt)
        err_g = (np.zeros((n_dev, n_loc, 3), rdt)
                 if st.pos_err is not None else None)
        type_g = np.zeros((n_dev, Rc), np.int32)
        base_g = np.zeros((n_dev, Rc), np.int32)
        nmol_g = np.zeros((n_dev,), np.int32)
        dummy = _dummy_positions(layout.Kd)
        pos_np = np.asarray(st.positions, rdt)
        vel_np = np.asarray(st.velocities, rdt)
        force_np = np.asarray(st.forces, rdt)
        err_np = (np.asarray(st.pos_err, rdt)
                  if st.pos_err is not None else None)
        members = np.asarray(context._spec.res_members, np.int64)
        n_atoms = context._static.n_atoms
        for dev in range(n_dev):
            mols = np.nonzero(owner == dev)[0]
            if len(mols) > Rc:
                raise ValueError(
                    f"initial molecule count {len(mols)} on device {dev} "
                    f"exceeds capacity {Rc}")
            nmol_g[dev] = len(mols)
            pos_g[dev, Rc * K:] = dummy
            for slot, m in enumerate(mols):
                type_g[dev, slot] = mol_type[m]
                base_g[dev, slot] = mol_base[m]
                A = members[m]
                sel = A < n_atoms
                dst = slice(slot * K, slot * K + int(sel.sum()))
                pos_g[dev, dst] = pos_np[A[sel]]
                vel_g[dev, dst] = vel_np[A[sel]]
                force_g[dev, dst] = force_np[A[sel]]
                if err_np is not None:
                    err_g[dev, dst] = err_np[A[sel]]

        S = loc_x * cfg.grid[1] * cfg.grid[2] * cfg.capacity
        acc = st.eta.dtype
        self._st = {
            "pos": jnp.asarray(pos_g.reshape(-1, 3)),
            "vel": jnp.asarray(vel_g.reshape(-1, 3)),
            "force": jnp.asarray(force_g.reshape(-1, 3)),
            "mol_type": jnp.asarray(type_g.reshape(-1)),
            "mol_base": jnp.asarray(base_g.reshape(-1)),
            "n_mol": jnp.asarray(nmol_g),
            "slot_atom": jnp.zeros((n_dev * S,), jnp.int32),
            "inv_slot": jnp.zeros((n_dev * n_loc,), jnp.int32),
            "cs_overflow": jnp.zeros((n_dev,), bool),
            "mig_overflow": jnp.zeros((n_dev,), bool),
            "nt_overflow": jnp.zeros((n_dev,), bool),
            "hw": jnp.zeros((n_dev,), bool),
            "eta": st.eta, "eta_dot": st.eta_dot,
            "eta_dot_dot": st.eta_dot_dot,
            "ke_sum": st.ke_sum, "group_ke": st.group_ke,
            "step": st.step, "time": st.time, "box": st.box,
            "pe": st.potential_energy,
            "key": st.key, "baro_scale": st.baro_scale,
            "baro_na": st.baro_naccept, "baro_nt": st.baro_nattempt,
            "stencil": jnp.zeros((n_dev,), bool),
        }
        if err_np is not None:
            self._st["pos_err"] = jnp.asarray(err_g.reshape(-1, 3))

        ax = P(axis)
        ax2 = P(axis, None)
        self._specs = {
            "pos": ax2, "vel": ax2, "force": ax2,
            "mol_type": ax, "mol_base": ax, "n_mol": ax,
            "slot_atom": ax, "inv_slot": ax,
            "cs_overflow": ax, "mig_overflow": ax, "nt_overflow": ax,
            "hw": ax, "stencil": ax,
            "eta": P(), "eta_dot": P(), "eta_dot_dot": P(),
            "ke_sum": P(), "group_ke": P(), "step": P(), "time": P(),
            "box": P(), "pe": P(),
            "key": P(), "baro_scale": P(), "baro_na": P(), "baro_nt": P(),
        }
        if "pos_err" in self._st:
            self._specs["pos_err"] = ax2

        self._spec_g = context._spec
        self._seg_fns = {}
        self._reb_fn = None

    # -- jitted builders ---------------------------------------------------
    def _local_setup(self, st):
        layout, tpl = self._layout, self._tpl
        tables = _local_tables(tpl, layout, st["mol_type"], st["mol_base"],
                               st["n_mol"][0], self._rdt)
        spec_loc = _local_spec(self._spec_g, tables, self._rdt)
        return tables, spec_loc

    def _sim_from(self, st, tables):
        from ..forces.cellpair import CellSort
        n_loc = self._layout.n_loc
        cs = CellSort(
            slot_atom=st["slot_atom"], inv_slot=st["inv_slot"],
            overflow=st["cs_overflow"][0], ref_positions=st["pos"],
            image=jnp.zeros((n_loc, 3), jnp.int32),
            stencil_invalid=jnp.zeros((), bool),
            drift_exceeded=jnp.zeros((), bool))
        acc = st["eta"].dtype
        return SimState(
            positions=st["pos"], velocities=st["vel"], forces=st["force"],
            potential_energy=st["pe"], box=st["box"], eta=st["eta"],
            eta_dot=st["eta_dot"], eta_dot_dot=st["eta_dot_dot"],
            ke_sum=st["ke_sum"], group_ke=st["group_ke"], step=st["step"],
            time=st["time"], key=st["key"],
            baro_scale=st["baro_scale"],
            baro_naccept=st["baro_na"],
            baro_nattempt=st["baro_nt"],
            hardwall_runaway=st["hw"][0],
            neighbors=cs,
            pos_err=st.get("pos_err"))

    def _pack(self, st, sim):
        out = dict(st)
        out.update(
            pos=sim.positions, vel=sim.velocities, force=sim.forces,
            pe=sim.potential_energy, eta=sim.eta, eta_dot=sim.eta_dot,
            eta_dot_dot=sim.eta_dot_dot, ke_sum=sim.ke_sum,
            group_ke=sim.group_ke, step=sim.step, time=sim.time,
            box=sim.box, key=sim.key, baro_scale=sim.baro_scale,
            baro_na=sim.baro_naccept, baro_nt=sim.baro_nattempt,
            hw=sim.hardwall_runaway[None])
        if sim.pos_err is not None:
            out["pos_err"] = sim.pos_err
        return out

    def _get_reb(self):
        if self._reb_fn is not None:
            return self._reb_fn
        layout, cfg = self._layout, self._cfg

        def reb(st):
            d = jax.lax.axis_index(layout.axis)
            box_diag = jnp.diagonal(st["box"])
            (pos, vel, force, err, ty, base, n_mol, ovf) = _migrate(
                layout, cfg, box_diag, d, st["pos"], st["vel"], st["force"],
                st.get("pos_err"), st["mol_type"], st["mol_base"],
                st["n_mol"][0])
            out = dict(st)
            out.update(pos=pos, vel=vel, force=force, mol_type=ty,
                       mol_base=base, n_mol=n_mol[None],
                       mig_overflow=(st["mig_overflow"][0] | ovf)[None])
            if err is not None:
                out["pos_err"] = err
            tables, _ = None, None
            tb = _local_tables(self._tpl, layout, ty, base, n_mol,
                               self._rdt)
            slot_atom, inv_slot, cs_ovf = _local_cellsort(
                pos, tb["valid"], box_diag, cfg, layout, d)
            # NPT guard (forces/cellpair.build_cellsort): the static
            # stencil covers r_list only while window_d * cell_d >= r_list
            # — a barostat-shrunk box can violate this silently
            wcell = (jnp.asarray(cfg.window, box_diag.dtype) * box_diag
                     / jnp.asarray(cfg.grid, box_diag.dtype))
            sten = jnp.any(wcell < cfg.r_list)
            out.update(slot_atom=slot_atom, inv_slot=inv_slot,
                       cs_overflow=(st["cs_overflow"][0] | cs_ovf)[None],
                       stencil=(st["stencil"][0] | sten)[None])
            if layout.nt_cap:
                # NBTHOLE site count only changes at migration (class
                # membership is type-static), so the compaction capacity
                # is checked here, not in the hot step
                n_nt = jnp.sum((tb["nt_class"] > 0) & tb["valid"])
                out["nt_overflow"] = (st["nt_overflow"][0]
                                      | (n_nt > layout.nt_cap))[None]
            return out

        fn = _shard_map(reb, self._mesh, in_specs=(self._specs,),
                        out_specs=self._specs)
        self._reb_fn = jax.jit(fn)
        return self._reb_fn

    def _get_seg(self, inner: int):
        fn = self._seg_fns.get(inner)
        if fn is not None:
            return fn
        layout = self._layout

        def seg(st):
            tables, spec_loc = self._local_setup(st)
            eaf = _make_local_eaf(
                layout, spec_loc, self._static_loc, tables, self._cfg,
                self._pair_eg, self._coulomb_scale, self._pme,
                self._drude_energy, self._pme_self, self._disp,
                bonded_fns=self._bonded_fns, nt_tab=self._nt_tab)
            # NH-pair fused scan (tgnh._make_multi_step_fused): one psum'd
            # KE measurement serves the adjacent NH halves of consecutive
            # steps — halves the per-step global communication too (the
            # (G+2) KE psum is TGNH's only inner-loop collective)
            multi = tgnh.make_multi_step(self._static_loc, eaf, inner,
                                         reduce_axis=layout.axis,
                                         baro_n_mol=self._n_mol_global)
            sim = self._sim_from(st, tables)
            sim = multi(spec_loc, sim)
            return self._pack(st, sim)

        fn = jax.jit(_shard_map(seg, self._mesh, in_specs=(self._specs,),
                                out_specs=self._specs))
        self._seg_fns[inner] = fn
        return self._seg_fns[inner]

    # -- public API --------------------------------------------------------
    def step(self, steps: int) -> None:
        steps = int(steps)
        reb = self._get_reb()
        with self._mesh:
            remaining = steps
            while remaining > 0:
                k = min(self._rebuild_interval, remaining)
                self._st = reb(self._st)
                self._st = self._get_seg(k)(self._st)
                remaining -= k
        if bool(jnp.any(self._st["mig_overflow"])):
            raise RuntimeError(
                "resident migration overflow (emigrant/slot capacity or a "
                ">1-slab anchor jump) — raise Rc/Ec or rebuild the context")
        if bool(jnp.any(self._st["cs_overflow"])):
            raise RuntimeError("resident cell-capacity overflow")
        if bool(jnp.any(self._st["nt_overflow"])):
            raise RuntimeError(
                "resident NBTHOLE site-capacity overflow — migrations "
                "concentrated NBTHOLE sites past the planned per-device "
                "capacity; rebuild the context")
        if bool(jnp.any(self._st["stencil"])):
            raise RuntimeError(
                "cell stencil no longer covers the cutoff (NPT box shrank "
                "past the compile-time grid plan) — rebuild the context")
        if bool(jnp.any(self._st["hw"])) and self._ctx._hardwall_strict:
            raise RuntimeError(
                "Drude particle moved too far beyond the hard wall")

    def positions(self) -> np.ndarray:
        return self._gather("pos")

    def velocities(self) -> np.ndarray:
        return self._gather("vel")

    @property
    def state(self):
        return self._st

    def _gather(self, field: str) -> np.ndarray:
        layout = self._layout
        n_dev, Rc, K = layout.n_dev, layout.Rc, layout.K
        vals = np.asarray(self._st[field]).reshape(n_dev, layout.n_loc, 3)
        types = np.asarray(self._st["mol_type"]).reshape(n_dev, Rc)
        bases = np.asarray(self._st["mol_base"]).reshape(n_dev, Rc)
        nm = np.asarray(self._st["n_mol"])
        n = self._ctx._static.n_atoms
        out = np.zeros((n, 3), vals.dtype)
        goff = self._tp_np["gid_off"]
        gvalid = self._tp_np["valid"]
        for dev in range(n_dev):
            for slot in range(int(nm[dev])):
                t = types[dev, slot]
                sel = gvalid[t]
                out[bases[dev, slot] + goff[t][sel]] = (
                    vals[dev, slot * K:(slot + 1) * K][sel])
        return out
