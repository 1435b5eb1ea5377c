"""Irregular-grid (Voronoi) wavefront sweep, TPU-native.

Reference parity: src/irregular_ray_tracing.jl (Delaunay_upII/_downII):
BFS layers from the boundary wall; within each layer n_sweeps relaxation
passes; per site, blend the formal solutions along the two most-upwind
Delaunay edges (the edge IS the characteristic -- intensities are read at
upwind sites directly, no interpolation).

TPU design: the per-site serial loop becomes a **slot-ordered** scan.
Sites are renumbered per direction into schedule order so that every
level/layer/bin occupies a contiguous row range of a (n_slots, B) array:

  [ boundary sites | stage-0 row 0 | stage-0 row 1 | ... | stage-k rows ]

The per-level update is then
  gather upwinds (one flat jnp.take)  ->  fused FMA formal solution
  ->  jax.lax.dynamic_update_slice  (contiguous, no scatter!)
which measures ~15x faster than the scatter/fancy-gather formulation on
TPU (scatters and multi-dim gathers lower to scalar element loops; flat
row-takes and DUS vectorize across the trailing lane axis).

lax.scan walks the levels (the irreducibly sequential wavefront
direction); within a level all sites and the wavelength batch update
simultaneously.  The reference's in-layer Gauss-Seidel order is
reproduced EXACTLY by the occurrence-resolved gs schedule
(grid/voronoi.py _gs_layer_schedule): each site gets one slot per pass
and readers target the occurrence of the pass their value must come
from, so parallel rows with Jacobi reads give bitwise Gauss-Seidel
semantics (pinned end-to-end by tests/test_nlte_parity.py).

Ordering modes (grid/voronoi.py build_voronoi_plan):
  'layer' (default, reference parity): BFS wall-distance layers,
    n_sweeps exact Gauss-Seidel passes per layer.  Fixed pass counts
    truncate horizontal propagation -- at grazing angles (10 of the 12
    production ul7n12 directions have |mu| <= 0.42) most of a
    zero-opacity beam is lost.
  'wavefront': exact Kahn levels over the 2-upwind dependency DAG (one
    pure-gather pass per level, every upwind already final) plus
    s = pos.k sorted bins with global repeats for seam-wrapping chains.
    Reaches the global fixed point of the per-site equations (tests).

Shapes: public API takes fields (B, n); slot arrays carry one extra
zero row (the dummy slot) so padded upwind entries gather harmlessly.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .formal import linear_weights


# ------------------------------------------------------------ slot plan

@dataclasses.dataclass(frozen=True)
class SlotStage:
    """One schedule stage in slot order.

    Rows [base + l*W, base + (l+1)*W) of the slot array are level l.
    up/w/r: (L, W, 2) upwind SLOT ids / blend weights / path lengths.
    passes: Jacobi passes per level (1 for exact topological levels).
    repeats: global repeats of the stage (seam-wrapping relaxation).
    kind: 'exact' | 'relax' | 'gs' | 'layer'.  Only 'relax' stages can
    repeat; repeats is therefore a TRACED scalar in the device sweep so
    directions with different repeat counts share one compiled kernel.
    """
    base: int
    L: int
    W: int
    up: np.ndarray
    w: np.ndarray
    r: np.ndarray
    passes: int
    repeats: int
    kind: str = "exact"


@dataclasses.dataclass(frozen=True)
class SlotPlan:
    n_slots: int
    n_bc: int
    slot_gather: np.ndarray   # (n_slots,) site id per slot (clipped pad)
    site_gather: np.ndarray   # (n,) slot id per site
    stages: tuple


def _schedule_stages(plan, n_sweeps):
    """(schedule (L,W), passes, kind, repeats, occ) in execution order."""
    if getattr(plan, "exact_levels", None) is not None or \
            getattr(plan, "relax_levels", None) is not None:
        out = []
        if plan.exact_levels is not None:
            out.append((plan.exact_levels, 1, "exact", 1, None))
        if plan.relax_levels is not None:
            out.append((plan.relax_levels, 1, "relax",
                        int(getattr(plan, "relax_repeats", 1)), None))
        return out
    if getattr(plan, "gs_levels", None) is not None:
        # exact Gauss-Seidel row order (grid/voronoi.py
        # _gs_layer_schedule): n_sweeps is already baked into the rows
        return [(plan.gs_levels, 1, "gs", 1,
                 getattr(plan, "gs_up_occ", None))]
    return [(plan.layer_sites, n_sweeps, "layer", 1, None)]


def _bucket(x):
    """Round x up on a ~1/16-relative power-of-two grid.

    The 12 per-direction slot plans have nearly identical but not equal
    stage shapes (level counts/widths spread ~1-6% across directions at
    production scale); padding every shape up to the next point of a
    coarse grid collapses them to ONE jit cache entry per stage kind
    instead of 12 full Mosaic/XLA compiles (the 442k-site production
    bench spent 1341 of 1519 s compiling).  Worst-case padding is 1/16
    of the array (grid step = 2^(bits-4)); pad rows read the dummy zero
    slot with weight 0 and write zeros to pad slots, so real-site
    results are bitwise unchanged (tests/test_sweep_voronoi.py)."""
    if x <= 8:
        return int(x)
    g = 1 << max(int(x).bit_length() - 4, 3)
    return int(-(-x // g) * g)


def share_plan_shapes(plans, n_sweeps=3):
    """Attach common pad targets to a set of direction plans.

    Directions with the same stage structure (tuple of stage kinds) are
    grouped; every member is padded to the group's maximum per-stage
    (L, W), bc count and slot count, so their slot plans have IDENTICAL
    traced shapes and the whole group shares ONE `_sweep_slots` compile
    (repeat counts are traced).  The 442k-site production bench spent
    1341 of 1519 s in 12 per-direction compiles; with shared shapes the
    ul7n12 quadrature needs one compile per group (typically 2: the
    exact-only and the exact+relax directions).  Padding cost is the
    max-vs-own shape difference (~1-2% at production scale where the
    12 directions' schedules are near-identical in size).

    Call after building all plans for a quadrature and before the first
    sweep; sweep results are bitwise unchanged (pad rows read the dummy
    zero slot with weight 0 and write zeros to pad slots).
    """
    groups = {}
    for p in plans:
        raw = _schedule_stages(p, n_sweeps)
        # cluster key: stage kinds + bucketed level widths.  Padding a
        # group to elementwise (L, W) maxima is quadratically wasteful
        # when members' L and W are anti-correlated (wide levels <->
        # fewer levels: (65,128) and (33,256) pad to (67,256), +104%
        # rows), so directions only share a compile when their widths
        # land in the same ~1/16 bucket -- at production scale that is
        # still 2-5 compiles for the 12 ul7n12 directions with ~1-2%
        # row padding.
        # both axes are bucketed: members with same-bucket widths but
        # very different level counts would otherwise pad one member's
        # rows up to the group max L (the same quadratic-waste scenario
        # as W, via the other axis)
        kinds = tuple((k, _bucket(np.asarray(s).shape[0]),
                       _bucket(np.asarray(s).shape[1]))
                      for s, _, k, _, _ in raw)
        n = p.n
        # orphan count: sites in no schedule row (and not bc) still get
        # read-only slots, so they contribute to n_slots
        present = np.zeros(n + 1, dtype=bool)
        present[np.asarray(p.bc_sites, dtype=np.int64)] = True
        for sched, *_ in raw:
            present[np.minimum(np.asarray(sched, dtype=np.int64).reshape(-1),
                               n)] = True
        orphans = int(n - np.count_nonzero(present[:n]))
        g = groups.setdefault(kinds, {"LW": [[0, 0] for _ in raw],
                                      "n_bc": 0, "members": []})
        for t, (sched, *_) in zip(g["LW"], raw):
            L, W = np.asarray(sched).shape
            t[0] = max(t[0], L)
            t[1] = max(t[1], W)
        g["n_bc"] = max(g["n_bc"], len(p.bc_sites))
        g["members"].append((p, orphans))
    for kinds, g in groups.items():
        LW = tuple((int(L), int(W)) for L, W in g["LW"])
        fixed = g["n_bc"] + sum(L * W for L, W in LW)
        n_slots = max(fixed + orph for _, orph in g["members"])
        target = (LW, int(g["n_bc"]), int(n_slots), int(n_sweeps))
        for p, _ in g["members"]:
            object.__setattr__(p, "_pad_to", target)
            # drop stale slot plans built before sharing
            object.__setattr__(p, "_slot_cache", {})
    return plans


def build_slot_plan(plan, n_sweeps=3, bucket=True):
    """Compile the slot renumbering for one direction (host, cached).

    Every real site appears in exactly one schedule row (bc sites form
    slot block 0); padding entries (site id == n) map to the dummy slot
    n_slots, whose row stays zero.

    Shapes entering the jit cache key -- bc block, stage (L, W), total
    slot count -- are padded so directions share compiled sweeps:
    exactly, to the group targets attached by `share_plan_shapes`
    (preferred; guaranteed sharing); otherwise, with bucket=True
    (default), up to a coarse power-of-two grid (_bucket) that collapses
    near-equal shapes opportunistically.  Real-site results are bitwise
    unchanged either way.
    """
    pad_to = getattr(plan, "_pad_to", None)
    if not bucket:
        # bucket=False is an explicit opt-out of ALL padding (raw
        # shapes), including group targets attached by share_plan_shapes
        # -- the padding-bound test compares against this baseline
        pad_to = None
    if pad_to is not None and pad_to[3] != n_sweeps:
        # layer-mode schedule rows scale with n_sweeps: targets computed
        # for a different count would mis-pad; fall back to bucketing.
        # Loud: silently dropping the target re-opens the 12-per-
        # direction recompiles (1341 s at 442k sites) with no signal.
        import warnings
        warnings.warn(
            "build_slot_plan n_sweeps=%d does not match the "
            "share_plan_shapes target n_sweeps=%d: shape sharing is "
            "disabled for this call and each direction may recompile "
            "its own sweep. Re-run share_plan_shapes(plans, n_sweeps) "
            "with the sweep's n_sweeps." % (n_sweeps, pad_to[3]),
            stacklevel=2)
        pad_to = None
    cache = getattr(plan, "_slot_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(plan, "_slot_cache", cache)
    key = (n_sweeps, bool(bucket), pad_to)
    if key in cache:
        return cache[key]

    n = plan.n
    raw = _schedule_stages(plan, n_sweeps)
    n_bc = len(plan.bc_sites)
    if pad_to is not None:
        n_bc_pad = pad_to[1]
    else:
        n_bc_pad = _bucket(n_bc) if bucket else n_bc
    blocks = [np.asarray(plan.bc_sites, dtype=np.int64),
              np.full(n_bc_pad - n_bc, n, dtype=np.int64)]
    base = n_bc_pad
    metas = []
    staged = []
    for si, (sched, passes, kind, repeats, occ) in enumerate(raw):
        sched = np.asarray(sched, dtype=np.int64)
        L, W = sched.shape
        if pad_to is not None or bucket:
            if pad_to is not None:
                Lp, Wp = pad_to[0][si]
            else:
                Lp, Wp = _bucket(L), _bucket(W)
            if (Lp, Wp) != (L, W):
                padded = np.full((Lp, Wp), n, dtype=np.int64)
                padded[:L, :W] = sched
                sched = padded
                if occ is not None:
                    # occ is a flat row*W + col index: remap to the
                    # padded row stride Wp before embedding
                    occ_p = np.full((Lp, Wp, 2), -1, dtype=occ.dtype)
                    occ_p[:L, :W] = np.where(
                        occ >= 0, (occ // W) * Wp + occ % W, occ)
                    occ = occ_p
                L, W = Lp, Wp
        blocks.append(sched.reshape(-1))
        staged.append((sched, occ))
        metas.append((base, L, W, passes, kind, repeats))
        base += L * W
    slot2site = np.concatenate(blocks)

    # sites absent from every schedule row (the reference's skipped last
    # perm site, unreachable layer-0 sites) still appear as UPWINDS of
    # scheduled sites: give them read-only slots so their S/alpha gather
    # real values while their intensity stays the initial 0 (exactly the
    # reference's behaviour) -- the dummy zero row is only for padding.
    present = np.zeros(n, dtype=bool)
    real_entries = slot2site[slot2site < n]
    present[real_entries] = True
    orphans = np.nonzero(~present)[0]
    if orphans.size:
        slot2site = np.concatenate([slot2site, orphans])
    n_slots = len(slot2site)
    ns_pad = n_slots
    if pad_to is not None:
        ns_pad = pad_to[2]
        assert ns_pad >= n_slots, "stale _pad_to: re-run share_plan_shapes"
    elif bucket:
        ns_pad = _bucket(n_slots)
    if ns_pad != n_slots:
        slot2site = np.concatenate(
            [slot2site, np.full(ns_pad - n_slots, n, dtype=np.int64)])
        n_slots = ns_pad

    site2slot = np.full(n + 1, n_slots, dtype=np.int64)  # dummy -> zero row
    real = slot2site < n
    site2slot[slot2site[real]] = np.nonzero(real)[0]

    up_pad = np.concatenate(
        [plan.upwind.astype(np.int64), [[n, n]]], axis=0)   # (n+1, 2)
    w_pad = np.concatenate([plan.weights, [[0.0, 0.0]]], axis=0)
    r_pad = np.concatenate([plan.r, [[0.0, 0.0]]], axis=0)

    stages = []
    for (sched, occ), (b, L, W, passes, kind, repeats) in zip(staged, metas):
        sc = sched
        up_slots = site2slot[up_pad[sc]]                 # (L, W, 2) slots
        if kind == "gs" and occ is not None:
            # exact-GS stage: a site occurs once per pass; readers whose
            # upwind lives in the same layer target the occurrence of the
            # pass their value must come from (grid/voronoi.py
            # _gs_layer_schedule); -1 keeps the site-level resolution
            up_slots = np.where(occ >= 0, b + occ, up_slots)
        stages.append(SlotStage(
            base=b, L=L, W=W,
            up=up_slots.astype(np.int32),
            w=w_pad[sc], r=r_pad[sc],
            passes=passes, repeats=repeats, kind=kind))

    sp = SlotPlan(n_slots=n_slots, n_bc=n_bc_pad,
                  slot_gather=np.minimum(slot2site, n - 1).astype(np.int32),
                  site_gather=site2slot[:n].astype(np.int32),
                  stages=tuple(stages))
    cache[key] = sp
    return sp


# levels per block of the two-level stage scan: the S/alpha gather for
# a whole block is hoisted into ONE batched take (per-row transaction
# cost dominates TPU gathers, and the hoist also packs S and alpha into
# one 2B-lane row, halving row transactions for B <= 64), while the
# sequential I gather stays per level.  8 amortizes the hoist without
# inflating the block temporaries (K*W*2*B elements).
_LEVEL_BLOCK = 8

# unroll factor of the inner level scan (measured at 442k sites, B=91:
# unroll=4 changes nothing -- the level cost is gather-bound, not
# loop-overhead-bound -- so stay at 1 and keep compiles small)
_LEVEL_UNROLL = 1

# static memory budget for hoisting a relax stage's precomputed (src,
# ew) pair out of its repeat loop (bytes); stages above it recompute
# per lap inside the blocked scan instead.  1 GB: the 3.5e6-site
# production iteration OOMed with a 2.7 GB hoist next to its slot
# arrays, while the 442k relax stages (~0.7 GB at B=96) still qualify
_HOIST_BUDGET_BYTES = 1 << 30

# row stride of the relax-convergence sample (see _sweep_slots): the
# adaptive exit estimates the lap sup-change on every Nth slot row so
# the while carry keeps a single full intensity buffer
_DIFF_STRIDE = 64


def _device_arrays(sp, block=_LEVEL_BLOCK):
    """Device-resident geometry, built once per slot plan (re-uploading
    ~10 MB of indices/weights per sweep through a remote-TPU tunnel
    costs more than the sweep itself).

    Stages are reshaped into (Lb, K, ...) level blocks for the blocked
    stage scan; pad levels write into the I scratch rows (start =
    n_slots + 1) and gather the dummy zero slot with weight 0, so
    results are bitwise those of the unblocked per-level scan."""
    cache = getattr(sp, "_dev_cache", None)
    if cache is None:
        # ensure_compile_time_eval: the cache must hold REAL device
        # arrays even when the first sweep_voronoi call happens inside
        # an outer jit trace (otherwise tracers leak into the cache and
        # poison every later call)
        with jax.ensure_compile_time_eval():
            # slot id -> site id, dummy row included (site 0: its
            # consumers all carry weight 0 / path length 0)
            slot_full = np.concatenate(
                [sp.slot_gather,
                 np.zeros(1, dtype=sp.slot_gather.dtype)])
            stage_arrays = []
            for st in sp.stages:
                L, W = st.L, st.W
                K = max(1, min(block, L))
                Lb = -(-L // K) if L else 0
                padL = Lb * K - L
                starts = st.base + np.arange(L, dtype=np.int32) * W
                starts = np.concatenate(
                    [starts, np.full(padL, sp.n_slots + 1, np.int32)])
                up = np.concatenate(
                    [st.up, np.full((padL, W, 2), sp.n_slots,
                                    st.up.dtype)])
                # SITE-id maps: the field gathers read the (n, B)
                # site-ordered arrays directly -- no slot-reordered
                # copies of S/alpha are ever built on device
                up_site = slot_full[up]
                row_site = slot_full[
                    st.base + np.arange(L * W, dtype=np.int64)].reshape(
                        L, W)
                row_site = np.concatenate(
                    [row_site, np.zeros((padL, W), row_site.dtype)])
                w = np.concatenate(
                    [st.w, np.zeros((padL, W, 2), st.w.dtype)])
                r = np.concatenate(
                    [st.r, np.zeros((padL, W, 2), st.r.dtype)])
                stage_arrays.append(
                    (jnp.asarray(starts.reshape(Lb, K)),
                     jnp.asarray(up.reshape(Lb, K, W, 2)),
                     jnp.asarray(up_site.reshape(Lb, K, W, 2)),
                     jnp.asarray(row_site.reshape(Lb, K, W)),
                     jnp.asarray(w.reshape(Lb, K, W, 2)),
                     jnp.asarray(r.reshape(Lb, K, W, 2)),
                     jnp.asarray(st.repeats, jnp.int32)))
            cache = (tuple(stage_arrays), jnp.asarray(sp.site_gather),
                     int(sp.n_slots))
        object.__setattr__(sp, "_dev_cache", cache)
    return cache


# ---------------------------------------------------------- device sweep

def _stage_scan(I, S_T, a_T, B, stage_xs, W, passes):
    """Blocked lax.scan over one stage's levels.

    I: (n_slots + 1 + W_scratch, B) intensities (dummy zero row at
    n_slots, pad-level scratch after it); S_T/a_T: (n, B) site-ordered
    source/extinction -- the field gathers use host-precomputed SITE-id
    maps, so no slot-reordered field copies exist on device.  Outer
    scan walks K-level blocks: batched S/alpha gathers precompute the
    field-dependent weights for the whole block; the inner scan then
    walks the block's levels with only the irreducibly sequential work
    left: flat-take the 2 upwind I rows (SLOT ids -- occurrence
    semantics live in I), fused formal solution, contiguous
    dynamic_update_slice.  Arithmetic is expression-for-expression that
    of the naive per-level scan -- results are bitwise identical."""

    def block(I, xs):
        starts, up, w2, ew, src = xs
        zero = jnp.zeros((), starts.dtype)

        def level(I, lxs):
            start, upl, w2l, ewl, srcl = lxs
            fl = upl.reshape(-1)
            for _ in range(passes):
                i_u = jnp.take(I, fl, axis=0).reshape(W, 2, B)
                i_new = jnp.sum(w2l[..., None] * (ewl * i_u + srcl),
                                axis=1)
                I = jax.lax.dynamic_update_slice(I, i_new, (start, zero))
            return I, None

        I, _ = jax.lax.scan(level, I, (starts, up, w2, ew, src),
                            unroll=_LEVEL_UNROLL)
        return I, None

    def block_fused(I, xs):
        starts, up_slot, up_site, row_site, w2, r2 = xs
        ew, src = _block_src_ew(S_T, a_T, B,
                                (up_site, row_site, r2), W)
        return block(I, (starts, up_slot, w2, ew, src))

    I, _ = jax.lax.scan(block_fused, I, stage_xs)
    return I


def _block_src_ew(S_T, a_T, B, xs, W):
    """Field-dependent weights for one K-level block: batched gathers
    of the upwind and own-site field values straight from the (n, B)
    site-ordered arrays, then the formal-solution weights."""
    up_site, row_site, r2 = xs     # (K,W,2), (K,W), (K,W,2)
    K = up_site.shape[0]
    fl = up_site.reshape(-1)
    s_u = jnp.take(S_T, fl, axis=0).reshape(K, W, 2, B)
    a_u = jnp.take(a_T, fl, axis=0).reshape(K, W, 2, B)
    rs = row_site.reshape(-1)
    s_c = jnp.take(S_T, rs, axis=0).reshape(K, W, B)
    a_c = jnp.take(a_T, rs, axis=0).reshape(K, W, B)
    dtau = r2[..., None] * (a_c[:, :, None] + a_u) * 0.5
    aw, bw, ew = linear_weights(dtau)
    src = aw * s_u + bw * s_c[:, :, None]
    return ew, src


def _stage_scan_hoisted(S_T, a_T, B, stage_xs, W, passes):
    """_stage_scan with the field-dependent weights precomputed for the
    WHOLE stage up front (one scan over blocks), returning a repeat
    closure that replays the levels paying only the sequential I
    gathers.  Used for relax stages, whose global repeats otherwise
    re-gather S/alpha and re-evaluate the exp weights every lap;
    expression-for-expression identical to _stage_scan (bitwise)."""
    starts, up_slot, up_site, row_site, w2, r2 = stage_xs

    def pre(_, xs):
        return None, _block_src_ew(S_T, a_T, B, xs, W)

    _, (ew, src) = jax.lax.scan(pre, None, (up_site, row_site, r2))
    lean_xs = (starts, up_slot, w2, ew, src)

    def run(I):
        def block(I, xs):
            s, u, w, e, sr = xs
            zero = jnp.zeros((), s.dtype)

            def level(I, lxs):
                start, upl, w2l, ewl, srcl = lxs
                fl = upl.reshape(-1)
                for _ in range(passes):
                    i_u = jnp.take(I, fl, axis=0).reshape(W, 2, B)
                    i_new = jnp.sum(
                        w2l[..., None] * (ewl * i_u + srcl), axis=1)
                    I = jax.lax.dynamic_update_slice(
                        I, i_new, (start, zero))
                return I, None

            I, _ = jax.lax.scan(level, I, (s, u, w, e, sr),
                                unroll=_LEVEL_UNROLL)
            return I, None

        I, _ = jax.lax.scan(block, I, lean_xs)
        return I

    return run


@partial(jax.jit, static_argnames=("shapes", "relax_tol"))
def _sweep_slots(shapes, relax_tol, stage_arrays, site_gather,
                 S_T, a_T, I0):
    """shapes: static (n_slots, ((kind, W, passes), ...)); stage_arrays:
    per-stage (starts, up_slot, up_site, row_site, w, r, repeats)
    traced arrays -- repeats is traced (not static) so directions whose
    relax schedules differ only in repeat count share one compiled
    sweep.  S_T/a_T: (n, B) site-ordered fields (pre-transposed by the
    caller; sweep_voronoi_t avoids re-transposing per direction).

    relax_tol > 0 turns the global repeats of a relax stage (seam-wrap
    sequencing, grid/voronoi.py) into an adaptive while loop that exits
    once the relative sup-change of a repeat drops below relax_tol: with
    real opacity the wrap contribution attenuates by e^-tau per lap and
    1-2 repeats converge, while the zero-opacity searchlight fixture
    (the case the repeat count is calibrated for) keeps moving the beam
    every repeat and runs the full count.  relax_tol == 0 reproduces the
    fixed-count behaviour bitwise.
    """
    n, B = S_T.shape
    n_slots, stage_shapes = shapes
    # I needs W scratch rows for pad-level writes
    w_scratch = max((int(xs[1].shape[2]) for xs in stage_arrays),
                    default=0)
    I = jnp.zeros((n_slots + 1 + w_scratch, B), dtype=S_T.dtype)
    I = jax.lax.dynamic_update_slice(I, I0.T.astype(S_T.dtype), (0, 0))

    for (kind, W, passes), (*xs, repeats) in zip(stage_shapes,
                                                 stage_arrays):
        xs = tuple(xs)
        if kind != "relax":
            I = _stage_scan(I, S_T, a_T, B, xs, W, passes)
            continue
        # relax stage: repeats re-run the whole schedule.  Precompute
        # the field-dependent weights once (they don't depend on I) so
        # every lap pays only the sequential I gathers -- gated on a
        # static memory budget (the hoisted (rows, 2, B) src/ew pair)
        rows = int(np.prod(xs[1].shape[:3]))
        hoist = rows * 2 * B * 4 * 2 <= _HOIST_BUDGET_BYTES
        if hoist:
            lap = _stage_scan_hoisted(S_T, a_T, B, xs, W, passes)
        else:
            def lap(I, xs=xs):
                return _stage_scan(I, S_T, a_T, B, xs, W, passes)
        if not relax_tol:
            I = jax.lax.fori_loop(0, repeats, lambda _, I: lap(I), I)
        else:
            # exit only after TWO consecutive sub-tol laps: a single lap
            # whose sup-change dips below tol on a stalled-but-unconverged
            # low-opacity wrap chain must not truncate the schedule.
            # The sup-change is estimated on a strided row SAMPLE so the
            # while carry holds ONE full intensity buffer, not two
            # (1.5 GB at the production scale); the fixed repeat cap
            # still bounds the schedule if the sample under-reports.
            def body(state):
                i, I, prev, streak = state
                I_new = lap(I)
                samp = I_new[::_DIFF_STRIDE]
                diff = jnp.max(jnp.abs(samp - prev))
                scale = jnp.maximum(jnp.max(jnp.abs(samp)),
                                    jnp.asarray(1e-30, I.dtype))
                sub = diff / scale <= relax_tol
                return (i + 1, I_new, samp,
                        jnp.where(sub, streak + 1, 0))

            def cond(state):
                i, _, _, streak = state
                return jnp.logical_and(i < repeats, streak < 2)

            _, I, _, _ = jax.lax.while_loop(
                cond, body, (0, I, I[::_DIFF_STRIDE], 0))

    return jnp.take(I, site_gather, axis=0)              # (n, B)


def sweep_voronoi_t(plan, S_T, a_T, I0, n_sweeps=3, relax_tol=0.0):
    """sweep_voronoi on pre-transposed (n, B) fields.

    The production entry point: callers that sweep many directions per
    lambda chunk transpose S once and each direction's extinction once,
    so no (B, n) -> (n, B) copies happen inside the per-direction
    executions (2.6 GB of per-direction transient at the 3.5e6-site
    scale).  Returns I as (n, B)."""
    sp = build_slot_plan(plan, n_sweeps)
    if I0.shape[-1] < sp.n_bc:      # bucketed bc block: pad writes zeros
        I0 = jnp.pad(I0, ((0, 0), (0, sp.n_bc - I0.shape[-1])))
    stage_arrays, site_gather, n_slots = _device_arrays(sp)
    shapes = (n_slots,
              tuple((st.kind, st.W, st.passes) for st in sp.stages))
    return _sweep_slots(shapes, float(relax_tol), stage_arrays,
                        site_gather, S_T, a_T, I0)


def sweep_voronoi(plan, S, alpha, I0, n_sweeps=3, relax_tol=0.0):
    """Formal solution over the irregular grid along plan.k.

    Args:
      plan: VoronoiPlan (static geometry for one direction).
      S, alpha: (B, n) or (n,) source function / extinction.
      I0: (B, n_bc) or (n_bc,) boundary intensity on plan.bc_sites
          (bottom-layer sites for up sweeps: lambda_iteration.jl:99-102).
      relax_tol: early-exit tolerance for seam-wrap relax repeats
          ('wavefront' plans); 0 = fixed repeat count (bitwise default).
    Returns:
      I with the shape of S.
    """
    squeeze = S.ndim == 1
    if squeeze:
        S, alpha, I0 = S[None], alpha[None], I0[None]
    I_T = sweep_voronoi_t(plan, S.T, alpha.T, I0, n_sweeps=n_sweeps,
                          relax_tol=relax_tol)
    I = I_T.T
    return I[0] if squeeze else I
