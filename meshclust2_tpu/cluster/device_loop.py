"""Device-resident mean-shift accumulation.

The reference's accumulation phase (ClusterFactory.cpp:552-610 driving
Trainer::get_close, Trainer.cpp:22-71) is a sequential, data-dependent loop:
each step scans a length window of the live pool against the current center,
absorbs classifier positives, and re-centers on the member closest to the
member mean.  Round 1/2 drove this loop from the host with one device
dispatch per window, which pays interconnect latency per center (~80x
slowdown through a tunneled chip).  This module re-expresses the WHOLE phase
as one on-device `lax.while_loop`: histograms, lengths, alive masks, and
membership live in device memory; the host receives only the final
(assignment, step, centers) arrays.

Exactness strategy (decisions must match the float64 host oracle bit for
bit, but this platform's emulated f64 is low precision):

  - all pairwise sufficient statistics (sum-min, dot, EMD prefix) are exact
    integer arithmetic (the same envelope as ops/pallas_stats.py);
  - the classifier epilogue (derive singles, normalize, combos, GLM sum,
    the dist used for argmax) runs in double-float f32 arithmetic
    (ops/ddf32.py, ~2^-45 relative error);
  - the rounded-logistic gates compare the GLM sum against float64 edges
    precomputed by bit-bisection on the host (model/thresholds.py);
  - EVERY data-dependent decision carries a margin guard: if any decision
    falls within `margin` of an edge/tie (and is not provably an exact
    tie of identical integer inputs), the loop aborts with its full state
    and the host oracle resumes the run from that exact point
    (MeanShiftEngine._host_accumulate_loop) — so the device path can never
    change a clustering decision relative to the float64 semantics;
  - closest-to-mean (DivergencePoint::distance_d against the member mean,
    ClusterFactory.cpp:337-380) is computed from exact integer stats with
    per-bin guards on the two float64 rounding corners (round of the f64
    mean, trunc of count+mean), see _mean_round_guard.

bvec window semantics (bvec.cpp:260-330 + the binary-search quirks kept by
cluster/bvec.py) are reproduced with closed forms over masked reductions:
the reference's in-bin search is lower_bound with `high` initialized to
size-1, so an absent boundary resolves to min(lower_bound, size-1) and a
present one to its first/last occurrence; empty bins redirect to the
first/last non-empty bin at slot 0.
"""
from __future__ import annotations

import math
import os
from typing import List, NamedTuple, Optional, Tuple

import numpy as np

from ..features import flags as F
from ..model.classifier import CompiledModel
from ..model import thresholds as TH
from ..kmer.counting import PointSet
from ..ops import ddf32 as DD
from .bvec import BVec

# singles the dd epilogue can derive from the integer stats
DD_DERIVABLE = frozenset({
    F.FEAT_MANHATTAN, F.FEAT_EUCLIDEAN, F.FEAT_INTERSECTION,
    F.FEAT_KULCZYNSKI2, F.FEAT_SIMRATIO, F.FEAT_NORMALIZED_VECTORS,
    F.FEAT_PEARSON_COEFF, F.FEAT_D2z, F.FEAT_EUCLIDEAN_Z, F.FEAT_EMD,
    F.FEAT_LENGTHD,
})

# relative margin under which a decision is "uncertain" and the device
# aborts to the host oracle.  dd-f32 carries ~3e-14 relative error and the
# identity-form singles differ from the host's direct sums by <~1e-11
# (worst case: pearson's cancelling covariance), so 1e-8 leaves >2 orders
# of headroom while tripping ~never on real data.
DEFAULT_MARGIN = float(os.environ.get("MC2_DD_MARGIN", "1e-8"))

# tie margin for comparing two values produced by the SAME dd pipeline
# (dist argmax, distance_d argmin): the identity-vs-direct formula
# difference largely cancels between the two sides, so only the ~1e-13
# relative dd error matters; 1e-10 keeps 3 orders of headroom.  (The first
# real-chip med2000 run aborted at stage 2 because genuine ~1e-8-relative
# distance_d gaps fell inside the old shared 1e-8 margin.)
DEFAULT_TIE_MARGIN = float(os.environ.get("MC2_DD_TIE_MARGIN", "1e-10"))

_WC = 2048  # scan chunk rows (static shape inside the loop)


def _shape_bucket(x: int, floor: int = 1024) -> int:
    """Smallest of {2^a, 3*2^(a-1)} >= x (>= floor).  Padded program shapes
    are bucketed so the XLA compile cache hits across datasets of similar
    size instead of recompiling per exact n."""
    if x <= floor:
        return floor
    p = 1 << (x - 1).bit_length()
    c = (3 * p) // 4
    return c if c >= x else p


# which integer pair statistics each single consumes; unused stats are
# replaced by zeros so XLA dead-code-eliminates their computation (the tie
# signatures then compare equal on those slots, which is sound: the dd
# value depends only on the used stats)
_NEED_SUMMIN = frozenset({F.FEAT_MANHATTAN, F.FEAT_INTERSECTION,
                          F.FEAT_KULCZYNSKI2})
_NEED_DOT = frozenset({F.FEAT_EUCLIDEAN, F.FEAT_SIMRATIO,
                       F.FEAT_NORMALIZED_VECTORS, F.FEAT_PEARSON_COEFF,
                       F.FEAT_D2z, F.FEAT_EUCLIDEAN_Z})


def stat_needs(singles) -> Tuple[bool, bool, bool]:
    s = set(singles)
    return (bool(s & _NEED_SUMMIN), bool(s & _NEED_DOT), F.FEAT_EMD in s)


def emd_rowsum(jax, jnp, diff_i32, d: int):
    """sum_j |prefix_j(diff)| per row as int64, via blocked triangular
    matmuls on the MXU (the same decomposition as ops/pallas_stats.py's
    kernel).  jnp.cumsum lowers to a log-depth shift/add chain on TPU —
    ~10 full passes over the block, which dominated the scan step — while
    D/128 [WC,128]x[128,128] matmuls are near-free on the MXU.  float32 is
    exact throughout (|prefix| <= pseudo-magnitude < 2^24, envelope_check);
    Precision.HIGHEST keeps wide-count diffs exact on the MXU's bf16 passes.
    Per-block |prefix| sums stay < 128 * 2^24 < 2^31 (int32-exact); the
    running total accumulates in int64, so the EMD stat cannot wrap for any
    in-envelope input (the old int32 total could overflow at d * 2^24)."""
    wc = diff_i32.shape[0]
    blk = 128 if d % 128 == 0 and d >= 128 else d
    tri = np.triu(np.ones((blk, blk), np.float32))
    diff = diff_i32.astype(jnp.float32)
    # np literals, not jnp: trace-time jnp arrays become device-resident
    # jaxpr constants that MLIR lowering fetches back over the tunnel
    emd = np.zeros((wc,), np.int64)
    carry = np.zeros((wc, 1), np.float32)
    for b in range(d // blk):
        pref = jax.lax.dot_general(
            diff[:, b * blk:(b + 1) * blk], tri,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ) + carry
        emd = emd + jnp.abs(pref).astype(jnp.int32).sum(
            axis=1, dtype=jnp.int32).astype(jnp.int64)
        carry = pref[:, -1:]
    return emd


class DeviceLoopUnsupported(Exception):
    pass


def _step_cap() -> int:
    """Validated MC2_DEV_STEP_CAP (profiling-only step limit).  A stray or
    malformed value must fail loudly, not silently truncate a real run."""
    raw = os.environ.get("MC2_DEV_STEP_CAP", "0")
    try:
        cap = int(raw)
    except ValueError:
        raise RuntimeError(
            f"MC2_DEV_STEP_CAP={raw!r} is not an integer") from None
    if cap < 0:
        raise RuntimeError(f"MC2_DEV_STEP_CAP={cap} must be >= 0")
    return cap


class ResumeState(NamedTuple):
    """Host continuation point after a guarded abort."""
    stage: int                 # 1: redo window scan; 2: redo closest-to-mean
    clusters_done: list        # list of Cluster (complete)
    current_rows: list         # members of the open cluster, reference order
    last_row: int              # current center row
    bv: BVec                   # pool state at the abort point


class _ModelPack(NamedTuple):
    singles: tuple
    is_sim: tuple
    mins: tuple                # host f64 per single
    dens: tuple                # host f64 (max - min) per single
    combos: tuple              # ((kind, idxs), ...)
    weights: tuple             # host f64, [0] = intercept
    pos_edge: float            # f64 GLM-sum edge for round(prob) > 0


def _pack_model(model: CompiledModel) -> _ModelPack:
    singles = tuple(model.singles)
    if not set(singles) <= DD_DERIVABLE:
        raise DeviceLoopUnsupported(f"singles {singles} not dd-derivable")
    edge = TH.positive_edge(model.bias)
    if not math.isfinite(edge):
        # decision is constant in s; encode as a huge finite edge
        edge = -1e30 if edge < 0 else 1e30
    return _ModelPack(
        singles=singles,
        is_sim=tuple(bool(F.FEAT_IS_SIM[s]) for s in singles),
        mins=tuple(float(v) for v in model.mins),
        dens=tuple(float(ma - mi) for mi, ma in zip(model.mins, model.maxs)),
        combos=tuple((kind, tuple(idxs)) for kind, idxs in model.combos),
        weights=tuple(float(w) for w in model.weights),
        pos_edge=float(edge),
    )


def _index_of_vec(bounds: np.ndarray, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized BVec._index_of (bvec.cpp:122-147): returns (low, high)
    with the reference's initialization quirks."""
    nb = len(bounds)
    hi_cnt = np.searchsorted(bounds, x, side="right")
    low = np.where(hi_cnt == 0, nb - 1,
                   np.where(hi_cnt >= nb, nb - 1, hi_cnt - 1))
    high = np.where(hi_cnt == 0, 0,
                    np.where(hi_cnt >= nb, nb - 1, hi_cnt - 1))
    return low.astype(np.int32), high.astype(np.int32)


def envelope_check(ps, model_singles_checked=True):
    """Raise DeviceLoopUnsupported outside the exact-arithmetic envelope
    shared by the device accumulate/update programs."""
    maxc = int(ps.counts.max()) if ps.n else 0
    maxmag = int(ps.mags.max()) if ps.n else 0
    if maxmag >= 2**24:
        raise DeviceLoopUnsupported("pseudo-magnitude >= 2^24")
    if maxc * maxmag >= 2**31:
        raise DeviceLoopUnsupported("dot product >= 2^31")
    if maxc * _WC >= 2**31:
        raise DeviceLoopUnsupported("chunk column sums >= 2^31")
    if int(ps.lengths.max()) >= 2**31:
        raise DeviceLoopUnsupported("length >= 2^31")
    self_dots = np.einsum(
        "ij,ij->i", ps.counts.astype(np.int64), ps.counts.astype(np.int64)
    )
    if self_dots.max() >= 2**31:
        raise DeviceLoopUnsupported("self dot >= 2^31")
    return self_dots


# relative error of the dd pipeline (measured ~5e-14 end-to-end; 2^-40
# leaves a 9000x cushion) and the host oracle's pairwise-summation epsilon
_ETA = np.float32(2.0**-40)
_EPS64 = 1.1e-16


def derive_singles_dd(pack, d, jnp, stats, a, b):
        """Mirror of ops/pallas_stats.derive_singles in dd arithmetic.

        stats: dict summin/dot/emd (int32 [W]); a/b: per-side dicts with
        mags/selfdot (int32/int64), std dd pairs, lens (int32).  Returns
        (singles, errs): dd values plus ABSOLUTE error bounds per single —
        the bound covers both the dd arithmetic and the difference between
        the identity-form value and the host oracle's direct f64 sums
        (which matters where sums cancel: d2z, euclidean_z)."""
        summin, dot, emd = stats["summin"], stats["dot"], stats["emd"]
        i64 = lambda v: v.astype(jnp.int64)
        mag_a, mag_b = i64(a["mags"]), i64(b["mags"])
        self_a, self_b = i64(a["selfdot"]), i64(b["selfdot"])
        dd_i = DD.dd_from_i64
        # exact integer building blocks
        norm2 = self_a + self_b - 2 * i64(dot)          # < 2^33
        dd_dot = dd_i(i64(dot))
        # 1 / d is a power of two: scaling by it is exact in f32
        inv_d = np.float32(1.0 / d)

        out = []
        errs = []
        cache = {}
        # host pairwise-summation absolute coefficients (see docstring):
        # pearson is protected by Cauchy-Schwarz (sum|dp dq| <= sqrt(na nb)),
        # d2z's denominator is d x smaller, euclidean_z cancels openly
        eta_host = np.float32(_EPS64 * (np.log2(max(d, 2)) + 2))
        eta_d2z = np.float32(_EPS64 * (np.log2(max(d, 2)) + 2) * d)

        def sqrt_norm2():
            if "sq" not in cache:
                cache["sq"] = DD.dd_sqrt(dd_i(norm2))
            return cache["sq"]

        def cov():
            # dot - mags_a * mags_b / d, all exact until the dd conversion
            if "cov" not in cache:
                mm = mag_a * mag_b                      # < 2^48 exact
                t = dd_i(mm)
                t = (t[0] * inv_d, t[1] * inv_d)        # exact scale
                cache["cov"] = DD.dd_sub(dd_dot, t)
            return cache["cov"]

        def var_side(side, mag, self_):
            key = "var_" + side
            if key not in cache:
                mm = mag * mag
                t = dd_i(mm)
                t = (t[0] * inv_d, t[1] * inv_d)
                cache[key] = DD.dd_sub(dd_i(self_), t)
            return cache[key]

        for flag in pack.singles:
            if flag == F.FEAT_MANHATTAN:
                out.append(dd_i(mag_a + mag_b - 2 * i64(summin)))
                errs.append(jnp.zeros_like(out[-1][0]))
            elif flag == F.FEAT_EUCLIDEAN:
                out.append(sqrt_norm2())
                errs.append(_ETA * jnp.abs(out[-1][0]))
            elif flag == F.FEAT_INTERSECTION:
                out.append(DD.dd_div(dd_i(2 * i64(summin)), dd_i(mag_a + mag_b)))
                errs.append(_ETA * jnp.abs(out[-1][0]))
            elif flag == F.FEAT_KULCZYNSKI2:
                ap = dd_i(mag_a)
                ap = (ap[0] * inv_d, ap[1] * inv_d)
                aq = dd_i(mag_b)
                aq = (aq[0] * inv_d, aq[1] * inv_d)
                num = DD.dd_add(ap, aq)
                num = (num[0] * np.float32(d), num[1] * np.float32(d))
                den = DD.dd_mul(ap, aq)
                den = (den[0] * np.float32(2.0), den[1] * np.float32(2.0))
                coeff = DD.dd_div(num, den)
                out.append(DD.dd_mul(coeff, dd_i(i64(summin))))
                errs.append(_ETA * jnp.abs(out[-1][0]))
            elif flag == F.FEAT_SIMRATIO:
                out.append(DD.dd_div(dd_dot, DD.dd_add(dd_dot, sqrt_norm2())))
                errs.append(_ETA * jnp.abs(out[-1][0]))
            elif flag == F.FEAT_NORMALIZED_VECTORS:
                out.append(DD.dd_div(dd_dot, DD.dd_sqrt(dd_i(self_a * self_b))))
                errs.append(_ETA * jnp.abs(out[-1][0]))
            elif flag == F.FEAT_PEARSON_COEFF:
                na = var_side("a", mag_a, self_a)
                nb_ = var_side("b", mag_b, self_b)
                out.append(DD.dd_div(cov(), DD.dd_sqrt(DD.dd_mul(na, nb_))))
                errs.append(_ETA * jnp.abs(out[-1][0]) + eta_host)
            elif flag == F.FEAT_D2z:
                sa, sb = a["std"], b["std"]
                out.append(DD.dd_div(cov(), DD.dd_mul(sa, sb)))
                errs.append(_ETA * jnp.abs(out[-1][0]) + eta_d2z)
            elif flag == F.FEAT_EUCLIDEAN_Z:
                sa, sb = a["std"], b["std"]
                na = var_side("a", mag_a, self_a)
                nb_ = var_side("b", mag_b, self_b)
                ea = DD.dd_div(na, DD.dd_mul(sa, sa))
                eb = DD.dd_div(nb_, DD.dd_mul(sb, sb))
                dz = DD.dd_div(cov(), DD.dd_mul(sa, sb))
                t = DD.dd_add(ea, eb)
                t = DD.dd_sub(t, (dz[0] * np.float32(2.0), dz[1] * np.float32(2.0)))
                out.append(DD.dd_sqrt(t))
                # cancellation in na/s^2 + nb/s^2 - 2 dz amplifies both the
                # dd error and the host's summation error relative to ez
                t_mag = jnp.abs(ea[0]) + jnp.abs(eb[0]) + 2 * jnp.abs(dz[0])
                ezv = jnp.maximum(jnp.abs(out[-1][0]), np.float32(1e-3))
                errs.append((_ETA * t_mag + eta_d2z) / (2 * ezv)
                            + _ETA * ezv)
            elif flag == F.FEAT_EMD:
                out.append(dd_i(i64(emd)))
                errs.append(jnp.zeros_like(out[-1][0]))
            elif flag == F.FEAT_LENGTHD:
                la, lb = i64(a["lens"]), i64(b["lens"])
                out.append(dd_i(jnp.abs(la - lb)))
                errs.append(jnp.zeros_like(out[-1][0]))
            else:  # pragma: no cover - guarded by _pack_model
                raise AssertionError(flag)
        return out, errs

def epilogue_dd(pack, singles_err):
    """(s, dist, s_err, dist_err) from (singles, errs): the model decision
    path (normalize -> combos -> weighted sum, model/classifier.py) in dd
    with first-order ABSOLUTE error propagation.  The error bounds are what
    make the decision margins sound: normalization subtracts near-equal
    values and the GLM terms cancel, so relative-to-|s| margins understate
    the true uncertainty (first seen as a flipped 6th digit in fastcar
    regression output)."""
    import jax.numpy as jnp

    singles_dd, singles_errs = singles_err
    pk = pack
    normed = []
    nerrs = []
    for i, v in enumerate(singles_dd):
        mn = DD.dd(*(np.float32(x) for x in DD.split_f64(np.float64(pk.mins[i]))))
        dn = DD.dd(*(np.float32(x) for x in DD.split_f64(np.float64(pk.dens[i]))))
        z = DD.dd_div(DD.dd_sub(v, mn), dn)
        inv_den = np.float32(1.0 / abs(pk.dens[i])) if pk.dens[i] != 0 \
            else np.float32(np.inf)
        ze = (singles_errs[i]
              + _ETA * (jnp.abs(v[0]) + np.float32(abs(pk.mins[i])))) * inv_den \
            + _ETA * jnp.abs(z[0])
        if not pk.is_sim[i]:
            one = DD.dd(np.float32(1.0), np.float32(0.0))
            z = DD.dd_sub(one, z)
            ze = ze + _ETA
        normed.append(z)
        nerrs.append(ze)
    combos = []
    cerrs = []

    def mul_err(c, ce, z, ze):
        nc = DD.dd_mul(c, z)
        nce = ce * jnp.abs(z[0]) + ze * jnp.abs(c[0]) + _ETA * jnp.abs(nc[0])
        return nc, nce

    for kind, idxs in pk.combos:
        if kind == F.COMBO_XY:
            c, ce = normed[idxs[0]], nerrs[idxs[0]]
            for j in idxs[1:]:
                c, ce = mul_err(c, ce, normed[j], nerrs[j])
        elif kind == F.COMBO_X2Y2:
            c, ce = mul_err(normed[idxs[0]], nerrs[idxs[0]],
                            normed[idxs[0]], nerrs[idxs[0]])
            for j in idxs[1:]:
                c, ce = mul_err(c, ce, normed[j], nerrs[j])
                c, ce = mul_err(c, ce, normed[j], nerrs[j])
        elif kind == F.COMBO_XY2:
            i0, i1 = idxs
            c, ce = mul_err(normed[i0], nerrs[i0], normed[i1], nerrs[i1])
            c, ce = mul_err(c, ce, normed[i1], nerrs[i1])
        elif kind == F.COMBO_X2Y:
            i0, i1 = idxs
            c, ce = mul_err(normed[i0], nerrs[i0], normed[i0], nerrs[i0])
            c, ce = mul_err(c, ce, normed[i1], nerrs[i1])
        else:  # pragma: no cover
            raise AssertionError(kind)
        combos.append(c)
        cerrs.append(ce)
    w0 = DD.split_f64(np.float64(pk.weights[0]))
    ssum = DD.dd(np.float32(w0[0]), np.float32(w0[1]))
    s_err = jnp.zeros_like(combos[0][0]) if combos else np.float32(0.0)
    s_err = s_err + _ETA * np.float32(abs(pk.weights[0]))
    for c, ce, w in zip(combos, cerrs, pk.weights[1:]):
        wd = DD.split_f64(np.float64(w))
        ssum = DD.dd_add(
            ssum, DD.dd_mul(c, DD.dd(np.float32(wd[0]), np.float32(wd[1]))))
        aw = np.float32(abs(w))
        s_err = s_err + aw * ce + _ETA * aw * jnp.abs(c[0])
    if combos:
        dist, dist_err = combos[0], cerrs[0]
    else:
        dist = DD.dd(np.float32(0.0), np.float32(0.0))
        dist_err = np.float32(0.0)
    return ssum, dist, s_err, dist_err


# X2Y2 squares each subsequent factor twice via mul_err above, which is
# exactly prod(z_j^2) with its error; see classifier.combo_matrix.


class DeviceAccumulator:
    """One-dispatch accumulation for a PointSet + trained model.

    Prepared from a finalized BVec (before any pop).  `run()` returns either
    (clusters_raw, None) on full completion or (None, ResumeState) on a
    guarded abort; raises DeviceLoopUnsupported when the dataset/model is
    outside the exact-arithmetic envelope.
    """

    def __init__(self, ps: PointSet, model: CompiledModel, sim: float,
                 margin: float = DEFAULT_MARGIN,
                 tie_margin: float = DEFAULT_TIE_MARGIN,
                 shared_counts=None):
        self.ps = ps
        self.model = model
        self.sim = float(sim)
        self.margin = float(margin)
        # ties compare values from the same dd pipeline: only dd error
        # applies, but a forced-huge decision margin (tests, MC2_DD_MARGIN)
        # must drag the tie margin with it
        self.tie_margin = float(max(tie_margin, margin * 1e-2)) \
            if margin > DEFAULT_MARGIN else float(tie_margin)
        self.pack = _pack_model(model)
        # counts already resident on the device in natural row order (the
        # DeviceUpdater's upload): the program then permutes on device from
        # a 64 KB order vector instead of re-uploading the multi-MB flat
        # array through the tunnel (upload bandwidth fluctuates wildly;
        # a second counts upload was the execute-time variance)
        self.shared_counts = shared_counts

        self._self_dots = envelope_check(ps)
        self._d = ps.dim

    # -- host-side preparation ------------------------------------------------

    def _prepare(self, bv: BVec):
        ps = self.ps
        order = np.concatenate([b for b in bv.bins]) if bv.size() else np.zeros(0, np.int64)
        n = len(order)
        if n != ps.n:
            raise DeviceLoopUnsupported("bvec does not cover the point set")
        nb = len(bv.bins)
        bin_sizes = np.array([len(b) for b in bv.bins], dtype=np.int64)
        bin_start = np.zeros(nb + 1, dtype=np.int32)
        np.cumsum(bin_sizes, out=bin_start[1:])
        bin_ids = np.repeat(np.arange(nb, dtype=np.int32), bin_sizes)

        lens = ps.lengths[order]
        L = lens.astype(np.float64)
        blen = (L * self.sim).astype(np.int64)   # uint64 trunc of f64 product
        elen = (L / self.sim).astype(np.int64)
        bounds = np.asarray(bv.begin_bounds, dtype=np.int64)
        fbin0, _ = _index_of_vec(bounds, blen)
        _, bbin0 = _index_of_vec(bounds, elen)

        # bucketed padded shapes: the compiled program depends only on
        # (npad, nb_pad, D, dtype, model), so nearby dataset sizes reuse the
        # XLA compile cache; n itself is a runtime scalar argument
        npad = _shape_bucket(n + _WC + 8)
        nb_pad = _shape_bucket(nb, floor=8)

        def padded(a, fill, dtype):
            out = np.full(npad, fill, dtype=dtype)
            out[:n] = a
            return out

        # trailing empty bins: bin_start pads with n (zero-size bins past
        # the last real bin never match any alive row)
        bin_start_pad = np.full(nb_pad + 1, n, dtype=np.int32)
        bin_start_pad[: nb + 1] = bin_start

        host = {
            "order": order,
            "n": n,
            "nb": nb,
            "bin_start": bin_start,
        }
        if self.shared_counts is not None:
            order_pad = np.zeros(npad, dtype=np.int32)
            order_pad[:n] = order
            counts_entry = {"counts_nat": self.shared_counts,
                            "order_pad": order_pad}
        else:
            flat = np.zeros((npad, ps.counts.shape[1]), dtype=ps.counts.dtype)
            flat[:n] = ps.counts[order]
            counts_entry = {"counts": flat}
        dev = {
            **counts_entry,
            "lens": padded(lens, np.iinfo(np.int32).max, np.int32),
            "bin_ids": padded(bin_ids, nb_pad, np.int32),
            "blen": padded(blen, 0, np.int32),
            "elen": padded(elen, 0, np.int32),
            "fbin0": padded(fbin0, 0, np.int32),
            "bbin0": padded(bbin0, 0, np.int32),
            "mags": padded(ps.mags[order], 0, np.int32),
            "selfdot": padded(self._self_dots[order], 0, np.int32),
            "bin_start": bin_start_pad,
            "n": np.int32(n),
            "maxc": np.int64(int(ps.counts.max()) if ps.n else 0),
        }
        sh, sl = DD.split_f64(ps.stddevs[order])
        dev["std_h"] = padded(sh, 1.0, np.float32)
        dev["std_l"] = padded(sl, 0.0, np.float32)
        return host, dev

    # -- dd epilogue ------------------------------------------------------------

    def _derive_singles_dd(self, jnp, stats, a, b):
        return derive_singles_dd(self.pack, self._d, jnp, stats, a, b)

    def _epilogue_dd(self, jnp, singles_err):
        return epilogue_dd(self.pack, singles_err)


    # -- the device program ----------------------------------------------------

    def _build_program(self, host, dev):
        """Returns a jitted program taking the `dev` array dict as its ONE
        argument.  The arrays must be arguments, not closure captures: a
        captured 10 MB counts array gets inlined into the HLO as a literal
        (measured: 26 MB HLO text, 419 s cold TPU compile, 8.5 s cache
        load), while as parameters the program is a few hundred KB and its
        cache key depends only on the bucketed shapes + model constants."""
        import jax
        import jax.numpy as jnp

        nb = len(dev["bin_start"]) - 1          # bucketed bin count
        npad = len(dev["lens"])
        D = (dev["counts_nat"] if "counts_nat" in dev
             else dev["counts"]).shape[1]
        WC = _WC
        margin = np.float32(self.margin)
        tie_margin = np.float32(self.tie_margin)
        edge_dd = DD.dd(*(np.float32(x) for x in
                          DD.split_f64(np.float64(self.pack.pos_edge))))
        edge_scale = np.float32(max(abs(self.pack.pos_edge), 1.0))
        need_summin, need_dot, need_emd = stat_needs(self.pack.singles)
        NONE = np.int32(npad)

        C = None  # bound to the traced argument dict by program()

        class Carry(NamedTuple):
            alive: jnp.ndarray       # [npad] bool
            assign: jnp.ndarray      # [npad] int32, -1 = unassigned
            astep: jnp.ndarray       # [npad] int32
            centers: jnp.ndarray     # [n+1] int32 flat pos of final centers
            cid: jnp.ndarray         # int32 current cluster id
            stepc: jnp.ndarray       # int32 monotone event counter
            cur: jnp.ndarray         # int32 flat pos of current center
            msum: jnp.ndarray        # [D] int64 member count-vector sum
            mcnt: jnp.ndarray        # int32 member count
            env_lo: jnp.ndarray      # int32 member envelope in flat coords
            env_hi: jnp.ndarray
            done: jnp.ndarray        # bool
            abort: jnp.ndarray       # int32 0/1/2
            iters: jnp.ndarray       # int32 safety counter

        def row_i32(p):
            return jax.lax.dynamic_slice(C["counts"], (p, np.int32(0)), (1, D))[0].astype(jnp.int32)

        def side_consts(p):
            return {
                "mags": C["mags"][p],
                "selfdot": C["selfdot"][p],
                "std": (C["std_h"][p], C["std_l"][p]),
                "lens": C["lens"][p],
            }

        def scan_window(st: "Carry", rank, posr, gfront, gback, p_lo, p_hi,
                        blen_c, elen_c):
            """Chunked window scan: classifier + dist argmax + absorb prep."""
            cc = row_i32(st.cur)
            c_side = side_consts(st.cur)
            neg_inf = np.float32(-np.inf)

            class SC(NamedTuple):
                j: jnp.ndarray
                bh: jnp.ndarray          # best dist dd
                bl: jnp.ndarray
                berr: jnp.ndarray        # best's absolute dist error bound
                bpos: jnp.ndarray        # flat pos of best (NONE if none)
                bsig: tuple              # best's integer/dd signature
                any_pos: jnp.ndarray
                uncert: jnp.ndarray
                msum: jnp.ndarray        # [D] int64 absorbed sums
                mcnt: jnp.ndarray
                pmask: jnp.ndarray       # [npad] bool positives

            zero_sig = (np.int32(0), np.int32(0), np.int64(0),
                        np.int32(0), np.int32(0), np.int32(0),
                        np.float32(0), np.float32(0))

            nchunks = jnp.where(p_hi > p_lo, (p_hi - p_lo + WC - 1) // WC, 0)

            def chunk_body(sc: SC):
                start = p_lo + sc.j * WC
                start_c = jnp.minimum(start, np.int32(npad - WC))
                offs = start_c + np.arange(WC, dtype=np.int32)
                in_rng = (offs >= start) & (offs < p_hi)
                aliv = jax.lax.dynamic_slice(st.alive, (start_c,), (WC,))
                rk = jax.lax.dynamic_slice(rank, (start_c,), (WC,))
                ll = jax.lax.dynamic_slice(C["lens"], (start_c,), (WC,))
                msk = in_rng & aliv & (rk >= gfront) & (rk < gback)
                pass_m = msk & (ll >= blen_c) & (ll <= elen_c)

                blk = jax.lax.dynamic_slice(
                    C["counts"], (start_c, np.int32(0)), (WC, D)).astype(jnp.int32)
                summin = (jnp.minimum(blk, cc[None, :]).sum(axis=1, dtype=jnp.int32)
                          if need_summin else np.zeros((WC,), np.int32))
                dot = ((blk * cc[None, :]).sum(axis=1, dtype=jnp.int32)
                       if need_dot else np.zeros((WC,), np.int32))
                emd = (emd_rowsum(jax, jnp, blk - cc[None, :], D)
                       if need_emd else np.zeros((WC,), np.int64))

                b_side = {
                    "mags": jax.lax.dynamic_slice(C["mags"], (start_c,), (WC,)),
                    "selfdot": jax.lax.dynamic_slice(C["selfdot"], (start_c,), (WC,)),
                    "std": (jax.lax.dynamic_slice(C["std_h"], (start_c,), (WC,)),
                            jax.lax.dynamic_slice(C["std_l"], (start_c,), (WC,))),
                    "lens": ll,
                }
                a_bc = {
                    "mags": jnp.broadcast_to(c_side["mags"], (WC,)),
                    "selfdot": jnp.broadcast_to(c_side["selfdot"], (WC,)),
                    "std": (jnp.broadcast_to(c_side["std"][0], (WC,)),
                            jnp.broadcast_to(c_side["std"][1], (WC,))),
                    "lens": jnp.broadcast_to(c_side["lens"], (WC,)),
                }
                # reference order: feat->compute(candidate, center)
                stats = {"summin": summin, "dot": dot, "emd": emd}
                singles = self._derive_singles_dd(jnp, stats, b_side, a_bc)
                s_dd, dist_dd, s_err, dist_err = self._epilogue_dd(jnp, singles)

                # positive gate: uncertain within the propagated ABSOLUTE
                # error bound (times a safety factor) or the relative
                # margin knob, whichever is larger
                diff = DD.dd_sub(s_dd, edge_dd)
                pos = pass_m & ((diff[0] > 0) | ((diff[0] == 0) & (diff[1] >= 0)))
                s_scale = jnp.maximum(jnp.abs(s_dd[0]), edge_scale)
                thr = jnp.maximum(8 * s_err, margin * s_scale)
                unc = pass_m & (jnp.abs(diff[0] + diff[1]) <= thr)

                # dist argmax, first strict max in flat order
                vh = jnp.where(pass_m, dist_dd[0], neg_inf)
                vl = jnp.where(pass_m, dist_dd[1], neg_inf)
                mh = jnp.max(vh)
                is_mh = (vh == mh) & pass_m
                ml = jnp.max(jnp.where(is_mh, vl, neg_inf))
                cand = is_mh & (vl == ml)
                first_i = jnp.argmax(cand)
                chunk_any = pass_m.any()
                sig = (summin, dot, emd, b_side["mags"], b_side["selfdot"],
                       ll, b_side["std"][0], b_side["std"][1])
                bsig = tuple(x[first_i] for x in sig)
                sig_eq_best = pass_m
                for x, bx in zip(sig, bsig):
                    sig_eq_best &= (x == bx)
                vexact_eq = (vh == vh[first_i]) & (vl == vl[first_i])
                scale = jnp.maximum(jnp.abs(mh), np.float32(1.0))
                tie_thr = jnp.maximum(8 * (dist_err + dist_err[first_i]),
                                      tie_margin * scale)
                near = pass_m & (jnp.abs((vh - vh[first_i]) + (vl - vl[first_i]))
                                 <= tie_thr)
                unc_tie = (near & ~(vexact_eq & sig_eq_best)).any() & chunk_any

                # merge chunk best into carry best.  Lexicographic dd
                # compares (valid for quick_two_sum-normalized pairs) — NOT
                # dd_sub, whose two_sum NaNs out against the inf carry init.
                carry_valid = sc.bpos != NONE
                lgt = (vh[first_i] > sc.bh) | \
                    ((vh[first_i] == sc.bh) & (vl[first_i] > sc.bl))
                leq = (vh[first_i] == sc.bh) & (vl[first_i] == sc.bl)
                better = chunk_any & (~carry_valid | lgt)
                sig_eq_carry = np.bool_(True)
                for bx, cx in zip(bsig, sc.bsig):
                    sig_eq_carry &= (bx == cx)
                dapx = (vh[first_i] + vl[first_i]) - (sc.bh + sc.bl)
                cross_thr = jnp.maximum(
                    8 * (dist_err[first_i] + sc.berr),
                    tie_margin * jnp.maximum(jnp.abs(sc.bh), np.float32(1.0)))
                cross_near = chunk_any & carry_valid & (jnp.abs(dapx) <= cross_thr)
                unc_cross = cross_near & ~(leq & sig_eq_carry)
                nbh = jnp.where(better, vh[first_i], sc.bh)
                nbl = jnp.where(better, vl[first_i], sc.bl)
                nberr = jnp.where(better, dist_err[first_i], sc.berr)
                npos = jnp.where(better, start_c + first_i.astype(jnp.int32), sc.bpos)
                nsig = tuple(jnp.where(better, bx, cx)
                             for bx, cx in zip(bsig, sc.bsig))

                # absorb bookkeeping (int32 column sums are exact: maxc * WC
                # < 2^31 is part of the envelope)
                csum = jnp.where(pos[:, None], blk, 0).sum(axis=0, dtype=jnp.int32)
                old = jax.lax.dynamic_slice(sc.pmask, (start_c,), (WC,))
                pmask = jax.lax.dynamic_update_slice(sc.pmask, old | pos, (start_c,))

                return SC(
                    j=sc.j + 1,
                    bh=nbh, bl=nbl, berr=nberr, bpos=npos, bsig=nsig,
                    any_pos=sc.any_pos | pos.any(),
                    uncert=sc.uncert | unc.any() | unc_tie | unc_cross,
                    msum=sc.msum + csum.astype(jnp.int64),
                    mcnt=sc.mcnt + pos.sum(dtype=jnp.int32),
                    pmask=pmask,
                )

            init = SC(
                j=np.int32(0), bh=neg_inf, bl=neg_inf,
                berr=np.float32(0.0), bpos=NONE,
                bsig=zero_sig, any_pos=np.bool_(False), uncert=np.bool_(False),
                msum=np.zeros(D, np.int64), mcnt=np.int32(0),
                pmask=np.zeros(npad, bool),
            )
            sc = jax.lax.while_loop(lambda s: s.j < nchunks, chunk_body, init)
            return sc

        def closest_to_mean(st: "Carry", msum, mcnt, env_lo, env_hi):
            """argmin_p distance_d(p, mean) over members, reference member
            order (astep, flat) for ties; returns (flat_pos, uncertain)."""
            num = msum                               # int64 [D]
            den = mcnt.astype(jnp.int64)
            q = num // den
            rem = num - q * den
            r = ((2 * num + den) // (2 * den)).astype(jnp.int32)  # round-half-up
            s_floor = jnp.sum(q)
            # guards on the two f64 corners (see module docstring)
            # integer comparison against the floored product is exact:
            # rem <= t (t real) <=> rem <= floor(t) for integer rem, so no
            # +1 slop — the thresholds are << 1 for any realistic cluster
            # (a trip needs (q + 2) * den on the order of 2^51)
            half_lhs = jnp.abs(2 * rem - den)
            tol_half = ((q + 2) * den) >> 51
            g1 = (half_lhs != 0) & (half_lhs <= tol_half)
            tol_f = ((q + 2) * den) >> 52
            g2 = (rem != 0) & (rem <= tol_f)
            tol_c = ((q + C["maxc"] + 2) * den) >> 52
            g3 = (rem != 0) & ((den - rem) <= tol_c)
            unc_bins = (g1 | g2 | g3).any()

            neg_inf = np.float32(-np.inf)
            pos_inf = np.float32(np.inf)

            class MC(NamedTuple):
                j: jnp.ndarray
                vh: jnp.ndarray
                vl: jnp.ndarray
                bkey: jnp.ndarray      # int64 packed (astep, flat) of best
                bsig: tuple            # (dist2, mag) of best
                uncert: jnp.ndarray

            nchunks = (env_hi - env_lo + WC - 1) // WC

            def chunk_body(mc: MC):
                start = env_lo + mc.j * WC
                start_c = jnp.minimum(start, np.int32(npad - WC))
                offs = start_c + np.arange(WC, dtype=np.int32)
                in_rng = (offs >= start) & (offs < env_hi)
                asg = jax.lax.dynamic_slice(st.assign, (start_c,), (WC,))
                stp = jax.lax.dynamic_slice(st.astep, (start_c,), (WC,))
                memb = in_rng & (asg == st.cid)
                blk = jax.lax.dynamic_slice(
                    C["counts"], (start_c, np.int32(0)), (WC, D)).astype(jnp.int32)
                dist2 = 2 * jnp.minimum(blk, r[None, :]).sum(axis=1, dtype=jnp.int32)
                mags = jax.lax.dynamic_slice(C["mags"], (start_c,), (WC,))
                mag = mags.astype(jnp.int64) + s_floor
                # v = 10000 * (1 - frac^2), frac = dist/mag  (f64 ops in dd)
                frac = DD.dd_div(DD.dd_from_i64(dist2.astype(jnp.int64)),
                                 DD.dd_from_i64(mag))
                f2 = DD.dd_mul(frac, frac)
                one = (np.float32(1.0), np.float32(0.0))
                u = DD.dd_sub(one, f2)
                vh_, vl_ = u[0] * np.float32(10000.0), u[1] * np.float32(10000.0)
                vh = jnp.where(memb, vh_, pos_inf)
                vl = jnp.where(memb, vl_, pos_inf)
                # chunk argmin by (v, astep, flat)
                mh = jnp.min(vh)
                is_m = (vh == mh) & memb
                ml = jnp.min(jnp.where(is_m, vl, pos_inf))
                cand = is_m & (vl == ml)
                key = stp.astype(jnp.int64) * np.int64(npad) + offs.astype(jnp.int64)
                ckey = jnp.min(jnp.where(cand, key, np.int64(2**62)))
                ci = jnp.argmax(cand & (key == ckey))
                chunk_any = memb.any()
                csig = (dist2[ci], mag[ci])
                # near-tie guards within the chunk (exact int-equal is safe)
                sig_eq = memb & (dist2 == csig[0]) & (mag == csig[1])
                # absolute floor: v = 1e4*(1-frac^2) carries ~3e-9 absolute
                # dd error near frac ~= 1, where |v| itself goes to zero
                scale = jnp.maximum(jnp.abs(mh), np.float32(1.0))
                thr_m = jnp.maximum(tie_margin * scale, np.float32(1e-7))
                near = memb & (jnp.abs((vh - mh) + (vl - ml)) <= thr_m)
                unc_tie = (near & ~sig_eq).any() & chunk_any

                # lexicographic dd compare against the carry (see the
                # scan_window note: dd_sub NaNs against the inf init)
                carry_valid = jnp.isfinite(mc.vh)
                llt = (mh < mc.vh) | ((mh == mc.vh) & (ml < mc.vl))
                leq = (mh == mc.vh) & (ml == mc.vl)
                better = chunk_any & (~carry_valid | llt)
                better_key = chunk_any & carry_valid & leq & (ckey < mc.bkey)
                take = better | better_key
                sig_eq_carry = (csig[0] == mc.bsig[0]) & (csig[1] == mc.bsig[1])
                dapx = (mh + ml) - (mc.vh + mc.vl)
                cross_near = chunk_any & carry_valid & (
                    jnp.abs(dapx) <= jnp.maximum(
                        tie_margin *
                        jnp.maximum(jnp.abs(mc.vh), np.float32(1.0)),
                        np.float32(1e-7)))
                unc_cross = cross_near & ~(leq & sig_eq_carry)

                return MC(
                    j=mc.j + 1,
                    vh=jnp.where(take, mh, mc.vh),
                    vl=jnp.where(take, ml, mc.vl),
                    bkey=jnp.where(take, ckey, mc.bkey),
                    bsig=tuple(jnp.where(take, a_, b_)
                               for a_, b_ in zip(csig, mc.bsig)),
                    uncert=mc.uncert | unc_tie | unc_cross,
                )

            init = MC(j=np.int32(0), vh=pos_inf, vl=pos_inf,
                      bkey=np.int64(2**62),
                      bsig=(np.int32(0), np.int64(0)),
                      uncert=np.bool_(False))
            mc = jax.lax.while_loop(lambda s: s.j < nchunks, chunk_body, init)
            best_flat = (mc.bkey % np.int64(npad)).astype(jnp.int32)
            return best_flat, mc.uncert | unc_bins

        def body(st: Carry):
            alive_i = st.alive.astype(jnp.int32)
            crank = jnp.cumsum(alive_i)
            rank = crank - alive_i
            total = crank[-1]
            # alive rank at each bin start; bins are contiguous in flat order
            ras = jnp.concatenate([rank[C["bin_start"]][:nb], total[None]])
            bin_cnt = ras[1:] - ras[:-1]
            idxs = jnp.where(st.alive, rank, np.int32(npad))
            # full_like on the traced lens array: a concrete jnp scatter
            # operand would be a device constant (lowering fetches those)
            posr = jnp.full_like(C["lens"], npad).at[idxs].set(
                np.arange(npad, dtype=np.int32), mode="drop")

            blen_c = C["blen"][st.cur]
            elen_c = C["elen"][st.cur]
            nonempty = bin_cnt > 0
            any_ne = total > 0
            first_ne = jnp.argmax(nonempty).astype(jnp.int32)
            last_ne = np.int32(nb - 1) - jnp.argmax(nonempty[::-1]).astype(jnp.int32)

            def inner(target, b0, is_front):
                empty = bin_cnt[b0] == 0
                b = jnp.where(empty, first_ne if is_front else last_ne, b0)
                inbin = st.alive & (C["bin_ids"] == b)
                lb = jnp.sum(inbin & (C["lens"] < target), dtype=jnp.int32)
                eq = jnp.sum(inbin & (C["lens"] == target), dtype=jnp.int32)
                nbn = bin_cnt[b]
                absent = jnp.minimum(lb, jnp.maximum(nbn - 1, 0))
                present_slot = lb if is_front else lb + eq - 1
                slot = jnp.where(eq > 0, present_slot, absent)
                slot = jnp.where(empty, 0, slot)
                return b, slot

            fb, fslot = inner(blen_c, C["fbin0"][st.cur], True)
            bb, bslot = inner(elen_c, C["bbin0"][st.cur], False)
            gfront = ras[fb] + fslot
            gback = ras[bb] + bslot
            have_window = any_ne & (gback > gfront)
            p_lo = jnp.where(have_window, posr[jnp.where(have_window, gfront, 0)], 0)
            p_hi = jnp.where(
                have_window,
                posr[jnp.where(have_window, gback - 1, 0)] + 1,
                0,
            )

            sc = scan_window(st, rank, posr, gfront, gback, p_lo, p_hi,
                             blen_c, elen_c)
            is_min = ~sc.any_pos
            best_valid = sc.bpos != NONE

            def uncertain_case(st):
                return st._replace(abort=np.int32(1), done=np.bool_(True))

            def min_case(st: Carry):
                centers = st.centers.at[st.cid].set(st.cur)
                seed = jnp.where(best_valid, sc.bpos, posr[0])
                none_left = (~best_valid) & (total == 0)
                seed_row = jnp.where(none_left, 0, seed)
                alive = st.alive.at[seed_row].set(
                    jnp.where(none_left, st.alive[seed_row], False))
                new_cid = st.cid + 1
                assign = st.assign.at[seed_row].set(
                    jnp.where(none_left, st.assign[seed_row], new_cid))
                astep = st.astep.at[seed_row].set(
                    jnp.where(none_left, st.astep[seed_row], st.stepc))
                msum = jnp.where(none_left, st.msum,
                                 row_i32(seed_row).astype(jnp.int64))
                return st._replace(
                    alive=alive, assign=assign, astep=astep, centers=centers,
                    cid=new_cid, stepc=st.stepc + 1, cur=seed_row,
                    msum=msum, mcnt=np.int32(1),
                    env_lo=seed_row, env_hi=seed_row + 1,
                    done=none_left,
                )

            def absorb_case(st: Carry):
                alive = st.alive & ~sc.pmask
                assign = jnp.where(sc.pmask, st.cid, st.assign)
                astep = jnp.where(sc.pmask, st.stepc, st.astep)
                msum = st.msum + sc.msum
                mcnt = st.mcnt + sc.mcnt
                env_lo = jnp.minimum(st.env_lo, p_lo)
                env_hi = jnp.maximum(st.env_hi, p_hi)
                st2 = st._replace(alive=alive, assign=assign, astep=astep,
                                  stepc=st.stepc + 1, msum=msum, mcnt=mcnt,
                                  env_lo=env_lo, env_hi=env_hi)
                best_flat, unc = closest_to_mean(st2, msum, mcnt, env_lo, env_hi)
                return jax.lax.cond(
                    unc,
                    lambda s: s._replace(abort=np.int32(2), done=np.bool_(True)),
                    lambda s: s._replace(cur=best_flat),
                    st2,
                )

            st = jax.lax.cond(
                sc.uncert,
                uncertain_case,
                lambda s: jax.lax.cond(is_min, min_case, absorb_case, s),
                st,
            )
            return st._replace(iters=st.iters + 1)

        def program(Carg):
            nonlocal C
            C = dict(Carg)  # helper closures resolve C to the traced arg
            if "counts_nat" in C:
                # device-side permute into bvec-flat order: pad rows point
                # at row 0 (their values are masked out before every use)
                C["counts"] = C["counts_nat"][C["order_pad"]]
            n_s = C["n"]
            max_iters = 2 * n_s.astype(jnp.int32) + 16
            # profiling hook: cap the step count to measure marginal
            # per-step cost of the compiled program (output is then
            # truncated/invalid; never set outside experiments)
            cap = _step_cap()
            if cap:
                max_iters = jnp.minimum(max_iters, np.int32(cap))

            def cond(st: Carry):
                return (~st.done) & (st.iters < max_iters)

            alive = np.arange(npad, dtype=np.int32) < n_s
            alive = alive.at[0].set(False)  # first pop
            assign = jnp.full_like(C["lens"], -1).at[0].set(
                jnp.where(n_s > 0, 0, -1))
            astep = jnp.zeros_like(C["lens"])
            st = Carry(
                alive=alive, assign=assign, astep=astep,
                centers=np.zeros(npad, np.int32),
                cid=np.int32(0), stepc=np.int32(1), cur=np.int32(0),
                msum=row_i32(np.int32(0)).astype(jnp.int64),
                mcnt=np.int32(1),
                env_lo=np.int32(0), env_hi=np.int32(1),
                done=n_s == 0, abort=np.int32(0),
                iters=np.int32(0),
            )
            st = jax.lax.while_loop(cond, body, st)
            return (st.abort, st.cid, st.cur, st.alive, st.assign,
                    st.astep, st.centers, st.iters)

        return jax.jit(program)

    # -- public entry ------------------------------------------------------------

    def ensure_ready(self, bv: BVec) -> None:
        """Prepare, upload (forced), lower and compile for this pool state
        so a later run(bv) on the same state only executes.  Called by
        DeviceSession before the measured clustering window opens."""
        import jax.numpy as jnp
        import jax

        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        host, dev = self._prepare(bv)
        prog = self._build_program(host, dev)
        Cdev = {k: jnp.asarray(v) for k, v in dev.items()}
        compiled = prog.lower(Cdev).compile()
        # force the per-run uploads to completion now (async dispatch would
        # otherwise bill them to the first execute)
        for v in Cdev.values():
            np.asarray(v.ravel()[-1] if v.ndim else v)
        self._ready = (host, Cdev, compiled)

    def _ready_matches(self, bv: BVec) -> bool:
        ready = getattr(self, "_ready", None)
        if ready is None:
            return False
        host = ready[0]
        order = np.concatenate([b for b in bv.bins]) if bv.size() \
            else np.zeros(0, np.int64)
        return (len(order) == host["n"]
                and np.array_equal(order, host["order"]))

    def run(self, bv: BVec):
        """Returns (clusters_raw, None) on completion, or (None, ResumeState)
        on a guarded abort.  clusters_raw is a list of (center_row,
        [member_rows...]) in creation order."""
        import jax

        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        import time

        profile = bool(os.environ.get("MC2_DEVICE_PROF"))
        t0 = time.time()
        if self._ready_matches(bv):
            host, Cdev, compiled = self._ready
            t1 = t1b = t2 = time.time()
        else:
            host, dev = self._prepare(bv)
            t1 = time.time()
            prog = self._build_program(host, dev)
            import jax.numpy as jnp

            Cdev = {k: jnp.asarray(v) for k, v in dev.items()}
            lowered = prog.lower(Cdev)
            t1b = time.time()
            compiled = lowered.compile()
            t2 = time.time()
        res = compiled(Cdev)
        abort, cid, cur, alive, assign, astep, centers, iters = (
            np.asarray(x) for x in res)
        t3 = time.time()
        self.last_exec_seconds = t3 - t2
        self.last_steps = int(iters)
        if profile:
            print(f"device accumulate: prepare {t1 - t0:.2f}s, "
                  f"lower {t1b - t1:.2f}s, compile {t2 - t1b:.2f}s, "
                  f"execute {t3 - t2:.2f}s, {int(iters)} steps")
        n = host["n"]
        alive, assign, astep = alive[:n], assign[:n], astep[:n]
        order = host["order"]
        n_it = int(iters)
        if n_it >= 2 * n + 16:
            raise RuntimeError("device accumulate exceeded its iteration bound")
        cap = _step_cap()
        if cap and n_it >= cap and int(abort) == 0 and alive.any():
            # the cap truncated the loop: the clustering is INVALID.  Allow
            # it only for explicit profiling sessions, and say so loudly.
            if not os.environ.get("MC2_DEVICE_PROF"):
                raise RuntimeError(
                    f"MC2_DEV_STEP_CAP={cap} truncated the accumulate loop "
                    f"({n_it} steps, pool not empty) — unset it for real "
                    "runs; it exists only for profiling experiments")
            print(f"WARNING: MC2_DEV_STEP_CAP={cap} truncated the device "
                  "accumulate loop; output below is NOT a valid clustering",
                  flush=True)
        abort = int(abort)

        def members_of(c):
            idx = np.nonzero(assign == c)[0]
            key = astep[idx].astype(np.int64) * (n + 1) + idx
            return idx[np.argsort(key, kind="stable")]

        if abort == 0:
            ncl = int(cid)
            out = []
            for c in range(ncl):
                flat = members_of(c)
                out.append((int(order[centers[c]]), order[flat].tolist()))
            return out, None
        # guarded abort: reconstruct the exact host state
        done_clusters = []
        for c in range(int(cid)):
            flat = members_of(c)
            done_clusters.append((int(order[centers[c]]), order[flat].tolist()))
        cur_flat = members_of(int(cid))
        current_rows = order[cur_flat].tolist()
        # rebuild a BVec directly from the alive flags (order preserved;
        # __init__ fields are fully overwritten below)
        bv2 = BVec(self.ps.lengths, bin_size=1000)
        bv2.begin_bounds = list(bv.begin_bounds)
        bv2._bounds_arr = np.asarray(bv2.begin_bounds, dtype=np.int64)
        bv2._lengths = np.asarray(self.ps.lengths, dtype=np.int64)
        bin_start = host["bin_start"]
        bins, marks = [], []
        for b in range(host["nb"]):
            span = np.arange(bin_start[b], bin_start[b + 1])
            keep = span[alive[span]]
            bins.append(order[keep].astype(np.int64))
            marks.append(np.zeros(len(keep), dtype=bool))
        bv2.bins = bins
        bv2.marks = marks
        state = ResumeState(
            stage=abort,
            clusters_done=done_clusters,
            current_rows=current_rows,
            last_row=int(order[cur]),
            bv=bv2,
        )
        return None, state
