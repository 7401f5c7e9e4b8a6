"""Device-batched update/merge phase.

The reference's update phase (ClusterFactory.cpp:287-401,635-655) is, per
iteration, three embarrassingly-parallel batches: classifier-filter every
center against its +/-delta neighborhood members (Trainer::filter,
Trainer.cpp:122-141), re-center each cluster on the member closest to the
member mean (Trainer::closest, Trainer.cpp:143-157), and score the
(i, i+1..i+delta) center pairs for merging (Trainer::merge,
Trainer.cpp:73-109).  Unlike the accumulate phase there is no per-center
sequential dependence, so the TPU-native shape is NOT a device-resident
loop: it is one large device batch per sub-phase — O(iterations) dispatches
total (~45 for the default 15 iterations), each saturating the chip,
versus the reference's O(centers x members) scalar loop.  The iteration
control flow and the merge bookkeeping (an order-dependent list splice,
ClusterFactory.cpp:382-401) stay on the host where they are O(C) numpy work.

Exactness contract (same as cluster/device_loop.py): integer-exact pairwise
stats + dd-f32 epilogue + float64 decision edges.  Each batch returns the
GLM sum and dist as dd pairs; the HOST converts them to f64 and applies the
edges with a margin — pairs inside the margin are re-scored by the float64
host oracle (cheap: they are rare and the batch boundary is already on the
host), so decisions always match the reference bit for bit.

Closest-to-mean runs on device as segmented integer reductions
(num/den rounding corners guarded per bin exactly as in device_loop), with
per-center host fallback on any guard trip.
"""
from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from ..model.classifier import CompiledModel
from ..model import thresholds as TH
from ..kmer.counting import PointSet
from ..ops import ddf32 as DD
from .device_loop import (
    DEFAULT_MARGIN,
    DEFAULT_TIE_MARGIN,
    DeviceLoopUnsupported,
    _pack_model,
    derive_singles_dd,
    emd_rowsum,
    envelope_check,
    epilogue_dd,
    stat_needs,
)

# coarse (4x-stepped) buckets: every distinct bucket size costs a jit
# trace + compile-cache load through the tunnel (~1s), which at the observed
# call sizes dwarfs the padded-execute cost of a 4x-wide bucket
_PAIR_BUCKETS = [1 << b for b in range(10, 22, 2)]


def _bucket(n: int) -> int:
    for b in _PAIR_BUCKETS:
        if n <= b:
            return b
    return int(2 ** int(np.ceil(np.log2(max(n, 2)))))


class DeviceUpdater:
    """Batched device scoring + closest-to-mean for the update/merge phase."""

    def __init__(self, ps: PointSet, model: CompiledModel, sim: float,
                 margin: float = DEFAULT_MARGIN,
                 tie_margin: float = DEFAULT_TIE_MARGIN):
        import jax
        import jax.numpy as jnp

        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        self.jax = jax
        self.jnp = jnp
        self.ps = ps
        self.model = model
        self.sim = float(sim)
        self.margin = float(margin)
        self.tie_margin = float(max(tie_margin, margin * 1e-2)) \
            if margin > DEFAULT_MARGIN else float(tie_margin)
        self.pack = _pack_model(model)
        self_dots = envelope_check(ps)
        self.d = ps.dim
        self.maxc = int(ps.counts.max()) if ps.n else 0

        self.counts = jnp.asarray(ps.counts)  # natural width
        self.mags = jnp.asarray(ps.mags.astype(np.int32))
        self.selfdot = jnp.asarray(self_dots.astype(np.int32))
        self.lens = jnp.asarray(ps.lengths.astype(np.int32))
        sh, sl = DD.split_f64(ps.stddevs)
        self.std_h = jnp.asarray(sh)
        self.std_l = jnp.asarray(sl)
        # per-point arrays are jit ARGUMENTS, never closure captures: a
        # captured counts array is inlined into the HLO as a multi-MB
        # literal, exploding compile time per pair-count bucket (see
        # device_loop._build_program)
        self._arrs = (self.counts, self.mags, self.selfdot, self.lens,
                      self.std_h, self.std_l)

        self._score_jit = jax.jit(self._score_impl)
        self._closest_jit = {}

        # f64 decision edges (host-side application)
        self.band0 = TH.nonzero_bands(model.bias)   # c_round(prob) != 0
        self.band1 = TH.merge_band(model.bias)      # c_round(prob) == 1

        self.scored_pairs = 0
        self.rechecked_pairs = 0
        # MC2_DEVICE_PROF accounting
        self.t_score = 0.0
        self.t_closest = 0.0
        self.n_score = 0
        self.n_closest = 0

    def prof_line(self) -> str:
        return (f"device update: score {self.t_score:.2f}s/{self.n_score} "
                f"calls, closest {self.t_closest:.2f}s/{self.n_closest} "
                f"calls, {self.scored_pairs} pairs "
                f"({self.rechecked_pairs} host-rechecked)")

    # -- pair scoring -----------------------------------------------------------

    @staticmethod
    def _arr_side(mags, selfdot, std_h, std_l, lens, idx):
        return {
            "mags": mags[idx],
            "selfdot": selfdot[idx],
            "std": (std_h[idx], std_l[idx]),
            "lens": lens[idx],
        }

    def _score_impl(self, counts, mags, selfdot, lens, std_h, std_l,
                    a_idx, b_idx):
        import jax
        jnp = self.jnp
        A = counts[a_idx].astype(jnp.int32)
        B = counts[b_idx].astype(jnp.int32)
        nsm, ndot, nemd = stat_needs(self.pack.singles)
        W = A.shape[0]
        summin = (jnp.minimum(A, B).sum(axis=1, dtype=jnp.int32)
                  if nsm else jnp.zeros((W,), jnp.int32))
        dot = ((A * B).sum(axis=1, dtype=jnp.int32)
               if ndot else jnp.zeros((W,), jnp.int32))
        emd = (emd_rowsum(jax, jnp, A - B, self.d)
               if nemd else jnp.zeros((W,), jnp.int64))
        stats = {"summin": summin, "dot": dot, "emd": emd}
        singles = derive_singles_dd(
            self.pack, self.d, jnp, stats,
            self._arr_side(mags, selfdot, std_h, std_l, lens, a_idx),
            self._arr_side(mags, selfdot, std_h, std_l, lens, b_idx))
        s_dd, dist_dd, s_err, dist_err = epilogue_dd(self.pack, singles)
        return s_dd[0], s_dd[1], dist_dd[0], dist_dd[1], s_err, dist_err

    MAX_PAIR_CHUNK = 1 << 17

    def score_sum_dist(self, a_rows, b_rows) -> Tuple[np.ndarray, np.ndarray]:
        """(s, dist) as float64 approximations (dd hi+lo, ~1e-13 relative)
        for pairs (a_rows[i], b_rows[i]) with the reference's argument
        order.  Decisions from these values are only trusted outside the
        margin (see decide_*)."""
        jnp = self.jnp
        a_rows = np.ascontiguousarray(a_rows, dtype=np.int32)
        b_rows = np.ascontiguousarray(b_rows, dtype=np.int32)
        n = len(a_rows)
        if n == 0:
            return np.zeros(0), np.zeros(0)
        if n > self.MAX_PAIR_CHUNK:
            parts = []
            serrs, derrs = [], []
            for st in range(0, n, self.MAX_PAIR_CHUNK):
                parts.append(self.score_sum_dist(
                    a_rows[st:st + self.MAX_PAIR_CHUNK],
                    b_rows[st:st + self.MAX_PAIR_CHUNK]))
                serrs.append(self.last_serr)
                derrs.append(self.last_derr)
            self.last_serr = np.concatenate(serrs)
            self.last_derr = np.concatenate(derrs)
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        import time as _time

        t0 = _time.time()
        m = _bucket(n)
        ap = np.zeros(m, np.int32)
        bp = np.zeros(m, np.int32)
        ap[:n] = a_rows
        bp[:n] = b_rows
        res = self._score_jit(*self._arrs, jnp.asarray(ap), jnp.asarray(bp))
        self.scored_pairs += n
        # ONE device->host transfer for all six result arrays: each separate
        # np.asarray is its own blocking round trip through the tunnel
        sh, sl, dh, dl, serr, derr = (
            np.asarray(x) for x in self.jax.device_get(res))
        s = sh.astype(np.float64)[:n] + sl.astype(np.float64)[:n]
        dist = dh.astype(np.float64)[:n] + dl.astype(np.float64)[:n]
        self.last_serr = serr.astype(np.float64)[:n]
        self.last_derr = derr.astype(np.float64)[:n]
        self.t_score += _time.time() - t0
        self.n_score += 1
        return s, dist

    def _band_decide(self, s: np.ndarray, band) -> Tuple[np.ndarray, np.ndarray]:
        """in-band mask + uncertainty mask for s against [lo, hi).  The
        margin scales with the per-pair GLM term magnitudes (last_smag):
        cancellation makes the dd error track sum |c_j w_j|, not |s|."""
        lo, hi = band
        err = getattr(self, "last_serr", np.zeros(len(s)))
        inb = np.ones(len(s), dtype=bool)
        unc = np.zeros(len(s), dtype=bool)
        for edge, ge in ((lo, True), (hi, False)):
            if np.isfinite(edge):
                inb &= (s >= edge) if ge else (s < edge)
                thr = np.maximum(8 * err, self.margin * max(abs(edge), 1.0))
                unc |= np.abs(s - edge) <= thr
            elif (edge == -np.inf) != ge:
                # hi == -inf or lo == +inf: band empty
                inb &= False
        return inb, unc

    def keep_and_dist(self, a_rows, b_rows, host_scorer):
        """Update-filter decisions: keep = c_round(prob) != 0
        (engine._batched_mean_shift_update).  Margin-uncertain pairs are
        re-scored by the float64 host oracle."""
        s, _ = self.score_sum_dist(a_rows, b_rows)
        inb, unc = self._band_decide(s, self.band0)
        keep = ~inb
        idx = np.nonzero(unc)[0]
        if len(idx):
            self.rechecked_pairs += len(idx)
            prob, _ = host_scorer.score(np.asarray(a_rows)[idx],
                                        np.asarray(b_rows)[idx])
            keep[idx] = np.floor(prob + 0.5) != 0
        return keep

    def merge_decisions(self, a_rows, b_rows, seg, host_scorer):
        """Merge decisions: res1 = c_round(prob) == 1 plus the per-segment
        dist argmax inputs (engine._merge_pass).  Uncertain probabilities
        are host-rechecked; any segment whose dist ranking is ambiguous at
        the margin gets ALL its candidate dists replaced by host values."""
        s, dist = self.score_sum_dist(a_rows, b_rows)
        res1, unc = self._band_decide(s, self.band1)
        idx = np.nonzero(unc)[0]
        if len(idx):
            self.rechecked_pairs += len(idx)
            prob, d2 = host_scorer.score(np.asarray(a_rows)[idx],
                                         np.asarray(b_rows)[idx])
            res1[idx] = np.floor(prob + 0.5) == 1
            dist[idx] = d2
        # per-segment near-tie detection among res1 candidates
        if len(seg):
            seg = np.asarray(seg)
            order = np.arange(len(seg))
            amb_segs = []
            bounds = np.searchsorted(seg, np.unique(seg))
            uniq = np.unique(seg)
            ends = np.searchsorted(seg, uniq, side="right")
            for u, lo_i, hi_i in zip(uniq, bounds, ends):
                m = res1[lo_i:hi_i]
                if m.sum() < 2:
                    continue
                d = dist[lo_i:hi_i][m]
                derr = self.last_derr[lo_i:hi_i][m] if \
                    hasattr(self, "last_derr") else np.zeros_like(d)
                mx = d.max()
                near = np.abs(d - mx) <= np.maximum(
                    8 * (derr + derr.max()),
                    self.tie_margin * max(abs(mx), 1.0))
                if near.sum() > 1 and not np.all(d[near] == mx):
                    amb_segs.append((lo_i, hi_i))
            for lo_i, hi_i in amb_segs:
                self.rechecked_pairs += hi_i - lo_i
                prob, d2 = host_scorer.score(np.asarray(a_rows)[lo_i:hi_i],
                                             np.asarray(b_rows)[lo_i:hi_i])
                res1[lo_i:hi_i] = np.floor(prob + 0.5) == 1
                dist[lo_i:hi_i] = d2
        return res1, dist

    # -- closest to mean --------------------------------------------------------

    def _build_closest(self, P: int, C: int):
        import jax
        jnp = self.jnp
        D = self.d
        maxc = np.int64(self.maxc)

        def impl(counts, mags, rows, seg, valid):
            cnt = jax.ops.segment_sum(valid.astype(jnp.int64), seg,
                                      num_segments=C)
            blk = counts[rows].astype(jnp.int64)
            blk = jnp.where(valid[:, None], blk, 0)
            num = jax.ops.segment_sum(blk, seg, num_segments=C)
            den = jnp.maximum(cnt, 1)[:, None]
            q = num // den
            rem = num - q * den
            r = ((2 * num + den) // (2 * den)).astype(jnp.int32)
            s_floor = q.sum(axis=1)
            # f64 rounding-corner guards (device_loop.closest_to_mean)
            # integer comparison against the floored product is exact:
            # rem <= t (t real) <=> rem <= floor(t) for integer rem, so no
            # +1 slop — the thresholds are << 1 for any realistic cluster
            # (a trip needs (q + 2) * den on the order of 2^51)
            half_lhs = jnp.abs(2 * rem - den)
            tol_half = ((q + 2) * den) >> 51
            g1 = (half_lhs != 0) & (half_lhs <= tol_half)
            tol_f = ((q + 2) * den) >> 52
            g2 = (rem != 0) & (rem <= tol_f)
            tol_c = ((q + maxc + 2) * den) >> 52
            g3 = (rem != 0) & ((den - rem) <= tol_c)
            seg_unc = (g1 | g2 | g3).any(axis=1)

            blk32 = counts[rows].astype(jnp.int32)
            dist2 = 2 * jnp.minimum(blk32, r[seg]).sum(axis=1, dtype=jnp.int32)
            mag = mags[rows].astype(jnp.int64) + s_floor[seg]
            frac = DD.dd_div(DD.dd_from_i64(dist2.astype(jnp.int64)),
                             DD.dd_from_i64(mag))
            f2 = DD.dd_mul(frac, frac)
            one = (jnp.float32(1.0), jnp.float32(0.0))
            u = DD.dd_sub(one, f2)
            vh = u[0] * np.float32(10000.0)
            vl = u[1] * np.float32(10000.0)
            inf = jnp.float32(np.inf)
            vh = jnp.where(valid, vh, inf)
            vl = jnp.where(valid, vl, inf)
            mh = jax.ops.segment_min(vh, seg, num_segments=C)
            is_m = valid & (vh == mh[seg])
            ml = jax.ops.segment_min(jnp.where(is_m, vl, inf), seg,
                                     num_segments=C)
            cand = is_m & (vl == ml[seg])
            pos = jnp.arange(P, dtype=jnp.int64)
            first = jax.ops.segment_min(jnp.where(cand, pos, np.int64(P)),
                                        seg, num_segments=C)
            # near-tie guard: non-candidates within margin of the minimum,
            # excluding exact integer-equal stats (which tie safely)
            fd2 = jnp.where(first[seg] < P, dist2[first[seg].astype(jnp.int32)], 0)
            fmg = jnp.where(first[seg] < P, mag[first[seg].astype(jnp.int32)], 0)
            sig_eq = (dist2 == fd2) & (mag == fmg)
            scale = jnp.maximum(jnp.abs(mh[seg]), jnp.float32(1.0))
            near = valid & (jnp.abs((vh - mh[seg]) + (vl - ml[seg]))
                            <= np.float32(self.tie_margin) * scale)
            tie_unc = jax.ops.segment_max((near & ~sig_eq).astype(jnp.int32),
                                          seg, num_segments=C) > 0
            return first, seg_unc | tie_unc

        return jax.jit(impl)

    MAX_CLOSEST_PAIRS = 1 << 17

    def closest_batch(self, rows: np.ndarray, seg: np.ndarray, C: int):
        """Per-segment closest-to-mean over (rows, seg) pairs in first-min
        order; returns (best_pair_index_per_seg [C] int64 with P = no
        member, uncertain [C] bool).  seg must be nondecreasing."""
        jnp = self.jnp
        P = len(rows)
        if P == 0:
            return np.full(C, 0, np.int64), np.zeros(C, bool)
        if P > self.MAX_CLOSEST_PAIRS:
            # split on a segment boundary and recurse
            cut = int(np.searchsorted(seg, seg[self.MAX_CLOSEST_PAIRS // 2],
                                      side="left"))
            if cut == 0 or cut >= P:
                cut = P // 2
            c_mid = int(seg[cut])
            f1, u1 = self.closest_batch(rows[:cut], seg[:cut], c_mid)
            f2, u2 = self.closest_batch(rows[cut:], seg[cut:] - c_mid,
                                        C - c_mid)
            f2 = np.where(f2 < (P - cut), f2 + cut, P)
            f1 = np.where(f1 < cut, f1, P)
            return np.concatenate([f1, f2]), np.concatenate([u1, u2])
        import time as _time

        t0 = _time.time()
        Pb = _bucket(P)
        Cb = _bucket(max(C, 1))
        key = (Pb, Cb)
        if key not in self._closest_jit:
            self._closest_jit[key] = self._build_closest(Pb, Cb)
        rp = np.zeros(Pb, np.int32)
        sp = np.full(Pb, Cb - 1, np.int32)
        vp = np.zeros(Pb, bool)
        rp[:P] = rows
        sp[:P] = seg
        vp[:P] = True
        first, unc = self.jax.device_get(
            self._closest_jit[key](self.counts, self.mags,
                                   jnp.asarray(rp), jnp.asarray(sp),
                                   jnp.asarray(vp)))
        first = np.asarray(first)[:C]
        first = np.where(first >= P, P, first)
        self.t_closest += _time.time() - t0
        self.n_closest += 1
        return first.astype(np.int64), np.asarray(unc)[:C]
