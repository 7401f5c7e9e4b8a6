"""Mean-shift clustering engine.

Drives the two phases of the reference algorithm (ClusterFactory.cpp:620-656):

  accumulation  — greedy sweep over the length-sorted pool: repeatedly score
                  a window of candidates around the current center, pull in
                  classifier positives, re-center on the member closest to
                  the arithmetic mean (ClusterFactory.cpp:552-610);
  update/merge  — iterative per-center re-centering over +/-delta neighbor
                  clusters and classifier-directed merging
                  (ClusterFactory.cpp:287-401,635-655).

The control flow is host-driven (it is inherently sequential and
data-dependent); all O(window x 4^k) scoring goes through a Scorer, which is
either the float64 host oracle (exact) or the batched device path
(ops/device_features.py) with exact rechecks on borderline margins.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Protocol, Tuple

import numpy as np

from ..kmer.counting import PointSet
from ..model.classifier import CompiledModel
from ..features import host as H
from .bvec import BVec


class Scorer(Protocol):
    def score(self, a_rows: np.ndarray, b_rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(prob, dist) for pairs (a_rows[i], b_rows[i]) in that argument
        order (order matters for asymmetric features)."""
        ...


class HostScorer:
    """Exact float64 scoring via the host oracle."""

    def __init__(self, ps: PointSet, model: CompiledModel):
        self.ps = ps
        self.model = model

    def score(self, a_rows, b_rows):
        a_rows = np.atleast_1d(np.asarray(a_rows))
        b_rows = np.atleast_1d(np.asarray(b_rows))
        if len(b_rows) == 1 and len(a_rows) > 1:
            b_rows = np.broadcast_to(b_rows, a_rows.shape)
        if len(a_rows) == 1 and len(b_rows) > 1:
            a_rows = np.broadcast_to(a_rows, b_rows.shape)
        A = H.side_from_pointset(self.ps, a_rows)
        B = H.side_from_pointset(self.ps, b_rows)
        return self.model.score(A, B)


def c_round(x):
    """C round(): half away from zero (used on probabilities and means)."""
    return np.floor(np.asarray(x, dtype=np.float64) + 0.5)


def distance_d(counts_rows: np.ndarray, mags_rows: np.ndarray, top: np.ndarray) -> np.ndarray:
    """DivergencePoint::distance_d against a double-valued mean histogram
    (DivergencePoint.cpp:54-66): 10000*(1-frac^2) with
    dist = sum 2*min(p_i, round(top_i)) and mag accumulated into a uint64_t,
    i.e. each (p_i + top_i) TRUNCATED before summing — both sums are
    integer-exact, making the value deterministic."""
    r = np.floor(top + 0.5)  # C round() for non-negative values
    dist = 2.0 * np.minimum(counts_rows, r[None, :]).sum(axis=1, dtype=np.float64)
    mag = np.trunc(counts_rows + top[None, :]).sum(axis=1, dtype=np.float64)
    frac = dist / mag
    return 10000.0 * (1.0 - frac * frac)


@dataclass
class Cluster:
    center_row: int
    members: List[int]
    deleted: bool = False


@dataclass
class EngineStats:
    windows_scored: int = 0
    pairs_scored: int = 0
    clusters_before_update: int = 0
    update_iterations: int = 0


class MeanShiftEngine:
    def __init__(
        self,
        ps: PointSet,
        model: CompiledModel,
        similarity: float,
        scorer: Optional[Scorer] = None,
        delta: int = 5,
        iterations: int = 15,
        bin_size: int = 1000,
    ):
        self.ps = ps
        self.model = model
        self.sim = similarity
        self.scorer = scorer or HostScorer(ps, model)
        self.delta = delta
        self.iterations = iterations
        self.bin_size = bin_size
        self.stats = EngineStats()
        self._counts_f = ps.counts.astype(np.float64)

    # ---------------- accumulation phase ----------------

    def _get_close(self, bv: BVec, center: int):
        """Trainer::get_close (Trainer.cpp:22-71) over the center's length
        window.  Returns (argmax_row, argmax_pos, is_min, marked_positions)."""
        length = int(self.ps.lengths[center])
        begin_len = int(length * self.sim)   # uint64 truncation of double product
        end_len = int(length / self.sim)
        front, back, back_empty = bv.get_range(begin_len, end_len)
        if back_empty:
            return None, None, True, front, back
        positions = bv.window_positions(front, back)
        if not positions:
            return None, None, True, front, back
        rows = bv.rows_at(positions)
        lens = self.ps.lengths[rows]
        min_len = int(length * self.sim)
        max_len = int(length / self.sim)
        pass_mask = (lens >= min_len) & (lens <= max_len)
        if not pass_mask.any():
            return None, None, True, front, back
        sel = np.nonzero(pass_mask)[0]
        prob, dist = self.scorer.score(rows[sel], np.array([center]))
        self.stats.windows_scored += 1
        self.stats.pairs_scored += len(sel)
        pos_mask = c_round(prob) > 0
        is_min = not pos_mask.any()
        # argmax by dist, first strict max wins (sequential pmax,
        # Trainer.cpp:57)
        best_i = int(np.argmax(dist))  # np.argmax returns first max
        best_sel = sel[best_i]
        marked = [positions[i] for i in sel[pos_mask]]
        bv.mark(marked)
        return int(rows[best_sel]), positions[best_sel], is_min, front, back

    def _get_mean(self, current: List[int]) -> int:
        """Member closest to the arithmetic mean (ClusterFactory.cpp:337-380),
        first strict minimum wins."""
        rows = np.asarray(current)
        top = self._counts_f[rows].mean(axis=0)
        d = distance_d(self.ps.counts[rows], self.ps.mags[rows].astype(np.float64), top)
        return int(rows[int(np.argmin(d))])

    def accumulate_all(self, bv: BVec) -> List[Cluster]:
        clusters: List[Cluster] = []
        last = bv.pop()
        while last is not None:
            current = [last]
            is_min = False
            while not is_min:
                best_row, best_pos, is_min, front, back = self._get_close(bv, last)
                if is_min:
                    if best_row is None:
                        nxt = bv.pop()
                    else:
                        nxt = best_row
                        bv.erase(*best_pos)
                    clusters.append(Cluster(center_row=last, members=current))
                    last = nxt
                else:
                    current.extend(bv.remove_available(front, back))
                    last = self._get_mean(current)
            # loop continues with the next center (or exits when pool empty)
        self.stats.clusters_before_update = len(clusters)
        return clusters

    # ---------------- update/merge phase ----------------

    def _filter_positive(self, center: int, rows: np.ndarray) -> np.ndarray:
        """Trainer::filter (Trainer.cpp:122-141): keep rows that pass the
        length window AND classify positive with argument order
        (center, member)."""
        if len(rows) == 0:
            return rows
        cen_len = int(self.ps.lengths[center])
        min_len = int(self.sim * cen_len)
        max_len = int(cen_len / self.sim)
        lens = self.ps.lengths[rows]
        length_pass = (lens >= min_len) & (lens <= max_len)
        keep = np.zeros(len(rows), dtype=bool)
        if length_pass.any():
            sel = np.nonzero(length_pass)[0]
            prob, _ = self.scorer.score(np.array([center]), rows[sel])
            self.stats.pairs_scored += len(sel)
            keep[sel] = c_round(prob) != 0
        return rows[keep]

    def _mean_shift_update(self, clusters: List[Cluster], j: int, delta: int) -> int:
        """One center re-estimation (ClusterFactory.cpp:287-335).  Returns the
        new center row."""
        center = clusters[j].center_row
        i_begin = max(0, j - delta)
        i_end = min(j + delta, len(clusters) - 1)
        rows = np.array(
            [r for i in range(i_begin, i_end + 1) for r in clusters[i].members],
            dtype=np.int64,
        )
        good = self._filter_positive(center, rows)
        if len(good) > 0:
            top = self._counts_f[good].mean(axis=0)
            d = distance_d(self.ps.counts[good], self.ps.mags[good].astype(np.float64), top)
            return int(good[int(np.argmin(d))])
        elif delta == 0:
            return clusters[j].members[0]
        return center

    def _merge_pass(self, clusters: List[Cluster], delta: int) -> bool:
        """Classifier-directed center merging (ClusterFactory.cpp:382-401,
        Trainer.cpp:73-109)."""
        num_merge = 0
        for i in range(len(clusters)):
            last_j = min(len(clusters) - 1, i + delta)
            if last_j <= i:
                continue
            p = clusters[i].center_row
            cen_length = int(self.ps.lengths[p])
            min_length = int(cen_length * self.sim)
            max_length = int(cen_length / self.sim)
            cand = np.arange(i + 1, last_j + 1)
            cen_rows = np.array([clusters[j].center_row for j in cand], dtype=np.int64)
            lens = self.ps.lengths[cen_rows]
            length_pass = (lens >= min_length) & (lens <= max_length)
            best = (0, -np.inf)
            if length_pass.any():
                sel = np.nonzero(length_pass)[0]
                prob, dist = self.scorer.score(cen_rows[sel], np.array([p]))
                self.stats.pairs_scored += len(sel)
                res = c_round(prob)
                for idx_in_sel, j_local in enumerate(sel):
                    if res[idx_in_sel] == 1:
                        d = dist[idx_in_sel]
                        # ties: later candidate wins (best.second > dist keeps
                        # best only when strictly greater, Trainer.cpp:104)
                        if not (best[1] > d):
                            best = (int(cand[j_local]), d)
            ret = best[0]
            if ret > i:
                num_merge += 1
                clusters[ret].members.extend(clusters[i].members)
                clusters[i].deleted = True
        if num_merge:
            clusters[:] = [c for c in clusters if not c.deleted]
        return num_merge > 0

    def update_phase(self, clusters: List[Cluster]) -> None:
        num_clusters: List[int] = []
        for it in range(self.iterations):
            if it >= 3 and len(clusters) == num_clusters[it - 3]:
                break
            new_centers = [
                self._mean_shift_update(clusters, j, self.delta)
                for j in range(len(clusters))
            ]
            for c, nc in zip(clusters, new_centers):
                c.center_row = nc
            self._merge_pass(clusters, self.delta)
            num_clusters.append(len(clusters))
            self.stats.update_iterations += 1
        new_centers = [
            self._mean_shift_update(clusters, j, 0) for j in range(len(clusters))
        ]
        for c, nc in zip(clusters, new_centers):
            c.center_row = nc

    # ---------------- public API ----------------

    def run(self, clock=None) -> List[Cluster]:
        bv = BVec(self.ps.lengths, self.bin_size)
        for row in range(self.ps.n):
            bv.insert(row, int(self.ps.lengths[row]))
        bv.insert_finalize(self.ps.lengths)
        clusters = self.accumulate_all(bv)
        print(f"Number of clusters before update: {len(clusters)}")
        if clock is not None:
            clock.stamp("accumulate")
        self.update_phase(clusters)
        return clusters

    def to_output(self, clusters: List[Cluster]) -> List[dict]:
        out = []
        for cl in clusters:
            members = [
                (
                    int(self.ps.lengths[r]),
                    self.ps.headers[r],
                    r == cl.center_row,
                )
                for r in cl.members
            ]
            out.append({"members": members})
        return out
