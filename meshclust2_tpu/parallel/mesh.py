"""Multi-chip sharding: device mesh setup and the sharded compute steps.

The reference is a single-node OpenMP program (SURVEY §2.8); its TPU-native
equivalent shards the [N, 4^k] histogram matrix data-parallel across a
jax.sharding Mesh and expresses the cross-device reductions that the
algorithm needs as XLA collectives:

  - pairwise window/center scoring: rows sharded, centers replicated; no
    collective needed for the scores themselves (output stays row-sharded);
  - mean-shift center means: psum of masked local sums and counts;
  - closest-to-mean selection: local argmin + global min via psum-style
    reduction over the device axis;
  - GLM normal equations on sharded pair populations: X^T X and X^T y via
    psum, with the tiny solve replicated.

All functions here are pure and jittable; the mean-shift engine calls them
through shard_map over a 1-D "data" mesh (ICI-friendly: only all-reduce
traffic, no gathers of histogram data).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def classify_kernel_factory(weights, mins, maxs, is_sim, combo_spec,
                            bias: float = 0.0):
    """Build a jittable epilogue: raw singles [B, S] -> (prob, dist) [B].

    combo_spec: tuple of (kind, idx tuple) per combo (model.combo_indices()).
    Mirrors the decision path Predictor.cpp:315-333 in float32.
    """
    import jax.numpy as jnp

    w = jnp.asarray(weights, dtype=jnp.float32)
    mn = jnp.asarray(mins, dtype=jnp.float32)
    mx = jnp.asarray(maxs, dtype=jnp.float32)
    sim = jnp.asarray(is_sim)

    def epilogue(raw):
        v = (raw - mn[None, :]) / (mx - mn)[None, :]
        v = jnp.where(sim[None, :], v, 1.0 - v)
        cols = []
        for kind, idxs in combo_spec:
            if kind == "xy":
                c = jnp.prod(v[:, list(idxs)], axis=1)
            elif kind == "x2y2":
                c = jnp.prod(v[:, list(idxs)] ** 2, axis=1)
            elif kind == "xy2":
                c = v[:, idxs[0]] * v[:, idxs[1]] ** 2
            else:  # x2y
                c = v[:, idxs[0]] ** 2 * v[:, idxs[1]]
            cols.append(c)
        combo = jnp.stack(cols, axis=1)
        s = w[0] + combo @ w[1:]
        # prob = logistic(s) + bias (Predictor.cpp:310-320 — the --bias knob)
        prob = 1.0 / (1.0 + jnp.exp(-s)) + jnp.float32(bias)
        return prob, combo[:, 0]

    return epilogue


def sharded_center_scores(mesh, singles_fn, epilogue, axis: str = "data"):
    """Returns a jitted fn: (H_shard_args..., center_args...) -> row-sharded
    (prob, dist).  singles_fn computes raw singles for local rows vs the
    replicated center."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
    )
    def fn(H_local, center):
        raw = singles_fn(H_local, center)
        return epilogue(raw)

    return jax.jit(fn)


def sharded_mean_update(mesh, axis: str = "data"):
    """Returns a jitted fn computing, per center, the member mean histogram
    and the member closest to it, with members row-sharded:

      (H_local [n_loc, D], mags_local [n_loc], member_mask [C, n_loc])
        -> (closest value [C], closest global row [C])

    Collectives: psum for sums/counts, psum-min trick for global argmin.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(None, axis), P(axis)),
        out_specs=(P(), P()),
    )
    def fn(H_local, mags_local, mask_local, global_rows_local):
        # member mean per center: psum(masked sum) / psum(count)
        sums = jax.lax.psum(mask_local @ H_local, axis)          # [C, D]
        counts = jax.lax.psum(mask_local.sum(axis=1), axis)      # [C]
        top = sums / jnp.maximum(counts, 1.0)[:, None]
        # distance_d of each local member to its center's mean
        # (DivergencePoint.cpp:54-66, with the reference's truncating uint64
        # mag accumulation)
        r = jnp.floor(top + 0.5)                                  # [C, D]
        dist = 2.0 * jnp.minimum(H_local[None, :, :], r[:, None, :]).sum(-1)
        mag = jnp.trunc(H_local[None, :, :] + top[:, None, :]).sum(-1)
        frac = dist / mag
        d = 10000.0 * (1.0 - frac * frac)                         # [C, n_loc]
        d = jnp.where(mask_local > 0, d, jnp.inf)
        local_min = d.min(axis=1)
        local_arg = global_rows_local[d.argmin(axis=1)]
        # global argmin: min over devices, then the owning device's index.
        # Tie-break: smallest global row (the host engine breaks distance
        # ties by first member-list position instead; MeshScorer runs keep
        # re-centering on the host path, so this only affects direct users
        # of this collective).  Empty centers return -1 like the native
        # argmin kernel.
        gmin = jax.lax.pmin(local_min, axis)
        winner = jnp.where(local_min == gmin, local_arg, jnp.int32(2**30))
        garg = jax.lax.pmin(winner, axis)
        empty = counts <= 0
        gmin = jnp.where(empty, jnp.inf, gmin)
        garg = jnp.where(empty, jnp.int32(-1), garg)
        return gmin, garg

    return jax.jit(fn)


def sharded_glm_solve(mesh, axis: str = "data"):
    """Jitted distributed normal-equation solve: X row-sharded, y row-sharded
    -> replicated weights (GLM.cpp:20-23 with psum-reduced moments)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
    )
    def fn(X_local, y_local):
        xtx = jax.lax.psum(X_local.T @ X_local, axis)
        xty = jax.lax.psum(X_local.T @ y_local, axis)
        return jnp.linalg.solve(xtx, xty)

    return jax.jit(fn)


def sharded_histogram_build(mesh, k: int, axis: str = "data"):
    """Jitted sharded k-mer histogram builder: a [n_loc, L] batch of padded
    code sequences (-1 padding) -> [n_loc, 4^k] pseudocounted histograms,
    rows staying device-local (DP over sequences, SURVEY §2.8 P2)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    d = 4**k

    def one_seq(codes):
        L = codes.shape[0]
        n = L - k + 1
        valid = jnp.ones(n, dtype=bool)
        idx = jnp.zeros(n, dtype=jnp.int32)
        for j in range(k):
            c = jax.lax.dynamic_slice(codes, (j,), (n,))
            valid &= c >= 0
            idx = idx * 4 + jnp.maximum(c, 0)
        hist = jnp.zeros(d, dtype=jnp.int32).at[idx].add(valid.astype(jnp.int32))
        return hist + 1

    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
    def fn(codes_local):
        return jax.vmap(one_seq)(codes_local)

    return jax.jit(fn)
