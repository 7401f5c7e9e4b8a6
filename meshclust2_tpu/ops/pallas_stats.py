"""Pallas TPU kernel: fused pairwise sufficient statistics.

The classifier's per-pair work reduces to a handful of reductions over the
two count rows (SURVEY §7 "features/": one pass over the bins computing
shared sums).  This kernel computes, for a [B, D] block of candidate
histograms against one center row, ALL integer sufficient statistics in a
single read of the block from HBM:

    stat 0: sum_i min(h_i, c_i)          (intersection/kulczynski2/manhattan)
    stat 1: sum_i h_i * c_i              (dot: simratio/normalized_vectors/
                                          pearson/d2z/euclidean/...)
    stat 2: sum_i |prefix_i(h - c)|      (EMD)

Everything else the default feature presets need derives from these plus
per-point precomputed moments (self-dots, magnitudes, stddevs) — see
native/score.cpp for the same decomposition on host.

Counts are int32 (values <= histogram dtype max), so every reduction is
exact integer arithmetic on the VPU; one grid step streams a [TILE_B, D]
tile through VMEM.  Runs in interpreter mode on CPU for tests.
"""
from __future__ import annotations

import functools

import numpy as np

N_STATS = 3


@functools.lru_cache(maxsize=16)
def _build(tile_b: int, d: int, interpret: bool, in_dtype: str = "int32"):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    EMD_BLK = 128 if d % 128 == 0 and d >= 128 else d

    def kernel(h_ref, c_ref, out_ref):
        # narrow inputs (uint8/uint16 histograms) stream proportionally less
        # HBM; widen to int32 in VMEM for the exact integer reductions
        h = h_ref[:].astype(jnp.int32)      # [TILE_B, D]
        c = c_ref[:].astype(jnp.int32)      # [1, D]
        summin = jnp.minimum(h, c).sum(axis=1)
        dot = (h * c).sum(axis=1)
        # EMD prefix scan on the MXU (cumsum has no Pallas TPU lowering):
        # prefix_j = sum_{i<=j} diff_i.  Done blockwise — a [BLK, BLK]
        # triangular matmul per block plus a scalar carry — which is D/BLK
        # times fewer FLOPs than the single [D, D] triangular matmul.
        # float32 is exact throughout: |prefix| <= pseudo-magnitude < 2^24.
        diff = (h - c).astype(jnp.float32)
        tri = (
            jax.lax.broadcasted_iota(jnp.int32, (EMD_BLK, EMD_BLK), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (EMD_BLK, EMD_BLK), 1)
        ).astype(jnp.float32)
        # per-block |prefix| sums are cast to int32 BEFORE accumulating:
        # each prefix is an integer-valued float32 < 2^24 (exact), a block
        # sum is < 128 * 2^24 < 2^31, and the running int32 total is bounded
        # by d * maxmag < 2^31 (the fused_ok envelope) — so the EMD stat is
        # integer-exact, unlike a float32 running sum which rounds past 2^24
        emd = jnp.zeros((h.shape[0],), jnp.int32)
        carry = jnp.zeros((h.shape[0], 1), jnp.float32)
        for blk in range(d // EMD_BLK):
            dblk = diff[:, blk * EMD_BLK : (blk + 1) * EMD_BLK]
            pref = jax.lax.dot_general(
                dblk, tri,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + carry
            emd = emd + jnp.abs(pref).astype(jnp.int32).sum(axis=1)
            carry = pref[:, -1:]
        out_ref[:] = jnp.stack([summin, dot, emd], axis=1)

    try:
        from jax.experimental.pallas import tpu as pltpu

        vmem = pltpu.VMEM
    except Exception:  # pragma: no cover - cpu-only builds
        vmem = None

    def specs():
        if vmem is None or interpret:
            return dict(
                in_specs=[
                    pl.BlockSpec((tile_b, d), lambda i: (i, 0)),
                    pl.BlockSpec((1, d), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((tile_b, N_STATS), lambda i: (i, 0)),
            )
        return dict(
            in_specs=[
                pl.BlockSpec((tile_b, d), lambda i: (i, 0), memory_space=vmem),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=vmem),
            ],
            out_specs=pl.BlockSpec(
                (tile_b, N_STATS), lambda i: (i, 0), memory_space=vmem
            ),
        )

    def call(h, c):
        b = h.shape[0]
        grid = (b // tile_b,)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((b, N_STATS), jnp.int32),
            grid=grid,
            interpret=interpret,
            **specs(),
        )(h, c.reshape(1, d))

    return jax.jit(call)


def center_block_stats(h_block: np.ndarray, center: np.ndarray,
                       tile_b: int | None = None,
                       interpret: bool | None = None):
    """[B, D] int candidate block vs [D] center -> [B, 3] int32 stats.

    B is padded to a multiple of tile_b internally.  interpret=None
    auto-selects interpreter mode off-TPU.  tile_b=None sizes the tile so
    the widened int32 block stays within a ~8 MB VMEM budget (1024 rows at
    k<=5, shrinking for larger histogram dims so k=7/8 still compiles).
    """
    import jax
    import jax.numpy as jnp

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, d = h_block.shape
    if tile_b is None:
        # the kernel keeps ~3 live copies of the tile (narrow input, int32
        # widened, f32 diff/prefix) ≈ 9 bytes/element; budget ~10 MB of the
        # 16 MB scoped VMEM
        tile_b = max(8, min(1024, ((10 << 20) // (9 * d)) // 8 * 8))
    pad = (-b) % tile_b
    # uint8 histograms stream 4x less HBM through the kernel; anything wider
    # goes through int32 (the exactness envelope of the int32 reductions)
    dt = jnp.uint8 if np.dtype(h_block.dtype) == np.uint8 else jnp.int32
    h = jnp.asarray(np.ascontiguousarray(h_block), dtype=dt)
    if pad:
        h = jnp.concatenate([h, jnp.zeros((pad, d), dt)], axis=0)
    c = jnp.asarray(center, dtype=dt)
    fn = _build(tile_b, d, bool(interpret), np.dtype(h.dtype).name)
    out = fn(h, c)
    return np.asarray(out)[:b]


def derive_singles(stats: np.ndarray, mags_a, mags_b, self_a, self_b,
                   std_a, std_b, len_a, len_b, d: int, flags_list):
    """Derive raw single-feature values from the kernel's stats plus
    per-point moments (same identities as native/score.cpp's fused path)."""
    from ..features import flags as F

    summin = stats[:, 0].astype(np.float64)
    dot = stats[:, 1].astype(np.float64)
    emd = stats[:, 2].astype(np.float64)
    ap = mags_a / d
    aq = mags_b / d
    norm2 = self_a + self_b - 2 * dot
    out = []
    for flag in flags_list:
        if flag == F.FEAT_MANHATTAN:
            out.append(mags_a + mags_b - 2 * summin)
        elif flag == F.FEAT_EUCLIDEAN:
            out.append(np.sqrt(norm2))
        elif flag == F.FEAT_INTERSECTION:
            out.append(2 * summin / (mags_a + mags_b))
        elif flag == F.FEAT_KULCZYNSKI2:
            out.append(d * (ap + aq) / (2 * ap * aq) * summin)
        elif flag == F.FEAT_SIMRATIO:
            out.append(dot / (dot + np.sqrt(norm2)))
        elif flag == F.FEAT_NORMALIZED_VECTORS:
            out.append(dot / np.sqrt(self_a * self_b))
        elif flag == F.FEAT_PEARSON_COEFF:
            cov = dot - d * ap * aq
            out.append(cov / np.sqrt((self_a - d * ap**2) * (self_b - d * aq**2)))
        elif flag == F.FEAT_D2z:
            out.append((dot - d * ap * aq) / (std_a * std_b))
        elif flag == F.FEAT_EUCLIDEAN_Z:
            na = (self_a - d * ap**2) / std_a**2
            nb = (self_b - d * aq**2) / std_b**2
            dz = (dot - d * ap * aq) / (std_a * std_b)
            out.append(np.sqrt(na + nb - 2 * dz))
        elif flag == F.FEAT_EMD:
            out.append(emd)
        elif flag == F.FEAT_LENGTHD:
            out.append(np.abs(len_a - len_b))
        else:
            raise ValueError(f"flag {flag} not derivable from fused stats")
    return np.stack(out, axis=1)
