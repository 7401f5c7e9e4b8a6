"""Deterministic RNG chain matching the reference's generators.

- LCG: the MMIX linear congruential generator, bit-exact (LCG.h:42-47).
- MinStd0: minstd_rand0 (x = 16807x mod 2^31-1), used for SingMute's command
  shuffle (SingMute.cpp:101) and the insertions shuffle seeded with 0
  (MultiMute.cpp:338-340, libstdc++ default_random_engine).
- MT: mt19937-backed Random equivalent (Random.h:12-60); distribution mapping
  is implementation-defined in C++, so parity here is statistical, not
  bitwise (SURVEY §4.3: exact parity is anchored on --recover).
"""
from __future__ import annotations

import random as _pyrandom

U64 = (1 << 64) - 1
U32 = (1 << 32) - 1


class LCG:
    __slots__ = ("seed",)

    def __init__(self, seed: int):
        self.seed = seed & U64

    def random(self) -> int:
        self.seed = (self.seed * 6364136223846793005 + 1442695040888963407) & U64
        return self.seed

    def rand_mod(self, max_val: int) -> int:
        if max_val == 0:
            return 0
        return self.random() % max_val

    def next_rand_seed(self) -> int:
        return self.random()

    def rand_between(self, id_: float, rng: float, low: float, high: float) -> float:
        res = self.random() / U64
        mn = max(id_ - rng, low)
        mx = min(id_ + rng, high)
        return mn + (mx - mn) * res


class MinStd0:
    """linear_congruential_engine<uint, 16807, 0, 2147483647> (minstd_rand0)."""

    __slots__ = ("x",)
    M = 2147483647

    def __init__(self, seed: int):
        s = seed % self.M
        self.x = 1 if s == 0 else s

    def __call__(self) -> int:
        self.x = (self.x * 16807) % self.M
        return self.x


def shuffle_libstdcxx(seq: list, gen) -> None:
    """Fisher-Yates in libstdc++ std::shuffle order: for i in [1, n),
    swap(seq[i], seq[uniform(0, i)])."""
    for i in range(1, len(seq)):
        j = gen() % (i + 1)
        seq[i], seq[j] = seq[j], seq[i]


class MTRandom:
    """mt19937-backed equivalent of the reference's Random wrapper."""

    def __init__(self, seed: int = 0xAA):
        self._r = _pyrandom.Random(seed)

    def rand_mod(self, max_val: int) -> int:
        if max_val == 0:
            return 0
        return self._r.randrange(max_val)

    def next_rand_seed(self) -> int:
        # randMod<uint32>(uint32_max) -> [0, 2^32-2]
        return self._r.randrange(U32)

    def random(self) -> float:
        return self._r.random()

    def shuffle(self, seq: list) -> None:
        self._r.shuffle(seq)
