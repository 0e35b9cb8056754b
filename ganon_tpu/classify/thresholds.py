"""Match thresholding math (host side, float64).

* ``threshold_rel``: ceil(n * p) — GanonClassify.cpp:492-495.
* ``binom_tail_q``: q = 1 - binomial_cdf(count; n, p), the probability of
  seeing more than ``count`` false-positive hash hits; a match is discarded
  when q > fpr_query — GanonClassify.cpp:588-601. Numerically sensitive:
  computed on host in float64 via lgamma, mirroring the reference's
  sequential subtraction from 1.
"""

from __future__ import annotations

import math


def threshold_rel(n_hashes: int, p: float) -> int:
    return int(math.ceil(n_hashes * p))


def binom_tail_q(count: int, n_hashes: int, p: float) -> float:
    if p <= 0.0:
        return 0.0
    if p >= 1.0:
        return 1.0 if count < n_hashes else 0.0
    q = 1.0
    lp = math.log(p)
    l1p = math.log(1.0 - p)
    lgn = math.lgamma(n_hashes + 1)
    for i in range(count + 1):
        q -= math.exp(
            lgn
            - math.lgamma(n_hashes - i + 1)
            - math.lgamma(i + 1)
            + i * lp
            + (n_hashes - i) * l1p
        )
    return q


class BinomTailCache:
    """Memoized binom_tail_q (reads in a batch repeat (count, n, p))."""

    def __init__(self):
        self._cache: dict[tuple[int, int, float], float] = {}

    def q(self, count: int, n_hashes: int, p: float) -> float:
        key = (count, n_hashes, p)
        v = self._cache.get(key)
        if v is None:
            v = binom_tail_q(count, n_hashes, p)
            self._cache[key] = v
        return v
