"""fpr-query vectorization: min-count threshold vs the binomial-tail oracle.

The engine applies --fpr-query as ``count >= min_count(n_hashes, fpr)``
(thresholds.FprQueryMinCount); the reference evaluates the binomial tail
per match (GanonClassify.cpp:579-613). These must make bitwise-identical
decisions: binom_tail_q stays the oracle here.
"""

import numpy as np
import pytest

from ganon_tpu.classify.thresholds import (
    FprQueryMinCount,
    binom_tail_q,
    fpr_query_min_count,
)


@pytest.mark.parametrize("fq", [1e-5, 1e-2, 0.3, 0.9])
@pytest.mark.parametrize("p", [0.0, 1e-6, 0.01, 0.05, 0.3, 0.9, 1.0])
@pytest.mark.parametrize("n", [1, 7, 64, 241])
def test_min_count_equals_oracle_decision(fq, p, n):
    cmin = fpr_query_min_count(n, p, fq)
    for c in range(n + 1):
        oracle_keep = binom_tail_q(c, n, p) <= fq
        assert oracle_keep == (c >= cmin), (c, n, p, fq, cmin)


def test_min_count_arr_matches_scalar():
    fq = 1e-3
    cache = FprQueryMinCount(fq)
    rng = np.random.default_rng(5)
    ns = rng.integers(1, 300, size=50)
    ps = rng.choice([1e-4, 0.01, 0.05, 0.2, 0.7], size=50)
    got = cache.min_count_arr(ns, ps)
    want = np.array(
        [fpr_query_min_count(int(n), float(p), fq) for n, p in zip(ns, ps)]
    )
    assert np.array_equal(got, want)


def test_min_count_monotone_in_fpr_query():
    # stricter fpr_query (smaller) demands more matching hashes
    n, p = 100, 0.05
    prev = 0
    for fq in (0.9, 0.1, 1e-2, 1e-4, 1e-8):
        c = fpr_query_min_count(n, p, fq)
        assert c >= prev
        prev = c


def test_no_count_passes_returns_sentinel():
    # p=0.999, tiny fq: even count == n barely passes or nothing does
    n = 4
    c = fpr_query_min_count(n, 0.999999, 1e-12)
    assert c == n + 1 or binom_tail_q(c, n, 0.999999) <= 1e-12
