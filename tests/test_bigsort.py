"""Columnsort correctness vs numpy on random data."""

import numpy as np
import jax.numpy as jnp
import pytest

from ganon_tpu.ops.bigsort import sort_flat, _R

U32MAX = 0xFFFFFFFF


@pytest.mark.parametrize("n", [1000, _R - 1, _R + 1, 3 * _R + 12345])
def test_two_key_sort(n):
    rng = np.random.default_rng(n)
    v = rng.integers(1, 2**63, size=n, dtype=np.uint64)
    hi = (v >> 32).astype(np.uint32)
    lo = v.astype(np.uint32)
    shi, slo = sort_flat(
        (jnp.asarray(hi), jnp.asarray(lo)), 2,
        lo_pad=(0, 0), hi_pad=(U32MAX, U32MAX),
    )
    got = (np.asarray(shi).astype(np.uint64) << 32) | np.asarray(slo)
    assert np.array_equal(got, np.sort(v))


def test_three_key_sort_with_payload():
    rng = np.random.default_rng(1)
    n = 2 * _R + 777
    k = rng.integers(0, 64, size=n, dtype=np.int32)
    a = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    b = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    sk, sa, sb = sort_flat(
        (jnp.asarray(k), jnp.asarray(a), jnp.asarray(b)), 3,
        lo_pad=(-1, 0, 0), hi_pad=(np.iinfo(np.int32).max, U32MAX, U32MAX),
    )
    order = np.lexsort((b, a, k))
    assert np.array_equal(np.asarray(sk), k[order])
    assert np.array_equal(np.asarray(sa), a[order])
    assert np.array_equal(np.asarray(sb), b[order])


def test_duplicates_and_extremes():
    rng = np.random.default_rng(2)
    n = _R + 3
    v = rng.integers(0, 4, size=n, dtype=np.uint32)  # heavy duplicates
    v[:5] = 0
    (s,) = sort_flat((jnp.asarray(v + 1),), 1, lo_pad=(0,),
                     hi_pad=(U32MAX,))
    assert np.array_equal(np.asarray(s) - 1, np.sort(v))
