"""approx_max_k vs packed u32 full sort for the wide-table top-K.

The engine only needs ALL >=cutoff entries to appear among the K
returned (order is irrelevant: n_matches is computed exactly and
n_matches > K already falls back). approx_max_k (TPU ApproxTopK custom
call) trades a tiny recall risk for a much cheaper partial reduction —
and a miss is DETECTABLE on device (recovered < min(n_matches, K)), so
the engine can redispatch the exact path.

Usage: python scripts/approx_topk_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__)))

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ganon_tpu.index.device_build import enable_compile_cache

enable_compile_cache()
from wide_layout_probe import trace_ms

B, K = 8192, 128
N_TRACE = 3


@partial(jax.jit, static_argnames=("k",))
def topk_packed(fvals, *, k):
    T = fvals.shape[1]
    idx_c = jnp.uint32(0xFFFF) - jnp.arange(T, dtype=jnp.uint32)
    packed = (fvals.astype(jnp.uint32) << jnp.uint32(16)) | idx_c
    s = jax.lax.sort(packed, dimension=1, is_stable=False)
    top = s[:, -k:][:, ::-1]
    return (
        (top >> 16).astype(jnp.int32),
        (jnp.uint32(0xFFFF) - (top & jnp.uint32(0xFFFF))).astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("k", "rt"))
def topk_approx(fvals, *, k, rt):
    tv, ti = jax.lax.approx_max_k(
        fvals.astype(jnp.float32), k, recall_target=rt,
        aggregate_to_topk=True,
    )
    return tv.astype(jnp.int32), ti.astype(jnp.int32)


def main():
    for T in (1024, 4096, 8192):
        rng = np.random.default_rng(T)
        fv = rng.integers(1, 400, size=(B, T)).astype(np.int32)
        fv[rng.random((B, T)) < 0.98] = 0  # sparse like production
        cutoff = 30
        n_m = (fv >= cutoff).sum(axis=1)

        def recovered(tv):
            return (np.asarray(tv) >= cutoff).sum(axis=1)

        for rt in (0.9, 0.95, 0.99):
            tv, ti = topk_approx(jnp.asarray(fv), k=K, rt=rt)
            rec = recovered(tv)
            want = np.minimum(n_m, K)
            miss_rows = int((rec < want).sum())
            # value-exactness of what IS returned
            tvn, tin = np.asarray(tv), np.asarray(ti)
            ok = (tvn == np.take_along_axis(fv, tin, axis=1)).all()
            print(f"T={T} rt={rt}: missed rows {miss_rows}/{B} "
                  f"(vals exact={ok})")

        def mk(i):
            r = np.random.default_rng(i)
            f = r.integers(1, 400, size=(B, T)).astype(np.int32)
            f[r.random((B, T)) < 0.98] = 0
            return (jnp.asarray(f),)

        inputs = [mk(i) for i in range(N_TRACE + 1)]
        ms0 = trace_ms(lambda f: topk_packed(f, k=K), inputs)
        ms1 = trace_ms(lambda f: topk_approx(f, k=K, rt=0.95), inputs)
        print(f"T={T}: packed sort {ms0:6.2f} ms | approx_max_k "
              f"{ms1:6.2f} ms")


if __name__ == "__main__":
    main()
