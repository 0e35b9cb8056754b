"""Full 1-D sorts of multi-million-element arrays via Leighton columnsort.

XLA's TPU lowering of a rank-1 ``lax.sort`` has pathological COMPILE
times for long sequences (measured on v5e: 36 s for 13.4M u32x2, 51 s
for 3.4M u32x3 — per shape!), while the same data sorted as the columns
of an ``[r, s]`` matrix with r <= 2^18 compiles in ~1 s and executes at
row-sort speed. Leighton's columnsort (1985) turns 4 column sorts plus
fixed reshape/transpose permutations and a half-column shift into a
full sort, valid when ``r >= 2*(s-1)**2`` and ``s`` divides ``r``.

``sort_flat`` sorts joint lexicographic tuples (like ``lax.sort`` with
``num_keys``) and needs strict lower/upper sentinel tuples for the
shift padding: ``lo_pad`` must compare strictly below and ``hi_pad``
strictly above every real entry (callers usually bias values by +1 to
free the all-zeros tuple).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# column length: long enough to amortize, short enough to compile fast
_R = 1 << 18


def _col_sorted(ops, num_keys):
    return jax.lax.sort(ops, dimension=0, num_keys=num_keys)


def sort_flat(operands, num_keys, lo_pad, hi_pad):
    """Sort flat 1-D ``operands`` jointly (lexicographic by the first
    ``num_keys``). Returns sorted operands of the original length.

    lo_pad/hi_pad: per-operand scalar tuples strictly below/above every
    real entry (used for capacity and shift padding).
    """
    n = operands[0].shape[0]
    if n <= _R:
        return jax.lax.sort(operands, dimension=0, num_keys=num_keys)
    r = _R
    s = -(-n // r)
    # s must divide r and satisfy r >= 2*(s-1)^2; round s up to a power
    # of two (capacity padding fills the rest)
    p = 1
    while p < s:
        p *= 2
    s = p
    if r < 2 * (s - 1) ** 2:
        raise ValueError(f"columnsort capacity exceeded: n={n}")
    cap = r * s
    lo = tuple(jnp.asarray(v, op.dtype) for v, op in zip(lo_pad, operands))
    hi = tuple(jnp.asarray(v, op.dtype) for v, op in zip(hi_pad, operands))
    ops = tuple(
        jnp.concatenate([op, jnp.full((cap - n,), h, op.dtype)])
        for op, h in zip(operands, hi)
    )
    # matrices are [r, s]; "sorted" means column-major order
    ops = tuple(op.reshape(s, r).T for op in ops)  # col-major fill

    # 1. sort columns
    ops = _col_sorted(ops, num_keys)
    # 2. transpose: read col-major, refill row-major
    ops = tuple(op.T.reshape(r, s) for op in ops)
    # 3. sort columns
    ops = _col_sorted(ops, num_keys)
    # 4. untranspose
    ops = tuple(op.reshape(s, r).T for op in ops)
    # 5. sort columns
    ops = _col_sorted(ops, num_keys)
    # 6. shift down by r/2 (col-major): prepend r/2 lo, append r/2 hi
    half = r // 2
    ops = tuple(
        jnp.concatenate(
            [
                jnp.full((half,), l, op.dtype),
                op.T.reshape(-1),
                jnp.full((half,), h, op.dtype),
            ]
        ).reshape(s + 1, r).T
        for op, l, h in zip(ops, lo, hi)
    )
    # 7. sort columns
    ops = _col_sorted(ops, num_keys)
    # 8. unshift, drop capacity padding
    return tuple(op.T.reshape(-1)[half : half + n] for op in ops)
