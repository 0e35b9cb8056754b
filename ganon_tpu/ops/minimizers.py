"""Winnowed canonical minimizer extraction (seqan3-compatible semantics).

Semantics replicated (behavior documented from the reference call sites,
re-derived and re-implemented here — not translated code):

* dna4 alphabet: A=0, C=1, G=2, T=3; U maps to T; every other character maps
  to A (reference behavior confirmed by
  ``/root/reference/tests/ganon-classify/GanonClassify.test.cpp:813``).
* forward k-mer value: big-endian 2-bit packing, ``v = (v << 2) | rank``.
* reverse-complement k-mer value at position ``i``: the packed value of the
  reverse complement of the same k-mer window (complement rank ``3 - r``,
  reversed order).
* both values are XORed with ``adjust_seed(k)`` **before** comparison
  (XOR does not preserve order, so this matters); the canonical value per
  position is the elementwise minimum
  (reference usage: ``/root/reference/src/ganon-build/GanonBuild.cpp:198-200``,
  ``/root/reference/src/ganon-classify/GanonClassify.cpp:647-650``).
* windowed minimum over ``w - k + 1`` consecutive canonical values with
  seqan3's emission rule. The seqan3 minimiser view emits a value when
  (a) it is the first window, (b) a strictly smaller value enters the
  window, or (c) the current minimiser slides out of the window (rescan
  picks the leftmost minimum and re-emits even if the value is equal).
  This is provably equivalent to: *emit whenever the leftmost-argmin
  position of the window changes* — which is what the vectorized JAX
  implementation computes. ``minimizers_golden`` implements the stateful
  deque algorithm directly; tests assert both agree.

A read contributes the emitted values **with multiplicity** (the classify
bulk count adds one per occurrence); build-side deduplication happens later.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

_SEED64 = 0x8F3F73B5CF1C9ADE
_U64_MAX = 0xFFFFFFFFFFFFFFFF


def adjust_seed(k: int, seed: int = _SEED64) -> int:
    """Shift the 64-bit seed so it only touches the 2k used bits.

    Reference: /root/reference/src/utils/include/utils/adjust_seed.hpp:33-37.
    """
    return seed >> (64 - 2 * k)


# --- host-side sequence encoding -------------------------------------------

# byte -> dna4 rank; default 0 (A), U/u -> T
_ENCODE_LUT = np.zeros(256, dtype=np.uint8)
for _c, _r in ((b"A", 0), (b"C", 1), (b"G", 2), (b"T", 3), (b"U", 3)):
    _ENCODE_LUT[_c[0]] = _r
    _ENCODE_LUT[_c[0] + 32] = _r  # lowercase


def encode_seqs(seqs, max_len: int | None = None):
    """Encode a list of sequences (str/bytes) into a padded rank matrix.

    Returns ``(codes uint8 [B, L], lengths int32 [B])``. Padding rank is 0
    (A) — downstream masking by length makes the pad value irrelevant.
    """
    if max_len is None:
        max_len = max((len(s) for s in seqs), default=0)
    B = len(seqs)
    codes = np.zeros((B, max_len), dtype=np.uint8)
    lengths = np.zeros((B,), dtype=np.int32)
    for i, s in enumerate(seqs):
        if isinstance(s, str):
            s = s.encode()
        b = np.frombuffer(s[:max_len], dtype=np.uint8)
        codes[i, : len(b)] = _ENCODE_LUT[b]
        lengths[i] = len(s)
    return codes, lengths


# --- golden model (exact, slow; mirrors the stateful deque algorithm) ------


def _kmer_values(ranks, k: int, seed: int):
    """Forward/revcomp packed k-mer values XOR seed, as Python ints."""
    n = len(ranks) - k + 1
    fwd, rc = [], []
    for i in range(n):
        f = 0
        r = 0
        for j in range(k):
            f = (f << 2) | int(ranks[i + j])
            r |= (3 - int(ranks[i + j])) << (2 * j)
        fwd.append(f ^ seed)
        rc.append(r ^ seed)
    return fwd, rc


def minimizers_golden(seq, k: int, w: int):
    """Reference implementation with Python ints (used only by tests).

    Returns the list of emitted minimizer values for one sequence.
    """
    if isinstance(seq, (str, bytes)):
        if isinstance(seq, str):
            seq = seq.encode()
        ranks = _ENCODE_LUT[np.frombuffer(seq, dtype=np.uint8)]
    else:
        ranks = np.asarray(seq)
    if len(ranks) < w:
        return []
    seed = adjust_seed(k)
    fwd, rc = _kmer_values(ranks, k, seed)
    canon = [min(f, r) for f, r in zip(fwd, rc)]
    ww = w - k + 1  # values per window
    out = []
    # stateful emission: first window, then slide
    window = canon[:ww]
    pos = min(range(ww), key=lambda t: window[t])  # leftmost argmin
    out.append(window[pos])
    for t in range(1, len(canon) - ww + 1):
        new_val = canon[t + ww - 1]
        if pos < t:  # minimiser slid out -> rescan (leftmost), always emit
            pos = min(range(t, t + ww), key=lambda q: canon[q])
            out.append(canon[pos])
        elif new_val < canon[pos]:  # strictly smaller enters -> emit
            pos = t + ww - 1
            out.append(new_val)
    return out


# --- vectorized JAX implementation ------------------------------------------


@partial(jax.jit, static_argnames=("k", "w", "max_minimizers"))
def minimizers_jax(codes, lengths, *, k: int, w: int, max_minimizers: int):
    """Vectorized minimizer extraction for a padded batch.

    Args:
      codes: uint8/int32 ``[B, L]`` dna4 ranks, padded.
      lengths: int32 ``[B]`` true sequence lengths.
      k, w: k-mer and window sizes (static).
      max_minimizers: static output width M.

    Returns:
      ``(hashes uint64 [B, M], n_hashes int32 [B])`` — emitted minimizer
      values (with multiplicity, padded with 0) and the emission count.
      Sequences shorter than ``w`` yield ``n_hashes == 0``.
    """
    B, L = codes.shape
    if L < w:
        return (
            jnp.zeros((B, max_minimizers), dtype=jnp.uint64),
            jnp.zeros((B,), dtype=jnp.int32),
        )
    c = codes.astype(jnp.uint64)
    canon = _canonical_values(c, lengths, k, L)
    ww = w - k + 1
    nw = L - w + 1  # window positions
    minval, minpos = _window_argmin(canon, ww, nw)

    wpos = jnp.arange(nw, dtype=jnp.int32)[None, :]
    valid_w = wpos + w <= lengths[:, None]
    emit = jnp.concatenate(
        [valid_w[:, :1], valid_w[:, 1:] & (minpos[:, 1:] != minpos[:, :-1])], axis=1
    )

    n_hashes = jnp.sum(emit, axis=1).astype(jnp.int32)
    # stable compaction: emitted positions first, in order
    key = jnp.where(emit, wpos, nw + wpos)
    order = jnp.argsort(key, axis=1)[:, :max_minimizers]
    hashes = jnp.take_along_axis(minval, order, axis=1)
    if hashes.shape[1] < max_minimizers:
        pad = max_minimizers - hashes.shape[1]
        hashes = jnp.pad(hashes, ((0, 0), (0, pad)))
    out_mask = jnp.arange(max_minimizers, dtype=jnp.int32)[None, :] < n_hashes[:, None]
    hashes = jnp.where(out_mask, hashes, jnp.uint64(0))
    return hashes, n_hashes


def _canonical_values(c, lengths, k: int, L: int):
    """Canonical (min of fwd/rc, seed-XORed) k-mer values via doubling.

    Builds packed k-mer values in O(log k) vector ops instead of k:
    ``v_{a+b}[i] = (v_a[i] << 2b) | v_b[i+a]`` (forward) and
    ``r_{a+b}[i] = r_a[i] | (r_b[i+a] << 2a)`` (reverse complement).
    """
    nk = L - k + 1
    # power-of-two span tables, each fwd[s][i] over codes[i:i+s)
    spans = [1]
    fwd_p = {1: c}
    rc_p = {1: jnp.uint64(3) - c}
    s = 1
    while s * 2 <= k:
        n = c.shape[1] - 2 * s + 1
        fwd_p[2 * s] = (fwd_p[s][:, :n] << jnp.uint64(2 * s)) | fwd_p[s][:, s : s + n]
        rc_p[2 * s] = rc_p[s][:, :n] | (rc_p[s][:, s : s + n] << jnp.uint64(2 * s))
        s *= 2
        spans.append(s)
    # compose k from its binary representation (most-significant first)
    fwd = rc = None
    span = 0
    for p in reversed(spans):
        if span + p > k:
            continue
        fp, rp = fwd_p[p], rc_p[p]
        if fwd is None:
            fwd, rc = fp[:, :nk], rp[:, :nk]
        else:
            fwd = (fwd << jnp.uint64(2 * p)) | fp[:, span : span + nk]
            rc = rc | (rp[:, span : span + nk] << jnp.uint64(2 * span))
        span += p
    seed = jnp.uint64(adjust_seed(k))
    canon = jnp.minimum(fwd ^ seed, rc ^ seed)
    kpos = jnp.arange(nk, dtype=jnp.int32)[None, :]
    return jnp.where(kpos + k <= lengths[:, None], canon, jnp.uint64(_U64_MAX))


def _window_argmin(canon, ww: int, nw: int):
    """Leftmost argmin over sliding windows of ``ww`` values (doubling).

    Combines power-of-two spans with leftmost tie-break (take the left
    span on <=), then merges the two overlapping spans covering ``ww``.
    """
    B = canon.shape[0]
    val = canon
    pos = jnp.broadcast_to(
        jnp.arange(canon.shape[1], dtype=jnp.int32), canon.shape
    )
    s = 1
    while s * 2 <= ww:
        n = val.shape[1] - s
        lv, rv = val[:, :n], val[:, s:]
        lp, rp = pos[:, :n], pos[:, s:]
        take_left = lv <= rv
        val = jnp.where(take_left, lv, rv)
        pos = jnp.where(take_left, lp, rp)
        s *= 2
    # val[i] = min over [i, i+s); merge [0, s) with [ww-s, ww)
    lv, rv = val[:, :nw], val[:, ww - s : ww - s + nw]
    lp, rp = pos[:, :nw], pos[:, ww - s : ww - s + nw]
    take_left = lv <= rv
    return jnp.where(take_left, lv, rv), jnp.where(take_left, lp, rp)


@partial(jax.jit, static_argnames=("k", "w"))
def minimizers_masked_jax(codes, lengths, *, k: int, w: int):
    """Minimizers as (window-min values, emission mask) — no compaction.

    Classify-path fast variant of :func:`minimizers_jax`: the bulk-count
    kernel consumes (values, mask) pairs, so the argsort compaction is
    unnecessary. Returns ``(minval uint64 [B, L-w+1], emit bool [B, L-w+1],
    n_hashes int32 [B])`` with identical emission semantics (an emitted
    multiset equal to minimizers_jax's output).
    """
    B, L = codes.shape
    if L < w:
        return (
            jnp.zeros((B, 1), dtype=jnp.uint64),
            jnp.zeros((B, 1), dtype=bool),
            jnp.zeros((B,), dtype=jnp.int32),
        )
    c = codes.astype(jnp.uint64)
    canon = _canonical_values(c, lengths, k, L)
    ww = w - k + 1
    nw = L - w + 1
    minval, minpos = _window_argmin(canon, ww, nw)

    wpos = jnp.arange(nw, dtype=jnp.int32)[None, :]
    valid_w = wpos + w <= lengths[:, None]
    emit = jnp.concatenate(
        [valid_w[:, :1], valid_w[:, 1:] & (minpos[:, 1:] != minpos[:, :-1])], axis=1
    )
    n_hashes = jnp.sum(emit, axis=1).astype(jnp.int32)
    return minval, emit, n_hashes


@partial(jax.jit, static_argnames=("k", "w", "cap"))
def window_mins_unique_jax(codes, lengths, *, k: int, w: int, cap: int):
    """Sorted distinct window minima per row, compacted to ``cap`` slots.

    Build-side fetch reducer: the set of distinct window minima equals
    the target's minimizer set (density ~2/(w-k+2)), so deduplicating
    and compacting on device cuts the device->host transfer ~5-7x —
    the dominant build cost when the device link is slow.

    Two lexicographic ``lax.sort`` passes (u64 split into u32 planes):
    value-sort + first-occurrence mask, then a stable partition moving
    the marked values to the front. No gathers (see compact_hashes).

    Returns ``(vals u64 [B, cap] ascending-unique per row (tail
    undefined), n_unique int32 [B], overflow bool [B])``; on overflow
    the caller must fall back to :func:`window_mins_jax`.
    """
    B, L = codes.shape
    c = codes.astype(jnp.uint64)
    canon = _canonical_values(c, lengths, k, L)
    ww = w - k + 1
    nw = L - w + 1
    val = canon
    s = 1
    while s * 2 <= ww:
        val = jnp.minimum(val[:, : val.shape[1] - s], val[:, s:])
        s *= 2
    minval = jnp.minimum(val[:, :nw], val[:, ww - s : ww - s + nw])
    wpos = jnp.arange(nw, dtype=jnp.int32)[None, :]
    valid = wpos + w <= lengths[:, None]
    n_valid = jnp.sum(valid, axis=1).astype(jnp.int32)
    mv = jnp.where(valid, minval, jnp.uint64(_U64_MAX))
    hi = (mv >> jnp.uint64(32)).astype(jnp.uint32)
    lo = mv.astype(jnp.uint32)
    hi_s, lo_s = jax.lax.sort((hi, lo), dimension=1, num_keys=2)
    first = jnp.concatenate(
        [
            jnp.ones((B, 1), dtype=bool),
            (hi_s[:, 1:] != hi_s[:, :-1]) | (lo_s[:, 1:] != lo_s[:, :-1]),
        ],
        axis=1,
    )
    # positions >= n_valid hold the U64_MAX sentinel block
    uniq = first & (wpos < n_valid[:, None])
    n_unique = jnp.sum(uniq, axis=1).astype(jnp.int32)
    key = jnp.where(uniq, wpos, wpos + nw)
    _, lo_c, hi_c = jax.lax.sort(
        (key, lo_s, hi_s), dimension=1, num_keys=1, is_stable=False
    )
    take = min(cap, nw)
    vals = (hi_c[:, :take].astype(jnp.uint64) << jnp.uint64(32)) | lo_c[
        :, :take
    ].astype(jnp.uint64)
    if take < cap:
        vals = jnp.pad(vals, ((0, 0), (0, cap - take)))
    return vals, n_unique, n_unique > cap


@partial(jax.jit, static_argnames=("k", "w"))
def window_mins_jax(codes, lengths, *, k: int, w: int):
    """Window minima without emission compaction (build-side fast path).

    The *set* of emitted minimizers equals the set of per-window minima
    (emission only collapses repeats), so index construction — which
    deduplicates into a set anyway — can skip the argsort compaction.

    Returns ``(minval uint64 [B, L-w+1], valid bool [B, L-w+1])``.
    """
    B, L = codes.shape
    c = codes.astype(jnp.uint64)
    canon = _canonical_values(c, lengths, k, L)
    ww = w - k + 1
    nw = L - w + 1
    # plain sliding min via doubling (no argmin bookkeeping needed)
    val = canon
    s = 1
    while s * 2 <= ww:
        val = jnp.minimum(val[:, : val.shape[1] - s], val[:, s:])
        s *= 2
    minval = jnp.minimum(val[:, :nw], val[:, ww - s : ww - s + nw])
    wpos = jnp.arange(nw, dtype=jnp.int32)[None, :]
    valid = wpos + w <= lengths[:, None]
    return minval, valid
