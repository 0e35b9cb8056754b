"""Minimizer extraction: golden model vs vectorized JAX implementation."""

import numpy as np
import pytest

from ganon_tpu.ops.minimizers import (
    adjust_seed,
    encode_seqs,
    minimizers_golden,
    minimizers_jax,
)


def _rand_seq(rng, n, alphabet="ACGT"):
    return "".join(rng.choice(list(alphabet)) for _ in range(n))


def test_adjust_seed():
    assert adjust_seed(32) == 0x8F3F73B5CF1C9ADE
    assert adjust_seed(19) == 0x8F3F73B5CF1C9ADE >> 26
    assert adjust_seed(4) == 0x8F3F73B5CF1C9ADE >> 56


def test_encode():
    codes, lengths = encode_seqs(["ACGTN", "acgtu"])
    assert lengths.tolist() == [5, 5]
    assert codes[0].tolist() == [0, 1, 2, 3, 0]
    assert codes[1].tolist() == [0, 1, 2, 3, 3]


def test_golden_kw_equal_emits_every_kmer():
    # k == w: every window is one k-mer -> every position emits
    seq = "A" * 20
    out = minimizers_golden(seq, k=10, w=10)
    assert len(out) == 11
    # poly-A forward hash = 0 ^ seed; rc = all-T reversed = complement...
    seed = adjust_seed(10)
    polyA = 0 ^ seed
    polyT_rc = ((4**10 - 1) ^ seed)
    assert all(v == min(polyA, polyT_rc) for v in out)


def test_golden_revcomp_symmetry():
    # a sequence and its reverse complement emit the same minimizer multiset
    import random

    rng = random.Random(7)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for _ in range(20):
        s = _rand_seq(rng, rng.randint(35, 90))
        rc = "".join(comp[c] for c in reversed(s))
        a = sorted(minimizers_golden(s, k=19, w=31))
        b = sorted(minimizers_golden(rc, k=19, w=31))
        assert a == b


@pytest.mark.parametrize(
    "k,w,alphabet",
    [
        (4, 4, "ACGT"),
        (4, 8, "ACGT"),
        (4, 8, "AC"),  # tiny alphabet -> many duplicate values / ties
        (10, 10, "ACGT"),
        (19, 31, "ACGT"),
        (19, 31, "A"),  # homopolymer: constant values, rescan path
        (16, 21, "ACGTN"),  # non-ACGT handling
        (31, 41, "ACGT"),  # hash values > 32 bits, close to 64
    ],
)
def test_jax_matches_golden(k, w, alphabet):
    import random

    rng = random.Random(hash((k, w, alphabet)) & 0xFFFF)
    seqs = [_rand_seq(rng, rng.randint(w, 160)) for _ in range(24)]
    seqs += [_rand_seq(rng, w) for _ in range(4)]  # exactly one window
    seqs += [_rand_seq(rng, w - 1), ""]  # too short -> zero hashes

    codes, lengths = encode_seqs(seqs, max_len=160)
    M = 160 - w + 1
    hashes, n_hashes = minimizers_jax(codes, lengths, k=k, w=w, max_minimizers=M)
    hashes = np.asarray(hashes)
    n_hashes = np.asarray(n_hashes)

    for i, s in enumerate(seqs):
        want = minimizers_golden(s, k=k, w=w)
        got = hashes[i, : n_hashes[i]].tolist()
        assert got == want, f"seq {i} (len {len(s)}, k={k}, w={w})"
        assert (hashes[i, n_hashes[i] :] == 0).all()


def test_duplicate_emission_multiplicity():
    # repeated identical windows re-emit when the minimiser position slides
    # out (k == w degenerate case makes this explicit)
    seq = "ACGT" * 10
    out = minimizers_golden(seq, k=4, w=4)
    assert len(out) == len(seq) - 4 + 1  # every position emits (k == w)
    # k<w on a periodic sequence: emission count matches JAX
    codes, lengths = encode_seqs([seq])
    h, n = minimizers_jax(codes, lengths, k=4, w=8, max_minimizers=64)
    assert np.asarray(n)[0] == len(minimizers_golden(seq, k=4, w=8))


def test_window_mins_unique_matches_full_path():
    import numpy as np
    import jax.numpy as jnp
    from ganon_tpu.ops.minimizers import (
        encode_seqs,
        window_mins_jax,
        window_mins_unique_jax,
    )

    rng = np.random.default_rng(7)
    seqs = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, size=n))
        for n in (500, 123, 64, 31, 30)
    ]
    codes, lengths = encode_seqs(seqs, max_len=512)
    k, w = 19, 31
    mv, valid = window_mins_jax(codes, lengths, k=k, w=w)
    mv, valid = np.asarray(mv), np.asarray(valid)
    vals, n, ovf = window_mins_unique_jax(codes, lengths, k=k, w=w, cap=256)
    vals, n, ovf = np.asarray(vals), np.asarray(n), np.asarray(ovf)
    for i in range(len(seqs)):
        expect = np.unique(mv[i][valid[i]])
        assert not ovf[i]
        assert n[i] == len(expect)
        np.testing.assert_array_equal(vals[i, : n[i]], expect)


def test_window_mins_unique_overflow_flag():
    import numpy as np
    from ganon_tpu.ops.minimizers import encode_seqs, window_mins_unique_jax

    rng = np.random.default_rng(8)
    seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=1024))
    codes, lengths = encode_seqs([seq])
    vals, n, ovf = window_mins_unique_jax(codes, lengths, k=19, w=31, cap=16)
    assert bool(np.asarray(ovf)[0])
