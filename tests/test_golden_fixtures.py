"""Frozen byte-level codec fixtures: any drift breaks loudly.

tests/fixtures/golden_*.ibf / golden.hibf were generated once
(scripts/make_golden_fixtures.py) and committed; golden.json records
their sha256, the parsed metadata, and per-read classify counts from the
production engine at generation time. These tests pin:

* the cereal `.ibf` layout (reference GanonBuild.cpp:251-288 /
  GanonClassify.cpp:949-986) — hand-parsed at fixed hex offsets,
* the raptor `.hibf` layout (GanonClassify.cpp:875-938),
* writer == reader inverse, byte for byte,
* the hash family / seed constants and minimizer semantics — frozen
  per-read counts must reproduce through the full engine.

A failure here means cross-loaded reference databases would silently
produce different counts. Regenerate fixtures only on a deliberate
format change.
"""

import hashlib
import json
import os
import struct

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def meta():
    with open(os.path.join(FIXDIR, "golden.json")) as f:
        return json.load(f)


def _raw(name):
    with open(os.path.join(FIXDIR, name), "rb") as f:
        return f.read()


def _sha(b):
    return hashlib.sha256(b).hexdigest()


@pytest.mark.parametrize("name", ["golden_h1.ibf", "golden_h4.ibf"])
def test_ibf_hex_layout(name, meta):
    """Hand-verified layout at fixed offsets, independent of the codec."""
    raw = _raw(name)
    assert _sha(raw) == meta[name]["file_sha256"]
    cfg = meta[name]["config"]
    # [0:12) version tuple<int,int,int> — written as 2.1.1
    assert struct.unpack("<iii", raw[0:12]) == (2, 1, 1)
    # [12:64) IBFConfig: u64 n_bins, u64 max_hashes_bin, u8 hash_functions,
    # u8 kmer_size, u16 window_size, u64 bin_size_bits, 3 x f64 fp
    # (52 bytes, cereal packs fields back-to-back with no padding)
    fields = struct.unpack("<QQBBHQddd", raw[12:64])
    assert fields[0] == cfg["n_bins"]
    assert fields[1] == cfg["max_hashes_bin"]
    assert fields[2] == cfg["hash_functions"]
    assert fields[3] == cfg["kmer_size"]
    assert fields[4] == cfg["window_size"]
    assert fields[5] == cfg["bin_size_bits"]
    assert fields[6] == pytest.approx(cfg["max_fp"])
    # [64:72) u64 hashes_count vector length
    (n,) = struct.unpack("<Q", raw[64:72])
    assert n == len(meta[name]["hashes_count"])
    # first element: u64 strlen + bytes + u64 count
    (sl,) = struct.unpack("<Q", raw[72:80])
    t0 = raw[80 : 80 + sl].decode()
    (c0,) = struct.unpack("<Q", raw[80 + sl : 88 + sl])
    assert meta[name]["hashes_count"][t0] == c0


@pytest.mark.parametrize("name", ["golden_h1.ibf", "golden_h4.ibf"])
def test_ibf_read_matches_frozen(name, meta):
    from ganon_tpu.index.serialize import read_ibf

    ibf = read_ibf(os.path.join(FIXDIR, name))
    cfg, want = ibf.ibf_config, meta[name]["config"]
    for k, v in want.items():
        got = getattr(cfg, k)
        assert got == pytest.approx(v), (k, got, v)
    assert ibf.hashes_count == meta[name]["hashes_count"]
    assert ibf.bin_map == [tuple(x) for x in meta[name]["bin_map"]]
    assert (
        _sha(np.ascontiguousarray(ibf.bits).tobytes())
        == meta[name]["bits_sha256"]
    )


@pytest.mark.parametrize("name", ["golden_h1.ibf", "golden_h4.ibf"])
def test_ibf_writer_reproduces_bytes(name, meta, tmp_path):
    from ganon_tpu.index.serialize import read_ibf, write_ibf

    ibf = read_ibf(os.path.join(FIXDIR, name))
    out = tmp_path / name
    write_ibf(ibf, str(out))
    assert out.read_bytes() == _raw(name)


def test_hibf_hex_layout(meta):
    """Hand-walked raptor ``.hibf`` layout at explicit byte offsets —
    pins the container independently of serialize.py (the reader/writer
    only round-trip each other otherwise). Layout per
    GanonClassify.cpp:875-938 (cereal: version, window, shape, parts,
    compressed, bin_path, fpr, is_hibf, HIBF{ibfs, next_ibf_id,
    user_bin_filenames, filename_position_to_ibf_bin}); seqan3 IBF
    fields per the reference's load_filter expectations."""
    raw = _raw("golden.hibf")
    assert _sha(raw) == meta["golden.hibf"]["file_sha256"]
    o = 0

    def u64():
        nonlocal o
        (v,) = struct.unpack_from("<Q", raw, o)
        o += 8
        return v

    def u8():
        nonlocal o
        v = raw[o]
        o += 1
        return v

    (version,) = struct.unpack_from("<I", raw, o)
    o += 4
    assert version == 3  # raptor 3.x index version
    window = u64()
    assert window == meta["window_size"]
    # seqan3 shape (ungapped k-mer): k bits, all set -> (k, 2^k - 1)
    k, shape_bits = u64(), u64()
    assert k == meta["kmer_size"]
    assert shape_bits == (1 << k) - 1
    assert u8() == 1  # parts
    assert u8() == 0  # uncompressed
    n_paths = u64()
    paths = []
    for _ in range(n_paths):
        assert u64() == 1  # one file per user bin
        ln = u64()
        paths.append(raw[o:o + ln].decode())
        o += ln
    # raptor mangles names: '.'->'|||', ' '->'---', + '.minimiser'
    # (build_update.py:419-457; undone at load GanonClassify.cpp:920-928)
    unmangled = [
        p.removesuffix(".minimiser").replace("|||", ".").replace("---", " ")
        for p in paths
    ]
    assert sorted(unmangled) == sorted(meta["golden.hibf"]["refs"])
    (fpr,) = struct.unpack_from("<d", raw, o)
    o += 8
    assert 0 < fpr <= 1
    assert u8() == 1  # is_hibf
    n_ibfs = u64()
    assert n_ibfs >= 2  # root + >=1 child
    for _ in range(n_ibfs):
        bins = u64()
        technical_bins = u64()
        bin_size = u64()
        hash_shift = u64()
        bin_words = u64()
        hash_funs = u64()
        assert technical_bins % 64 == 0
        assert 0 < bins <= technical_bins
        # seqan3 invariants: hash_shift = clz64(bin_size),
        # bin_words = technical_bins / 64
        assert hash_shift == 64 - bin_size.bit_length()
        assert bin_words == technical_bins // 64
        assert 1 <= hash_funs <= 5
        nbits = u64()  # sdsl bit_vector: size in BITS, then u64 words
        assert nbits == technical_bins * bin_size
        o += (nbits // 64) * 8
    n_next = u64()
    assert n_next == n_ibfs
    for _ in range(n_next):
        m = u64()
        o += m * 8
    n_files = u64()
    assert n_files == n_paths
    for p in paths:
        ln = u64()
        assert raw[o:o + ln].decode() == p
        o += ln
    n_b2f = u64()
    assert n_b2f == n_ibfs
    for _ in range(n_b2f):
        m = u64()
        o += m * 8
    assert o == len(raw)  # exhaustive: no trailing bytes


def test_hibf_writer_reproduces_bytes(meta, tmp_path):
    from ganon_tpu.index.serialize import read_raptor_hibf, write_raptor_hibf

    raw = _raw("golden.hibf")
    assert _sha(raw) == meta["golden.hibf"]["file_sha256"]
    h = read_raptor_hibf(os.path.join(FIXDIR, "golden.hibf"))
    assert h["kmer_size"] == meta["kmer_size"]
    assert h["window_size"] == meta["window_size"]
    out = tmp_path / "re.hibf"
    # read returns per-IBF (bits, bins, bin_size, hash_funs); the writer
    # takes (bits, bins, hash_funs). filenames: the reader unmangles, so
    # recover the on-disk names from the raw archive's user_bin_filenames
    # via a second parse of bin_path (one file per bin in our writer).
    write_raptor_hibf(
        str(out), window_size=h["window_size"], kmer_size=h["kmer_size"],
        fpr=h["fpr"], filenames=h["raw_filenames"],
        ibfs=[(bits, bins, funs) for bits, bins, _, funs in h["ibfs"]],
        next_ibf_id=h["next_ibf_id"],
        bin_to_filename=h["bin_to_filename"],
    )
    assert out.read_bytes() == raw


@pytest.mark.parametrize(
    "name", ["golden_h1.ibf", "golden_h4.ibf", "golden.hibf"]
)
def test_engine_counts_match_frozen(name, meta, tmp_path):
    """Full production path on the frozen filter reproduces frozen counts
    — pins the hash family, seeds, and minimizer emission."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    m = meta[name]
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as f:
        for rid, s in m["reads"].items():
            f.write(f"@{rid}\n{s}\n+\n{'I' * len(s)}\n")
    out = str(tmp_path / "res")
    run_classify(ClassifyConfig(
        ibf=[os.path.join(FIXDIR, name)], single_reads=[str(fq)],
        output_prefix=out,
        rel_cutoff=[0.001], rel_filter=[1.0], fpr_query=[1.0],
        output_all=True, quiet=True,
    ))
    counts = {}
    with open(out + ".all") as f:
        for line in f:
            rid, t, c = line.rstrip("\n").split("\t")
            counts.setdefault(rid, {})[t] = int(c)
    assert counts == m["counts"]


@pytest.mark.parametrize("cut", [8, 50, 63, 100, 1000, -1])
def test_truncated_ibf_raises_cleanly(cut, tmp_path):
    """A truncated/corrupted archive must raise ValueError, never parse
    silently into a wrong filter."""
    from ganon_tpu.index.serialize import read_ibf

    raw = _raw("golden_h1.ibf")
    bad = tmp_path / "trunc.ibf"
    bad.write_bytes(raw[:cut] if cut > 0 else raw[: len(raw) - 7])
    with pytest.raises(ValueError):
        read_ibf(str(bad))


def test_corrupt_header_raises(tmp_path):
    from ganon_tpu.index.serialize import read_ibf

    raw = bytearray(_raw("golden_h1.ibf"))
    raw[0:4] = (999999).to_bytes(4, "little")  # implausible version
    bad = tmp_path / "corrupt.ibf"
    bad.write_bytes(bytes(raw))
    with pytest.raises(ValueError):
        read_ibf(str(bad))


def test_truncated_hibf_raises_cleanly(tmp_path):
    from ganon_tpu.index.serialize import read_raptor_hibf

    raw = _raw("golden.hibf")
    for cut in (10, 100, len(raw) // 2, len(raw) - 9):
        bad = tmp_path / "trunc.hibf"
        bad.write_bytes(raw[:cut])
        with pytest.raises(ValueError):
            read_raptor_hibf(str(bad))


# ---------------------------------------------------------------------------
# First-principles pinning of the hash family (independent arithmetic).
#
# Everything below is derived with plain Python big-int math from the
# DOCUMENTED formulas — no import from ganon_tpu.ops — so it fails if
# HASH_SEEDS / GOLDEN / fastrange / adjust_seed / canonical-minimizer
# semantics ever change, AND it would have failed had they been wrong
# from day one (hand math, not replay of our own kernels).
# Formulas: ops/ibf_query.py module docstring (seqan3-style family,
# GanonBuild.cpp:694 insert / GanonClassify.cpp:514 query);
# adjust_seed.hpp:33-37; seqan3 minimiser = min(fwd^seed, rc^seed)
# windowed minimum.

_FP_SEEDS = (  # seqan3 IBF seed constants, written out by hand
    13572355802537770549,  # 2^64 / (e/2)
    13043817825332782213,  # 2^64 / sqrt(2)
    10650232656628343401,  # 2^64 / sqrt(5)
    16499269484942379435,  # 2^64 / (sqrt(3)/2)
    4893150838803335377,   # 2^64 / (3/(2*sqrt(e)))
)
_FP_GOLDEN = 0x9E3779B97F4A7C15  # 2^64 / golden ratio
_FP_SEED64 = 0x8F3F73B5CF1C9ADE  # seqan3 default minimiser seed


def _fp_minimizer_set(seq: str, k: int, w: int) -> set:
    """Distinct minimizer values, from first principles (pure ints)."""
    enc = {"A": 0, "C": 1, "G": 2, "T": 3}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    seed = _FP_SEED64 >> (64 - 2 * k)
    canon = []
    for i in range(len(seq) - k + 1):
        km = seq[i : i + k]
        f = 0
        for c in km:
            f = f * 4 + enc[c]
        r = 0
        for c in reversed(km):
            r = r * 4 + enc[comp[c]]
        canon.append(min(f ^ seed, r ^ seed))
    ww = w - k + 1
    return {
        min(canon[i : i + ww]) for i in range(len(canon) - ww + 1)
    }


def _fp_rows(h: int, bin_size: int, n_funs: int) -> set:
    """Bit-matrix rows for one hash, from first principles."""
    shift = 64 - bin_size.bit_length()  # clz64(bin_size)
    rows = set()
    for i in range(n_funs):
        g = (h * _FP_SEEDS[i]) % (1 << 64)
        g = g ^ (g >> shift)
        g = (g * _FP_GOLDEN) % (1 << 64)
        rows.add((g * bin_size) >> 64)  # fastrange = mulhi64
    return rows


@pytest.mark.parametrize(
    "seq,k,w",
    [
        ("ACGTAC", 2, 2),        # w == k: every canonical k-mer emits
        ("ACGTTGCATGCA", 3, 5),  # windowed minimum case
    ],
)
def test_hash_family_first_principles(seq, k, w, tmp_path):
    from ganon_tpu.index.builder import BuildConfig, run_build
    from ganon_tpu.index.ibf import IBF

    fa = tmp_path / "t.fa"
    fa.write_text(f">S\n{seq}\n")
    info = tmp_path / "info.tsv"
    info.write_text(f"{fa}\tT0\n")
    out = str(tmp_path / f"fp_{k}_{w}.ibf")
    run_build(
        BuildConfig(
            input_file=str(info), output_file=out, kmer_size=k,
            window_size=w, max_fp=0.001,
        )
    )
    ibf = IBF.load(out)
    cfg = ibf.ibf_config

    mins = _fp_minimizer_set(seq, k, w)
    assert ibf.hashes_count["T0"] == len(mins)
    expected_rows = set()
    for h in mins:
        expected_rows |= _fp_rows(h, cfg.bin_size_bits, cfg.hash_functions)

    # single target, few hashes -> exactly one technical bin (bin 0);
    # its column must contain exactly the expected rows
    [(bin_idx, tgt)] = ibf.bin_map
    assert (bin_idx, tgt) == (0, "T0")
    word, bit = bin_idx // 32, bin_idx % 32
    col = (ibf.bits[:, word] >> np.uint32(bit)) & np.uint32(1)
    got_rows = set(np.nonzero(col)[0].tolist())
    assert got_rows == expected_rows
