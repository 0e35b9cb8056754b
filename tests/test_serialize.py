"""Reference cereal .ibf codec: round-trip + cross-format classify parity.

The byte layout is documented at GanonBuild.cpp:251-288 /
GanonClassify.cpp:949-986; these tests pin our reader/writer to it.
"""

import struct

import numpy as np
import pytest

from ganon_tpu.index import serialize
from ganon_tpu.index.ibf import IBF, build_ibf


@pytest.fixture(scope="module")
def small_ibf():
    rng = np.random.default_rng(3)
    th = {
        f"T{i}": np.unique(rng.integers(0, 2**62, size=200 + 37 * i, dtype=np.uint64))
        for i in range(5)
    }
    return th, build_ibf(th, kmer_size=19, window_size=31, max_fp=0.05)


def test_roundtrip_identical(tmp_path, small_ibf):
    _, ibf = small_ibf
    p = str(tmp_path / "ref.ibf")
    serialize.write_ibf(ibf, p)
    back = serialize.read_ibf(p)
    assert np.array_equal(back.bits, ibf.bits)
    assert back.hashes_count == ibf.hashes_count
    assert back.bin_map == ibf.bin_map
    c0, c1 = ibf.ibf_config, back.ibf_config
    for f in ("n_bins", "max_hashes_bin", "hash_functions", "kmer_size",
              "window_size", "bin_size_bits"):
        assert getattr(c0, f) == getattr(c1, f), f
    for f in ("max_fp", "true_max_fp", "true_avg_fp"):
        assert getattr(c0, f) == pytest.approx(getattr(c1, f)), f


def test_membership_survives_roundtrip(tmp_path, small_ibf):
    from ganon_tpu.ops.ibf_query import ibf_row_indices_np

    th, ibf = small_ibf
    p = str(tmp_path / "ref.ibf")
    serialize.write_ibf(ibf, p)
    back = IBF.load(p)  # auto-detected as cereal
    cfg = back.ibf_config
    tb = back.target_bins()
    for t, hashes in th.items():
        rows = ibf_row_indices_np(
            hashes, bin_size=cfg.bin_size_bits, hash_functions=cfg.hash_functions
        )
        hit_any = np.zeros(len(hashes), dtype=bool)
        for b in tb[t]:
            w, bit = b >> 5, b & 31
            bit_ok = (back.bits[rows[:, :], w] >> np.uint32(bit)) & 1
            hit_any |= bit_ok.all(axis=1).astype(bool)
        assert hit_any.all(), f"lost minimizers of {t} through cereal round-trip"


def test_exact_byte_layout(tmp_path):
    """Pin the head of the archive byte-for-byte (version+config+vectors)."""
    rng = np.random.default_rng(0)
    th = {"AB": np.unique(rng.integers(0, 2**62, size=64, dtype=np.uint64))}
    ibf = build_ibf(th, kmer_size=4, window_size=6, max_fp=0.1)
    p = str(tmp_path / "x.ibf")
    serialize.write_ibf(ibf, p)
    raw = open(p, "rb").read()
    assert raw[:12] == struct.pack("<iii", *serialize.VERSION)
    cfg = ibf.ibf_config
    off = 12
    n_bins, max_hashes_bin = struct.unpack_from("<QQ", raw, off)
    assert (n_bins, max_hashes_bin) == (cfg.n_bins, cfg.max_hashes_bin)
    hf, k = raw[off + 16], raw[off + 17]
    (w,) = struct.unpack_from("<H", raw, off + 18)
    assert (hf, k, w) == (cfg.hash_functions, 4, 6)
    off += struct.calcsize("<QQBBHQddd")
    (n_targets,) = struct.unpack_from("<Q", raw, off)
    assert n_targets == 1
    (slen,) = struct.unpack_from("<Q", raw, off + 8)
    assert raw[off + 16 : off + 16 + slen] == b"AB"
    # tail: 6 u64 header + m_size u64 + width byte + words
    tb = ibf.technical_bins
    n_words = tb * cfg.bin_size_bits // 64
    assert raw[-(n_words * 8) :] == np.ascontiguousarray(ibf.bits).view("<u8").tobytes()
    assert raw[-(n_words * 8) - 1] == 1  # sdsl width byte


def test_sniffers(tmp_path, small_ibf):
    from ganon_tpu.index.ibf import is_ganon_tpu_ibf

    _, ibf = small_ibf
    pc = str(tmp_path / "c.ibf")
    pn = str(tmp_path / "n.ibf")
    serialize.write_ibf(ibf, pc)
    ibf.save(pn)
    assert serialize.is_cereal_ibf(pc) and not serialize.is_cereal_ibf(pn)
    assert is_ganon_tpu_ibf(pn) and not is_ganon_tpu_ibf(pc)
    # truncated/garbage files must not crash the sniffer
    pg = str(tmp_path / "g.ibf")
    open(pg, "wb").write(b"\x00" * 7)
    assert not serialize.is_cereal_ibf(pg)


def test_classify_parity_across_formats(tmp_path, small_ibf):
    """Same device counts whether the filter came from npz or cereal bytes."""
    from ganon_tpu.classify.device import load_device_filter

    _, ibf = small_ibf
    pc = str(tmp_path / "c.ibf")
    pn = str(tmp_path / "n.ibf")
    serialize.write_ibf(ibf, pc)
    ibf.save(pn)
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    hashes = jnp.asarray(rng.integers(0, 2**62, size=(4, 50), dtype=np.uint64))
    mask = jnp.ones((4, 50), dtype=bool)
    n_hashes = jnp.full((4,), 50, dtype=jnp.int32)
    da = load_device_filter(pn)
    db = load_device_filter(pc)
    ca = np.asarray(da.counts(hashes, mask, n_hashes))
    cb = np.asarray(db.counts(hashes, mask, n_hashes))
    assert np.array_equal(ca, cb)


def test_corrupt_archive_errors(tmp_path, small_ibf):
    _, ibf = small_ibf
    p = str(tmp_path / "c.ibf")
    serialize.write_ibf(ibf, p)
    raw = bytearray(open(p, "rb").read())
    bad = str(tmp_path / "bad.ibf")
    open(bad, "wb").write(bytes(raw[: len(raw) // 2]))
    with pytest.raises(ValueError):
        serialize.read_ibf(bad)
