"""Raptor-format .hibf: codec round-trip + flattened device query.

The reference builds .hibf through raptor and queries it by per-read
recursive descent (GanonClassify.cpp:543-577, hibf.hpp:417-532); we load
the same file format and query it as a flattened forest (see
index.hibf.RaptorHIBF). These tests build a 2-level hierarchy by hand:
root IBF with one merged bin per child (union of the child's hashes) +
two child IBFs holding the user bins.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ganon_tpu.index.ibf import build_ibf
from ganon_tpu.index.serialize import (
    is_raptor_hibf,
    read_raptor_hibf,
    write_raptor_hibf,
)
from ganon_tpu.index.hibf import RaptorHIBF
from ganon_tpu.classify.device import (
    DeviceFilter,
    DeviceRaptorHIBF,
    load_device_filter,
)


def _hashes(rng, n):
    return np.unique(rng.integers(0, 2**62, size=n, dtype=np.uint64))


@pytest.fixture(scope="module")
def hierarchy(tmp_path_factory):
    rng = np.random.default_rng(5)
    groups = {
        0: {"GCF_000000001|||1.minimiser": _hashes(rng, 400),
            "s__Some---species.minimiser": _hashes(rng, 300)},
        1: {"562.minimiser": _hashes(rng, 500)},
    }
    # child IBFs (user bins), root IBF (merged union bins)
    child_ibfs = {g: build_ibf(h, kmer_size=19, window_size=31, max_fp=0.05)
                  for g, h in groups.items()}
    root = build_ibf(
        {f"merged{g}": np.unique(np.concatenate(list(h.values())))
         for g, h in groups.items()},
        kmer_size=19, window_size=31, max_fp=0.05,
    )

    filenames = [f for g in groups.values() for f in g]
    fidx = {f: i for i, f in enumerate(filenames)}

    ibfs = [(root.bits, root.ibf_config.n_bins,
             root.ibf_config.hash_functions)]
    next_ibf_id = [np.zeros(root.bits.shape[1] * 32, dtype=np.int64)]
    bin_to_filename = [np.full(root.bits.shape[1] * 32, -1, dtype=np.int64)]
    root_bins = {t: [b for b, tt in root.bin_map if tt == t]
                 for t in root.targets()}
    for gi, g in enumerate(groups):
        child = child_ibfs[g]
        tb = child.bits.shape[1] * 32
        ibfs.append((child.bits, child.ibf_config.n_bins,
                     child.ibf_config.hash_functions))
        nid = np.full(tb, gi + 1, dtype=np.int64)
        b2f = np.full(tb, -1, dtype=np.int64)
        for b, t in child.bin_map:
            b2f[b] = fidx[t]
        next_ibf_id.append(nid)
        bin_to_filename.append(b2f)
        for b in root_bins[f"merged{g}"]:
            next_ibf_id[0][b] = gi + 1

    path = str(tmp_path_factory.mktemp("raptor") / "db.hibf")
    write_raptor_hibf(
        path, window_size=31, kmer_size=19, fpr=0.05,
        filenames=filenames, ibfs=ibfs, next_ibf_id=next_ibf_id,
        bin_to_filename=bin_to_filename,
    )
    return path, groups, child_ibfs, filenames


def test_roundtrip_header(hierarchy):
    path, groups, child_ibfs, filenames = hierarchy
    assert is_raptor_hibf(path)
    parsed = read_raptor_hibf(path)
    assert parsed["window_size"] == 31
    assert parsed["kmer_size"] == 19
    assert parsed["fpr"] == 0.05
    # name unmangling: .minimiser stripped, ||| -> ., --- -> space
    assert parsed["targets"] == [
        "GCF_000000001.1", "s__Some species", "562"]
    assert len(parsed["ibfs"]) == 3
    got_bits = parsed["ibfs"][1][0]
    assert (got_bits == child_ibfs[0].bits).all()


def test_flattened_counts_match_per_child_query(hierarchy):
    path, groups, child_ibfs, filenames = hierarchy
    dev = load_device_filter(path)
    assert isinstance(dev, DeviceRaptorHIBF)

    rng = np.random.default_rng(9)
    # queries: some true hashes from each user bin + random noise
    all_h = {t: h for g in groups.values() for t, h in g.items()}
    B, M = 4, 50
    hashes = np.zeros((B, M), dtype=np.uint64)
    for b, (t, h) in enumerate(list(all_h.items()) + [("noise", None)]):
        hashes[b] = (rng.integers(0, 2**62, M, dtype=np.uint64)
                     if h is None else rng.choice(h, M))
    mask = np.ones((B, M), dtype=bool)
    nh = np.full(B, M, dtype=np.int32)
    got = np.asarray(dev.counts(
        jnp.asarray(hashes), jnp.asarray(mask), jnp.asarray(nh)))

    # expected: per-child DeviceFilter counts in global target order
    exp = np.zeros((B, 3), dtype=np.int32)
    col = {t: i for i, t in enumerate(dev.targets)}
    unmangle = {
        "GCF_000000001|||1.minimiser": "GCF_000000001.1",
        "s__Some---species.minimiser": "s__Some species",
        "562.minimiser": "562",
    }
    for g, child in child_ibfs.items():
        dchild = DeviceFilter(child)
        c = np.asarray(dchild.counts(
            jnp.asarray(hashes), jnp.asarray(mask), jnp.asarray(nh)))
        for j, t in enumerate(dchild.targets):
            exp[:, col[unmangle[t]]] = c[:, j]
    assert (got == exp).all()
    # reads built from a user bin's hashes count fully for that bin
    for b, t in enumerate(["GCF_000000001.1", "s__Some species", "562"]):
        assert got[b, col[t]] == M


def test_engine_fast_path_matches_full_on_raptor(hierarchy, tmp_path):
    """Engine packed raptor dispatch == the full-matrix path on a
    synthetic read set (hashes can't drive the engine; use reads that
    share minimizers with the user bins via a rebuilt sequence db)."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from ganon_tpu.ops.minimizers import window_mins_jax

    path, groups, child_ibfs, filenames = hierarchy

    # random reads: classification is mostly noise/fp-driven, but both
    # paths must agree bit-for-bit regardless
    rng = np.random.default_rng(33)
    reads = tmp_path / "r.fq"
    with open(reads, "w") as f:
        for i in range(200):
            seq = "".join("ACGT"[c] for c in rng.integers(0, 4, size=150))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 150}\n")

    outs = {}
    for tag, fast in (("fast", True), ("full", False)):
        prefix = str(tmp_path / tag)
        cfg = ClassifyConfig(
            ibf=[path], single_reads=[str(reads)], output_prefix=prefix,
            output_all=True, output_unclassified=True, rel_cutoff=[0.1],
            device_thresholding=fast,
        )
        run_classify(cfg)
        outs[tag] = {
            ext: sorted(open(prefix + ext).read().splitlines())
            for ext in (".rep", ".all", ".unc")
        }
    assert outs["fast"] == outs["full"]


def test_forest_export_classify_parity(tmp_path):
    """build -> export_raptor_hibf -> classify equals classifying the
    npz forest directly (VERDICT: build pipeline raptor export wiring;
    reference consumer GanonClassify.cpp:875-938)."""
    import random

    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from ganon_tpu.index.builder import sequence_hashes
    from ganon_tpu.index.hibf import build_hibf, export_raptor_hibf

    rng = random.Random(21)
    # skewed sizes so the forest splits into >1 class; names exercise
    # the raptor mangling round trip
    refs = {
        "GCF_1.2": "".join(rng.choice("ACGT") for _ in range(300)),
        "s name": "".join(rng.choice("ACGT") for _ in range(900)),
        "t3": "".join(rng.choice("ACGT") for _ in range(8000)),
    }
    th = {t: np.unique(sequence_hashes(s, 19, 31)) for t, s in refs.items()}
    forest = build_hibf(th, kmer_size=19, window_size=31, max_fp=0.05,
                        num_classes=3)
    assert len(forest.subs) > 1
    npz = str(tmp_path / "db.hibf")
    forest.save(npz)
    raptor = str(tmp_path / "db_raptor.hibf")
    export_raptor_hibf(forest, th, raptor)
    assert is_raptor_hibf(raptor)
    parsed = read_raptor_hibf(raptor)
    assert sorted(parsed["targets"]) == sorted(refs)

    reads = tmp_path / "r.fq"
    with open(reads, "w") as f:
        for i, (t, s) in enumerate(sorted(refs.items())):
            f.write(f"@r{i}\n{s[5:155]}\n+\n{'I' * 150}\n")
        f.write(f"@junk\n{''.join(rng.choice('ACGT') for _ in range(150))}\n"
                f"+\n{'I' * 150}\n")

    outs = {}
    for tag, db in (("forest", npz), ("raptor", raptor)):
        prefix = str(tmp_path / tag)
        run_classify(ClassifyConfig(
            ibf=[db], single_reads=[str(reads)], output_prefix=prefix,
            output_all=True, output_unclassified=True, rel_cutoff=[0.1],
        ))
        outs[tag] = {
            ext: sorted(open(prefix + ext).read().splitlines())
            for ext in (".all", ".unc")
        }
    assert outs["forest"] == outs["raptor"]


def test_hashes_count_estimated_from_occupancy(hierarchy):
    # the raptor format stores no per-target hash counts; RaptorHIBF
    # estimates them by inverting the Bloom fill per technical bin
    # (index.hibf.RaptorHIBF.hashes_count) instead of reporting zeros
    path, groups, child_ibfs, filenames = hierarchy
    rh = RaptorHIBF.load(path)
    truth = {}
    for g in groups.values():
        for fname, h in g.items():
            truth[fname] = len(h)
    # targets are unmangled; rebuild the same mapping order
    est = rh.hashes_count
    assert set(est) == set(rh.targets())
    by_pos = list(est.values())
    true_by_pos = [truth[f] for f in filenames]
    for got, want in zip(by_pos, true_by_pos):
        assert got > 0
        assert abs(got - want) / want < 0.1, (got, want)
    # cached: second access returns the same object
    assert rh.hashes_count is est


def test_forest_raw_roundtrip_and_classify(tmp_path):
    """tpu-raw forest container: bit-identity, memmap backing and
    classify parity vs the npz container."""
    import numpy as np

    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from ganon_tpu.index.builder import sequence_hashes
    from ganon_tpu.index.hibf import HIBF, build_hibf

    rng = np.random.default_rng(19)
    bases = "ACGT"
    refs = {
        f"T{i}": "".join(
            bases[int(b)]
            for b in rng.integers(0, 4, size=400 * (i + 1))
        )
        for i in range(5)
    }
    k, w = 10, 12
    th = {t: np.unique(sequence_hashes(s, k, w)) for t, s in refs.items()}
    hibf = build_hibf(th, kmer_size=k, window_size=w, max_fp=0.05,
                      num_classes=3)
    assert len(hibf.subs) >= 2
    npz = str(tmp_path / "a.hibf")
    raw = str(tmp_path / "b.hibf")
    hibf.save(npz)
    hibf.save_raw(raw)

    got = HIBF.load(raw)
    assert len(got.subs) == len(hibf.subs)
    for a, b in zip(got.subs, hibf.subs):
        assert isinstance(a.bits, np.memmap)
        assert np.array_equal(np.asarray(a.bits), b.bits)
        assert a.bin_map == b.bin_map
        assert a.hashes_count == b.hashes_count

    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(30):
            t = list(refs)[i % len(refs)]
            s = int(rng.integers(0, max(len(refs[t]) - 60, 1)))
            f.write(f"@q{i}\n{refs[t][s:s + 60]}\n+\n{'I' * 60}\n")
    outs = {}
    for tag, db in (("npz", npz), ("raw", raw)):
        out = str(tmp_path / tag)
        run_classify(ClassifyConfig(
            ibf=[db], single_reads=[str(fq)], output_prefix=out,
            rel_cutoff=[0.3], output_all=True, quiet=True,
        ))
        with open(out + ".all") as f:
            outs[tag] = sorted(f.read().splitlines())
    assert outs["npz"] == outs["raw"]
