"""Multi-device sharding: results identical to single-device reference."""

import numpy as np
import jax

from ganon_tpu.parallel.mesh import make_mesh, ShardedClassifier
from ganon_tpu.index.ibf import build_ibf


def _ibf(seed=0, n_targets=12):
    rng = np.random.default_rng(seed)
    th = {
        f"T{i}": np.unique(rng.integers(0, 2**62, size=300, dtype=np.uint64))
        for i in range(n_targets)
    }
    return build_ibf(th, kmer_size=19, window_size=31, max_fp=0.05)


def test_mesh_shapes():
    mesh = make_mesh(jax.devices())
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("batch", "bins")


def test_batch_axis_table():
    from ganon_tpu.parallel.mesh import choose_batch_axis

    expected = {1: 1, 2: 1, 4: 2, 8: 2, 16: 4, 32: 4, 64: 8, 128: 8}
    for n, b in expected.items():
        assert choose_batch_axis(n) == b
        assert n % b == 0
    # fallback for untabled counts: a divisor, bins >= batch
    for n in (6, 12, 24, 48, 256):
        b = choose_batch_axis(n)
        assert n % b == 0 and b <= n // b


def test_sharded_counts_match_single_device():
    ibf = _ibf()
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(16, 96)).astype(np.uint8)
    lengths = np.full((16,), 96, dtype=np.int32)
    lengths[3] = 20  # shorter than window -> zero hashes
    lengths[7] = 50

    multi = ShardedClassifier(ibf, make_mesh(jax.devices()))
    c_multi, n_multi = multi.counts(codes, lengths)

    single = ShardedClassifier(ibf, make_mesh(jax.devices()[:1]))
    c_single, n_single = single.counts(codes, lengths)

    assert (np.asarray(c_multi) == np.asarray(c_single)).all()
    assert (np.asarray(n_multi) == np.asarray(n_single)).all()
    assert np.asarray(n_multi)[3] == 0


def test_graft_entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    counts, n_hashes = jax.jit(fn)(*args)
    assert counts.shape[0] == args[3].shape[0]  # batch of codes

    mod.dryrun_multichip(len(jax.devices()))


def test_dryrun_multichip_n16():
    """The full dryrun value checks (sharded classify, forest, build
    scatter vs single-device) at n=16 — past the first power of two the
    rest of the suite runs at (conftest pins 8 virtual devices), so
    collective/sharding issues that only appear at wider meshes are
    caught in-suite. Runs in a subprocess because the device count is
    fixed at backend init."""
    import os
    import subprocess
    import sys

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(16); print('OK16')"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK16" in r.stdout


def test_engine_mesh_outputs_match_single_device(tmp_path):
    """Full engine run over the 8-device mesh == single-device outputs."""
    import numpy as np

    from ganon_tpu.index.ibf import build_ibf
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    rng = np.random.default_rng(3)
    genomes = {
        f"T{i}": rng.integers(0, 4, size=20000, dtype=np.uint8)
        for i in range(5)
    }
    from ganon_tpu.ops.minimizers import window_mins_jax

    th = {}
    for t, g in genomes.items():
        mv, valid = window_mins_jax(
            g[None, :], np.asarray([len(g)], dtype=np.int32), k=19, w=31
        )
        th[t] = np.unique(np.asarray(mv)[np.asarray(valid)])
    ibf = build_ibf(th, kmer_size=19, window_size=31, max_fp=0.05)
    db = tmp_path / "db.ibf"
    ibf.save(str(db))

    reads = tmp_path / "reads.fq"
    with open(reads, "w") as f:
        for i in range(300):
            t = f"T{i % 5}"
            s = rng.integers(0, len(genomes[t]) - 150)
            seq = "".join("ACGT"[c] for c in genomes[t][s : s + 150])
            f.write(f"@r{i}\n{seq}\n+\n{'I' * 150}\n")

    outs = {}
    for tag, use_mesh in (("mesh", True), ("single", False)):
        prefix = str(tmp_path / tag)
        cfg = ClassifyConfig(
            ibf=[str(db)],
            single_reads=[str(reads)],
            output_prefix=prefix,
            output_all=True,
            output_unclassified=True,
            use_mesh=use_mesh,
        )
        run_classify(cfg)
        outs[tag] = {
            ext: sorted(open(prefix + ext).read().splitlines())
            for ext in (".rep", ".all", ".unc")
        }
    assert outs["mesh"] == outs["single"]


def test_forest_mesh_outputs_match_single_device(tmp_path):
    """HIBF forest classify over the (batch, bins) mesh must equal the
    single-device run line for line (sub-IBF tables column-sharded)."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from ganon_tpu.index.builder import sequence_hashes
    from ganon_tpu.index.hibf import build_hibf

    rng = np.random.default_rng(13)
    bases = "ACGT"
    refs = {
        f"T{i}": "".join(
            bases[int(b)]
            for b in rng.integers(0, 4, size=300 * (i + 1))
        )
        for i in range(5)
    }
    k, w = 10, 12
    th = {t: np.unique(sequence_hashes(s, k, w)) for t, s in refs.items()}
    hibf = build_hibf(th, kmer_size=k, window_size=w, max_fp=0.05,
                      num_classes=3)
    assert len(hibf.subs) >= 2
    db = str(tmp_path / "forest.hibf")
    hibf.save(db)

    fq = tmp_path / "r.fq"
    with open(fq, "w") as f:
        for i in range(40):
            t = list(refs)[i % len(refs)]
            s = int(rng.integers(0, max(len(refs[t]) - 60, 1)))
            f.write(f"@q{i}\n{refs[t][s:s + 60]}\n+\n{'I' * 60}\n")

    def run(tag, use_mesh):
        out = str(tmp_path / tag)
        run_classify(ClassifyConfig(
            ibf=[db], single_reads=[str(fq)], output_prefix=out,
            rel_cutoff=[0.3], output_all=True, output_unclassified=True,
            use_mesh=use_mesh,
        ))
        res = {}
        for ext in (".all", ".one", ".unc", ".rep"):
            import os

            if os.path.exists(out + ext):
                with open(out + ext) as f:
                    res[ext] = sorted(f.read().splitlines())
        return res

    meshed = run("mesh", True)      # 8 virtual devices (conftest)
    single = run("single", False)
    assert meshed == single
