"""Real 2-process jax.distributed classify on CPU.

Spawns two CLI processes wired into one jax.distributed runtime
(coordinator on localhost), each with 2 local virtual devices. Host i
classifies its file shard with a LOCAL (batch, bins) mesh and writes
``out.h{i}.*``; the merged outputs must equal a single-process run of
the same files — the contract docs/scaling.md promises.
"""

import os
import random
import socket
import subprocess
import sys

import pytest

from tests.test_classify import build_db, write_fastq, read_tsv


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_classify(tmp_path):
    rng = random.Random(9)
    refs = {
        f"T{i}": "".join(rng.choice("ACGT") for _ in range(400))
        for i in range(6)
    }
    db = build_db(tmp_path, refs, k=10, w=12, max_fp=0.01)
    names = sorted(refs)
    files = []
    for h in range(2):
        reads = {}
        for i in range(30):
            t = names[(i + h) % len(names)]
            s = rng.randint(0, 330)
            reads[f"h{h}q{i}"] = refs[t][s : s + rng.randint(20, 60)]
        fq = tmp_path / f"r{h}.fq"
        write_fastq(fq, reads)
        files.append(str(fq))

    # single-process oracle over both files
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    solo = str(tmp_path / "solo")
    run_classify(ClassifyConfig(
        ibf=[db], single_reads=files, output_prefix=solo,
        rel_cutoff=[0.3], rel_filter=[0.3],
        output_all=True, output_unclassified=True,
    ))

    port = _free_port()
    out = str(tmp_path / "dist")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            # CPU distributed: each process exposes its own devices
            "JAX_LOCAL_DEVICE_IDS": "",
        })
        env.pop("JAX_LOCAL_DEVICE_IDS")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ganon_tpu.cli", "classify",
             "--db-prefix", db[:-4], "--single-reads", *files,
             "--output-prefix", out, "--output-all",
             "--output-unclassified", "--rel-cutoff", "0.3",
             "--rel-filter", "0.3", "--distributed"],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    for ext in (".all", ".one", ".unc"):
        merged = sorted(
            map(tuple, read_tsv(out + ".h0" + ext)))
        merged += sorted(map(tuple, read_tsv(out + ".h1" + ext)))
        want = sorted(map(tuple, read_tsv(solo + ext)))
        assert sorted(merged) == want, ext
    # per-host .rep totals sum to the solo totals
    def rep_totals(path):
        tot = {}
        for r in read_tsv(path):
            if r[0].startswith("#"):
                tot[r[0]] = tot.get(r[0], 0) + int(r[1])
        return tot

    t0 = rep_totals(out + ".h0.rep")
    t1 = rep_totals(out + ".h1.rep")
    ts = rep_totals(solo + ".rep")
    for key in ts:
        assert t0.get(key, 0) + t1.get(key, 0) == ts[key], key


def test_two_process_single_file_striping(tmp_path):
    """ONE input file across 2 real jax.distributed processes: hosts
    take record stripes (parallel/multihost record-range sharding) and
    the merged outputs equal the single-process run."""
    rng = random.Random(11)
    refs = {
        f"T{i}": "".join(rng.choice("ACGT") for _ in range(400))
        for i in range(5)
    }
    db = build_db(tmp_path, refs, k=10, w=12, max_fp=0.01)
    names = sorted(refs)
    reads = {}
    for i in range(50):
        t = names[i % len(names)]
        s = rng.randint(0, 330)
        reads[f"q{i}"] = refs[t][s : s + rng.randint(20, 60)]
    fq = str(tmp_path / "big.fq")
    write_fastq(fq, reads)

    from ganon_tpu.classify.engine import ClassifyConfig, run_classify

    solo = str(tmp_path / "solo1")
    run_classify(ClassifyConfig(
        ibf=[db], single_reads=[fq], output_prefix=solo,
        rel_cutoff=[0.3], output_all=True, output_unclassified=True,
    ))

    port = _free_port()
    out = str(tmp_path / "dist1")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "ganon_tpu.cli", "classify",
             "--db-prefix", db[:-4], "--single-reads", fq,
             "--output-prefix", out, "--output-all",
             "--output-unclassified", "--rel-cutoff", "0.3",
             "--distributed"],
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    outs = [p.communicate(timeout=280) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    for ext in (".all", ".unc"):
        merged = sorted(map(tuple, read_tsv(out + ".h0" + ext)))
        merged += sorted(map(tuple, read_tsv(out + ".h1" + ext)))
        want = sorted(map(tuple, read_tsv(solo + ext)))
        assert sorted(merged) == want, ext
    # both stripes actually did work (no idle host)
    n0 = len(read_tsv(out + ".h0.all")) + len(read_tsv(out + ".h0.unc"))
    n1 = len(read_tsv(out + ".h1.all")) + len(read_tsv(out + ".h1.unc"))
    assert n0 > 0 and n1 > 0
