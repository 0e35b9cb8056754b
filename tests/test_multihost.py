"""Multi-host partitioning logic (pure functions; real pods unavailable)."""

import numpy as np

from ganon_tpu.parallel.multihost import host_output_prefix, shard_reads


def test_shard_pairs_stay_together():
    paired = ["a.1", "a.2", "b.1", "b.2", "c.1", "c.2"]
    s0 = shard_reads([], paired, [], 0, 2)
    s1 = shard_reads([], paired, [], 1, 2)
    assert s0[1] == ["a.1", "a.2", "c.1", "c.2"]
    assert s1[1] == ["b.1", "b.2"]
    assert s0[3:] == (1, 0) and s1[3:] == (1, 0)
    # union covers everything, disjoint
    assert sorted(s0[1] + s1[1]) == sorted(paired)


def test_shard_fewer_files_than_hosts_stripes_records():
    """One big fastq on a 4-host pod: every host keeps the file and
    takes a record stripe instead of 3 hosts idling."""
    shards = [shard_reads(["big.fq"], [], [], i, 4) for i in range(4)]
    for i, s in enumerate(shards):
        assert s[0] == ["big.fq"]
        assert s[3:] == (4, i)

    # two files over four hosts: still striped (2 units < 4 hosts)
    shards = [shard_reads(["r1.fq", "r2.fq"], [], [], i, 4)
              for i in range(4)]
    for i, s in enumerate(shards):
        assert s[0] == ["r1.fq", "r2.fq"]
        assert s[3:] == (4, i)


def test_shard_units_round_robin_across_kinds():
    """units >= hosts round-robins over ALL units so no host idles even
    when kinds are mixed."""
    s0 = shard_reads(["s.fq"], ["p.1", "p.2"], [], 0, 2)
    s1 = shard_reads(["s.fq"], ["p.1", "p.2"], [], 1, 2)
    assert s0[0] == ["s.fq"] and s0[1] == []
    assert s1[0] == [] and s1[1] == ["p.1", "p.2"]
    assert s0[3:] == (1, 0) and s1[3:] == (1, 0)


def test_single_process_passthrough():
    s = shard_reads(["x"], ["a", "b"], ["t"], 0, 1)
    assert s == (["x"], ["a", "b"], ["t"], 1, 0)


def test_host_output_prefix():
    assert host_output_prefix("out", 2, 4) == "out.h2"
    assert host_output_prefix("out", 0, 1) == "out"
    assert host_output_prefix("", 1, 4) == ""


def test_strided_batches_disjoint_exhaustive(tmp_path):
    """The record stripes of N hosts partition the input exactly."""
    from ganon_tpu.io.pipeline import encoded_batches, strided_batches

    fq = tmp_path / "reads.fq"
    with open(fq, "w") as f:
        for i in range(103):  # not a multiple of the batch size
            f.write(f"@q{i}\nACGTACGTACGT\n+\nIIIIIIIIIIII\n")

    def ids_for(offset, stride):
        out = []
        for b in strided_batches(
            encoded_batches(str(fq), None, "", 16), stride, offset
        ):
            out.extend(b.ids)
            assert b.codes1.shape[0] == len(b.ids)
        return out

    stripes = [ids_for(o, 4) for o in range(4)]
    allids = sorted(i for s in stripes for i in s)
    assert allids == sorted(f"q{i}" for i in range(103))
    for o, s in enumerate(stripes):
        assert s == [f"q{i}" for i in range(o, 103, 4)]


def test_striped_classify_union_equals_single_run(tmp_path):
    """2 'hosts' with stride 2 produce, in union, exactly the single-run
    outputs (record-range sharding end to end through run_classify)."""
    from ganon_tpu.classify.engine import ClassifyConfig, run_classify
    from test_classify import build_db

    rng = np.random.default_rng(8)
    bases = "ACGT"
    genome = "".join(bases[int(b)] for b in rng.integers(0, 4, size=8000))
    db = build_db(tmp_path, {"G": genome}, k=19, w=31, max_fp=0.001)
    fq = tmp_path / "reads.fq"
    with open(fq, "w") as f:
        for i in range(60):
            s = int(rng.integers(0, len(genome) - 150))
            seq = genome[s : s + 150] if i % 3 else "".join(
                bases[int(b)] for b in rng.integers(0, 4, size=150)
            )
            f.write(f"@q{i}\n{seq}\n+\n{'I' * 150}\n")

    def run(tag, stride=1, offset=0):
        out = str(tmp_path / tag)
        run_classify(ClassifyConfig(
            ibf=[db], single_reads=[str(fq)], output_prefix=out,
            rel_cutoff=[0.25], output_all=True, output_unclassified=True,
            read_stride=stride, read_offset=offset, quiet=True,
        ))
        res = {}
        for ext in (".all", ".unc"):
            with open(out + ext) as f:
                res[ext] = sorted(f.read().splitlines())
        return res

    whole = run("whole")
    h0 = run("h0", 2, 0)
    h1 = run("h1", 2, 1)
    for ext in (".all", ".unc"):
        assert sorted(h0[ext] + h1[ext]) == whole[ext]
