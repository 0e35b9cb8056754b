"""Multi-host partitioning logic (pure functions; real pods unavailable)."""

from ganon_tpu.parallel.multihost import host_output_prefix, shard_reads


def test_shard_pairs_stay_together():
    paired = ["a.1", "a.2", "b.1", "b.2", "c.1", "c.2"]
    s0 = shard_reads([], paired, [], 0, 2)
    s1 = shard_reads([], paired, [], 1, 2)
    assert s0[1] == ["a.1", "a.2", "c.1", "c.2"]
    assert s1[1] == ["b.1", "b.2"]
    # union covers everything, disjoint
    assert sorted(s0[1] + s1[1]) == sorted(paired)


def test_shard_single_and_empty_hosts():
    single = ["r1.fq", "r2.fq"]
    shards = [shard_reads(single, [], [], i, 4) for i in range(4)]
    assert [s[0] for s in shards] == [["r1.fq"], ["r2.fq"], [], []]


def test_single_process_passthrough():
    s = shard_reads(["x"], ["a", "b"], ["t"], 0, 1)
    assert s == (["x"], ["a", "b"], ["t"])


def test_host_output_prefix():
    assert host_output_prefix("out", 2, 4) == "out.h2"
    assert host_output_prefix("out", 0, 1) == "out"
    assert host_output_prefix("", 1, 4) == ""
