"""EM reassignment tests (reference reassign.py semantics)."""

import os

from ganon_tpu.reassign import ReassignConfig, reassign


def write(path, lines):
    with open(path, "w") as f:
        for ln in lines:
            f.write("\t".join(str(v) for v in ln) + "\n")
    return str(path)


def read(path):
    with open(path) as f:
        return [line.rstrip("\n").split("\t") for line in f]


def test_em_reassigns_to_dominant_target(tmp_path):
    # 3 unique reads to A, 1 to B; 4 multi reads A|B -> all go to A
    all_rows = [
        ("u1", "A", 10), ("u2", "A", 10), ("u3", "A", 10), ("u4", "B", 9),
        ("m1", "A", 8), ("m1", "B", 8),
        ("m2", "A", 7), ("m2", "B", 7),
        ("m3", "A", 6), ("m3", "B", 6),
    ]
    write(tmp_path / "res.all", all_rows)
    rep_rows = [
        ("H1", "A", 6, 3, 0),
        ("H1", "B", 4, 1, 0),
        ("H1", "AB", 0, 0, 3),  # lca entries get dropped from new rep
    ]
    with open(tmp_path / "res.rep", "w") as f:
        for r in rep_rows:
            f.write("\t".join(str(v) for v in r) + "\n")
        f.write("#total_classified\t7\n#total_unclassified\t0\n")

    cfg = ReassignConfig(input_prefix=[str(tmp_path / "res")])
    assert reassign(cfg)

    one = read(tmp_path / "res.one")
    by_read = {r[0]: r[1] for r in one}
    assert by_read["u1"] == "A" and by_read["u4"] == "B"
    assert by_read["m1"] == "A" and by_read["m2"] == "A" and by_read["m3"] == "A"

    rep = read(tmp_path / "res.rep")
    rows = {r[1]: r for r in rep if not r[0].startswith("#")}
    # A: reassigned = 3 unique + 3 wins -> lca col = 6 - 3 = 3
    assert int(rows["A"][4]) == 3
    assert int(rows["B"][4]) == 0
    assert "AB" not in rows  # lca-only target dropped
    trailer = [r for r in rep if r[0].startswith("#")]
    assert len(trailer) == 2


def test_no_unique_matches_first_wins(tmp_path):
    # no unique matches at all: prob stays 0 -> first match of each read wins
    all_rows = [
        ("m1", "X", 5), ("m1", "Y", 5),
        ("m2", "Y", 4), ("m2", "X", 4),
    ]
    write(tmp_path / "r2.all", all_rows)
    with open(tmp_path / "r2.rep", "w") as f:
        f.write("H1\tX\t2\t0\t1\nH1\tY\t2\t0\t1\n")
        f.write("#total_classified\t2\n#total_unclassified\t0\n")
    cfg = ReassignConfig(input_prefix=[str(tmp_path / "r2")], max_iter=3)
    assert reassign(cfg)
    one = {r[0]: r[1] for r in read(tmp_path / "r2.one")}
    # EM seeds with uniform zero, first iteration ties -> first listed match;
    # after reassignment X gets m1, so m2's top becomes X as well (or stays
    # per prob evolution). Both reads must be assigned to exactly one target.
    assert set(one.keys()) == {"m1", "m2"}
    assert all(t in ("X", "Y") for t in one.values())


def test_remove_all_and_output_prefix(tmp_path):
    write(tmp_path / "r3.all", [("u1", "A", 5)])
    with open(tmp_path / "r3.rep", "w") as f:
        f.write("H1\tA\t1\t1\t0\n#total_classified\t1\n#total_unclassified\t0\n")
    out = str(tmp_path / "out")
    cfg = ReassignConfig(
        input_prefix=[str(tmp_path / "r3")], output_prefix=out, remove_all=True
    )
    assert reassign(cfg)
    assert os.path.exists(out + ".one")
    assert os.path.exists(out + ".rep")
    assert not os.path.exists(tmp_path / "r3.all")  # removed
