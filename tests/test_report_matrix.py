"""ganon report: the reference's full integration matrix on its bundled
mini data (tests/ganon/integration/test_report.py): two databases
(species- and assembly-level), two-level hierarchy classification, then
every report type, filter, hierarchy selector and output format, checked
with the reference's sanity oracle (percentage totals, children <=
cumulative, per-rank <= 100%)."""

import math
import os

import pandas as pd
import pytest

from ganon_tpu.cli import main
from ganon_tpu.config import Config

DATA = "/root/reference/tests/ganon/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not available"
)

TRE_COLS = ["rank", "target", "lineage", "name", "unique", "shared",
            "children", "cumulative", "cumulative_perc"]


def parse_tre(tre_file, output_format="tsv"):
    df = pd.read_table(
        tre_file, sep="," if output_format == "csv" else "\t",
        header=None, names=TRE_COLS,
        dtype={c: "str" for c in TRE_COLS[:4]},
    )
    for c in TRE_COLS[4:8]:
        df[c] = df[c].astype("int64")
    df["cumulative_perc"] = df["cumulative_perc"].astype(float)
    return df


def sanity(output_prefix, report_type="abundance", output_format="tsv",
           sum_full_percentage=True):
    """reference report_sanity_check_and_parse (utils.py:351-455)."""
    directory = os.path.dirname(output_prefix) or "."
    base = os.path.basename(output_prefix)
    files = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.startswith(base) and f.endswith(".tre")
    )
    assert files, f"no .tre outputs for {output_prefix}"
    multi = {}
    for out_tre in files:
        df = parse_tre(out_tre, output_format)
        df["rank"] = df["rank"].str.strip()
        idx_root = df["rank"] == "root"
        idx_base = (idx_root if report_type == "matches"
                    else idx_root | (df["rank"] == "unclassified"))
        if sum_full_percentage:
            assert math.floor(df[idx_base]["cumulative_perc"].sum()) == 100
        assert (df[~idx_base]["unique"].sum() + df[~idx_base]["shared"].sum()
                ) <= df[idx_base]["cumulative"].sum()
        assert (df["cumulative_perc"] <= 100 + 1e-9).all()
        for rank, val in df.groupby("rank")["cumulative_perc"].sum().items():
            if rank in Config.choices_default_ranks:
                assert math.floor(val) <= 100
        assert ((df["unique"] + df["shared"] + df["children"])
                <= df["cumulative"]).all()
        multi[out_tre] = (df, idx_base)
    return multi if len(multi) > 1 else multi[files[-1]]


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("repmat")
    db1 = str(tmp / "base_build")    # species level
    db2 = str(tmp / "base_build2")   # assembly level
    common = dict(
        taxonomy="ncbi",
        taxonomy_files=[f"{DATA}/build-custom/taxdump.tar.gz"],
        ncbi_file_info=[f"{DATA}/build-custom/assembly_summary.txt"],
        genome_size_files=[f"{DATA}/build-custom/species_genome_size.txt.gz"],
        filter_type="ibf", quiet=True,
    )
    assert main(cfg=Config("build-custom", db_prefix=db1,
                           input=[f"{DATA}/build-custom/files/"],
                           level="species", **common))
    assert main(cfg=Config("build-custom", db_prefix=db2,
                           input=[f"{DATA}/build-custom/files/more/"],
                           level="assembly", **common))
    rep = str(tmp / "base_classify")
    assert main(cfg=Config(
        "classify", db_prefix=[db2, db1], hierarchy_labels=["A", "B"],
        rel_cutoff=[0], rel_filter=[1], output_prefix=rep,
        paired_reads=[f"{DATA}/classify/sim.1.fq.gz",
                      f"{DATA}/classify/sim.2.fq.gz"],
        multiple_matches="lca", skip_report=True, quiet=True,
    ))
    rep2 = str(tmp / "base_classify2")
    assert main(cfg=Config(
        "classify", db_prefix=[db2, db1], hierarchy_labels=["C", "D"],
        output_prefix=rep2,
        paired_reads=[f"{DATA}/classify/sim.1.fq.gz",
                      f"{DATA}/classify/sim.2.fq.gz"],
        multiple_matches="lca", skip_report=True, quiet=True,
    ))
    return tmp, db1, db2, rep + ".rep", rep2 + ".rep"


def run_report(base, tmp_path, name, **params):
    tmp, db1, db2, rep, rep2 = base
    defaults = dict(
        input=[rep], db_prefix=[db2, db1],
        output_prefix=str(tmp_path / name), quiet=True,
    )
    defaults.update(params)
    cfg = Config("report", **defaults)
    assert main(cfg=cfg)
    return defaults["output_prefix"]


def test_default(base, tmp_path):
    out = run_report(base, tmp_path, "default")
    sanity(out)


@pytest.mark.parametrize("key,val,perc", [
    ("min_count", 20, False), ("min_count", 0.2, True),
    ("max_count", 40, False), ("max_count", 0.5, True),
])
def test_min_max_count(base, tmp_path, key, val, perc):
    out = run_report(base, tmp_path, f"{key}_{val}", **{key: val})
    df, idx_base = sanity(out, sum_full_percentage=False)
    body = df[~idx_base]
    if key == "min_count":
        if perc:
            assert (body["cumulative_perc"] >= val * 100 - 1e-6).all()
        else:
            assert (body["cumulative"] >= val).all()
    else:
        if perc:
            assert (body["cumulative_perc"] <= val * 100 + 1e-6).all()
        else:
            assert (body["cumulative"] <= val).all()


@pytest.mark.parametrize("report_type", [
    "abundance", "reads", "matches", "corr", "dist"])
def test_report_types(base, tmp_path, report_type):
    out = run_report(base, tmp_path, f"type_{report_type}",
                     report_type=report_type)
    sanity(out, report_type=report_type)


def test_ranks(base, tmp_path):
    out = run_report(base, tmp_path, "ranks", ranks=["phylum", "species"])
    df, idx_base = sanity(out, sum_full_percentage=False)
    assert set(df[~idx_base]["rank"]) <= {"phylum", "species"}


def test_ranks_all(base, tmp_path):
    out = run_report(base, tmp_path, "ranks_all", ranks=["all"])
    df, idx_base = sanity(out)
    assert len(set(df[~idx_base]["rank"])) > len(Config.choices_default_ranks) - 3


def test_skip_hierarchy(base, tmp_path):
    out = run_report(base, tmp_path, "skiph", skip_hierarchy=["A"])
    df, idx_base = sanity(out, sum_full_percentage=False)
    # hierarchy A is the assembly-level db
    assert not df[~idx_base]["rank"].isin(["assembly"]).any()


def test_keep_hierarchy(base, tmp_path):
    out = run_report(base, tmp_path, "keeph", keep_hierarchy=["B"])
    df, idx_base = sanity(out, sum_full_percentage=False)
    assert not df[~idx_base]["rank"].isin(["assembly"]).any()


def test_split_hierarchy(base, tmp_path):
    out = run_report(base, tmp_path, "splith", split_hierarchy=True)
    multi = sanity(out, sum_full_percentage=False)
    assert isinstance(multi, dict) and len(multi) == 2
    total_root = 0.0
    for df, _ in multi.values():
        total_root += df[df["rank"] == "root"]["cumulative_perc"].values[0]
    df, _ = list(multi.values())[-1]
    total_root += df[df["rank"] == "unclassified"]["cumulative_perc"].values[0]
    assert int(total_root) == 100


def test_multiple_rep_files(base, tmp_path):
    tmp, db1, db2, rep, rep2 = base
    out = run_report(base, tmp_path, "multi", input=[rep, rep2])
    multi = sanity(out)
    assert isinstance(multi, dict) and len(multi) == 2


def test_multiple_rep_files_folder(base, tmp_path):
    tmp, db1, db2, rep, rep2 = base
    out = run_report(base, tmp_path, "multif",
                     input=[str(tmp)], input_extension="rep")
    multi = sanity(out)
    assert isinstance(multi, dict) and len(multi) == 2


def test_names_filter(base, tmp_path):
    full = run_report(base, tmp_path, "full_for_names")
    df, idx_base = sanity(full)
    name = df[~idx_base]["name"].iloc[0]
    out = run_report(base, tmp_path, "names", names=[name])
    df2, idx2 = sanity(out, sum_full_percentage=False)
    assert (df2[~idx2]["name"] == name).all()


def test_names_with_filter(base, tmp_path):
    out = run_report(base, tmp_path, "nameswith", names_with=["ba"])
    df, idx = sanity(out, sum_full_percentage=False)
    assert df[~idx]["name"].str.contains("ba").all()


def test_taxids_filter(base, tmp_path):
    # 2 = Bacteria: every reported node's lineage must pass through it
    out = run_report(base, tmp_path, "taxids", taxids=["2"])
    df, idx = sanity(out, sum_full_percentage=False)
    assert df[~idx]["lineage"].str.contains(r"(?:^|\|)2(?:\||$)").all()


def test_top_percentile(base, tmp_path):
    full = run_report(base, tmp_path, "full_for_top")
    df_full, idxf = sanity(full)
    out = run_report(base, tmp_path, "top", top_percentile=0.5)
    df, idx = sanity(out, sum_full_percentage=False)
    for rank in set(df[~idx]["rank"]):
        n_full = (df_full[~idxf]["rank"] == rank).sum()
        n_top = (df[~idx]["rank"] == rank).sum()
        assert n_top <= max(1, math.ceil(n_full * 0.5))


def test_taxdump_file(base, tmp_path):
    out = run_report(
        base, tmp_path, "taxdump", db_prefix=[],
        taxonomy_files=[f"{DATA}/build-custom/taxdump.tar.gz"],
        genome_size_files=[f"{DATA}/build-custom/species_genome_size.txt.gz"],
    )
    sanity(out)


def test_na_orphans(base, tmp_path):
    # without the db .tax, assembly targets are orphans -> rank "na"
    out = run_report(
        base, tmp_path, "na", db_prefix=[], ranks=["all"],
        taxonomy_files=[f"{DATA}/build-custom/taxdump.tar.gz"],
        genome_size_files=[f"{DATA}/build-custom/species_genome_size.txt.gz"],
    )
    df, idx = sanity(out)
    assert (df[~idx]["rank"] == "na").any()


def test_na_ranks(base, tmp_path):
    out = run_report(
        base, tmp_path, "naranks", db_prefix=[],
        ranks=["genus", "species", "na"],
        taxonomy_files=[f"{DATA}/build-custom/taxdump.tar.gz"],
        genome_size_files=[f"{DATA}/build-custom/species_genome_size.txt.gz"],
    )
    df, idx = sanity(out)
    assert (df[~idx]["rank"] == "na").any()
    assert set(df[~idx]["rank"]) <= {"genus", "species", "na"}


def test_no_orphan(base, tmp_path):
    out = run_report(
        base, tmp_path, "noorphan", db_prefix=[], ranks=["all"],
        no_orphan=True,
        taxonomy_files=[f"{DATA}/build-custom/taxdump.tar.gz"],
        genome_size_files=[f"{DATA}/build-custom/species_genome_size.txt.gz"],
    )
    df, idx = sanity(out)
    assert not (df[~idx]["rank"] == "na").any()


def test_only_orphan(base, tmp_path):
    out = run_report(
        base, tmp_path, "onlyorphan", db_prefix=[], ranks=["na"],
        taxonomy_files=[f"{DATA}/build-custom/taxdump.tar.gz"],
        genome_size_files=[f"{DATA}/build-custom/species_genome_size.txt.gz"],
    )
    df, idx = sanity(out, sum_full_percentage=False)
    assert (df[~idx]["rank"] == "na").all()


@pytest.mark.parametrize("output_format", ["tsv", "csv", "text"])
def test_output_formats(base, tmp_path, output_format):
    out = run_report(base, tmp_path, f"fmt_{output_format}",
                     output_format=output_format)
    sanity(out, output_format=output_format)


def test_output_format_bioboxes(base, tmp_path):
    base_out = run_report(base, tmp_path, "bioboxes_base")
    df, idx = sanity(base_out)
    out = run_report(base, tmp_path, "bioboxes", output_format="bioboxes")
    taxids = []
    with open(out + ".tre") as f:
        for line in f:
            if line.startswith(("@", "#")) or not line.strip():
                continue
            taxids.append(line.rstrip().split("\t")[0])
    assert df[~idx]["target"].isin(taxids).all()
