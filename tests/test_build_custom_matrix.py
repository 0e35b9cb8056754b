"""ganon build-custom: the reference's input/taxonomy/level/info matrix on
its bundled mini data (tests/ganon/integration/test_build_custom.py),
with a port of its sanity oracle (target_info consistency, .tax
connectivity, specialization semantics)."""

import glob
import gzip
import os

import pandas as pd
import pytest

from ganon_tpu.cli import main
from ganon_tpu.config import Config
from ganon_tpu.taxonomy import load_tax_files

DATA = "/root/reference/tests/ganon/data"
BC = f"{DATA}/build-custom"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not available"
)


def list_files_folder(folder, ext, recursive=False):
    pattern = f"**/*.{ext}" if recursive else f"*.{ext}"
    return sorted(glob.glob(os.path.join(folder, pattern),
                            recursive=recursive))


def list_sequences(files):
    seqs = []
    for f in files:
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            for line in fh:
                if line.startswith(">"):
                    seqs.append(line[1:].split()[0])
    return seqs


def run_build(tmp_path, name, expect_ok=True, **params):
    defaults = dict(
        input=[f"{BC}/files/"], taxonomy="skip", write_info_file=True,
        keep_files=True, quiet=True, filter_type="ibf",
    )
    defaults.update(params)
    defaults["db_prefix"] = str(tmp_path / name)
    cfg = Config("build-custom", **defaults)
    try:
        ok = main(cfg=cfg)
    except (ValueError, FileNotFoundError):
        ok = False
    assert ok == expect_ok
    return defaults if ok else None


def sanity(params, skipped_targets=False):
    """build_sanity_check_and_parse port (reference utils.py:157-282)."""
    dbp = params["db_prefix"]
    ext = "hibf" if params["filter_type"] == "hibf" else "ibf"
    assert os.path.isfile(dbp + "." + ext)
    if params["taxonomy"] != "skip":
        assert os.path.isfile(dbp + ".tax")
    res = {}
    res["target"] = pd.read_table(
        dbp + "_files/build/target_info.tsv", header=None,
        names=["file", "target"], usecols=[0, 1], dtype=str)
    if not skipped_targets:
        if params.get("input_file"):
            with open(params["input_file"]) as f:
                ntarget = len(f.readlines())
        else:
            input_files = []
            for i in params["input"]:
                if os.path.isdir(i):
                    input_files.extend(list_files_folder(
                        i, params.get("input_extension", "fna.gz"),
                        params.get("input_recursive", False)))
                else:
                    input_files.append(i)
            if params.get("input_target") == "sequence":
                ntarget = len(list_sequences(input_files))
            else:
                ntarget = len(input_files)
        assert res["target"].shape[0] == ntarget, "wrong number of targets"
    if params.get("input_file"):
        res["info"] = pd.read_table(
            params["input_file"], header=None,
            names=["file", "target", "node", "specialization",
                   "specialization_name"], dtype=str)
        if res["info"]["target"].isna().all():
            res["info"]["target"] = res["info"]["file"].map(
                os.path.basename)
    else:
        res["info"] = pd.read_table(
            dbp + ".info.tsv", header=None,
            names=["file", "target", "node", "specialization",
                   "specialization_name"], dtype=str)
    if params["taxonomy"] != "skip":
        tax = load_tax_files([dbp + ".tax"])
        res["tax"] = tax
        for t in res["target"]["target"]:
            assert tax.parent(t) is not None, f"{t} missing from .tax"
    level = params.get("level", "")
    if level in ("assembly", "custom"):
        assert (res["target"]["target"].sort_values().values
                == res["info"]["specialization"].sort_values().values).all()
        if params["taxonomy"] != "skip":
            assert level in res["tax"].ranks()
    elif not params.get("input_file"):
        assert res["info"]["specialization"].isna().all()
        assert res["info"]["specialization_name"].isna().all()
    return res


FILES = list_files_folder(f"{BC}/files", "fna.gz")


def test_input_folder(tmp_path):
    p = run_build(tmp_path, "folder", input=[f"{BC}/files/"],
                  input_extension="fna.gz")
    res = sanity(p)
    assert res["target"]["file"].isin(FILES).all()
    assert res["target"].shape[0] == len(FILES)


def test_input_folder_wrong_extension(tmp_path):
    run_build(tmp_path, "wrongext", input=[f"{BC}/files/"],
              input_extension="xxx.gz", expect_ok=False)


def test_input_folder_wrong_folder(tmp_path):
    run_build(tmp_path, "wrongdir", input=[f"{DATA}/wrong-place/"],
              expect_ok=False)


def test_input_folder_recursive(tmp_path):
    p = run_build(tmp_path, "recursive", input=[f"{BC}/files/"],
                  input_extension="fna.gz", input_recursive=True)
    res = sanity(p)
    rec = list_files_folder(f"{BC}/files", "fna.gz", recursive=True)
    assert res["target"].shape[0] == len(rec)
    assert len(rec) > len(FILES)  # files/more/ picked up


def test_input_single_file(tmp_path):
    p = run_build(tmp_path, "single", input=[FILES[0]])
    res = sanity(p)
    assert res["target"].shape[0] == 1


def test_input_files(tmp_path):
    p = run_build(tmp_path, "files", input=FILES)
    res = sanity(p)
    assert res["target"].shape[0] == len(FILES)


def test_input_folders_files(tmp_path):
    p = run_build(tmp_path, "mixed",
                  input=[f"{BC}/files/more/"] + FILES,
                  input_extension="fna.gz")
    res = sanity(p)
    more = list_files_folder(f"{BC}/files/more", "fna.gz")
    assert res["target"].shape[0] == len(FILES) + len(more)


def test_taxonomy_ncbi(tmp_path):
    p = run_build(tmp_path, "ncbi", taxonomy="ncbi",
                  taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                  ncbi_file_info=[f"{BC}/assembly_summary.txt"],
                  genome_size_files=[f"{BC}/species_genome_size.txt.gz"])
    res = sanity(p)
    # every target resolves to a node under root
    for t in res["target"]["target"]:
        assert "1" in res["tax"].lineage(t)


def test_taxonomy_gtdb(tmp_path):
    p = run_build(tmp_path, "gtdb", taxonomy="gtdb",
                  taxonomy_files=[f"{BC}/ar53_taxonomy.tsv.gz",
                                  f"{BC}/bac120_taxonomy.tsv.gz"],
                  genome_size_files=[f"{BC}/ar53_metadata.tsv.gz",
                                     f"{BC}/bac120_metadata.tsv.gz"])
    res = sanity(p, skipped_targets=True)
    assert res["target"].shape[0] >= 2  # only arc+bac assemblies in GTDB
    ranks = set(res["tax"].ranks())
    assert "species" in ranks and "domain" in ranks


def test_level_species(tmp_path):
    p = run_build(tmp_path, "species", taxonomy="ncbi", level="species",
                  taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                  ncbi_file_info=[f"{BC}/assembly_summary.txt"],
                  skip_genome_size=True)
    res = sanity(p)
    with open(p["db_prefix"] + ".tax") as f:
        leaf_ranks = {r.split("\t")[2] for r in f
                      if r.split("\t")[0] in
                      set(res["target"]["target"])}
    assert leaf_ranks <= {"species"}


def test_level_leaves(tmp_path):
    p = run_build(tmp_path, "leaves", taxonomy="ncbi", level="leaves",
                  taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                  ncbi_file_info=[f"{BC}/assembly_summary.txt"],
                  skip_genome_size=True)
    sanity(p)


def test_level_assembly(tmp_path):
    p = run_build(tmp_path, "assembly", taxonomy="ncbi", level="assembly",
                  taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                  ncbi_file_info=[f"{BC}/assembly_summary.txt"],
                  skip_genome_size=True)
    res = sanity(p)
    # specialization targets (assembly accessions), tax has assembly rank
    assert "assembly" in res["tax"].ranks()


def test_input_target_sequence(tmp_path):
    p = run_build(tmp_path, "seqs", input=[FILES[0]],
                  input_target="sequence", taxonomy="ncbi",
                  taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                  ncbi_sequence_info=[f"{BC}/nucl_gb.accession2taxid.gz"],
                  skip_genome_size=True)
    res = sanity(p)
    assert res["target"].shape[0] == len(list_sequences([FILES[0]]))


def write_input_file(path, files, cols):
    """n-column input file like the reference's write_input_file."""
    with open(path, "w") as f:
        for row in cols:
            f.write("\t".join(row) + "\n")
    return str(path)


ACC_NODE = {  # taxids from the fixture assembly_summary.txt
    "GCA_000147015.1": "871271",
    "GCA_002254805.1": "2012515",
    "GCF_004296495.1": "1972133",
    "GCF_009617975.1": "2565781",
}


def _acc(f):
    import re

    return re.search(r"GC[AF]_[0-9]+\.[0-9]+", f).group()


@pytest.mark.parametrize("ncols", [1, 2, 3, 4, 5])
def test_input_file_columns(tmp_path, ncols):
    rows = []
    for f in FILES:
        acc = _acc(f)
        row = [f, acc, ACC_NODE[acc], acc + "_spec", "spec name " + acc]
        rows.append(row[:ncols])
    inp = write_input_file(tmp_path / "input.tsv", FILES, rows)
    kwargs = dict(input_file=inp)
    if ncols >= 3:
        kwargs.update(taxonomy="ncbi",
                      taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                      skip_genome_size=True)
    if ncols >= 4:
        kwargs.update(level="custom")
    p = run_build(tmp_path, f"cols{ncols}", **kwargs)
    res = sanity(p)
    if ncols >= 4:
        assert set(res["target"]["target"]) == {
            _acc(f) + "_spec" for f in FILES}
    elif ncols >= 2:
        assert set(res["target"]["target"]) == {_acc(f) for f in FILES}


def test_input_file_3col_level_species(tmp_path):
    rows = [[f, _acc(f), ACC_NODE[_acc(f)]] for f in FILES]
    inp = write_input_file(tmp_path / "input.tsv", FILES, rows)
    p = run_build(tmp_path, "3col_species", input_file=inp,
                  taxonomy="ncbi", level="species",
                  taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                  skip_genome_size=True)
    res = sanity(p)
    tax = res["tax"]
    for t in res["target"]["target"]:
        assert tax.rank(t) == "species" or tax.parent(t)


def test_ncbi_file_info(tmp_path):
    p = run_build(tmp_path, "fileinfo", taxonomy="ncbi",
                  taxonomy_files=[f"{BC}/taxdump.tar.gz"],
                  ncbi_file_info=[f"{BC}/assembly_summary.txt"],
                  skip_genome_size=True)
    res = sanity(p)
    for t in res["target"]["target"]:
        node = res["info"].set_index("target").loc[t, "node"]
        assert node and node != "nan"


def test_hibf_filter_type(tmp_path):
    p = run_build(tmp_path, "hibf", filter_type="hibf")
    res = sanity(p)
    assert res["target"].shape[0] == len(FILES)


def test_hibf_reference_format_export(tmp_path):
    """build-custom --filter-type hibf --filter-format reference writes a
    raptor-format .hibf the classify engine (and the reference binaries)
    can load, with the same targets as the npz forest."""
    from ganon_tpu.classify.device import load_device_filter
    from ganon_tpu.index.serialize import is_raptor_hibf

    p_npz = run_build(tmp_path, "hibf_npz", filter_type="hibf")["db_prefix"]
    p_rap = run_build(tmp_path, "hibf_rap", filter_type="hibf",
                      filter_format="reference")["db_prefix"]
    assert is_raptor_hibf(p_rap + ".hibf")
    assert not is_raptor_hibf(p_npz + ".hibf")
    f_npz = load_device_filter(p_npz + ".hibf")
    f_rap = load_device_filter(p_rap + ".hibf")
    assert sorted(f_npz.targets) == sorted(f_rap.targets)


# ---------------------------------------------------------------------------
# cross-taxonomy conversion (--convert-taxonomy), reference
# test_build_custom.py:354-530 expectations on its bundled conversion
# fixtures (tests/ganon/data/build-custom/convert/)

CONVERT = f"{BC}/convert"


def _convert_input(tmp_path, src_tsv):
    """Rewrite the fixture input TSV's relative fasta path to absolute."""
    out = tmp_path / "convert_input.tsv"
    with open(src_tsv) as f, open(out, "w") as o:
        for line in f:
            fields = line.rstrip("\n").split("\t")
            fields[0] = os.path.join(CONVERT, os.path.basename(fields[0]))
            o.write("\t".join(fields) + "\n")
    return str(out)


def test_convert_taxonomy_gtdb_gtdb(tmp_path):
    """gtdb-95 -> gtdb-226: same / missing / one-to-one / one-to-many(lca)."""
    inp = _convert_input(tmp_path, f"{CONVERT}/convert_gtdb.tsv")
    p = run_build(
        tmp_path, "conv_gtdb_gtdb", input=None, input_file=inp,
        input_target="sequence", skip_genome_size=True, level="leaves",
        taxonomy="gtdb-95",
        taxonomy_files=[f"{CONVERT}/bac120_taxonomy_r95.tsv.gz"],
        convert_taxonomy="gtdb-226",
        convert_taxonomy_files=[f"{CONVERT}/bac120_taxonomy_r226.tsv.gz"],
        convert_gtdb_files=[f"{CONVERT}/95_acc_rep_lin_ncbi.tsv.gz",
                            f"{CONVERT}/226_acc_rep_lin_ncbi.tsv.gz"],
    )
    res = sanity(p, skipped_targets=True)
    # s__Bact-08 sp003520315 vanished in r226 (dropped); JOSHI-001 is
    # one-to-many -> lca f__Burkholderiaceae
    assert sorted(res["target"]["target"]) == sorted([
        "s__Neisseria meningitidis",
        "s__Oliverpabstia intestinalis",
        "f__Burkholderiaceae",
    ])


def test_convert_taxonomy_gtdb_ncbi(tmp_path):
    """gtdb-95 -> ncbi-latest with --level family."""
    inp = _convert_input(tmp_path, f"{CONVERT}/convert_gtdb.tsv")
    p = run_build(
        tmp_path, "conv_gtdb_ncbi", input=None, input_file=inp,
        input_target="sequence", skip_genome_size=True, level="family",
        taxonomy="gtdb-95",
        taxonomy_files=[f"{CONVERT}/bac120_taxonomy_r95.tsv.gz"],
        convert_taxonomy="ncbi-latest",
        convert_taxonomy_files=[f"{CONVERT}/convert_nodes.dmp"],
        convert_gtdb_files=[f"{CONVERT}/95_acc_rep_lin_ncbi.tsv.gz"],
    )
    res = sanity(p)
    assert sorted(res["target"]["target"]) == sorted(
        ["481", "171550", "186803", "2975441"])


def test_convert_taxonomy_ncbi_gtdb(tmp_path):
    """ncbi -> gtdb-226 with --level species; untranslatable entry dropped."""
    inp = _convert_input(tmp_path, f"{CONVERT}/convert_ncbi.tsv")
    p = run_build(
        tmp_path, "conv_ncbi_gtdb", input=None, input_file=inp,
        input_target="sequence", skip_genome_size=True, level="species",
        taxonomy="ncbi",
        taxonomy_files=[f"{CONVERT}/convert_nodes.dmp"],
        convert_taxonomy="gtdb-226",
        convert_taxonomy_files=[f"{CONVERT}/bac120_taxonomy_r226.tsv.gz"],
        convert_gtdb_files=[f"{CONVERT}/226_acc_rep_lin_ncbi.tsv.gz"],
    )
    res = sanity(p, skipped_targets=True)
    assert sorted(res["target"]["target"]) == sorted([
        "s__Neisseria meningitidis",
        "s__Aquabacterium_A sp001770815",
        "s__Aquabacterium_A sp002198735",
    ])


def test_convert_taxonomy_ncbi_ncbi(tmp_path):
    """ncbi -> ncbi-latest with --level class (re-resolve on new taxdump)."""
    inp = _convert_input(tmp_path, f"{CONVERT}/convert_ncbi.tsv")
    p = run_build(
        tmp_path, "conv_ncbi_ncbi", input=None, input_file=inp,
        input_target="sequence", skip_genome_size=True, level="class",
        taxonomy="ncbi",
        taxonomy_files=[f"{CONVERT}/convert_nodes.dmp"],
        convert_taxonomy="ncbi-latest",
        convert_taxonomy_files=[f"{CONVERT}/convert_nodes.dmp"],
    )
    res = sanity(p)
    tax = res["tax"]
    for t in res["target"]["target"]:
        assert tax.rank(t) == "class"


def test_classify_binning_preset():
    """--binning preset (reference config.py set_defaults:1263-1267)."""
    from ganon_tpu.config import Config

    cfg = Config("classify", db_prefix=["x"], single_reads=["r.fq"],
                 binning=True)
    cfg.validate()
    assert cfg.rel_cutoff == [0.25]
    assert cfg.rel_filter == [0]
    assert cfg.min_count == 0
    assert cfg.report_type == "reads"
