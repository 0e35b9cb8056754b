"""E-utils client against a local stub server (the reference drives the
real NCBI endpoints via scripts/ganon-get-seq-info.sh; offline we emulate
the endpoint contract: esummary/efetch/elink XML shapes, batch + retry,
'na' for unresolved entries, input-order output)."""

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import urlparse, parse_qs

import pandas as pd
import pytest

from ganon_tpu.eutils import EUtils, run_eutils

# accession -> (length, taxid, assembly uid, assembly acc, organism)
SEQS = {
    "NC_001.1": (1000, "11", "101", "GCF_000000001.1", "OrgA"),
    "NC_002.1": (2000, "12", "102", "GCF_000000002.1", "OrgB"),
    # resolvable only via efetch (esummary omits it)
    "NC_003.1": (3000, "21", None, None, None),
}


class Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        url = urlparse(self.path)
        q = parse_qs(url.query)
        path = url.path
        body = ""
        if path.endswith("esummary.fcgi") and q.get("db") == ["nuccore"]:
            docs = []
            for acc in q["id"][0].split(","):
                if acc in SEQS and SEQS[acc][2] is not None:
                    ln, tx = SEQS[acc][0], SEQS[acc][1]
                    docs.append(
                        f'<DocSum><Item Name="AccessionVersion" '
                        f'Type="String">{acc}</Item>'
                        f'<Item Name="Length" Type="Integer">{ln}</Item>'
                        f'<Item Name="TaxId" Type="Integer">{tx}</Item>'
                        f"</DocSum>"
                    )
            body = "<eSummaryResult>" + "".join(docs) + "</eSummaryResult>"
        elif path.endswith("efetch.fcgi"):
            seqs = []
            for acc in q["id"][0].split(","):
                if acc in SEQS:
                    ln, tx = SEQS[acc][0], SEQS[acc][1]
                    seqs.append(
                        f"<TSeq><TSeq_accver>{acc}</TSeq_accver>"
                        f"<TSeq_taxid>{tx}</TSeq_taxid>"
                        f"<TSeq_length>{ln}</TSeq_length></TSeq>"
                    )
            body = "<TSeqSet>" + "".join(seqs) + "</TSeqSet>"
        elif path.endswith("elink.fcgi"):
            sets = []
            for acc in q["id"]:
                uid = SEQS.get(acc, (0, 0, None))[2]
                link = (
                    f"<LinkSetDb><LinkName>nuccore_assembly</LinkName>"
                    f"<Link><Id>{uid}</Id></Link></LinkSetDb>"
                    if uid
                    else ""
                )
                sets.append(f"<LinkSet>{link}</LinkSet>")
            body = "<eLinkResult>" + "".join(sets) + "</eLinkResult>"
        elif path.endswith("esummary.fcgi") and q.get("db") == ["assembly"]:
            docs = []
            for uid in q["id"][0].split(","):
                for acc, (ln, tx, u, aacc, org) in SEQS.items():
                    if u == uid:
                        docs.append(
                            f'<DocumentSummary uid="{uid}">'
                            f"<AssemblyAccession>{aacc}</AssemblyAccession>"
                            f"<Organism>{org}</Organism>"
                            f"</DocumentSummary>"
                        )
                        break
            body = "<result>" + "".join(docs) + "</result>"
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture(scope="module")
def stub_url():
    server = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}"
    server.shutdown()


def test_length_taxid_with_efetch_fallback(stub_url):
    c = EUtils(base_url=stub_url)
    lt = c.length_taxid(["NC_001.1", "NC_003.1", "NC_404.1"])
    assert lt["NC_001.1"] == ("1000", "11")
    assert lt["NC_003.1"] == ("3000", "21")  # via efetch fallback
    assert "NC_404.1" not in lt


def test_assembly_info(stub_url):
    c = EUtils(base_url=stub_url)
    ai = c.assembly_info(["NC_001.1", "NC_002.1", "NC_003.1"])
    assert ai["NC_001.1"] == ("GCF_000000001.1", "OrgA")
    assert ai["NC_002.1"] == ("GCF_000000002.1", "OrgB")
    assert "NC_003.1" not in ai  # no linked assembly


def test_run_eutils_dataframe_contract(stub_url, tmp_path):
    info = pd.DataFrame(
        {"node": [None] * 3, "specialization": [None] * 3,
         "specialization_name": [None] * 3},
        index=pd.Index(["NC_001.1", "NC_003.1", "NC_404.1"], name="target"),
        dtype=object,
    )
    res = run_eutils(info, str(tmp_path), skip_taxid=False, level="assembly",
                     base_url=stub_url)
    assert list(res.index) == ["NC_001.1", "NC_003.1", "NC_404.1"]
    assert res.loc["NC_001.1", "node"] == "11"
    assert res.loc["NC_001.1", "specialization"] == "GCF_000000001.1"
    assert res.loc["NC_003.1", "node"] == "21"
    assert pd.isna(res.loc["NC_003.1", "specialization"])
    assert pd.isna(res.loc["NC_404.1", "node"])


def test_build_sequence_target_via_eutils(stub_url, tmp_path, monkeypatch):
    """build-custom --input-target sequence resolves taxids through the
    (stubbed) e-utils endpoint end-to-end."""
    monkeypatch.setenv("eutils_url", stub_url)
    import random

    from ganon_tpu.cli import main
    from ganon_tpu.config import Config

    rng = random.Random(3)
    fasta = tmp_path / "refs.fna"
    with open(fasta, "w") as f:
        for acc in ("NC_001.1", "NC_002.1", "NC_003.1"):
            seq = "".join(rng.choice("ACGT") for _ in range(2000))
            f.write(f">{acc} desc\n{seq}\n")
    nodes = tmp_path / "nodes.dmp"
    names = tmp_path / "names.dmp"
    with open(nodes, "w") as f:
        for n, p, r in [("1", "1", "no rank"), ("10", "1", "genus"),
                        ("20", "1", "genus"), ("11", "10", "species"),
                        ("12", "10", "species"), ("21", "20", "species")]:
            f.write(f"{n}\t|\t{p}\t|\t{r}\t|\n")
    with open(names, "w") as f:
        for n in ("1", "10", "20", "11", "12", "21"):
            f.write(f"{n}\t|\tname{n}\t|\t\t|\tscientific name\t|\n")

    cfg = Config(
        "build-custom",
        input=[str(fasta)],
        input_extension="fna",
        input_target="sequence",
        db_prefix=str(tmp_path / "db"),
        taxonomy="ncbi",
        taxonomy_files=[str(nodes), str(names)],
        skip_genome_size=True,
        quiet=True,
    )
    assert main(cfg=cfg)
    with open(str(tmp_path / "db") + ".tax") as f:
        taxa = {line.split("\t")[0] for line in f}
    assert {"11", "12", "21"} <= taxa
