"""NCBI E-utilities client: sequence accession -> length/taxid/assembly.

Native Python equivalent of the reference's batch e-utils driver
(scripts/ganon-get-seq-info.sh:1-330 driven by tax_util.run_eutils:555-621):
batches of 200 accessions, 3 attempts with linear backoff, esummary-first
with efetch fallback for length+taxid, elink+esummary for the linked
assembly accession/name, ``na`` for entries that could not be resolved,
output strictly in input order.

The endpoint is overridable (``eutils_url`` env or argument) so tests can
run against a local stub server; an NCBI API key is appended when given.
"""

from __future__ import annotations

import os
import re
import time
import urllib.parse
import urllib.request

import pandas as pd

from ganon_tpu.util import print_log

EUTILS_URL = "https://eutils.ncbi.nlm.nih.gov/entrez/eutils"
BATCH = 200
ATTEMPTS = 3


class EUtils:
    def __init__(self, base_url: str | None = None, api_key: str = "",
                 batch: int = BATCH, attempts: int = ATTEMPTS,
                 quiet: bool = True):
        self.base_url = (base_url or os.environ.get("eutils_url")
                         or EUTILS_URL).rstrip("/")
        self.api_key = api_key or os.environ.get("ncbi_api_key", "")
        self.batch = batch
        self.attempts = attempts
        self.quiet = quiet

    # -- raw requests ------------------------------------------------------
    def _get(self, endpoint: str, params: dict) -> str:
        if self.api_key:
            params = dict(params, api_key=self.api_key)
        url = f"{self.base_url}/{endpoint}?" + urllib.parse.urlencode(
            params, doseq=True)
        with urllib.request.urlopen(url) as r:
            return r.read().decode()

    def _retry(self, fn, check):
        """attempts x with linear backoff; returns None when exhausted
        (ganon-get-seq-info.sh:122-135 retry pattern)."""
        for i in range(1, self.attempts + 1):
            try:
                out = fn()
                if check(out):
                    return out
            except Exception:
                pass
            if i < self.attempts:
                time.sleep(i if self.base_url.startswith("https://eutils")
                           else 0)
        return None

    # -- length + taxid ----------------------------------------------------
    def length_taxid(self, accessions: list[str]) -> dict[str, tuple]:
        """{accession: (length, taxid)}; missing accessions are absent."""
        out = {}
        for start in range(0, len(accessions), self.batch):
            chunk = accessions[start:start + self.batch]
            xml = self._retry(
                lambda: self._get("esummary.fcgi", {
                    "db": "nuccore", "id": ",".join(chunk)}),
                lambda x: 'Name="AccessionVersion"' in x,
            )
            got = {}
            if xml:
                accs = re.findall(
                    r'Name="AccessionVersion" Type="String">([^<]+)', xml)
                lens = re.findall(r'Name="Length" Type="Integer">([^<]+)', xml)
                taxs = re.findall(r'Name="TaxId" Type="Integer">([^<]+)', xml)
                got = dict(zip(accs, zip(lens, taxs)))
            missing = [a for a in chunk if a not in got]
            if missing:
                xml = self._retry(
                    lambda: self._get("efetch.fcgi", {
                        "db": "nuccore", "rettype": "fasta",
                        "retmode": "xml", "id": ",".join(missing)}),
                    lambda x: "<TSeq_accver>" in x,
                )
                if xml:
                    accs = re.findall(r"<TSeq_accver>([^<]+)", xml)
                    lens = re.findall(r"<TSeq_length>([^<]+)", xml)
                    taxs = re.findall(r"<TSeq_taxid>([^<]+)", xml)
                    got.update(dict(zip(accs, zip(lens, taxs))))
            out.update(got)
        return out

    # -- linked assembly ----------------------------------------------------
    def assembly_info(self, accessions: list[str]) -> dict[str, tuple]:
        """{accession: (assembly_accession, assembly_name)}."""
        out = {}
        for start in range(0, len(accessions), self.batch):
            chunk = accessions[start:start + self.batch]
            xml = self._retry(
                lambda: self._get("elink.fcgi", {
                    "dbfrom": "nuccore", "db": "assembly",
                    "linkname": "nuccore_assembly", "id": chunk}),
                lambda x: "<LinkSet>" in x,
            )
            if not xml:
                continue
            # one <LinkSet> per &id=, in input order
            linksets = re.findall(r"<LinkSet>(.*?)</LinkSet>", xml, re.S)
            acc_uid = {}
            for acc, ls in zip(chunk, linksets):
                m = re.search(
                    r"<LinkName>nuccore_assembly</LinkName>\s*<Link>\s*"
                    r"<Id>(\d+)</Id>", ls)
                if m and "ERROR" not in ls:
                    acc_uid[acc] = m.group(1)
            if not acc_uid:
                continue
            xml = self._retry(
                lambda: self._get("esummary.fcgi", {
                    "db": "assembly",
                    "id": ",".join(sorted(set(acc_uid.values())))}),
                lambda x: "DocumentSummary uid=" in x,
            )
            if not xml:
                continue
            uid_info = {}
            for doc in re.findall(
                    r'DocumentSummary uid="(\d+)"(.*?)</DocumentSummary>',
                    xml, re.S):
                uid, body = doc
                cur = re.search(r"<AssemblyAccession>([^<]+)", body)
                # always prefer the latest assembly accession when present
                # (ganon-get-seq-info.sh:247-252)
                latest = re.search(r"<LatestAccession>([^<]+)", body)
                asm_acc = (latest or cur).group(1) if (latest or cur) else None
                name = re.search(r"<Organism>([^<]+)", body)
                uid_info[uid] = (asm_acc, name.group(1) if name else None)
            for acc, uid in acc_uid.items():
                if uid in uid_info:
                    out[acc] = uid_info[uid]
        return out


def run_eutils(info, build_output_folder: str, skip_taxid: bool = False,
               level: str = "", base_url: str | None = None,
               quiet: bool = True) -> pd.DataFrame:
    """Reference tax_util.run_eutils equivalent: a DataFrame indexed by
    target with [node] and, for level=assembly, specialization(+name);
    unresolved entries get NaN (the 'na' contract)."""
    targets = info.index.tolist()
    client = EUtils(base_url=base_url, quiet=quiet)

    cols = {}
    if not skip_taxid:
        lt = client.length_taxid(targets)
        cols["node"] = [lt.get(t, (None, None))[1] for t in targets]
        missing = [t for t in targets if t not in lt]
        if missing:
            print_log(
                f" - failed to get taxid/length for {len(missing)} "
                "accessions", quiet)
    if level == "assembly":
        ai = client.assembly_info(targets)
        cols["specialization"] = [ai.get(t, (None, None))[0] for t in targets]
        cols["specialization_name"] = [
            ai.get(t, (None, None))[1] for t in targets]
    return pd.DataFrame(cols, index=pd.Index(targets, name="target"),
                        dtype=object)
