"""EM reassignment of multi-matching reads.

Functional equivalent of the reference EM reassigner
(``/root/reference/src/ganon/reassign.py``): seeds per-target
probabilities with unique-match counts, iteratively reassigns every
multi-match read to its highest-probability target (ties -> first match),
rewrites ``.one`` (unique passthrough + winners) and ``.rep`` (lca column
becomes reassigned - unique).
"""

from __future__ import annotations

import os
import pathlib
import sys
from dataclasses import dataclass, field


@dataclass
class ReassignConfig:
    input_prefix: list = field(default_factory=list)
    output_prefix: str = ""
    max_iter: int = 10
    threshold: float = 0.0
    remove_all: bool = False
    skip_one: bool = False
    skip_rep: bool = False
    quiet: bool = True
    verbose: bool = False


def find_rep_files(prefix: str):
    """All .rep files for a prefix (exact file or glob prefix*.rep)."""
    import glob

    if os.path.isfile(prefix + ".rep"):
        return [prefix + ".rep"]
    return sorted(glob.glob(prefix + "*.rep"))


def get_top_match(matches, prob):
    """Highest-probability target; all-zero prob -> first match."""
    target, kcount = matches[0]
    max_p = 0.0
    for m, k in matches:
        if prob[m] > max_p:
            max_p = prob[m]
            target, kcount = m, k
    return target, kcount


def reassign(cfg: ReassignConfig) -> bool:
    rep_files = []
    for ip in cfg.input_prefix:
        rep_files.extend(find_rep_files(ip))
    if not rep_files:
        raise ValueError("no .rep files found for --input-prefix")

    for rep_file in rep_files:
        p = pathlib.Path(rep_file)
        rep_prefix = str(pathlib.Path(p.parent, p.stem))
        if cfg.output_prefix:
            out_prefix = (
                cfg.output_prefix
                if len(rep_files) == 1
                else cfg.output_prefix + str(p.stem)
            )
        else:
            out_prefix = rep_prefix
        rep_file_out = "" if cfg.skip_rep else out_prefix + ".rep"

        # discover per-hierarchy .all files
        all_files: dict[str, str] = {}
        rep_info = []
        with open(rep_file) as f:
            for line in f:
                if line[0] != "#":
                    all_files[line.split("\t")[0]] = ""
                else:
                    rep_info.append(line.rstrip("\n"))
        for h in list(all_files.keys()):
            if os.path.isfile(rep_prefix + "." + h + ".all"):
                all_files[h] = rep_prefix + "." + h + ".all"
            elif os.path.isfile(rep_prefix + ".all"):
                all_files = {"": rep_prefix + ".all"}
                break
            else:
                raise FileNotFoundError(
                    f"no matching .all files for {rep_prefix} [{h}]"
                )

        new_rep = []
        for hierarchy, af in all_files.items():
            targets: dict[str, int] = {}
            read_matches: dict[str, list[tuple[int, int]]] = {}
            initial_weight: dict[int, int] = {}
            with open(af) as f:
                for line in f:
                    readid, target, kcount = line.rstrip("\n").split("\t")
                    tid = targets.setdefault(target, len(targets))
                    read_matches.setdefault(readid, []).append(
                        (tid, int(kcount))
                    )
                    initial_weight.setdefault(tid, 0)

            total_weight = len(read_matches)
            total_initial_weight = 0
            for matches in read_matches.values():
                if len(matches) == 1:
                    total_initial_weight += 1
                    initial_weight[matches[0][0]] += 1
            if total_initial_weight == 0:
                total_initial_weight = 1
            prob = {
                t: u / total_initial_weight for t, u in initial_weight.items()
            }

            em_ite = 0
            while True:
                reassigned = dict(initial_weight)
                for matches in read_matches.values():
                    if len(matches) > 1:
                        t, _ = get_top_match(matches, prob)
                        reassigned[t] += 1
                diff = 0.0
                for t, count in reassigned.items():
                    new_prob = count / total_weight if total_weight else 0
                    diff += abs(prob[t] - new_prob)
                    prob[t] = new_prob
                if diff <= cfg.threshold:
                    break
                if cfg.max_iter > 0 and em_ite == cfg.max_iter - 1:
                    break
                em_ite += 1

            if not cfg.skip_one:
                one_out = (
                    out_prefix + ".one"
                    if len(all_files) == 1
                    else out_prefix + "." + hierarchy + ".one"
                )
                targets_rev = {v: k for k, v in targets.items()}
                with open(one_out, "w") as f:
                    for readid, matches in read_matches.items():
                        if len(matches) == 1:
                            t, k = matches[0]
                        else:
                            t, k = get_top_match(matches, prob)
                        f.write(f"{readid}\t{targets_rev[t]}\t{k}\n")

            if rep_file_out:
                with open(rep_file) as f:
                    for line in f:
                        if line[0] == "#":
                            continue
                        fields = line.rstrip("\n").split("\t")
                        h_name, target = fields[0], fields[1]
                        direct = fields[2]
                        unique = int(fields[3])
                        rank = fields[5] if len(fields) >= 6 else ""
                        name = fields[6] if len(fields) >= 7 else ""
                        if (hierarchy == "" or h_name == hierarchy) and targets.get(
                            target
                        ) in reassigned:
                            new_rep.append(
                                [
                                    h_name, target, direct, unique,
                                    reassigned[targets[target]] - unique,
                                    rank, name,
                                ]
                            )

        if rep_file_out:
            with open(rep_file_out, "w") as f:
                for row in new_rep:
                    f.write("\t".join(str(v) for v in row) + "\n")
                for info in rep_info:
                    f.write(info + "\n")

        if cfg.remove_all:
            for af in all_files.values():
                os.remove(af)
    return True
