"""Derive driver-evidence coverage from the CORRECTNESS_r0*.json artifacts.

The round-5 and round-6 registry comments both overstated rotation coverage
because the "which queries have driver evidence" list was hand-maintained
(round-6 verdict, "What's wrong" #1). This script computes it: a query is
*driver-proven* if any round's CORRECTNESS artifact has a green row for it
(rows+schema match, and hash match when the driver recorded one).

Usage (from the repo root):

    python tools/rotation_audit.py

Prints per-query proven rounds, the never-proven set (rotation candidates
for the next round), and which current DRIVER_ORDER entries are multi-round
stable (safe to rotate out to aux).
"""

from __future__ import annotations

import glob
import json
import re
import sys


def proven_rounds(repo: str = ".") -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    # r* not r0*: the round-10 artifact is CORRECTNESS_r10.json and the
    # old two-digit-only glob silently dropped it (round-11 audit bug —
    # every r10-proven query showed as "never proven")
    for f in sorted(glob.glob(f"{repo}/CORRECTNESS_r*.json")):
        rnd = f.rsplit("_r", 1)[1].split(".")[0]
        d = json.load(open(f))
        for name, row in d.items():
            if not isinstance(row, dict):
                continue
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            )
            if ok:
                out.setdefault(name, []).append(rnd)
    return out


def registered_names(repo: str = ".") -> set[str]:
    names: set[str] = set()
    for p in glob.glob(f"{repo}/science_datalake_spark/queries/*.py"):
        names |= {
            m.group(1)
            for m in re.finditer(r"@query\(\s*['\"]([\w\-]+)['\"]", open(p).read())
        }
    return names


def main() -> int:
    repo = sys.argv[1] if len(sys.argv) > 1 else "."
    proven = proven_rounds(repo)
    names = registered_names(repo)
    never = sorted(names - set(proven))
    sys.path.insert(0, repo)
    from science_datalake_spark.queries import DRIVER_ORDER

    from science_datalake_spark.queries import load_all, load_aux

    q, o = load_all()
    aq, ao = load_aux()
    n_reg = len(q) + len(aq)
    n_oracle = len(o) + len(ao)
    # the single source of truth the docs must cite (README "registered /
    # oracle-checked" counts)
    print(f"registered queries: {n_reg} ({len(q)} driver + {len(aq)} aux)")
    print(f"oracle-paired: {n_oracle}")
    if n_reg != len(names):
        print(f"WARNING: @query decorator scan found {len(names)} != {n_reg}")
    print(f"never driver-proven ({len(never)}): {never}")
    stable_in_driver = sorted(
        n for n in DRIVER_ORDER if len(proven.get(n, [])) >= 2
    )
    print(
        f"current driver entries with >=2 rounds of evidence "
        f"({len(stable_in_driver)}): {stable_in_driver}"
    )
    aux_single = sorted(
        n for n in names - set(DRIVER_ORDER) if len(proven.get(n, [])) == 1
    )
    print(f"aux entries with exactly 1 round of evidence ({len(aux_single)}): {aux_single}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
