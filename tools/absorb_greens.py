"""Print the up-to-date DRIVER_GREEN_ROUND dict from CORRECTNESS_r*.json.

Round-start chore (see registry.py): after the driver writes
CORRECTNESS_r{N}.json, every newly-green query must be absorbed into
registry.DRIVER_GREEN_ROUND (the ledger guard test fails loudly until it
is). This prints the complete replacement dict — paste it over the old
one, grouped by round for readability.

Usage: python tools/absorb_greens.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        data = json.load(open(path))
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False  # rows-only checks count
            ):
                latest[name] = max(latest.get(name, 0), rnd)

    from machinelearningalgomapreduce_spark.registry import DRIVER_GREEN_ROUND

    new = set(latest) - set(DRIVER_GREEN_ROUND)
    stale = {
        n: (DRIVER_GREEN_ROUND[n], latest[n])
        for n in latest
        if n in DRIVER_GREEN_ROUND and latest[n] > DRIVER_GREEN_ROUND[n]
    }
    print(f"# newly green ({len(new)}): {sorted(new)}\n")
    print(f"# freshened ({len(stale)})\n")
    print("DRIVER_GREEN_ROUND = {")
    by_round: dict[int, list[str]] = {}
    for name, rnd in latest.items():
        by_round.setdefault(rnd, []).append(name)
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        print(f"    # latest green: round {rnd} ({len(names)})")
        line = "   "
        for name in names:
            tok = f' "{name}": {rnd},'
            if len(line) + len(tok) > 79:
                print(line)
                line = "   "
            line += tok
        if line.strip():
            print(line)
    print("}")

    # Deferred-tier upkeep (registry.DEFERRED_NEXT_WINDOW): once a
    # deferred query gains a driver green it must leave the set, or the
    # window test fails loudly.
    from machinelearningalgomapreduce_spark.registry import DEFERRED_NEXT_WINDOW

    greened = sorted(DEFERRED_NEXT_WINDOW & set(latest))
    if greened:
        print(
            f"\n# ALSO: remove these {len(greened)} now-green names from "
            f"registry.DEFERRED_NEXT_WINDOW:\n# {greened}"
        )


if __name__ == "__main__":
    main()
