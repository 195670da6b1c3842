"""Driver-window curation helper: for every catalog gate, the NEWEST
round with a green CORRECTNESS row (and any gate with none at all).

Round 8+ curation rule (queries_catalog._DRIVER_PRIORITY): changed
gates first, then new gates, then the OLDEST-row re-confirmations.
This prints the oldest-first list so next round's re-confirmation
slots can be filled mechanically.

Usage: python tools/window_age.py [N]   (default: 30 oldest)
No Spark needed — reads the CORRECTNESS_r*.json archives plus the
catalog's registered names via a lightweight import.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_green_round() -> dict[str, int]:
    """gate -> newest round number whose archive has a passing row."""
    newest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        data = json.load(open(path))
        for name, row in data.items():
            ok = bool(row.get("rows_match")) and row.get(
                "hash_match", True
            ) is not False and not row.get("err")
            if ok:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def catalog_names() -> list[str]:
    """Registered gate names WITHOUT building a SparkSession: scan the
    catalog source for @query("name", ...) registrations."""
    src = open(os.path.join(ROOT, "lab3_spark", "queries_catalog.py")).read()
    return re.findall(r'@query\(\s*\n?\s*"([a-z0-9_]+)"', src)


def main() -> None:
    top = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    newest = newest_green_round()
    names = catalog_names()
    never = [n for n in names if n not in newest]
    aged = sorted((newest[n], n) for n in names if n in newest)
    if never:
        print(f"NEVER driver-checked ({len(never)}) — MUST head the window:")
        for n in never:
            print(f"  {n}")
    print(f"\noldest green rows (top {top} of {len(aged)}):")
    for rnd, n in aged[:top]:
        print(f"  r{rnd}  {n}")


if __name__ == "__main__":
    main()
