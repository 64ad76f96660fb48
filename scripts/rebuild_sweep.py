"""Round-start helper: print the `_SWEEP_FIRST` list for the NEW round.

The driver's per-round correctness sweep covers roughly the first 50 names
of ``operators.all_queries()``; ``_SWEEP_FIRST`` in
``operators/__init__.py`` pulls exact names to the front. The right
priority each round is "queries with the FEWEST / OLDEST driver rows
first":

1. queries with NO row in ANY ``CORRECTNESS_r*.json`` (brand-new),
2. queries whose most recent row is oldest (staleness ascending),
3. everything else (most recently swept last).

Run at the start of a round, then paste the emitted list over
``_SWEEP_FIRST``:

    python scripts/rebuild_sweep.py [--limit 50]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> None:
    limit = 50
    for i, arg in enumerate(sys.argv[1:], start=1):
        if arg == "--limit":
            if i + 1 >= len(sys.argv):
                sys.exit("usage: rebuild_sweep.py [--limit N]")
            limit = int(sys.argv[i + 1])
        elif arg.startswith("--limit="):
            limit = int(arg.split("=", 1)[1])

    from datalake_on_prem_system_spark import operators

    names = list(operators.all_queries())
    last_swept: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(HERE, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name in rows:
            last_swept[name] = max(last_swept.get(name, 0), rnd)

    # never-swept first (registration order), then stalest round first
    ranked = sorted(
        names, key=lambda n: (last_swept.get(n, -1), names.index(n))
    )
    never = [n for n in ranked if n not in last_swept]
    print(f"# {len(never)} never-swept, {len(names)} total; emitting top {limit}")
    print("_SWEEP_FIRST = [")
    for n in ranked[:limit]:
        tag = "never" if n not in last_swept else f"r{last_swept[n]}"
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
