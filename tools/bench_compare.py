#!/usr/bin/env python
"""Per-query bench regression gate: compare two bench JSONs with the
round protocol's 1.5×+0.5 s rule (suite TOTALS drift with ambient host
load — chase per-query regressions, never totals).

Accepts either a raw ``bench.py`` output line (``{"metric": ...,
"queries": {...}}``) or a driver artifact (``BENCH_r{N}.json`` with the
line under ``"parsed"``).

Usage: ``python tools/bench_compare.py OLD.json NEW.json [factor] [slack]``
Exit code 1 when any common query regresses past ``factor·old + slack``.
"""

from __future__ import annotations

import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    q = d.get("queries")
    if not isinstance(q, dict) or not q:
        raise SystemExit(f"{path}: no per-query map found")
    # bench.py's <=1900-char degradation shortens keys to their qNN
    # prefix — normalize both sides so rounds stay comparable
    out: dict[str, float] = {}
    for k, v in q.items():
        m = re.match(r"(q\d+)", k)
        out[m.group(1) if m else k] = float(v)
    return out


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load_queries(sys.argv[1]), load_queries(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    common = sorted(set(old) & set(new))
    regressed = [
        (k, old[k], new[k])
        for k in common
        if new[k] > factor * old[k] + slack
    ]
    print(
        json.dumps(
            {
                "common": len(common),
                "old_only": sorted(set(old) - set(new)),
                "new_only": sorted(set(new) - set(old)),
                "old_common_total": round(sum(old[k] for k in common), 1),
                "new_common_total": round(sum(new[k] for k in common), 1),
                "gate": f"{factor}x+{slack}s",
                "regressed": [
                    {"query": k, "old": o, "new": n}
                    for k, o, n in regressed
                ],
            },
            indent=2,
        )
    )
    if regressed:
        sys.exit(1)


if __name__ == "__main__":
    main()
