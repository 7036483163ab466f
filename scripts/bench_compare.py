"""Compare two bench per-query records (BENCH_QUERIES.json format).

The round-6 drift attribution (SCALE.md) was assembled by hand from
ad-hoc JSON slicing; this makes it one command:

    python scripts/bench_compare.py OLD.json NEW.json [top_n]

Prints the common-subset totals (the drift-tracking number), the
added/removed query sets' totals, and the top movers — exactly the
decomposition a round-over-round regression question needs.  Reads
files only; never starts Spark.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        rec = json.loads(f.read().strip().splitlines()[0])
    return rec["queries"]


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    s_old = sum(old[q] for q in common)
    s_new = sum(new[q] for q in common)
    print(
        json.dumps(
            {
                "common_n": len(common),
                "common_old_sec": round(s_old, 2),
                "common_new_sec": round(s_new, 2),
                "common_ratio": round(s_new / s_old, 3) if s_old else None,
                "added_n": len(added),
                "added_sec": round(sum(new[q] for q in added), 2),
                "removed_n": len(removed),
                "removed_sec": round(sum(old[q] for q in removed), 2),
            }
        )
    )
    movers = sorted(
        ((new[q] - old[q], q) for q in common), key=lambda t: -abs(t[0])
    )[:top_n]
    for d, q in movers:
        print(f"{d:+8.3f}  {q}  old={old[q]:.3f} new={new[q]:.3f}")


if __name__ == "__main__":
    main()
