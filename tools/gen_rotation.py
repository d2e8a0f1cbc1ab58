"""Mechanical driver-window rotation: emit which queries are OWED a
fresh correctness row, straight from ``CORRECTNESS_r*.json`` history.

The driver's correctness gate checks a 50-query prefix of the registry
enumeration order (``_ROTATION_TIERS`` in registry.py). The rotation
contract (VERDICT r9 onward) is: every round's window must LEAD with
the queries whose newest driver row is oldest, plus anything whose
implementation or oracle changed that round. Through r12 the owed
list was maintained by hand in registry.py's comment block; VERDICT
r12 item 7 asks for it to be computed, so a window can't silently
drop a query.

Output:

- ``owed``: every query whose newest driver row is the stale minimum
  across all registered queries (these MUST head the next window);
- ``fill``: the next-stalest cohort, ranked by how old their
  *previous* row is (a query whose only row is the newest round ranks
  most-owed within the cohort), sized to pad the window to 50 after
  the owed block and any --changed names;
- ``never``: registered queries with NO driver row yet (always owed).

Usage:
    python tools/gen_rotation.py [--changed name1,name2] [--window 50]

Exit status is 0; the output is advisory prose for registry.py's
rotation block plus a machine block (JSON on the last line) that
REGISTRY.md cites.
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def history(repo: Path) -> dict[str, list[int]]:
    """query -> sorted list of rounds it received a driver row."""
    hist: dict[str, list[int]] = {}
    for f in sorted(glob.glob(str(repo / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", Path(f).name).group(1))
        try:
            rows = json.load(open(f))
        except (json.JSONDecodeError, OSError):
            continue
        for q in rows:
            hist.setdefault(q, []).append(rnd)
    return {q: sorted(set(rs)) for q, rs in hist.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated query names whose code/oracle changed this "
        "round (they are owed a row regardless of history)",
    )
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    repo = Path(__file__).resolve().parent.parent
    hist = history(repo)

    from stream_processing_test_spark.registry import all_queries

    registered = list(all_queries())
    changed = [c for c in args.changed.split(",") if c]
    for c in changed:
        if c not in registered:
            print(f"WARNING: --changed {c!r} is not a registered query")

    never = [q for q in registered if q not in hist]
    newest = {q: hist[q][-1] for q in registered if q in hist}
    stale_min = min(newest.values()) if newest else 0
    owed = sorted(q for q, n in newest.items() if n == stale_min)

    # Fill: next-stalest cohort(s), each ranked by previous-row age
    # (no previous row -> rank 0 = most owed), then name for stability.
    lead = list(dict.fromkeys(changed + never + owed))
    need = max(0, args.window - len(lead))
    fill: list[str] = []
    cohorts = sorted(set(newest.values()) - {stale_min})
    for rnd in cohorts:
        cohort = [q for q, n in newest.items() if n == rnd and q not in lead]
        cohort.sort(key=lambda q: (hist[q][-2] if len(hist[q]) > 1 else 0, q))
        take = cohort[: need - len(fill)]
        fill.extend(take)
        if len(fill) >= need:
            break

    print(f"# rotation for the NEXT round (window={args.window})")
    print(f"# stale minimum: newest row = r{stale_min} -> {len(owed)} owed")
    if never:
        print(f"# never-checked (always owed): {', '.join(never)}")
    if changed:
        print(f"# changed this round (owed by contract): {', '.join(changed)}")
    print(f"# owed ({len(owed)}):")
    for q in owed:
        print(f"    {q!r}: 0,")
    print(f"# fill to {args.window} ({len(fill)}), ranked by prior-row age:")
    for q in fill:
        prev = hist[q][-2] if len(hist[q]) > 1 else None
        print(f"    {q!r}: 1,  # newest r{newest[q]}, prior r{prev}")
    print(
        json.dumps(
            {
                "stale_min_round": stale_min,
                "owed": owed,
                "never": never,
                "changed": changed,
                "fill": fill,
                "window": args.window,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
