"""Compute (and check) the registry recording-window rotation.

The grading driver records the FIRST ~50 ``queries()`` entries each
round, so the dict order IS the recording window. Rotation policy
(r9 verdict, standing): entries whose driver evidence is OLDEST on
current code lead, then brand-new queries, then the rest
stalest-first; nothing may go two rounds past the cap.

Usage:
  python tools/window_rotation.py            # report evidence ages +
                                             # the order the NEXT round
                                             # should use
  python tools/window_rotation.py --check    # exit 1 if the current
                                             # queries() order does not
                                             # lead with the stalest
                                             # evidence block

The report prints the proposed key order; apply it by reordering the
``queries()`` dict (the oracles dict needs no reorder — it is keyed).
"""

from __future__ import annotations

import glob
import json
import re
import sys


def evidence_latest() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        rnd = int(m.group(1))
        for name in json.load(open(path)):
            latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    sys.path.insert(0, ".")
    import __spark_entry__ as e

    names = list(e.queries())
    latest = evidence_latest()
    new = [n for n in names if n not in latest]  # no evidence yet
    aged = sorted(
        (n for n in names if n in latest),
        key=lambda n: (latest[n], names.index(n)),
    )
    stalest = latest[aged[0]] if aged else None
    lead = [n for n in aged if latest[n] == stalest]
    order = lead + new + [n for n in aged if latest[n] != stalest]

    from collections import Counter

    ages = Counter(latest[n] for n in aged)
    print(f"registry: {len(names)} entries; evidence ages: "
          f"{dict(sorted(ages.items()))}; no-evidence (new): {len(new)}")
    print(f"stalest block: r{stalest} x{len(lead)}; window head "
          f"(first 50 of proposed order):")
    for i, n in enumerate(order[:50]):
        tag = "NEW" if n in new else f"r{latest[n]}"
        print(f"  {i + 1:3d}. {n} [{tag}]")
    if len(lead) + len(new) > 50:
        print(f"WARNING: stalest block + new rows = "
              f"{len(lead) + len(new)} > 50 — some will miss the window")

    if "--check" in sys.argv:
        head = names[: len(lead)]
        ok = set(head) >= set(lead) or all(
            n in new or latest.get(n) == stalest for n in names[:50]
        )
        if not ok:
            print("CHECK FAILED: current queries() order does not lead "
                  "with the stalest-evidence block")
            sys.exit(1)
        print("CHECK OK: window leads with stalest evidence + new rows")


if __name__ == "__main__":
    main()
