#!/usr/bin/env python
"""Regenerate the driver-window rotation data in term_spark/queries.py.

Reads every CORRECTNESS_r{NN}.json in the repo root, computes each
query's most recent green (rows_match + schema_match + hash_match)
driver round, and rewrites the block between
``# BEGIN GENERATED ROTATION DATA`` / ``# END GENERATED ROTATION DATA``
with the new ``CURRENT_ROUND`` (= newest artifact round + 1) and
``LAST_GREEN`` mapping.  The next 50-slot driver window then falls out
of ``driver_window()`` mechanically — run this once at the start of
each round, commit the diff, done.

Usage:
    python scripts/update_rotation.py            # print the diff plan
    python scripts/update_rotation.py --apply    # rewrite queries.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_PY = os.path.join(REPO, "term_spark", "queries.py")
BEGIN = "# BEGIN GENERATED ROTATION DATA (scripts/update_rotation.py)"
END = "# END GENERATED ROTATION DATA"


def load_green_history(repo: str = REPO,
                       no_oracle=None) -> tuple[dict, int]:
    """(query -> last green round, newest artifact round) from disk.

    ``hash_match: None`` (a rows-only driver row) counts as green ONLY
    for queries in NO_ORACLE — an oracle-backed query whose artifact row
    lacks a hash (e.g. a driver that skipped hashing) must NOT silently
    earn a full green and rotate out of the window; it is warned about
    instead (round-8 advice)."""
    if no_oracle is None:
        sys.path.insert(0, REPO)
        from term_spark.queries import NO_ORACLE as no_oracle
    last: dict[str, int | None] = {}
    rounds = []
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            if not (row.get("rows_match") and row.get("schema_match")):
                continue
            hm = row.get("hash_match")
            if hm is True or (hm is None and name in no_oracle):
                last[name] = max(rnd, last.get(name) or 0)
            elif hm is None:
                print(f"warn: {os.path.basename(path)}:{name} has "
                      "rows/schema green but no hash_match on an "
                      "oracle-backed query — not counted as green")
    return last, (max(rounds) if rounds else 0)


def main() -> int:
    sys.path.insert(0, REPO)
    from term_spark import queries as Q

    greens, newest = load_green_history()
    current_round = newest + 1
    registry = list(Q.QUERIES)
    unknown = sorted(set(greens) - set(registry))
    if unknown:
        print(f"note: artifacts mention unregistered queries: {unknown}")

    last_green = {name: greens.get(name) for name in registry}
    src_rounds = ", ".join(f"r{r:02d}" for r in range(1, newest + 1))
    lines = [BEGIN,
             "#: Most recent round whose CORRECTNESS_r{N}.json holds a green",
             "#: (rows_match + schema_match + hash_match) driver row for each query;",
             f"#: None = never driver-proven.  Source artifacts: {src_rounds}.",
             f"CURRENT_ROUND = {current_round}",
             "LAST_GREEN = {"]
    lines += [f'    "{name}": {last_green[name]},' for name in registry]
    lines += ["}", END]
    block = "\n".join(lines)

    with open(QUERIES_PY) as fh:
        src = fh.read()
    pattern = re.compile(re.escape(BEGIN) + ".*?" + re.escape(END), re.DOTALL)
    if not pattern.search(src):
        print("ERROR: generated-rotation markers not found in queries.py")
        return 1
    new_src = pattern.sub(block, src)

    # Report the window delta the new data produces — by calling THE
    # rule itself with candidate (LAST_GREEN, round) values (r13
    # advice: this script used to carry a verbatim replica of
    # driver_window(), which any future edit to one copy would
    # silently desynchronize).
    old_w = set(Q.driver_window(lg=Q.LAST_GREEN, current_round=current_round))
    new_w = set(Q.driver_window(lg=last_green, current_round=current_round))
    print(f"round {current_round}: window delta "
          f"(+{len(new_w - old_w)}/-{len(old_w - new_w)})")
    for q in sorted(new_w - old_w):
        print(f"  + {q}  (last green: {last_green[q]})")
    for q in sorted(old_w - new_w):
        print(f"  - {q}  (last green: {last_green[q]})")

    if "--apply" in sys.argv:
        if new_src == src:
            print("queries.py already up to date")
        else:
            with open(QUERIES_PY, "w") as fh:
                fh.write(new_src)
            print(f"rewrote {QUERIES_PY} (CURRENT_ROUND={current_round})")
    else:
        print("(dry run — pass --apply to rewrite queries.py)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
