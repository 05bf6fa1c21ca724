"""Verification-staleness ledger (VERDICT r6 #5).

Joins the current ``__spark_entry__.queries()`` registry against every
``CORRECTNESS_r*.json`` the driver has recorded and prints, for each
query, the last round it was driver-checked and whether that check was
a hash match — making rotation debt visible BEFORE a round's 50-slot
window is spent.

Usage:
    python tools/staleness.py            # full ledger, stalest first
    python tools/staleness.py --summary  # per-round counts only
    python tools/staleness.py --plan N   # suggest the next N-slot window

Exit status is 0 always: this is a report, not a gate (the gate is the
driver's own CORRECTNESS_r{N}.json).
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_history(repo_root: str) -> dict[str, dict[int, dict]]:
    """query -> {round: result-row} across all CORRECTNESS_r*.json."""
    hist: dict[str, dict[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, row in data.items():
            hist.setdefault(name, {})[rnd] = row
    return hist


def ledger(repo_root: str) -> list[dict]:
    import __spark_entry__ as E

    hist = load_history(repo_root)
    oracles = set(E.oracle_sql())
    rows = []
    for pos, name in enumerate(E.queries(), 1):
        checks = hist.get(name, {})
        # rows-only queries (no oracle_sql entry) get the driver's
        # weaker check: it records err='no_oracle' with the row count
        green_rounds = [
            r
            for r, res in checks.items()
            if res.get("hash_match")
            or (
                name not in oracles
                and res.get("spark_rows") is not None
                and res.get("err") in (None, "no_oracle")
            )
        ]
        rows.append(
            {
                "query": name,
                "position": pos,
                "mode": "oracle" if name in oracles else "rows-only",
                "last_checked": max(checks) if checks else None,
                "last_green": max(green_rounds) if green_rounds else None,
                "n_checks": len(checks),
            }
        )
    return rows


def _fmt_round(rnd: "int | None") -> str:
    # `is not None`, not truthiness: a hypothetical round 0 must print
    # as r00, not as never-checked (ADVICE r7)
    return "r%02d" % rnd if rnd is not None else "-"


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--summary", action="store_true", help="per-round counts only"
    )
    ap.add_argument(
        "--plan",
        type=int,
        metavar="N",
        help="suggest the next N-slot window (stalest first)",
    )
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rows = ledger(repo_root)
    latest = max(
        (r["last_checked"] for r in rows if r["last_checked"] is not None),
        default=0,
    )

    if args.summary:
        by_round: dict = {}
        for r in rows:
            by_round.setdefault(r["last_green"], []).append(r["query"])
        for rnd in sorted(by_round, key=lambda x: (x is not None, x)):
            label = f"r{rnd:02d}" if rnd is not None else "NEVER"
            print(f"{label}: {len(by_round[rnd])} queries")
        return

    if args.plan is not None:
        # stalest-first; never-checked queries lead, then oldest green
        plan = sorted(
            rows, key=lambda r: (r["last_green"] is not None, r["last_green"] or 0)
        )[: args.plan]
        for r in plan:
            print(
                f"{r['query']:40s} last_green="
                f"{'never' if r['last_green'] is None else 'r%02d' % r['last_green']}"
                f"  window_pos={r['position']}"
            )
        return

    print(f"{'query':40s} {'pos':>4s} {'mode':>9s} {'checked':>8s} {'green':>6s} {'n':>3s}")
    for r in sorted(
        rows, key=lambda r: (r["last_green"] is not None, r["last_green"] or 0)
    ):
        stale = (
            " <-- STALE"
            if r["last_green"] is not None and latest - r["last_green"] >= 3
            else (" <-- NEVER" if r["last_green"] is None else "")
        )
        print(
            f"{r['query']:40s} {r['position']:4d} {r['mode']:>9s} "
            f"{_fmt_round(r['last_checked']):>8s} "
            f"{_fmt_round(r['last_green']):>6s} "
            f"{r['n_checks']:3d}{stale}"
        )


if __name__ == "__main__":
    main()
