#!/usr/bin/env python3
"""One-time r17 anchor re-cut: add a `r17 (med3)` column to BASELINE.md's
anchor table from quiet median-of-3 boards (VERDICT r16 №3).

    python3 tools/recut_anchors.py BENCH_JSON [BENCH_JSON2 ...] [BASELINE.md]

Each anchor is the per-query MEDIAN over the given boards of that
board's median-of-3 reading: the inner median absorbs a single stalled
rep inside a board, the outer median absorbs one noisy window across
boards. A min-of-boards envelope (the old paired-run-min precedent) was
tried first and rejected — it is consistent with best-of-2 boards, but
a MEDIAN board typically reads above a lower envelope, so every future
quiet board would carry a handful of spurious sub-second flags; the
median-of-medians is the estimator the shipped boards actually sample.
The band_check parser anchors each query at its RIGHTMOST numeric
column, so inserting the readings before the Notes cell re-anchors every
query to the new measurement mode in one pass. Idempotent guard: refuses
to run if the header already carries the column.
"""
import json
import re
import statistics
import sys


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    args = sys.argv[1:]
    baseline_path = args.pop() if args[-1].endswith(".md") else "BASELINE.md"
    boards = []
    for p in args:
        b = json.load(open(p))
        mode = b.get("bench_mode", "?")
        if mode != "median_of_3":
            sys.exit(f"refusing: {p} mode is {mode}, not median_of_3")
        boards.append(b["queries"])
    if not boards:
        sys.exit(__doc__)
    names = set().union(*[set(b) for b in boards])
    queries = {
        n: statistics.median(b[n] for b in boards if n in b) for n in names
    }

    lines = open(baseline_path).read().splitlines(keepends=False)
    out, in_table, n_set = [], False, 0
    for line in lines:
        if line.startswith("| Query |"):
            if "r17 (med3)" in line:
                sys.exit("refusing: BASELINE.md already carries the r17 (med3) column")
            cells = line.split("|")
            cells.insert(-2, " r17 (med3) ")
            out.append("|".join(cells))
            in_table = True
            continue
        if in_table and re.match(r"^\|---", line):
            cells = line.split("|")
            cells.insert(-2, "---")
            out.append("|".join(cells))
            continue
        if in_table and line.startswith("| q"):
            cells = line.split("|")
            name = cells[1].strip()
            if re.match(r"^q\d+_\w+$", name):
                v = queries.get(name)
                cells.insert(-2, f" {v:.3f} " if v is not None else " — ")
                out.append("|".join(cells))
                if v is not None:
                    n_set += 1
                continue
            out.append(line)
            continue
        if in_table and not line.startswith("|"):
            in_table = False
        out.append(line)
    open(baseline_path, "w").write("\n".join(out) + "\n")
    print(f"re-anchored {n_set} rows from {len(boards)} board(s), median of medians")


if __name__ == "__main__":
    main()
