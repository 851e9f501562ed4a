#!/usr/bin/env python3
"""Mechanized variance-band check: BENCH json vs the BASELINE.md anchors.

Reproduces the verdict's perf table with one command:

    python3 tools/band_check.py BENCH_r08.json [BASELINE.md]

For every query in the bench reading it finds
  - the ANCHOR: the rightmost recorded dev-column number in the
    BASELINE.md query table, else the `QueryProbe median of 5 = X`
    figure from the row's Notes;
  - the FAMILY BAND: parsed from the "Variance bands" family table
    (members column), with explicit overrides for queries the prose
    assigns elsewhere and a shuffle/agg default for unlisted ones;
and prints one line per query with the ratio and an IN-BAND /
OUT-OF-BAND / FAST / NO-ANCHOR verdict, then the out-of-band summary.

Per the repo's standing rule (BASELINE.md "Variance bands"): a single
driver reading outside its band is evidence to RE-PROBE (QueryProbe >= 8
cache-cleared runs), not a regression verdict by itself.
"""
import json
import re
import sys

# family -> slow-side multiplier vs anchor (from the BASELINE.md table):
# ±30% -> 1.3x, ±50% -> 1.5x, ±2x -> 2.0x (single reading)
BAND_FACTOR = {"scan": 1.3, "shuffle": 1.5, "ann": 1.5, "fileio": 1.5, "cluster": 2.0}

# Anchors below this grade against the floor instead (VERDICT r15 №6):
# under ~0.3 s a query's wall time is dominated by per-job scheduler /
# codegen jitter, which is ADDITIVE — a ratio against a 0.15 s anchor
# flags noise, not work (q39/q56/q88 flagged on every quiet board while
# probes showed the board readings ARE the floor). The slow-side
# threshold becomes max(anchor, floor) * band. The floor is MODE-aware
# (r17): a median-of-3 reading carries the typical jitter, not the
# best-of-2 minimum, and the r17 cutover measured the old sub-floor
# class (66 sub-0.5s anchors) reading 1.32x higher under median mode
# (the 32 old sub-0.30 rows now read up to 0.43 s on quiet boards) — so
# median boards grade against 0.30 x 1.32 ~= 0.40 while best-of-2 /
# unknown-mode artifacts keep the original 0.30.
ANCHOR_FLOOR = 0.30
ANCHOR_FLOOR_MEDIAN = 0.40


def floor_for(summary):
    mode = (summary or {}).get("bench_mode", "")
    return ANCHOR_FLOOR_MEDIAN if mode.startswith("median") else ANCHOR_FLOOR

# Queries newer than the last hand-written family-table edit, plus rows
# the table's prose assigns specially. Everything else resolves from the
# parsed members lists; unlisted queries default to shuffle (±50%).
FAMILY_OVERRIDES = {
    "q97_mix_roundtrip": "cluster",  # the q94 chain runs inside the write
    "q109_attrition": "cluster",
    "q110_ann_pq": "ann",
    "q111_wordpiece_merges": "ann",
    "q119_ann_projected": "ann",
    "q120_collocations": "shuffle",
    "q121_dedup_central": "cluster",
    "q122_bool_search": "shuffle",
    "q123_waterfill_budget": "shuffle",
    "q124_bm25_indexed": "shuffle",
    "q125_ann_ivf_serve": "ann",  # artifact write inside; serve plan is ANN-shaped
    "q126_near_search": "shuffle",
    "q127_bpe_encode": "ann",  # 8-round driver-iterated trainer inside (q100's family)
    "q128_prefix_search": "shuffle",
    "q129_ann_lsh_serve": "ann",
    "q130_pack_ids": "ann",  # q127's trainer+encode runs inside
    "q131_pack_across": "ann",  # q127's trainer+encode runs inside
    "q132_cms_counts": "shuffle",
    "q133_rank_metrics": "ann",  # the q31 LSH chain + brute-force truth run inside
    "q134_wp_greedy_encode": "ann",  # wordpiece trainer + driver-iterated greedy walk inside
    "q135_bloom_decon": "shuffle",
    "q136_ann_ivf_fresh": "ann",  # the half-corpus Lloyd chain runs inside
    "q137_mmr_topk": "ann",  # brute pool + k driver-iterated selection rounds
    "q138_pca_project": "ann",  # 12 driver-iterated power rounds inside
    "q139_pca_remove": "ann",  # the q138 chain + the correction scan
    "q140_manifest": "shuffle",
    "q141_tfidf_indexed": "shuffle",
    "q142_bm25_batch": "shuffle",
    "q143_source_overlap": "shuffle",
    "q144_quality_pct": "shuffle",
    "q145_keep_top_quality": "shuffle",
    "q146_semantic_decon": "ann",
    "q147_semantic_decon_lsh": "ann",
    "q181_dp_release": "fileio",  # template-sharded write + read-back inside
    "q182_resumable_dump": "fileio",  # three dump passes of real file I/O inside
    "q185_dump_all": "fileio",  # two 3-table extraction passes inside
}

FAMILY_KEYS = [
    ("scan-shaped", "scan"),
    ("shuffle/agg", "shuffle"),
    ("ANN / IVF", "ann"),
    ("file-I/O", "fileio"),
    ("cluster family", "cluster"),
]


def parse_baseline(path):
    text = open(path).read()
    anchors, families = {}, {}
    for line in text.splitlines():
        if not line.startswith("| q"):
            continue
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        name = cells[0]
        if not re.match(r"^q\d+_", name):
            continue
        anchor = None
        # rightmost recorded numeric column (Notes is the final cell)
        for c in reversed(cells[1:-1]):
            if re.match(r"^\d+(\.\d+)?$", c):
                anchor = float(c)
                break
        if anchor is None:
            # prose re-anchors: "QueryProbe median of N = X" with any N
            # (q109's "median of 7" silently escaped the old "of 5"-only
            # pattern and a 4-second query went ungraded — VERDICT r15 №3)
            m = re.search(r"median of \d+ = (\d+(?:\.\d+)?)", cells[-1])
            if m:
                anchor = float(m.group(1))
        if anchor is None:
            m = re.search(r"paired-run min = (\d+(?:\.\d+)?)", cells[-1])
            if m:
                anchor = float(m.group(1))
        if anchor is not None:
            anchors[name] = anchor
    for line in text.splitlines():
        if not line.startswith("|"):
            continue
        for key, fam in FAMILY_KEYS:
            if line.strip("| ").startswith(key):
                members = re.findall(r"q\d+(?:–q\d+)?", line.split("|")[2])
                for mspec in members:
                    if "–" in mspec:
                        lo, hi = (int(x[1:]) for x in mspec.split("–"))
                        for i in range(lo, hi + 1):
                            families[i] = fam
                    else:
                        families[int(mspec[1:])] = fam
    return anchors, families


def parse_summary(hay):
    """The trailing `"summary":{...}` block Bench emits at the END of its
    line (VERDICT r15 №8) — it survives the driver's tail truncation even
    when the leading headline does not, and since r17 names the bench
    MODE that produced the board (median_of_N vs best_of_2), which this
    checker must report so a median board is never graded as if it were
    a single-run one (VERDICT r16 №3/№6)."""
    m = re.search(r'"summary":(\{[^{}]*\})', hay)
    if not m:
        return None
    try:
        return json.loads(m.group(1))
    except json.JSONDecodeError:
        return None


def load_bench(path):
    """Returns (queries, summary_or_None)."""
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        return d["queries"], d.get("summary") or parse_summary(raw)
    # driver wrapper: the JSON line is embedded in a "tail" string
    hay = d.get("tail", raw) if isinstance(d, dict) else raw
    summary = parse_summary(hay)
    m = re.search(r'\{"metric":.*\}', hay)
    if m:
        return json.loads(m.group(0))["queries"], summary
    # driver tails are sometimes truncated mid-line (the FRONT is cut):
    # scrape the per-query pairs directly (the qNN_name keys only occur
    # in the queries map); the summary block still grades the full board
    pairs = re.findall(r'"(q\d+_\w+)":(\d+(?:\.\d+)?)', hay)
    if not pairs:
        sys.exit(f"no bench JSON line found in {path}")
    print(f"[band_check] note: {path} truncated — scraped "
          f"{len(pairs)} per-query readings from the tail\n")
    return {k: float(v) for k, v in pairs}, summary


def selftest(baseline_path="BASELINE.md"):
    """Every anchor format BASELINE.md actually uses must parse — a prose
    re-anchor that escapes the parser silently ungrades a query. Two
    layers: a fixture pins the known formats, and the LIVE baseline is
    swept so a NEW prose format escaping the parser fails here instead of
    silently grading NO-ANCHOR (the exact VERDICT r15 №3 failure)."""
    import os
    import tempfile
    rows = "\n".join([
        "| q01_numeric | — | 1.50 | 2.00 | notes |",
        "| q02_median5 | — | — | — | old anchor 9; QueryProbe median of 5 = 3.25 (min 3.0) |",
        "| q03_median7 | — | — | — | NEW anchor = idle-host QueryProbe median of 7 = 5.70 |",
        "| q04_pairedmin | — | — | — | re-anchor: paired-run min = 0.42 |",
    ])
    with tempfile.NamedTemporaryFile("w", suffix=".md", delete=False) as f:
        f.write(rows)
        path = f.name
    try:
        anchors, _ = parse_baseline(path)
    finally:
        os.unlink(path)
    want = {"q01_numeric": 2.00, "q02_median5": 3.25,
            "q03_median7": 5.70, "q04_pairedmin": 0.42}
    assert anchors == want, f"anchor parser regressed: {anchors} != {want}"
    # floor rule: a 0.15s-anchor scan reading 0.28 must NOT flag; 0.5 must
    assert 0.28 <= max(0.15, ANCHOR_FLOOR) * BAND_FACTOR["scan"] < 0.5
    # fast-side floor (ADVICE r16): a sub-floor anchor must never grade
    # FAST — mirror of the slow-side rule (0.11 on a 0.17 anchor is the
    # additive-jitter regime, not a speedup); an above-floor anchor keeps
    # the raw-ratio FAST grade
    def grades_fast(reading, anchor, factor):
        return anchor >= ANCHOR_FLOOR and reading / anchor < 1.0 / factor
    assert not grades_fast(0.11, 0.17, BAND_FACTOR["scan"]), "sub-floor anchor graded FAST"
    assert grades_fast(0.30, 0.50, BAND_FACTOR["scan"]), "real speedup must still grade FAST"
    # mode-aware floor (r17): median boards carry typical jitter, not the
    # best-of-2 minimum — they grade against the scaled floor; artifacts
    # with no summary stay on the conservative original
    assert floor_for({"bench_mode": "median_of_3"}) == ANCHOR_FLOOR_MEDIAN
    assert floor_for({"bench_mode": "best_of_2"}) == ANCHOR_FLOOR
    assert floor_for(None) == ANCHOR_FLOOR
    # a 0.43s median-mode reading on a 0.32s anchor (the measured r17
    # sub-floor class ceiling) must NOT flag; it would have under 0.30
    assert 0.43 <= max(0.32, ANCHOR_FLOOR_MEDIAN) * BAND_FACTOR["scan"]
    assert 0.43 > max(0.32, ANCHOR_FLOOR) * BAND_FACTOR["scan"]
    # front-truncated driver artifact: the leading {"metric":...} headline
    # is cut, per-query pairs are scraped from the tail, and the trailing
    # summary block still grades the WHOLE board (VERDICT r16 №6)
    tail = ('...ncated"q90_rarity_buckets":0.761,"q91_boilerplate_segments":0.832,'
            '"errors":{},"n_failed":0,"recall_at_10":{"ann_lsh":0.88,"ann_ivf":0.86},'
            '"sf":"/root/testdata/sf0.1",'
            '"summary":{"total_sec":188.402,"n_queries":187,"n_ok":187,"n_failed":0,'
            '"bench_mode":"median_of_3","reps":3}}')
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        f.write(json.dumps({"parsed": None, "tail": tail}))
        tpath = f.name
    try:
        qs, summ = load_bench(tpath)
    finally:
        os.unlink(tpath)
    assert qs == {"q90_rarity_buckets": 0.761, "q91_boilerplate_segments": 0.832}, qs
    assert summ and summ["total_sec"] == 188.402 and summ["bench_mode"] == "median_of_3", summ
    # live sweep: every query row in the real baseline must yield an anchor
    text = open(baseline_path).read()
    row_names = set()
    for line in text.splitlines():
        if line.startswith("| q"):
            name = line.strip().strip("|").split("|")[0].strip()
            if re.match(r"^q\d+_\w+$", name):
                row_names.add(name)
    live_anchors, _ = parse_baseline(baseline_path)
    escaped = sorted(row_names - set(live_anchors))
    assert not escaped, f"anchor rows escaping the parser: {escaped}"
    print(f"band_check selftest OK ({len(row_names)} live rows, all anchored)")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    if sys.argv[1] == "--selftest":
        selftest()
        return
    bench_path = sys.argv[1]
    baseline_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
    anchors, families = parse_baseline(baseline_path)
    queries, summary = load_bench(bench_path)
    floor = floor_for(summary)

    rows, out_of_band, no_anchor = [], [], []
    for name in sorted(queries):
        reading = queries[name]
        qnum = int(re.match(r"q(\d+)_", name).group(1))
        fam = FAMILY_OVERRIDES.get(name) or families.get(qnum) or "shuffle"
        defaulted = name not in FAMILY_OVERRIDES and qnum not in families
        factor = BAND_FACTOR[fam]
        anchor = anchors.get(name)
        if anchor is None:
            verdict, ratio = "NO-ANCHOR", None
            no_anchor.append(name)
        else:
            ratio = reading / anchor
            if reading > max(anchor, floor) * factor:
                verdict = "OUT-OF-BAND"
                out_of_band.append((name, reading, anchor, ratio, fam, factor))
            elif anchor >= floor and ratio < 1.0 / factor:
                # FAST only grades against anchors the floor rule trusts
                # (ADVICE r16): under the floor a query's wall time is
                # additive scheduler/codegen jitter, so a "fast" ratio on
                # a 0.17s anchor is the same noise the slow side already
                # suppresses — mirror the floor rather than flag it
                verdict = "FAST"
            else:
                verdict = "IN-BAND"
        rows.append((name, reading, anchor, ratio, fam + ("*" if defaulted else ""), verdict))

    mode = (summary or {}).get("bench_mode", "unknown (no summary)")
    print(f"bench mode: {mode}; sub-anchor floor {floor:.2f}s\n")
    print(f"{'query':34} {'read':>7} {'anchor':>7} {'ratio':>6}  {'family':10} verdict")
    for name, reading, anchor, ratio, fam, verdict in rows:
        a = f"{anchor:7.3f}" if anchor is not None else "      —"
        r = f"{ratio:6.2f}" if ratio is not None else "     —"
        print(f"{name:34} {reading:7.3f} {a} {r}  {fam:10} {verdict}")
    print()
    total = sum(queries.values())
    anchored = [(n, v) for n, v in queries.items() if n in anchors]
    asum = sum(anchors[n] for n, _ in anchored)
    vsum = sum(v for _, v in anchored)
    print(f"total {total:.1f} s over {len(queries)} queries; "
          f"vs-anchor sum ratio {vsum / asum:.2f} over {len(anchored)} anchored")
    # board-total verdict from the retained summary block (VERDICT r16
    # №6): on a front-truncated driver artifact the per-query table above
    # covers only the surviving subset — the summary's total_sec still
    # grades the WHOLE board against the whole anchor table
    if summary and "total_sec" in summary:
        board_total = summary["total_sec"]
        anchor_total = sum(anchors.values())
        mode = summary.get("bench_mode", "best_of_2 (pre-r17 artifact)")
        nq = summary.get("n_queries", "?")
        nf = summary.get("n_failed", "?")
        note = ""
        if isinstance(nq, int) and nq != len(anchors):
            note = f" [board ran {nq} vs {len(anchors)} anchored rows]"
        print(f"board summary: total {board_total:.1f} s over {nq} queries "
              f"({nf} failed), mode {mode}; vs anchor-table total "
              f"{anchor_total:.1f} s = ratio {board_total / anchor_total:.2f}"
              f"{note}")
    else:
        print("board summary: none found (pre-r16 artifact or summary "
              "truncated) — subset table above is the only grading")
    if no_anchor:
        print(f"no anchor ({len(no_anchor)}): {' '.join(no_anchor)}")
    if out_of_band:
        print(f"OUT-OF-BAND ({len(out_of_band)}) — re-probe before any verdict "
              "(BASELINE.md band rule):")
        for name, reading, anchor, ratio, fam, factor in out_of_band:
            print(f"  {name}: {reading:.3f} vs {anchor:.3f} = {ratio:.2f}x "
                  f"(band {factor:.1f}x, {fam})")
        sys.exit(2)
    print("all anchored queries in band")


if __name__ == "__main__":
    main()
