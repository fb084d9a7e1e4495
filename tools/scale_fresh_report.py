"""§8.3j report: compare a fresh-entity larger-scale board against the
committed sf0.1 rolling-best anchor (tools/gen_sfbig.py data, VERDICT-r10
#5). Prints per-face ratios grouped for the SURVEY table: every face whose
big-board time exceeds RATIO_FLAG x its sf0.1 rolling best AND is over
ABS_FLOOR seconds gets a line; the rest are summarized.

The sf0.1 anchor is the per-face MINIMUM across all rounds
(BENCH_parsed.json 'best' — see §8.3h); the big board is a single
min-of-2 run in its own sidecar, so ratios carry one-run noise on top of
real scaling. Read >2x flags against the §8.3g volume classes before
calling anything a defect.

Usage: python tools/scale_fresh_report.py /tmp/bench_sf1_fresh.json
"""

from __future__ import annotations

import json
import sys

RATIO_FLAG = 2.0
ABS_FLOOR = 1.0


def main(big_json: str, anchor_json: str = "BENCH_parsed.json") -> None:
    with open(big_json) as f:
        big = json.load(f)["queries"]
    with open(anchor_json) as f:
        parsed = json.load(f)
    best = parsed.get("best") or parsed["queries"]

    rows = []
    unanchored = []
    for face, t_big in sorted(big.items()):
        t_small = best.get(face)
        if t_small is None:
            # no anchor: keep it OUT of the ratio math (counting its big
            # seconds with no small-side counterpart inflates the board
            # ratio) and report it separately instead of as a flagged face
            unanchored.append((face, t_big))
            continue
        rows.append((t_big / max(t_small, 1e-9), face, t_small, t_big))

    total_big = sum(t for _, _, _, t in rows)
    total_small = sum(s for _, _, s, _ in rows)
    print(f"faces: {len(rows)} anchored, {len(unanchored)} unanchored")
    if rows:
        print(f"board wall (anchored faces): sf0.1 best-sum {total_small:.1f}s "
              f"-> big {total_big:.1f}s ({total_big / total_small:.2f}x)")
    flagged = [r for r in rows if r[0] > RATIO_FLAG and r[3] > ABS_FLOOR]
    print(f"\nfaces >{RATIO_FLAG}x their sf0.1 rolling best and >{ABS_FLOOR}s ({len(flagged)}):")
    for ratio, face, s, b in sorted(flagged, reverse=True):
        print(f"  {face:28s} {s:7.2f}s -> {b:8.2f}s  {ratio:6.1f}x")
    under = sum(1 for r in rows if r[0] <= RATIO_FLAG)
    sub1 = sum(1 for r in rows if r[3] <= 1.0)
    print(f"\n{under} faces <= {RATIO_FLAG}x; {sub1} faces <= 1s on the big board")
    if unanchored:
        print("\nunanchored (no sf0.1 rolling best yet):")
        for face, b in unanchored:
            print(f"  {face:28s} big {b:8.2f}s")


if __name__ == "__main__":
    main(*sys.argv[1:])
