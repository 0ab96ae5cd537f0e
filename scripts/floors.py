#!/usr/bin/env python3
"""Per-round bench FLOOR table (VERDICT r13 "What's wrong" #1).

The 3-run 440-key board's total-of-medians moves +-15% between runs of
IDENTICAL code (machine load), so round-over-round claims must quote
per-key FLOORS measured in isolation: this script takes the top-N
median keys from the full board's bench_full.json, re-benches exactly
those keys at SPARK_GRAFT_BENCH_RUNS=10 in one isolated Bench run, and
writes the floors to bench_floors.json plus a markdown table on stdout
(paste into SCALE.md with the round number). The full-board
bench_full.json is preserved (Bench overwrites it under a key filter;
we restore it).

Usage: python3 scripts/floors.py [topN=20] [extraKey ...]

Extra positional args force-include named keys in the floor set (for
keys the judge flagged that are outside the top-N — VERDICT r15 #9).
"""
import json, os, shutil, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FULL = os.path.join(REPO, "bench_full.json")
OUT = os.path.join(REPO, "bench_floors.json")

def main():
    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    extra = [k for k in sys.argv[2:]]
    with open(FULL) as f:
        board = json.load(f)
    qs = {k: v for k, v in board["queries"].items() if "median" in v}
    top = sorted(qs.items(), key=lambda kv: -kv[1]["median"])[:top_n]
    keys = [k for k, _ in top]
    forced = [k for k in extra if k not in keys]
    if forced:
        print(f"# force-included keys: {forced}")
        keys += forced
    # Blind-spot rule (VERDICT r14 #5): a one-run load spike inflates
    # a 3-run median without putting the key in the top-N — any key
    # whose board median exceeds 2x its own board best is
    # spike-suspect and joins the floor set for this round.
    spiky = [k for k, v in qs.items()
             if k not in keys and "best" in v and v["best"] > 0
             and v["median"] > 2 * v["best"]]
    if spiky:
        print(f"# spike-suspect keys added: {sorted(spiky)}")
        keys += sorted(spiky)
    backup = FULL + ".board"
    shutil.copy(FULL, backup)
    try:
        env = dict(os.environ,
                   SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
                   SPARK_GRAFT_BENCH_KEYS=",".join(keys),
                   SPARK_GRAFT_BENCH_RUNS="10")
        subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        with open(FULL) as f:
            iso = json.load(f)
    finally:
        shutil.move(backup, FULL)
    floors = {}
    for k in sorted(iso["queries"]):
        v = iso["queries"][k]
        if "best" in v:
            floors[k] = {"floor": v["best"], "median10": v["median"],
                         "board_median": qs.get(k, {}).get("median"),
                         "board_best": qs.get(k, {}).get("best")}
    with open(OUT, "w") as f:
        json.dump({"runs_per_key": 10, "sf": "sf0.1",
                   "source_board": board.get("value"),
                   "floors": floors}, f, indent=1)
    print("| key | floor (best of 10, isolated) | 10-run median | board median |")
    print("|---|---|---|---|")
    for k, v in sorted(floors.items(), key=lambda kv: -kv[1]["floor"]):
        print(f"| `{k}` | {v['floor']:.3f} | {v['median10']:.3f} "
              f"| {v['board_median']:.3f} |")

if __name__ == "__main__":
    main()
