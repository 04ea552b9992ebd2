#!/usr/bin/env python3
"""Min-merge bench runs into a round anchor.

usage: tools/bench_merge.py OUT.json RUN.json [RUN.json ...]
       tools/bench_merge.py --allow-single OUT.json RUN.json

Per query takes the minimum positive timing across runs (negative =
the run errored on that query; a run missing a query contributes
nothing for it). Prints a per-run summary (total + canary
q_range_join) and the merged total.

Refuses to write an anchor from fewer than TWO parseable runs unless
--allow-single is passed: the committed protocol (verify SKILL.md) is
a min-merge of at least two runs — single runs carry 1.2-4x head/tail
debris on this host, and a silently-written one-run anchor poisons
every cross-round comparison that reads it.
"""
import json
import os
import sys


def main() -> None:
    argv = sys.argv[1:]
    allow_single = "--allow-single" in argv
    argv = [a for a in argv if a != "--allow-single"]
    out_path, runs = argv[0], argv[1:]
    # the same file passed twice (a glob/retype slip) must not count
    # as two runs — that writes a one-run anchor through the guard
    deduped = list(dict.fromkeys(os.path.realpath(r) for r in runs))
    if len(deduped) < len(runs):
        print(f"WARNING: {len(runs) - len(deduped)} duplicate run "
              "path(s) ignored")
    runs = deduped
    merged: dict[str, float] = {}
    errored: set[str] = set()  # queries seen with v <= 0 in some run
    sf = None
    n_runs = 0
    for path in runs:
        try:
            with open(path) as f:
                d = json.load(f)
        except (OSError, json.JSONDecodeError) as e:
            print(f"skip {path}: {e}")
            continue
        n_runs += 1
        qs = {k: v for k, v in d["queries"].items() if v > 0}
        errored.update(k for k, v in d["queries"].items() if v <= 0)
        sf = d.get("sf", sf)
        tot = sum(qs.values())
        canary = qs.get("q_range_join", float("nan"))
        print(f"{path}: n={len(qs)} total={tot:.1f}s canary={canary:.3f}s")
        for k, v in qs.items():
            if k not in merged or v < merged[k]:
                merged[k] = v
    # the lost-query guard below is vacuous when NOTHING parsed — all
    # runs unreadable would still write an anchor with total 0.0s,
    # the shrunken-anchor failure through the other hole
    if n_runs == 0 or not merged:
        sys.exit("ERROR: no parseable runs / no positive timings — "
                 "refusing to write an empty anchor")
    # the two-run minimum is the committed protocol; a one-run anchor
    # still carries the head/tail debris min-merging exists to cancel
    if n_runs < 2 and not allow_single:
        sys.exit(f"ERROR: only {n_runs} parseable run(s) — the anchor "
                 "protocol is a min-merge of >= 2 runs (verify "
                 "SKILL.md); pass --allow-single to override")
    # a query that errored in EVERY run would silently vanish from the
    # merged dict, shrinking the anchor's query set — a cross-round
    # total comparison would then read the regression as a speedup
    lost = sorted(errored - merged.keys())
    if lost:
        print(f"ERROR: {len(lost)} query(ies) errored in every run and "
              f"would shrink the anchor: {', '.join(lost)}")
        sys.exit(1)
    total = sum(merged.values())
    line = {
        "metric": "total", "value": total, "unit": "sec",
        "runs": n_runs, "queries": merged, "sf": sf,
    }
    with open(out_path, "w") as f:
        json.dump(line, f)
    print(f"merged {n_runs} runs -> {out_path}: n={len(merged)} "
          f"total={total:.1f}s canary={merged.get('q_range_join')}")


if __name__ == "__main__":
    main()
