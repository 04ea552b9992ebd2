#!/usr/bin/env python3
"""Min-merge probe runs into PROBE_r{N}_perturbed.jsonl.

usage: tools/probe_merge.py OUT.jsonl LOG [LOG ...]
       tools/probe_merge.py --allow-single OUT.jsonl LOG

Each LOG is a graft.Probe stdout capture (JSON lines mixed with Spark
noise). Per query keeps the minimum-sec row; row counts must agree
across runs (loud error otherwise — a row-count drift is a
correctness bug, not noise).

Refuses to write an anchor from fewer than TWO logs that actually
contributed rows, unless --allow-single is passed: the committed
protocol (verify SKILL.md) is a min-merge of at least two runs —
single probe runs carry 1.2-4x head/tail debris, and a silently
written one-run anchor poisons the next round's comparison (the
bench_merge.py guard, mirrored).
"""
import json
import os
import sys


def main() -> None:
    argv = sys.argv[1:]
    allow_single = "--allow-single" in argv
    argv = [a for a in argv if a != "--allow-single"]
    out_path, logs = argv[0], argv[1:]
    # the same log passed twice (a glob/retype slip) must not count as
    # two runs — that writes a one-run anchor through the guard below
    deduped = list(dict.fromkeys(os.path.realpath(p) for p in logs))
    if len(deduped) < len(logs):
        print(f"WARNING: {len(logs) - len(deduped)} duplicate log "
              "path(s) ignored")
    logs = deduped
    best: dict[str, dict] = {}
    # distinct CONTRIBUTING LOG indices per query, not a raw row
    # counter: one log holding a query twice (two captures >>'d into
    # one file) is still ONE run of that query — counting rows let it
    # suppress the single-sample warning (the r18 ADVICE finding)
    samples: dict[str, set[int]] = {}
    order: list[str] = []
    contributing = 0  # logs with at least one probe row
    for li, path in enumerate(logs):
        rows_seen = 0
        for line in open(path):
            line = line.strip()
            if not line.startswith('{"query"'):
                continue
            rows_seen += 1
            r = json.loads(line)
            q = r["query"]
            samples.setdefault(q, set()).add(li)
            if q in best:
                if best[q]["rows"] != r["rows"]:
                    sys.exit(f"row-count drift on {q}: "
                             f"{best[q]['rows']} vs {r['rows']}")
                if r["sec"] < best[q]["sec"]:
                    best[q]["sec"] = r["sec"]
            else:
                best[q] = r
                order.append(q)
        if rows_seen:
            contributing += 1
        else:
            print(f"WARNING: {path} contributed no probe rows")
    if not best:
        sys.exit("ERROR: no probe rows in any log — refusing to "
                 "write an empty anchor")
    if contributing < 2 and not allow_single:
        sys.exit(f"ERROR: only {contributing} log(s) contributed rows "
                 "— the anchor protocol is a min-merge of >= 2 runs "
                 "(verify SKILL.md); pass --allow-single to override")
    # partial-subset logs can leave individual queries single-sampled
    # even with >= 2 contributing logs — surface them (warn, not fail:
    # a query that errored in one run legitimately has one sample)
    single = [q for q in order if len(samples[q]) < 2]
    if single and not allow_single:
        print(f"WARNING: {len(single)} query(ies) min-merged from a "
              f"single sample: {', '.join(single[:10])}"
              + (" ..." if len(single) > 10 else ""))
    with open(out_path, "w") as f:
        for q in order:
            f.write(json.dumps(best[q]) + "\n")
    print(f"{out_path}: {len(order)} rows from {contributing} runs, "
          f"total {sum(r['sec'] for r in best.values()):.1f}s")


if __name__ == "__main__":
    main()
