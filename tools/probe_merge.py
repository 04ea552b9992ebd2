#!/usr/bin/env python3
"""Min-merge probe runs into PROBE_r{N}_perturbed.jsonl.

usage: tools/probe_merge.py OUT.jsonl LOG [LOG ...]

Each LOG is a graft.Probe stdout capture (JSON lines mixed with Spark
noise). Per query keeps the minimum-sec row; row counts must agree
across runs (loud error otherwise — a row-count drift is a
correctness bug, not noise).
"""
import json
import sys


def main() -> None:
    out_path, logs = sys.argv[1], sys.argv[2:]
    best: dict[str, dict] = {}
    order: list[str] = []
    for path in logs:
        for line in open(path):
            line = line.strip()
            if not line.startswith('{"query"'):
                continue
            r = json.loads(line)
            q = r["query"]
            if q in best:
                if best[q]["rows"] != r["rows"]:
                    sys.exit(f"row-count drift on {q}: "
                             f"{best[q]['rows']} vs {r['rows']}")
                if r["sec"] < best[q]["sec"]:
                    best[q]["sec"] = r["sec"]
            else:
                best[q] = r
                order.append(q)
    with open(out_path, "w") as f:
        for q in order:
            f.write(json.dumps(best[q]) + "\n")
    print(f"{out_path}: {len(order)} rows, "
          f"total {sum(r['sec'] for r in best.values()):.1f}s")


if __name__ == "__main__":
    main()
