"""Render logs/eval_matrix_*.jsonl into the RESULTS.md markdown table.

    python scripts/results_table.py [logs/eval_matrix_r3b.jsonl]

Groups by (class, mode), one column per seed, tallies printed as the
reference's end-of-run counters (``run_grasp_simulation.py:719``):
objects / attempts / stable grasps / task successes.
"""
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "logs/eval_matrix_r3b.jsonl"
    rows = [json.loads(x) for x in open(path) if x.strip()]
    by = defaultdict(dict)
    seeds = sorted({r["seed"] for r in rows})
    for r in rows:
        by[(r["class"], r["mode"])][r["seed"]] = r

    def cell(r):
        if r is None:
            return "—"
        return (f"{r['num_objects']}/{r['num_attempts']}/"
                f"{r['num_stable_grasp']}/{r['num_task_grasp_succ']}")

    hdr = "| class | perception | " + " | ".join(
        f"seed {s}" for s in seeds) + " | mean task succ |"
    print(hdr)
    print("|" + "---|" * (len(seeds) + 3))
    for cls in ("nut", "screw", "hnm"):
        for mode in ("oracle", "learned"):
            rs = by.get((cls, mode))
            if not rs:
                continue
            vals = [rs.get(s) for s in seeds]
            succ = [v["num_task_grasp_succ"] / max(v["num_objects"], 1)
                    for v in vals if v]
            mean = sum(succ) / len(succ) if succ else 0.0
            print(f"| {cls} | {mode} | "
                  + " | ".join(cell(v) for v in vals)
                  + f" | {mean * 100:.0f}% |")


if __name__ == "__main__":
    main()
