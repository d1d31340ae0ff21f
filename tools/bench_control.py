"""Two-tree interleaved bench control (VERDICT r6 ask #3).

The committed r6 artifacts recorded a 1.17x common-key slowdown vs r5
while an uncommitted quiet-host rerun measured 1.02x — this harness
settles such discrepancies with the r5 control protocol: bench the r5
tree (347552e, checked out as a git worktree) and HEAD **interleaved in
the same session** on an otherwise idle host, so any host-level drift
hits both trees equally. Each series is a separate process (fresh JVM,
same Python); pairs alternate r5-first / head-first to cancel
order-of-run bias. Output: BENCH_CONTROL_r{N}.json with both series,
per-key minima, and the common-key ratio.

Run:  python tools/bench_control.py [rounds] [out.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: control tree: a git worktree of the prior round's final commit
#: (r7: HEAD-vs-r5 at .bench_r5; r8+: HEAD-vs-prev at .bench_ctl unless
#: overridden by $BENCH_CONTROL_TREE / $BENCH_CONTROL_LABEL)
CTL_TREE = os.environ.get(
    "BENCH_CONTROL_TREE", os.path.join(REPO, ".bench_ctl")
)
CTL_LABEL = os.environ.get("BENCH_CONTROL_LABEL", "ctl")


def run_bench(tree: str) -> dict:
    """One bench.py run in ``tree``; returns the parsed JSON line."""
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        capture_output=True,
        text=True,
        timeout=900,
        env={**os.environ, "PYTHONPATH": tree},
    )
    line = None
    for ln in reversed(proc.stdout.strip().splitlines()):
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
            break
    if proc.returncode != 0 or line is None:
        raise RuntimeError(
            f"bench failed in {tree}: rc={proc.returncode}\n"
            f"{proc.stderr[-2000:]}"
        )
    out = json.loads(line)
    out["_wall"] = round(time.time() - t0, 1)
    return out


def main(rounds: int = 3, out_path: str = "BENCH_CONTROL.json") -> int:
    head_commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    ctl_commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=CTL_TREE, capture_output=True, text=True,
    ).stdout.strip()
    series: dict[str, list[dict]] = {CTL_LABEL: [], "head": []}
    for i in range(rounds):
        order = (
            [(CTL_LABEL, CTL_TREE), ("head", REPO)]
            if i % 2 == 0
            else [("head", REPO), (CTL_LABEL, CTL_TREE)]
        )
        for label, tree in order:
            rec = run_bench(tree)
            series[label].append(rec)
            print(
                f"pair {i + 1}/{rounds} {label}: total="
                f"{rec['value']}s wall={rec['_wall']}s",
                flush=True,
            )
    best = {
        lab: {
            k: min(r["queries"][k] for r in runs)
            for k in runs[0]["queries"]
        }
        for lab, runs in series.items()
    }
    common = sorted(set(best[CTL_LABEL]) & set(best["head"]))
    ctl_sum = sum(best[CTL_LABEL][k] for k in common)
    head_sum = sum(best["head"][k] for k in common)
    result = {
        "protocol": (
            "interleaved same-session two-tree bench; per-key MIN over "
            f"{rounds} alternating pairs; fresh process per run"
        ),
        "control_label": CTL_LABEL,
        "control_commit": ctl_commit,
        "head_commit": head_commit,
        "common_keys": len(common),
        "control_common_total_sec": round(ctl_sum, 3),
        "head_common_total_sec": round(head_sum, 3),
        "head_over_control_ratio": round(head_sum / ctl_sum, 4),
        "per_key_min": {
            k: {
                CTL_LABEL: round(best[CTL_LABEL][k], 4),
                "head": round(best["head"][k], 4),
                "ratio": round(best["head"][k] / best[CTL_LABEL][k], 3)
                if best[CTL_LABEL][k] > 0
                else None,
            }
            for k in common
        },
        "head_only_keys": sorted(set(best["head"]) - set(best[CTL_LABEL])),
        "totals_per_run": {
            lab: [r["value"] for r in runs] for lab, runs in series.items()
        },
    }
    with open(os.path.join(REPO, out_path), "w") as fh:
        json.dump(result, fh, indent=2)
    print(
        f"common={len(common)} {CTL_LABEL}={ctl_sum:.2f}s head={head_sum:.2f}s "
        f"ratio={head_sum / ctl_sum:.4f} -> {out_path}"
    )
    return 0


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = sys.argv[2] if len(sys.argv) > 2 else "BENCH_CONTROL.json"
    sys.exit(main(rounds, out))
