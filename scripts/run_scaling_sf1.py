"""sf1 scaling invocation with PER-LEG logging (round-5 VERDICT item 9).

Runs the kg-only bench in fresh subprocesses at the 2→8 CPU pair on the
sf1 corpus (90,000 conversations — the third point of the input-size
trend line after sf0.1 and sf0.3), appending each completed leg to a
JSONL so a partially-finished invocation still yields a usable pair
(legs run in (2, 8) order per repeat; repeat 1 already gives one full
pair).  Run from a code SNAPSHOT, never the live repo — Ray workers
re-import package code from disk mid-run.

Usage: python scripts/run_scaling_sf1.py [out.jsonl] [repeats]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1.jsonl"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/tmp/sfdirs/sf1")
    lo, hi = (int(x) for x in os.environ.get("GRAFT_SCALE_CPUS",
                                             "2,8").split(","))
    runs: dict[int, list[float]] = {lo: [], hi: []}
    for rep in range(repeats):
        for ncpu in (lo, hi):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_SF_DIR=sf_dir, GRAFT_BENCH_KG_ONLY="1")
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True)
            rec = {"rep": rep, "num_cpus": ncpu, "rc": proc.returncode,
                   "wall": round(time.time() - t0, 1)}
            if proc.returncode == 0:
                res = json.loads(proc.stdout.strip().splitlines()[-1])
                rec.update(value=res["value"], turns=res["turns"],
                           turns_per_sec=res["turns_per_sec"],
                           n_triples=res["n_triples"], sf=res["sf"])
                runs[ncpu].append(res["value"])
            else:
                rec["stderr_tail"] = proc.stderr[-2000:]
            with open(out_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec), flush=True)
    if runs[lo] and runs[hi]:
        t_lo, t_hi = min(runs[lo]), min(runs[hi])
        summary = {"metric": f"scaling_efficiency_{lo}_to_{hi}",
                   f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
                   f"runs_{lo}": runs[lo], f"runs_{hi}": runs[hi],
                   "scaling_efficiency":
                       round((t_lo / t_hi) / (hi / lo), 3)}
        with open(out_path, "a") as f:
            f.write(json.dumps(summary) + "\n")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
