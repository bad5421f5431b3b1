"""Batch-size sweep of the headline pipeline (round-3 directive #6).

Runs bench.py's exact throughput methodology at several batch sizes and
prints one JSON line per size, so BASELINE.md's batch/throughput/latency
table can be regenerated with a single command:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/batch_sweep.py [sizes...]

Each size runs in a fresh subprocess: the axon runtime keeps compiled
programs alive per-process, and distinct batch shapes would otherwise
accumulate HBM and skew later runs.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [32, 64, 128, 256]
    results = []
    for b in sizes:
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + ":" + env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"),
             "--batch", str(b)],
            env=env, capture_output=True, text=True, timeout=3600)
        line = out.stdout.strip().splitlines()[-1] if out.stdout else ""
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            print(f"batch {b}: FAILED\n{out.stdout[-500:]}\n{out.stderr[-500:]}",
                  file=sys.stderr)
            continue
        results.append(rec)
        print(json.dumps(rec), flush=True)
    if results:
        best = max(results, key=lambda r: r["value"])
        print(f"# best: batch {best['batch_size']} at {best['value']:.0f} "
              f"windows/s/chip", flush=True)


if __name__ == "__main__":
    main()
