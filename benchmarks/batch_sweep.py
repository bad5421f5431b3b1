"""Batch-size sweep of the production pipeline step on the real chip.

Runs bench.py at batch 32/64/128/256 (one process per batch: the axon
runtime holds compiled executables alive, and a fresh process keeps each
measurement independent), collects the JSON lines, and prints a markdown
table ready for BASELINE.md. Throughput uses bench.py's scan-differenced
methodology; `steady_latency_ms` is the per-window on-device encode
latency at batch 1 (batch-independent, reported once).

Run: python benchmarks/batch_sweep.py [--batches 32,64,128,256]
"""

import json
import subprocess
import sys


def main():
    batches = [32, 64, 128, 256]
    if "--batches" in sys.argv:
        batches = [int(b) for b in
                   sys.argv[sys.argv.index("--batches") + 1].split(",")]
    rows = []
    for b in batches:
        proc = subprocess.run(
            [sys.executable, "bench.py", "--batch", str(b)],
            capture_output=True, text=True, timeout=3600)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ""
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            print(f"batch {b} FAILED:\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        print(f"batch {b}: {line}", flush=True)

    print("\n| batch | windows/s/chip | ms/step | MFU | p50 one-shot ms |")
    print("|---|---|---|---|---|")
    for r in rows:
        ms_step = 1000.0 * r["batch_size"] / r["value"]
        mfu = f"{100 * r['mfu']:.2f}%" if r.get("mfu") else "—"
        print(f"| {r['batch_size']} | {r['value']:.0f} | {ms_step:.1f} "
              f"| {mfu} | {r['p50_encode_latency_ms']:.1f} |")


if __name__ == "__main__":
    main()
