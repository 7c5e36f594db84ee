"""Summarize a training run: PSNR curve + population from its artifacts.

python tools/summarize_run.py <model_dir> [run_log]

Reads <model_dir>/log_file.txt (the Trainer's per-eval JSON lines,
reference train.py:213-214) and, when given, the run log for population/
rate lines — prints a markdown table for docs.
"""

import json
import re
import sys


def main():
    model_dir = sys.argv[1]
    rows = []
    for line in open(f"{model_dir}/log_file.txt"):
        rec = json.loads(line)
        rows.append(rec)
    print("| iteration | test PSNR | test SSIM | test L1 | train PSNR |")
    print("|---|---|---|---|---|")
    for r in rows:
        t = r.get("test", {})
        tr = r.get("train", {})
        print(f"| {r['iteration']} | {t.get('psnr', float('nan')):.2f} | "
              f"{t.get('ssim', float('nan')):.4f} | "
              f"{t.get('l1', float('nan')):.4f} | "
              f"{tr.get('psnr', float('nan')):.2f} |")
    if len(sys.argv) > 2:
        pops = re.findall(r"\[(\d+)\] loss ([\d.]+) gaussians (\d+) "
                          r"it/s ([\d.]+)", open(sys.argv[2]).read())
        if pops:
            print("\npopulation: " + " → ".join(
                f"{int(i) // 1000}k:{int(g)}" for i, _, g, _ in
                pops[:: max(1, len(pops) // 12)]))
            print(f"final cumulative rate: {pops[-1][3]} it/s at iter "
                  f"{pops[-1][0]}")


if __name__ == "__main__":
    main()
