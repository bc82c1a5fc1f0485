#!/usr/bin/env python
"""Plot training/evaluation loss curves from the newest run log
(reference ``Telemetry/plot_losses.py``).  The log format contract
(`step: N, training_loss: X`) is shared with the trainer."""
import glob
import os
import re
import sys


def find_latest_log(pattern="Training Runs/*/logs"):
    logs = glob.glob(pattern)
    if not logs:
        return None
    logs.sort(key=os.path.getmtime, reverse=True)
    return logs[0]


TRAIN_RE = re.compile(r"step: (\d+), training_loss: ([\d.e+-]+)")
EVAL_RE = re.compile(r"step: (\d+), evaluation_loss: ([\d.e+-]+)")


def parse_log_file(log_file):
    train_steps, train_losses, eval_steps, eval_losses = [], [], [], []
    with open(log_file) as f:
        for line in f:
            m = TRAIN_RE.search(line)
            if m:
                train_steps.append(int(m.group(1)))
                train_losses.append(float(m.group(2)))
            m = EVAL_RE.search(line)
            if m:
                eval_steps.append(int(m.group(1)))
                eval_losses.append(float(m.group(2)))
    return train_steps, train_losses, eval_steps, eval_losses


def main(log_file=None, out="training_loss_plot.png", min_step=None, max_step=None):
    log_file = log_file or find_latest_log()
    if not log_file:
        print("No log files found.")
        return 1
    print(f"Using log file: {log_file}")
    ts, tl, es, el = parse_log_file(log_file)
    if not ts:
        print("No training loss data found in the log file.")
        return 1
    if min_step is not None or max_step is not None:
        lo = min_step or 0
        hi = max_step or max(ts)
        keep = [(s, l) for s, l in zip(ts, tl) if lo <= s <= hi]
        ts, tl = zip(*keep) if keep else ([], [])
        keep = [(s, l) for s, l in zip(es, el) if lo <= s <= hi]
        es, el = zip(*keep) if keep else ([], [])

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 6))
    ax.plot(ts, tl, label="training loss", lw=0.8)
    if es:
        ax.plot(es, el, label="evaluation loss", lw=1.2)
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.legend()
    ax.set_title(os.path.dirname(log_file))
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
