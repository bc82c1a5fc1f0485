#!/usr/bin/env python
"""Realtime loss plot: polls the newest run log and refreshes the figure
(reference ``Telemetry/plot_losses_realtime.py``)."""
import sys
import time

from plot_losses import find_latest_log, parse_log_file


def main(interval=10.0):
    import matplotlib.pyplot as plt
    plt.ion()
    fig, ax = plt.subplots(figsize=(10, 6))
    while True:
        log = find_latest_log()
        if log:
            ts, tl, es, el = parse_log_file(log)
            ax.clear()
            if ts:
                ax.plot(ts, tl, label="training loss", lw=0.8)
            if es:
                ax.plot(es, el, label="evaluation loss", lw=1.2)
            ax.set_yscale("log")
            ax.legend()
            ax.set_title(log)
            plt.pause(0.01)
        time.sleep(interval)


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 10.0)
