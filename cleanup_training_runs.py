#!/usr/bin/env python
"""Delete training run folders without any .pth checkpoints
(reference ``cleanup_training_runs.py``), with confirmation."""
import argparse
import os
import shutil
from pathlib import Path


def find_training_runs_without_checkpoints(training_runs_dir):
    root = Path(training_runs_dir)
    if not root.exists():
        print(f"Error: Directory '{training_runs_dir}' does not exist!")
        return []
    empty = []
    for folder in sorted(root.iterdir()):
        if not folder.is_dir():
            continue
        has_ckpt = any(folder.rglob("*.pth"))
        status = "HAS CHECKPOINTS" if has_ckpt else "NO CHECKPOINTS"
        print(f"  {folder.name}: {status}")
        if not has_ckpt:
            empty.append(folder)
    return empty


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="Training Runs")
    p.add_argument("--yes", action="store_true", help="skip confirmation")
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()

    empty = find_training_runs_without_checkpoints(args.dir)
    if not empty:
        print("Nothing to clean up.")
        return
    print(f"\n{len(empty)} folder(s) without checkpoints:")
    for f in empty:
        print(f"  {f}")
    if args.dry_run:
        return
    if not args.yes:
        answer = input("Delete these folders? [y/N] ")
        if answer.lower() != "y":
            print("Aborted.")
            return
    for f in empty:
        shutil.rmtree(f)
        print(f"deleted {f}")
    print(f"Deleted {len(empty)} folder(s).")


if __name__ == "__main__":
    main()
