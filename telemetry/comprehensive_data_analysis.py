#!/usr/bin/env python
"""Offline EDA of the GTO Halo training pickle (reference
``Telemetry/comprehensive_data_analysis.py``): component distributions,
9x9 spatial patterns, classifier statistics, boundary violations,
correlations, PCA + outliers.  Emits PNGs and a results pickle.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def analyze(pkl_path: str, output_dir: str = "data_analysis") -> dict:
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from rdm_tpu.data import GTOHaloImageDataset

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output_dir, exist_ok=True)
    ds = GTOHaloImageDataset(pkl_path)
    raw = ds.raw                    # [N, 67] in [0, 1]
    images = ds.images              # [N, 9, 9, 1] standardized
    labels = ds.labels[:, 0]

    results: dict = {"n_samples": len(ds)}

    # 1. component distributions
    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    groups = {"halo energy (label)": raw[:, 0], "times": raw[:, 1:4].ravel(),
              "controls": raw[:, 4:64].ravel(), "fuel mass": raw[:, 64],
              "halo period": raw[:, 65], "manifold length": raw[:, 66]}
    for ax, (name, arr) in zip(axes.ravel(), groups.items()):
        ax.hist(arr, bins=50, density=True)
        ax.set_title(name)
        results[f"stats/{name}"] = dict(mean=float(arr.mean()), std=float(arr.std()),
                                        min=float(arr.min()), max=float(arr.max()))
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "component_distributions.png"), dpi=110)
    plt.close(fig)

    # 2. spatial 9x9 patterns (mean/std of the padded image representation)
    fig, axes = plt.subplots(1, 2, figsize=(9, 4))
    for ax, (name, img) in zip(axes, [("mean", images.mean(0)[:, :, 0]),
                                      ("std", images.std(0)[:, :, 0])]):
        im = ax.imshow(img, cmap="viridis")
        ax.set_title(f"9x9 {name}")
        fig.colorbar(im, ax=ax)
    fig.savefig(os.path.join(output_dir, "spatial_patterns.png"), dpi=110)
    plt.close(fig)
    results["spatial_mean"] = images.mean(0)[:, :, 0]
    results["spatial_std"] = images.std(0)[:, :, 0]

    # 3. classifier stats
    results["classifier"] = dict(mean=float(labels.mean()), std=float(labels.std()),
                                 min=float(labels.min()), max=float(labels.max()))

    # 4. boundary violations (values outside [0, 1] before standardisation)
    viol = ((raw < 0) | (raw > 1)).sum(0)
    results["boundary_violations_per_dim"] = viol
    results["boundary_violation_total"] = int(viol.sum())

    # 5. correlations
    corr = np.corrcoef(raw.T)
    results["correlation_matrix"] = corr
    fig, ax = plt.subplots(figsize=(7, 6))
    im = ax.imshow(corr, cmap="RdBu_r", vmin=-1, vmax=1)
    fig.colorbar(im, ax=ax)
    ax.set_title("component correlations")
    fig.savefig(os.path.join(output_dir, "correlations.png"), dpi=110)
    plt.close(fig)

    # 6. PCA + outliers
    x = raw - raw.mean(0)
    cov = np.cov(x.T)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    proj = x @ evecs[:, :2]
    dist = np.linalg.norm(x @ evecs[:, :10] / np.sqrt(evals[:10] + 1e-12), axis=1)
    outliers = np.argsort(dist)[-10:]
    results["pca_explained_variance_ratio"] = evals / evals.sum()
    results["outlier_indices"] = outliers
    fig, ax = plt.subplots(figsize=(6, 5))
    ax.scatter(proj[:, 0], proj[:, 1], s=3, alpha=0.3)
    ax.scatter(proj[outliers, 0], proj[outliers, 1], s=20, color="red",
               label="top outliers")
    ax.legend()
    ax.set_title("PCA projection")
    fig.savefig(os.path.join(output_dir, "pca_outliers.png"), dpi=110)
    plt.close(fig)

    with open(os.path.join(output_dir, "analysis_results.pkl"), "wb") as f:
        pickle.dump(results, f)
    print(f"analysis complete -> {output_dir}")
    return results


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--pkl_path", required=True)
    p.add_argument("--output_dir", default="data_analysis")
    args = p.parse_args()
    analyze(args.pkl_path, args.output_dir)
