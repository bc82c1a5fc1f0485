"""Ground-truth round-trip control for the physical-validation oracle.

Takes rows of a [N, 67] training pickle (normalised feasible solutions),
pushes them through the benchmark's inverse pipeline (physical
unnormalisation + cartesian->spherical, ``rdm_tpu/benchmark/gto_halo.py``)
and grades the results with the warm-start oracle.  This measures the
ORACLE CEILING: the feasible ratio a perfect generative model would score.
Together with the uniform-guess floor (~0.14, ``generate_data.py``) it
brackets every model's benchmark number.

Measured on datasets/training_data_boundary_76668.pkl (n=1024, native
backend): feasible 0.994, optimal 0.703, median arrival error 0.008 LU.

Usage: python scripts/gt_roundtrip_control.py <training_pkl> [n] [backend]
"""
import pickle
import sys

import numpy as np


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "datasets/training_data_boundary_76668.pkl"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    backend = sys.argv[3] if len(sys.argv) > 3 else "native"

    rows = np.asarray(pickle.load(open(path, "rb")))[:n]

    # inverse pipeline in corrected (mean 0 / std 1) space — ground truth
    # rows are stored normalised, so no de-standardisation applies
    alpha_phys = rows[:, 0] * (0.095 - 0.008) + 0.008
    out = rows[:, 1:].astype(np.float64)
    out[:, 0] *= 40.0
    out[:, 1] *= 15.0
    out[:, 2] *= 15.0
    ctrl = (out[:, 3:-3] * 2 - 1).reshape(-1, 20, 3)
    u = np.sqrt((ctrl ** 2).sum(-1))
    theta = np.zeros_like(u)
    nz = u != 0
    theta[nz] = np.arcsin(np.clip(ctrl[:, :, 2][nz] / u[nz], -1, 1))
    alpha = np.arctan2(ctrl[:, :, 1], ctrl[:, :, 0])
    alpha = np.where(alpha >= 0, alpha, 2 * np.pi + alpha)
    theta = np.where(theta >= 0, theta, 2 * np.pi + theta)
    u = np.minimum(u, 1.0)
    out[:, 3:63] = np.stack([alpha, theta, u], -1).reshape(-1, 60)
    out[:, -3] = out[:, -3] * (470 - 408) + 408
    out[:, -1] = out[:, -1] * (11 - 5) + 5

    if backend == "tpu":
        from rdm_tpu.physics.solver_tpu import refine_warmstarts_tpu
        res = refine_warmstarts_tpu(out, alpha_phys)
    else:
        from rdm_tpu.physics.oracle import evaluate_warmstarts_native
        res = evaluate_warmstarts_native(out, alpha_phys)

    print(f"GT round-trip ({backend}, n={len(out)}): "
          f"feasible {res['feasible'].mean():.3f} "
          f"optimal {res['optimal'].mean():.3f} "
          f"median pos_err {np.median(res['pos_err']):.4f} LU")


if __name__ == "__main__":
    main()
