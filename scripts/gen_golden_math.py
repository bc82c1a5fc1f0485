"""Generate golden parity fixtures for the math core by RUNNING the
reference implementation (``/root/reference/Reflected-Diffusion/cube.py`` and
``sde_lib.py``) on CPU torch.  No reference code is copied into this repo —
only numerical outputs, which pin our jnp rebuild to the reference bitwise
behaviour (within float tolerance).

Usage: python scripts/gen_golden_math.py
Writes: tests/golden/math_golden.npz
"""
import sys

import numpy as np

REF = "/root/reference/Reflected-Diffusion"


def main():
    sys.path.insert(0, REF)
    import torch
    import cube as ref_cube
    import sde_lib as ref_sde

    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    B, C, H, W = 16, 1, 9, 9
    # Points spanning outside the cube (for reflect) and inside (for scores).
    x_wide = rng.normal(0.5, 2.0, size=(B, C, H, W)).astype(np.float32)
    x_in = rng.uniform(0.0, 1.0, size=(B, C, H, W)).astype(np.float32)
    x0_in = rng.uniform(0.0, 1.0, size=(B, C, H, W)).astype(np.float32)
    # Sigmas spanning both score_hk branches: t = s^2/2 vs cutoff 1e-2.
    sigma = np.concatenate([
        np.geomspace(0.01, 0.14, B // 2),   # t in [5e-5, 9.8e-3]  -> refl branch
        np.geomspace(0.15, 5.0, B - B // 2)  # t in [1.1e-2, 12.5] -> ef branch
    ]).astype(np.float32)

    tx = torch.tensor
    out = {
        "x_wide": x_wide, "x_in": x_in, "x0_in": x0_in, "sigma": sigma,
        "reflect": ref_cube.reflect(tx(x_wide)).numpy(),
        "inside": ref_cube.inside(tx(x_wide)).numpy(),
        "score_hk": ref_cube.score_hk(tx(x_in), tx(x0_in), tx(sigma)).numpy(),
        "score_hk_ef": ref_cube._score_hk_ef(
            tx(x_in), tx(x0_in), tx(sigma**2 / 2)).numpy(),
        "score_hk_refl": ref_cube._score_hk_refl(
            tx(x_in), tx(x0_in), tx(sigma**2 / 2), refls=10).numpy(),
    }

    # RVESDE quantities (GTO config: 0.01 / 5 / 1000).
    sde = ref_sde.RVESDE(sigma_min=0.01, sigma_max=5.0, N=1000)
    t = rng.uniform(1e-5, 1.0, size=(B,)).astype(np.float32)
    drift, diffusion = sde.sde(tx(x_in), tx(t))
    mean, std = sde.marginal_prob(tx(x_in), tx(t))
    f, G = sde.discretize(tx(x_in), tx(t))
    out.update({
        "sde_t": t,
        "sde_diffusion": diffusion.numpy(),
        "sde_std": std.numpy(),
        "sde_G": G.numpy(),
        "discrete_sigmas": sde.discrete_sigmas.numpy(),
    })

    np.savez_compressed("tests/golden/math_golden.npz", **out)
    print("wrote tests/golden/math_golden.npz:", {k: np.asarray(v).shape for k, v in out.items()})


if __name__ == "__main__":
    main()
