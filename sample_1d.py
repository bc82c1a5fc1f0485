#!/usr/bin/env python
"""Sample warm-start data from a trained 1-D diffusion model (reference
``GTO_Halo_DM/DM_scripts/sample_data_diffusion_boundary.py:18-259``).

Generates ``sample_num`` trajectories with classifier-free guidance
(cond_scale=5.0 by default), applies the physical un-normalisation
(times, cartesian->spherical controls, fuel mass, manifold length; halo
period stays normalised — un-normalised later by the CR3BP run), prepends
the physical halo energy, and pickles the [N, 67] warm-start array.
"""
from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def convert_to_spherical(ux, uy, uz):
    """Reference ``sample_data_diffusion_boundary.py:214-226``."""
    u = np.sqrt(ux**2 + uy**2 + uz**2)
    theta = np.zeros_like(u)
    nz = u != 0
    theta[nz] = np.arcsin(np.clip(uz[nz] / u[nz], -1, 1))
    alpha = np.arctan2(uy, ux)
    alpha = np.where(alpha >= 0, alpha, 2 * np.pi + alpha)
    theta = np.where(theta >= 0, theta, 2 * np.pi + theta)
    u = np.minimum(u, 1.0)
    return alpha, theta, u


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="model-epoch-N.pt produced by train_1d.py")
    p.add_argument("--sample_num", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=1000)
    p.add_argument("--diffusion_w", type=float, default=5.0,
                   help="classifier-free guidance cond_scale")
    p.add_argument("--fixed_alpha", type=float, default=None)
    p.add_argument("--unet_dim", type=int, default=128)
    p.add_argument("--unet_dim_mults", type=str, default="4,4,8")
    p.add_argument("--embed_class_layers_dims", type=str, default="256,512")
    p.add_argument("--timesteps", type=int, default=500)
    p.add_argument("--objective", type=str, default="pred_noise")
    p.add_argument("--seq_length", type=int, default=66)
    p.add_argument("--class_dim", type=int, default=1)
    p.add_argument("--cond_drop_prob", type=float, default=0.1)
    p.add_argument("--mask_val", type=float, default=-1.0)
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--seed", type=int, default=1000000)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rdm_tpu.diffusion1d import GaussianDiffusion1D
    from rdm_tpu.models.unet1d import UNet1D

    model = UNet1D(
        dim=args.unet_dim, channels=1,
        dim_mults=tuple(map(int, args.unet_dim_mults.split(","))),
        embed_class_layers_dims=tuple(map(int, args.embed_class_layers_dims.split(","))),
        class_dim=args.class_dim, cond_drop_prob=args.cond_drop_prob,
        mask_val=args.mask_val, seq_length=args.seq_length, legacy=True)
    diffusion = GaussianDiffusion1D(model=model, seq_length=args.seq_length,
                                    timesteps=args.timesteps,
                                    objective=args.objective)

    import torch
    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    params = jax.tree.map(jnp.asarray, ckpt.get("ema", ckpt["model"]))

    # conditioning: fixed or uniform-random normalised halo energy
    rng = np.random.default_rng(args.seed)
    if args.fixed_alpha is not None:
        alpha_norm = np.full((args.sample_num, 1), args.fixed_alpha, np.float32)
    else:
        alpha_norm = rng.uniform(0, 1, (args.sample_num, 1)).astype(np.float32)

    sample = jax.jit(lambda p, k, c: diffusion.sample(
        p, k, c, cond_scale=args.diffusion_w))
    chunks = []
    key = jax.random.PRNGKey(args.seed)
    for i in range(0, args.sample_num, args.batch_size):
        cls = jnp.asarray(alpha_norm[i:i + args.batch_size])
        key, k = jax.random.split(key)
        out = np.asarray(sample(params, k, cls))  # (B, L, 1) in [0, 1]
        chunks.append(out[:, :, 0])
    full = np.concatenate(chunks, 0)[:args.sample_num].astype(np.float64)

    # physical un-normalisation (reference ``:55-99``)
    full[:, 0] = full[:, 0] * 40.0
    full[:, 1] = full[:, 1] * 15.0
    full[:, 2] = full[:, 2] * 15.0
    full[:, 3:-3] = full[:, 3:-3] * 2.0 - 1.0
    ux, uy, uz = full[:, 3:-3:3], full[:, 4:-3:3], full[:, 5:-3:3]
    a, b, r = convert_to_spherical(ux, uy, uz)
    full[:, 3:-3:3], full[:, 4:-3:3], full[:, 5:-3:3] = a, b, r
    full[:, -3] = full[:, -3] * (470 - 408) + 408
    full[:, -1] = full[:, -1] * (11 - 5) + 5
    halo_energies = alpha_norm * (0.095 - 0.008) + 0.008
    full = np.hstack((halo_energies.astype(np.float64), full))

    out_path = args.output or (
        f"generated_initializations/cr3bp_diffusion_boundary_w_{args.diffusion_w}"
        f"_num_{args.sample_num}"
        + (f"_alpha_{args.fixed_alpha}" if args.fixed_alpha is not None else "")
        + ".pkl")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump(full, f)
    print(f"{out_path} is saved!  shape={full.shape}")


if __name__ == "__main__":
    main()
