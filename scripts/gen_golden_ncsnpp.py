"""Generate NCSN++ forward-parity fixtures by RUNNING the reference model
(``/root/reference/Reflected-Diffusion/models/ncsnpp.py``) on CPU torch with
the documented GTO config.  Saves the torch state_dict plus input/output
pairs; tests import the weights through ``rdm_tpu.models.torch_import`` and
require matching outputs.

Usage: python scripts/gen_golden_ncsnpp.py
Writes: tests/golden/ncsnpp_golden.npz
"""
import sys
from types import SimpleNamespace

import numpy as np

REF = "/root/reference/Reflected-Diffusion"


def gto_config():
    model = SimpleNamespace(
        name="ncsnpp", channels=1, image_size=9, image_width=9, num_classes=1,
        cond_drop_prob=0.5, conditional=True, init_scale=0.0, ema_rate=0.999,
        nf=64, ch_mult=[1, 2, 2], num_res_blocks=2, attn_resolutions=[9],
        resamp_with_conv=True, embedding_type="fourier", fourier_scale=16,
        skip_rescale=True, nonlinearity="swish", fir=False,
        fir_kernel=[1, 3, 3, 1], dropout=0.2, scale_by_sigma=False,
    )
    return SimpleNamespace(model=model)


def main():
    sys.path.insert(0, REF)
    import torch
    from models.ncsnpp import NCSNpp

    torch.manual_seed(1234)
    model = NCSNpp(gto_config())
    model.eval()

    # A freshly initialised model outputs ~0 (the output conv and all
    # residual-closing convs are zero-init), which would make forward-parity
    # vacuous.  Randomise every parameter so every layer contributes.
    with torch.no_grad():
        g = torch.Generator().manual_seed(99)
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for b in model.buffers():
            b.copy_(torch.randn(b.shape, generator=g) * 0.05)

    rng = np.random.default_rng(7)
    B = 4
    x = rng.uniform(0, 1, size=(B, 1, 9, 9)).astype(np.float32)
    sigma = np.array([0.01, 0.13, 1.7, 5.0], dtype=np.float32)  # marginal sigmas
    labels = rng.uniform(0, 1, size=(B, 1)).astype(np.float32)

    with torch.no_grad():
        out_cond = model(torch.tensor(x), torch.tensor(sigma), torch.tensor(labels)).numpy()
        out_uncond = model(torch.tensor(x), torch.tensor(sigma), torch.zeros(B, 1)).numpy()

    sd = {f"sd.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    n_params = sum(int(np.prod(v.shape)) for v in sd.values())
    np.savez_compressed(
        "tests/golden/ncsnpp_golden.npz",
        x=x, sigma=sigma, labels=labels,
        out_cond=out_cond, out_uncond=out_uncond,
        n_params=np.array(n_params), **sd)
    print(f"wrote ncsnpp_golden.npz: {len(sd)} tensors, {n_params} params, "
          f"out_cond stats {out_cond.mean():.4f} {out_cond.std():.4f}")


if __name__ == "__main__":
    main()
