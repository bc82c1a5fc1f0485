"""Golden fixtures for ADM and VDM by RUNNING the reference models on CPU
torch with small configs (state_dict + input/output pairs).

Usage: python scripts/gen_golden_adm_vdm.py
Writes: tests/golden/adm_golden.npz, tests/golden/vdm_golden.npz
"""
import sys
from types import SimpleNamespace

import numpy as np

REF = "/root/reference/Reflected-Diffusion"


def main():
    sys.path.insert(0, REF)
    import torch
    from models.adm import ADM
    from models.vdm import VDM

    rng = np.random.default_rng(0)
    torch.manual_seed(7)

    # ---- ADM (inner module; the wrapper's fp16/one-hot logic is covered
    # by our own unit tests) ------------------------------------------------
    adm = ADM(img_resolution=16, in_channels=3, out_channels=3, label_dim=10,
              augment_dim=0, model_channels=32, channel_mult=[1, 2],
              channel_mult_emb=2, num_blocks=1, attn_resolutions=[8],
              dropout=0.0, label_dropout=0.0)
    adm.eval()
    with torch.no_grad():
        for p in adm.parameters():
            p.copy_(torch.randn(p.shape) * 0.08)

    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    noise_labels = np.array([-0.7, 1.3], np.float32)
    onehot = np.zeros((2, 10), np.float32)
    onehot[0, 3] = 1
    onehot[1, 7] = 1
    with torch.no_grad():
        out = adm(torch.tensor(x), torch.tensor(noise_labels),
                  torch.tensor(onehot)).numpy()
    sd = {f"sd.{k}": v.detach().numpy() for k, v in adm.state_dict().items()
          if "resample_filter" not in k}
    np.savez_compressed("tests/golden/adm_golden.npz", x=x,
                        noise_labels=noise_labels, onehot=onehot, out=out,
                        n_params=np.array(sum(int(np.prod(v.shape))
                                              for v in sd.values())), **sd)
    print("ADM golden:", out.shape, out.std())

    # ---- VDM ---------------------------------------------------------------
    cfg = SimpleNamespace(
        model=SimpleNamespace(num_blocks=2, channels=32, attention=True,
                              dropout=0.0, scale_by_sigma=True,
                              image_fourier=True, image_fourier_start=6,
                              image_fourier_end=8),
        data=SimpleNamespace(num_channels=3),
        sde=SimpleNamespace(sigma_min=0.01, sigma_max=5.0))
    vdm = VDM(cfg)
    vdm.eval()
    with torch.no_grad():
        for p in vdm.parameters():
            p.copy_(torch.randn(p.shape) * 0.08)
    sigma = np.array([0.5, 2.0], np.float32)
    xv = rng.uniform(0, 1, size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        outv = vdm(torch.tensor(xv), torch.tensor(sigma)).numpy()
    sdv = {f"sd.{k}": v.detach().numpy() for k, v in vdm.state_dict().items()
           if "freqs" not in k}
    np.savez_compressed("tests/golden/vdm_golden.npz", x=xv, sigma=sigma,
                        out=outv,
                        n_params=np.array(sum(int(np.prod(v.shape))
                                              for v in sdv.values())), **sdv)
    print("VDM golden:", outv.shape, outv.std())


if __name__ == "__main__":
    main()
