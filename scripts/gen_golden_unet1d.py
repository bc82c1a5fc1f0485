"""Golden fixtures for the legacy 1-D U-Net by RUNNING the reference
(``GTO_Halo_DM/DM_scripts/classifier_free_guidance_cond_1d_improved_
constrained_diffusion.py`` Unet1D) on CPU torch.

Usage: python scripts/gen_golden_unet1d.py
Writes: tests/golden/unet1d_golden.npz
"""
import importlib.machinery
import sys
import types

import numpy as np

REF_DM = "/root/reference/GTO_Halo_DM/DM_scripts"


def main():
    for name in ("ema_pytorch", "wandb"):
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        mod.EMA = object
        mod.init = mod.log = lambda *a, **k: None
        sys.modules[name] = mod
    sys.path.insert(0, REF_DM)
    import torch
    # the reference hardcodes .cuda() in the cond-drop branch
    # (...diffusion.py:526) — identity-patch it so CFG runs on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    from classifier_free_guidance_cond_1d_improved_constrained_diffusion import Unet1D

    torch.manual_seed(3)
    model = Unet1D(dim=16, channels=1, dim_mults=(1, 2, 4),
                   embed_class_layers_dims=(16, 16), class_dim=1,
                   cond_drop_prob=0.0, mask_val=-1.0, seq_length=66)
    model.eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(11)
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(3, 1, 66)).astype(np.float32)
    t = np.array([3.0, 250.0, 499.0], np.float32)
    classes = rng.uniform(0, 1, (3, 1)).astype(np.float32)

    with torch.no_grad():
        out = model(torch.tensor(x), torch.tensor(t), torch.tensor(classes),
                    cond_drop_prob=0.0).numpy()
        out_cfg = model.forward_with_cond_scale(
            torch.tensor(x), torch.tensor(t), torch.tensor(classes),
            cond_scale=5.0).numpy()

    sd = {f"sd.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    np.savez_compressed("tests/golden/unet1d_golden.npz", x=x, t=t,
                        classes=classes, out=out, out_cfg=out_cfg,
                        n_params=np.array(sum(int(np.prod(v.shape))
                                              for v in sd.values())), **sd)
    print("unet1d golden:", out.shape, out.std(), "params",
          sum(int(np.prod(v.shape)) for v in sd.values()))


if __name__ == "__main__":
    main()
