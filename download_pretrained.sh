#!/bin/bash
# Fetch the upstream RDM paper's pretrained torch checkpoints
# (reference: Reflected-Diffusion/download_pretrained.sh — same three
# Google Drive archives). The torch-pickle import shim
# (rdm_tpu/models/torch_import.py + rdm_tpu/training/checkpoints.py)
# loads these directly into the Flax models for sampling/eval parity:
#   python run_vis.py load_dir=weights/cifar10 ...
# Requires network egress; in an air-gapped environment place the
# extracted run dirs under weights/ manually.
set -euo pipefail
mkdir -p weights && cd weights

fetch_gdrive() {  # <file_id> <out.tar.gz>
    local id="$1" out="$2" confirm
    confirm=$(wget --quiet --save-cookies .cookies --keep-session-cookies \
        --no-check-certificate "https://docs.google.com/uc?export=download&id=${id}" -O- \
        | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1\n/p')
    wget --load-cookies .cookies -O "$out" \
        "https://docs.google.com/uc?export=download&confirm=${confirm}&id=${id}"
    rm -f .cookies
    tar -xzf "$out" && rm "$out"
}

fetch_gdrive 1AYPr0R8-3CssADBfYYSi1JuYaVrpLkTm cifar10.tar.gz
fetch_gdrive 1CL5tM-SO4vn6tyXzrFh7VBzQv3jXDI6X denoiser.tar.gz
fetch_gdrive 1e177im3rwI1rsHcQ5wAsaCKBKcDYRllf imagenet64.tar.gz
