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
    local id="$1" out="$2" confirm uuid page
    page=$(wget --quiet --save-cookies .cookies --keep-session-cookies \
        --no-check-certificate "https://docs.google.com/uc?export=download&id=${id}" -O-)
    # Legacy cookie/confirm-token flow...
    confirm=$(printf '%s' "$page" | sed -rn 's/.*confirm=([0-9A-Za-z_]+).*/\1/p' | head -n1)
    if [ -n "$confirm" ]; then
        wget --load-cookies .cookies -O "$out" \
            "https://docs.google.com/uc?export=download&confirm=${confirm}&id=${id}"
    else
        # ...falling back to the current drive.usercontent.google.com HTML
        # form (large-file virus-scan interstitial): scrape the uuid field
        # and request the download endpoint directly.
        uuid=$(printf '%s' "$page" | sed -rn 's/.*name="uuid" value="([0-9a-f-]+)".*/\1/p' | head -n1)
        wget --load-cookies .cookies -O "$out" \
            "https://drive.usercontent.google.com/download?id=${id}&export=download&confirm=t&uuid=${uuid}"
    fi
    rm -f .cookies
    # Refuse to untar an HTML error page — check the gzip magic bytes and
    # fail with a clear message instead of tar's "not in gzip format".
    if [ "$(head -c2 "$out" | od -An -tx1 | tr -d ' ')" != "1f8b" ]; then
        echo "ERROR: $out is not a gzip archive (Google Drive likely served" >&2
        echo "an interstitial page). Download it manually into weights/." >&2
        exit 1
    fi
    tar -xzf "$out" && rm "$out"
}

fetch_gdrive 1AYPr0R8-3CssADBfYYSi1JuYaVrpLkTm cifar10.tar.gz
fetch_gdrive 1CL5tM-SO4vn6tyXzrFh7VBzQv3jXDI6X denoiser.tar.gz
fetch_gdrive 1e177im3rwI1rsHcQ5wAsaCKBKcDYRllf imagenet64.tar.gz
