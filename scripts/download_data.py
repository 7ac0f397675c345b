#!/usr/bin/env python
"""Dataset fetch helper.

Equivalent of the reference's dataset_nerf.ipynb / dataset_objaverse.ipynb
download notebooks: fetches tiny_nerf_data.npz and (optionally) Objaverse
views_release objects into the datasets/ layout the loaders expect.

  datasets/nerf/tiny_nerf_data.npz
  datasets/objaverse/views_release/<object_id>/{000..011}.png + .npy

Requires network access; in an air-gapped environment copy the files into
place manually.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

TINY_NERF_URL = "https://people.eecs.berkeley.edu/~bmild/nerf/tiny_nerf_data.npz"
OBJAVERSE_NOTE = """\
Objaverse views_release (zero123 renders, ~1.5TB full set) is hosted on
Hugging Face; fetch a subset with e.g.:

  pip install huggingface_hub
  python - <<'PY'
  from huggingface_hub import snapshot_download
  snapshot_download("allenai/objaverse", repo_type="dataset",
                    allow_patterns=["views_release/<object_id>/*"],
                    local_dir="datasets/objaverse")
  PY

Each object directory must hold 12 views: 000.png…011.png with matching
000.npy…011.npy camera poses (the layout the reference's notebooks produce).
"""


def fetch_tiny_nerf(root: str):
    out_dir = os.path.join(root, "nerf")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "tiny_nerf_data.npz")
    if os.path.exists(out):
        print(f"{out} already present")
        return
    print(f"downloading {TINY_NERF_URL} → {out}")
    urllib.request.urlretrieve(TINY_NERF_URL, out)
    print("done")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets")
    ap.add_argument("--dataset", default="nerf", choices=["nerf", "objaverse"])
    args = ap.parse_args()
    if args.dataset == "nerf":
        fetch_tiny_nerf(args.root)
    else:
        print(OBJAVERSE_NOTE)


if __name__ == "__main__":
    main()
