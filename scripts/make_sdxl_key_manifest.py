#!/usr/bin/env python
"""Generate the full-size SDXL key manifests (committed test fixtures).

Enumerates — abstractly, via jax.eval_shape, so no memory is allocated —
every state-dict key (and its shape) that a real
`stabilityai/stable-diffusion-xl-base-1.0` checkpoint must provide for
the `unet/` and `vae/` subdirectories, using the converter's own naming
scheme at full config (VERDICT r2, next #3b).  The manifests lock the
weight-conversion contract: tests/test_weights.py asserts the converter
consumes exactly this key set and fills every init-tree leaf.

Human cross-check hooks printed at generation time: total key count and
total parameter count (SDXL base U-Net is publicly documented at
~2.567B params, the SDXL VAE at ~83.65M).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from stable_nerf_tpu.models.diffusion.unet import sdxl_unet_config
    from stable_nerf_tpu.models.diffusion.vae import VAEConfig
    from stable_nerf_tpu.models.diffusion.weights import (
        unet_state_dict_template, vae_state_dict_template,
    )

    out_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                           "tests", "fixtures")
    os.makedirs(out_dir, exist_ok=True)

    for name, template in [
        ("sdxl_unet_keys.json", unet_state_dict_template(sdxl_unet_config())),
        ("sdxl_vae_keys.json", vae_state_dict_template(VAEConfig())),
    ]:
        manifest = {k: list(v.shape) for k, v in sorted(template.items())}
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            json.dump(manifest, f, indent=0, sort_keys=True)
            f.write("\n")
        n_params = int(sum(np.prod(s) if s else 1
                           for s in manifest.values()))
        print(f"{os.path.normpath(path)}: {len(manifest)} keys, "
              f"{n_params:,} params")


if __name__ == "__main__":
    main()
