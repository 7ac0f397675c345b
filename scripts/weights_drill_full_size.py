#!/usr/bin/env python
"""Full-size on-disk SDXL weights drill (VERDICT r3 next #4).

The strict converter/precheck stack had only ever run at tiny config +
``jax.eval_shape`` manifests; this drill exercises the EXACT path a real
2.57 B-param checkpoint will take — bytes on disk, safetensors I/O, fp16
storage dtype, host memory — end to end:

  1. synthesize a full-size random SDXL checkpoint directory in the HF
     hub layout (unet/ + vae/ diffusion_pytorch_model.safetensors, fp16
     like the published ``stabilityai/stable-diffusion-xl-base-1.0``),
     keys/shapes from the committed converter templates;
  2. ``precheck_sdxl_checkpoint`` gates it (header-only);
  3. ``checkpoint_fingerprint`` records its identity;
  4. ``load_sdxl(strict=True)`` converts it into our param trees (every
     key consumed, every leaf filled);
  5. ``export_unet_state_dict`` / ``export_vae_state_dict`` invert the
     conversion and every tensor is compared BIT-IDENTICAL (fp16 view)
     against what step 1 wrote.

Run with JAX_PLATFORMS=cpu: this is the host-side load path (a real run
feeds the loaded tree to build_initial_params, which casts/UPLOADS it);
the 16 GB chip never needs to hold the f32 intermediate.

Reference parity anchor: from_pretrained at
/root/reference/stable_diffusion/network.py:21-31 (paths reference
train.py:139-140).  Prints one JSON line with sizes + timings.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def synthesize(ckpt_dir: str) -> dict:
    import numpy as np
    from safetensors.numpy import save_file

    from stable_nerf_tpu.models.diffusion.weights import (
        unet_state_dict_template, vae_state_dict_template,
    )

    rng = np.random.default_rng(0)
    stats = {}
    for sub, template in [
        # with_ip=False: stock SDXL checkpoints carry no IP-adapter keys
        # (the converter then clones to_k/to_v, network.py:104-110)
        ("unet", unet_state_dict_template(with_ip=False)),
        ("vae", vae_state_dict_template()),
    ]:
        d = os.path.join(ckpt_dir, sub)
        os.makedirs(d, exist_ok=True)
        sd, n = {}, 0
        for k, v in template.items():
            sd[k] = rng.standard_normal(v.shape, np.float32).astype(
                np.float16)
            n += sd[k].size
        path = os.path.join(d, "diffusion_pytorch_model.safetensors")
        save_file(sd, path)
        stats[sub] = {"keys": len(sd), "params": int(n),
                      "bytes_on_disk": os.path.getsize(path)}
    return stats


def main():
    # force the host platform robustly: the axon TPU plugin ignores the
    # JAX_PLATFORMS env var (tests/conftest.py learned the same lesson),
    # and this drill must not push 10 GB of f32 tensors at a 16 GB chip
    import jax

    jax.config.update("jax_platforms", "cpu")

    out_dir = os.environ.get("DRILL_DIR") or tempfile.mkdtemp(
        prefix="sdxl_drill_")
    result = {"checkpoint_dir": out_dir}

    t0 = time.time()
    result["synthesized"] = synthesize(out_dir)
    result["synthesize_s"] = round(time.time() - t0, 1)

    from stable_nerf_tpu.models.diffusion.weights import (
        checkpoint_fingerprint, export_unet_state_dict,
        export_vae_state_dict, load_sdxl, load_state_dict,
        precheck_sdxl_checkpoint,
    )

    t0 = time.time()
    precheck_sdxl_checkpoint(out_dir)
    result["precheck_s"] = round(time.time() - t0, 2)

    fp = checkpoint_fingerprint(out_dir)
    result["fingerprint"] = fp

    t0 = time.time()
    loaded = load_sdxl(out_dir, with_ip=True, with_text_encoders=False,
                       strict=True)
    result["load_strict_s"] = round(time.time() - t0, 1)

    import jax
    import numpy as np

    result["unet_tree_params"] = int(sum(
        x.size for x in jax.tree.leaves(loaded["unet"])))
    result["vae_tree_params"] = int(sum(
        x.size for x in jax.tree.leaves(loaded["vae"])))

    # invert and compare bit-identical against the bytes on disk (fp16
    # round-trip: disk fp16 -> tree f32 -> export -> fp16 view)
    t0 = time.time()
    mismatches = []
    for sub, exported in [
        ("unet", export_unet_state_dict(loaded["unet"], include_ip=False)),
        ("vae", export_vae_state_dict(loaded["vae"])),
    ]:
        disk = load_state_dict(os.path.join(
            out_dir, sub, "diffusion_pytorch_model.safetensors"))
        if set(exported) != set(disk):
            mismatches.append(
                f"{sub}: key sets differ "
                f"({sorted(set(disk) ^ set(exported))[:5]})")
            continue
        for k in disk:
            a = np.asarray(exported[k], np.float16).view(np.uint16)
            b = disk[k].view(np.uint16)
            if a.shape != b.shape or not np.array_equal(a, b):
                mismatches.append(f"{sub}:{k}")
                if len(mismatches) > 5:
                    break
    result["roundtrip_compare_s"] = round(time.time() - t0, 1)
    result["bit_identical"] = not mismatches
    if mismatches:
        result["mismatches"] = mismatches[:6]
    result["peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2 ** 20, 2)
    print(json.dumps(result))
    if os.environ.get("DRILL_KEEP") != "1":
        import shutil

        shutil.rmtree(out_dir, ignore_errors=True)
    sys.exit(0 if result["bit_identical"] else 1)


if __name__ == "__main__":
    main()
