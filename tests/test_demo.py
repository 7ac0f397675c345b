"""Learned-diffusion demo surfaces (VERDICT r4 next #1): the "sd"
trainable scope, the demo U-Net config, VAE npz round-trip, and the
geometric-intrinsics dataset option."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stable_nerf_tpu.config import NeRFConfig, SDConfig, TrainConfig
from stable_nerf_tpu.models.diffusion import DDIMScheduler
from stable_nerf_tpu.models.diffusion.sd_network import (
    SDNetworkConfig, sd_network_init,
)
from stable_nerf_tpu.models.diffusion.unet import demo_unet_config
from stable_nerf_tpu.models.diffusion.vae import (
    VAEConfig, vae_init, vae_load_npz, vae_save_npz,
)
from stable_nerf_tpu.models.nerf import grid_init, nerf_init
from stable_nerf_tpu.training.joint import (
    JointConfig, joint_trainable_mask, make_optimizer, make_train_step,
)
from stable_nerf_tpu.utils.pytree import partition

from test_joint_training import make_batch, tiny_joint_cfg


class TestTrainableScope:
    def test_reference_scope_is_default(self):
        cfg = tiny_joint_cfg()
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"sd": sd_network_init(k1, cfg.sd),
                  "nerf": nerf_init(k2, cfg.nerf)}
        assert joint_trainable_mask(params) == joint_trainable_mask(
            params, "reference")

    def test_sd_scope_covers_unet_not_vae(self):
        cfg = tiny_joint_cfg()
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"sd": sd_network_init(k1, cfg.sd),
                  "nerf": nerf_init(k2, cfg.nerf)}
        mask = joint_trainable_mask(params, "sd")
        # every vae leaf frozen, every unet leaf (incl. base) trainable
        assert not any(jax.tree.leaves(mask["sd"]["vae"]))
        assert all(jax.tree.leaves(mask["sd"]["unet"]))
        assert all(jax.tree.leaves(mask["sd"]["image_proj"]))
        assert not any(jax.tree.leaves(
            {k: mask["sd"][k] for k in ("add_text_embeds", "add_time_ids")}))
        assert all(jax.tree.leaves(mask["nerf"]))
        # strictly more trainables than the reference scope
        n_ref = sum(jax.tree.leaves(joint_trainable_mask(params)))
        n_sd = sum(jax.tree.leaves(mask))
        assert n_sd > n_ref

    def test_unknown_scope_raises(self):
        cfg = tiny_joint_cfg()
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"sd": sd_network_init(k1, cfg.sd),
                  "nerf": nerf_init(k2, cfg.nerf)}
        with pytest.raises(ValueError, match="scope"):
            joint_trainable_mask(params, "everything")

    @pytest.mark.slow
    def test_sd_scope_step_trains_unet_base(self, key):
        """One train step under scope 'sd' must move U-Net base weights
        (frozen under the reference scope) and leave the VAE untouched."""
        cfg = tiny_joint_cfg()
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"sd": sd_network_init(k1, cfg.sd),
                  "nerf": nerf_init(k2, cfg.nerf)}
        grid_state = grid_init(cfg.nerf)
        grid_state = grid_state._replace(occ=jnp.ones_like(grid_state.occ))
        scheduler = DDIMScheduler.create(cfg.sd.scheduler)
        mask = joint_trainable_mask(params, "sd")
        opt = make_optimizer(TrainConfig(lr=1e-3))
        trainable, _ = partition(params, mask)
        opt_state = opt.init(trainable)
        step = jax.jit(make_train_step(cfg, scheduler, opt, mask))
        batch = make_batch(key, 2)
        new_params, _, metrics = step(params, opt_state, grid_state, batch,
                                      key)
        assert np.isfinite(float(metrics["loss"]))
        old_conv = np.asarray(params["sd"]["unet"]["conv_in"]["kernel"])
        new_conv = np.asarray(new_params["sd"]["unet"]["conv_in"]["kernel"])
        assert not np.allclose(old_conv, new_conv)
        for old, new in zip(jax.tree.leaves(params["sd"]["vae"]),
                            jax.tree.leaves(new_params["sd"]["vae"])):
            np.testing.assert_array_equal(np.asarray(old), np.asarray(new))


class TestDemoTrainKnobs:
    def test_multi_lr_moves_both_subtrees(self, key):
        """nerf_lr != lr must apply per-subtree step sizes (multi_transform)
        over the partitioned (None-filled) trainable tree."""
        import optax

        from stable_nerf_tpu.config import TrainConfig

        cfg = TrainConfig(lr=1e-3, nerf_lr=1e-2)
        opt = make_optimizer(cfg)
        params = {"sd": {"w": jnp.ones((4,))},
                  "nerf": {"w": jnp.ones((4,))},
                  }
        state = opt.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = opt.update(grads, state, params)
        # adam normalizes magnitude to ~lr on the first step
        assert abs(float(jnp.abs(updates["nerf"]["w"]).mean()) /
                   float(jnp.abs(updates["sd"]["w"]).mean()) - 10.0) < 1.0

    @pytest.mark.slow
    def test_vae_encode_mode_is_deterministic_across_keys(self, key):
        """Under vae_encode='mode' the latent targets must not depend on
        the per-step key's VAE draw (the loose-posterior fix: sampling a
        prior-collapsed VAE supervises the NeRF on noise)."""
        cfg = tiny_joint_cfg()
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, vae_encode="mode"))
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"sd": sd_network_init(k1, cfg.sd),
                  "nerf": nerf_init(k2, cfg.nerf)}
        grid_state = grid_init(cfg.nerf)
        grid_state = grid_state._replace(occ=jnp.ones_like(grid_state.occ))
        scheduler = DDIMScheduler.create(cfg.sd.scheduler)
        from stable_nerf_tpu.training.joint import forward_iteration

        batch = make_batch(key, 2)
        # different keys draw different diffusion noise/timesteps, so
        # compare the NERF loss (a pure function of the latent targets
        # given perturb_key... which also varies).  Instead compare the
        # two encode paths directly through the forward's target:
        _, nerf_loss_a, _ = forward_iteration(
            params, grid_state, batch, jax.random.PRNGKey(3), cfg,
            scheduler, train=False)
        _, nerf_loss_b, _ = forward_iteration(
            params, grid_state, batch, jax.random.PRNGKey(4), cfg,
            scheduler, train=False)
        np.testing.assert_allclose(float(nerf_loss_a), float(nerf_loss_b),
                                   rtol=1e-6)

    @pytest.mark.slow
    def test_vae_encode_sample_varies_with_key(self, key):
        cfg = tiny_joint_cfg()   # default: sample (reference parity)
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        params = {"sd": sd_network_init(k1, cfg.sd),
                  "nerf": nerf_init(k2, cfg.nerf)}
        grid_state = grid_init(cfg.nerf)
        grid_state = grid_state._replace(occ=jnp.ones_like(grid_state.occ))
        scheduler = DDIMScheduler.create(cfg.sd.scheduler)
        from stable_nerf_tpu.training.joint import forward_iteration

        batch = make_batch(key, 2)
        _, a, _ = forward_iteration(params, grid_state, batch,
                                    jax.random.PRNGKey(3), cfg, scheduler,
                                    train=False)
        _, b, _ = forward_iteration(params, grid_state, batch,
                                    jax.random.PRNGKey(4), cfg, scheduler,
                                    train=False)
        assert abs(float(a) - float(b)) > 1e-6


class TestDemoUNet:
    def test_forward_shape_and_conditioning_bandwidth(self, key):
        cfg = demo_unet_config(16)
        assert cfg.ip_num_tokens == 16
        sd_cfg = SDNetworkConfig(
            sd=SDConfig(num_tokens=16, use_downsampling_layers=False,
                        cross_attention_dim=64, latent_size=16,
                        image_size=32),
            unet=cfg,
            vae=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                          norm_groups=8))
        # proj_dim without the CNN: 7 channels x 16^2 latent
        assert sd_cfg.proj_dim == 7 * 16 * 16
        from stable_nerf_tpu.models.diffusion.sd_network import sd_forward

        params = sd_network_init(key, sd_cfg)
        B = 2
        ks = jax.random.split(key, 2)
        noisy = jax.random.normal(ks[0], (B, 4, 16, 16))
        embeds = jax.random.normal(ks[1], (2 * B, 7, 16, 16))
        eps = sd_forward(params, noisy, jnp.full((B,), 10.0), embeds, sd_cfg)
        assert eps.shape == (B, 4, 16, 16)
        assert np.isfinite(np.asarray(eps)).all()


class TestVAENpzRoundtrip:
    def test_roundtrip_bit_identical(self, tmp_path, key):
        cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                        norm_groups=8, scaling_factor=3.7)
        params = vae_init(key, cfg)
        path = str(tmp_path / "vae.npz")
        vae_save_npz(path, params, cfg, meta={"recon_psnr_test": 31.5})
        params2, cfg2, meta = vae_load_npz(path)
        assert cfg2 == cfg
        assert meta["recon_psnr_test"] == 31.5
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_shape_mismatch_rejected(self, tmp_path, key):
        cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                        norm_groups=8)
        params = vae_init(key, cfg)
        path = str(tmp_path / "vae.npz")
        bad = dataclasses.replace(cfg, block_out_channels=(16, 48))
        with pytest.raises((ValueError, KeyError)):
            vae_save_npz(path, params, cfg)
            vae_load_npz.__wrapped__ if False else None
            # saved under cfg, loaded claiming a different architecture
            import json

            import numpy as np_

            data = dict(np_.load(path))
            header = json.loads(
                bytes(data["__vae_meta__"].tobytes()).decode())
            header["config"]["block_out_channels"] = list(
                bad.block_out_channels)
            data["__vae_meta__"] = np_.frombuffer(
                json.dumps(header).encode(), dtype=np_.uint8)
            np_.savez(path, **data)
            vae_load_npz(path)


class TestScaleIntrinsics:
    def _scene(self, tmp_path, n=4, size=32, focal=64.0):
        (tmp_path / "nerf").mkdir(parents=True, exist_ok=True)
        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        poses[:, 2, 3] = 2.0
        np.savez(tmp_path / "nerf" / "synthetic_spheres.npz",
                 images=rng.uniform(0, 1, (n, size, size, 3)).astype(
                     np.float32),
                 poses=poses, focal=np.float32(focal),
                 scene="synthetic_spheres")

    def test_quirk_default_unchanged(self, tmp_path):
        from stable_nerf_tpu.data.dataset import StableNeRFDataset

        self._scene(tmp_path)
        ds = StableNeRFDataset("synthetic", shape=16, encoded_shape=8,
                               root=str(tmp_path))
        np.testing.assert_allclose(ds.intrinsic, [138.0, 138.0, 4, 4])

    def test_scaled_focal_follows_capture(self, tmp_path):
        from stable_nerf_tpu.data.dataset import StableNeRFDataset

        # capture: focal 64 px at native 32 -> at encoded 8 the true pixel
        # focal is 64 * 8/32 = 16
        self._scene(tmp_path, size=32, focal=64.0)
        ds = StableNeRFDataset("synthetic", shape=16, encoded_shape=8,
                               root=str(tmp_path), scale_intrinsics=True)
        np.testing.assert_allclose(ds.intrinsic, [16.0, 16.0, 4, 4],
                                   rtol=1e-5)
