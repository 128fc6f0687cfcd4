"""Golden parity: reference torch UNetCFG1d vs jen1_tpu UNetCFG1d.

Builds the reference model on CPU with random weights, imports the state
dict through ckpt/torch_import, and compares forward outputs at matched
inputs — the strongest correctness evidence available without pretrained
weights (SURVEY §4 implication (b)).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from jen1_tpu.ckpt.torch_import import convert_reference_unet
from jen1_tpu.config import ModelConfig
from jen1_tpu.models.unet import unet_from_model_config
from tests.reference_compat import import_reference_unet

# tiny but structurally complete: patcher, 3 levels (one factor-1), attention
# at two levels + bottleneck, xattn time token, context channels at layer 0
# channels at attention levels must be >=32: the reference Transformer1d
# hardcodes GroupNorm(32, channels) (blocks.py:509)
MC = ModelConfig(
    in_channels=8,
    channels=16,
    multipliers=(1, 2, 2, 4),
    factors=(1, 2, 2),
    num_blocks=(1, 2, 1),
    attentions=(0, 1, 1),
    patch_size=1,
    resnet_groups=4,
    use_xattn_time=True,
    out_channels=8,
    context_channels=(9,),
    context_embedding_features=16,
    context_embedding_max_length=6,
    attention_heads=2,
    attention_features=None,
    attention_multiplier=2,
    dtype="float32",
    use_flash_attention=False,
    tie_transformer_projections=True,  # required for faithful import
)


@pytest.fixture(scope="module")
def models():
    ref_model = import_reference_unet()
    torch.manual_seed(0)
    ref = ref_model.UNetCFG1d(
        context_embedding_max_length=MC.context_embedding_max_length,
        context_embedding_features=MC.context_embedding_features,
        use_xattn_time=MC.use_xattn_time,
        in_channels=MC.in_channels,
        channels=MC.channels,
        multipliers=list(MC.multipliers),
        factors=list(MC.factors),
        num_blocks=list(MC.num_blocks),
        attentions=list(MC.attentions),
        patch_size=MC.patch_size,
        resnet_groups=MC.resnet_groups,
        kernel_multiplier_downsample=MC.kernel_multiplier_downsample,
        use_nearest_upsample=MC.use_nearest_upsample,
        use_skip_scale=MC.use_skip_scale,
        use_snake=MC.use_snake,
        use_stft=False,
        out_channels=MC.out_channels,
        context_features=MC.context_features,
        context_features_multiplier=MC.context_features_multiplier,
        context_channels=list(MC.context_channels),
        attention_heads=MC.attention_heads,
        attention_multiplier=MC.attention_multiplier,
    ).eval()

    ours = unet_from_model_config(MC)
    params = convert_reference_unet(ref.state_dict(), MC)
    return ref, ours, params


def _inputs(B=2, L=24, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(B, L, MC.in_channels)).astype(np.float32)
    t = np.linspace(0.2, 0.8, B).astype(np.float32)
    emb = rng.normal(
        size=(B, MC.context_embedding_max_length, MC.context_embedding_features)
    ).astype(np.float32)
    mask = np.ones((B, MC.context_embedding_max_length), dtype=bool)
    mask[0, 4:] = False
    concat = rng.normal(size=(B, L, 9)).astype(np.float32)
    return x, t, emb, mask, concat


def _torch_forward(ref, x, t, emb, mask, concat, **kw):
    with torch.no_grad():
        out = ref(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(t),
            embedding=torch.from_numpy(emb),
            embedding_mask=torch.from_numpy(mask),
            channels_list=[torch.from_numpy(concat.transpose(0, 2, 1))],
            **kw,
        )
    return out.numpy().transpose(0, 2, 1)


def _ours_forward(ours, params, x, t, emb, mask, concat, **kw):
    out = ours.apply(
        params,
        jnp.asarray(x),
        jnp.asarray(t),
        embedding=jnp.asarray(emb),
        embedding_mask=jnp.asarray(mask),
        channels_list=[jnp.asarray(concat)],
        **kw,
    )
    return np.asarray(out)


class TestReferenceParity:
    @pytest.mark.parametrize("causal", [False, True])
    def test_plain_forward(self, models, causal):
        ref, ours, params = models
        x, t, emb, mask, concat = _inputs()
        a = _torch_forward(ref, x, t, emb, mask, concat,
                           embedding_scale=1.0, causal=causal)
        b = _ours_forward(ours, params, x, t, emb, mask, concat,
                          embedding_scale=1.0, causal=causal)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-4)

    def test_cfg_batch_forward(self, models):
        ref, ours, params = models
        x, t, emb, mask, concat = _inputs(seed=1)
        kw = dict(embedding_scale=0.8, embedding_mask_proba=0.0,
                  batch_cfg=True, scale_cfg=True, scale_phi=0.7)
        a = _torch_forward(ref, x, t, emb, mask, concat, **kw)
        b = _ours_forward(ours, params, x, t, emb, mask, concat, **kw)
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)

    def test_cfg_double_forward_path(self, models):
        ref, ours, params = models
        x, t, emb, mask, concat = _inputs(seed=2)
        kw = dict(embedding_scale=0.5, batch_cfg=False, scale_cfg=False)
        a = _torch_forward(ref, x, t, emb, mask, concat, **kw)
        b = _ours_forward(ours, params, x, t, emb, mask, concat, **kw)
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-4)

    def test_all_imported_params_used(self, models):
        """Init our model fresh and check the imported tree covers the same
        leaves (no silently-missing parameters)."""
        import jax

        _, ours, params = models
        x, t, emb, mask, concat = _inputs()
        fresh = ours.init(
            jax.random.PRNGKey(0),
            jnp.asarray(x),
            jnp.asarray(t),
            embedding=jnp.asarray(emb),
            embedding_mask=jnp.asarray(mask),
            channels_list=[jnp.asarray(concat)],
            causal=False,
        )
        fresh_paths = {
            jax.tree_util.keystr(kp): leaf.shape
            for kp, leaf in jax.tree_util.tree_flatten_with_path(fresh)[0]
        }
        imp_paths = {
            jax.tree_util.keystr(kp): leaf.shape
            for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
        }
        assert fresh_paths == imp_paths


class TestSamplerTrajectoryParity:
    """Full multi-step DDIM trajectory vs the reference GaussianDiffusion
    (gdm.py:181-225) with IDENTICAL injected noise — closes the gap between
    forward parity and sample parity (BASELINE north star, VERDICT r1 #9).

    The reference sampler draws noise internally (torch.randn at gdm.py:195,
    torch.randn_like at gdm.py:218); the test precomputes the exact noise
    arrays our lax.scan sampler derives from its rng folding and feeds them
    to the reference via monkeypatched torch.randn/randn_like.
    """

    def test_ddim_trajectory_matches_reference(self, models):
        import sys
        from unittest import mock

        import jax

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        import jen1.diffusion.gdm.gdm as ref_gdm_mod

        from jen1_tpu.diffusion.gdm import GaussianDiffusion
        from jen1_tpu.diffusion.schedules import get_beta_schedule

        ref, ours, params = models
        steps, sampling = 16, 6
        betas, alphas = get_beta_schedule("cosine", steps)

        B, L = 2, 24
        shape = (B, L, MC.in_channels)

        # Reproduce the scan sampler's rng stream on the host.
        rngkey = jax.random.PRNGKey(42)
        rng_init, rng_loop = jax.random.split(rngkey)
        audio0 = np.asarray(jax.random.normal(rng_init, shape, jnp.float32))
        step_noises = []
        for i in range(sampling):
            step_rng = jax.random.fold_in(rng_loop, i)
            _, rng_noise = jax.random.split(step_rng)
            step_noises.append(
                np.asarray(jax.random.normal(rng_noise, shape, jnp.float32))
            )

        rng = np.random.default_rng(7)
        emb = rng.normal(
            size=(B, MC.context_embedding_max_length,
                  MC.context_embedding_features)
        ).astype(np.float32)
        emb_mask = np.ones((B, MC.context_embedding_max_length), dtype=bool)
        concat = rng.normal(size=(B, L, MC.in_channels + 1)).astype(np.float32)

        # ---- ours: the SHIPPED lax.scan sampler, jitted
        gdm = GaussianDiffusion(
            steps=steps, betas=betas, alphas=alphas, objective="v",
            loss_type="l2", cfg_dropout_proba=0.0, embedding_scale=0.8,
            batch_cfg=True, scale_cfg=True, sampling_timesteps=sampling,
            ddim_sampling_eta=1.0,
        )

        def model_fn(x, t, **kw):
            return ours.apply(params, x, t, **kw)

        cond = {
            "cross_attn_cond": jnp.asarray(emb),
            "cross_attn_masks": jnp.asarray(emb_mask),
            "global_cond": None,
            "input_concat_cond": jnp.asarray(concat),
        }
        out_ours = np.asarray(
            jax.jit(
                lambda r: gdm.ddim_sample(model_fn, shape, cond, r, causal=False)
            )(rngkey)
        )

        # ---- reference, with our noise injected
        ref_diff = ref_gdm_mod.GaussianDiffusion(
            steps=steps,
            betas=torch.from_numpy(np.asarray(betas, np.float32)),
            alphas=(None if alphas is None
                    else torch.from_numpy(np.asarray(alphas, np.float32))),
            objective="v", loss_type="l2", device="cpu",
            cfg_dropout_proba=0.0, embedding_scale=0.8,
            batch_cfg=True, scale_cfg=True, sampling_timesteps=sampling,
            ddim_sampling_eta=1.0,
        )
        cond_ref = {
            "cross_attn_cond": torch.from_numpy(emb),
            "cross_attn_masks": torch.from_numpy(emb_mask),
            "global_cond": None,
            "input_concat_cond": torch.from_numpy(concat.transpose(0, 2, 1)),
        }
        init_iter = iter([torch.from_numpy(audio0.transpose(0, 2, 1))])
        noise_iter = iter(
            [torch.from_numpy(n.transpose(0, 2, 1)) for n in step_noises]
        )
        with mock.patch.object(
            ref_gdm_mod.torch, "randn",
            side_effect=lambda *a, **k: next(init_iter),
        ), mock.patch.object(
            ref_gdm_mod.torch, "randn_like",
            side_effect=lambda *a, **k: next(noise_iter),
        ):
            out_ref = ref_diff.ddim_sample(
                ref, (B, MC.in_channels, L), cond_ref, causal=False
            )

        np.testing.assert_allclose(
            out_ours, out_ref.numpy().transpose(0, 2, 1), rtol=2e-2, atol=2e-3
        )


class TestTorchExportRoundtrip:
    def test_export_import_roundtrip(self, models):
        """export -> reference state_dict -> import reproduces the exact
        param tree (both directions of the framework switch)."""
        import jax

        from jen1_tpu.ckpt.torch_export import export_reference_unet

        _, _, params = models
        sd = export_reference_unet(params, MC)
        back = convert_reference_unet(sd, MC)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(
            (jax.tree_util.keystr(kp), leaf)
            for kp, leaf in jax.tree_util.tree_flatten_with_path(back)[0]
        )
        assert len(flat_a) == len(flat_b)
        for kp, leaf in flat_a:
            key = jax.tree_util.keystr(kp)
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[key]), err_msg=key
            )

    def test_exported_loads_into_reference_model(self, models):
        """The exported state_dict load_state_dict's into the actual torch
        reference model with strict=True."""
        from jen1_tpu.ckpt.torch_export import export_reference_unet

        ref, _, params = models
        sd = export_reference_unet(params, MC)
        missing, unexpected = ref.load_state_dict(sd, strict=False)
        assert not unexpected, unexpected[:5]
        assert not missing, missing[:5]

    def test_save_and_jen1_load(self, models, tmp_path):
        """save_reference_checkpoint writes a .pth the torch importer (and
        therefore Jen1) reads back."""
        from jen1_tpu.ckpt.torch_export import save_reference_checkpoint
        from jen1_tpu.ckpt.torch_import import load_reference_checkpoint

        _, _, params = models
        path = str(tmp_path / "export.pth")
        save_reference_checkpoint(path, params, MC, epoch=3, learning_rate=1e-4)
        loaded, epoch, lr = load_reference_checkpoint(path, MC)
        assert epoch == 3 and abs(lr - 1e-4) < 1e-12
        a = np.asarray(
            loaded["params"]["unet"]["to_mapping_1"]["kernel"])
        b = np.asarray(params["params"]["unet"]["to_mapping_1"]["kernel"])
        np.testing.assert_array_equal(a, b)


class TestVDMTrajectoryParity:
    """VDM (the generate() DEFAULT diffusion) full-loop parity.

    The reference VDM sampler cannot run as written: p_sample indexes its
    alpha table with the float time VALUE (vdm.py:52-54, SURVEY §2.5 #10)
    and feeds the model a 0-d time tensor. The test therefore drives the
    reference's verbatim update equations (x_pred/noise_pred/x mix,
    vdm.py:53-55) with only those two mechanical fixes applied, injected
    with OUR sampler's exact initial noise — locking our scan sampler to the
    reference's intended math through the real torch model incl. CFG.
    """

    def test_vdm_trajectory_matches_reference_intent(self, models):
        import math

        import jax

        from jen1_tpu.diffusion.vdm import VDM

        ref, ours, params = models
        steps = 6
        B, L = 2, 24
        shape = (B, L, MC.in_channels)

        rngkey = jax.random.PRNGKey(77)
        rng_init, _ = jax.random.split(rngkey)
        audio0 = np.asarray(jax.random.normal(rng_init, shape, jnp.float32))

        rng = np.random.default_rng(8)
        emb = rng.normal(
            size=(B, MC.context_embedding_max_length,
                  MC.context_embedding_features)).astype(np.float32)
        emb_mask = np.ones((B, MC.context_embedding_max_length), dtype=bool)
        concat = rng.normal(size=(B, L, MC.in_channels + 1)).astype(np.float32)

        # ---- ours: the SHIPPED lax.scan sampler
        vdm = VDM(loss_type="l2", cfg_dropout_proba=0.0, embedding_scale=0.8,
                  batch_cfg=True, scale_cfg=True)

        def model_fn(x, t, **kw):
            return ours.apply(params, x, t, **kw)

        cond = {
            "cross_attn_cond": jnp.asarray(emb),
            "cross_attn_masks": jnp.asarray(emb_mask),
            "global_cond": None,
            "input_concat_cond": jnp.asarray(concat),
        }
        out_ours = np.asarray(jax.jit(
            lambda r: vdm.sample(model_fn, shape, cond, r, step=steps)
        )(rngkey))

        # ---- reference equations (vdm.py:53-55) through the torch model
        x = torch.from_numpy(audio0.transpose(0, 2, 1))
        grid = np.linspace(1.0, 0.0, steps + 1, dtype=np.float32)
        with torch.no_grad():
            for i in range(steps):
                t_val, t_next = float(grid[i]), float(grid[i + 1])
                time_cond = torch.full((B,), t_val)
                v_pred = ref(
                    x, time_cond,
                    embedding=torch.from_numpy(emb),
                    embedding_mask=torch.from_numpy(emb_mask),
                    embedding_scale=0.8,
                    embedding_mask_proba=0.0,
                    channels_list=[torch.from_numpy(concat.transpose(0, 2, 1))],
                    batch_cfg=True, scale_cfg=True, causal=False,
                )
                a_s, s_s = math.cos(t_val * math.pi / 2), math.sin(t_val * math.pi / 2)
                a_t, s_t = math.cos(t_next * math.pi / 2), math.sin(t_next * math.pi / 2)
                x_pred = a_s * x - s_s * v_pred
                noise_pred = s_s * x + a_s * v_pred
                x = a_t * x_pred + s_t * noise_pred

        np.testing.assert_allclose(
            out_ours, x.numpy().transpose(0, 2, 1), rtol=2e-2, atol=2e-3
        )
