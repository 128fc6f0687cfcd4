"""Conditioner tests, incl. T5 encoder architecture parity vs torch HF."""

import numpy as np
import jax.numpy as jnp
import pytest

from jen1_tpu.config import ConditionerConfig, IntConfig, NumberConfig, T5Config
from jen1_tpu.conditioning.conditioners import (
    IntConditioner,
    MultiConditioner,
    NumberConditioner,
    T5Conditioner,
    assemble_conditioning,
    create_multi_conditioner,
)
from jen1_tpu.conditioning.t5 import (
    T5Encoder,
    T5EncoderConfig,
    convert_hf_t5_encoder,
)
from jen1_tpu.conditioning.tokenizer import ByteTokenizer


class TestT5Parity:
    @pytest.mark.parametrize("proj", ["gated-gelu", "relu"])
    def test_matches_hf_torch_random_weights(self, proj):
        """Architecture parity: random-weight HF torch T5EncoderModel vs ours."""
        import torch
        from transformers import T5Config as HFT5Config
        from transformers import T5EncoderModel

        cfg = T5EncoderConfig(
            vocab_size=99, d_model=32, d_kv=8, num_heads=4, d_ff=48,
            num_layers=3, feed_forward_proj=proj,
        )
        hf_cfg = HFT5Config(
            vocab_size=99, d_model=32, d_kv=8, num_heads=4, d_ff=48,
            num_layers=3, num_decoder_layers=0,
            feed_forward_proj="gated-gelu" if proj == "gated-gelu" else "relu",
            dropout_rate=0.0,
        )
        torch.manual_seed(0)
        hf = T5EncoderModel(hf_cfg).eval()

        rng = np.random.default_rng(0)
        B, L = 2, 17
        ids = rng.integers(0, 99, size=(B, L)).astype(np.int32)
        mask = np.ones((B, L), dtype=np.int64)
        mask[0, 11:] = 0  # padded tail

        with torch.no_grad():
            ref = hf(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask),
            ).last_hidden_state.numpy()

        params = convert_hf_t5_encoder(hf.state_dict(), cfg)
        enc = T5Encoder(cfg)
        out = enc.apply(params, jnp.asarray(ids), jnp.asarray(mask.astype(bool)))
        # Padded positions attend differently in HF (they're fully masked rows);
        # compare only valid positions.
        valid = mask.astype(bool)
        np.testing.assert_allclose(
            np.asarray(out)[valid], ref[valid], rtol=2e-4, atol=2e-4
        )


class TestTokenizer:
    def test_byte_tokenizer_deterministic(self):
        tok = ByteTokenizer()
        ids1, m1 = tok(["hello world", ""], 16)
        ids2, m2 = tok(["hello world", ""], 16)
        np.testing.assert_array_equal(ids1, ids2)
        assert ids1.shape == (2, 16)
        assert m1[0].sum() == len("hello world") + 1  # + eos
        assert m1[1].sum() == 1  # just eos

    def test_truncation(self):
        tok = ByteTokenizer()
        ids, m = tok(["x" * 100], 8)
        assert ids.shape == (1, 8)
        assert m.all()


class TestConditioners:
    def test_t5_conditioner_shapes(self):
        cond = T5Conditioner(output_dim=16, t5_model_name="tiny-test", max_length=12)
        emb, mask = cond(["a beautiful song", "piano"])
        assert emb.shape == (2, 12, 16)
        assert mask.shape == (2, 12)
        # masked positions are zeroed (reference conditioners.py:109)
        emb_np, mask_np = np.asarray(emb), np.asarray(mask)
        assert np.all(emb_np[~mask_np.astype(bool)] == 0)

    def test_int_conditioner(self):
        c = IntConditioner(output_dim=8, min_val=0, max_val=10)
        emb, mask = c([0, 5, 99])  # 99 clamps to 10
        assert emb.shape == (3, 1, 8)
        np.testing.assert_array_equal(
            np.asarray(c([10])[0]), np.asarray(c([99])[0])
        )

    def test_number_conditioner(self):
        c = NumberConditioner(output_dim=8, min_val=0, max_val=100)
        emb, mask = c([0.0, 50.0, 100.0])
        assert emb.shape == (3, 1, 8)
        assert not np.allclose(np.asarray(emb[0]), np.asarray(emb[1]))

    def test_multi_conditioner_all_types_built(self):
        """The reference only ever builds the first type (SURVEY §2.5 #4)."""
        cfg = ConditionerConfig(
            cond_dim=16,
            conditioning_type=("t5", "int", "number"),
            t5_config=T5Config(t5_model_name="tiny-test", max_length=8),
            int_config=IntConfig(max_val=16),
            number_config=NumberConfig(max_val=100),
        )
        mc = create_multi_conditioner(cfg)
        assert set(mc.conditioners) == {"prompt", "seconds_start", "seconds_total"}
        out = mc(
            [
                {"prompt": "a song", "seconds_start": 3, "seconds_total": 60.0},
                {"prompt": ["wrapped"], "seconds_start": 1, "seconds_total": 30.0},
            ]
        )
        assert out["prompt"][0].shape == (2, 8, 16)
        assert out["seconds_start"][0].shape == (2, 1, 16)

    def test_prompt_only_metadata_fills_optional_keys(self):
        """ADVICE r1 (high): prompt-only metadata (the datasets' and
        generate()'s default) must not crash when int/number conditioners are
        configured — missing optional keys fall back to min_val."""
        cfg = ConditionerConfig(
            cond_dim=16,
            conditioning_type=("t5", "int", "number"),
            t5_config=T5Config(t5_model_name="tiny-test", max_length=8),
            int_config=IntConfig(max_val=16),
            number_config=NumberConfig(max_val=100),
        )
        mc = create_multi_conditioner(cfg)
        out = mc([{"prompt": "a song"}, {"prompt": ""}])
        assert out["seconds_start"][0].shape == (2, 1, 16)
        # fill equals an explicit min_val entry
        explicit = mc([{"prompt": "a song", "seconds_start": 0},
                       {"prompt": "", "seconds_start": 0}])
        np.testing.assert_array_equal(
            np.asarray(out["seconds_start"][0]),
            np.asarray(explicit["seconds_start"][0]),
        )

    def test_default_config_is_t5_only(self):
        """Default conditioning_type matches the reference's effective
        behavior (factory bug builds only 't5', script_util.py:156-178)."""
        assert ConditionerConfig().conditioning_type == ("t5",)

    def test_missing_key_raises(self):
        cfg = ConditionerConfig(
            cond_dim=8,
            conditioning_type=("t5",),
            t5_config=T5Config(t5_model_name="tiny-test", max_length=8),
        )
        mc = create_multi_conditioner(cfg)
        with pytest.raises(ValueError, match="not found"):
            mc([{"wrong_key": "x"}])

    def test_assemble_conditioning(self):
        B, L = 2, 10
        cond = {
            "prompt": (jnp.ones((B, 8, 16)), jnp.ones((B, 8))),
            "masked_input": jnp.ones((B, L, 4)),
            "mask": jnp.zeros((B, L, 1)),
        }
        out = assemble_conditioning(cond)
        assert out["cross_attn_cond"].shape == (B, 8, 16)
        assert out["cross_attn_masks"].shape == (B, 8)
        assert out["input_concat_cond"].shape == (B, L, 5)
        assert out["global_cond"] is None
