"""VGGish FAD embedder: torch-mock weight-import parity + input pipeline."""

import jax.numpy as jnp
import numpy as np
import pytest

from jen1_tpu.eval.vggish import (
    EXAMPLE_FRAMES,
    NUM_MELS,
    VGGishEmbedder,
    convert_torch_vggish,
    init_vggish_params,
    vggish_forward,
    waveform_to_examples,
)

# compile-heavy end-to-end module: excluded from `pytest -m 'not slow'`
pytestmark = pytest.mark.slow


def _torch_vggish():
    """Faithful torch mock of torchvggish's VGG (state-dict key compatible:
    features.{0,3,6,8,11,13}, embeddings.{0,2,4})."""
    import torch.nn as nn

    class VGG(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                nn.Conv2d(1, 64, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(64, 128, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
                nn.Conv2d(256, 512, 3, padding=1), nn.ReLU(True),
                nn.Conv2d(512, 512, 3, padding=1), nn.ReLU(True),
                nn.MaxPool2d(2, 2),
            )
            self.embeddings = nn.Sequential(
                nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                nn.Linear(4096, 4096), nn.ReLU(True),
                nn.Linear(4096, 128), nn.ReLU(True),
            )

        def forward(self, x):
            import torch

            x = self.features(x)
            x = torch.transpose(x, 1, 3)
            x = torch.transpose(x, 1, 2)
            x = x.contiguous().view(x.size(0), -1)
            return self.embeddings(x)

    return VGG()


class TestVGGish:
    def test_torch_import_parity(self):
        import torch

        torch.manual_seed(0)
        mock = _torch_vggish().eval()
        params = convert_torch_vggish(mock.state_dict())

        rng = np.random.default_rng(0)
        ex = rng.normal(size=(3, EXAMPLE_FRAMES, NUM_MELS)).astype(np.float32)
        with torch.no_grad():
            ref = mock(torch.from_numpy(ex[:, None]))  # (B, 1, 96, 64)
        got = vggish_forward(params, jnp.asarray(ex))
        np.testing.assert_allclose(
            np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-4
        )

    def test_waveform_pipeline_shapes(self):
        # 2.0 s at 16 kHz -> 197 mel frames -> 2 non-overlapping examples
        audio = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 32_000)), jnp.float32
        )
        ex = waveform_to_examples(audio)
        assert ex.shape == (2 * 2, EXAMPLE_FRAMES, NUM_MELS)
        assert bool(jnp.isfinite(ex).all())

    def test_embedder_fad_integration(self):
        from jen1_tpu.eval.metrics import frechet_audio_distance

        with pytest.warns(UserWarning, match="RANDOM-initialized"):
            emb = VGGishEmbedder(sample_rate=48_000, seed=0)
        rng = np.random.default_rng(2)
        # 1.2 s at 48 kHz stereo, resampled internally to 16 kHz
        a = jnp.asarray(rng.normal(size=(4, 57_600, 2)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(4, 57_600, 2)) * 0.5, jnp.float32)
        fad_same = frechet_audio_distance(a, a, embed_fn=emb)
        fad_diff = frechet_audio_distance(a, b, embed_fn=emb)
        assert fad_same < 1e-3
        assert fad_diff > fad_same
