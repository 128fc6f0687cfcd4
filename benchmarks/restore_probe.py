"""Time init_state vs orbax restore vs host-restore+device_put against the
train-run checkpoint."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
from jen1_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
import jax, jax.numpy as jnp

t0 = time.time()
from jen1_tpu.config import Config
from jen1_tpu.train.train import build_trainer
from jen1_tpu.ckpt.checkpoint import CheckpointManager

cfg = Config.from_json("/tmp/jen1_train_run/config.json")
trainer = build_trainer(cfg, mesh=None)
print(f"build_trainer {time.time()-t0:.1f}s", flush=True)

# template batch (mirrors train.py)
from jen1_tpu.data.dataset import LatentDataset
ds = LatentDataset(cfg.dataset_config.latents_dir)
probe, meta = ds[0]
t0 = time.time()
batch = trainer.prepare_batch(
    probe[None].repeat(cfg.dataset_config.batch_size, axis=0),
    [meta] * cfg.dataset_config.batch_size)
print(f"prepare_batch {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batch)
jax.block_until_ready(state.params)
t_init = time.time()-t0
print(f"init_state {t_init:.1f}s", flush=True)

ckpt = CheckpointManager("/tmp/jen1_train_run/ckpts")
t0 = time.time()
restored, m = ckpt.restore(template=state)
jax.block_until_ready(restored.params)
t_restore = time.time()-t0
print(f"orbax restore (device template) {t_restore:.1f}s", flush=True)
