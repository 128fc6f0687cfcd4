"""bench.py smoke: the driver deliverable's code path runs end-to-end at
toy dims on CPU (JEN1_BENCH_TINY=1) and emits a parseable JSON line with a
nonzero value. The driver only ever runs bench.py full-size on real TPU, so
without this a regression would surface as a silent 0.0 in BENCH_r{N}.json.
"""

import json
import os
import subprocess
import sys
import pytest


@pytest.mark.slow


def test_bench_tiny_mode_emits_json(tmp_path):
    env = dict(os.environ)
    env.update({
        "_JEN1_BENCH_CHILD": "1",
        "_JEN1_BENCH_RESULT": str(tmp_path / "result.json"),
        "JEN1_BENCH_TINY": "1",
        "JEN1_BENCH_STEPS": "2",
        "JEN1_BENCH_PIPELINE": "2",
        # force the CPU backend via jax.config inside the child — env vars
        # are ignored by the pre-registered axon TPU plugin, whose init can
        # block forever when the tunnel is down (bench.py JEN1_BENCH_PLATFORM)
        "JEN1_BENCH_PLATFORM": "cpu",
    })
    env.setdefault("XLA_FLAGS", "")
    if "xla_backend_optimization_level" not in env["XLA_FLAGS"]:
        env["XLA_FLAGS"] += (" --xla_backend_optimization_level=0"
                             " --xla_llvm_disable_expensive_passes=true")
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    proc = subprocess.run(
        [sys.executable, bench], env=env, capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads((tmp_path / "result.json").read_text())
    assert result["value"] > 0
