"""Multi-host smoke test: 2 localhost processes, one global 8-device mesh.

Launches two real OS processes that bring up jax.distributed (CPU backend,
4 virtual devices each — the standard JAX stand-in for a 2-host TPU pod
slice), build the global mesh, and run sharded train steps whose gradient
psums cross the process boundary. The reference has no distributed
backend at all (SURVEY §2 parallelism inventory); this covers the
BASELINE multi-host delta end to end.

The worker run is gated behind RAIN_TPU_RUN_SLOW=1 (two fresh-process
compiles); the process-0 file-gating unit test always runs.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif(os.environ.get("RAIN_TPU_RUN_SLOW") != "1",
                    reason="two-process run; set RAIN_TPU_RUN_SLOW=1")
def test_two_process_global_mesh(tmp_path):
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(i), str(outs[i])],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    res = [json.loads(o.read_text()) for o in outs]
    # both controllers observed the identical replicated computation
    np.testing.assert_allclose(res[0]["losses"], res[1]["losses"],
                               rtol=0, atol=0)
    np.testing.assert_allclose(res[0]["xyz0"], res[1]["xyz0"],
                               rtol=0, atol=0)


def test_trainer_gates_writes_to_process_zero(tmp_path, monkeypatch):
    """A non-zero process must not write checkpoints/PLYs/TB/log files
    (multi-host runs share one model_path — only process 0 writes)."""
    import jax
    from tests.test_training import _make_scene
    from rain_tpu import config as cfg_mod
    from rain_tpu.train.trainer import Trainer
    import dataclasses

    monkeypatch.setattr(jax, "process_index", lambda: 1)
    scene = _make_scene(n_cams=3, n_pts=60, size=48)
    parser = cfg_mod.build_parser("t")
    cfgs = cfg_mod.extract_all(parser.parse_args([]))
    cfgs["opt"] = dataclasses.replace(cfgs["opt"], iterations=2,
                                      densify_from_iter=10_000)
    cfgs["system"] = dataclasses.replace(cfgs["system"], capacity=128,
                                         max_instances=4096)
    out = tmp_path / "model"
    trainer = Trainer(scene, cfgs, str(out), log_fn=lambda *a: None)
    assert trainer.tb is None            # no TB event files
    trainer.train(iterations=2, test_iterations=(2,),
                  save_iterations=(2,), checkpoint_iterations=(2,))
    files = [p for p in out.rglob("*") if p.is_file()]
    assert files == [], f"process 1 wrote {files}"
