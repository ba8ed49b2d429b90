"""True multi-process (2-host simulation) training test on the CPU backend.

The reference sets `sync_dist=True` on every Lightning log call but never runs
multi-device (`/root/reference/train.py:84-85`), so the intent is untested there.
Here we launch TWO separate Python processes joined via `jax.distributed.initialize`
(CPU backend, 2 local devices each -> a 4-device global mesh) and run a real
`Trainer.fit` epoch in each. Asserts:

  * every host logs IDENTICAL val metrics (globally-synchronized batch schedule +
    global per-batch SPMD losses — see matcha_tpu/data/dataset.py::batch_iterator);
  * the distributed Orbax checkpoint write succeeds with every process participating
    (rank-0-only index/GC), and records the shared val loss.

Runs as a subprocess pair because a single pytest process cannot host two JAX
distributed clients.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
os.environ.pop("PYTEST_CURRENT_TEST", None)
import jax
# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; the platform must be
# forced via jax.config BEFORE backend init (same as tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
coordinator, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 4

from matcha_tpu.data.dataset import DataConfig, SyntheticDataset
from matcha_tpu.models.matcha import MatchaConfig
from matcha_tpu.nn.decoder import DecoderConfig
from matcha_tpu.nn.encoder import EncoderConfig
from matcha_tpu.train.trainer import TrainConfig, Trainer

TINY = MatchaConfig(
    n_feats=8,
    encoder=EncoderConfig(n_feats=8, n_channels=16, filter_channels=32, n_heads=2,
                          n_layers=1, filter_channels_dp=16),
    decoder=DecoderConfig(in_channels=16, out_channels=8, channels=(16, 16),
                          attention_head_dim=8, num_heads=2, num_mid_blocks=1),
)

from matcha_tpu.audio.mel import MelConfig
mel_cfg = MelConfig(n_mels=8)
train_ds = SyntheticDataset(n_items=16, mel_cfg=mel_cfg, min_frames=64, max_frames=96)
val_ds = SyntheticDataset(n_items=8, mel_cfg=mel_cfg, min_frames=64, max_frames=96, seed=1)

trainer = Trainer(
    model_cfg=TINY,
    train_cfg=TrainConfig(accumulate_steps=1, mas_impl="ref", ckpt_dir=workdir,
                          log_every=1, max_epochs=1),
    data_cfg=DataConfig(batch_size=2, text_pad_multiple=16, mel_pad_multiple=16),
)
trainer.fit(train_ds, val_ds, max_epochs=1)
trainer.logger.close()
print("WORKER_DONE", pid)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _val_rows(path):
    rows = []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if any(k.startswith("val/") for k in row):
                rows.append(row)
    return rows


@pytest.mark.slow
def test_two_process_training_agrees(tmp_path):
    port = _free_port()
    coordinator = f"localhost:{port}"
    workdir = str(tmp_path / "ck")
    env = dict(os.environ)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coordinator, str(pid), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER_DONE {pid}" in out

    # identical val metrics logged on both hosts
    rows0 = _val_rows(Path(workdir) / "logs" / "metrics.jsonl")
    rows1 = _val_rows(Path(workdir) / "logs" / "metrics_rank1.jsonl")
    assert len(rows0) == len(rows1) == 1
    for k in ("val/loss", "val/dur_loss", "val/prior_loss", "val/diff_loss"):
        np.testing.assert_allclose(rows0[0][k], rows1[0][k], rtol=1e-6,
                                   err_msg=f"hosts disagree on {k}")
    # both hosts logged the same number of train steps (lockstep schedule):
    # 16 items / (2 per-host batch * 2 hosts) = 4 global steps
    assert rows0[0]["step"] == rows1[0]["step"] == 4

    # the distributed checkpoint landed, ranked by the shared val loss
    index = json.loads((Path(workdir) / "index.json").read_text())
    assert len(index["entries"]) == 1
    np.testing.assert_allclose(index["entries"][0]["val_loss"], rows0[0]["val/loss"],
                               rtol=1e-6)


@pytest.mark.slow
def test_cli_bringup_two_processes(tmp_path):
    """Multi-host bring-up through the REAL CLI path a pod launcher would use.

    Unlike test_two_process_training_agrees (which calls
    `jax.distributed.initialize` inline), the workers here run
    `python -m matcha_tpu.cli.train --tiny` with only coordinator env vars set —
    covering `matcha_tpu.parallel.init_distributed`'s env-guarded bring-up
    (called before any backend-touching JAX call, cli/train.py) end to end.
    A rank-1 metrics file proves the processes actually joined one 2-process
    runtime rather than each running standalone as rank 0.
    """
    port = _free_port()
    workdir = str(tmp_path / "ck")
    repo = str(Path(__file__).resolve().parent.parent)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_NUM_CPU_DEVICES", None)
        env.pop("PYTEST_CURRENT_TEST", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "matcha_tpu.cli.train", "--tiny",
             "--ckpt-dir", workdir, "--batch-size", "2", "--max-epochs", "1",
             "--mas-impl", "ref", "--no-resume"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd=repo,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"CLI worker {pid} failed:\n{out[-4000:]}"

    rows0 = _val_rows(Path(workdir) / "logs" / "metrics.jsonl")
    rows1 = _val_rows(Path(workdir) / "logs" / "metrics_rank1.jsonl")
    assert len(rows0) == len(rows1) == 1
    for k in ("val/loss", "val/dur_loss", "val/prior_loss", "val/diff_loss"):
        np.testing.assert_allclose(rows0[0][k], rows1[0][k], rtol=1e-6,
                                   err_msg=f"hosts disagree on {k}")
    # 16 items / (2 per-host batch * 2 hosts) = 4 global steps
    assert rows0[0]["step"] == rows1[0]["step"] == 4
    assert (Path(workdir) / "index.json").exists()


@pytest.mark.slow
def test_cli_vocoder_bringup_two_processes(tmp_path):
    """Vocoder GAN trainer through the same 2-process CLI bring-up path: the
    wav segment schedule is host-synchronized and per-batch GAN val metrics are
    global SPMD means, so both ranks must log identical val/mel_l1."""
    port = _free_port()
    workdir = str(tmp_path / "vck")
    repo = str(Path(__file__).resolve().parent.parent)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_NUM_CPU_DEVICES", None)
        env.pop("PYTEST_CURRENT_TEST", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "matcha_tpu.cli.train_vocoder", "--tiny",
             "--ckpt-dir", workdir, "--batch-size", "2", "--epochs", "1",
             "--segment-size", "2048", "--no-resume"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
            cwd=repo,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"vocoder worker {pid} failed:\n{out[-4000:]}"

    rows0 = _val_rows(Path(workdir) / "logs" / "metrics.jsonl")
    rows1 = _val_rows(Path(workdir) / "logs" / "metrics_rank1.jsonl")
    assert len(rows0) == len(rows1) == 1
    np.testing.assert_allclose(rows0[0]["val/mel_l1"], rows1[0]["val/mel_l1"],
                               rtol=1e-6, err_msg="hosts disagree on val/mel_l1")
    # 8 items / (2 per-host batch * 2 hosts) = 2 global GAN steps
    assert rows0[0]["step"] == rows1[0]["step"] == 2
    assert (Path(workdir) / "index.json").exists()
