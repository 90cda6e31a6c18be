"""MetricsLogger + training visualization smoke tests (VERDICT r1 #8).

The reference logs scalars to wandb (trainer/distillation.py:387-407) and
decoded video triplets (trainer/ode.py:190-209). wandb is not in this
image, so the wandb path is exercised with a stub module.
"""
import json
import os
import sys
import types

import numpy as np


def _read_jsonl(path):
    with open(path) as f:
        return [json.loads(line) for line in f]


def test_jsonl_sink(tmp_path):
    from self_forcing_tpu.utils.metrics import MetricsLogger
    lg = MetricsLogger(str(tmp_path), disable_wandb=True)
    lg.log({"loss": 1.5, "arr": np.ones(4)}, step=3)
    lg.close()
    recs = _read_jsonl(tmp_path / "metrics.jsonl")
    assert recs[0]["loss"] == 1.5
    assert recs[0]["arr"] == 1.0  # size>1 arrays reduce to their mean
    assert recs[0]["step"] == 3


def test_non_main_is_noop(tmp_path):
    from self_forcing_tpu.utils.metrics import MetricsLogger
    lg = MetricsLogger(str(tmp_path / "x"), is_main=False)
    lg.log({"loss": 1.0})
    assert lg.log_video("v", np.zeros((2, 8, 8, 3)), step=0) is None
    lg.close()
    assert not os.path.exists(tmp_path / "x")


class _StubWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.init_kwargs = None
        self.logged = []
        self.finished = False

    def init(self, **kw):
        self.init_kwargs = kw

    def Video(self, data, caption=None, fps=None, format=None):  # noqa: N802
        return ("video", data.shape, fps)

    def log(self, d, step=None):
        self.logged.append((d, step))

    def finish(self):
        self.finished = True


def test_wandb_enabled_path(tmp_path, monkeypatch):
    stub = _StubWandb()
    monkeypatch.setitem(sys.modules, "wandb", stub)
    from self_forcing_tpu.utils.metrics import MetricsLogger
    lg = MetricsLogger(str(tmp_path), disable_wandb=False,
                       wandb_kwargs={"project": "p", "entity": "e"})
    assert stub.init_kwargs == {"project": "p", "entity": "e"}
    lg.log({"loss": 2.0}, step=1)
    video = np.random.default_rng(0).random((3, 16, 16, 3)).astype(np.float32)
    path = lg.log_video("output", video, step=1, fps=4)
    lg.close()
    assert stub.finished
    # scalar + video both reached the stub
    assert ({"loss": 2.0}, 1) in stub.logged
    vid_logs = [d for d, _ in stub.logged if "output" in d]
    assert vid_logs and vid_logs[0]["output"][1] == (3, 3, 16, 16)  # TCHW
    # mp4 written regardless of wandb
    assert path and os.path.exists(path)
    assert os.path.getsize(path) > 0


def test_log_video_uint8_passthrough(tmp_path):
    from self_forcing_tpu.utils.metrics import MetricsLogger
    lg = MetricsLogger(str(tmp_path), disable_wandb=True)
    path = lg.log_video("gt", np.zeros((2, 8, 8, 3), np.uint8), step=7)
    lg.close()
    assert path.endswith("gt_000007.mp4") and os.path.exists(path)


def test_ode_trainer_exposes_visual_triplet():
    """trainer_ode stashes input/output/ground-truth latents for the
    visualization hook (reference trainer/ode.py:190-209)."""
    import jax
    import jax.numpy as jnp
    from self_forcing_tpu.config import Config
    from self_forcing_tpu.models.wan import dit
    from self_forcing_tpu.models.wan.configs import WAN_TINY
    from self_forcing_tpu.training.trainer_ode import ODETrainer

    config = Config({
        "denoising_step_list": [1000, 750, 500, 250],
        "timestep_shift": 5.0, "lr": 1e-4, "num_frame_per_block": 1,
        "seed": 0,
    })
    params = dit.init_params(jax.random.PRNGKey(0), WAN_TINY, jnp.float32)
    trainer = ODETrainer(config, params, WAN_TINY)
    assert trainer.last_visual is None
    B, T, F, C, H, W = 1, 4, 2, 16, 8, 8
    key = jax.random.PRNGKey(1)
    batch = {
        "ode_latent": jax.random.normal(key, (B, T, F, C, H, W)),
        "context": jax.random.normal(jax.random.fold_in(key, 1),
                                     (B, 8, WAN_TINY.text_dim)),
    }
    log = trainer.train_step(batch)
    assert np.isfinite(log["loss"])
    vis = trainer.last_visual
    assert set(vis) == {"input", "output", "ground_truth"}
    for v in vis.values():
        assert v.shape == (B, F, C, H, W)
    # scalar log must not contain the latent triplet
    assert "input" not in log and "output" not in log
