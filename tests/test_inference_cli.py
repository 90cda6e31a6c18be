"""inference.py CLI: i2v eval via TextImagePairDataset (VERDICT r1
missing #3; reference inference.py:83-150)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

CONFIG = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                      "configs", "tiny_test.yaml")


def _make_i2v_dataset(root):
    from PIL import Image
    os.makedirs(root / "images", exist_ok=True)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 48, 3), np.uint8)
    Image.fromarray(img).save(root / "images" / "a.png")
    meta = [{"image_name": "a.png", "caption": "a tiny test video"}]
    with open(root / "target_crop_info_tiny.json", "w") as f:
        json.dump(meta, f)


@pytest.mark.slow
def test_i2v_cli_writes_video(tmp_path, monkeypatch):
    import inference as inf
    _make_i2v_dataset(tmp_path)
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "inference.py", "--config_path", CONFIG,
        "--data_path", str(tmp_path), "--output_folder", str(out),
        "--num_output_frames", "3", "--i2v", "--save_with_index"])
    inf.main()
    files = os.listdir(out)
    assert files == ["output_000.mp4"]
    from self_forcing_tpu.utils.video_io import load_video
    vid = load_video(str(out / files[0]))
    # 3 latent frames -> 1 + 2*4 = 9 pixel frames at 8x upsampling
    assert vid.shape == (9, 64, 64, 3)


def test_dwpose_with_few_step_config_raises(tmp_path, monkeypatch):
    import pytest

    import inference as inf
    np.savez(tmp_path / "pose.npz",
             dwpose_data=np.zeros((3, 9, 64, 64), np.uint8))
    monkeypatch.setattr(sys, "argv", [
        "inference.py", "--config_path", CONFIG,
        "--data_path", "prompts/test_prompts.txt",
        "--output_folder", str(tmp_path / "o"),
        "--dwpose_path", str(tmp_path / "pose.npz")])
    with pytest.raises(ValueError, match="diffusion pipeline"):
        inf.main()


@pytest.mark.slow
def test_pose_diffusion_cli(tmp_path, monkeypatch):
    """Pose-conditioned 50-step CLI path at tiny size (random pose
    embeddings stand in for the UniAnimate weights)."""
    import yaml

    import inference as inf
    with open(CONFIG) as f:
        cfg = yaml.safe_load(f)
    cfg.pop("denoising_step_list")          # -> diffusion pipeline
    cfg["sampling_steps"] = 2
    cfg["guidance_scale"] = 1.5
    cfg_path = tmp_path / "tiny_diffusion.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    np.savez(tmp_path / "pose.npz",
             dwpose_data=np.random.default_rng(0).integers(
                 0, 255, (3, 9, 64, 64), np.uint8),
             random_ref_dwpose=np.random.default_rng(1).integers(
                 0, 255, (64, 64, 3), np.uint8))
    out = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "inference.py", "--config_path", str(cfg_path),
        "--data_path", "prompts/test_prompts.txt",
        "--output_folder", str(out), "--num_output_frames", "3",
        "--dwpose_path", str(tmp_path / "pose.npz"), "--save_with_index"])
    inf.main()
    assert any(f.endswith(".mp4") for f in os.listdir(out))


@pytest.mark.slow
def test_tp_cli_writes_video(tmp_path, monkeypatch):
    """--tp 2 shards the tiny model over two CPU devices and the few-step
    pipeline runs tensor-parallel end to end (WAN_TINY has 2 heads)."""
    import jax
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs >= 2 devices")
    import inference as inf
    out = tmp_path / "out"
    prompts = tmp_path / "p.txt"
    prompts.write_text("a tiny tensor-parallel test video\n")
    monkeypatch.setattr(sys, "argv", [
        "inference.py", "--config_path", CONFIG,
        "--data_path", str(prompts), "--output_folder", str(out),
        "--num_output_frames", "3", "--tp", "2", "--save_with_index"])
    inf.main()
    files = os.listdir(out)
    assert files == ["output_000.mp4"]
