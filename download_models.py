"""Model downloader (reference download_models.py): pulls the Wan2.1-T2V
base, Self-Forcing checkpoint, ODE init, CLIP weights, 14B teacher +
UniAnimate LoRA + DWPose assets from HuggingFace.

Requires network access + huggingface_hub; in air-gapped environments
place the files manually (layout documented in self_forcing_tpu/runtime.py).
"""
from __future__ import annotations

import argparse
import os

ASSETS = [
    # (repo_id, filename or None for snapshot, destination)
    ("Wan-AI/Wan2.1-T2V-1.3B", None, "wan_models/Wan2.1-T2V-1.3B"),
    ("gdhe17/Self-Forcing", "checkpoints/self_forcing_dmd.pt",
     "checkpoints/self_forcing_dmd.pt"),
    ("gdhe17/Self-Forcing", "checkpoints/ode_init.pt",
     "checkpoints/ode_init.pt"),
    ("madebyollin/taehv", "taew2_1.pth", "checkpoints/taew2_1.pth"),
    # CLIP vision tower for i2v/pose image conditioning (the reference
    # downloader pulls the same file)
    ("Wan-AI/Wan2.1-I2V-14B-720P",
     "models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth",
     "wan_models/models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth"),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dest", type=str, default=".")
    parser.add_argument("--include_14b", action="store_true",
                        help="also pull the 14B teacher + UniAnimate LoRA")
    args = parser.parse_args()

    try:
        from huggingface_hub import hf_hub_download, snapshot_download
    except ImportError:
        raise SystemExit(
            "huggingface_hub is not installed / network unavailable. "
            "Place checkpoints manually:\n" +
            "\n".join(f"  {dst}  (from {repo})" for repo, _, dst in ASSETS))

    assets = list(ASSETS)
    if args.include_14b:
        assets += [
            ("Wan-AI/Wan2.1-I2V-14B-720P", None,
             "checkpoints/Wan2.1-I2V-14B-720P"),
            ("ZheWang123/UniAnimate-DiT",
             "UniAnimate-Wan2.1-14B-Lora-12000.ckpt",
             "checkpoints/UniAnimate-Wan2.1-14B-Lora-12000.ckpt"),
        ]

    for repo, fname, dst in assets:
        dst = os.path.join(args.dest, dst)
        os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
        print(f"downloading {repo}:{fname or '*'} -> {dst}")
        if fname is None:
            snapshot_download(repo_id=repo, local_dir=dst)
        else:
            # hf_hub_download preserves the repo-relative filename path
            # under local_dir (e.g. checkpoints/x.pt -> local_dir/
            # checkpoints/x.pt); move the file to the declared dst
            got = hf_hub_download(repo_id=repo, filename=fname,
                                  local_dir=os.path.dirname(dst))
            if os.path.abspath(got) != os.path.abspath(dst):
                os.replace(got, dst)


if __name__ == "__main__":
    main()
