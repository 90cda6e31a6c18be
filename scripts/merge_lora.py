"""Offline merge of a LoRA checkpoint into a base Wan checkpoint
(reference scripts/merge_lora.py — teacher prep for pose distillation).

Loads a torch base state dict + torch LoRA state dict, converts to the
JAX pytree, folds adapters into base weights, and saves an orbax
checkpoint usable as real_score/teacher.

Usage:
  python scripts/merge_lora.py --base BASE.pth --lora LORA.pt \
      --output merged_ckpt [--alpha 16] [--model 14b]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", type=str, required=True)
    parser.add_argument("--lora", type=str, required=True)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--alpha", type=float, default=None)
    parser.add_argument("--model", type=str, default="14b",
                        choices=["1.3b", "14b"])
    args = parser.parse_args()

    from self_forcing_tpu.lora import load_lora_weights, merge_lora
    from self_forcing_tpu.models.wan.configs import WAN_1_3B, WAN_14B
    from self_forcing_tpu.utils.checkpoints import (convert_dit_state_dict,
                                                    load_torch_state_dict,
                                                    save_pytree)

    cfg = WAN_14B if args.model == "14b" else WAN_1_3B
    base_sd = load_torch_state_dict(args.base)
    params = convert_dit_state_dict(base_sd, cfg)
    lora_sd = load_torch_state_dict(args.lora)
    params = load_lora_weights(params, lora_sd, alpha=args.alpha)
    merged = merge_lora(params)
    save_pytree(os.path.abspath(args.output), {"generator": merged})
    print(f"merged -> {args.output}")


if __name__ == "__main__":
    main()
