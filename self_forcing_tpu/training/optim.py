"""Optimizers for the trainers (reference trainer/distillation.py:124-138):
AdamW with grad clipping (max_grad_norm 10.0, :196-197)."""
from __future__ import annotations

import optax


def make_optimizer(lr: float, beta1: float = 0.0, beta2: float = 0.999,
                   weight_decay: float = 0.01,
                   max_grad_norm: float = 10.0) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(lr, b1=beta1, b2=beta2, weight_decay=weight_decay),
    )


def make_lora_optimizer(labels, lr: float, beta1: float = 0.0,
                        beta2: float = 0.999, weight_decay: float = 0.01,
                        max_grad_norm: float = 10.0
                        ) -> optax.GradientTransformation:
    """LoRA-only training (reference mark_only_lora_as_trainable,
    utils/lora.py:225-234 + model/base.py:39-72): the 'train'-labeled
    leaves (lora_A/lora_B, pose_proj) get AdamW, everything else is
    frozen via set_to_zero — base weights stay bit-identical."""
    return optax.multi_transform(
        {"train": make_optimizer(lr, beta1, beta2, weight_decay,
                                 max_grad_norm),
         "frozen": optax.set_to_zero()},
        labels)
