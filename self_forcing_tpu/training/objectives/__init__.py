"""Distillation objectives (DMD/SiD/GAN/CausVid/ODE/diffusion)."""
