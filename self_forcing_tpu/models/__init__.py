"""Model families: Wan DiT/VAE/T5, CLIP, TAEHV."""
