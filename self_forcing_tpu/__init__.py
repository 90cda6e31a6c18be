"""self_forcing_tpu — a TPU-native (JAX/XLA/Pallas) framework for real-time,
streaming, chunk-wise autoregressive video diffusion with the Wan2.1 DiT
backbone, with the capabilities of the Self-Forcing reference
(arXiv:2506.08009; reference implementation alazarteka/Self-Forcing).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

- ``config``          — YAML config system (reference: OmegaConf merge, train.py:20-22)
- ``scheduler``       — FlowMatch scheduler + prediction-type conversions
                        (reference: utils/scheduler.py, utils/wan_wrapper.py:204-251)
- ``ops``             — attention kernels (Pallas flash + XLA fallbacks), masks
                        (reference: wan/modules/attention.py, flex_attention BlockMasks)
- ``models.wan``      — Wan2.1 DiT (bidirectional + causal), T5, VAE, CLIP
                        (reference: wan/modules/*)
- ``pipelines``       — sampling loops (reference: pipeline/*)
- ``training``        — trainers + losses: DMD/SiD/GAN/CausVid/ODE/diffusion
                        (reference: trainer/*, model/*)
- ``parallel``        — mesh / sharding / FSDP-equivalent / sequence parallel
                        (reference: utils/distributed.py, wan/distributed/*)
- ``data``            — dataset + shard store (reference: utils/dataset.py, utils/lmdb.py)
- ``serving``         — streaming demo server (reference: demo.py, demo_utils/*)
"""

__version__ = "0.1.0"
