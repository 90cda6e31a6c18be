"""T5 encoder parity vs the PyTorch reference (wan/modules/t5.py) on a tiny
config with shared weights."""
import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from self_forcing_tpu.models.wan import t5 as jt5
from tests.reference_loader import load_ref_module


@pytest.fixture(scope="module")
def ref_t5():
    # stub ftfy/regex-dependent tokenizers module: t5.py only needs the name
    if "refwan" not in sys.modules:
        pkg = types.ModuleType("refwan")
        pkg.__path__ = ["/root/reference/wan/modules"]
        sys.modules["refwan"] = pkg
    tok_stub = types.ModuleType("refwan.tokenizers")

    class HuggingfaceTokenizer:  # pragma: no cover - never constructed
        pass

    tok_stub.HuggingfaceTokenizer = HuggingfaceTokenizer
    sys.modules["refwan.tokenizers"] = tok_stub
    # T5EncoderModel's signature default calls torch.cuda.current_device()
    # at import time (t5.py:478); harmless to stub on CPU.
    import torch
    orig = torch.cuda.current_device
    torch.cuda.current_device = lambda: "cpu"
    try:
        return load_ref_module("wan/modules/t5.py", "refwan.t5", "refwan")
    finally:
        torch.cuda.current_device = orig


def _torch_t5(ref_t5, cfg):
    import torch
    torch.manual_seed(0)
    return ref_t5.T5Encoder(
        vocab=cfg.vocab_size, dim=cfg.dim, dim_attn=cfg.dim_attn,
        dim_ffn=cfg.dim_ffn, num_heads=cfg.num_heads,
        num_layers=cfg.num_layers, num_buckets=cfg.num_buckets,
        shared_pos=False, dropout=0.0).eval()


def _port_weights(tm, cfg):
    """torch T5Encoder state -> our stacked pytree."""
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    L = cfg.num_layers

    def lin(name):
        return {"w": jnp.asarray(sd[name + ".weight"].T)}

    blocks = []
    for i in range(L):
        p = f"blocks.{i}."
        blocks.append({
            "norm1": {"w": jnp.asarray(sd[p + "norm1.weight"])},
            "attn": {
                "q": lin(p + "attn.q"), "k": lin(p + "attn.k"),
                "v": lin(p + "attn.v"), "o": lin(p + "attn.o"),
            },
            "norm2": {"w": jnp.asarray(sd[p + "norm2.weight"])},
            "ffn": {
                "gate": lin(p + "ffn.gate.0"),
                "fc1": lin(p + "ffn.fc1"),
                "fc2": lin(p + "ffn.fc2"),
            },
            "pos_emb": jnp.asarray(sd[p + "pos_embedding.embedding.weight"]),
        })
    return {
        "token_embedding": jnp.asarray(sd["token_embedding.weight"]),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.asarray(sd["norm.weight"])},
    }


def test_t5_encoder_parity(ref_t5):
    import torch
    cfg = jt5.T5_TINY
    tm = _torch_t5(ref_t5, cfg)
    params = _port_weights(tm, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (2, 18))
    mask = np.ones((2, 18), np.int64)
    mask[0, 12:] = 0
    mask[1, 7:] = 0

    with torch.no_grad():
        ref_out = tm(torch.tensor(ids), torch.tensor(mask)).numpy()

    out = np.asarray(jt5.encode(params, cfg, jnp.asarray(ids, jnp.int32),
                                jnp.asarray(mask, jnp.int32)))
    # padding positions may differ (masked out downstream); compare valid
    for b, v in enumerate([12, 7]):
        np.testing.assert_allclose(out[b, :v], ref_out[b, :v],
                                   rtol=2e-4, atol=2e-4)


def test_relative_buckets_match_reference(ref_t5):
    import torch
    emb = ref_t5.T5RelativeEmbedding(32, 4, bidirectional=True)
    rel = torch.arange(30)[None, :] - torch.arange(30)[:, None]
    ref_buckets = emb._relative_position_bucket(rel).numpy()
    ours = jt5.relative_position_buckets(30, 32)
    np.testing.assert_array_equal(ours, ref_buckets)


def test_encode_streamed_matches_scan():
    """Weight-streamed encode (host params, per-layer device_put — the
    DynamicSwap low-memory equivalent) matches the scan forward."""
    import numpy as np
    from self_forcing_tpu.models.wan import t5 as t5_mod
    cfg = t5_mod.T5Config(dim=64, dim_attn=64, dim_ffn=128, num_heads=4,
                          num_layers=3, vocab_size=128, num_buckets=8,
                          max_dist=16)
    params = t5_mod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ids = jnp.asarray([[5, 9, 2, 0, 0]], jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    ref = t5_mod.encode_for_dit(params, cfg, ids, mask)
    host = jax.tree.map(lambda a: np.asarray(jax.device_get(a)), params)
    out = t5_mod.encode_streamed(host, cfg, np.asarray(ids),
                                 np.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
