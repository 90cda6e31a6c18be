"""Aggregate ODE-pair files into one record shard
(reference scripts/create_lmdb_iterative.py — LMDB replaced by the native
record store, csrc/recordstore.cpp).

Accepts the .npz files from scripts/generate_ode_pairs.py or reference
.pt files ({prompt: tensor} dicts). Deduplicates by prompt
(utils/lmdb.py:30-53).

Usage: python scripts/create_shards_iterative.py --data_path PAIRS \
           --output_path data/ode_shard.rs
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from self_forcing_tpu.data.recordstore import (RecordWriter, store_arrays,
                                               write_shape_header)


def load_pairs(path):
    """Yield (prompt, latents[np fp16, leading sample dim]) from a file."""
    if path.endswith(".npz"):
        d = np.load(path, allow_pickle=True)
        yield str(d["prompt"]), np.asarray(d["latents"], np.float16)
    else:  # reference .pt format: {prompt: tensor}
        import torch
        for prompt, video in torch.load(path, map_location="cpu",
                                        weights_only=False).items():
            yield prompt, video.half().numpy()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--output_path", type=str, required=True)
    args = parser.parse_args()

    files = sorted(glob.glob(os.path.join(args.data_path, "*.npz"))
                   + glob.glob(os.path.join(args.data_path, "*.pt")))
    assert files, f"no pair files in {args.data_path}"

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    counter = 0
    seen = set()
    row_shape = None
    with RecordWriter(args.output_path) as w:
        for f in files:
            for prompt, latents in load_pairs(f):
                if prompt in seen:
                    continue
                seen.add(prompt)
                for row in latents:  # leading sample dim
                    store_arrays(w, {"latents": row[None],
                                     "prompts": [prompt]}, counter)
                    row_shape = row.shape
                    counter += 1
        assert row_shape is not None
        write_shape_header(w, "latents", (counter,) + tuple(row_shape))
        write_shape_header(w, "prompts", (counter,))
    print(f"wrote {counter} rows -> {args.output_path}")


if __name__ == "__main__":
    main()
