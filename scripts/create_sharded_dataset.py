"""Aggregate latent/prompt pairs into MULTIPLE record shards for the
ShardingDataset (reference scripts/create_lmdb_14b_shards.py).

Each shard holds up to --rows_per_shard rows; shard files are named
shard_{k:04d}.rs inside --output_dir.

Usage: python scripts/create_sharded_dataset.py --data_path PAIRS \
           --output_dir data/shards --rows_per_shard 512
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from self_forcing_tpu.data.recordstore import (RecordWriter, store_arrays,
                                               write_shape_header)
from scripts.create_shards_iterative import load_pairs


class ShardSink:
    def __init__(self, out_dir: str, rows_per_shard: int):
        self.out_dir = out_dir
        self.rows_per_shard = rows_per_shard
        self.shard_id = -1
        self.writer = None
        self.rows = 0
        self.row_shape = None
        os.makedirs(out_dir, exist_ok=True)

    def _roll(self):
        self.flush()
        self.shard_id += 1
        self.writer = RecordWriter(os.path.join(
            self.out_dir, f"shard_{self.shard_id:04d}.rs"))
        self.rows = 0

    def put(self, prompt: str, row: np.ndarray):
        if self.writer is None or self.rows >= self.rows_per_shard:
            self._roll()
        store_arrays(self.writer, {"latents": row[None],
                                   "prompts": [prompt]}, self.rows)
        self.row_shape = row.shape
        self.rows += 1

    def flush(self):
        if self.writer is not None and self.rows:
            write_shape_header(self.writer, "latents",
                               (self.rows,) + tuple(self.row_shape))
            write_shape_header(self.writer, "prompts", (self.rows,))
            self.writer.close()
            self.writer = None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--rows_per_shard", type=int, default=512)
    args = parser.parse_args()

    files = sorted(glob.glob(os.path.join(args.data_path, "*.npz"))
                   + glob.glob(os.path.join(args.data_path, "*.pt")))
    assert files, f"no pair files in {args.data_path}"

    sink = ShardSink(args.output_dir, args.rows_per_shard)
    seen = set()
    total = 0
    for f in files:
        for prompt, latents in load_pairs(f):
            if prompt in seen:
                continue
            seen.add(prompt)
            for row in latents:
                sink.put(prompt, row)
                total += 1
    sink.flush()
    print(f"wrote {total} rows into {sink.shard_id + 1} shards "
          f"-> {args.output_dir}")


if __name__ == "__main__":
    main()
