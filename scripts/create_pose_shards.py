"""Create pose-conditioned training shards for PoseShardingDataset
(reference scripts/create_pose_lmdb_shards.py).

Row schema (reference :4-9):
  latents          [F, 16, h, w]      fp16  clean video latents
  prompts          str
  dwpose_data      [3, 81, 832, 480]  u8    DWPose skeleton render
  random_ref_dwpose [832, 480, 3]     u8    reference pose image
  first_frame      [832, 480, 3]      u8    first RGB frame

Input: directory of .npz files with those keys (one sample each).

Usage: python scripts/create_pose_shards.py --data_path SAMPLES \
           --output_dir data/pose_shards --rows_per_shard 256
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from self_forcing_tpu.data.recordstore import (RecordWriter, store_arrays,
                                               write_shape_header)

ARRAYS = ("latents", "dwpose_data", "random_ref_dwpose", "first_frame")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_path", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--rows_per_shard", type=int, default=256)
    args = parser.parse_args()

    files = sorted(glob.glob(os.path.join(args.data_path, "*.npz")))
    assert files, f"no .npz sample files in {args.data_path}"
    os.makedirs(args.output_dir, exist_ok=True)

    shard_id, rows = 0, 0
    writer = None
    shapes = {}

    def roll():
        nonlocal writer, shard_id, rows
        flush()
        writer = RecordWriter(os.path.join(
            args.output_dir, f"shard_{shard_id:04d}.rs"))
        shard_id += 1
        rows = 0

    def flush():
        nonlocal writer
        if writer is not None and rows:
            for name, shape in shapes.items():
                write_shape_header(writer, name, (rows,) + tuple(shape))
            write_shape_header(writer, "prompts", (rows,))
            writer.close()
            writer = None

    total = 0
    for f in files:
        d = np.load(f, allow_pickle=True)
        if writer is None or rows >= args.rows_per_shard:
            roll()
        payload = {"prompts": [str(d["prompt"])]}
        for name in ARRAYS:
            if name not in d:
                continue
            arr = d[name]
            arr = arr.astype(np.float16) if name == "latents" \
                else arr.astype(np.uint8)
            payload[name] = arr[None]
            shapes[name] = arr.shape
        store_arrays(writer, payload, rows)
        rows += 1
        total += 1
    flush()
    print(f"wrote {total} rows into {shard_id} shards -> {args.output_dir}")


if __name__ == "__main__":
    main()
