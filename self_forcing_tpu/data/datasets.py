"""Datasets (reference utils/dataset.py) over the native record store.

Same record schema as the reference's LMDBs so data prepared with the
scripts/ tools is layout-compatible:
- 'latents' rows fp16 + 'prompts' rows str (+ shape headers)
- pose shards add 'dwpose_data' [3, 81, 832, 480] u8,
  'random_ref_dwpose' / 'first_frame' [832, 480, 3] u8
  (scripts/create_pose_lmdb_shards.py:4-9).
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from self_forcing_tpu.data.recordstore import (RecordReader,
                                               get_array_shape, retrieve_row)


class TextDataset:
    """Newline prompts + optional extended prompts
    (utils/dataset.py:12-34)."""

    def __init__(self, prompt_path: str, extended_prompt_path: str | None = None):
        with open(prompt_path, encoding="utf-8") as f:
            self.prompt_list = [line.rstrip("\n") for line in f
                                if line.strip()]
        self.extended_prompt_list = None
        if extended_prompt_path is not None:
            with open(extended_prompt_path, encoding="utf-8") as f:
                self.extended_prompt_list = [line.rstrip("\n") for line in f
                                             if line.strip()]
            assert len(self.extended_prompt_list) == len(self.prompt_list)

    def __len__(self):
        return len(self.prompt_list)

    def __getitem__(self, idx):
        out = {"prompts": self.prompt_list[idx], "idx": idx}
        if self.extended_prompt_list is not None:
            out["extended_prompts"] = self.extended_prompt_list[idx]
        return out


class ODERegressionDataset:
    """Single shard of ODE trajectories [T_steps, 21, 16, H, W] fp16
    (utils/dataset.py:37-69)."""

    def __init__(self, data_path: str, max_pair: int = int(1e8)):
        self.reader = RecordReader(data_path)
        self.latents_shape = get_array_shape(self.reader, "latents")
        self.max_pair = max_pair

    def __len__(self):
        return min(self.latents_shape[0], self.max_pair)

    def __getitem__(self, idx):
        latents = retrieve_row(self.reader, "latents", np.float16, idx,
                               self.latents_shape[1:])
        if latents.ndim == 4:
            latents = latents[None]
        prompts = retrieve_row(self.reader, "prompts", str, idx)
        return {"prompts": prompts,
                "ode_latent": latents.astype(np.float32)}


class ShardingDataset:
    """Directory of record shards with a global (shard, row) index
    (utils/dataset.py:72-124)."""

    def __init__(self, data_path: str, max_pair: int = int(1e8)):
        self.readers = []
        self.index = []
        self.latents_shape = []
        for fname in sorted(os.listdir(data_path)):
            if not fname.endswith(".rs"):
                continue  # stray files (editor swap, .DS_Store) aren't shards
            reader = RecordReader(os.path.join(data_path, fname))
            shard_id = len(self.readers)
            self.readers.append(reader)
            shape = get_array_shape(reader, "latents")
            self.latents_shape.append(shape)
            for local_i in range(shape[0]):
                self.index.append((shard_id, local_i))
        self.max_pair = max_pair

    def __len__(self):
        return min(len(self.index), self.max_pair)

    def __getitem__(self, idx):
        shard_id, local_idx = self.index[idx]
        reader = self.readers[shard_id]
        latents = retrieve_row(reader, "latents", np.float16, local_idx,
                               self.latents_shape[shard_id][1:])
        if latents.ndim == 4:
            latents = latents[None]
        prompts = retrieve_row(reader, "prompts", str, local_idx)
        return {"prompts": prompts,
                "ode_latent": latents.astype(np.float32)}


class PoseShardingDataset(ShardingDataset):
    """Adds DWPose control data per row (utils/dataset.py:127-196)."""

    def __getitem__(self, idx):
        shard_id, local_idx = self.index[idx]
        reader = self.readers[shard_id]
        out = super().__getitem__(idx)
        dw_shape = get_array_shape(reader, "dwpose_data")
        out["dwpose_data"] = retrieve_row(
            reader, "dwpose_data", np.uint8, local_idx, dw_shape[1:])
        for name in ("random_ref_dwpose", "first_frame"):
            try:
                shape = get_array_shape(reader, name)
                out[name] = retrieve_row(reader, name, np.uint8, local_idx,
                                         shape[1:])
            except AssertionError:
                pass
        return out


class TextImagePairDataset:
    """i2v eval set: images + target_crop_info_*.json metadata
    (utils/dataset.py:199-286)."""

    def __init__(self, data_dir: str, transform=None):
        self.data_dir = data_dir
        self.transform = transform
        metas = [f for f in os.listdir(data_dir)
                 if f.startswith("target_crop_info") and f.endswith(".json")]
        assert metas, f"no target_crop_info_*.json in {data_dir}"
        with open(os.path.join(data_dir, metas[0]), encoding="utf-8") as f:
            self.metadata = json.load(f)

    def __len__(self):
        return len(self.metadata)

    def __getitem__(self, idx):
        entry = self.metadata[idx]
        from PIL import Image
        img_path = os.path.join(self.data_dir, "images",
                                entry["image_name"]) \
            if "image_name" in entry else os.path.join(
                self.data_dir, entry["image_path"])
        image = Image.open(img_path).convert("RGB")
        if self.transform is not None:
            image = self.transform(image)
        else:
            image = np.asarray(image, np.float32) / 127.5 - 1.0
        return {"image": image,
                "prompts": entry.get("caption", entry.get("prompt", "")),
                "metadata": entry}
