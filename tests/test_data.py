"""Data layer tests: native record store round-trip, reference LMDB key
conventions, datasets, loader sharding (reference utils/lmdb.py,
utils/dataset.py)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from self_forcing_tpu.data import recordstore as rs
from self_forcing_tpu.data.datasets import (ODERegressionDataset,
                                            PoseShardingDataset,
                                            ShardingDataset, TextDataset)
from self_forcing_tpu.data.loader import DataLoader, DistributedSampler


def _write_ode_shard(path, n_rows=4, T=3, F=4, C=2, H=4, W=4, prefix="p"):
    rng = np.random.default_rng(0)
    with rs.RecordWriter(str(path)) as w:
        lat = rng.normal(size=(n_rows, T, F, C, H, W)).astype(np.float16)
        prompts = [f"{prefix}{i}" for i in range(n_rows)]
        rs.store_arrays(w, {"latents": lat, "prompts": prompts})
        rs.write_shape_header(w, "latents", lat.shape)
        rs.write_shape_header(w, "prompts", (n_rows,))
    return lat


def test_recordstore_roundtrip(tmp_path):
    p = tmp_path / "x.rs"
    with rs.RecordWriter(str(p)) as w:
        w.put("a", b"hello")
        w.put("b", np.arange(7, dtype=np.int32))
    r = rs.RecordReader(str(p))
    assert bytes(r.get("a")) == b"hello"
    assert np.frombuffer(bytes(r.get("b")), np.int32).tolist() == list(range(7))
    assert r.get("missing") is None
    assert len(r) == 2
    assert sorted(r.keys()) == [b"a", b"b"]
    r.close()


def test_native_reader_used(tmp_path):
    """The C++ reader must actually build and serve reads on this image."""
    p = tmp_path / "y.rs"
    with rs.RecordWriter(str(p)) as w:
        for i in range(100):
            w.put(f"k{i}", np.full(16, i, np.int32))
    r = rs.RecordReader(str(p))
    assert r._py is None, "native librecordstore.so failed to build"
    for i in (0, 57, 99):
        assert np.frombuffer(bytes(r.get(f"k{i}")), np.int32)[0] == i
    r.close()


def test_python_fallback_parity(tmp_path):
    p = tmp_path / "z.rs"
    with rs.RecordWriter(str(p)) as w:
        w.put("k", b"v" * 1000)
    py = rs._PyReader(str(p))
    assert bytes(py.get(b"k")) == b"v" * 1000
    assert py.get(b"nope") is None


def test_ode_dataset(tmp_path):
    lat = _write_ode_shard(tmp_path / "ode.rs")
    ds = ODERegressionDataset(str(tmp_path / "ode.rs"))
    assert len(ds) == 4
    item = ds[2]
    assert item["prompts"] == "p2"
    np.testing.assert_allclose(item["ode_latent"],
                               lat[2].astype(np.float32))


def test_sharding_dataset(tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    _write_ode_shard(d / "shard_0000.rs", n_rows=3, prefix="a")
    _write_ode_shard(d / "shard_0001.rs", n_rows=2, prefix="b")
    ds = ShardingDataset(str(d))
    assert len(ds) == 5
    assert ds[0]["prompts"] == "a0"
    assert ds[4]["prompts"] == "b1"


def test_pose_sharding_dataset(tmp_path):
    d = tmp_path / "pose"
    d.mkdir()
    rng = np.random.default_rng(1)
    with rs.RecordWriter(str(d / "shard_0000.rs")) as w:
        lat = rng.normal(size=(2, 4, 2, 4, 4)).astype(np.float16)
        dw = rng.integers(0, 255, size=(2, 3, 8, 16, 12)).astype(np.uint8)
        ref = rng.integers(0, 255, size=(2, 16, 12, 3)).astype(np.uint8)
        rs.store_arrays(w, {"latents": lat, "prompts": ["x", "y"],
                            "dwpose_data": dw, "random_ref_dwpose": ref})
        rs.write_shape_header(w, "latents", lat.shape)
        rs.write_shape_header(w, "prompts", (2,))
        rs.write_shape_header(w, "dwpose_data", dw.shape)
        rs.write_shape_header(w, "random_ref_dwpose", ref.shape)
    ds = PoseShardingDataset(str(d))
    item = ds[1]
    np.testing.assert_array_equal(item["dwpose_data"], dw[1])
    np.testing.assert_array_equal(item["random_ref_dwpose"], ref[1])


def test_text_dataset(tmp_path):
    p = tmp_path / "prompts.txt"
    p.write_text("a cat\na dog\n")
    ds = TextDataset(str(p))
    assert len(ds) == 2
    assert ds[1]["prompts"] == "a dog"


def test_distributed_sampler_partition():
    """Every index covered exactly once across ranks (with padding)."""
    n, world = 10, 4
    seen = []
    for rank in range(world):
        s = DistributedSampler(n, num_replicas=world, rank=rank,
                               shuffle=False)
        seen.extend(list(s))
    assert len(seen) == 12  # padded to 3 per rank
    assert set(seen) == set(range(n))


def test_dataloader_batches(tmp_path):
    _write_ode_shard(tmp_path / "ode.rs", n_rows=6)
    ds = ODERegressionDataset(str(tmp_path / "ode.rs"))
    sampler = DistributedSampler(len(ds), num_replicas=1, rank=0,
                                 shuffle=False)
    dl = DataLoader(ds, batch_size=2, sampler=sampler)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["ode_latent"].shape[0] == 2
    assert batches[0]["prompts"] == ["p0", "p1"]


def test_creation_script_end_to_end(tmp_path):
    """scripts/create_shards_iterative.py consumes .npz pair files."""
    pairs = tmp_path / "pairs"
    pairs.mkdir()
    rng = np.random.default_rng(2)
    for i in range(3):
        np.savez(pairs / f"{i:05d}.npz", prompt=f"prompt {i}",
                 latents=rng.normal(size=(1, 3, 4, 2, 4, 4))
                 .astype(np.float16))
    out = tmp_path / "ode.rs"
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable, "/root/repo/scripts/create_shards_iterative.py",
         "--data_path", str(pairs), "--output_path", str(out)],
        check=True, env=env, capture_output=True)
    ds = ODERegressionDataset(str(out))
    assert len(ds) == 3
    assert ds[0]["ode_latent"].shape == (3, 4, 2, 4, 4)


def test_recordreader_duplicate_key_last_wins(tmp_path):
    """Duplicate keys resolve to the LAST write in both the native and
    Python readers (the reference's LMDB overwrite idiom)."""
    from self_forcing_tpu.data.recordstore import (RecordReader,
                                                   RecordWriter, _PyReader)
    path = str(tmp_path / "dup.rs")
    with RecordWriter(path) as w:
        w.put("k", b"old")
        w.put("other", b"x")
        w.put("k", b"new")
    r = RecordReader(path)
    got = bytes(r.get("k"))
    r.close()
    py = _PyReader(path)
    got_py = bytes(py.get(b"k"))
    py.close()
    assert got == b"new" and got_py == b"new"


def test_recordreader_view_outlives_reader(tmp_path):
    """The zero-copy view keeps the mmap alive after the reader goes out
    of scope (was a use-after-unmap), and is read-only."""
    import numpy as np
    from self_forcing_tpu.data.recordstore import RecordReader, RecordWriter
    path = str(tmp_path / "life.rs")
    payload = bytes(range(256)) * 64
    with RecordWriter(path) as w:
        w.put("a", payload)
    arr = RecordReader(path).get("a")   # reader is a dead temporary
    import gc
    gc.collect()
    assert bytes(arr[:16]) == payload[:16]
    assert not arr.flags.writeable


def test_dataloader_propagates_worker_exception():
    """A dataset error must surface in the consumer, not hang the loop."""
    import pytest
    from self_forcing_tpu.data.loader import DataLoader, DistributedSampler

    class Bad:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("corrupt shard")

    dl = DataLoader(Bad(), batch_size=2,
                    sampler=DistributedSampler(4, num_replicas=1, rank=0,
                                               shuffle=False))
    with pytest.raises(RuntimeError, match="corrupt shard"):
        next(iter(dl))


def test_distributed_sampler_pad_exceeds_len():
    """pad > dataset_len still gives every rank the same sample count."""
    from self_forcing_tpu.data.loader import DistributedSampler
    counts = set()
    for rank in range(8):
        s = DistributedSampler(3, num_replicas=8, rank=rank, shuffle=False)
        idx = list(iter(s))
        counts.add(len(idx))
        assert all(0 <= i < 3 for i in idx)
    assert counts == {1}
