import numpy as np
import pytest

from anemoi_tpu.data.datamodule import DataModule, usable_window_starts
from anemoi_tpu.data.dataset import NpyDataset, SyntheticDataset, save_dataset


def test_usable_window_starts_missing():
    starts = usable_window_starts(10, window=3, missing={4})
    # windows touching t=4 excluded: starts 2,3,4 excluded
    assert 2 not in starts and 3 not in starts and 4 not in starts
    assert 0 in starts and 1 in starts and 5 in starts
    assert starts.max() == 7


def test_synthetic_dataset_window():
    lat = np.linspace(-1.4, 1.4, 20)
    lon = np.linspace(-3.1, 3.1, 20)
    ds = SyntheticDataset(lat, lon, ["a", "b", "c"], num_times=16)
    w = ds.get_window(3, 4)
    assert w.shape == (4, 1, 20, 3)
    # deterministic
    np.testing.assert_array_equal(w, ds.get_window(3, 4))
    # temporally smooth: consecutive steps correlated
    corr = np.corrcoef(w[0].ravel(), w[1].ravel())[0, 1]
    assert corr > 0.8


def test_npy_dataset_roundtrip(tmp_path, rng):
    data = rng.normal(size=(8, 3, 1, 25)).astype(np.float32)
    save_dataset(
        str(tmp_path / "ds"),
        data,
        variables=["x", "y", "z"],
        latitudes_deg=np.linspace(-80, 80, 25),
        longitudes_deg=np.linspace(-170, 170, 25),
        missing=[5],
    )
    ds = NpyDataset(str(tmp_path / "ds"))
    assert len(ds) == 8
    assert ds.variables == ["x", "y", "z"]
    assert ds.missing == {5}
    w = ds.get_window(1, 2)
    assert w.shape == (2, 1, 25, 3)
    np.testing.assert_allclose(w[0, 0, :, 1], data[1, 1, 0, :])
    assert "stdev" in ds.statistics and ds.statistics["mean"].shape == (3,)


def test_datamodule_batches():
    lat = np.linspace(-1.4, 1.4, 10)
    ds = SyntheticDataset(lat, lat, ["a", "b"], num_times=32)
    dm = DataModule({"data": ds}, n_step_input=2, n_step_output=1, rollout=2, batch_size=3)
    batches = list(dm.train_batches(epoch=0))
    assert batches, "expected at least one train batch"
    b = batches[0]["data"]
    assert b.shape == (3, 4, 1, 10, 2)  # window = 2 + 2*1
    # different epochs shuffle differently
    b1 = next(iter(dm.train_batches(epoch=1)))["data"]
    assert not np.array_equal(b, b1)
    # val deterministic
    v1 = next(iter(dm.val_batches()))["data"]
    v2 = next(iter(dm.val_batches()))["data"]
    np.testing.assert_array_equal(v1, v2)


def test_datamodule_rollout_grow():
    lat = np.linspace(-1.4, 1.4, 10)
    ds = SyntheticDataset(lat, lat, ["a"], num_times=32)
    dm = DataModule({"data": ds}, rollout=1, batch_size=2)
    dm.set_rollout(4)
    b = next(iter(dm.train_batches(0)))["data"]
    assert b.shape[1] == 2 + 4  # n_step_input + rollout


def test_trajectory_dataset_roundtrip(tmp_path, rng):
    from anemoi_tpu.data.dataset import TrajectoryDataset, save_trajectory_dataset

    # [base=4, var=3, ens=1, step=6, grid=25]
    data = rng.normal(size=(4, 3, 1, 6, 25)).astype(np.float32)
    save_trajectory_dataset(
        str(tmp_path / "traj"),
        data,
        variables=["x", "y", "z"],
        latitudes_deg=np.linspace(-80, 80, 25),
        longitudes_deg=np.linspace(-170, 170, 25),
        step_frequency_hours=12.0,
        missing_bases=[2],
    )
    ds = TrajectoryDataset(str(tmp_path / "traj"))
    assert ds.num_sequences == 4
    assert ds.sequence_length(0) == 6
    assert ds.missing_sequences == {2}
    assert ds.timestep_hours == 12.0
    w = ds.get_seq_window(1, 2, 3)
    assert w.shape == (3, 1, 25, 3)
    np.testing.assert_allclose(w[0, 0, :, 1], data[1, 1, 0, 2, :])


def test_trajectory_anchors_never_cross_sequences(tmp_path, rng):
    from anemoi_tpu.data.dataset import TrajectoryDataset, save_trajectory_dataset

    data = rng.normal(size=(3, 2, 1, 5, 9)).astype(np.float32)
    save_trajectory_dataset(
        str(tmp_path / "traj"), data, ["a", "b"],
        np.linspace(-80, 80, 9), np.linspace(-170, 170, 9), missing_bases=[1],
    )
    ds = TrajectoryDataset(str(tmp_path / "traj"))
    anchors = ds.compute_anchors(np.arange(3))  # window 3 in length-5 sequences
    # sequences 0 and 2 only (1 missing), positions 0..2
    assert set(map(tuple, anchors)) == {(s, p) for s in (0, 2) for p in (0, 1, 2)}


def test_anchor_intersection_multi_dataset():
    from anemoi_tpu.data.datamodule import compute_valid_anchors

    lat = np.linspace(-1.4, 1.4, 8)
    a = SyntheticDataset(lat, lat, ["u"], num_times=12)
    b = SyntheticDataset(lat, lat, ["v"], num_times=12)
    b.missing = {6}
    anchors = compute_valid_anchors({"a": a, "b": b}, window=3)
    # b excludes starts 4,5,6; intersection drops them for both
    starts = set(anchors[:, 1].tolist())
    assert starts == set(range(10)) - {4, 5, 6}
    assert (anchors[:, 0] == 0).all()


def test_datamodule_over_trajectory(tmp_path, rng):
    from anemoi_tpu.data.dataset import TrajectoryDataset, save_trajectory_dataset

    data = rng.normal(size=(5, 2, 1, 8, 9)).astype(np.float32)
    save_trajectory_dataset(
        str(tmp_path / "traj"), data, ["a", "b"],
        np.linspace(-80, 80, 9), np.linspace(-170, 170, 9),
    )
    ds = TrajectoryDataset(str(tmp_path / "traj"))
    dm = DataModule({"data": ds}, n_step_input=2, n_step_output=1, rollout=1,
                    batch_size=2, validation_fraction=0.2)
    batch = next(iter(dm.train_batches(epoch=0)))["data"]
    assert batch.shape == (2, 3, 1, 9, 2)
    # windows must equal the raw trajectory slices for their anchors
    anchors = dm.train_sampler.starts
    ref = ds.get_seq_window(int(anchors[0][0]), int(anchors[0][1]), 3)
    got = dm.make_batch(anchors[:1])["data"][0]
    np.testing.assert_array_equal(got, ref)


def test_prefetch_to_device_order_and_close():
    """Prefetcher preserves order, applies put_fn ahead, raises worker
    errors, and stops its thread on early close."""
    import threading
    import time

    import pytest as _pytest

    from anemoi_tpu.data.prefetch import maybe_prefetch, prefetch_to_device

    out = list(prefetch_to_device(iter(range(10)), lambda x: x * 2, size=3))
    assert out == [2 * i for i in range(10)]

    # early break stops the worker promptly
    n_threads = threading.active_count()
    gen = prefetch_to_device(iter(range(1000)), lambda x: x, size=2)
    assert next(gen) == 0
    gen.close()
    time.sleep(0.3)
    assert threading.active_count() <= n_threads + 1

    # worker exceptions surface on the consumer side
    def bad(x):
        if x == 3:
            raise RuntimeError("boom")
        return x

    with _pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(iter(range(10)), bad, size=2))

    # size=0 disables threading
    assert list(maybe_prefetch(iter([1, 2]), lambda x: x + 1, 0)) == [2, 3]


# --- zarr v2 (pure-numpy reader, data/zarr_reader.py) --------------------


def _make_zarr(tmp_path, rng, compressor={"id": "zlib", "level": 1}, missing=()):
    from anemoi_tpu.data.zarr_reader import save_zarr_dataset

    T, V, E, G = 10, 3, 1, 17
    data = rng.normal(size=(T, V, E, G)).astype(np.float32)
    path = str(tmp_path / "ds.zarr")
    save_zarr_dataset(
        path, data, ["t2m", "msl", "z500"],
        latitudes_deg=np.linspace(-80, 80, G),
        longitudes_deg=np.linspace(0, 350, G),
        timestep_hours=6.0, missing=list(missing),
        chunks_per_time=3,  # deliberately not dividing T
        compressor=compressor,
    )
    return path, data


@pytest.mark.parametrize("compressor", [None, {"id": "zlib", "level": 1},
                                        {"id": "gzip", "level": 1},
                                        {"id": "blosc", "cname": "lz4",
                                         "clevel": 5, "shuffle": 1,
                                         "blocksize": 0}])
def test_zarr_dataset_roundtrip(tmp_path, rng, compressor):
    from anemoi_tpu.data.dataset import ZarrDataset, open_dataset

    path, data = _make_zarr(tmp_path, rng, compressor=compressor, missing=[4])
    ds = ZarrDataset(path)
    assert ds.variables == ["t2m", "msl", "z500"]
    assert ds.timestep_hours == 6.0
    assert ds.missing == {4}
    assert len(ds) == 10 and ds.num_grid_points == 17
    np.testing.assert_allclose(ds.statistics["mean"],
                               data.reshape(10, 3, -1).mean(axis=(0, 2)), rtol=1e-5)
    # windows across chunk boundaries (chunk=3) + grid slicing
    w = ds.get_window(2, 5, grid_slice=slice(3, 12))
    expect = np.transpose(data[2:7, :, :, 3:12], (0, 2, 3, 1))
    np.testing.assert_array_equal(w, expect)
    # suffix auto-detection + explicit kind
    assert isinstance(open_dataset(path), ZarrDataset)
    assert isinstance(open_dataset({"kind": "zarr", "path": path}), ZarrDataset)


def test_zarr_array_indexing_and_fill(tmp_path, rng):
    import json
    import os

    from anemoi_tpu.data.zarr_reader import ZarrGroup, ZarrV2Array, write_zarr_array

    a = rng.normal(size=(7, 5)).astype(np.float32)
    path = str(tmp_path / "arr")
    write_zarr_array(path, a, chunks=(3, 2), compressor={"id": "zlib", "level": 1})
    z = ZarrV2Array(path)
    np.testing.assert_array_equal(np.asarray(z), a)
    np.testing.assert_array_equal(z[2:6, 1:4], a[2:6, 1:4])
    np.testing.assert_array_equal(z[4], a[4])       # int index squeezes
    np.testing.assert_array_equal(z[-1, 2], a[-1, 2])
    # deleting a chunk file -> fill_value zeros, not an error
    os.remove(os.path.join(path, "0.0"))
    np.testing.assert_array_equal(z[0:3, 0:2], np.zeros((3, 2), np.float32))

    # blosc-compressed stores fail with a clear codec message
    meta = json.load(open(os.path.join(path, ".zarray")))
    meta["compressor"] = {"id": "blosc", "cname": "lz4"}
    json.dump(meta, open(os.path.join(path, ".zarray"), "w"))
    zb = ZarrV2Array(path)
    with pytest.raises((ImportError, Exception), match="blosc"):
        zb[3:4, 0:1]

    # consolidated metadata route
    root = str(tmp_path / "g.zarr")
    write_zarr_array(os.path.join(root, "x"), a, chunks=(7, 5))
    json.dump({"zarr_format": 2}, open(os.path.join(root, ".zgroup"), "w"))
    json.dump(
        {"metadata": {
            ".zattrs": {"variables": ["a"]},
            "x/.zarray": json.load(open(os.path.join(root, "x", ".zarray"))),
        }},
        open(os.path.join(root, ".zmetadata"), "w"),
    )
    g = ZarrGroup(root)
    assert g.attrs == {"variables": ["a"]}
    assert g.array_keys() == ["x"]
    np.testing.assert_array_equal(np.asarray(g["x"]), a)


def test_datamodule_over_zarr(tmp_path, rng):
    from anemoi_tpu.data.dataset import open_dataset

    path, data = _make_zarr(tmp_path, rng)
    dm = DataModule({"data": open_dataset({"kind": "zarr", "path": path})},
                    n_step_input=2, n_step_output=1, rollout=1, batch_size=1)
    batch = next(iter(dm.train_batches(epoch=0)))
    arr = batch["data"]
    assert arr.shape[1] == 3 and arr.ndim == 5  # [B, T, E, G, V]
    assert np.isfinite(arr).all()
