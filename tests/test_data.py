"""Data layer: normalization semantics, stats, schema, ETL, loading."""

import numpy as np
import pytest

import jax.numpy as jnp

from vae_teb_tpu.data import (Batch, CombinedHDF5Dataset,
                              DatasetStatsCalculator, append_batch,
                              build_dataset, create_initial_hdf5,
                              dataset_info, default_field_stats,
                              denormalize_field, find_flat_regions,
                              load_stats, normalize_field, passes_qc,
                              prefetch_to_device, synthetic_fhr_up)
from vae_teb_tpu.data.normalize import FieldStats


# --------------------------------------------------------------------------
# normalize
# --------------------------------------------------------------------------

def test_scalar_normalization(rng):
    x = rng.standard_normal((4, 100)).astype(np.float32) * 10 + 140
    st = default_field_stats("fhr", mean=140.0, variance=100.0)
    out = np.asarray(normalize_field(x, "fhr", st))
    np.testing.assert_allclose(out, (x - 140.0) / (10.0 + 1e-8), rtol=1e-5)


def test_fhr_st_log_channels(rng):
    """Channel 0 raw, channels 1.. log-transformed (reference semantics)."""
    c, s = 5, 32
    x = np.abs(rng.standard_normal((c, s))).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5
    st = default_field_stats("fhr_st", mean, var, n_channels=c)
    out = np.asarray(normalize_field(x, "fhr_st", st, channel_axis=0))
    expected = x.copy()
    expected[1:] = np.log(np.clip(expected[1:], 0, None) + 1e-6)
    expected = (expected - mean[:, None]) / (np.sqrt(var)[:, None] + 1e-8)
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_phase_asinh_all_channels(rng):
    c, s = 7, 16
    x = rng.standard_normal((c, s)).astype(np.float32) * 100
    mean = np.zeros(c, np.float32)
    var = np.ones(c, np.float32)
    st = default_field_stats("fhr_ph", mean, var, n_channels=c)
    out = np.asarray(normalize_field(x, "fhr_ph", st, channel_axis=0))
    np.testing.assert_allclose(out, np.arcsinh(x) / (1 + 1e-8), atol=1e-5)


def test_batched_layout(rng):
    """(B, C, S) batch normalization broadcasts per channel."""
    b, c, s = 3, 4, 8
    x = np.abs(rng.standard_normal((b, c, s))).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = np.ones(c, np.float32)
    st = default_field_stats("fhr_up_ph", mean, var, n_channels=c)
    out = np.asarray(normalize_field(x, "fhr_up_ph", st))
    single = np.stack([np.asarray(normalize_field(x[i],
                                                  "fhr_up_ph", st,
                                                  channel_axis=0))
                       for i in range(b)])
    np.testing.assert_allclose(out, single, atol=1e-6)


def test_denormalize_roundtrip(rng):
    c, s = 6, 20
    x = np.abs(rng.standard_normal((c, s))).astype(np.float32) + 0.1
    mean = rng.standard_normal(c).astype(np.float32)
    var = np.ones(c, np.float32) * 2
    for field in ["fhr_st", "fhr_ph"]:
        st = default_field_stats(field, mean, var, n_channels=c)
        z = normalize_field(x, field, st, channel_axis=0)
        back = np.asarray(denormalize_field(z, field, st, channel_axis=0))
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


# --------------------------------------------------------------------------
# stats
# --------------------------------------------------------------------------

def test_stats_match_numpy_oracle(rng):
    calc = DatasetStatsCalculator()
    data = np.abs(rng.standard_normal((10, 5, 64))).astype(np.float32)
    calc.update("fhr_st", data[:5])
    calc.update("fhr_st", data[5:])
    stats = calc.finalize()["fhr_st"]
    expected = data.astype(np.float64).copy()
    expected[:, 1:, :] = np.log(np.clip(expected[:, 1:, :], 0, None) + 1e-6)
    mean = expected.mean(axis=(0, 2))
    var = expected.var(axis=(0, 2))
    np.testing.assert_allclose(stats.mean, mean, rtol=1e-4)
    np.testing.assert_allclose(stats.variance, var, rtol=1e-3, atol=1e-6)
    assert stats.log_channels == tuple(range(1, 5))


def test_stats_scalar_field(rng):
    calc = DatasetStatsCalculator()
    data = (rng.standard_normal((8, 128)) * 7 + 3).astype(np.float32)
    calc.update("fhr", data)
    st = calc.finalize()["fhr"]
    np.testing.assert_allclose(st.mean, data.mean(), rtol=1e-4)
    np.testing.assert_allclose(st.variance, data.var(), rtol=1e-3)


def test_stats_nan_handling(rng):
    calc = DatasetStatsCalculator()
    data = rng.standard_normal((4, 2, 16)).astype(np.float32)
    data[0, 0, :8] = np.nan
    calc.update("fhr_ph", data)
    st = calc.finalize()["fhr_ph"]
    oracle = np.arcsinh(data.astype(np.float64))
    m0 = np.nanmean(oracle[:, 0, :])
    np.testing.assert_allclose(st.mean[0], m0, rtol=1e-4)


def test_stats_save_load_roundtrip(tmp_path, rng):
    calc = DatasetStatsCalculator(trim_minutes=2.0)
    calc.update("fhr_st", np.abs(rng.standard_normal((6, 4, 360))).astype(np.float32))
    calc.update("fhr", rng.standard_normal((6, 5760)).astype(np.float32))
    stats = calc.finalize()
    p = str(tmp_path / "stats.h5")
    calc.save_stats(stats, p)
    loaded = load_stats(p)
    np.testing.assert_allclose(loaded["fhr_st"].mean, stats["fhr_st"].mean,
                               rtol=1e-6)
    assert loaded["fhr_st"].log_channels == stats["fhr_st"].log_channels
    np.testing.assert_allclose(float(loaded["fhr"].mean),
                               float(stats["fhr"].mean), rtol=1e-6)


def test_stats_trim(rng):
    calc = DatasetStatsCalculator(trim_minutes=2.0)
    assert calc.trim_raw == 480 and calc.trim_dec == 30
    data = np.zeros((2, 5760), np.float32)
    data[:, 480:-480] = 1.0  # only the interior should be seen
    calc.update("fhr", data)
    st = calc.finalize()["fhr"]
    np.testing.assert_allclose(float(st.mean), 1.0, atol=1e-6)


# --------------------------------------------------------------------------
# schema + ETL + loading
# --------------------------------------------------------------------------

def test_schema_create_append(tmp_path, rng):
    p = str(tmp_path / "d.h5")
    create_initial_hdf5(p, len_signal=256, len_sequence=32,
                        channel_counts={"fhr_st": 5, "fhr_ph": 4,
                                        "fhr_up_ph": 6})
    batch = {
        "fhr": rng.standard_normal((3, 256)).astype(np.float32),
        "up": rng.standard_normal((3, 256)).astype(np.float32),
        "fhr_st": rng.standard_normal((3, 5, 32)).astype(np.float32),
        "fhr_ph": rng.standard_normal((3, 4, 32)).astype(np.float32),
        "fhr_up_ph": rng.standard_normal((3, 6, 32)).astype(np.float32),
        "target": np.ones((3, 32), np.float32),
        "weight": np.ones((3, 32), np.float32),
        "epoch": np.arange(3, dtype=np.float32),
        "cs_label": np.array([0, 1, 0], np.uint8),
        "bg_label": np.array([1, 0, 0], np.uint8),
        "guid": ["a", "b", "c"],
    }
    append_batch(p, batch)
    info = dataset_info(p)
    assert info["fhr"] == (3, 256)
    assert info["fhr_up_ph"] == (3, 6, 32)


def test_find_flat_regions_matches_reference_semantics():
    sig = np.concatenate([np.arange(10.0), np.full(30, 5.0), np.arange(20.0)])
    regions = find_flat_regions(sig, tolerance=1e-9, min_length=20)
    assert len(regions) == 1
    s, e = regions[0]
    assert e - s + 1 >= 30
    # no flat region in pure noise
    assert find_flat_regions(np.random.default_rng(0).standard_normal(100),
                             tolerance=1e-9) == []


def test_passes_qc():
    rng = np.random.default_rng(0)
    good_fhr = 140 + rng.standard_normal(5760).astype(np.float32)
    good_up = 30 + rng.standard_normal(5760).astype(np.float32)
    w = np.ones(360, np.float32)
    assert passes_qc(good_fhr, good_up, w)
    assert not passes_qc(good_fhr, good_up, w * 0.5)  # low weight
    flat_fhr = good_fhr.copy()
    flat_fhr[1000:1600] = 120.0  # 600-sample flat > 480 threshold
    assert not passes_qc(flat_fhr, good_up, w)


def test_window_record_counts_and_content(rng):
    """Window-count arithmetic of the reference ETL contract: stride =
    window*(1-overlap), align-left, reflect-padded tail (reference
    create_hdf5_dataset.py:352-403, prepare_data overlap_percentage=0.5)."""
    from vae_teb_tpu.data import window_record
    window = 5760
    # exact fit: L = window -> 1 window at offset 0
    fhr, up = synthetic_fhr_up(window, rng)
    w = window_record(fhr[0], up[0], window=window, overlap=0.5)
    assert w["fhr"].shape == (1, window)
    np.testing.assert_array_equal(w["domain_start"], [0.0])
    np.testing.assert_array_equal(w["fhr"][0], fhr[0])
    # L = 2*window with 0.5 overlap -> 3 windows at 0/2880/5760, no padding
    fhr2, up2 = synthetic_fhr_up(2 * window, rng)
    w2 = window_record(fhr2[0], up2[0], window=window, overlap=0.5)
    np.testing.assert_array_equal(w2["domain_start"], [0.0, 2880.0, 5760.0])
    for i, s in enumerate((0, 2880, 5760)):
        np.testing.assert_array_equal(w2["fhr"][i], fhr2[0][s:s + window])
    np.testing.assert_array_equal(w2["weight"], 1.0)  # no padded samples
    # ragged tail: L = 8000 -> ceil((8000-5760)/2880)+1 = 2 windows, padded
    fhr3, up3 = synthetic_fhr_up(8000, rng)
    w3 = window_record(fhr3[0], up3[0], window=window, overlap=0.5)
    assert w3["fhr"].shape == (2, window)
    np.testing.assert_array_equal(w3["domain_start"], [0.0, 2880.0])
    # real part of the tail window matches; padded part carries zero weight
    np.testing.assert_array_equal(w3["fhr"][1][:8000 - 2880],
                                  fhr3[0][2880:8000])
    dec_weight = w3["weight"][1]
    n_real_steps = (8000 - 2880) // 16
    np.testing.assert_array_equal(dec_weight[:n_real_steps], 1.0)
    assert dec_weight[-1] == 0.0  # fully synthetic tail step
    # overlap=0 -> non-overlapping blocking
    w4 = window_record(fhr2[0], up2[0], window=window, overlap=0.0)
    assert w4["fhr"].shape == (2, window)
    np.testing.assert_array_equal(w4["domain_start"], [0.0, float(window)])


def test_window_record_validation(rng):
    from vae_teb_tpu.data import window_record
    fhr, up = synthetic_fhr_up(100, rng)
    with pytest.raises(ValueError):
        window_record(fhr[0], up[0][:50])
    with pytest.raises(ValueError):
        window_record(fhr[0], up[0], overlap=1.0)
    with pytest.raises(ValueError):
        window_record(fhr[0], up[0], weight=np.ones(7, np.float32))


def test_build_dataset_from_records(tmp_path):
    """Long-record ETL end to end: records of length 2*window produce 3
    overlapping windows each; per-record failures land in the errors list
    without killing the build (reference :505-508)."""
    from vae_teb_tpu.data import build_dataset_from_records
    from vae_teb_tpu.ops import PhaseScattering1D
    path = str(tmp_path / "long.h5")
    sc = PhaseScattering1D(J=6, Q=2, T=8, shape=1024, max_order=1)
    rng_l = np.random.default_rng(9)
    records = []
    for i in range(2):
        fhr, up = synthetic_fhr_up(2048, rng_l)
        records.append({"fhr": fhr[0], "up": up[0], "guid": f"rec{i}"})
    records.append({"fhr": np.zeros(1, np.float32),
                    "up": np.zeros(1, np.float32), "guid": "broken"})
    res = build_dataset_from_records(path, records, transform=sc,
                                     window=1024, overlap=0.5)
    assert res["kept"] + res["skipped"] == 2 * 3  # 3 windows per good record
    assert len(res["errors"]) == 1
    assert res["errors"][0]["record"] == "broken"
    info = dataset_info(path)
    assert info["fhr"][0] == res["kept"]
    ds = CombinedHDF5Dataset(path, cache_size=0)
    # epoch stores the window's domain start (reference :501)
    epochs = sorted(float(ds[i].epoch) for i in range(len(ds)))
    assert set(epochs) <= {0.0, 512.0, 1024.0}
    ds.close()


@pytest.fixture(scope="module")
def small_dataset(tmp_path_factory):
    """A tiny but schema-complete dataset built through the real transform."""
    d = tmp_path_factory.mktemp("ds")
    path = str(d / "train.h5")
    from vae_teb_tpu.ops import PhaseScattering1D
    sc = PhaseScattering1D(J=6, Q=2, T=8, shape=1024, max_order=1)
    res = build_dataset(path, n_records=3, windows_per_record=2,
                        len_signal=1024, seed=0, transform=sc)
    assert res["kept"] > 0
    # stats over the built dataset
    calc = DatasetStatsCalculator()
    stats = calc.calculate_stats([path], batch_size=4)
    stats_path = str(d / "stats.h5")
    calc.save_stats(stats, stats_path)
    return path, stats_path, sc


def test_build_and_load(small_dataset):
    path, stats_path, sc = small_dataset
    ds = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=10)
    assert len(ds) > 0
    sample = ds[0]
    n_seq = sc.scattering.n_out
    assert sample.fhr_st.shape == (n_seq, sc.scattering.output_channels)
    assert sample.fhr_ph.shape[0] == n_seq  # (S, C) layout
    assert isinstance(sample.guid, str)
    # normalized multichannel data should be roughly standardized
    assert abs(float(sample.fhr_st.mean())) < 1.5
    ds.close()


def test_read_batch_matches_collate(small_dataset):
    """The batched ingest path (one preallocated buffer + low-level
    hyperslab reads + batch-level in-place normalization) must be
    bit-identical to per-sample collate — including guid/label fields,
    shuffled order, and the partially-warm-cache case."""
    path, stats_path, _ = small_dataset
    ds = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=0)
    idx = list(np.random.default_rng(0).permutation(len(ds)))
    got, want = ds.read_batch(idx), ds.collate(idx)
    assert set(got) == set(want)
    for k in want:
        if isinstance(want[k], np.ndarray):
            assert got[k].dtype == want[k].dtype, k
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
        else:
            assert got[k] == want[k], k
    ds.close()
    # cached variant: first batch warms per-sample cache entries, second
    # read over overlapping indices must still match
    ds2 = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=100)
    ds2.read_batch(idx[:3])
    got2 = ds2.read_batch(idx)
    for k in want:
        if isinstance(want[k], np.ndarray):
            np.testing.assert_array_equal(got2[k], want[k], err_msg=k)
    # FULLY-cached repeat (regression: the all-cached fast path must not
    # call collate while holding the cache lock — deadlocked once)
    got3 = ds2.read_batch(idx)
    for k in want:
        if isinstance(want[k], np.ndarray):
            np.testing.assert_array_equal(got3[k], want[k], err_msg=k)
    ds2.close()


def test_normalize_inplace_matches_reference_fn(rng):
    """normalize_field_inplace (the host ingest fast path) == the traceable
    normalize_field, per field type, on batched (B, C, S) data."""
    from vae_teb_tpu.data import normalize_field_inplace
    b, s = 4, 24
    for name, c in (("fhr_st", 6), ("fhr_ph", 5), ("fhr_up_ph", 7)):
        x = (rng.standard_normal((b, c, s)) * 3).astype(np.float32)
        mean = rng.standard_normal(c).astype(np.float32)
        var = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5
        st = default_field_stats(name, mean, var, n_channels=c)
        want = np.asarray(normalize_field(x, name, st, channel_axis=-2))
        got = normalize_field_inplace(x.copy(), name, st, channel_axis=-2)
        np.testing.assert_array_equal(got, want, err_msg=name)
    x = (rng.standard_normal((b, 50)) * 10 + 140).astype(np.float32)
    st = default_field_stats("fhr", mean=140.0, variance=100.0)
    want = np.asarray(normalize_field(x, "fhr", st))
    got = normalize_field_inplace(x.copy(), "fhr", st)
    np.testing.assert_array_equal(got, want)
    # non-contiguous channel assignment falls back to the reference fn
    x = np.abs(rng.standard_normal((b, 5, s))).astype(np.float32)
    st = FieldStats(mean=np.zeros(5, np.float32),
                    variance=np.ones(5, np.float32),
                    log_channels=(0, 2), asinh_channels=(1, 4))
    want = np.asarray(normalize_field(x, "weird", st, channel_axis=-2))
    got = normalize_field_inplace(x.copy(), "weird", st, channel_axis=-2)
    np.testing.assert_array_equal(got, want)


def test_raw_layout_roundtrip(small_dataset):
    """raw_layout=True + normalize_fields=() delivers on-disk (C, S) bytes;
    host-side normalize+transpose then reproduces the normal loader output
    (the contract Trainer(normalize_stats=...) relies on)."""
    from vae_teb_tpu.data import normalize_field_inplace
    path, stats_path, _ = small_dataset
    raw = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=0,
                              normalize_fields=(), raw_layout=True)
    ref = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=0)
    idx = list(range(len(raw)))
    b_raw, b_ref = raw.read_batch(idx), ref.read_batch(idx)
    for name in ("fhr_st", "fhr_ph", "fhr_up_ph"):
        b_, s_, c_ = b_ref[name].shape  # ref is (B, S, C)
        assert b_raw[name].shape == (b_, c_, s_)
        v = normalize_field_inplace(b_raw[name].copy(), name,
                                    raw.stats[name], channel_axis=-2)
        np.testing.assert_allclose(np.swapaxes(v, 1, 2), b_ref[name],
                                   rtol=0, atol=1e-6, err_msg=name)
    raw.close()
    ref.close()


def test_packed_store_roundtrip(small_dataset, tmp_path):
    """PackedWindowStore materializes a dataset once (trimmed/normalized/
    model layout) and reads it back bit-identically through np.memmap —
    the multi-chip ingest path (no per-epoch decompression)."""
    from vae_teb_tpu.data import PackedWindowStore
    path, stats_path, _ = small_dataset
    ds = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=0)
    out = str(tmp_path / "packed")
    store = PackedWindowStore.build(ds, out, batch_size=3)
    assert len(store) == len(ds)
    assert store.meta["normalized"] is True
    idx = list(np.random.default_rng(2).permutation(len(ds)))
    got, want = store.read_batch(idx), ds.read_batch(idx)
    for k in ("fhr_st", "fhr_ph", "fhr_up_ph", "fhr", "target", "weight"):
        assert got[k].dtype == want[k].dtype, k
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    assert got["guid"] == want["guid"]
    # epoch semantics match the HDF5 loader exactly (shard disjointness)
    for shard in range(2):
        np.testing.assert_array_equal(
            store.epoch_indices(True, seed=5, shard_index=shard,
                                shard_count=2),
            ds.epoch_indices(True, seed=5, shard_index=shard,
                             shard_count=2))
    # loading back from disk (fresh mmap) still matches
    store2 = PackedWindowStore(out, fields=("fhr_st", "fhr"))
    b = store2.read_batch([0, 1])
    np.testing.assert_array_equal(b["fhr_st"], ds.read_batch([0, 1])["fhr_st"])
    ds.close()


def test_pack_data_cli(small_dataset, tmp_path):
    """`cli pack-data` end-to-end: HDF5 -> packed store loadable by path."""
    from vae_teb_tpu.cli import main
    from vae_teb_tpu.data import PackedWindowStore
    path, stats_path, _ = small_dataset
    out = str(tmp_path / "packed_cli")
    rc = main(["pack-data", "--data", path, "--stats", stats_path,
               "--out", out, "--batch-size", "4"])
    assert rc == 0
    store = PackedWindowStore(out)
    ds = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=0)
    assert len(store) == len(ds)
    np.testing.assert_array_equal(store.read_batch([0])["fhr_up_ph"],
                                  ds.read_batch([0])["fhr_up_ph"])
    ds.close()


def test_dataset_filtering(small_dataset):
    path, stats_path, _ = small_dataset
    ds_all = CombinedHDF5Dataset(path, cache_size=0)
    guid0 = ds_all[0].guid
    ds_f = CombinedHDF5Dataset(path, allowed_guids=[guid0], cache_size=0)
    assert 0 < len(ds_f) <= len(ds_all)
    assert all(ds_f[i].guid == guid0 for i in range(len(ds_f)))
    with pytest.raises(ValueError):
        CombinedHDF5Dataset(path, epoch_min=1e12)
    ds_all.close()
    ds_f.close()


def test_shard_slicing(small_dataset):
    path, _, _ = small_dataset
    ds = CombinedHDF5Dataset(path, cache_size=0)
    shards = [ds.epoch_indices(shuffle=True, seed=7, shard_index=i,
                               shard_count=2) for i in range(2)]
    assert len(shards[0]) == len(shards[1])  # drop_last equalizes
    assert not set(shards[0]) & set(shards[1])  # disjoint
    again = ds.epoch_indices(shuffle=True, seed=7, shard_index=0,
                             shard_count=2)
    np.testing.assert_array_equal(shards[0], again)  # deterministic
    ds.close()


def test_batch_iteration_and_prefetch(small_dataset):
    path, stats_path, _ = small_dataset
    ds = CombinedHDF5Dataset(path, stats_path=stats_path, cache_size=0,
                             load_fields=["fhr", "fhr_st", "fhr_ph",
                                          "fhr_up_ph", "guid"])
    batches = list(ds.as_batches(batch_size=2, shuffle=True, seed=0,
                                 drop_last=False))
    assert batches and batches[0].fhr_st.ndim == 3
    assert isinstance(batches[0], Batch)
    dev_batches = list(prefetch_to_device(
        ds.as_batches(batch_size=2, shuffle=False), size=2))
    assert len(dev_batches) >= 1
    assert hasattr(dev_batches[0].fhr_st, "devices")  # on device
    ds.close()


def test_trim_mismatch_raises(small_dataset):
    path, stats_path, _ = small_dataset
    with pytest.raises(ValueError):
        CombinedHDF5Dataset(path, stats_path=stats_path, trim_minutes=2.0)


def test_synthetic_signal_shapes(rng):
    fhr, up = synthetic_fhr_up(5760, rng, n_windows=3)
    assert fhr.shape == (3, 5760) and up.shape == (3, 5760)
    assert 100 < fhr.mean() < 170  # plausible bpm
    assert np.all(up >= 0)


def test_normalize_traceable_matches_host(rng):
    """The jnp path (used inside jit for on-the-fly eval coefficients) must
    agree with the host NumPy path."""
    import jax
    c, s = 5, 16
    x = np.abs(rng.standard_normal((2, c, s))).astype(np.float32)
    mean = rng.standard_normal(c).astype(np.float32)
    var = np.ones(c, np.float32)
    st = default_field_stats("fhr_st", mean, var, n_channels=c)
    host = np.asarray(normalize_field(x, "fhr_st", st))
    traced = np.asarray(jax.jit(
        lambda v: normalize_field(v, "fhr_st", st))(jnp.asarray(x)))
    # TPU transcendental (log) accuracy is ~1e-4 vs host libm
    np.testing.assert_allclose(traced, host, atol=3e-4)


def test_inspect_and_plot_sample(small_dataset, tmp_path):
    from vae_teb_tpu.data import describe_hdf5, format_report, plot_sample
    path, _, _ = small_dataset
    desc = describe_hdf5(path)
    assert desc["n_samples"] > 0
    assert "fhr_up_ph" in desc["fields"]
    report = format_report(desc)
    assert "fhr_st" in report and "MB" in report
    import os
    p = str(tmp_path / "sample.png")
    plot_sample(path, 0, p)
    assert os.path.exists(p)
