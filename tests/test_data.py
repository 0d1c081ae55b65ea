"""Data layer tests: index readers, samplers, WAV IO, fused device transforms,
end-to-end pipeline on synthetic data."""

import json
import os
import sqlite3
import wave

import jax
import numpy as np
import pytest

from avsiam_tpu.configs import AudioConfig
from avsiam_tpu.data import (AVDataset, JsonIndex, Prefetcher, SqliteIndex,
                             batched, device_loader, eval_shard_indices,
                             make_eval_transform, make_index_dict,
                             make_train_transform, multihot_labels,
                             shuffled_epoch_indices, weighted_indices)
from avsiam_tpu.data.media import fit_length, mean_center, read_wav, resample


@pytest.fixture
def label_csv(tmp_path):
    p = tmp_path / "labels.csv"
    p.write_text("index,mid,display_name\n0,/m/0,zero\n1,/m/1,one\n2,/m/2,two\n")
    return str(p)


@pytest.fixture
def json_index(tmp_path):
    data = {"data": [
        {"wav": f"/fake/{i}.wav", "labels": f"/m/{i % 3}",
         "video_id": f"v{i}", "video_path": "/fake"} for i in range(10)]}
    p = tmp_path / "idx.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_json_and_sqlite_index(tmp_path, json_index):
    idx = JsonIndex(json_index)
    assert len(idx) == 10
    assert idx[3].wav == "/fake/3.wav"
    db = tmp_path / "idx.sqlite.db"
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE annos (id INTEGER, wav TEXT, labels TEXT)")
    for i in range(7):
        con.execute("INSERT INTO annos VALUES (?, ?, ?)",
                    (i, f"/fake/{i}.wav", "/m/1"))
    con.commit()
    con.close()
    sidx = SqliteIndex(str(db))
    assert len(sidx) == 7
    assert sidx[2].wav == "/fake/2.wav"
    assert sidx[2].labels == "/m/1"

    # concurrent readers (train Prefetcher thread + probe loader) must not
    # race: connections are per-thread
    import threading
    errors = []

    def hammer():
        try:
            for _ in range(200):
                for i in range(7):
                    assert sidx[i].wav == f"/fake/{i}.wav"
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=hammer) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors


def test_labels_multihot(label_csv):
    d = make_index_dict(label_csv)
    y = multihot_labels("/m/0,/m/2", d, 3, label_smooth=0.1)
    np.testing.assert_allclose(y, [0.9, 0.1 / 3, 0.9], atol=1e-6)


def test_eval_shard_indices_pad_and_trim():
    # n=10, world=4 -> per_rank 3, pad with last index
    all_idx = np.concatenate([eval_shard_indices(10, 4, r) for r in range(4)])
    assert len(all_idx) == 12
    np.testing.assert_array_equal(all_idx[:10], np.arange(10))
    np.testing.assert_array_equal(all_idx[10:], [9, 9])


def test_samplers():
    # rank-sharded (torch DistributedSampler): each rank gets total/world
    # entries; the union of all ranks covers the padded permutation
    parts = [shuffled_epoch_indices(10, epoch=0, seed=1, world=4, rank=r)
             for r in range(4)]
    assert all(len(p) == 3 for p in parts)
    assert set(np.concatenate(parts)) == set(range(10))
    idx = shuffled_epoch_indices(10, epoch=0, seed=1)  # world=1: full perm
    assert len(idx) == 10 and set(idx) == set(range(10))
    assert not np.array_equal(
        shuffled_epoch_indices(10, 0, 1, 1), shuffled_epoch_indices(10, 1, 1, 1))
    w = weighted_indices(np.array([0.0, 0.0, 1.0]), 50, epoch=0)
    assert (w == 2).all()
    bs = batched(np.arange(10), 3)
    assert [len(b) for b in bs] == [3, 3, 3]


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((x * 32767).astype("<i2").tobytes())
    y, sr2 = read_wav(str(p))
    assert sr2 == sr and y.shape == (1, sr)
    assert np.abs(y[0] - x).max() < 1e-3
    z = resample(y[0], 16000, 8000)
    assert len(z) == 8000
    assert fit_length(np.ones(5, np.float32), 8).shape == (8,)
    assert abs(mean_center(np.ones(10)).sum()) < 1e-6


def test_synthetic_dataset_and_transforms(json_index, label_csv):
    cfg = AudioConfig(freqm=8, timem=20, mixup=0.5, noise=True)
    ds = AVDataset(json_index, cfg, label_csv=label_csv, mode="train",
                   frame_source="synthetic", im_res=64)
    rng = np.random.RandomState(0)
    wav, frames, labels, wav_len = ds.batch([0, 1, 2, 3], rng)
    assert frames.shape == (4, 1, 64, 64, 3) and frames.dtype == np.uint8
    assert labels.shape == (4, 3)
    assert wav_len.shape == (4,)
    tr = make_train_transform(cfg, im_res=64)
    fb, img, y = tr(jax.random.PRNGKey(0), wav, frames, labels, wav_len)
    assert fb.shape == (4, cfg.target_length, cfg.num_mel_bins)
    assert img.shape == (4, 3, 64, 64)
    assert np.isfinite(np.asarray(fb)).all()
    # mixed labels remain a convex combination
    assert float(np.asarray(y).min()) >= 0.0

    # eval: all 10 frames, no aug
    batch = ds.batch([0, 1], rng, frames_per_sample=10)
    ev = make_eval_transform(cfg, im_res=64)
    fb, img, y = ev(*batch)
    assert img.shape == (2, 10, 3, 64, 64)


def test_pipeline_end_to_end(json_index, label_csv):
    cfg = AudioConfig()
    ds = AVDataset(json_index, cfg, label_csv=label_csv, mode="train",
                   frame_source="synthetic", im_res=32)
    idx_batches = batched(shuffled_epoch_indices(len(ds), 0, 0), 4)
    tr = make_train_transform(cfg, im_res=32)
    n = 0
    for fb, img, y in device_loader(ds, idx_batches, tr,
                                    jax.random.PRNGKey(0)):
        assert fb.shape[0] == 4
        n += 1
    assert n == 2


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = Prefetcher(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


def test_dataset_fault_tolerance(tmp_path, label_csv):
    """Missing media files substitute constant tensors (reference parity:
    src/dataloader.py error fallbacks) instead of crashing the epoch."""
    import json as _json
    data = {"data": [{"wav": "/definitely/missing.wav", "labels": "/m/0",
                      "video_id": "x", "video_path": "/missing"}]}
    p = tmp_path / "bad.json"
    p.write_text(_json.dumps(data))
    cfg = AudioConfig()
    ds = AVDataset(str(p), cfg, label_csv=label_csv, mode="train",
                   frame_source="frames", im_res=32)
    rng = np.random.RandomState(0)
    wav, frames, labels, wav_len = ds.batch([0], rng)
    assert wav.shape[0] == 1 and np.allclose(wav, 0.01)
    assert frames.dtype == np.uint8 and (frames == 3).all()
    assert labels[0, 0] == 1.0


def test_concat_index(tmp_path, json_index):
    """','-joined paths open as a concatenated corpus (Base+ pretrain)."""
    from avsiam_tpu.data.indices import open_index
    import json as _json
    p2 = tmp_path / "idx2.json"
    p2.write_text(_json.dumps(
        {"data": [{"wav": f"/other/{i}.wav", "labels": ""} for i in range(3)]}))
    idx = open_index(f"{json_index},{p2}")
    assert len(idx) == 13
    assert idx[0].wav == "/fake/0.wav"
    assert idx[10].wav == "/other/0.wav"
    assert idx[12].wav == "/other/2.wav"


def test_short_clip_fbank_padding_matches_reference(json_index, label_csv):
    """Rows beyond a short clip's true frame count must be 0.0 pre-norm
    (reference ZeroPad2d on the fbank, dataloader.py:333-343), NOT log-eps
    from zero-padded waveform."""
    from avsiam_tpu.ops.fbank import num_frames_for
    cfg = AudioConfig(target_length=128, num_mel_bins=32, skip_norm=True)
    ds = AVDataset(json_index, cfg, label_csv=label_csv, mode="eval",
                   frame_source="synthetic", im_res=32)
    rng = np.random.RandomState(0)
    wav, frames, labels, wav_len = ds.batch([0, 1], rng)
    # simulate a short clip: true length half the padded buffer
    short = wav_len // 2
    wav = wav.copy()
    for b in range(2):
        wav[b, short[b]:] = 0.0
    ev = make_eval_transform(cfg, im_res=32, single_frame=True)
    fb, _, _ = ev(wav, frames, labels, short)
    fb = np.asarray(fb)
    n_valid = num_frames_for(int(short[0]), cfg.sample_rate)
    assert 0 < n_valid < cfg.target_length
    assert np.allclose(fb[0, n_valid:], 0.0)  # reference-style zero rows
    assert not np.allclose(fb[0, :n_valid], 0.0)  # real content before


def test_gen_weights_balances_rare_classes(tmp_path, label_csv):
    """Rare-class samples get proportionally larger draw weights."""
    import json as _json, pathlib, sys
    scripts = str(pathlib.Path(__file__).parent.parent / "scripts")
    sys.path.insert(0, scripts)
    try:
        from gen_weights import compute_weights
    finally:
        sys.path.remove(scripts)
    data = {"data": ([{"wav": f"/a{i}.wav", "labels": "/m/0"}
                      for i in range(9)]
                     + [{"wav": "/b.wav", "labels": "/m/1"}])}
    p = tmp_path / "w.json"
    p.write_text(_json.dumps(data))
    w = compute_weights(str(p), label_csv)
    assert len(w) == 10
    assert abs(w[-1] / w[0] - 9.0) < 1e-9  # 1 vs 9 occurrences
    # end-to-end: rare sample drawn ~50% of the time under these weights
    idx = weighted_indices(w, 2000, epoch=0)
    frac_rare = (idx == 9).mean()
    assert 0.4 < frac_rare < 0.6


def test_position_keyed_rng_decorrelates_weighted_duplicates(json_index,
                                                             label_csv):
    """Class-balanced (weighted) sampling draws the same clip several times
    per epoch; position-keyed per-sample RNG must give each occurrence an
    independent augmentation stream (torch WeightedRandomSampler semantics),
    while index-keyed calls (no positions) stay bit-reproducible."""
    cfg = AudioConfig()
    ds = AVDataset(json_index, cfg, label_csv=label_csv, mode="train",
                   frame_source="synthetic", im_res=32)
    dup = [0, 0, 0, 0]
    # no positions: all duplicates share the (seed, index) stream
    _, f_same, _, _ = ds.batch(dup, 7)
    assert all(np.array_equal(f_same[0], f_same[k]) for k in range(4))
    # positions: occurrences draw independent random frames
    _, f_pos, _, _ = ds.batch(dup, 7, positions=np.arange(4))
    assert any(not np.array_equal(f_pos[0], f_pos[k]) for k in range(1, 4))
    # reproducible: same positions -> same batch
    _, f_pos2, _, _ = ds.batch(dup, 7, positions=np.arange(4))
    assert np.array_equal(f_pos, f_pos2)


def test_sampler_positions_are_world_invariant():
    """with_positions: rank blocks must carry the GLOBAL epoch positions, so
    reassembling rank batches reproduces the world=1 stream exactly."""
    n, B = 24, 8
    idx1, pos1 = shuffled_epoch_indices(n, 3, 5, world=1, rank=0,
                                        global_batch=B, with_positions=True)
    assert np.array_equal(pos1, np.arange(len(idx1)))
    parts = [shuffled_epoch_indices(n, 3, 5, world=4, rank=r, global_batch=B,
                                    with_positions=True) for r in range(4)]
    # reassemble global batches from rank blocks: [r0 | r1 | r2 | r3]
    lb = B // 4
    for k in range(n // B):
        got_idx = np.concatenate(
            [p[0][k * lb:(k + 1) * lb] for p in parts])
        got_pos = np.concatenate(
            [p[1][k * lb:(k + 1) * lb] for p in parts])
        assert np.array_equal(got_idx, idx1[k * B:(k + 1) * B])
        assert np.array_equal(got_pos, pos1[k * B:(k + 1) * B])
    w = np.ones(n)
    wi, wp = weighted_indices(w, n, 3, 5, world=1, rank=0, global_batch=B,
                              with_positions=True)
    assert len(wi) == len(wp) and np.array_equal(wp, np.arange(len(wi)))


def test_prefetcher_done_arrives_when_queue_full():
    """Regression: the DONE sentinel must reach a slow consumer even when
    the bounded queue is full at producer exit (put_nowait used to drop it,
    deadlocking the consumer's final get())."""
    import time

    from avsiam_tpu.data.pipeline import Prefetcher

    it = Prefetcher(iter([1, 2, 3, 4]), depth=2)
    time.sleep(0.3)  # let the worker fill the queue and finish/block
    assert list(it) == [1, 2, 3, 4]  # must not hang waiting for DONE


def test_prefetcher_close_unblocks_worker_on_early_break():
    """A consumer that stops early must be able to stop the prefetch thread
    (it used to stay blocked forever on the full queue, pinning batches)."""
    import threading
    import time

    from avsiam_tpu.data.pipeline import Prefetcher

    produced = []

    def gen():
        for i in range(100):
            produced.append(i)
            yield i

    it = Prefetcher(gen(), depth=2)
    assert next(it) == 0  # consume one, then walk away
    it.close()
    deadline = time.time() + 5.0
    while it._t.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not it._t.is_alive(), "prefetch thread leaked after close()"
    assert len(produced) < 100  # the producer stopped early, not exhausted
