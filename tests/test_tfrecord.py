"""tfds-on-disk TFRecord reader (data/tfrecord.py): the pure-Python parser
against REAL TensorFlow-written shards (TF generates fixtures only; the
production path is TF-free)."""

import os

import numpy as np
import pytest

from pytorch_glow_tpu.config import DataConfig, GlowConfig, TrainConfig
from pytorch_glow_tpu.data import pipeline, tfrecord

tf = pytest.importorskip("tensorflow")


N_TRAIN, N_TEST, SIZE = 48, 16, 8


@pytest.fixture(scope="module")
def tfds_root(tmp_path_factory):
    """A tfds-style directory: <root>/cifar10-<split>.tfrecord-0000N-of-0000N
    with PNG "image" bytes + int64 "label" (the tfds cifar10 schema)."""
    root = tmp_path_factory.mktemp("tfds")
    rng = np.random.default_rng(0)

    def write(split, n, shards):
        per = n // shards
        k = 0
        for s in range(shards):
            name = f"cifar10-{split}.tfrecord-{s:05d}-of-{shards:05d}"
            with tf.io.TFRecordWriter(str(root / name)) as w:
                for _ in range(per):
                    img = rng.integers(0, 256, (SIZE, SIZE, 3), np.uint8)
                    ex = tf.train.Example(features=tf.train.Features(feature={
                        "image": tf.train.Feature(bytes_list=tf.train.BytesList(
                            value=[tf.io.encode_png(img).numpy()])),
                        "label": tf.train.Feature(int64_list=tf.train.Int64List(
                            value=[k % 10])),
                        "id": tf.train.Feature(bytes_list=tf.train.BytesList(
                            value=[f"ex{k}".encode()])),
                    }))
                    w.write(ex.SerializeToString())
                    k += 1

    write("train", N_TRAIN, shards=2)
    write("test", N_TEST, shards=1)
    return str(root)


def _cfgs(root, bs=8):
    return (
        DataConfig(name="cifar10", root=root, image_size=SIZE),
        GlowConfig(image_shape=(SIZE, SIZE, 3), hidden_channels=16, K=2, L=2),
        TrainConfig(batch_size=bs, seed=0),
    )


def test_parse_example_matches_tf_writer(tfds_root):
    paths = tfrecord.find_tfds_shards(tfds_root, "cifar10", "train")
    assert len(paths) == 2
    idx = tfrecord.index_tfrecord(paths[0])
    assert len(idx) == N_TRAIN // 2
    with open(paths[0], "rb") as f:
        ex = tfrecord.parse_example(tfrecord.read_record(f, *idx[0]))
    assert set(ex) == {"image", "label", "id"}
    assert ex["id"] == [b"ex0"] and ex["label"] == [0]
    img = np.asarray(tf.io.decode_png(ex["image"][0]))
    assert img.shape == (SIZE, SIZE, 3)


def test_tfds_batches_cover_epoch_and_resume(tfds_root):
    d, g, t = _cfgs(tfds_root)
    it = tfrecord.tfds_batches(d, g, t, "train")
    seen_labels = []
    for _ in range(N_TRAIN // t.batch_size):  # one epoch
        b = next(it)
        assert b["image"].shape == (8, SIZE, SIZE, 3)
        assert b["image"].dtype == np.uint8
        seen_labels.extend(b["label"].tolist())
    assert len(seen_labels) == N_TRAIN  # full epoch, no repeats dropped

    # O(1) resume: a fresh iterator set to the same state yields the
    # identical next batch.
    state = it.get_state()
    nxt = next(it)
    it2 = tfrecord.tfds_batches(d, g, t, "train")
    it2.set_state(state)
    nxt2 = next(it2)
    assert np.array_equal(nxt["image"], nxt2["image"])
    assert np.array_equal(nxt["label"], nxt2["label"])


def test_tfds_test_split_deterministic_and_cycles(tfds_root):
    """Test split: deterministic order AND cycling — the trainer's periodic
    eval islices a few batches per boundary for the whole run (the
    array_batches contract; a one-pass iterator would silently starve eval
    + best-checkpoint selection mid-run)."""
    import itertools

    d, g, t = _cfgs(tfds_root)
    bpe = N_TEST // t.batch_size
    it = tfrecord.tfds_batches(d, g, t, "test")
    batches = list(itertools.islice(it, bpe + 1))  # one full pass + wrap
    assert np.array_equal(batches[0]["image"], batches[bpe]["image"])
    it2 = tfrecord.tfds_batches(d, g, t, "test")
    assert np.array_equal(batches[0]["image"], next(it2)["image"])


def test_shardset_reads_are_thread_safe(tfds_root):
    """Regression: grain's prefetch THREADS call the source concurrently; a
    shared seek+read handle interleaved positions across threads and
    returned garbage protobuf (found by a real TPU resume run).  _ShardSet
    uses os.pread, so concurrent reads must match serial ones exactly."""
    from concurrent.futures import ThreadPoolExecutor

    paths = tfrecord.find_tfds_shards(tfds_root, "cifar10", "train")
    shards = tfrecord._ShardSet(paths)
    want = [shards.read(i) for i in range(len(shards))]
    idxs = [i % len(shards) for i in range(len(shards) * 20)]
    with ThreadPoolExecutor(max_workers=8) as ex:
        got = list(ex.map(shards.read, idxs))
    for i, payload in zip(idxs, got):
        assert payload == want[i]
        tfrecord.parse_example(payload)  # valid protobuf


def test_make_dataset_routes_to_tfrecords(tfds_root, capsys):
    # loader="native" pins the single-threaded indexed reader (the Grain
    # TFRecord source owns the "auto" route — tested below).
    d, g, t = _cfgs(tfds_root)
    d = DataConfig(name="cifar10", root=tfds_root, image_size=SIZE,
                   loader="native")
    it = pipeline.make_dataset(d, g, t)
    assert "tfds TFRecords" in capsys.readouterr().out
    b = next(it)
    assert b["image"].shape == (8, SIZE, SIZE, 3)


def test_make_dataset_auto_routes_tfrecords_to_grain(tfds_root):
    """Default loader="auto": tfds shard dirs go through the Grain source
    (worker-process decode, opaque checkpoint state)."""
    from pytorch_glow_tpu.data import grain_pipeline

    if not grain_pipeline.GRAIN_AVAILABLE:
        pytest.skip("grain not installed")
    d, g, t = _cfgs(tfds_root)
    it = pipeline.make_dataset(d, g, t)
    assert isinstance(it, grain_pipeline.GrainIterator)
    b = next(it)
    assert b["image"].shape == (8, SIZE, SIZE, 3)
    assert b["image"].dtype == np.uint8
    assert b["label"].shape == (8,)  # labels ride along

    # Opaque-state resume: a fresh iterator at the same state continues
    # with the identical batch.
    state = it.get_state()
    want = next(it)
    it2 = pipeline.make_dataset(d, g, t)
    it2.set_state(state)
    got = next(it2)
    np.testing.assert_array_equal(want["image"], got["image"])
    np.testing.assert_array_equal(want["label"], got["label"])


def test_grain_tfrecord_worker_process_decode(tfds_root):
    """grain_workers > 0: the TFRecord source pickles across the spawned
    worker process (open shard handles re-open lazily) and yields the same
    deterministic stream as in-process decode."""
    from pytorch_glow_tpu.data import grain_pipeline

    if not grain_pipeline.GRAIN_AVAILABLE:
        pytest.skip("grain not installed")
    _, g, t = _cfgs(tfds_root)
    batches = {}
    for workers in (0, 1):
        d = DataConfig(name="cifar10", root=tfds_root, image_size=SIZE,
                       grain_workers=workers)
        it = pipeline.make_dataset(d, g, t)
        batches[workers] = next(it)
    np.testing.assert_array_equal(batches[0]["image"], batches[1]["image"])
    np.testing.assert_array_equal(batches[0]["label"], batches[1]["label"])


def test_train_end_to_end_on_tfrecords(tfds_root, tmp_path):
    from pytorch_glow_tpu.config import OptimConfig, Profile
    from pytorch_glow_tpu.train import builder as builderlib
    from pytorch_glow_tpu.train import trainer as trainerlib

    p = Profile(
        name="tfr",
        glow=GlowConfig(image_shape=(SIZE, SIZE, 3), hidden_channels=16, K=2, L=2),
        optim=OptimConfig(lr=1e-3, warmup_steps=4),
        train=TrainConfig(batch_size=8, num_steps=4, scalar_log_gap=4,
                          plot_gap=0, checkpoint_gap=0, num_sample_images=4),
        data=DataConfig(name="cifar10", root=tfds_root, image_size=SIZE),
        out_dir=str(tmp_path),
    )
    r = trainerlib.train(builderlib.build(p), quiet=True)
    assert r["final_step"] == 4 and np.isfinite(r["loss"])


def test_resume_across_loader_switch_replays(tfds_root, tmp_path):
    """A snapshot written under the indexed loader resumes after the profile
    routes to Grain: the incompatible data-state sidecar degrades to batch
    replay instead of crashing the resume."""
    from pytorch_glow_tpu.config import OptimConfig, Profile
    from pytorch_glow_tpu.data import grain_pipeline
    from pytorch_glow_tpu.train import builder as builderlib
    from pytorch_glow_tpu.train import trainer as trainerlib

    if not grain_pipeline.GRAIN_AVAILABLE:
        pytest.skip("grain not installed")

    def prof(loader, steps):
        return Profile(
            name="tfr_switch",
            glow=GlowConfig(image_shape=(SIZE, SIZE, 3), hidden_channels=16,
                            K=2, L=2),
            optim=OptimConfig(lr=1e-3, warmup_steps=4),
            train=TrainConfig(batch_size=8, num_steps=steps, scalar_log_gap=4,
                              plot_gap=0, checkpoint_gap=4,
                              num_sample_images=4),
            data=DataConfig(name="cifar10", root=tfds_root, image_size=SIZE,
                            loader=loader),
            out_dir=str(tmp_path),
        )

    trainerlib.train(builderlib.build(prof("native", 4)), quiet=True)
    built = builderlib.build(prof("auto", 8))  # now routes to Grain
    assert built.resumed and built.start_step == 4
    assert built.extras["data_resume"] == "replay"
    r = trainerlib.train(built, quiet=True)
    assert r["final_step"] == 8 and np.isfinite(r["loss"])


def test_resize_and_crop_when_sizes_differ(tfds_root):
    # Profile wants 6x6 from 8x8 shards: short-side resize + center crop.
    d = DataConfig(name="cifar10", root=tfds_root, image_size=6)
    g = GlowConfig(image_shape=(6, 6, 3), hidden_channels=16, K=2, L=1)
    t = TrainConfig(batch_size=8, seed=0)
    b = next(tfrecord.tfds_batches(d, g, t, "train"))
    assert b["image"].shape == (8, 6, 6, 3)


def test_multiprocess_rows_are_disjoint_and_cover_batch(tfds_root, monkeypatch):
    """Under jax.process_count()==2 each process reads only its rows of the
    global batch; together they reproduce the single-process batch exactly
    (same contract as the Grain path)."""
    d, g, t = _cfgs(tfds_root)
    full = next(tfrecord.tfds_batches(d, g, t, "train"))

    parts = []
    for pidx in (0, 1):
        monkeypatch.setattr(pipeline, "_proc_slice", lambda p=pidx: (p, 2))
        it = tfrecord.tfds_batches(d, g, t, "train")
        parts.append(next(it))
    assembled = np.concatenate([parts[0]["image"], parts[1]["image"]])
    assert parts[0]["image"].shape[0] == t.batch_size // 2
    assert np.array_equal(assembled, full["image"])
    labels = np.concatenate([parts[0]["label"], parts[1]["label"]])
    assert np.array_equal(labels, full["label"])
