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


def test_encode_example_roundtrips_through_own_parser():
    ex = {
        "image": b"\x89PNG fake bytes",
        "label": 7,
        "neg": [-3, 0, 2**40],
        "floats": [0.5, -1.25],
        "multi": [b"a", b"bb"],
    }
    got = tfrecord.parse_example(tfrecord.encode_example(ex))
    assert got["image"] == [b"\x89PNG fake bytes"]
    assert got["label"] == [7]
    assert got["neg"] == [-3, 0, 2**40]
    assert got["floats"] == [0.5, -1.25]
    assert got["multi"] == [b"a", b"bb"]


def test_tf_reads_our_shards(tmp_path):
    """Interop the OTHER way: tf.data must accept our framing, verify our
    masked CRC32C, and parse our hand-rolled Example encoding."""
    rng = np.random.default_rng(3)
    imgs = [rng.integers(0, 256, (SIZE, SIZE, 3), np.uint8) for _ in range(6)]

    def pngs():
        import io

        from PIL import Image

        for k, img in enumerate(imgs):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, format="PNG")
            yield {"image": buf.getvalue(), "label": k,
                   "attributes": np.asarray([1, -1, 1], np.int64)}

    paths = tfrecord.write_tfds_shards(str(tmp_path), "mini", "train",
                                       pngs(), num_shards=2)
    ds = tf.data.TFRecordDataset(paths)  # verifies CRCs internally
    feats = {
        "image": tf.io.FixedLenFeature([], tf.string),
        "label": tf.io.FixedLenFeature([], tf.int64),
        "attributes": tf.io.FixedLenFeature([3], tf.int64),
    }
    seen = 0
    for rec in ds:
        p = tf.io.parse_single_example(rec, feats)
        img = tf.io.decode_png(p["image"]).numpy()
        k = int(p["label"])
        np.testing.assert_array_equal(img, imgs[k])
        np.testing.assert_array_equal(p["attributes"].numpy(), [1, -1, 1])
        seen += 1
    assert seen == len(imgs)


def test_pure_python_crc32c_matches_accelerated():
    import google_crc32c

    from pytorch_glow_tpu.data import tfrecord as tfr

    for data in (b"", b"a", b"123456789", bytes(range(256)) * 3):
        # Force the table fallback by calling the table path directly.
        tfr._CRC_TABLE = None
        import unittest.mock as mock

        with mock.patch.dict("sys.modules", {"google_crc32c": None}):
            try:
                slow = tfr._crc32c(data)
            finally:
                pass
        assert slow == google_crc32c.value(data)


def _load_script(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name,
        os.path.join(os.path.dirname(__file__), "..", "scripts", f"{name}.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_prepare_tfrecords_celeba_chain(tmp_path):
    """Folder CelebA -> prepare_tfrecords (pre-resize) -> Grain TFRecord
    route -> batches carry image AND the +-1 attribute vectors (the delta
    workflow's input)."""
    from PIL import Image

    src = tmp_path / "celeba"
    img_dir = src / "img_align_celeba"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = [f"{i:06d}.jpg" for i in range(1, 41)]
    for nm in names:
        Image.fromarray(
            rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
        ).save(img_dir / nm, quality=95)
    attrs = rng.choice([-1, 1], size=(len(names), 40))
    lines = [str(len(names)), " ".join(f"A{i}" for i in range(40))]
    for nm, row in zip(names, attrs):
        lines.append(nm + " " + " ".join(map(str, row)))
    (src / "list_attr_celeba.txt").write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "tfr")
    prep = _load_script("prepare_tfrecords")
    counts = prep.main(["celeba", str(src), out, "--shards", "2",
                        "--image-size", str(SIZE), "--splits", "train"])
    assert counts["train"] == 38  # 40 minus the 5% holdout

    d = DataConfig(name="celeba", root=out, image_size=SIZE)
    g = GlowConfig(image_shape=(SIZE, SIZE, 3), hidden_channels=16, K=2, L=2)
    it = pipeline.make_dataset(d, g, TrainConfig(batch_size=8, seed=0))
    b = next(it)
    assert b["image"].shape == (8, SIZE, SIZE, 3)
    assert b["attr"].shape == (8, 40)
    assert set(np.unique(b["attr"])) <= {-1, 1}


def test_prepare_tfrecords_image_folder_labels(tmp_path):
    """Class-subdir image_folder -> converter copies the ORIGINAL encoded
    bytes -> labels ride through both reader routes."""
    from PIL import Image

    src = tmp_path / "folder"
    rng = np.random.default_rng(1)
    for ci, cls in enumerate(["cat", "dog"]):
        (src / cls).mkdir(parents=True)
        for i in range(12):
            Image.fromarray(
                rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
            ).save(src / cls / f"{i}.png")

    out = str(tmp_path / "tfr")
    prep = _load_script("prepare_tfrecords")
    prep.main(["image_folder", str(src), out, "--shards", "1",
               "--splits", "train", "--name", "image_folder"])

    # Indexed route (the copied PNG bytes decode unchanged).
    d = DataConfig(name="image_folder", root=out, image_size=SIZE,
                   loader="native")
    g = GlowConfig(image_shape=(SIZE, SIZE, 3), hidden_channels=16, K=2, L=2)
    b = next(pipeline.make_dataset(d, g, TrainConfig(batch_size=8, seed=0)))
    assert b["image"].shape == (8, SIZE, SIZE, 3)
    assert set(b["label"].tolist()) <= {0, 1}
