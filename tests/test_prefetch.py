"""Input-pipeline tests: DevicePrefetcher staging + the stage-1 raw loader
(the reference's DataLoader+PrefetchLoader analog, data/prefetch.py)."""
import csv

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from radialog_tpu.data.prefetch import (DevicePrefetcher, pad_text_batch,
                                        stage1_raw_batches)


def test_prefetcher_yields_all_device_resident():
    src = [{"x": np.full((4, 4), i, np.float32)} for i in range(5)]
    with DevicePrefetcher(iter(src), depth=2) as pf:
        got = list(pf)
    assert len(got) == 5
    for i, b in enumerate(got):
        assert isinstance(b["x"], jax.Array)  # staged by device_put
        np.testing.assert_array_equal(np.asarray(b["x"]), src[i]["x"])


def test_prefetcher_propagates_source_errors():
    def bad():
        yield {"x": np.zeros(2)}
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        with DevicePrefetcher(bad(), depth=2) as pf:
            list(pf)


def test_prefetcher_close_mid_stream():
    src = ({"x": np.zeros(2)} for _ in range(100))
    pf = DevicePrefetcher(src, depth=2)
    it = iter(pf)
    next(it)
    pf.close()  # must not hang on the producer's blocked put


def test_pad_text_batch_static_shape():
    ids, mask = pad_text_batch([[5, 6, 7], [8]], max_len=6)
    assert ids.shape == mask.shape == (2, 6)
    np.testing.assert_array_equal(ids[0], [5, 6, 7, 0, 0, 0])
    np.testing.assert_array_equal(mask.sum(1), [3, 1])
    # over-long rows truncate to the static length (no retrace risk)
    ids2, _ = pad_text_batch([list(range(10))], max_len=4)
    assert ids2.shape == (1, 4)


@pytest.fixture
def mimic_tree(tmp_path):
    from radialog_tpu.data.datasets import MimicPaths, Stage1Data
    rng = np.random.default_rng(0)
    img_root = tmp_path / "images"
    rows = []
    for i in range(6):
        folder = f"files/p10/p1000000{i}/s500000{i}"
        d = img_root / folder
        d.mkdir(parents=True)
        Image.fromarray(rng.integers(0, 255, (96, 80), np.uint8), "L").save(
            d / f"dcm-{i:03d}.jpg")
        rows.append((f"dcm-{i:03d}", f"finding number {i} is visible", folder,
                     f"dcm-{i:03d}.jpg"))
    with open(tmp_path / "split.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dicom_id", "split"])
        for dicom, *_ in rows:
            w.writerow([dicom, "train"])
    with open(tmp_path / "sectioned.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["findings", "dicom_id", "Img_Folder", "Img_Filename",
                    "Note_file"])
        for dicom, cap, folder, fn in rows:
            w.writerow([cap, dicom, folder, fn, f"{dicom}.txt"])
    return Stage1Data(MimicPaths(split_csv=str(tmp_path / "split.csv"),
                                 sectioned_csv=str(tmp_path / "sectioned.csv"),
                                 chexpert_csv="",
                                 image_root=str(img_root)),
                      split="train", custom_epochs_per_epoch=2)


def test_stage1_raw_batches_shapes_and_caption_join(mimic_tree):
    from radialog_tpu.data.tokenization import WhitespaceTokenizer
    tok = WhitespaceTokenizer(vocab_size=1000)
    seen = []
    for batch in stage1_raw_batches(mimic_tree, tok, max_txt_len=10, batch=3,
                                    sub_epoch=0, resize=72, crop=64,
                                    threads=2, drop_last=True):
        # round-5 default contract: uint8 single-channel crops, expanded
        # on device (ops/image.expand_cxr_u8 — 12x smaller host batches)
        assert batch["images"].shape == (3, 64, 64)
        assert batch["images"].dtype == np.uint8
        assert batch["text_ids"].shape == (3, 10)  # STATIC text padding
        assert batch["text_mask"].sum(1).min() > 0
        seen.append(batch)
    assert len(seen) == 1  # 3 records per sub-epoch -> one full batch

    # caption join correctness: every emitted row tokenizes to one of the
    # sub-epoch's captions (shuffled order, so check set membership)
    data = mimic_tree
    data.set_custom_epoch(0)
    want = {tuple(tok(data[i]["text_output"], max_length=10)["input_ids"])
            for i in range(len(data))}
    for batch in seen:
        for row, m in zip(batch["text_ids"], batch["text_mask"]):
            assert tuple(row[:m.sum()]) in want


def test_stage1_raw_batches_through_prefetcher(mimic_tree):
    from radialog_tpu.data.tokenization import WhitespaceTokenizer
    tok = WhitespaceTokenizer(vocab_size=1000)
    src = stage1_raw_batches(mimic_tree, tok, max_txt_len=8, batch=3,
                             sub_epoch=1, resize=72, crop=64, threads=2)
    with DevicePrefetcher(src, depth=2) as pf:
        batches = list(pf)
    assert len(batches) == 1
    assert isinstance(batches[0]["images"], jax.Array)
    assert batches[0]["images"].shape == (3, 64, 64)



def test_raw_u8_expand_matches_f32_path(mimic_tree):
    """The uint8 loader contract is EXACT: expand_cxr_u8(u8 batch) must be
    bit-identical to the f32 (raw_u8=False) pipeline output row-for-row
    (the C++ resize rounds back to uint8 exactly like PIL BILINEAR, so
    u8/255 replicated equals the float path's values)."""
    from radialog_tpu.data.tokenization import WhitespaceTokenizer
    from radialog_tpu.ops.image import expand_cxr_u8

    tok = WhitespaceTokenizer(vocab_size=1000)
    # threads=1: the pool fills batches in COMPLETION order (each row is
    # paired with its caption via idx, so any order is a correct batch),
    # which under threads>1 is scheduler-dependent — two separate epochs
    # can emit the same rows permuted, and this row-for-row bitwise
    # comparison flaked under full-suite CPU load. One worker makes
    # completion order == submission order; the threads>1 pool mechanics
    # are covered by test_native_loader.py.
    kw = dict(max_txt_len=8, batch=3, sub_epoch=0, resize=72, crop=64,
              threads=1, seed=0)
    u8 = list(stage1_raw_batches(mimic_tree, tok, raw_u8=True, **kw))
    f32 = list(stage1_raw_batches(mimic_tree, tok, raw_u8=False, **kw))
    assert len(u8) == len(f32) == 1
    np.testing.assert_array_equal(u8[0]["text_ids"], f32[0]["text_ids"])
    np.testing.assert_array_equal(
        np.asarray(expand_cxr_u8(jnp.asarray(u8[0]["images"]))),
        f32[0]["images"])
