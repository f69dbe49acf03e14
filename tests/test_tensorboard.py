"""tfevents writer: CRC/framing/proto round-trip + MetricWriter tee."""

import glob
import os
import struct

from tlsan_tpu.train import tensorboard as tb
from tlsan_tpu.train.metrics import MetricWriter


def test_crc32c_known_vectors():
    # RFC 3720 / common test vectors for CRC32C (Castagnoli)
    assert tb.crc32c(b"") == 0x00000000
    assert tb.crc32c(b"a") == 0xC1D04330
    assert tb.crc32c(b"123456789") == 0xE3069283
    assert tb.crc32c(bytes(32)) == 0x8A9136AA


def test_masked_crc_matches_tfrecord_spec():
    # masking: rot-right-15 + magic; spot-check against the formula
    crc = tb.crc32c(b"123456789")
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert tb.masked_crc32c(b"123456789") == expect


def test_event_roundtrip(tmp_path):
    w = tb.TBEventWriter(str(tmp_path))
    w.add_scalars(7, {"loss": 1.5, "auc": 0.93}, wall_time=123.25)
    w.add_scalars(1000, {"P@10": 0.125}, wall_time=124.0)
    w.close()

    payloads = list(tb.read_records(w.path))
    assert len(payloads) == 3  # file_version + 2 scalar events
    wall, step, scalars = tb.decode_scalar_event(payloads[1])
    assert (wall, step) == (123.25, 7)
    assert scalars["loss"] == 1.5
    assert abs(scalars["auc"] - 0.93) < 1e-6
    wall, step, scalars = tb.decode_scalar_event(payloads[2])
    assert (step, scalars) == (1000, {"P@10": 0.125})


def test_varint_and_framing():
    assert tb._varint(0) == b"\x00"
    assert tb._varint(300) == b"\xac\x02"
    rec = tb.frame_record(b"abc")
    (n,) = struct.unpack("<Q", rec[:8])
    assert n == 3 and rec[12:15] == b"abc"


def test_metric_writer_tees_to_tfevents(tmp_path):
    mw = MetricWriter(str(tmp_path), echo=False)
    mw.write("train", 10, {"loss": 2.0})
    mw.write("eval", 10, {"auc": 0.5, "note": "strings are skipped"})
    mw.close()
    train_files = glob.glob(os.path.join(tmp_path, "train", "events.out.tfevents.*"))
    eval_files = glob.glob(os.path.join(tmp_path, "eval", "events.out.tfevents.*"))
    assert len(train_files) == 1 and len(eval_files) == 1
    _, step, scalars = tb.decode_scalar_event(
        list(tb.read_records(train_files[0]))[1])
    assert step == 10 and scalars["loss"] == 2.0
    _, _, scalars = tb.decode_scalar_event(
        list(tb.read_records(eval_files[0]))[1])
    assert scalars == {"auc": 0.5}  # non-numeric values dropped


def test_jsonl_still_written(tmp_path):
    mw = MetricWriter(str(tmp_path), echo=False, tensorboard=False)
    mw.write("train", 1, {"loss": 1.0})
    mw.close()
    assert os.path.exists(mw.path)
    assert not os.path.exists(os.path.join(tmp_path, "train"))


def test_histo_digest_np_basics():
    import numpy as np
    from tlsan_tpu.train import tensorboard as tb
    a = np.asarray([-2.0, -0.5, 0.0, 0.25, 1.0, 3.0], np.float32)
    mn, mx, num, sm, ssq, counts = tb.histo_digest_np(a)
    assert (mn, mx, num) == (-2.0, 3.0, 6.0)
    assert abs(sm - a.sum()) < 1e-6 and abs(ssq - (a * a).sum()) < 1e-6
    assert counts.sum() == 6.0


def test_histograms_render_in_stock_tensorboard(tmp_path):
    """The on-disk histogram events must load through TensorBoard's own
    event machinery (the reference's train_summary contract,
    TLSAN/model.py:173-183)."""
    import numpy as np
    from tlsan_tpu.train.tensorboard import TBEventWriter, histo_digest_np

    w = TBEventWriter(str(tmp_path))
    rng = np.random.default_rng(0)
    histos = {"gamma": histo_digest_np(np.asarray([1.0])),
              "embedding/1_item_emb": histo_digest_np(rng.normal(size=(50, 8)))}
    w.add_histograms(3, histos)
    w.add_scalars(3, {"L2_norm_user_item": 12.5, "Training Loss": 0.7})
    w.close()

    from tensorboard.backend.event_processing import event_accumulator
    acc = event_accumulator.EventAccumulator(
        str(tmp_path), size_guidance={event_accumulator.HISTOGRAMS: 0})
    acc.Reload()
    tags = acc.Tags()
    assert set(tags["histograms"]) == {"gamma", "embedding/1_item_emb"}
    assert set(tags["scalars"]) == {"L2_norm_user_item", "Training Loss"}
    h = acc.Histograms("embedding/1_item_emb")[0].histogram_value
    assert h.num == 400
    assert len(h.bucket_limit) == len(h.bucket)
    assert sum(h.bucket) == 400
