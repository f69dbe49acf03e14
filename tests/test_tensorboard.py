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
