"""Logging utility tests (reference AverageMeter/EMAtracker semantics,
utils/torch_helper.py:61-99)."""

import json
import os

import numpy as np

from cosa_tpu.utils.logging import AverageMeter, EMATracker, MetricWriter, format_iou_table


def test_average_meter_add_pop():
    m = AverageMeter()
    m.add({"a": 1.0, "b": 2.0})
    m.add({"a": 3.0})
    assert m.get("a") == 2.0
    assert m.pop("a") == 2.0
    m.add({"a": 10.0})
    assert m.get("a") == 10.0  # pop resets


def test_ema_tracker():
    t = EMATracker(initial=1.0, decay=0.9)
    t.update(0.0)
    assert abs(t.get() - 0.9) < 1e-12
    t.update(0.0)
    assert abs(t.get() - 0.81) < 1e-12


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.log({"kind": "train", "loss": np.float32(1.5), "iter": 3})
    w.print("hello world")
    w.close()
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[0])
    assert rec["loss"] == 1.5 and rec["kind"] == "train"
    assert "hello world" in open(tmp_path / "print.out").read()


def test_format_iou_table_shape():
    scores = [{"iou": {0: 0.5, 1: 0.25}}, {"iou": {0: 1.0, 1: 0.0}}]
    tab = format_iou_table(scores, ["A", "B"], ["bkg", "cat"])
    assert "bkg" in tab and "mIoU" in tab and "37.50" in tab
