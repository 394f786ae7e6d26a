"""Hardware-independent tests of the Realsense driver logic.

The SDK is import-gated (no camera in this environment), but the
metadata-timestamping, frame-counter-gap and emitter-mode logic
(Realsense.cpp:106-158, RealsenseRgbd.cpp:80-160) are pure functions of
the frame objects — exercised here with fakes.
"""

import logging
import types

import numpy as np

from okvis2_tpu.pipeline.sensors import RealsenseRgbdSensor, RealsenseSensor


class _FakeMd:
    frame_timestamp = "frame_timestamp"
    frame_counter = "frame_counter"
    frame_emitter_mode = "frame_emitter_mode"


_FAKE_RS = types.SimpleNamespace(frame_metadata_value=_FakeMd)


class _FakeFrame:
    def __init__(self, host_ms, md=None):
        self._host_ms = host_ms
        self._md = md or {}

    def get_timestamp(self):
        return self._host_ms

    def supports_frame_metadata(self, key):
        return key in self._md

    def get_frame_metadata(self, key):
        return self._md[key]


def _bare_sensor(cls=RealsenseSensor):
    """Sensor instance without the SDK import (constructor is gated)."""
    s = object.__new__(cls)
    s._rs = _FAKE_RS
    s._has_device_ts = True
    s._host_offset_us = 0.0
    s._ts_samples = 0
    s._last_frame_counter = None
    if cls is RealsenseRgbdSensor:
        s._supports_emitter_md = True
        s._alt_ctr = 0
    return s


def test_metadata_timestamp_uses_sensor_clock_plus_offset():
    s = _bare_sensor()
    # sensor clock at 1000 us, host clock at 5.0 ms -> offset 4000 us
    f = _FakeFrame(5.0, {"frame_timestamp": 1000})
    t = s._frame_time(f)
    assert abs(t - 5.0e-3) < 1e-12  # first frame: exactly host time
    # sensor advanced 33,333 us; host clock jittered +1 ms. The
    # metadata path keeps the SENSOR spacing (33.333 ms) modulo the
    # slowly-moving averaged offset, instead of inheriting host jitter
    f2 = _FakeFrame(5.0 + 33.333 + 1.0, {"frame_timestamp": 34333})
    t2 = s._frame_time(f2)
    dt = t2 - t
    assert 0.0333 < dt < 0.0343, dt  # ~sensor spacing + half the jitter
    assert s._ts_samples == 2


def test_host_fallback_when_metadata_missing(caplog):
    s = _bare_sensor()
    with caplog.at_level(logging.WARNING, logger="okvis2_tpu"):
        t = s._frame_time(_FakeFrame(7.5))
    assert abs(t - 7.5e-3) < 1e-12
    assert not s._has_device_ts
    assert any("host timestamps" in r.message for r in caplog.records)
    # stays on host clock afterwards, even if metadata appears
    t2 = s._frame_time(_FakeFrame(9.5, {"frame_timestamp": 1}))
    assert abs(t2 - 9.5e-3) < 1e-12


def test_frame_counter_gap_warns(caplog):
    s = _bare_sensor()
    s._check_frame_counter(_FakeFrame(0.0, {"frame_counter": 10}))
    with caplog.at_level(logging.WARNING, logger="okvis2_tpu"):
        s._check_frame_counter(_FakeFrame(0.0, {"frame_counter": 11}))
        assert not caplog.records  # consecutive: no warning
        s._check_frame_counter(_FakeFrame(0.0, {"frame_counter": 14}))
    assert any("dropped 2 frame" in r.message for r in caplog.records)


def test_emitter_mode_metadata_and_fallback(caplog):
    s = _bare_sensor(RealsenseRgbdSensor)
    assert s._emitter_on(_FakeFrame(0, {"frame_emitter_mode": 1})) is True
    assert s._emitter_on(_FakeFrame(0, {"frame_emitter_mode": 0})) is False
    # metadata vanishes -> one warning, then counter fallback (None)
    with caplog.at_level(logging.WARNING, logger="okvis2_tpu"):
        assert s._emitter_on(_FakeFrame(0)) is None
    assert any("emitter mode" in r.message for r in caplog.records)
    assert s._emitter_on(_FakeFrame(0, {"frame_emitter_mode": 1})) is None
