"""rosbag2 .db3 reader + standalone CDR decoder.

Builds a genuine rosbag2-format sqlite database with hand-encoded CDR
payloads for sensor_msgs/msg/{Imu, Image} and checks that the reader
reproduces the event stream (reference RosbagReader,
okvis_ros2/src/RosbagReader.cpp)."""

import sqlite3
import struct

import numpy as np

from okvis2_tpu.ros2.rosbag_reader import (
    RosbagReader,
    parse_image,
    parse_imu,
)


class CdrWriter:
    """Little-endian XCDR1 encoder mirroring the reader's alignment."""

    def __init__(self):
        self.buf = bytearray(b"\x00\x01\x00\x00")  # CDR_LE encapsulation

    def _align(self, n):
        rel = len(self.buf) - 4
        self.buf.extend(b"\x00" * ((-rel) % n))

    def u8(self, v):
        self.buf.append(v)

    def i32(self, v):
        self._align(4)
        self.buf.extend(struct.pack("<i", v))

    def u32(self, v):
        self._align(4)
        self.buf.extend(struct.pack("<I", v))

    def f64(self, v):
        self._align(8)
        self.buf.extend(struct.pack("<d", v))

    def f64s(self, vals):
        for v in vals:
            self.f64(v)

    def string(self, s):
        b = s.encode() + b"\x00"
        self.u32(len(b))
        self.buf.extend(b)

    def raw_seq(self, b):
        self.u32(len(b))
        self.buf.extend(b)

    def header(self, t, frame="cam"):
        self.i32(int(t))
        self.u32(int((t - int(t)) * 1e9))
        self.string(frame)


def encode_imu(t, accel, gyro):
    w = CdrWriter()
    w.header(t, "imu")
    w.f64s([0, 0, 0, 1])  # orientation
    w.f64s([0] * 9)
    w.f64s(gyro)
    w.f64s([0] * 9)
    w.f64s(accel)
    w.f64s([0] * 9)
    return bytes(w.buf)


def encode_image(t, img):
    H, W = img.shape
    w = CdrWriter()
    w.header(t, "cam")
    w.u32(H)
    w.u32(W)
    w.string("mono8")
    w.u8(0)
    w.u32(W)
    w.raw_seq(img.tobytes())
    return bytes(w.buf)


def _make_bag(path):
    conn = sqlite3.connect(path)
    conn.execute(
        "CREATE TABLE topics (id INTEGER PRIMARY KEY, name TEXT, "
        "type TEXT, serialization_format TEXT, offered_qos_profiles TEXT)"
    )
    conn.execute(
        "CREATE TABLE messages (id INTEGER PRIMARY KEY, topic_id INTEGER,"
        " timestamp INTEGER, data BLOB)"
    )
    topics = [
        (1, "/okvis/imu", "sensor_msgs/msg/Imu"),
        (2, "/okvis/cam0/image_raw", "sensor_msgs/msg/Image"),
        (3, "/okvis/cam1/image_raw", "sensor_msgs/msg/Image"),
    ]
    for tid, name, typ in topics:
        conn.execute(
            "INSERT INTO topics VALUES (?,?,?,?,?)",
            (tid, name, typ, "cdr", ""),
        )
    rng = np.random.default_rng(0)
    rows = []
    for k in range(20):
        t = 0.005 * k
        rows.append((1, int(t * 1e9),
                     encode_imu(t, [0.1, 0.2, 9.8], [0.01, 0.02, 0.03])))
    imgs = {}
    for k in range(3):
        t = 0.03 * k + 0.001
        img0 = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        img1 = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        imgs[k] = (img0, img1)
        rows.append((2, int(t * 1e9), encode_image(t, img0)))
        rows.append((3, int((t + 0.001) * 1e9), encode_image(t + 0.001, img1)))
    rows.sort(key=lambda r: r[1])
    for i, (tid, ts, data) in enumerate(rows):
        conn.execute("INSERT INTO messages VALUES (?,?,?,?)",
                     (i + 1, tid, ts, data))
    conn.commit()
    conn.close()
    return imgs


def test_cdr_roundtrip():
    t, accel, gyro = parse_imu(
        encode_imu(12.345678901, [1.0, -2.0, 9.81], [0.1, 0.2, -0.3])
    )
    assert abs(t - 12.345678901) < 1e-8
    np.testing.assert_allclose(accel, [1.0, -2.0, 9.81])
    np.testing.assert_allclose(gyro, [0.1, 0.2, -0.3])

    img = np.arange(24 * 32, dtype=np.uint8).reshape(24, 32) % 251
    t2, out = parse_image(encode_image(3.5, img))
    assert abs(t2 - 3.5) < 1e-9
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0)


def test_rosbag_stream(tmp_path):
    bag = str(tmp_path / "session.db3")
    imgs = _make_bag(bag)
    reader = RosbagReader(
        bag,
        ["/okvis/cam0/image_raw", "/okvis/cam1/image_raw"],
        "/okvis/imu",
    )
    n_imu = 0
    frames = []
    for ev in reader.stream():
        if ev[0] == "imu":
            n_imu += 1
            np.testing.assert_allclose(ev[2], [0.1, 0.2, 9.8])
        else:
            frames.append(ev)
    assert n_imu == 20
    assert len(frames) == 3
    for k, (_, t, pair) in enumerate(frames):
        np.testing.assert_allclose(
            pair[0], imgs[k][0].astype(np.float32) / 255.0
        )
        np.testing.assert_allclose(
            pair[1], imgs[k][1].astype(np.float32) / 255.0
        )
    reader.close()


def _mcap_record(op, body):
    return bytes([op]) + struct.pack("<Q", len(body)) + body


def _mcap_str(s):
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _mcap_channel(cid, topic):
    return _mcap_record(
        0x04,
        struct.pack("<HH", cid, 1) + _mcap_str(topic)
        + _mcap_str("cdr") + struct.pack("<I", 0),
    )


def _mcap_message(cid, log_time_ns, data):
    return _mcap_record(
        0x05,
        struct.pack("<HIQQ", cid, 0, log_time_ns, log_time_ns) + data,
    )


def _make_mcap(path, in_chunk=False):
    """Write a genuine mcap v1 bag (magic + records [+ Chunk nesting])."""
    from okvis2_tpu.ros2.rosbag_reader import MCAP_MAGIC

    rng = np.random.default_rng(0)
    channels = (
        _mcap_channel(1, "/okvis/imu")
        + _mcap_channel(2, "/okvis/cam0/image_raw")
        + _mcap_channel(3, "/okvis/cam1/image_raw")
    )
    msgs = b""
    imgs = {}
    rows = []
    for k in range(20):
        t = 0.005 * k
        rows.append((int(t * 1e9), 1,
                     encode_imu(t, [0.1, 0.2, 9.8], [0.01, 0.02, 0.03])))
    for k in range(3):
        t = 0.03 * k + 0.001
        img0 = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        img1 = rng.integers(0, 255, (24, 32), dtype=np.uint8)
        imgs[k] = (img0, img1)
        rows.append((int(t * 1e9), 2, encode_image(t, img0)))
        rows.append((int((t + 0.001) * 1e9), 3,
                     encode_image(t + 0.001, img1)))
    rows.sort(key=lambda r: r[0])
    for ts, cid, data in rows:
        msgs += _mcap_message(cid, ts, data)
    records = channels + msgs
    if in_chunk:
        # wrap everything in one uncompressed Chunk record
        chunk_body = (
            struct.pack("<QQQI", rows[0][0], rows[-1][0], len(records), 0)
            + _mcap_str("")
            + struct.pack("<Q", len(records))
            + records
        )
        records = _mcap_record(0x06, chunk_body)
    with open(path, "wb") as f:
        f.write(MCAP_MAGIC)
        f.write(_mcap_record(0x01, _mcap_str("ros2") + _mcap_str("")))
        f.write(records)
        f.write(_mcap_record(0x0F, struct.pack("<I", 0)))  # DataEnd
        f.write(_mcap_record(0x02, struct.pack("<QQI", 0, 0, 0)))
        f.write(MCAP_MAGIC)
    return imgs


def _check_stream(reader, imgs):
    n_imu = 0
    frames = []
    for ev in reader.stream():
        if ev[0] == "imu":
            n_imu += 1
            np.testing.assert_allclose(ev[2], [0.1, 0.2, 9.8])
        else:
            frames.append(ev)
    assert n_imu == 20
    assert len(frames) == 3
    for k, (_, t, pair) in enumerate(frames):
        np.testing.assert_allclose(
            pair[0], imgs[k][0].astype(np.float32) / 255.0
        )
        np.testing.assert_allclose(
            pair[1], imgs[k][1].astype(np.float32) / 255.0
        )
    reader.close()


def test_mcap_stream(tmp_path):
    """mcap storage round trip (the reference's rosbag2 API reads both
    sqlite3 and mcap, RosbagReader.cpp:341)."""
    bag = str(tmp_path / "session.mcap")
    imgs = _make_mcap(bag, in_chunk=False)
    _check_stream(
        RosbagReader(
            bag,
            ["/okvis/cam0/image_raw", "/okvis/cam1/image_raw"],
            "/okvis/imu",
        ),
        imgs,
    )


def test_mcap_chunked_stream(tmp_path):
    """mcap with Channel/Message records nested inside a Chunk record
    (how real recorders write them)."""
    bag = str(tmp_path / "chunked.mcap")
    imgs = _make_mcap(bag, in_chunk=True)
    _check_stream(
        RosbagReader(
            bag,
            ["/okvis/cam0/image_raw", "/okvis/cam1/image_raw"],
            "/okvis/imu",
        ),
        imgs,
    )
