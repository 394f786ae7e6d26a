"""rosbag2 (sqlite3 .db3) dataset reader — no ROS2 installation needed.

Covers the reference's RosbagReader (okvis_ros2/src/RosbagReader.cpp:341,
which replays sensor_msgs Image/Imu topics from rosbag2 into
ThreadedSlam). rosbag2's sqlite3 storage is just a `messages` table of
CDR-serialised blobs, and sensor_msgs/msg/Imu and Image have fixed,
simple layouts — so this reader parses both directly with a ~100-line
CDR decoder instead of requiring rclpy/rosbag2_py. The mcap variant of
the reference is not covered (storage plugin, rarely used for EuRoC-type
replays); .db3 is rosbag2's default.

Event-stream contract matches pipeline.dataset.EurocDatasetReader:
yields ("imu", t, accel, gyro) and ("images", t, [img, ...]) in time
order with camera sync-grouping by timestamp tolerance.
"""

from __future__ import annotations

import sqlite3
import struct
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


class CdrReader:
    """Minimal XCDR1 little-endian reader (ROS2's default RMW encoding).

    Handles the 4-byte encapsulation header and the alignment rules
    needed by sensor_msgs/msg/{Imu, Image}: primitives align to their
    size relative to the start of the payload (after the header)."""

    def __init__(self, buf: bytes):
        # encapsulation: {0x00, 0x01} = CDR_LE
        if len(buf) < 4:
            raise ValueError("CDR payload too short")
        self.le = buf[1] in (0x01, 0x03)
        self.buf = buf
        self.pos = 4

    def _align(self, n: int):
        rel = self.pos - 4
        pad = (-rel) % n
        self.pos += pad

    def _unpack(self, fmt: str, size: int):
        self._align(size)
        (v,) = struct.unpack_from(
            ("<" if self.le else ">") + fmt, self.buf, self.pos
        )
        self.pos += size
        return v

    def uint8(self):
        return self._unpack("B", 1)

    def int32(self):
        return self._unpack("i", 4)

    def uint32(self):
        return self._unpack("I", 4)

    def float64(self):
        return self._unpack("d", 8)

    def string(self) -> str:
        n = self.uint32()
        s = self.buf[self.pos:self.pos + n]
        self.pos += n
        return s[:-1].decode("utf-8", "replace") if n else ""

    def float64_array(self, n: int) -> np.ndarray:
        self._align(8)
        out = np.frombuffer(
            self.buf, dtype="<f8" if self.le else ">f8",
            count=n, offset=self.pos,
        )
        self.pos += 8 * n
        return np.asarray(out)

    def bytes_seq(self) -> bytes:
        n = self.uint32()
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def header(self) -> float:
        """std_msgs/Header -> timestamp [s] (frame_id consumed)."""
        sec = self.int32()
        nanosec = self.uint32()
        self.string()
        return sec + nanosec * 1e-9


def parse_imu(buf: bytes) -> Tuple[float, np.ndarray, np.ndarray]:
    """sensor_msgs/msg/Imu -> (t, accel [3], gyro [3])."""
    r = CdrReader(buf)
    t = r.header()
    r.float64_array(4)  # orientation quaternion
    r.float64_array(9)  # orientation covariance
    gyro = r.float64_array(3).copy()
    r.float64_array(9)
    accel = r.float64_array(3).copy()
    r.float64_array(9)
    return t, accel, gyro


def parse_image(buf: bytes) -> Tuple[float, np.ndarray]:
    """sensor_msgs/msg/Image -> (t, gray float32 [H,W] in [0,1])."""
    r = CdrReader(buf)
    t = r.header()
    height = r.uint32()
    width = r.uint32()
    encoding = r.string()
    r.uint8()  # is_bigendian
    step = r.uint32()
    data = r.bytes_seq()
    a = np.frombuffer(data, np.uint8)
    if encoding in ("mono8", "8UC1"):
        img = a.reshape(height, step)[:, :width]
    elif encoding in ("rgb8", "bgr8"):
        img = a.reshape(height, step // 3, 3)[:, :width, :]
        img = img.mean(axis=-1).astype(np.uint8)
    else:
        raise ValueError(f"unsupported image encoding {encoding!r}")
    return t, img.astype(np.float32) / 255.0


class RosbagReader:
    """Replay Image/Imu topics from a rosbag2 .db3 file.

    imu_topic / image_topics select the streams (image_topics order
    defines the camera index)."""

    def __init__(
        self,
        path: str,
        image_topics: List[str],
        imu_topic: str,
        sync_tolerance: float = 0.005,
    ):
        self.conn = sqlite3.connect(path)
        self.image_topics = list(image_topics)
        self.imu_topic = imu_topic
        self.sync_tolerance = sync_tolerance
        cur = self.conn.execute("SELECT id, name, type FROM topics")
        self.topic_ids: Dict[int, str] = {}
        names = {}
        for tid, name, typ in cur.fetchall():
            names[name] = (tid, typ)
        missing = [
            t for t in [imu_topic] + image_topics if t not in names
        ]
        if missing:
            raise KeyError(
                f"topics {missing} not in bag (has {sorted(names)})"
            )
        self._imu_tid = names[imu_topic][0]
        self._img_tids = {
            names[t][0]: ci for ci, t in enumerate(image_topics)
        }

    def stream(self) -> Iterator[tuple]:
        """Yields ("imu", t, accel, gyro) / ("images", t, [img...])."""
        tids = [self._imu_tid] + list(self._img_tids)
        q = (
            "SELECT topic_id, timestamp, data FROM messages "
            f"WHERE topic_id IN ({','.join('?' * len(tids))}) "
            "ORDER BY timestamp"
        )
        pending: Dict[int, Tuple[float, np.ndarray]] = {}
        n_cams = len(self._img_tids)
        for tid, _ts, blob in self.conn.execute(q, tids):
            if tid == self._imu_tid:
                t, accel, gyro = parse_imu(blob)
                yield ("imu", t, accel, gyro)
                continue
            ci = self._img_tids[tid]
            t, img = parse_image(blob)
            pending[ci] = (t, img)
            if len(pending) == n_cams:
                ts = [pending[c][0] for c in range(n_cams)]
                if max(ts) - min(ts) <= self.sync_tolerance:
                    yield (
                        "images", float(np.mean(ts)),
                        [pending[c][1] for c in range(n_cams)],
                    )
                    pending = {}
                else:
                    # drop the oldest frame of the unsynced group
                    oldest = min(pending, key=lambda c: pending[c][0])
                    del pending[oldest]

    def close(self):
        self.conn.close()
