"""Pure-Python rosbag reader tests: a from-scratch bag v2.0 WRITER here in the
test builds files per the public spec (records, chunks, connection headers,
little-endian message serialization), and the reader must recover the streams
— covering compressed/raw images, the custom STag marker type decoded purely
from its embedded message_definition, bz2 chunks, and the end-to-end
bag -> VOSequence path through cli/convert --bag."""

import bz2
import struct

import numpy as np
import pytest

from droplet_visual_odometry_tpu.data import lz4f, rosbag

# ---------------------------------------------------------------------------
# Minimal bag v2.0 writer (test-local).
# ---------------------------------------------------------------------------


def _field(name: bytes, value: bytes) -> bytes:
    body = name + b"=" + value
    return struct.pack("<I", len(body)) + body


def _record(fields: dict[bytes, bytes], data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in fields.items())
    return struct.pack("<I", len(header)) + header + struct.pack("<I", len(data)) + data


def _conn_record(conn_id: int, topic: str, msg_type: str, definition: str) -> bytes:
    inner = (
        _field(b"topic", topic.encode())
        + _field(b"type", msg_type.encode())
        + _field(b"md5sum", b"0" * 32)
        + _field(b"message_definition", definition.encode())
    )
    return _record(
        {b"op": b"\x07", b"conn": struct.pack("<I", conn_id), b"topic": topic.encode()},
        inner,
    )


def _msg_record(conn_id: int, t: float, payload: bytes) -> bytes:
    secs = int(t)
    nsecs = int(round((t - secs) * 1e9))
    return _record(
        {
            b"op": b"\x02",
            b"conn": struct.pack("<I", conn_id),
            b"time": struct.pack("<II", secs, nsecs),
        },
        payload,
    )


def _chunk(records: bytes, compression: str) -> bytes:
    if compression == "bz2":
        data = bz2.compress(records)
    elif compression == "lz4":
        # GENUINE independent compressor: the system liblz4's own
        # LZ4F_compressFrame (default block-linked frames), NOT a re-read of
        # our frame decoder's spec understanding.
        data = lz4f.compress_frame(records)
    else:
        data = records
    return _record(
        {
            b"op": b"\x05",
            b"compression": compression.encode(),
            b"size": struct.pack("<I", len(records)),
        },
        data,
    )


def write_bag(path, chunks: list[bytes], connections: bytes = b"") -> None:
    bag_header = _record(
        {
            b"op": b"\x03",
            b"index_pos": struct.pack("<Q", 0),
            b"conn_count": struct.pack("<I", 2),
            b"chunk_count": struct.pack("<I", len(chunks)),
        },
        b" " * 128,  # real writers pad this record; reader must skip it
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(bag_header)
        f.write(connections)
        for c in chunks:
            f.write(c)


# -- message serialization (little-endian, per ROS1 serialization rules) ----


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _header(stamp: float, frame_id: str = "cam") -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return struct.pack("<III", 7, secs, nsecs) + _string(frame_id)


IMAGE_DEF = """Header header
string format
uint8[] data

================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""

RAW_IMAGE_DEF = """Header header
uint32 height
uint32 width
string encoding
uint8 is_bigendian
uint32 step
uint8[] data

================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
"""

# A custom STag-style marker message: only its embedded definition tells the
# reader how to decode it (the reference consumes marker.id / marker.corners /
# marker.pose.pose, traj_eval_ground_truth.py:105-106, 207).
MARKERS_DEF = """Header header
StagMarker[] markers

================================================================================
MSG: std_msgs/Header
uint32 seq
time stamp
string frame_id
================================================================================
MSG: stag_ros/StagMarker
Header header
uint32 id
uint8 reprojection_error   # constant-free extra field exercises field order
geometry_msgs/PoseStamped pose
geometry_msgs/Point[] corners
================================================================================
MSG: geometry_msgs/PoseStamped
Header header
Pose pose
================================================================================
MSG: geometry_msgs/Pose
Point position
Quaternion orientation
================================================================================
MSG: geometry_msgs/Point
float64 x
float64 y
float64 z
================================================================================
MSG: geometry_msgs/Quaternion
float64 x
float64 y
float64 z
float64 w
"""


def _point(x, y, z=0.0) -> bytes:
    return struct.pack("<ddd", x, y, z)


def _marker_msg(stamp: float, mid: int, corners: np.ndarray, t, q) -> bytes:
    marker = (
        _header(stamp)
        + struct.pack("<IB", mid, 0)
        + _header(stamp)  # PoseStamped.header
        + _point(*t)
        + struct.pack("<dddd", *q)
        + struct.pack("<I", len(corners))
        + b"".join(_point(c[0], c[1]) for c in corners)
    )
    return _header(stamp) + struct.pack("<I", 1) + marker


def _compressed_image_msg(stamp: float, img: np.ndarray) -> bytes:
    cv2 = pytest.importorskip("cv2")
    ok, enc = cv2.imencode(".png", img)
    assert ok
    data = enc.tobytes()
    return _header(stamp) + _string("png") + struct.pack("<I", len(data)) + data


def _raw_image_msg(stamp: float, img: np.ndarray) -> bytes:
    h, w = img.shape
    return (
        _header(stamp)
        + struct.pack("<II", h, w)
        + _string("mono8")
        + struct.pack("<BI", 0, w)
        + struct.pack("<I", h * w)
        + img.tobytes()
    )


IMG_TOPIC = "/camera_array/cam1/image_raw/compressed"
MARKER_TOPIC = "/stag_markers"


def _build_bag(path, compression: str, raw_images: bool = False) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 255, (3, 24, 32), dtype=np.uint8)
    stamps = np.asarray([10.0, 10.5, 11.0])
    corners = np.asarray([[4.0, 4.0], [12.0, 4.5], [12.5, 12.0], [4.5, 12.5]])

    img_def = RAW_IMAGE_DEF if raw_images else IMAGE_DEF
    img_type = "sensor_msgs/Image" if raw_images else "sensor_msgs/CompressedImage"
    conns = _conn_record(0, IMG_TOPIC, img_type, img_def) + _conn_record(
        1, MARKER_TOPIC, "stag_ros/StagMarkers", MARKERS_DEF
    )
    records = conns
    for i, t in enumerate(stamps):
        payload = (
            _raw_image_msg(t, frames[i]) if raw_images else _compressed_image_msg(t, frames[i])
        )
        records += _msg_record(0, t, payload)
        if i != 1:  # marker missing on the middle frame
            records += _msg_record(
                1, t, _marker_msg(t, 3, corners + i, [0.1 * i, 0.2, 1.5], [0, 0, 0, 1.0])
            )
    write_bag(path, [_chunk(records, compression)])
    return frames, stamps


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
def test_extract_bag(tmp_path, compression):
    if compression == "lz4" and not lz4f.native_available():
        pytest.skip("no liblz4 to build the fixture")
    path = str(tmp_path / "t.bag")
    frames, stamps = _build_bag(path, compression)
    fr, dets = rosbag.extract_bag(path, IMG_TOPIC, MARKER_TOPIC)
    np.testing.assert_array_equal(fr["frames"], frames)  # png round-trips losslessly
    np.testing.assert_allclose(fr["timestamps"], stamps, atol=1e-6)
    np.testing.assert_allclose(dets["stamps"], [10.0, 11.0], atol=1e-6)
    assert dets["ids"][:, 0].tolist() == [3, 3]
    np.testing.assert_allclose(dets["corners"][1, 0, 2], [14.5, 14.0])
    np.testing.assert_allclose(dets["translations"][1, 0], [0.2, 0.2, 1.5])


def test_extract_bag_raw_images(tmp_path):
    path = str(tmp_path / "raw.bag")
    frames, stamps = _build_bag(path, "none", raw_images=True)
    fr, _ = rosbag.extract_bag(path, IMG_TOPIC, MARKER_TOPIC)
    np.testing.assert_array_equal(fr["frames"], frames)


def test_reader_rejects_non_bag(tmp_path):
    p = tmp_path / "x.bag"
    p.write_bytes(b"PK\x03\x04 definitely not a bag\n")
    with pytest.raises(ValueError, match="not a ROS bag"):
        rosbag.BagReader(str(p))


def test_convert_bag_to_sequence(tmp_path):
    """End-to-end: .bag -> cli/convert --bag -> VOSequence with exact-stamp
    pairing and marker GT (the full reference ingest path without ROS)."""
    from droplet_visual_odometry_tpu.cli import convert
    from droplet_visual_odometry_tpu.data import sequence as seq_mod

    path = str(tmp_path / "t.bag")
    _build_bag(path, "bz2")
    calib = tmp_path / "cam.yaml"
    calib.write_text(
        "image_width: 32\nimage_height: 24\n"
        "camera_matrix:\n  rows: 3\n  cols: 3\n"
        "  data: [30.0, 0, 16.0, 0, 30.0, 12.0, 0, 0, 1]\n"
        "distortion_coefficients:\n  rows: 1\n  cols: 5\n  data: [0, 0, 0, 0, 0]\n"
    )
    out = tmp_path / "seq.npz"
    rc = convert.main(
        [
            "--bag", path,
            "--image-topic", IMG_TOPIC, "--marker-topic", MARKER_TOPIC,
            "--calibration", str(calib), "--controlled",
            "--marker-id", "3", "--marker-length", "0.2",
            "--camera-frame-detections",
            "--out", str(out),
        ]
    )
    assert rc == 0
    seq = seq_mod.load(str(out))
    # Image stamps 10/10.5/11; markers at 10 and 11 only -> 2 paired frames.
    np.testing.assert_allclose(seq.timestamps, [10.0, 11.0])
    assert seq.marker_present.tolist() == [True, True]


def test_lz4_frame_decoder_pure_python_matches_native(monkeypatch):
    """The pure-Python block decoder (no-liblz4 fallback) must decode the
    SAME liblz4-produced frames byte-for-byte, including block-linked frames
    whose matches reach into the previous block's window (>64 KB payload)
    and incompressible payloads stored as uncompressed blocks."""
    if not lz4f.native_available():
        pytest.skip("no liblz4 to build the fixtures")
    rng = np.random.default_rng(0)
    compressible = bytes(rng.integers(0, 4, 300_000, dtype=np.uint8))
    incompressible = bytes(rng.integers(0, 256, 5_000, dtype=np.uint8))
    for payload in (compressible, incompressible, b"", b"abc" * 50_000):
        frame = lz4f.compress_frame(payload)
        assert lz4f.decompress(frame) == payload  # native block path
        monkeypatch.setattr(lz4f, "_lib", None)
        monkeypatch.setattr(lz4f, "_lib_tried", True)
        assert lz4f.decompress(frame) == payload  # pure-Python block path
        monkeypatch.setattr(lz4f, "_lib_tried", False)
