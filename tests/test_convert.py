"""End-to-end test of the conversion CLI: folder + detections -> VOSequence."""

import numpy as np

from droplet_visual_odometry_tpu.cli import convert
from droplet_visual_odometry_tpu.data import sequence as seq_mod


def _write_inputs(tmp_path):
    rng = np.random.default_rng(0)
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    stamps = np.asarray([10.0, 10.5, 11.0, 11.5, 12.0])
    for t in stamps:
        np.save(frames_dir / f"{t:.6f}.npy", rng.integers(0, 255, (24, 32), dtype=np.uint8))

    # Detections: stamps 10.5..12.5 -> overlap = {10.5, 11.0, 11.5, 12.0};
    # one empty message (11.0) is dropped pre-pairing, so 3 frames pair.
    det_stamps = np.asarray([10.5, 11.0, 11.5, 12.0, 12.5])
    m = 2
    ids = np.full((5, m), -1, np.int32)
    ids[0, 0] = 3
    ids[2, 1] = 3
    ids[3, 0] = 3
    ids[4, 0] = 3  # outside image overlap
    tr = rng.normal(size=(5, m, 3)).astype(np.float32)
    q = np.tile(np.asarray([0, 0, 0, 1.0], np.float32), (5, m, 1))
    corners = rng.uniform(0, 30, (5, m, 4, 2)).astype(np.float32)
    det_path = tmp_path / "dets.npz"
    np.savez(det_path, stamps=det_stamps, ids=ids, translations=tr, quaternions=q, corners=corners)

    calib = tmp_path / "cam.yaml"
    calib.write_text(
        "image_width: 32\nimage_height: 24\n"
        "camera_matrix:\n  rows: 3\n  cols: 3\n"
        "  data: [30.0, 0, 16.0, 0, 30.0, 12.0, 0, 0, 1]\n"
        "distortion_coefficients:\n  rows: 1\n  cols: 5\n  data: [0, 0, 0, 0, 0]\n"
    )
    return frames_dir, det_path, calib


def test_convert_folder_to_sequence(tmp_path):
    frames_dir, det_path, calib = _write_inputs(tmp_path)
    out = tmp_path / "seq.npz"
    store = tmp_path / "seq.vostore"
    rc = convert.main(
        [
            "--images", str(frames_dir), "--stamps-from-names",
            "--detections", str(det_path),
            "--calibration", str(calib), "--controlled",
            "--marker-id", "3", "--marker-length", "0.2",
            "--camera-frame-detections",
            "--out", str(out), "--vostore", str(store),
        ]
    )
    assert rc == 0
    seq = seq_mod.load(str(out))
    # Non-empty detection stamps: 10.5, 11.5, 12.0, 12.5; image stamps
    # 10..12 -> paired = 10.5, 11.5, 12.0.
    np.testing.assert_allclose(seq.timestamps, [10.5, 11.5, 12.0])
    assert seq.marker_present.tolist() == [True, True, True]
    assert seq.marker_ids.tolist() == [3, 3, 3]

    from droplet_visual_odometry_tpu.data.native_store import StoreReader

    with StoreReader(str(store)) as r:
        assert r.n == 3
        np.testing.assert_array_equal(r.read(0, 3), seq.frames)
