"""Online (streaming) visual odometry — the live-node capability, TPU-native.

The reference's live variant is a ROS node (utilities_folder/visual_odometry_v2.py):
a marker callback arms the image callback across ROS threads
(v2:97-116, 352-374), each frame chains the pose in-place, and state lives in
mutable node attributes guarded by try/except (the implicit race documented in
SURVEY.md §5). Here the same capability is a synchronous engine object driven
by the host's ingest loop:

  * `push(timestamp, frame, markers)` is the analog of one
    image_callback + marker_callback pair — no threads, no race: the caller
    owns ordering (ROS-style concurrency buys nothing when the device step is
    the bottleneck and frames must be processed in order anyway).
  * marker gating matches v2: processing is armed by the first marker
    detection (v2:104-116); before that, frames only prime the
    previous-frame state.
  * the per-pair device step (features once per frame, carried forward;
    match + RANSAC + scale) is ONE compiled function reused every push —
    the streaming twin of the offline lax.scan (estimation/vo.py).

A lightweight TF-style broadcast hook covers the stag_visualizer capability
(stag_visualizer.py:13-22): `on_pose` callbacks receive (timestamp, pose).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from droplet_visual_odometry_tpu.estimation.vo import VOConfig, two_frame_vo
from droplet_visual_odometry_tpu.frontend.features import detect_and_describe
from droplet_visual_odometry_tpu.groundtruth import (
    GroundTruthConfig,
    MarkerDetections,
    derive_ground_truth,
    marker_pose_to_cTm,
)


@dataclasses.dataclass
class StreamResult:
    """One push()'s outcome."""

    timestamp: float
    pose: np.ndarray  # (4, 4) absolute pose estimate (cTm frame)
    rel: np.ndarray  # (4, 4) relative pose of this step (identity if primed/skipped)
    gt_pose: np.ndarray | None  # marker-derived cTm when a marker was seen
    n_inliers: int
    ok: bool
    armed: bool


class OnlineVO:
    """Marker-gated streaming VO engine.

    Frames must arrive in timestamp order. Shapes are fixed per engine: the
    first frame pins (H, W) and every later frame must match (the reference
    assumed a fixed camera too, v2:44-46).
    """

    def __init__(
        self,
        K: np.ndarray,
        real_marker_length: float,
        reference_id: int = 0,
        cfg: VOConfig = VOConfig(),
        gt_cfg: GroundTruthConfig = GroundTruthConfig(),
        seed: int = 0,
    ) -> None:
        self.cfg = cfg
        self.gt_cfg = gt_cfg
        self.reference_id = reference_id
        self.K = jnp.asarray(K, jnp.float32)
        self.real_marker_length = float(real_marker_length)
        self._key = jax.random.PRNGKey(seed)
        self._armed = False
        self._prev_feats = None
        self._prev_corners = None
        self._prev_valid = False
        self._pose = np.eye(4, dtype=np.float32)
        self._step = 0
        self.on_pose: list[Callable[[float, np.ndarray], None]] = []
        # Per-marker broadcast — the stag_visualizer analog
        # (stag_visualizer.py:13-22 publishes every detected marker as a TF
        # frame `marker_<id>`): callbacks get (timestamp, marker_id, cTm)
        # for EVERY detected marker in the frame, not just reference_id.
        self.on_marker: list[Callable[[float, int, np.ndarray], None]] = []

        def pair_step(key, feats_prev, feats_curr, pc, cc, mv):
            return two_frame_vo(
                key, feats_prev, feats_curr, pc, cc, mv, self.K,
                self.real_marker_length, cfg,
            )

        self._pair_step = jax.jit(pair_step)

    # -- marker handling ----------------------------------------------------
    def _marker_info(self, markers: MarkerDetections | None):
        """Per-frame marker extraction via the batched GT path (N=1)."""
        if markers is None:
            return None, jnp.zeros((4, 2), jnp.float32), False
        streams = derive_ground_truth(markers, jnp.asarray(self.reference_id), self.gt_cfg)
        present = bool(streams.present[0])
        if not present:
            return None, jnp.zeros((4, 2), jnp.float32), False
        return np.asarray(streams.cTm[0]), streams.corners[0], True

    # -- main entry ---------------------------------------------------------
    def push(
        self,
        timestamp: float,
        frame: np.ndarray,
        markers: MarkerDetections | None = None,
    ) -> StreamResult:
        """Process one frame (+ optional marker detections for the same stamp).

        Returns the chained pose estimate. Until the first marker arrives the
        engine stays un-armed (v2 gating): frames prime the previous-frame
        state but no pose is produced.
        """
        gt_pose, corners, mvalid = self._marker_info(markers)
        if markers is not None and self.on_marker:
            self._broadcast_markers(timestamp, markers)

        if not self._armed:
            if gt_pose is None:
                # Not armed, no marker: remember the frame (v2 keeps priming
                # previous_image until the marker appears, v2:352-360).
                self._prime(frame, corners, mvalid)
                return self._result(timestamp, np.eye(4, dtype=np.float32), None, 0, False)
            # First marker: arm, seed the pose from the marker
            # (dual_process:102-117 initialisation).
            self._armed = True
            self._pose = np.asarray(gt_pose, np.float32)
            self._prime(frame, corners, mvalid)
            return self._result(timestamp, np.eye(4, dtype=np.float32), gt_pose, 0, True)

        feats_curr = detect_and_describe(
            jnp.asarray(frame, jnp.float32),
            k=self.cfg.n_keypoints,
            threshold=self.cfg.fast_threshold,
            arc_length=self.cfg.fast_arc_length,
            mode=self.cfg.frontend,
            dog_threshold=self.cfg.dog_threshold,
        )
        self._step += 1
        key = jax.random.fold_in(self._key, self._step)
        res = self._pair_step(
            key,
            self._prev_feats,
            feats_curr,
            self._prev_corners,
            jnp.asarray(corners),
            jnp.asarray(bool(self._prev_valid) and bool(mvalid)),
        )
        rel = np.asarray(res.rel)
        self._pose = rel @ self._pose
        self._prev_feats = feats_curr
        self._prev_corners = jnp.asarray(corners)
        self._prev_valid = mvalid
        return self._result(
            timestamp, rel, gt_pose, int(res.n_inliers), bool(res.ok)
        )

    # -- helpers ------------------------------------------------------------
    def _broadcast_markers(self, timestamp: float, markers: MarkerDetections) -> None:
        """Fire on_marker for every detected marker slot (id >= 0) in the
        frame's detections — per-marker TF-frame parity with
        stag_visualizer.stag_markers_callback (stag_visualizer.py:13-22)."""
        ids = np.asarray(markers.ids[0])
        if not (ids >= 0).any():
            return
        cTms = np.asarray(
            marker_pose_to_cTm(
                jnp.asarray(markers.translations[0]),
                jnp.asarray(markers.quaternions[0]),
                self.gt_cfg,
            )
        )
        for slot in np.flatnonzero(ids >= 0):
            for cb in self.on_marker:
                cb(float(timestamp), int(ids[slot]), cTms[slot])

    def _prime(self, frame, corners, mvalid):
        self._prev_feats = detect_and_describe(
            jnp.asarray(frame, jnp.float32),
            k=self.cfg.n_keypoints,
            threshold=self.cfg.fast_threshold,
            arc_length=self.cfg.fast_arc_length,
            mode=self.cfg.frontend,
            dog_threshold=self.cfg.dog_threshold,
        )
        self._prev_corners = jnp.asarray(corners)
        self._prev_valid = mvalid

    def _result(self, timestamp, rel, gt_pose, n_inliers, ok) -> StreamResult:
        pose = np.asarray(self._pose, np.float32).copy()
        for cb in self.on_pose:
            cb(timestamp, pose)
        return StreamResult(
            timestamp=float(timestamp),
            pose=pose,
            rel=np.asarray(rel, np.float32),
            gt_pose=None if gt_pose is None else np.asarray(gt_pose, np.float32),
            n_inliers=n_inliers,
            ok=ok,
            armed=self._armed,
        )

    @property
    def pose(self) -> np.ndarray:
        return np.asarray(self._pose, np.float32).copy()

    @property
    def armed(self) -> bool:
        return self._armed
