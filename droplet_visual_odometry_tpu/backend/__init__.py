from droplet_visual_odometry_tpu.backend import ba, keyframes, pose_graph, tracks  # noqa: F401
