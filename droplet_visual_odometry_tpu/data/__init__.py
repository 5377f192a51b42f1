from droplet_visual_odometry_tpu.data import sequence, synthetic  # noqa: F401
