from droplet_visual_odometry_tpu.eval import metrics, tum  # noqa: F401
