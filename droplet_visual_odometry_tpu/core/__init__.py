from droplet_visual_odometry_tpu.core import se3, camera  # noqa: F401
