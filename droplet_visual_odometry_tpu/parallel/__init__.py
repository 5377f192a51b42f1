from droplet_visual_odometry_tpu.parallel import sharding  # noqa: F401
