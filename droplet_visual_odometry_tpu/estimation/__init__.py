from droplet_visual_odometry_tpu.estimation import (  # noqa: F401
    epipolar,
    ransac,
    scale,
    triangulate,
    vo,
)
