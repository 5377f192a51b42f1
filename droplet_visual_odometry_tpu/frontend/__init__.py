from droplet_visual_odometry_tpu.frontend import (  # noqa: F401
    fast,
    features,
    filters,
    matcher,
    orb,
)
