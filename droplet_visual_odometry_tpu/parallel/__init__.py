"""Multi-device / multi-host parallelism.

Import-light BY DESIGN: `parallel.launch.initialize()` must be callable
before anything initialises the XLA backend (jax.distributed requires it),
and the compute modules (sharding -> estimation -> frontend) create small
device constants at import time. Import submodules explicitly:

    from droplet_visual_odometry_tpu.parallel import launch      # safe first
    from droplet_visual_odometry_tpu.parallel import sharding    # after init
"""
