"""Cross-cutting utilities: config system, profiling, checkpoint/resume.

The reference has none of these (SURVEY.md §5): configuration is positional
sys.argv + hard-coded absolute paths (trajectory_evaluation_dual_process.py:
293-338), diagnostics are print statements, and a crash loses the whole run.
"""

from droplet_visual_odometry_tpu.utils import checkpoint, config, profiling  # noqa: F401
