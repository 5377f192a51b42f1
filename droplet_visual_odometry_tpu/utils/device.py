"""Default-device responsiveness probe + CPU fallback.

On this class of environment the default accelerator may be reached through a
shared tunnel that can be wedged by earlier processes: a program then hangs
inside the runtime where in-process timeouts cannot reach. Every long-running
entry point (bench.py, cli/run_experiment.py) therefore probes the default
device in a SUBPROCESS with a hard timeout before committing to it, and falls
back to CPU (with a visible message) instead of hanging silently — the
reference's CLI has no analogous failure mode because it never leaves the
host CPU (trajectory_evaluation_dual_process.py:329-338).
"""

from __future__ import annotations

import os
import subprocess
import sys


def machine_cache_dir(base: str | None = None) -> str:
    """Compilation-cache directory keyed by this host's CPU feature set.

    XLA:CPU persistent-cache entries embed AOT-compiled machine code for the
    COMPILING host's vector extensions; on a host with a different feature
    set the loader warns about SIGILL risk and has segfaulted this project's
    test suite mid-run. Salting the directory with a hash of the cpuinfo
    flags makes each machine type use its own cache.

    The default base is keyed by UID (advisor r4: a fixed shared /tmp path
    could be pre-created by another local user, poisoning the executables
    every entry point loads).
    """
    import hashlib

    if base is None:
        base = f"/tmp/dvo_jax_cache_u{os.getuid()}"

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    salt = hashlib.md5(line.encode()).hexdigest()[:10]
                    break
            else:
                salt = "noflags"
    except OSError:
        salt = "nocpuinfo"
    return f"{base}_{salt}"


def probe_default_device(timeout_s: float = 480.0) -> bool:
    """True if the default JAX device completes a trivial program promptly.

    Runs as a subprocess with a hard timeout: a wedged tunnel hangs inside
    the runtime where in-process timeouts can't reach; killing the child is
    always possible.
    """
    code = (
        "import jax, jax.numpy as jnp; "
        "x = (jnp.ones((8, 8)) @ jnp.ones((8, 8))); print(float(x[0, 0]))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, timeout=timeout_s
        )
        return r.returncode == 0 and b"8.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def ensure_responsive_backend(announce: bool = True, timeout_s: float = 480.0) -> bool:
    """Probe the default device; on failure switch this process to CPU.

    Returns True if the default device answered (kept), False if the run was
    redirected to CPU. Call BEFORE any jax computation. Prints progress to
    stderr so a slow first compile doesn't read as a hang.
    """
    if os.environ.get("JAX_PLATFORMS", "").lower().startswith("cpu"):
        return True  # already pinned to CPU; nothing to probe
    if announce:
        print(
            "probing default accelerator (first contact can take ~1 min)...",
            file=sys.stderr,
            flush=True,
        )
    ok = probe_default_device(timeout_s)
    if not ok:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        if announce:
            print(
                "default accelerator unresponsive -> falling back to CPU "
                "(pass --platform to override)",
                file=sys.stderr,
                flush=True,
            )
    elif announce:
        print("accelerator responsive; continuing", file=sys.stderr, flush=True)
    return ok
