"""Scaling-efficiency report CLI.

    python -m droplet_visual_odometry_tpu.cli.scaling [--devices 1,2,4,8]
        [--pairs-per-device 2] [--ba] [--coordinator host:port --nprocs N --pid I]

Measures weak-scaling throughput of the data-parallel pair-VO stage (and,
with --ba, distributed Schur-complement BA) over device meshes of increasing
size — the north-star >=80%-efficiency check (BASELINE.md). On a multi-host
slice, run one copy per host with the coordinator flags (or the JAX_* env
vars); single-host/virtual-mesh runs need no flags.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=str, default=None, help="comma list, e.g. 1,2,4,8")
    ap.add_argument("--pairs-per-device", type=int, default=2)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--ba", action="store_true", help="also measure distributed BA")
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    ap.add_argument(
        "--platform",
        type=str,
        default=None,
        help="force a JAX platform (e.g. 'cpu' for the virtual mesh; env vars "
        "are too late once sitecustomize has imported jax)",
    )
    ap.add_argument(
        "--host-devices",
        type=int,
        default=None,
        help="virtual host device count (--xla_force_host_platform_device_count)",
    )
    args = ap.parse_args(argv)

    if args.host_devices:
        import os
        import re
        import sys

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" in flags:
            # Replace a conflicting preset rather than silently keeping it
            # (the user asked for THIS mesh size), and say so.
            new_flags, n_sub = re.subn(
                r"--?xla_force_host_platform_device_count=\d+",
                f"--xla_force_host_platform_device_count={args.host_devices}",
                flags,
            )
            if n_sub and new_flags != flags:
                print(
                    f"scaling: overriding pre-existing "
                    f"xla_force_host_platform_device_count in XLA_FLAGS with "
                    f"--host-devices={args.host_devices}",
                    file=sys.stderr,
                )
            os.environ["XLA_FLAGS"] = new_flags
        else:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.host_devices}"
            ).strip()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from droplet_visual_odometry_tpu.parallel import launch

    launch.initialize(args.coordinator, args.nprocs, args.pid)

    counts = (
        [int(x) for x in args.devices.split(",")] if args.devices else None
    )
    reports = {}
    reports["pair_vo"] = launch.measure_scaling_pair_vo(
        counts,
        pairs_per_device=args.pairs_per_device,
        height=args.height,
        width=args.width,
    )
    if args.ba:
        reports["distributed_ba"] = launch.measure_scaling_ba(counts)

    if launch.is_coordinator():
        if args.json:
            print(
                json.dumps(
                    {
                        name: [vars(p) for p in pts]
                        for name, pts in reports.items()
                    }
                )
            )
        else:
            for name, pts in reports.items():
                print(launch.format_report(name, pts))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
