"""Patient TPU-tunnel probe: wait for the axon backend, then optionally run
a command.

The axon tunnel in this environment can go down for hours; during an
outage, backend INIT ITSELF hangs ~25 min per attempt before raising
"Unable to initialize backend 'axon': UNAVAILABLE". Each attempt must be a
fresh process (a failed init poisons the JAX runtime state), so this loops
`python -c "import jax; jax.devices()"` subprocesses until one succeeds,
touches a marker file, and (if given) executes the follow-up command.

Usage:
    python -m keymorph_tpu.tools.tpu_probe [--marker PATH] [--interval S]
                                           [-- cmd args...]

See .claude/skills/verify/SKILL.md "TPU tunnel outages" for the playbook.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys
import time


def main() -> int:
    args = sys.argv[1:]
    marker = "/tmp/tpu_up"
    interval = 120.0
    cmd = None
    while args:
        if args[0] == "--marker":
            marker = args[1]
            args = args[2:]
        elif args[0] == "--interval":
            interval = float(args[1])
            args = args[2:]
        elif args[0] == "--":
            cmd = args[1:]
            args = []
        else:
            raise SystemExit(f"unknown arg {args[0]}")

    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.devices())"],
            capture_output=True,
            text=True,
        )
        dt = time.time() - t0
        if proc.returncode == 0:
            print(f"TPU up after {attempt} attempt(s) ({dt:.0f}s): "
                  f"{proc.stdout.strip().splitlines()[-1]}")
            pathlib.Path(marker).touch()
            break
        print(f"attempt {attempt}: still down after {dt:.0f}s", flush=True)
        time.sleep(interval)

    if cmd:
        return subprocess.call(cmd)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
