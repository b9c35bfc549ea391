"""Poll the axon TPU tunnel until it answers; write /tmp/tunnel_up when it does.

Each attempt spawns a fresh subprocess (the axon client can hang
indefinitely inside jax.devices() when the tunnel is down, and a hung
backend can't be re-initialized in-process). A successful attempt also
runs one tiny matmul so "up" means the chip executes, not just that the
handshake succeeded.

Run: python tools/wait_tunnel.py [poll_seconds]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import subprocess
import sys
import time

PROBE = (
    "import jax, numpy as np; "
    "x = jax.numpy.ones((256, 256), jax.numpy.bfloat16); "
    "y = (x @ x).sum(); "
    "print('TUNNEL_OK', jax.devices(), float(y))"
)


def main():
    poll = int(sys.argv[1]) if len(sys.argv) > 1 else 180
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, "-c", PROBE], capture_output=True,
                text=True, timeout=420)
            if "TUNNEL_OK" in out.stdout:
                with open("/tmp/tunnel_up", "w") as f:
                    f.write(out.stdout)
                print(f"attempt {attempt}: UP after {time.time()-t0:.0f}s\n"
                      f"{out.stdout}", flush=True)
                return
            msg = (out.stderr or out.stdout).strip().splitlines()
            print(f"attempt {attempt}: exit={out.returncode} "
                  f"{msg[-1] if msg else ''}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"attempt {attempt}: probe hung >420s (tunnel down)",
                  flush=True)
        time.sleep(poll)


if __name__ == "__main__":
    main()
