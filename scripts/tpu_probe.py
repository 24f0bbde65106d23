"""Is the TPU tunnel alive? Exit 0 = yes, 1 = no.

The axon relay (`/root/.tpu_init.py`) forwards 127.0.0.1:{8082,...} to the
remote chip. When its orchestrator pipe breaks, the listener threads die:
existing jobs block forever inside a device call and new processes hang in
`jax.devices()`. A plain TCP connect distinguishes the cases in
milliseconds without importing jax (which would itself hang):

* connect OK      -> tunnel listening (service probably up)
* refused/timeout -> relay dead; kill hung jobs by exact PID, wait for
                     infra, resume from checkpoints.
"""

import socket
import sys

PORTS = (8082, 8083, 8087)


def alive(timeout: float = 3.0) -> bool:
    for port in PORTS:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=timeout):
                return True
        except OSError:
            continue
    return False


if __name__ == "__main__":
    ok = alive()
    print("tunnel: " + ("alive" if ok else "DEAD"))
    sys.exit(0 if ok else 1)
