"""TPU backend health probe — exits cleanly instead of hanging.

The axon-tunneled backend can wedge (a client killed mid-claim holds the
terminal's session lock; every later jax.devices() then blocks inside
make_c_api_client — see docs/ROADMAP.md session-3 facts). This probe
registers the backend itself with a finite claim timeout and runs one
tiny op, so automation can poll health without risking the
shell-kill-mid-claim pattern that causes the wedge in the first place.

Usage:  PALLAS_AXON_POOL_IPS= python scripts/tpu_health.py [timeout_s]
Exit 0 = healthy (prints device + op result), 1 = unhealthy.
The PALLAS_AXON_POOL_IPS= prefix suppresses sitecustomize's own
registration (which has no claim timeout).
"""

import os
import sys
import threading
import time
import uuid


def main():
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    try:
        from axon.register import register
    except ImportError:
        print("axon plugin not on PYTHONPATH (need /root/.axon_site)")
        return 1
    register(
        None,
        f"{os.environ.get('PALLAS_AXON_TPU_GEN', 'v5e')}:1x1x1",
        so_path="/opt/axon/libaxon_pjrt.so",
        session_id=str(uuid.uuid4()),
        remote_compile=os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1",
        claim_timeout_s=budget,
    )

    # The claim can hang BEFORE the timeout applies (terminal down, not
    # claim-contended): watchdog hard-exits the whole process cleanly.
    def watchdog():
        time.sleep(budget + 15)
        print(f"UNHEALTHY: backend init exceeded {budget + 15}s",
              flush=True)
        os._exit(1)

    threading.Thread(target=watchdog, daemon=True).start()

    t0 = time.time()
    try:
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        val = float((jnp.ones((8, 8)) @ jnp.ones((8, 8))).sum())
        print(f"HEALTHY in {time.time() - t0:.0f}s: {devs[0]} "
              f"(op={val:.0f})", flush=True)
        return 0
    except Exception as e:  # claim timeout or backend error
        print(f"UNHEALTHY after {time.time() - t0:.0f}s: "
              f"{type(e).__name__}: {e}", flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
