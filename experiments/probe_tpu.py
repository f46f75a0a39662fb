"""Bounded axon-relay liveness probe (rc=0 iff a device answers end-to-end).

Run under `timeout` (the relay hangs rather than erroring when down — the
round-3 outage mode): `timeout 120 python experiments/probe_tpu.py`.
Checks both device discovery AND a real compile+execute+fetch round trip,
since `jax.devices()` alone can succeed while execution stalls.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

t0 = time.time()
import jax

d = jax.devices()
print(f"devices: {d} ({time.time() - t0:.1f}s)", flush=True)

import jax.numpy as jnp

x = jnp.ones((128, 128))
t0 = time.time()
s = float(jnp.sum(x @ x))
print(f"matmul sum={s} fetch={time.time() - t0:.2f}s", flush=True)
