"""hosts_alive under REAL multi-process execution (round-2 verdict weak #7:
the n_proc > 1 branch had never executed — the psum liveness path was only
covered by the single-process shortcut and a monkeypatched probe).

Two actual processes join a jax.distributed CPU cluster:
  * alive arm: both participate -> hosts_alive returns 2 on each.
  * straggler arm: process 1 initializes but NEVER calls the collective
    (sleeps) -> process 0's cross-process psum genuinely hangs, and the
    deadline converts the hang into a TimeoutError detection. (A hung peer
    is the realistic failure presentation: a fully dead process also trips
    the runtime's own heartbeat machinery, whose timing this test should
    not depend on.)
"""

import os
import socket
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys, time
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
sys.path.insert(0, %r)
from quantizedattention_tpu.utils.failure import hosts_alive

if mode == "alive":
    n = hosts_alive(timeout_s=90)
    print("RESULT alive", n, flush=True)
elif mode == "straggle":
    # participate ONCE (this also completes the cluster-wide backend
    # topology exchange), then go silent — the realistic straggler: a live
    # process that stops joining collectives
    n = hosts_alive(timeout_s=90)
    print("RESULT joined", n, flush=True)
    time.sleep(60)
    import os as _os
    _os._exit(0)
elif mode == "detect":
    n = hosts_alive(timeout_s=90)   # both participate -> 2
    assert n == 2, n
    time.sleep(2.0)                 # let the peer leave its first psum
    try:
        n = hosts_alive(timeout_s=10)
        print("RESULT undetected", n, flush=True)
    except TimeoutError:
        print("RESULT detected TimeoutError", flush=True)
    # the probe thread is wedged in the hung collective; daemon threads are
    # abandoned and the documented reaction is exit-after-checkpoint
    import os as _os
    _os._exit(0)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn(coord, pid, mode):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no emulated-device multiplication here
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER % _REPO, coord, str(pid), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
    )


@pytest.mark.slow
def test_hosts_alive_two_processes():
    coord = f"127.0.0.1:{_free_port()}"
    p0 = _spawn(coord, 0, "alive")
    p1 = _spawn(coord, 1, "alive")
    out0, _ = p0.communicate(timeout=180)
    out1, _ = p1.communicate(timeout=180)
    assert "RESULT alive 2" in out0, out0
    assert "RESULT alive 2" in out1, out1


@pytest.mark.slow
def test_hosts_alive_detects_hung_peer():
    coord = f"127.0.0.1:{_free_port()}"
    p0 = _spawn(coord, 0, "detect")
    p1 = _spawn(coord, 1, "straggle")
    out0, _ = p0.communicate(timeout=180)
    p1.kill()
    assert "RESULT detected TimeoutError" in out0, out0
