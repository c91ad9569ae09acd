"""Fail-fast reachability check for the axon remote-compile relay.

On this class of host the TPU is reached through a loopback relay
(default 127.0.0.1:8093). When that listener is down — observed once
after a client process died with an in-flight remote compile — jax's
first backend probe blocks for minutes with no output. A closed TCP
connect is a definitive, instant signal, so TPU-bound entry points
(bench.py, train.py, __graft_entry__.entry) call this BEFORE touching
jax and report the failure in their own style.
"""

from __future__ import annotations

import os
import socket

_DEFAULT_ADDR = "127.0.0.1:8093"


def tunnel_error(timeout: float = 5.0) -> str | None:
    """Return a human-readable error if the axon relay is unreachable,
    None when it is reachable or not in use.

    Only applies when `PALLAS_AXON_REMOTE_COMPILE=1` (the tunneled-TPU
    configuration). The address comes from `NV_AXON_TUNNEL_ADDR`
    (host:port; the port is taken after the LAST colon so bracketless
    IPv6 hosts parse); a malformed value falls back to the default
    rather than crashing the preflight.
    """
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") != "1":
        return None
    addr = os.environ.get("NV_AXON_TUNNEL_ADDR", _DEFAULT_ADDR)
    host, _, port_s = addr.rpartition(":")
    try:
        port = int(port_s)
    except ValueError:
        # malformed/missing port: keep the user's HOST (falling back to
        # the default host too could probe a local listener while the
        # real tunnel host is down) and default only the port
        host = host or addr
        port = int(_DEFAULT_ADDR.rpartition(":")[2])
    if not host:
        host = "127.0.0.1"
    try:
        socket.create_connection((host, port), timeout=timeout).close()
    except OSError as e:
        return (
            f"TPU tunnel unreachable at {host}:{port} ({e}) — "
            "infrastructure, not a code failure"
        )
    return None
