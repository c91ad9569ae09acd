"""Unit tests for the TPU-tunnel preflight (nnue_vision_tpu/axon_preflight).

The preflight guards every TPU-bound entry point (bench.py, train.py,
__graft_entry__.entry) against hanging in jax device init when the
remote-compile relay is down, so its env-gating and address parsing must
be exact."""

import socket
import threading
import time

from nnue_vision_tpu.axon_preflight import tunnel_error, wait_for_tunnel


def _with_env(monkeypatch, **env):
    for k in ("PALLAS_AXON_REMOTE_COMPILE", "NV_AXON_TUNNEL_ADDR"):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)


def test_not_in_use_returns_none(monkeypatch):
    _with_env(monkeypatch)  # PALLAS_AXON_REMOTE_COMPILE unset
    assert tunnel_error() is None
    _with_env(monkeypatch, PALLAS_AXON_REMOTE_COMPILE="0")
    assert tunnel_error() is None


def test_reachable_listener_returns_none(monkeypatch):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    t = threading.Thread(target=lambda: srv.accept(), daemon=True)
    t.start()
    try:
        _with_env(
            monkeypatch,
            PALLAS_AXON_REMOTE_COMPILE="1",
            NV_AXON_TUNNEL_ADDR=f"127.0.0.1:{port}",
        )
        assert tunnel_error(timeout=2) is None
    finally:
        srv.close()


def test_unreachable_reports_host_and_port(monkeypatch):
    # a port nothing listens on: bind-then-close reserves a dead one
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    _with_env(
        monkeypatch,
        PALLAS_AXON_REMOTE_COMPILE="1",
        NV_AXON_TUNNEL_ADDR=f"127.0.0.1:{port}",
    )
    err = tunnel_error(timeout=2)
    assert err is not None and f"127.0.0.1:{port}" in err
    assert "infrastructure" in err


def test_malformed_port_keeps_user_host(monkeypatch):
    # host without a port: must probe THAT host (default port), never a
    # default host that might have a live local listener
    _with_env(
        monkeypatch,
        PALLAS_AXON_REMOTE_COMPILE="1",
        NV_AXON_TUNNEL_ADDR="no-such-host.invalid",
    )
    err = tunnel_error(timeout=2)
    assert err is not None and "no-such-host.invalid:8093" in err

    _with_env(
        monkeypatch,
        PALLAS_AXON_REMOTE_COMPILE="1",
        NV_AXON_TUNNEL_ADDR="no-such-host.invalid:not-a-port",
    )
    err = tunnel_error(timeout=2)
    assert err is not None and "no-such-host.invalid:8093" in err


def _dead_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_wait_for_tunnel_passthrough_when_not_in_use(monkeypatch):
    _with_env(monkeypatch)
    assert wait_for_tunnel() is None


def test_wait_for_tunnel_retries_within_window(monkeypatch, capsys):
    """A relay flap mid-window must be ridden through (VERDICT r3 #1):
    start with a dead port, bring a listener up after the first failed
    attempt, and the retry loop must return None."""
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    _with_env(
        monkeypatch,
        PALLAS_AXON_REMOTE_COMPILE="1",
        NV_AXON_TUNNEL_ADDR=f"127.0.0.1:{port}",
    )

    def listen_later():
        time.sleep(0.5)
        srv.listen(1)
        srv.accept()

    # bound-but-not-listening refuses connects until listen() below
    t = threading.Thread(target=listen_later, daemon=True)
    t.start()
    try:
        assert wait_for_tunnel(window_s=10, attempts=20) is None
    finally:
        srv.close()
    err_lines = capsys.readouterr().err
    assert "retrying" in err_lines and "recovered" in err_lines


def test_wait_for_tunnel_bounded_failure(monkeypatch):
    """Never-up listener: fails after the window with the last error,
    and respects the attempt budget (no unbounded spin)."""
    port = _dead_port()
    _with_env(
        monkeypatch,
        PALLAS_AXON_REMOTE_COMPILE="1",
        NV_AXON_TUNNEL_ADDR=f"127.0.0.1:{port}",
    )
    t0 = time.monotonic()
    err = wait_for_tunnel(window_s=1.0, attempts=3)
    dt = time.monotonic() - t0
    assert err is not None and f"127.0.0.1:{port}" in err
    assert dt < 5.0  # bounded: ~1s window, never minutes


def test_wait_for_tunnel_zero_budget_is_one_shot(monkeypatch):
    port = _dead_port()
    _with_env(
        monkeypatch,
        PALLAS_AXON_REMOTE_COMPILE="1",
        NV_AXON_TUNNEL_ADDR=f"127.0.0.1:{port}",
    )
    t0 = time.monotonic()
    assert wait_for_tunnel(window_s=0) is not None
    assert wait_for_tunnel(attempts=0) is not None
    assert time.monotonic() - t0 < 3.0
