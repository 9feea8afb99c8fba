"""Dead-relay guard (utils/relay.py): port probing and forced-CPU fallback."""

import os
import socket


def test_relay_alive_detects_listening_port(monkeypatch):
    import buctd_tpu.utils.relay as relay

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    try:
        monkeypatch.setattr(relay, "_RELAY_PORTS", (port,))
        assert relay.relay_alive(timeout=1.0)
    finally:
        srv.close()


def test_relay_alive_false_on_closed_ports(monkeypatch):
    import buctd_tpu.utils.relay as relay

    # grab-and-release a port so it is known-closed
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    monkeypatch.setattr(relay, "_RELAY_PORTS", (port,))
    assert not relay.relay_alive(timeout=0.5)


def test_ensure_live_backend_forced_cpu(monkeypatch):
    """BUCTD_FORCE_CPU=1 short-circuits to CPU regardless of relay state
    (conftest already forces CPU, so the config update is a no-op here —
    the contract is the False return + no port probe)."""
    import buctd_tpu.utils.relay as relay

    monkeypatch.setenv("BUCTD_FORCE_CPU", "1")

    def boom(*a, **k):
        raise AssertionError("must not probe ports when forced to CPU")

    monkeypatch.setattr(relay, "relay_alive", boom)
    assert relay.ensure_live_backend() is False


def test_ensure_live_backend_dead_relay_falls_back(monkeypatch):
    import buctd_tpu.utils.relay as relay

    monkeypatch.delenv("BUCTD_FORCE_CPU", raising=False)
    monkeypatch.setattr(relay, "relay_alive", lambda *a, **k: False)
    assert relay.ensure_live_backend(verbose=False) is False

    monkeypatch.setattr(relay, "relay_alive", lambda *a, **k: True)
    assert relay.ensure_live_backend() is True
