"""Device watchdog (cli.DeviceWatchdog): failure detection for
unreachable accelerator backends."""
import io
import sys
import time

from tiler_tpu.cli import DeviceWatchdog


def test_progress_prevents_probe(monkeypatch):
    wd = DeviceWatchdog(stall_s=60, probe_timeout=1)
    probes = []
    monkeypatch.setattr(DeviceWatchdog, "_backend_alive",
                        staticmethod(lambda timeout: probes.append(1) or True))
    wd.tick()
    wd._check_once()
    assert probes == [] and not wd._warned


def test_stall_with_healthy_probe_stays_quiet(monkeypatch):
    wd = DeviceWatchdog(stall_s=0.0, probe_timeout=1)
    monkeypatch.setattr(DeviceWatchdog, "_backend_alive",
                        staticmethod(lambda timeout: True))
    wd._last = time.time() - 1
    wd._check_once()
    assert not wd._warned
    assert time.time() - wd._last < 0.5  # probe success re-ticked


def test_stall_with_dead_probe_warns_once(monkeypatch):
    wd = DeviceWatchdog(stall_s=0.0, probe_timeout=1)
    monkeypatch.setattr(DeviceWatchdog, "_backend_alive",
                        staticmethod(lambda timeout: False))
    err = io.StringIO()
    monkeypatch.setattr(sys, "stderr", err)
    wd._last = time.time() - 1
    for _ in range(3):
        wd._check_once()
    assert err.getvalue().count("FAILED") == 1
    assert "TILER_TPU_PLATFORM=cpu" in err.getvalue()


def test_context_manager_lifecycle():
    with DeviceWatchdog(stall_s=9999) as wd:
        wd.tick()
        assert wd._thread.is_alive()
    assert wd._stop.is_set()


def test_probe_subprocess_contract():
    """_backend_alive runs a real disposable child and returns a bool
    without raising, regardless of backend health."""
    assert DeviceWatchdog._backend_alive(120) in (True, False)
