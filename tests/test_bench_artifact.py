"""The driver bench artifact must always land as one parseable JSON line.

Round 3's headline capture was lost because a transient "Unable to
initialize backend 'axon': UNAVAILABLE" at the first backend touch became
rc=1 plus a raw traceback (VERDICT round 3, Missing #1).  These tests lock
the hardened contract: bounded backoff-retry on transient backend errors,
immediate raise on non-transient ones, and a structured
``{"value": 0.0, "error": ...}`` line on every failure path.
"""

import importlib.util
import json
import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_transient_unavailable_is_retried(bench, monkeypatch):
    calls = {"n": 0}

    def flaky_device_count():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE: "
                "relay refused the claim")
        return 1

    monkeypatch.setattr(bench.jax, "device_count", flaky_device_count)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench._acquire_backend(max_wait_s=600) == 1
    assert calls["n"] == 3


def test_non_transient_error_raises_immediately(bench, monkeypatch):
    calls = {"n": 0}

    def broken_device_count():
        calls["n"] += 1
        raise ValueError("some programming error")

    monkeypatch.setattr(bench.jax, "device_count", broken_device_count)
    with pytest.raises(ValueError):
        bench._acquire_backend(max_wait_s=600)
    assert calls["n"] == 1


def test_budget_exhaustion_raises_and_main_emits_json(bench, monkeypatch,
                                                      capsys):
    def always_unavailable():
        raise RuntimeError("UNAVAILABLE: still refusing")

    monkeypatch.setattr(bench.jax, "device_count", always_unavailable)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    rc = bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert rc == 1
    rec = json.loads(out[-1])
    assert rec["metric"] == "resnet50_train_throughput"
    assert rec["value"] == 0.0
    assert "UNAVAILABLE" in rec["error"]


def test_retry_budget_is_bounded(bench, monkeypatch):
    """The retry loop must give up once the wall-clock budget is spent."""
    slept = []
    clock = {"t": 0.0}

    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])

    def fake_sleep(s):
        slept.append(s)
        clock["t"] += s

    monkeypatch.setattr(bench.time, "sleep", fake_sleep)
    monkeypatch.setattr(
        bench.jax, "device_count",
        lambda: (_ for _ in ()).throw(RuntimeError("UNAVAILABLE")))
    with pytest.raises(RuntimeError):
        bench._acquire_backend(max_wait_s=300)
    assert sum(slept) <= 300
    assert len(slept) >= 4       # 5s, 10s, 20s, 40s, ... actually retried


def test_script_entry_emits_json_on_poisoned_backend():
    """Run the real bench.py file end-to-end (__main__ guard included)
    with jax.device_count poisoned; rc must be 1 and stdout's last line a
    parseable structured-failure record.  CPU platform is forced so the
    subprocess can never claim (or wedge) the tunneled TPU.
    """
    import subprocess

    driver = (
        "import os; os.environ.setdefault('JAX_PLATFORMS', 'cpu');\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "def boom():\n"
        "    raise ValueError('poisoned for test')\n"
        "jax.device_count = boom\n"
        "import runpy, sys\n"
        "sys.argv = ['bench.py']\n"
        "try:\n"
        "    runpy.run_path(%r, run_name='__main__')\n"
        "except SystemExit as e:\n"
        "    sys.exit(e.code)\n" % os.path.join(_REPO, "bench.py"))
    env = dict(os.environ)
    env["OSI_JAX_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", driver], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 1, proc.stderr[-2000:]
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    assert rec["value"] == 0.0
    assert "poisoned" in rec["error"]
