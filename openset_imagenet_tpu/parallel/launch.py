"""Multi-process launcher + runtime bootstrap (the framework's torchrun).

The reference never runs one training job across processes — its only
multi-process story is one-experiment-per-GPU sweep queues (reference
``script/train_all.py:95-118``).  A TPU-native framework needs true
multi-host SPMD: one process per host, each addressing its local chips,
jointly executing one globally-sharded program.  This module provides both
halves of that story:

* :func:`maybe_initialize` — runtime bootstrap called by the CLIs / worker.
  Reads the ``OSI_COORDINATOR`` / ``OSI_NUM_PROCESSES`` / ``OSI_PROCESS_ID``
  contract (set by the launcher below, by a cluster scheduler, or by hand)
  and brings up ``jax.distributed``.  ``OSI_DISTRIBUTED=auto`` instead uses
  JAX's own cluster auto-detection (TPU pod metadata).  No env → no-op, so
  single-process usage never pays anything.
* :func:`main` — the ``launch_imagenet`` CLI: spawn ``--nproc`` local
  processes wired to a fresh coordinator and run the given module in each.
  ``--cpu --devices-per-process K`` gives every process K virtual CPU
  devices — a real multi-process SPMD cluster (cross-process Gloo
  collectives, one process's arrays sharded over all hosts) on a laptop;
  this is how the multi-host code paths (lead-only writes, allgather eval,
  preemption agreement) are validated without a TPU pod.

Signal contract: the launcher forwards SIGTERM/SIGINT to every child, so
preempting the launcher preempts the job; a child exiting non-zero tears
the rest down (fail-fast, like torchrun).
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import threading
from typing import List, Optional, Sequence

COORD_ENV = "OSI_COORDINATOR"
NPROC_ENV = "OSI_NUM_PROCESSES"
PID_ENV = "OSI_PROCESS_ID"
AUTO_ENV = "OSI_DISTRIBUTED"

_initialized = False


def maybe_initialize(timeout_s: Optional[int] = None,
                     start_barrier_s: int = 600) -> bool:
    """Bring up ``jax.distributed`` if a multi-process contract is present.

    Returns True when running distributed (after this call), False for
    plain single-process runs.  Idempotent: safe to call from both a CLI
    main and the engine worker.

    ``start_barrier_s``: after joining, wait (via the coordination
    service, NOT a device collective) until every process has initialized
    before returning.  Cold-start skew — hosts importing jax / loading
    site hooks at different speeds — otherwise eats into the transport
    layer's own short rendezvous window at the FIRST collective (Gloo's
    context init times out after 30 s measured on CPU clusters; a loaded
    host can spread process start-up well past that).  0 disables.
    """
    global _initialized
    if _initialized:
        return True
    coord = os.environ.get(COORD_ENV)
    auto = os.environ.get(AUTO_ENV, "").lower() in ("auto", "1", "true")
    if not coord and not auto:
        return False

    import jax

    if coord:
        kwargs = {}
        if timeout_s is not None:
            kwargs["initialization_timeout"] = int(timeout_s)
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ[NPROC_ENV]),
            process_id=int(os.environ[PID_ENV]), **kwargs)
    else:  # auto: TPU pod / cluster env auto-detection
        jax.distributed.initialize()
    _initialized = True
    if start_barrier_s:
        try:  # coordination-service barrier (jax keeps this semi-private)
            from jax._src import distributed as _dist
            client = getattr(_dist.global_state, "client", None)
            if client is not None:
                client.wait_at_barrier("osi_start",
                                       timeout_in_ms=start_barrier_s * 1000)
        except Exception as exc:  # best-effort hardening — but LOUDLY:
            # a silent skip would undetectably reintroduce the rendezvous
            # race the barrier exists to prevent (e.g. after a jaxlib
            # bump renames these internals).
            import warnings
            warnings.warn(
                f"distributed start barrier unavailable ({exc!r}); "
                "proceeding without it — transport init may race rank "
                "start-up skew", stacklevel=2)
        # Establish the cross-process device transport NOW, while every
        # rank sits microseconds apart: the transport's own rendezvous
        # window (Gloo context init: hard 30 s, no knob) must never race
        # later per-rank skew — e.g. one rank hitting a warm compile
        # cache while another compiles for a minute.  One scalar
        # allgather creates the context; every later collective reuses
        # it.  On TPU pods the transport is ICI and this is a no-op-cost
        # sanity ping.
        from jax.experimental import multihost_utils
        import numpy as _np
        ranks = multihost_utils.process_allgather(
            _np.int32(jax.process_index()))
        if len(_np.ravel(ranks)) != jax.process_count():
            raise RuntimeError(
                f"transport warm-up allgather saw {len(_np.ravel(ranks))} "
                f"ranks, expected {jax.process_count()}")
        # The scalar allgather forms the PER-PROCESS transport clique
        # only.  Compiled train/eval steps all-reduce over EVERY device
        # — a different Gloo clique (context key "<all device ids>/N")
        # whose context otherwise forms lazily at the FIRST step
        # dispatch, racing per-rank compile-time skew: a warm vs cold
        # compile cache spreads first dispatches minutes apart, and the
        # hard 30 s rendezvous window then kills the early rank
        # ("GetKeyValue() timed out ... /2").  Reproduced
        # deterministically with a 40 s sleep on one rank; forming the
        # all-device context here — while ranks sit microseconds apart
        # — makes the post-skew collective WAIT inside the established
        # context instead, and every later executable reuses it
        # (tests/test_multiprocess.py::test_compile_skew_survives).
        n_dev = jax.device_count()
        if n_dev > 1:
            import jax.numpy as _jnp
            from jax.sharding import (Mesh, NamedSharding,
                                      PartitionSpec as _P)
            mesh = Mesh(_np.asarray(jax.devices()), ("warmup",))
            ones = _np.ones(n_dev, _np.float32)
            sharded = jax.make_array_from_callback(
                (n_dev,), NamedSharding(mesh, _P("warmup")),
                lambda idx: ones[idx])
            total = float(jax.jit(_jnp.sum)(sharded))
            if total != float(n_dev):
                raise RuntimeError(
                    f"transport warm-up all-reduce returned {total}, "
                    f"expected {n_dev}")
    return True


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(base: dict, rank: int, nproc: int, port: int,
               cpu: bool, devices_per_process: int) -> dict:
    env = dict(base)
    env[COORD_ENV] = f"localhost:{port}"
    env[NPROC_ENV] = str(nproc)
    env[PID_ENV] = str(rank)
    if cpu:
        env["OSI_JAX_PLATFORM"] = "cpu"   # honored even under site hooks
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count="
                     f"{devices_per_process}")
        env["XLA_FLAGS"] = " ".join(flags)
    return env


def spawn(command: Sequence[str], nproc: int, cpu: bool = False,
          devices_per_process: int = 1, port: Optional[int] = None,
          env: Optional[dict] = None, stream: bool = True,
          log_dir: Optional[str] = None) -> List[subprocess.Popen]:
    """Start ``nproc`` coordinated child processes; return their handles.

    Low-level form of :func:`launch` for callers that need the PIDs (e.g.
    delivering a preemption signal to ONE rank in tests).  ``command`` is
    an argv suffix executed as ``python -m cmd[0] cmd[1:]`` when ``cmd[0]``
    looks like a module path, else as a script path.  ``log_dir`` writes
    each rank's combined stdout/stderr to ``rank{i}.log`` in that
    directory (overrides ``stream``).
    """
    if port is None:
        port = _free_port()
    base_env = dict(os.environ if env is None else env)
    argv = list(command)
    if argv and (argv[0].endswith(".py") or os.sep in argv[0]):
        argv = [sys.executable] + argv
    else:
        argv = [sys.executable, "-m"] + argv
    procs = []
    for rank in range(nproc):
        log = None
        if log_dir is not None:
            log = open(os.path.join(log_dir, f"rank{rank}.log"), "wb")
            out = err = log
        elif stream:
            out = err = None
        else:
            out = err = subprocess.DEVNULL
        procs.append(subprocess.Popen(
            argv, env=_child_env(base_env, rank, nproc, port, cpu,
                                 devices_per_process),
            stdout=out, stderr=err))
        if log is not None:
            # The child holds its own duplicated fd; keeping the parent's
            # copy open leaks one fd per rank per launch (tests and the
            # dryrun call launch repeatedly in-process).
            log.close()
    return procs


def launch(command: Sequence[str], nproc: int, cpu: bool = False,
           devices_per_process: int = 1, port: Optional[int] = None,
           env: Optional[dict] = None, stream: bool = True,
           log_dir: Optional[str] = None,
           kill_grace_s: float = 30.0) -> List[int]:
    """Run ``command`` in ``nproc`` coordinated processes; return exit codes.

    ``command`` is an argv suffix executed as ``python -m cmd[0] cmd[1:]``
    when ``cmd[0]`` looks like a module path, else as a script path run via
    ``sys.executable cmd[0] cmd[1:]``.
    ``log_dir`` captures each rank's output to ``rank{i}.log`` there.
    """
    procs = spawn(command, nproc, cpu=cpu,
                  devices_per_process=devices_per_process, port=port,
                  env=env, stream=stream, log_dir=log_dir)

    def _forward(signum, frame):
        for p in procs:
            if p.poll() is None:
                try:
                    p.send_signal(signum)
                except OSError:
                    pass

    prev = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev[sig] = signal.signal(sig, _forward)
        except ValueError:          # non-main thread (tests)
            pass

    try:
        # Fail fast: if any child dies non-zero, terminate the rest rather
        # than letting them block forever inside a collective.
        fail = threading.Event()

        def _watch(p):
            if p.wait() != 0:
                fail.set()

        watchers = [threading.Thread(target=_watch, args=(p,), daemon=True)
                    for p in procs]
        for w in watchers:
            w.start()
        while any(p.poll() is None for p in procs):
            if fail.is_set():
                # Survivors may treat SIGTERM as graceful preemption (the
                # worker does) yet be blocked in a collective that needs
                # the dead rank — escalate to SIGKILL after a grace
                # window so launch() can never hang unboundedly.
                for p in procs:
                    if p.poll() is None:
                        p.terminate()
                for p in procs:
                    try:
                        p.wait(timeout=kill_grace_s)
                    except subprocess.TimeoutExpired:
                        p.kill()
                break
            threading.Event().wait(0.2)
        return [p.wait() for p in procs]
    finally:
        for sig, h in prev.items():
            signal.signal(sig, h)


def get_args(argv=None):
    parser = argparse.ArgumentParser(
        "launch_imagenet",
        description="Launch a command in N coordinated jax.distributed "
                    "processes (multi-host SPMD locally or per-host on a "
                    "pod slice)")
    parser.add_argument("--nproc", "-n", type=int, required=True,
                        help="Number of coordinated processes to spawn")
    parser.add_argument("--cpu", action="store_true",
                        help="Force each process onto virtual CPU devices "
                             "(multi-host validation without a pod)")
    parser.add_argument("--devices-per-process", type=int, default=1,
                        help="Virtual CPU devices per process (with --cpu)")
    parser.add_argument("--port", type=int, default=None,
                        help="Coordinator port (default: pick a free one)")
    parser.add_argument("command", nargs=argparse.REMAINDER,
                        help="Module + args to run, e.g. "
                             "openset_imagenet_tpu.script.train cfg.yaml 1")
    return parser.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    # Strip only the LEADING "--" separator; later "--" tokens belong to
    # the child command.
    command = list(args.command)
    if command and command[0] == "--":
        command = command[1:]
    if not command:
        raise SystemExit("launch_imagenet: no command given")
    codes = launch(command, nproc=args.nproc, cpu=args.cpu,
                   devices_per_process=args.devices_per_process,
                   port=args.port)
    bad = [f"rank {i}: rc={rc}" for i, rc in enumerate(codes) if rc != 0]
    if bad:
        raise SystemExit("launch_imagenet: " + "; ".join(bad))


if __name__ == "__main__":
    main()
