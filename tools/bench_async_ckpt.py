"""Measure what AsyncCheckpointer buys per epoch on the real chip.

The trainer's epoch loop previously blocked on save_checkpoint (device->
host fetch of the full ResNet-50 + Adam state, msgpack serialization,
atomic file write) once or twice per epoch.  AsyncCheckpointer moves all
of that to a writer thread; the loop pays only the on-device snapshot
copies.  This tool times both on the production state (resnet50, ghost-64,
S2D geometry is irrelevant to state size) and prints one JSON line.

Usage: python tools/bench_async_ckpt.py [out_dir]
"""
import json
import sys
import time


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/osi_async_ckpt"
    import pathlib

    import jax

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.checkpoint import (AsyncCheckpointer,
                                                 save_checkpoint)
    from openset_imagenet_tpu.config import NameSpace
    from openset_imagenet_tpu.models.resnet import build_resnet

    pathlib.Path(out).mkdir(parents=True, exist_ok=True)
    model = build_resnet("resnet50", fc_layer_dim=1000, out_features=1000)
    tx = engine.build_optimizer(
        NameSpace({"type": "adam", "lr": 1e-3, "decay": 0, "gamma": 1}), 1)
    state = engine.create_state(model, jax.random.PRNGKey(0), tx)
    n_bytes = sum(x.size * x.dtype.itemsize
                  for x in jax.tree.leaves(state)
                  if hasattr(x, "dtype"))

    # Warm both paths once (file-system + dispatch caches).
    save_checkpoint(f"{out}/warm.pth", state, 0, 0.0)

    t0 = time.perf_counter()
    for i in range(3):
        save_checkpoint(f"{out}/sync{i}.pth", state, i, 0.0)
    sync_s = (time.perf_counter() - t0) / 3

    w = AsyncCheckpointer()
    lat = []
    t_all = time.perf_counter()
    for i in range(3):
        t0 = time.perf_counter()
        w.save(f"{out}/async{i}.pth", state, i, 0.0)
        lat.append(time.perf_counter() - t0)
    w.close()
    total_async = time.perf_counter() - t_all

    print(json.dumps({
        "state_mb": round(n_bytes / 1e6, 1),
        "platform": jax.devices()[0].platform,
        "sync_save_s": round(sync_s, 3),
        # lat[0] is the production case (one save per epoch, writer
        # idle): snapshot dispatch + enqueue only.  Later entries show
        # the bounded queue's backpressure under back-to-back saves.
        "async_save_call_s": [round(x, 4) for x in lat],
        "async_drain_total_s": round(total_async, 3),
        "epoch_loop_blocking_reduction":
            round(sync_s / max(lat[0], 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
