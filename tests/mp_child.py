"""Per-process child for the real multi-process validation tests.

Launched by ``openset_imagenet_tpu.parallel.launch`` with the
``OSI_COORDINATOR`` contract: each instance joins a local
``jax.distributed`` cluster (virtual CPU devices, cross-process Gloo
collectives) and runs the PRODUCTION engine worker — the same code path a
real multi-host TPU pod would execute.  After training it extracts val
arrays via the allgather path and records a per-rank result JSON so the
parent test can assert cross-process invariants (lead-only writes,
allgather parity, preemption agreement, resume).
"""

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", required=True, help="shared scratch directory")
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out-sub", default="out")
    p.add_argument("--tag", default="run")
    # Step-granular preemption/budget knobs (tests/test_midepoch_resume.py
    # semantics, exercised here across a REAL process group).
    p.add_argument("--max-steps", type=int, default=0)
    p.add_argument("--preempt-mode", default=None)
    p.add_argument("--preempt-check-steps", type=int, default=0)
    # ZeRO-1 optimizer-state partitioning across the REAL process group
    # (collective checkpoint gather + staged resume placement).
    p.add_argument("--zero1", action="store_true")
    p.add_argument("--ema", type=float, default=0.0)
    args = p.parse_args()

    # Join the cluster BEFORE any backend use.  Generous timeouts: N jax
    # imports contend for this box's few cores, spreading process start-up
    # by tens of seconds.
    from openset_imagenet_tpu.parallel.launch import maybe_initialize
    distributed = maybe_initialize(timeout_s=300)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).resolve().parent / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from tests.test_engine import tiny_cfg

    from openset_imagenet_tpu import train as engine
    from openset_imagenet_tpu.parallel.mesh import (batch_sharding,
                                                    data_mesh_for_batch)
    from openset_imagenet_tpu.pipeline import pipeline_from_dataset
    from openset_imagenet_tpu.dataset import ImagenetDataset

    shared = pathlib.Path(args.dir)
    cfg = tiny_cfg(shared, "entropic", epochs=args.epochs)
    cfg.output_directory = shared / args.out_sub
    if args.checkpoint:
        cfg.checkpoint = args.checkpoint
    if args.max_steps:
        cfg.max_steps = args.max_steps
    if args.preempt_mode:
        cfg.preempt_mode = args.preempt_mode
    if args.preempt_check_steps:
        cfg.preempt_check_steps = args.preempt_check_steps
    if args.zero1:
        cfg.opt.zero1 = True
    if args.ema:
        cfg.opt.ema = args.ema
    pid = jax.process_index()

    info = engine.worker(cfg)

    # Allgather extraction on the val split (production eval path).
    mesh = data_mesh_for_batch(cfg.batch_size)
    val_ds = ImagenetDataset(shared / "p1_val.csv", cfg.data.imagenet_path)
    reader = engine._make_reader(cfg, crop=32)
    pipe = pipeline_from_dataset(
        val_ds, cfg.batch_size, is_training=False, seed=cfg.seed,
        num_workers=2, reader=reader, sharding=batch_sharding(mesh),
        process_index=jax.process_index(),
        process_count=jax.process_count())
    import optax

    from openset_imagenet_tpu.checkpoint import load_checkpoint

    model = engine.build_model(cfg, info["n_classes"])
    state = engine.create_state(model, jax.random.PRNGKey(0),
                                optax.identity(), image_size=32)
    state, _, _ = load_checkpoint(
        cfg.output_directory / "entropic_curr.pth", state,
        restore_opt=False)
    from openset_imagenet_tpu.parallel.mesh import replicated
    state = jax.device_put(state, replicated(mesh))
    gt, logits, feats, scores = engine.get_arrays(
        state, pipe, mesh=mesh)
    pipe.close()

    import numpy as np
    np.savez(shared / f"{args.tag}_arrays_p{pid}.npz", gt=gt,
             logits=logits, features=feats, scores=scores)
    (shared / f"{args.tag}_result_p{pid}.json").write_text(json.dumps({
        "process_index": pid,
        "process_count": jax.process_count(),
        "distributed": distributed,
        "n_local_devices": len(jax.local_devices()),
        "n_global_devices": len(jax.devices()),
        "last_epoch": info["last_epoch"],
        "best_score": info["best_score"],
        "stopped_mid_epoch": info["stopped_mid_epoch"],
        "pid": os.getpid(),
    }))
    print(f"mp_child rank {pid}: done (last_epoch={info['last_epoch']})",
          flush=True)


if __name__ == "__main__":
    main()
