"""Checkpoint save/load with the reference's ``_curr``/``_best`` contract.

Parity with reference ``train.py:37-101``: every epoch writes
``<name>_curr.pth``; a validation-score improvement writes
``<name>_best.pth``.  The payload carries ``epoch`` (stored as ``epoch + 1``
so it doubles as the resume start epoch), model state, optimizer state and
``best_score``; ``finetune`` mode restores weights only and resets
optimizer/score (reference ``train.py:374-380``).

Format: a msgpack blob (flax serialization) of numpy-ified pytrees — fully
host-side, safe to write from a TPU run, no pickle of arbitrary code.  The
``.pth`` extension is kept so the reference's file-naming workflow (sweep
``--continue`` probing for ``{loss}_curr.pth``, reference
``script/train_all.py:85-88``) transfers unchanged.

Sharded-state note: states produced under a mesh are fully replicated
(pure DP), so ``np.asarray`` per leaf is exact; loading re-places leaves via
the caller's sharding when training resumes.  ZeRO-1 runs
(``opt.zero1``) gather their optimizer shards collectively before the
write (``train.gather_opt_for_save``) and re-slice on resume
(``train.place_state``), so the file format — and the bitwise resume
contract — is identical across all parallelism modes.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_numpy(tree: Any) -> Any:
    """Flatten any pytree (incl. optax namedtuple states) to a dict of numpy."""
    return jax.tree.map(lambda x: np.asarray(x),
                        serialization.to_state_dict(tree))


def save_checkpoint(f_name, state, epoch: int, best_score: float,
                    extra: Optional[dict] = None) -> None:
    """Write a checkpoint file.

    Args:
        f_name: output path (``<name>_{curr,best}.pth``).
        state: a :class:`~openset_imagenet_tpu.train.TrainState` (or any
            object with ``params`` / ``batch_stats`` / ``opt_state`` /
            ``step`` attributes).
        epoch: the epoch that just finished (stored as ``epoch + 1``,
            reference ``train.py:55``).
        best_score: current best validation γ score.
        extra: optional additional host-side metadata (must be
            msgpack-serialisable).  The trainer records
            ``{"arch": {"variant", "space_to_depth"}}`` here so
            evaluate/serving can rebuild the right model without being
            told (``infer_arch``).
    """
    # Scalars (and the small ``extra`` map) first: read_metadata
    # stream-reads the leading map entries without decoding the weight
    # tensors.
    payload = {
        "epoch": int(epoch) + 1,
        "step": int(state.step),
        "best_score": float(best_score),
    }
    if extra:
        payload["extra"] = extra
    payload.update(
        model_state_dict=_to_numpy(state.params),
        batch_stats=_to_numpy(state.batch_stats),
        opt_state_dict=_to_numpy(state.opt_state),
    )
    blob = serialization.msgpack_serialize(payload)
    f_name = Path(f_name)
    f_name.parent.mkdir(parents=True, exist_ok=True)
    tmp = f_name.with_suffix(f_name.suffix + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    tmp.replace(f_name)  # atomic: a crash never corrupts _curr.pth


class AsyncCheckpointer:
    """Overlap checkpoint I/O with the next epoch's compute.

    ``save()`` snapshots the state *on device* (cheap XLA copies — the
    donated training buffers are never touched by the writer thread) and
    hands the device->host fetch, msgpack serialization, and atomic file
    write to a single background worker.  Files are written in submission
    order (FIFO worker), so the reference's ``_curr``-then-``_best``
    sequence (reference ``train.py:55-64``) is preserved.

    The caller MUST ``wait()`` before reading any written file and before
    process exit (the engine does both).  Worker exceptions are re-raised
    on the next ``save()``/``wait()`` so a failed write cannot pass
    silently.  An extension over the reference (which blocks the epoch
    loop on ``torch.save``); content is byte-identical to
    :func:`save_checkpoint`.
    """

    def __init__(self) -> None:
        # Bounded queue = backpressure: each pending item pins a full
        # on-device state copy, so a writer slower than the epoch loop
        # (slow disk, tunneled device->host fetch) must degrade toward
        # synchronous saves instead of accumulating snapshots until HBM
        # OOM.  Capacity 2 holds one epoch's _curr+_best pair.
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._error: Optional[BaseException] = None
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="osi-ckpt-writer")
        self._worker.start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                f_name, state, epoch, best_score, extra = item
                save_checkpoint(f_name, state, epoch, best_score, extra)
            except BaseException as e:  # surfaced on next save()/wait()
                self._error = e
            finally:
                self._q.task_done()

    def _check(self) -> None:
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def save(self, f_name, state, epoch: int, best_score: float,
             extra: Optional[dict] = None) -> None:
        """Snapshot ``state`` and enqueue the write.

        Non-blocking while fewer than 2 writes are pending; blocks (i.e.
        degrades toward a synchronous save) when the writer falls behind.
        """
        if self._closed:
            raise RuntimeError("AsyncCheckpointer is closed")
        self._check()
        # On-device copies detach the snapshot from buffers the next
        # train step will donate; jnp.copy dispatches asynchronously.
        snap = jax.tree.map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)
        self._q.put((f_name, snap, epoch, best_score, extra))

    def wait(self) -> None:
        """Block until every enqueued checkpoint is durably on disk."""
        if self._closed:
            raise RuntimeError("AsyncCheckpointer is closed")
        self._q.join()
        self._check()

    def close(self) -> None:
        self.wait()
        self._closed = True
        self._q.put(None)
        self._worker.join()


class CheckpointShapeError(ValueError):
    """Checkpoint tensor shapes disagree with the model being restored.

    A distinct type so :func:`load_weights_any_format` can re-raise it
    directly instead of misinterpreting it as "not a native checkpoint"
    and pointlessly re-reading the file through the torch fallback.
    """


def _assert_shapes_match(template, restored, what: str) -> None:
    """Fail at LOAD time when checkpoint tensor shapes disagree with the
    model being restored into.

    ``flax.serialization.from_state_dict`` checks structure but not leaf
    shapes, so e.g. serving/evaluating with the wrong ``n_classes`` (or
    variant) would otherwise surface only at the first forward pass as a
    cryptic ``ScopeParamShapeError`` blaming an "initializer".
    """
    mismatched = []
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(template),
                            jax.tree.leaves(restored), strict=True):
        if np.shape(a) != np.shape(b):
            mismatched.append(
                f"{jax.tree_util.keystr(path)}: checkpoint {np.shape(b)} "
                f"vs model {np.shape(a)}")
    if mismatched:
        shown = "; ".join(mismatched[:5])
        if len(mismatched) > 5:
            shown += f"; ... ({len(mismatched) - 5} more)"
        raise CheckpointShapeError(
            f"checkpoint {what} shapes do not match the model being "
            f"restored (wrong n_classes / fc_layer_dim / model variant?): "
            f"{shown}")


def load_checkpoint(checkpoint, state, restore_opt: bool = True,
                    return_extra: bool = False) -> Tuple[Any, ...]:
    """Load a checkpoint into ``state``; returns ``(state, start_epoch, best)``.

    ``restore_opt=False`` implements finetune mode (weights + batch stats
    only; optimizer state, step and best score reset — reference
    ``train.py:374-380``).  Raises if the file does not exist (reference
    ``train.py:100-101``).  ``return_extra=True`` appends the payload's
    ``extra`` metadata map (``{}`` when absent) so callers that need it
    (the trainer's mid-epoch ``progress`` resume) avoid a second
    parse of the same file through :func:`read_metadata`.
    """
    file_path = Path(checkpoint)
    if not file_path.is_file():
        raise FileNotFoundError(f"Checkpoint file '{checkpoint}' not found")
    with open(file_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    params = serialization.from_state_dict(state.params,
                                           payload["model_state_dict"])
    batch_stats = serialization.from_state_dict(state.batch_stats,
                                                payload["batch_stats"])
    _assert_shapes_match(state.params, params, "parameter")
    _assert_shapes_match(state.batch_stats, batch_stats, "batch-stats")
    if restore_opt:
        opt_state = serialization.from_state_dict(state.opt_state,
                                                  payload["opt_state_dict"])
        new_state = state.replace(params=params, batch_stats=batch_stats,
                                  opt_state=opt_state,
                                  step=int(payload.get("step", 0)))
        out = (new_state, int(payload["epoch"]), float(payload["best_score"]))
    else:
        new_state = state.replace(params=params, batch_stats=batch_stats)
        out = (new_state, int(payload["epoch"]), 0.0)
    if return_extra:
        return out + (payload.get("extra") or {},)
    return out


def load_weights_any_format(checkpoint, state, model, image_size: int = 224):
    """Load model weights from either a native or a reference checkpoint.

    Tries the native msgpack format first; if the file is a PyTorch
    checkpoint from the reference implementation (the published pre-trained
    models, reference ``readme.md:33``), converts it via
    :mod:`openset_imagenet_tpu.convert`.  Optimizer state is never
    restored.  Returns ``(state, start_epoch, best_score)``.
    """
    try:
        new_state, epoch, _ = load_checkpoint(checkpoint, state,
                                              restore_opt=False)
        # restore_opt=False hardcodes best=0.0 (finetune contract); report
        # the stored score here so both formats return the same triple.
        return new_state, epoch, read_metadata(checkpoint)["best_score"]
    except CheckpointShapeError:
        # It IS a native checkpoint — just for a different model config.
        # Surface the clear error instead of chaining a torch fallback.
        raise
    except Exception as msgpack_err:  # not a native checkpoint
        try:
            from .convert import load_reference_checkpoint
            variables, epoch, best = load_reference_checkpoint(
                checkpoint, model, image_size=image_size)
        except Exception as convert_err:
            # Chain both: the msgpack error for native-format files, with
            # the torch-conversion error (e.g. a variant/shape mismatch on
            # a genuine reference .pth) visible as the cause.
            raise msgpack_err from convert_err
        return (state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"]),
                epoch, best)


def infer_n_classes(checkpoint) -> int:
    """Logits-head output dimensionality stored in a trained checkpoint.

    Lets serving accept ``n_classes=None`` / CLI ``auto`` with a ``.pth``:
    reads the native msgpack ``model_state_dict/logits/kernel`` shape
    (``[fc_layer_dim, n_classes]``), falling back to the reference-torch
    layout (``logits.weight``, ``[n_classes, fc_layer_dim]``, optionally
    ``module.``-prefixed like the published DataParallel models).
    """
    try:
        with open(checkpoint, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        return int(np.shape(
            payload["model_state_dict"]["logits"]["kernel"])[-1])
    except FileNotFoundError:
        # A missing file is not a format problem — the "pass n_classes
        # explicitly" advice below would point the user at the wrong fix.
        raise
    except Exception:
        try:
            import torch

            payload = torch.load(checkpoint, map_location="cpu",
                                 weights_only=True)
            sd = payload.get("model_state_dict", payload)
            key = ("logits.weight" if "logits.weight" in sd
                   else "module.logits.weight")
            return int(sd[key].shape[0])
        except Exception as convert_err:
            raise ValueError(
                f"{checkpoint}: cannot infer n_classes (no logits head "
                "found in either the native msgpack or the reference "
                "torch layout) — pass it explicitly"
            ) from convert_err


def read_metadata(checkpoint) -> dict:
    """Read only ``{epoch, best_score}`` (the plot layer's use, reference
    ``script/plot_all.py:140-141``) — plus ``extra`` when present —
    without materialising the weights.

    New checkpoints store the scalars (and the small ``extra`` map) as
    the leading map entries, so a streaming msgpack unpack stops before
    any tensor; older layouts fall back to a full decode.
    """
    try:
        return _read_native_metadata(checkpoint)
    except FileNotFoundError:
        raise
    except Exception:
        # Reference torch checkpoint (the evaluate CLI auto-converts these,
        # so the plot layer must read their metadata too).
        import torch

        payload = torch.load(checkpoint, map_location="cpu",
                             weights_only=True)
        return {"epoch": int(payload.get("epoch", 0)),
                "best_score": float(payload.get("best_score", 0.0))}


def _read_native_metadata(checkpoint) -> dict:
    """Native-format metadata read; raises for non-msgpack files.

    New checkpoints store the scalars (and ``extra``) as the leading map
    entries, so the streaming unpack stops before any tensor; older
    layouts fall back to a full decode.
    """
    import msgpack

    _scalar_keys = ("epoch", "step", "best_score", "extra")

    def _result(meta):
        out = {"epoch": int(meta["epoch"]),
               "best_score": float(meta["best_score"])}
        if "extra" in meta:
            out["extra"] = meta["extra"]
        return out

    try:
        with open(checkpoint, "rb") as f:
            unpacker = msgpack.Unpacker(f, raw=False)
            n_entries = unpacker.read_map_header()
            meta = {}
            for _ in range(min(n_entries, len(_scalar_keys))):
                key = unpacker.unpack()
                if key not in _scalar_keys:
                    break  # hit a tensor collection: metadata is over
                meta[key] = unpacker.unpack()
            if "epoch" in meta and "best_score" in meta:
                return _result(meta)
    except FileNotFoundError:
        raise
    except Exception:
        pass
    with open(checkpoint, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return _result(payload)


def infer_arch(checkpoint) -> dict:
    """Architecture metadata a trained checkpoint was saved with.

    Returns ``{"variant": str, "space_to_depth": bool}`` for checkpoints
    written by this framework's trainer; ``{}`` for pre-metadata native
    checkpoints, reference torch checkpoints, and unreadable files —
    callers fall back to their defaults (resnet50, no S2D).  Lets
    ``evaluate_imagenet``/``predict_imagenet``/``OpenSetPredictor``
    rebuild the right model geometry without a ``--model-variant`` flag
    (the reference hardcodes resnet50, reference
    ``script/evaluate.py:103-110``).
    """
    try:
        # Native-only read: torch checkpoints can never carry arch
        # metadata, so skip read_metadata's torch fallback (which would
        # fully load a multi-hundred-MB reference .pth a second time
        # just to answer {}).
        meta = _read_native_metadata(checkpoint)
    except Exception:
        return {}
    arch = (meta.get("extra") or {}).get("arch") or {}
    return dict(arch) if isinstance(arch, dict) else {}


def resolve_model_cfg(checkpoint, variant: Optional[str] = None) -> dict:
    """Model-geometry config for rebuilding a checkpoint's architecture.

    Returns ``{"variant": str, "space_to_depth": bool}`` — an explicit
    ``variant`` always wins; otherwise the checkpoint's stored arch
    metadata; otherwise the reference defaults (resnet50, no S2D).  The
    single resolution rule shared by evaluate/predict/serve/export and
    :class:`~openset_imagenet_tpu.inference.OpenSetPredictor`.
    """
    arch = infer_arch(checkpoint)
    return {"variant": variant or arch.get("variant", "resnet50"),
            "space_to_depth": bool(arch.get("space_to_depth", False))}
