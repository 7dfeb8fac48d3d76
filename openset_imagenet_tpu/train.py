"""TPU-native training engine: jitted steps, mesh DP, γ model selection.

Re-design of the reference training layer (``train.py:104-482``) for
JAX/XLA on TPU.  Semantics preserved (SURVEY.md C9):

* per-loss label surgery and ``n_classes`` rules (reference
  ``train.py:287-293, 330-347``),
* Adam / SGD(momentum=0.9) with optional StepLR decay
  (``train.py:356-369``),
* validation γ = conf_kn + conf_unk model selection (``train.py:433``),
* ``_curr``/``_best`` checkpoints with resume + finetune (``train.py:37-101,
  372-388, 462-471``),
* tensorboard scalars ``train/loss, val/loss, val/conf_kn, val/conf_unk``
  (``train.py:440-444``) plus a CSV sidecar.

TPU-first mechanics (deliberately different from the reference):

* One jit-compiled train step (forward + loss + backward + optimizer) with
  **donated state** — parameters update in place in HBM, no reallocation.
* **bfloat16 compute** on the MXU; float32 master params and BN statistics.
* **Data parallelism over a device mesh**: batches arrive sharded over the
  ``data`` axis, parameters are replicated; XLA inserts the gradient
  all-reduce (``psum``) over ICI automatically.  This is the framework's
  DDP/NCCL equivalent (the reference's DDP is vestigial, SURVEY.md §2).
* **Static shapes everywhere**: ragged final batches are padded + masked
  (mask-aware losses/metrics make padding an exact no-op), so each of
  train/eval compiles exactly once.
* **Async metric accumulation**: per-step scalars stay on device and are
  reduced lazily; the host never blocks inside the hot loop.
* Validation accumulates confidence *sums* on device instead of
  materialising the full ``[N, C]`` score matrix (reference
  ``train.py:167-185``) — identical averages, O(1) memory.
"""

from __future__ import annotations

import functools
import pathlib
import random
import signal
import time
from collections import defaultdict

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .checkpoint import AsyncCheckpointer, load_checkpoint, save_checkpoint
from .dataset import ImagenetDataset
from .events import SummaryWriter
from .logger import configure_logger
from .models.resnet import ResNet50, build_resnet
from .ops.losses import (AverageMeter, EarlyStopping, entropic_openset_loss,
                         garbage_loss, softmax_loss)
from .ops.metrics import confidence_sums, loss_regime_params
from .parallel.mesh import batch_sharding, data_mesh_for_batch, replicated
from .pipeline import InputPipeline, PILReader, SyntheticReader, \
    pipeline_from_dataset


# --------------------------------------------------------------------------
# Seeding (reference train.py:23-31)
# --------------------------------------------------------------------------

def set_seeds(seed: int) -> jax.Array:
    """Seed host RNGs and return the root JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


# --------------------------------------------------------------------------
# Train state
# --------------------------------------------------------------------------

class GracefulShutdown:
    """Preemption handling: SIGTERM/SIGUSR1 request a clean stop.

    TPU VMs deliver SIGTERM on preemption; the reference can only recover
    by re-attaching to the last ``_curr`` checkpoint after the fact
    (``--continue-training``, reference ``script/train_all.py:60-64``).
    Here the signal lets the current epoch finish, its checkpoint land, and
    the run exit cleanly — resume then loses zero completed work.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGUSR1)):
        self.requested = False
        self._previous = {}
        self._signals = signals

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        for sig in self._signals:
            try:
                self._previous[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main thread / restricted
                pass
        return self

    def __exit__(self, *exc):
        for sig, prev in self._previous.items():
            try:
                signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        return False


class TrainState(struct.PyTreeNode):
    """Model + optimizer state carried through the jitted step.

    ``apply_fn`` and ``tx`` are static (not traced); everything else is a
    pytree of device arrays, replicated over the mesh under pure DP.
    """

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats):
        updates, opt_state = self.tx.update(grads, self.opt_state, self.params)
        params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=params,
                            batch_stats=batch_stats, opt_state=opt_state)


def build_lr_schedule(opt_cfg, steps_per_epoch: int, epochs: int = 0):
    """Per-update learning-rate schedule (a callable ``count -> lr``).

    Reference parity (the default): ``train.py:356-369`` — torch
    ``StepLR(step_size=decay, gamma)`` stepping once per epoch becomes
    ``lr * gamma ** ((step // steps_per_epoch) // decay)``.

    TPU extensions (beyond the reference's inventory, all default-off):

    * ``opt.schedule: cosine`` — cosine decay from ``lr`` to
      ``lr * opt.min_lr_ratio`` (default 0) over the full run; needs
      ``epochs`` (the worker passes ``cfg.epochs``).
    * ``opt.warmup_epochs: E`` — linear warmup 0 → ``lr`` over the
      first ``E`` epochs, composed in front of either schedule (the
      standard large-batch ramp, Goyal et al. 2017).

    ``steps_per_epoch`` is in optimizer *updates* — with gradient
    accumulation the caller divides the dataloader length by
    ``accumulate_steps`` (see :func:`build_optimizer`).
    """
    lr = float(opt_cfg.lr)
    decay = int(getattr(opt_cfg, "decay", 0) or 0)
    gamma = float(getattr(opt_cfg, "gamma", 1.0) or 1.0)
    kind = getattr(opt_cfg, "schedule", "step") or "step"
    spe = max(int(steps_per_epoch), 1)
    warmup = int(getattr(opt_cfg, "warmup_epochs", 0) or 0) * spe
    if kind == "cosine":
        if epochs <= 0:
            raise ValueError("opt.schedule: cosine needs the total epoch "
                             "count (cfg.epochs) to place the decay")
        floor = lr * float(getattr(opt_cfg, "min_lr_ratio", 0.0) or 0.0)
        # The decay spans the post-warmup region (standard composition:
        # ramp to the peak, then one half-cosine down to the floor).
        total = max(epochs * spe - warmup, 1)

        def base(count):
            frac = jnp.clip((count - warmup) / total, 0.0, 1.0)
            return floor + (lr - floor) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
    elif kind == "step":
        if decay > 0:
            def base(count):
                epoch = count // spe
                return lr * gamma ** (epoch // decay)
        else:
            def base(count):
                return lr
    else:
        raise ValueError(f"unknown opt.schedule {kind!r}; "
                         "choose 'step' or 'cosine'")
    if warmup <= 0:
        return base

    def schedule(count):
        ramp = (count + 1) / warmup
        return jnp.where(count < warmup, lr * ramp, base(count))

    return schedule


class EmaState(NamedTuple):
    """Shadow EMA of the parameters, carried inside ``opt_state``.

    Living in the optimizer state (not a TrainState field) means every
    existing invariant — donated-buffer jit, mesh replication,
    msgpack checkpointing, bitwise resume — covers the EMA for free.
    """
    ema_params: Any


def weight_ema(decay: float) -> optax.GradientTransformation:
    """Maintain ``ema = decay * ema + (1 - decay) * params`` per update.

    TPU extension beyond the reference's inventory: the standard
    production trick (Polyak averaging) — evaluate/serve a smoothed copy
    of the weights while training the raw ones.  Passes gradients
    through untouched; chain it LAST so it sees the final updates and
    can form the post-step parameters.
    """
    def init(params):
        # A real copy, not an alias: the train step donates the whole
        # TrainState, and aliased params/ema buffers would be donated
        # twice (Execute() rejects that).
        return EmaState(ema_params=jax.tree_util.tree_map(jnp.copy, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("weight_ema requires params")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema_params, new_params)
        return updates, EmaState(ema_params=ema)

    return optax.GradientTransformation(init, update)


def extract_ema(opt_state):
    """Pull the EMA parameters out of a (possibly nested) ``opt_state``.

    Walks chain/MultiSteps tuple nesting; returns ``None`` when the
    optimizer was built without ``opt.ema`` (callers fall back to the
    raw parameters).
    """
    if isinstance(opt_state, EmaState):
        return opt_state.ema_params
    if isinstance(opt_state, tuple):   # chain tuples AND NamedTuple states
        for child in opt_state:
            found = extract_ema(child)
            if found is not None:
                return found
    return None


def build_optimizer(opt_cfg, steps_per_epoch: int, epochs: int = 0
                    ) -> optax.GradientTransformation:
    """Adam or SGD(momentum=0.9) over :func:`build_lr_schedule`.

    Parity: reference ``train.py:356-369`` (torch Adam/SGD + StepLR).
    TPU extension (default-off): ``opt.accumulate_steps: k`` wraps the
    transformation in ``optax.MultiSteps`` — gradients average over k
    micro-batches and the optimizer applies every k-th call, giving a
    k× effective batch on the same HBM footprint.  Epoch-based
    schedules stay aligned because the schedule counts *updates*:
    ``steps_per_epoch`` is divided by k here (MultiSteps advances the
    inner count only on real updates).  BN statistics still update
    every micro-step — same semantics as ghost batch-norm.
    """
    accum = int(getattr(opt_cfg, "accumulate_steps", 1) or 1)
    spe = max(int(steps_per_epoch), 1)
    if accum > 1:
        spe = max(spe // accum, 1)
    schedule = build_lr_schedule(opt_cfg, spe, epochs=epochs)
    if getattr(opt_cfg, "type", "adam") == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        tx = optax.adam(schedule)
    ema = float(getattr(opt_cfg, "ema", 0.0) or 0.0)
    if ema:
        if not 0.0 < ema < 1.0:
            raise ValueError(f"opt.ema must be in (0, 1), got {ema}")
        # Chained inside MultiSteps: the EMA advances once per real
        # optimizer update, not per accumulation micro-step.
        tx = optax.chain(tx, weight_ema(ema))
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def create_state(model: ResNet50, rng: jax.Array,
                 tx: optax.GradientTransformation,
                 image_size: int = 224) -> TrainState:
    """Initialise parameters/batch-stats and wrap them in a TrainState."""
    dummy = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames="train")(
        rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params),
                      apply_fn=model.apply, tx=tx)


# --------------------------------------------------------------------------
# Loss wiring (reference train.py:330-347)
# --------------------------------------------------------------------------

def make_loss_fn(loss_type: str, unk_weight: float = 1.0,
                 class_weights: Optional[np.ndarray] = None,
                 fused: bool = False) -> Callable:
    """Return ``loss_fn(logits, labels, mask) -> (mean_loss, count)``.

    ``fused=True`` selects the Pallas kernel for the entropic loss
    (:mod:`openset_imagenet_tpu.ops.fused_loss`) — one HBM pass, custom VJP.
    """
    if fused:
        from .ops import fused_loss as fl

        if loss_type == "entropic":
            return lambda logits, labels, mask=None: \
                fl.entropic_openset_loss_fused(
                    logits, labels,
                    jnp.ones(labels.shape, jnp.float32) if mask is None
                    else mask, unk_weight)
        if loss_type == "softmax":
            return lambda logits, labels, mask=None: fl.softmax_loss_fused(
                logits, labels, sample_mask=mask)
        if loss_type == "garbage":
            if class_weights is None:
                raise ValueError("garbage loss requires class_weights")
            w = jnp.asarray(class_weights, jnp.float32)
            return lambda logits, labels, mask=None: fl.garbage_loss_fused(
                logits, labels, w, sample_mask=mask)
    if loss_type == "entropic":
        return lambda logits, labels, mask=None: entropic_openset_loss(
            logits, labels, unk_weight=unk_weight, sample_mask=mask)
    if loss_type == "softmax":
        return lambda logits, labels, mask=None: softmax_loss(
            logits, labels, sample_mask=mask)
    if loss_type == "garbage":
        if class_weights is None:
            raise ValueError("garbage loss requires class_weights")
        w = jnp.asarray(class_weights, jnp.float32)
        return lambda logits, labels, mask=None: garbage_loss(
            logits, labels, w, mask)
    raise ValueError(f"unknown loss type {loss_type!r}")


# --------------------------------------------------------------------------
# Jitted steps
# --------------------------------------------------------------------------

def _to_float(images_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] on device (ToTensor parity, C3)."""
    return images_u8.astype(jnp.float32) * (1.0 / 255.0)


def make_state_shardings(state: TrainState, mesh, zero1: bool = False):
    """TrainState-shaped pytree of shardings for the engine's jit steps.

    Default (pure DP): every leaf replicated.  With ``zero1`` the
    optimizer state is partitioned over the ``data`` axis instead
    (ZeRO-1, Rajbhandari et al. 2019): Adam's m/v moments, the EMA
    shadow and any accumulation buffers each live once across the mesh
    — on an N-chip mesh that cuts the per-device optimizer footprint
    ~N× (for ResNet-50+Adam, two params-sized trees).  Parameters and
    batch statistics stay replicated, so forward/eval math is untouched;
    XLA's SPMD partitioner turns the update into shard-local compute
    plus one all-gather of the parameter updates over ICI.
    """
    rep = replicated(mesh)
    tree = jax.tree.map(lambda _: rep, state)
    if zero1:
        from .parallel.mesh import shard_over_axis
        tree = tree.replace(opt_state=shard_over_axis(mesh, state.opt_state))
    return tree


def validate_zero1_flags(zero1: bool, parallel_mode: str,
                         process_count: int = 1) -> None:
    """Reject the configurations ZeRO-1 sharding cannot serve.

    shard_map mode keeps the whole TrainState replicated per device by
    construction.  Multi-process meshes ARE supported: the checkpoint
    path gathers optimizer shards collectively at save time and
    re-slices them on resume (see :func:`gather_opt_for_save` /
    :func:`place_state`), so ``process_count`` no longer restricts
    anything — the parameter stays for call-site compatibility.
    """
    if not zero1:
        return
    if parallel_mode == "shard_map":
        raise ValueError(
            "opt.zero1 requires parallel_mode: gspmd — the shard_map "
            "step keeps the whole TrainState replicated per device")


@functools.lru_cache(maxsize=32)
def _identity_jit(treedef, sharding_leaves):
    """Memoized jitted identity for one out-sharding tree.

    jit's dispatch cache is keyed on the wrapped function object, so a
    fresh ``jax.jit(lambda ...)`` per call would re-trace (and on slow
    backends re-compile) the identical program at every checkpoint save
    and every EMA validation.  Shardings and treedefs are hashable, so
    the wrapper itself is cached per layout.
    """
    shardings = jax.tree_util.tree_unflatten(treedef,
                                             list(sharding_leaves))
    return jax.jit(lambda t: t, out_shardings=shardings)


def _reshard(tree, shardings):
    """Cross-process-safe on-device re-placement (jitted identity).

    ``jax.device_put`` cannot re-place committed arrays whose shards live
    on other processes' devices; a jitted identity with ``out_shardings``
    compiles to exactly the matching XLA collective (an all-gather over
    ICI when widening to replicated, a local slice when narrowing to
    shards) and runs as one SPMD program on every rank.
    """
    leaves, treedef = jax.tree_util.tree_flatten(shardings)
    return _identity_jit(treedef, tuple(leaves))(tree)


def place_state(state, state_sh, mesh, zero1: bool):
    """Place a host-side TrainState according to ``state_sh``.

    Multi-process ZeRO-1: host numpy cannot be ``device_put`` directly
    into a sharding spanning other processes' devices, so stage it
    fully replicated first (every host holds identical bytes — the same
    init seed or the same checkpoint file) and slice into shards on
    device.  Single-process (and the pure-DP replicated tree) keeps the
    direct ``device_put``.
    """
    if zero1 and jax.process_count() > 1:
        state = jax.device_put(state, replicated(mesh))
        return _reshard(state, state_sh)
    return jax.device_put(state, state_sh)


def gather_opt_for_save(state, mesh, fetch: bool = True):
    """Return ``state`` with a fully-gathered optimizer state.

    ZeRO-1 across processes leaves Adam moments/EMA shards on devices the
    msgpack writer's host fetch cannot address; one jitted all-gather
    over ICI re-places them fully replicated, then (``fetch=True``) the
    now-locally-addressable values are pulled to host numpy.  The
    resharding is COLLECTIVE — all ranks must call this at the same
    point — but only the writing (lead) rank needs the device->host
    fetch; non-lead ranks pass ``fetch=False`` and skip a transfer of
    ~2x the parameter footprint per checkpoint that they would only
    discard.  The resulting checkpoint is byte-identical to a
    single-process save (A3's bitwise resume contract extends to
    sharded optimizer state).
    """
    full = _reshard(state.opt_state, replicated(mesh))
    if fetch:
        full = jax.tree.map(lambda x: np.asarray(x), full)
    return state.replace(opt_state=full)


def make_train_step(loss_fn: Callable, mesh=None,
                    apply_fn: Optional[Callable] = None,
                    state_sharding=None) -> Callable:
    """Compile the fused forward/loss/backward/update step.

    Under a mesh: state replicated, batch sharded over ``data``; the gradient
    all-reduce materialises as an XLA ``psum`` over ICI.

    ``apply_fn`` overrides ``state.apply_fn`` — used by the ragged-tail step,
    which applies the same parameters through a model whose batch-norm
    statistics window covers exactly the valid (non-padded) rows.

    ``state_sharding`` overrides the replicated TrainState placement with a
    :func:`make_state_shardings` tree (ZeRO-1 optimizer partitioning).
    """
    def step(state: TrainState, images, labels, mask):
        imgs = _to_float(images)
        apply = apply_fn if apply_fn is not None else state.apply_fn

        def loss_of(params):
            (logits, _), mutated = apply(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, train=True, mutable=["batch_stats"])
            loss, count = loss_fn(logits, labels, mask)
            return loss, (mutated["batch_stats"], count)

        (loss, (batch_stats, _)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, batch_stats)
        # Tracker weighting is by batch rows (reference train.py:126,135),
        # not by the criterion's own normalizer (which for garbage is a
        # class-weight sum, for softmax the valid-label count).
        rows = jnp.sum(mask)
        return new_state, {"loss_sum": loss * rows, "count": rows}

    if mesh is not None:
        rep = replicated(mesh)
        st = state_sharding if state_sharding is not None else rep
        data = batch_sharding(mesh)
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(st, data, data, data),
                       out_shardings=(st, rep))
    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(loss_fn: Callable, loss_type: str, n_classes: int,
                   mesh=None, state_sharding=None) -> Callable:
    """Compile the validation step: loss + streaming confidence sums.

    The regime parameters (offset / unknown_class / last_valid_class) follow
    reference ``train.py:156-163`` via :func:`loss_regime_params`.
    """
    regime = loss_regime_params(loss_type, n_classes)

    def step(state: TrainState, images, labels, mask):
        imgs = _to_float(images)
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False)
        scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        loss, _ = loss_fn(logits, labels, mask)
        kn_sum, kn_cnt, neg_sum, neg_cnt = confidence_sums(
            scores, labels, sample_mask=mask, **regime)
        rows = jnp.sum(mask)
        # Reference tracker weighting: per-batch loss weighted by batch rows
        # (train.py:180-181), not by valid-label rows.
        return {"loss_sum": loss * rows, "rows": rows,
                "kn_sum": kn_sum, "kn_count": kn_cnt,
                "neg_sum": neg_sum, "neg_count": neg_cnt}

    if mesh is not None:
        rep = replicated(mesh)
        st = state_sharding if state_sharding is not None else rep
        data = batch_sharding(mesh)
        return jax.jit(step, in_shardings=(st, data, data, data),
                       out_shardings=rep)
    return jax.jit(step)


def make_forward_step(mesh=None, state_sharding=None) -> Callable:
    """Compile the extraction step: ``(logits, features, scores)``."""
    def step(state: TrainState, images):
        imgs = _to_float(images)
        logits, features = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, train=False)
        scores = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return logits, features, scores

    if mesh is not None:
        rep = replicated(mesh)
        st = state_sharding if state_sharding is not None else rep
        data = batch_sharding(mesh)
        return jax.jit(step, in_shardings=(st, data),
                       out_shardings=(data, data, data))
    return jax.jit(step)


# --------------------------------------------------------------------------
# Epoch loops (reference train.py:104-196)
# --------------------------------------------------------------------------

def train_epoch(state: TrainState, pipeline: InputPipeline, epoch: int,
                train_step: Callable, trackers,
                progress: bool = False,
                tail_step: Optional[Callable] = None,
                start_batch: int = 0,
                step_hook: Optional[Callable] = None) -> TrainState:
    """One pass over the training set; updates ``trackers['j']``.

    Also tracks wall-clock throughput in ``trackers['imgs/s']`` (the
    reference has only epoch timing, ``train.py:411,422`` — per-epoch
    imgs/sec is the BASELINE.md headline unit so it is first-class here).
    ``progress`` shows a tqdm bar like the reference's non-parallel mode
    (``train.py:122-123``).

    ``tail_step`` handles the final (ragged, padded+masked) batch with
    batch-norm statistics restricted to its valid rows — the reference
    trains this tail too (``DataLoader(drop_last=False)``, reference
    ``train.py:299-304``).

    Step-granular resume (TPU extension beyond the reference's
    epoch-boundary checkpoints):

    * ``start_batch`` resumes the epoch at batch k — the pipeline's
      (seed, epoch, index)-keyed determinism makes the suffix bitwise
      identical to the uninterrupted epoch, so a mid-epoch
      checkpoint + resume retraces the straight run exactly.  Tracker
      averages then cover only the resumed part of the epoch (the model
      state is unaffected).
    * ``step_hook(state, done)`` runs after every step with the number of
      batches consumed so far this epoch; returning True ends the epoch
      early (the worker uses this for mid-epoch preemption saves and the
      ``max_steps`` budget).
    """
    for m in trackers.values():
        m.reset()
    sums = None
    t0 = time.time()
    nb = len(pipeline)
    batches = pipeline.epoch(epoch, start_batch=start_batch)
    if progress:
        try:
            import tqdm
            batches = tqdm.tqdm(batches, total=nb - start_batch, leave=False)
        except ImportError:
            pass
    for i, batch in enumerate(batches, start=start_batch):
        step = (tail_step if tail_step is not None and i == nb - 1
                else train_step)
        state, m = step(state, batch.images, batch.labels, batch.mask)
        sums = m if sums is None else jax.tree.map(jnp.add, sums, m)
        if step_hook is not None and step_hook(state, i + 1):
            break
    if sums is not None:
        count = float(sums["count"])  # device fetch: drains the epoch
        elapsed = time.time() - t0
        if count:
            trackers["j"].update(float(sums["loss_sum"]) / count, count)
            trackers["imgs/s"].update(count / max(elapsed, 1e-9), 1)
    return state


# Reference-name alias (reference train.py:104 names the per-epoch pass
# `train`); the TPU-native signature differs — jitted step + pipeline
# instead of (model, loader, optimizer, device, loss_fn).
train = train_epoch


def validate(state: TrainState, pipeline: InputPipeline, epoch: int,
             eval_step: Callable, trackers) -> None:
    """Full validation pass; updates ``trackers`` j / conf_kn / conf_unk.

    Averages are bit-identical in expectation to the reference's full-matrix
    computation (``train.py:167-196``) but use O(1) device memory.
    """
    for m in trackers.values():
        m.reset()
    sums = None
    for batch in pipeline.epoch(epoch):
        m = eval_step(state, batch.images, batch.labels, batch.mask)
        sums = m if sums is None else jax.tree.map(jnp.add, sums, m)
    if sums is None:
        return
    sums = jax.tree.map(float, sums)
    if sums["rows"]:
        trackers["j"].update(sums["loss_sum"] / sums["rows"], sums["rows"])
    if sums["kn_count"]:
        trackers["conf_kn"].update(sums["kn_sum"] / sums["kn_count"],
                                   sums["kn_count"])
    if sums["neg_count"]:
        trackers["conf_unk"].update(sums["neg_sum"] / sums["neg_count"],
                                    sums["neg_count"])


def get_arrays(state: TrainState, pipeline: InputPipeline,
               forward_step: Optional[Callable] = None, mesh=None,
               gather: Any = "auto"
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Extract ``(targets, logits, features, scores)`` for a whole dataset.

    Parity: reference ``train.py:200-234`` — same tuple, same order, numpy
    on host; padded rows are dropped via the mask.

    Multi-host SPMD: each process addresses only its shard of every global
    batch, so labels/mask and the forward outputs are all-gathered to every
    host with ``multihost_utils.process_allgather`` (tiled along the batch
    dim) — evaluation works under the same mesh config as training.
    ``gather`` forces the allgather code path on (tests) or off; ``"auto"``
    enables it exactly when ``jax.process_count() > 1``.
    """
    if gather == "auto":
        gather = jax.process_count() > 1
    if forward_step is None:
        forward_step = make_forward_step(mesh)
    if gather:
        from jax.experimental import multihost_utils

        def fetch(x):
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
    else:
        fetch = np.asarray
    targets, logits, feats, scores = [], [], [], []
    for batch in pipeline.epoch(0):
        lg, ft, sc = forward_step(state, batch.images)
        keep = fetch(batch.mask) > 0
        targets.append(fetch(batch.labels)[keep])
        logits.append(fetch(lg)[keep])
        feats.append(fetch(ft)[keep])
        scores.append(fetch(sc)[keep])
    if not targets:
        # Empty split: return empty arrays like the reference's
        # torch.empty(0, ...) accumulators (train.py:200-234).
        n_out = state.params["logits"]["kernel"].shape[1]
        n_feat = state.params["fc"]["kernel"].shape[1]
        return (np.zeros((0,), np.float32),
                np.zeros((0, n_out), np.float32),
                np.zeros((0, n_feat), np.float32),
                np.zeros((0, n_out), np.float32))
    return (np.concatenate(targets).astype(np.float32),
            np.concatenate(logits), np.concatenate(feats),
            np.concatenate(scores))


# --------------------------------------------------------------------------
# Worker: full single-run orchestration (reference train.py:237-482)
# --------------------------------------------------------------------------

def _resize_for_crop(crop: int) -> int:
    """Shorter-side resize for a crop size.

    Reference pair: Resize(256) -> Crop(224) (``train.py:259-268``); kept
    verbatim for every crop <= 256 (backward compatible) and scaled by the
    same 256/224 ratio beyond it so the crop window never exceeds the
    resized image (which would pad/replicate borders)."""
    return 256 if crop <= 256 else round(crop * 256 / 224)


def _make_reader(cfg, crop: int = 224):
    """Reader per ``cfg.data.reader``: auto (default) | native | pil |
    synthetic.  ``auto`` prefers the native fused libjpeg path
    (:mod:`openset_imagenet_tpu.native.jpeg`) and falls back to PIL."""
    kind = getattr(cfg.data, "reader", "auto") or "auto"
    resize = _resize_for_crop(crop)
    if kind == "synthetic":
        return SyntheticReader(crop=crop, seed=int(cfg.seed))
    if kind in ("auto", "native", "native_batch"):
        from .native.jpeg import (NativeBatchReader, NativeReader,
                                  native_available)
        if native_available():
            # Batch mode: one GIL-free C++ thread-pool call per batch.
            if kind in ("auto", "native_batch"):
                workers = int(getattr(cfg, "workers", 4) or 4)
                return NativeBatchReader(crop=crop, resize=resize,
                                         threads=workers)
            return NativeReader(crop=crop, resize=resize)
        if kind != "auto":
            raise RuntimeError("native reader requested but the osijpeg "
                               "library could not be built")
    return PILReader(crop=crop, resize=resize)


def decode_serving_paths(paths, image_size: int, reader=None):
    """Decode image paths with the serving reader policy into one
    ``(N, image_size, image_size, 3)`` uint8 batch.

    Single source of truth for every surface that turns paths into
    serving pixels — :class:`~openset_imagenet_tpu.inference
    .OpenSetPredictor` and export-time int8 calibration
    (:func:`~openset_imagenet_tpu.optimize.optimized_inference`) must
    decode identically, or baked calibration scales would drift from
    the pixels served.  Policy: ``auto`` reader (native fused libjpeg
    batch decoder with PIL fallback), shorter-side resize + center
    crop — the eval transform.

    Returns ``(batch, reader)`` so callers can cache the reader (the
    native batch reader owns a C++ thread pool) across calls.
    """
    if reader is None:
        from .config import NameSpace
        reader = _make_reader(NameSpace({"data": {"reader": "auto"},
                                         "seed": 0}), crop=image_size)
    paths = list(paths)
    if not paths:
        return np.zeros((0, image_size, image_size, 3), np.uint8), reader
    if hasattr(reader, "read_batch"):
        return reader.read_batch(paths, [None] * len(paths)), reader
    return np.stack([reader(p, None) for p in paths]), reader


def build_model(cfg, n_classes: int) -> ResNet50:
    """Model from config: two-head ResNet, variant default ``resnet50``.

    Parity: reference ``train.py:350-353`` (``fc_layer_dim == out_features ==
    n_classes``, no logit bias); variant/image-size are extensions.
    """
    model_cfg = getattr(cfg, "model", None)
    variant = (getattr(model_cfg, "variant", "resnet50")
               if model_cfg is not None else "resnet50")
    bn_rows = int(getattr(model_cfg, "bn_stats_rows", 0) or 0) \
        if model_cfg is not None else 0
    s2d = bool(getattr(model_cfg, "space_to_depth", False)) \
        if model_cfg is not None else False
    remat = (getattr(model_cfg, "remat", False) or False) \
        if model_cfg is not None else False
    fused = bool(getattr(model_cfg, "fused_blocks", False)) \
        if model_cfg is not None else False
    bmask = bool(getattr(model_cfg, "boundary_mask", False)) \
        if model_cfg is not None else False
    return build_resnet(variant, fc_layer_dim=n_classes,
                        out_features=n_classes, logit_bias=False,
                        bn_stats_rows=bn_rows, space_to_depth=s2d,
                        remat=remat, fused_blocks=fused,
                        boundary_mask=bmask)


class _NullWriter:
    """Scalar-writer stub for non-lead processes in multi-host runs."""

    def add_scalar(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def worker(cfg) -> dict:
    """Train one (protocol, loss) run end to end.  Returns summary info."""
    # Multi-host: bring up jax.distributed when launched under the
    # launch_imagenet contract (no-op otherwise) — must precede the first
    # backend touch (the PRNGKey below).
    from .parallel.launch import maybe_initialize
    maybe_initialize()
    rng = set_seeds(cfg.seed)

    # Optional persistent XLA compilation cache: sweep runs and resumes
    # skip the multi-minute ResNet-50 TPU compile after the first run.
    cache_dir = getattr(cfg, "compilation_cache", None)
    if cache_dir:
        from .util import enable_compilation_cache
        enable_compilation_cache(cache_dir)

    best_score = 0.0
    start_epoch = 0
    start_batch = 0  # mid-epoch resume offset (checkpoint extra.progress)

    out_dir = pathlib.Path(cfg.output_directory)
    out_dir.mkdir(parents=True, exist_ok=True)
    # Multi-host: only the lead process writes files (logfile, scalar
    # record, checkpoints) — concurrent writers to a shared output
    # directory would race on the same paths.  "Log only on first
    # process": same policy the reference states (reference train.py:248).
    is_lead = jax.process_index() == 0
    log = configure_logger(
        logfile=(out_dir / cfg.log_name) if is_lead else None)

    # -- datasets + label surgery (reference train.py:270-293) -------------
    train_file = pathlib.Path(str(cfg.data.train_file).format(cfg.protocol))
    val_file = pathlib.Path(str(cfg.data.val_file).format(cfg.protocol))
    if not (train_file.exists() and val_file.exists()):
        raise FileNotFoundError("train/validation file does not exist")

    train_ds = ImagenetDataset(train_file, cfg.data.imagenet_path)
    val_ds = ImagenetDataset(val_file, cfg.data.imagenet_path)
    if cfg.loss.type == "garbage":
        train_ds.replace_negative_label()
        val_ds.replace_negative_label()
    elif cfg.loss.type == "softmax":
        train_ds.remove_negative_label()  # train only (train.py:291-293)

    # -- n_classes rule (reference train.py:330-336) ------------------------
    if cfg.loss.type == "entropic":
        n_classes = train_ds.label_count - 1
    else:
        n_classes = train_ds.label_count

    class_weights = (train_ds.calculate_class_weights()
                     if cfg.loss.type == "garbage" else None)
    # loss.fused: true | false | auto (default: Pallas kernel on TPU).
    fused_cfg = getattr(cfg.loss, "fused", "auto")
    fused = (jax.default_backend() == "tpu" if fused_cfg == "auto"
             else bool(fused_cfg))
    loss_fn = make_loss_fn(cfg.loss.type,
                           unk_weight=float(getattr(cfg.loss, "w", 1.0)),
                           class_weights=class_weights, fused=fused)

    # -- mesh + input pipelines ---------------------------------------------
    # cfg.gpu pins this run to one device (real per-queue isolation for
    # parallel sweeps, reference script/train.py:58-60); default is the
    # full data-parallel mesh.
    gpu = getattr(cfg, "gpu", None)
    if gpu is not None:
        from .parallel.mesh import select_device
        mesh = data_mesh_for_batch(cfg.batch_size,
                                   devices=select_device(gpu))
    else:
        mesh = data_mesh_for_batch(cfg.batch_size)
    data_sh = batch_sharding(mesh)
    image_size = int(getattr(cfg.data, "image_size", 224) or 224)
    workers = int(getattr(cfg, "workers", 4) or 4)
    reader = _make_reader(cfg, crop=image_size)
    # Ragged-tail policy.  The reference trains the final partial batch
    # (``DataLoader(drop_last=False)``, reference train.py:299-304):
    #   masked (default): train the tail as a padded+masked batch through a
    #     tail-specialised step whose batch-norm statistics cover exactly
    #     the valid rows — loss, gradients, BN statistics and running
    #     averages all match the reference's unpadded tail batch.
    #   drop: skip the tail (up to batch_size-1 samples/epoch) to keep a
    #     single compiled step.
    # shard_map mode and the experimental fused blocks compute their own
    # statistics layout and keep the drop behavior.
    tail_mode = getattr(cfg, "train_tail", None) or "masked"
    if tail_mode not in ("masked", "drop"):
        raise ValueError(f"train_tail must be 'masked' or 'drop', "
                         f"got {tail_mode!r}")
    parallel_mode = getattr(cfg, "parallel_mode", "gspmd") or "gspmd"
    # opt.zero1 (TPU extension, default off): partition the optimizer
    # state over the data axis — see make_state_shardings.
    zero1 = bool(getattr(cfg.opt, "zero1", False) or False)
    validate_zero1_flags(zero1, parallel_mode, jax.process_count())
    # Built here (before the pipelines) so the tail policy can read the
    # SAME flags the model was actually built with.
    model = build_model(cfg, n_classes)
    n_tail = len(train_ds) % int(cfg.batch_size)
    if tail_mode == "masked" and n_tail and (
            parallel_mode == "shard_map" or model.fused_blocks):
        log.info("train_tail=masked is unsupported with shard_map / fused "
                 "blocks; dropping the ragged tail batch instead")
        tail_mode = "drop"
    drop_remainder = (tail_mode == "drop"
                      and len(train_ds) >= int(cfg.batch_size))
    train_pipe = pipeline_from_dataset(
        train_ds, cfg.batch_size, is_training=True, seed=cfg.seed,
        num_workers=workers, reader=reader, sharding=data_sh,
        drop_remainder=drop_remainder,
        process_index=jax.process_index(),
        process_count=jax.process_count())
    val_pipe = pipeline_from_dataset(
        val_ds, cfg.batch_size, is_training=False, seed=cfg.seed,
        num_workers=workers, reader=reader, sharding=data_sh,
        process_index=jax.process_index(),
        process_count=jax.process_count())

    # -- optimizer / state (reference train.py:350-369; model built above
    # with the tail policy) -------------------------------------------------
    tx = build_optimizer(cfg.opt, steps_per_epoch=max(len(train_pipe), 1),
                         epochs=int(getattr(cfg, "epochs", 0) or 0))
    ema_on = bool(float(getattr(cfg.opt, "ema", 0.0) or 0.0))
    state = create_state(model, rng, tx, image_size=image_size)
    state_sh = make_state_shardings(state, mesh, zero1=zero1)
    state = place_state(state, state_sh, mesh, zero1)

    # -- resume / finetune (reference train.py:372-388) --------------------
    if getattr(cfg, "checkpoint", None):
        try:
            if getattr(cfg, "train_mode", "train") == "finetune":
                # Finetune accepts native checkpoints AND the reference's
                # published torch .pth models (auto-converted) — weights
                # only.
                from .checkpoint import load_weights_any_format
                state, start_epoch, _ = load_weights_any_format(
                    cfg.checkpoint, state, model, image_size=image_size)
                best_score = 0.0
            else:
                state, start_epoch, best_score, extra_meta = load_checkpoint(
                    cfg.checkpoint, state, restore_opt=True,
                    return_extra=True)
                # Step-granular resume: a mid-epoch checkpoint (preemption
                # in preempt_mode=step, a periodic checkpoint_every_steps
                # save, or a max_steps stop) records where inside the epoch
                # it was taken; training resumes at exactly that batch.
                # Epoch-end checkpoints carry no progress entry and keep
                # the reference's epoch-boundary resume (reference
                # train.py:372-388).
                progress_meta = extra_meta.get("progress")
                if progress_meta:
                    start_epoch = int(progress_meta["epoch"])
                    start_batch = int(progress_meta["next_batch"])
                    if not 0 <= start_batch < len(train_pipe):
                        raise ValueError(
                            f"mid-epoch checkpoint resumes at batch "
                            f"{start_batch} but the training set now has "
                            f"{len(train_pipe)} batches/epoch — the dataset "
                            "or batch_size changed since the checkpoint was "
                            "saved")
        except Exception:
            # The main try/finally below does not guard resume errors;
            # release the pipelines' decode thread pools before
            # propagating (a bad checkpoint must not leak executors).
            train_pipe.close()
            val_pipe.close()
            raise
        state = place_state(state, state_sh, mesh, zero1)
        log.info(f"Best score of loaded model: {best_score:.3f}. "
                 "0 is for fine tuning")
        log.info(f"Loaded {cfg.checkpoint} at epoch {start_epoch}"
                 + (f", batch {start_batch}" if start_batch else ""))

    # parallel_mode: gspmd (default, one global-batch program) or
    # shard_map (explicit collectives + per-device BN statistics — the
    # reference's torch BN semantics; see parallel/shard_step.py).
    if parallel_mode == "shard_map":
        from .parallel.shard_step import make_train_step_shard_map
        train_step = make_train_step_shard_map(loss_fn, mesh)
    else:
        train_step = make_train_step(loss_fn, mesh, state_sharding=state_sh)
    tail_step = None
    if n_tail and not drop_remainder and tail_mode == "masked":
        # Tail batches arrive padded to batch_size with the padding LAST
        # (the shuffled order is sliced before -1 fill, pipeline.py
        # _local_slice), so a leading-rows statistics window of exactly
        # n_tail rows sees only valid samples.  An existing ghost-BN window
        # smaller than the tail keeps its configured size — and in that
        # common case (e.g. ghost-64, tail 144) the window already sees
        # only valid rows, so the REGULAR step is the tail step: no second
        # full-model compile (~3.5 min cold on the chip, BENCH.md round-3).
        g = int(model.bn_stats_rows)
        if 0 < g <= n_tail:
            tail_step = train_step
        else:
            tail_rows = n_tail
            tail_step = make_train_step(loss_fn, mesh,
                                        apply_fn=model.clone(
                                            bn_stats_rows=tail_rows).apply,
                                        state_sharding=state_sh)
    eval_step = make_eval_step(loss_fn, cfg.loss.type, n_classes, mesh,
                               state_sharding=state_sh)

    patience = int(getattr(cfg, "patience", 0) or 0)
    early_stopping = (EarlyStopping(patience=patience)
                      if patience > 0 else None)
    t_metrics = defaultdict(AverageMeter)
    v_metrics = defaultdict(AverageMeter)

    log.info("============ Data ============")
    log.info(f"train_len:{len(train_ds)}, labels:{train_ds.label_count}")
    log.info(f"val_len:{len(val_ds)}, labels:{val_ds.label_count}")
    log.info("========== Training ==========")
    log.info(f"Initial epoch: {start_epoch}")
    log.info(f"Last epoch: {cfg.epochs}")
    log.info(f"Batch size: {cfg.batch_size}")
    log.info(f"workers: {workers}")
    log.info(f"Loss: {cfg.loss.type}")
    log.info(f"optimizer: {cfg.opt.type}")
    log.info(f"Learning rate: {cfg.opt.lr}")
    log.info(f"Device mesh: {mesh.shape} on "
             f"{jax.devices()[0].platform.upper()}")
    log.info("Training...")
    writer = (SummaryWriter(log_dir=out_dir,
                            filename_suffix="-" + str(cfg.log_name))
              if is_lead else _NullWriter())

    # Optional on-demand profiler trace (SURVEY.md §5: the reference has no
    # tracing at all); cfg.profile.{dir, epochs} captures XLA/TPU traces
    # viewable in TensorBoard or Perfetto.
    profile_cfg = getattr(cfg, "profile", None)
    profile_dir = getattr(profile_cfg, "dir", None) if profile_cfg else None
    profile_epochs = set(
        (getattr(profile_cfg, "epochs", None) or [start_epoch])
        if profile_cfg else [])

    # Async checkpoint writer (extension over the reference's blocking
    # torch.save, reference train.py:55-64): the epoch loop snapshots state
    # on device and continues while a worker thread does the host fetch +
    # file write.  Content and _curr-then-_best ordering are identical to
    # the sync path; the finally below drains the queue before the worker
    # returns, so the resume/preemption contracts ("_curr is durable when
    # worker() exits") are unchanged.  async_checkpoint: false restores
    # fully synchronous writes.
    ckpt_writer = (AsyncCheckpointer()
                   if is_lead and getattr(cfg, "async_checkpoint", True)
                   else None)

    # Architecture metadata stored with every checkpoint so
    # evaluate/serving can rebuild the exact model without flags
    # (checkpoint.infer_arch).  Only geometry-affecting knobs belong
    # here (bn_stats_rows/remat/... change no parameter shapes).
    model_cfg = getattr(cfg, "model", None)
    arch = {"variant": (getattr(model_cfg, "variant", "resnet50")
                        if model_cfg is not None else "resnet50"),
            "space_to_depth": bool(getattr(model_cfg, "space_to_depth",
                                           False))
            if model_cfg is not None else False}

    # ZeRO-1 across processes: optimizer shards live on other hosts'
    # devices, so every checkpoint starts with a collective gather that
    # ALL ranks must run at the same point — _save is therefore called
    # unconditionally and applies the lead-only-write rule itself.
    mp_zero1 = zero1 and jax.process_count() > 1

    def _save(f_name, save_state, ep, score, progress=None):
        if mp_zero1:
            save_state = gather_opt_for_save(save_state, mesh,
                                             fetch=is_lead)
        if not is_lead:
            return
        extra = {"arch": arch}
        if progress:
            extra["progress"] = progress
        if ckpt_writer is not None:
            ckpt_writer.save(f_name, save_state, ep, score, extra=extra)
        else:
            save_checkpoint(f_name, save_state, ep, score, extra=extra)

    # -- step-granular preemption / budget (TPU extensions; SURVEY.md §5
    # A2/A3).  The reference can only stop at epoch boundaries; on real
    # TPU preemptions that forfeits the partial epoch.  Knobs (all
    # default to the reference-parity behavior):
    #   preempt_mode: "epoch" (default) finishes the epoch on SIGTERM;
    #     "step" saves a mid-epoch _curr checkpoint (with extra.progress)
    #     at the next step boundary and exits — resume retraces the run
    #     bitwise (the pipeline is (seed, epoch, index)-deterministic).
    #   checkpoint_every_steps: N > 0 additionally writes a mid-epoch
    #     _curr every N steps (crash tolerance, not just preemption).
    #   preempt_check_steps: signal-check (and, multi-process, agreement
    #     allgather) cadence in step mode.
    #   max_steps: stop the run after this many total training steps
    #     (batches; with opt.accumulate_steps > 1 each optimizer update
    #     spans several).  A step-budget; saves mid-epoch progress when
    #     the budget ends inside an epoch.
    preempt_mode = getattr(cfg, "preempt_mode", "epoch") or "epoch"
    if preempt_mode not in ("epoch", "step"):
        raise ValueError(f"preempt_mode must be 'epoch' or 'step', "
                         f"got {preempt_mode!r}")
    ckpt_every = int(getattr(cfg, "checkpoint_every_steps", 0) or 0)
    check_every = max(int(getattr(cfg, "preempt_check_steps", 16) or 16), 1)
    max_steps = int(getattr(cfg, "max_steps", 0) or 0)
    nb_train = len(train_pipe)
    interrupted = {"at": None}   # batch count the epoch stopped after
    budget_done = {"hit": False}
    hooks_on = bool(ckpt_every or max_steps or preempt_mode == "step")
    curr_name = str(out_dir / cfg.name) + "_curr.pth"

    def _agree(flag) -> bool:
        """Cross-process agreement on a stop flag.

        Preemption signals may reach only some hosts (or land while hosts
        straddle a step/epoch boundary); every rank evaluates this at the
        same point, so either all ranks stop there or none does —
        otherwise the stragglers deadlock in the next collective.
        """
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            flag = np.max(multihost_utils.process_allgather(np.int32(flag)))
        return bool(flag)

    # A resumed run whose budget is already spent must not train at all
    # (the hook only checks AFTER a step, so re-entering the loop would
    # add one step past max_steps per restart) nor overwrite the
    # checkpoint it resumed from.
    budget_spent = bool(max_steps
                        and start_epoch * nb_train + start_batch >= max_steps)

    def make_step_hook(ep):
        def hook(st, done):
            # done = batches consumed this epoch; base + done = total
            # training steps across the run (constant nb_train/epoch).
            total = ep * nb_train + done
            stop = False
            if preempt_mode == "step" and done % check_every == 0:
                # Same cross-host agreement as the epoch boundary: every
                # rank evaluates the hook at the same step.
                stop = _agree(shutdown.requested)
            if max_steps and total >= max_steps:
                if done >= nb_train:
                    # Budget ends exactly at the boundary: let the normal
                    # epoch-end validate/checkpoint path handle it.
                    budget_done["hit"] = True
                else:
                    stop = True
            if done >= nb_train:
                # The epoch is complete — the boundary path owns
                # validation, checkpointing and the shutdown check.
                return False
            if stop or (ckpt_every and done % ckpt_every == 0):
                # Every rank reaches this condition at the same step
                # (stop/ckpt_every are deterministic and agreement-
                # gated), so _save's collective gather is safe; only the
                # lead writes.  Epoch ep is NOT finished: store ep-1 so
                # the payload's `epoch` field (completed epochs, which
                # doubles as the resume start epoch for progress-unaware
                # consumers — finetune, torch export, the plot layer)
                # stays truthful; those consumers restart epoch ep from
                # batch 0 instead of silently skipping its untrained
                # remainder.  The worker's own resume uses
                # extra.progress for the exact (epoch, batch) point.
                _save(curr_name, st, ep - 1, best_score,
                      progress={"epoch": ep, "next_batch": done})
            if stop:
                interrupted["at"] = done
            return stop

        return hook

    epoch = start_epoch - 1
    if budget_spent:
        log.info(f"max_steps={max_steps} already reached at resume "
                 f"(epoch {start_epoch}, batch {start_batch}); nothing to "
                 "train")
        if start_batch:
            # Report the same stopping point the budget-hitting run did.
            epoch = start_epoch
            interrupted["at"] = start_batch
    shutdown = GracefulShutdown()
    shutdown.__enter__()
    try:
        for epoch in range(start_epoch,
                           start_epoch if budget_spent else cfg.epochs):
            epoch_time = time.time()
            profiling = profile_dir is not None and epoch in profile_epochs
            if profiling:
                jax.profiler.start_trace(str(profile_dir))
            try:
                state = train_epoch(state, train_pipe, epoch, train_step,
                                    t_metrics,
                                    progress=not getattr(cfg, "parallel",
                                                         False),
                                    tail_step=tail_step,
                                    start_batch=(start_batch
                                                 if epoch == start_epoch
                                                 else 0),
                                    step_hook=(make_step_hook(epoch)
                                               if hooks_on else None))
            finally:
                # Stop even when a step raises: an unterminated trace is
                # lost AND poisons any later start_trace in this process.
                if profiling:
                    jax.profiler.stop_trace()
                    log.info(f"Profiler trace for epoch {epoch} written "
                             f"to {profile_dir}")
            train_time = time.time() - epoch_time

            if interrupted["at"] is not None:
                # The step hook already wrote the mid-epoch _curr (with
                # extra.progress); validation/epoch-end checkpointing
                # belong to completed epochs only.
                log.info(
                    f"stopped mid-epoch at epoch {epoch} after batch "
                    f"{interrupted['at']}/{nb_train} "
                    f"(resume from {cfg.name}_curr.pth retraces the run "
                    "bitwise)")
                break

            # opt.ema: validation, γ model selection and the *best*
            # checkpoint all use the smoothed weights (the deployable
            # artifact); _curr keeps the raw params + opt_state so
            # resume stays bitwise-exact.
            eval_state = state
            if ema_on:
                ema_params = extract_ema(state.opt_state)
                if ema_params is not None:
                    if zero1:
                        # ZeRO-1 shards the EMA shadow over the data
                        # axis with the rest of the optimizer state;
                        # eval_step's in_shardings pin params
                        # replicated, so re-place the shadow (one
                        # all-gather over ICI) before validation.
                        # _reshard, not device_put: shadow shards may
                        # live on other processes' devices.
                        ema_params = _reshard(ema_params,
                                              state_sh.params)
                    eval_state = state.replace(params=ema_params)
            validate(eval_state, val_pipe, epoch, eval_step, v_metrics)
            curr_score = v_metrics["conf_kn"].avg + v_metrics["conf_unk"].avg

            writer.add_scalar("train/loss", t_metrics["j"].avg, epoch)
            writer.add_scalar("val/loss", v_metrics["j"].avg, epoch)
            writer.add_scalar("val/conf_kn", v_metrics["conf_kn"].avg, epoch)
            writer.add_scalar("val/conf_unk", v_metrics["conf_unk"].avg, epoch)
            writer.add_scalar("train/imgs_per_sec", t_metrics["imgs/s"].avg,
                              epoch)
            writer.flush()

            val_time = time.time() - train_time - epoch_time
            log.info(
                f"loss:{cfg.loss.type} protocol:{cfg.protocol} ep:{epoch} "
                f"train:{dict(t_metrics)} val:{dict(v_metrics)} "
                f"t:{train_time:.1f}s v:{val_time:.1f}s")

            # _save on every rank: curr_score is identical across ranks
            # (global-batch validation), so all ranks agree on whether a
            # _best follows; the collective gather inside _save needs
            # them all, and only the lead writes.
            _save(curr_name, state, epoch, curr_score)
            if curr_score > best_score:
                best_score = curr_score
                ckpt_name = str(out_dir / cfg.name) + "_best.pth"
                log.info(f"Saving best model {ckpt_name} at epoch: {epoch}")
                _save(ckpt_name, eval_state, epoch, best_score)

            if early_stopping is not None:
                early_stopping(metrics=curr_score, loss=False)
                if early_stopping.early_stop:
                    log.info("early stop")
                    break

            if _agree(shutdown.requested):
                log.info(f"shutdown requested; stopped cleanly after epoch "
                         f"{epoch} (resume from {cfg.name}_curr.pth)")
                break
            if budget_done["hit"]:
                log.info(f"max_steps={max_steps} reached at the epoch "
                         f"{epoch} boundary")
                break

    finally:
        # Restore signal handlers and release pipeline threads /
        # flush the scalar record even when an epoch raises.
        shutdown.__exit__()
        train_pipe.close()
        val_pipe.close()
        writer.close()
        if ckpt_writer is not None:
            # Drain pending checkpoint writes (and surface any writer
            # error) before worker() returns — callers may read _curr
            # immediately after.  Chains onto an in-flight exception via
            # __context__ rather than hiding it.
            ckpt_writer.close()
    log.info("Training finished")
    return {"best_score": best_score, "last_epoch": epoch,
            "n_classes": n_classes,
            "stopped_mid_epoch": interrupted["at"],
            "device_ids": [d.id for d in mesh.devices.flat]}
