"""Import reference (PyTorch) checkpoints into this framework.

The reference saves ``torch.save({'model_state_dict': ...})`` files whose
keys follow torchvision's ResNet naming under a ``resnet_base.`` prefix
plus the extra ``logits`` head (reference ``model.py:5-39``,
``train.py:37-60``); pre-trained models for all protocols are published
that way (reference ``readme.md:33``).  This module maps those tensors onto
this framework's flax tree so a reference user can evaluate/serve/finetune
an existing model here without retraining.

torch is needed only to *read* ``.pth`` files (CPU, lazy import); the
mapping itself is pure numpy.  DDP's ``module.`` prefix is stripped like
the reference loader does (reference ``train.py:80-87``).

Key mapping (flax path -> torch key):
  conv_init/kernel                  resnet_base.conv1.weight  (OIHW->HWIO)
  bn_init.{scale,bias,mean,var}     resnet_base.bn1.*
  stage{i}_block{j}/Conv_{k}        resnet_base.layer{i}.{j-1}.conv{k+1}
  stage{i}_block{j}/bn{k}           resnet_base.layer{i}.{j-1}.bn{k}
  .../downsample_conv, downsample_bn  ....downsample.0 / .1
  fc/{kernel,bias}                  resnet_base.fc.*          (transposed)
  logits/{kernel,bias}              logits.*                  (transposed)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _strip_module_prefix(state_dict: Dict[str, np.ndarray]):
    """Remove a DDP 'module.' prefix (reference train.py:80-87)."""
    if state_dict and next(iter(state_dict)).startswith("module."):
        return {k[len("module."):]: v for k, v in state_dict.items()}
    return state_dict


def _conv_kernel(t: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(t, (2, 3, 1, 0))


def _dense_kernel(t: np.ndarray) -> np.ndarray:
    """torch [out, in] -> flax [in, out]."""
    return np.transpose(t, (1, 0))


# flax BN variable names -> torch BatchNorm state-dict suffixes.
_BN_STAT = {"scale": "weight", "bias": "bias",
            "mean": "running_mean", "var": "running_var"}


def _torch_key(flax_path) -> str:
    """Torch state-dict key for one flax parameter path."""
    parts = list(flax_path)
    leaf = parts[-1]
    if parts[0] == "conv_init":
        return "resnet_base.conv1.weight"
    if parts[0] == "bn_init":
        return f"resnet_base.bn1.{_BN_STAT[leaf]}"
    if parts[0] in ("fc", "logits"):
        prefix = "resnet_base.fc" if parts[0] == "fc" else "logits"
        return f"{prefix}.{'weight' if leaf == 'kernel' else 'bias'}"
    if parts[0].startswith("stage"):
        stage = int(parts[0][5:parts[0].index("_")])
        block = int(parts[0].split("block")[1]) - 1
        mod = parts[1]
        if mod.startswith("Conv_"):
            sub = f"conv{int(mod[5:]) + 1}.weight"
        elif mod == "downsample_conv":
            sub = "downsample.0.weight"
        elif mod == "downsample_bn":
            sub = f"downsample.1.{_BN_STAT[leaf]}"
        elif mod.startswith("bn"):
            sub = f"{mod}.{_BN_STAT[leaf]}"
        else:
            raise KeyError(f"unmapped flax module {flax_path}")
        return f"resnet_base.layer{stage}.{block}.{sub}"
    raise KeyError(f"unmapped flax path {flax_path}")


def torch_state_dict_to_variables(state_dict, template_variables):
    """Fill a flax ``{'params', 'batch_stats'}`` tree from torch tensors.

    Args:
        state_dict: ``{torch_key: array-like}`` (torch tensors or numpy).
        template_variables: variables from ``model.init`` providing the
            target tree structure and shapes (e.g. a two-head ResNet-50).

    Returns:
        New variables dict with every leaf replaced by the mapped tensor.
    Raises:
        KeyError on missing torch keys; ValueError on shape mismatch.
    """
    import jax

    state_dict = _strip_module_prefix(
        {k: np.asarray(v) for k, v in state_dict.items()})

    flat = {}
    for coll in ("params", "batch_stats"):
        leaves = jax.tree_util.tree_flatten_with_path(
            template_variables[coll])[0]
        for path, leaf in leaves:
            keys = tuple(getattr(p, "key", getattr(p, "name", p))
                         for p in path)
            tkey = _torch_key(keys)
            if tkey not in state_dict:
                raise KeyError(f"torch checkpoint is missing {tkey} "
                               f"(for flax {'/'.join(map(str, keys))})")
            t = state_dict[tkey]
            if keys[-1] == "kernel":
                t = _conv_kernel(t) if t.ndim == 4 else _dense_kernel(t)
            if t.shape != leaf.shape:
                raise ValueError(
                    f"{tkey}: shape {t.shape} != expected {leaf.shape}")
            # leaf may be a concrete array or a ShapeDtypeStruct template.
            flat[(coll, keys)] = t.astype(
                getattr(leaf, "dtype", np.float32))

    def rebuild(coll):
        def visit(path, leaf):
            keys = tuple(getattr(p, "key", getattr(p, "name", p))
                         for p in path)
            return flat[(coll, keys)]
        return jax.tree_util.tree_map_with_path(
            visit, template_variables[coll])

    return {"params": rebuild("params"),
            "batch_stats": rebuild("batch_stats")}


def variables_to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax variables -> reference-style torch keys.

    Lets models trained here be exported back into the reference
    implementation's checkpoint layout (numpy values; wrap with
    ``torch.from_numpy`` + ``torch.save`` to produce a ``.pth``).
    """
    import jax

    out: Dict[str, np.ndarray] = {}
    for coll in ("params", "batch_stats"):
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                variables[coll])[0]:
            keys = tuple(getattr(p, "key", getattr(p, "name", p))
                         for p in path)
            t = np.asarray(leaf, dtype=np.float32)
            if keys[-1] == "kernel":
                t = (np.transpose(t, (3, 2, 0, 1)) if t.ndim == 4
                     else np.transpose(t, (1, 0)))
            out[_torch_key(keys)] = t
    return out


def save_reference_checkpoint(path, state, epoch: int, best_score: float,
                              lr: float = 1e-3):
    """Write a torch ``.pth`` the reference implementation can load.

    Both of the reference's load paths work: evaluation (weights only) and
    ``--continue-training`` resume — torch's ``Optimizer.load_state_dict``
    needs a structurally valid ``opt_state_dict`` (one param group covering
    every trainable tensor; empty per-param state restarts Adam moments),
    not the empty dict (which raises ``KeyError('param_groups')``).
    ``lr`` seeds the exported param group (reference default
    ``config/train.yaml`` Adam 1e-3).
    """
    import torch

    # .copy(): jax buffers surface as non-writable numpy views, which torch
    # tensors cannot wrap safely.
    tdict = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in
             variables_to_torch_state_dict(
                 {"params": state.params,
                  "batch_stats": state.batch_stats}).items()}
    n_trainable = sum(1 for k in tdict
                      if not k.endswith(("running_mean", "running_var",
                                         "num_batches_tracked")))
    opt_state = {"state": {},
                 "param_groups": [{"params": list(range(n_trainable)),
                                   "lr": float(lr), "betas": (0.9, 0.999),
                                   "eps": 1e-8, "weight_decay": 0,
                                   "amsgrad": False}]}
    torch.save({"model_state_dict": tdict, "epoch": int(epoch) + 1,
                "opt_state_dict": opt_state,
                "best_score": float(best_score)},
               path)


def load_reference_checkpoint(path, model, image_size: int = 224):
    """Load a reference ``.pth`` (torch) checkpoint into flax variables.

    Args:
        path: reference checkpoint file
            (``{'model_state_dict': ..., 'epoch': ..., 'best_score': ...}``,
            reference ``train.py:37-60``).
        model: a :class:`~openset_imagenet_tpu.models.resnet.ResNet50` with
            matching ``fc_layer_dim``/``out_features``.
        image_size: input size used only to shape the template init.

    Returns:
        ``(variables, epoch, best_score)``.
    """
    import torch  # lazy: only needed to deserialise the torch pickle

    import jax
    import jax.numpy as jnp

    # weights_only: the reference payload is a plain dict of tensors and
    # scalars; never execute pickle code from a downloaded checkpoint.
    payload = torch.load(path, map_location="cpu", weights_only=True)
    state_dict = {k: v.numpy() for k, v in
                  payload["model_state_dict"].items()}
    template = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 3), jnp.float32))
    variables = torch_state_dict_to_variables(state_dict, template)
    return (variables, int(payload.get("epoch", 0)),
            float(payload.get("best_score", 0.0)))
