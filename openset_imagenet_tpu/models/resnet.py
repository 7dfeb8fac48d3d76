"""ResNet-50 with a two-head (deep-features + logits) output, in Flax.

Functional parity with the reference model (``model.py:5-39``): a standard
ResNet-50 backbone whose final fully-connected layer is replaced by
``Linear(2048 -> fc_layer_dim)`` (the "deep features" head), followed by a
second ``Linear(fc_layer_dim -> out_features, use_bias=logit_bias)`` logits
head; ``__call__`` returns ``(logits, features)``.  Training uses
``fc_layer_dim == out_features == n_classes`` and ``logit_bias=False``
(reference ``train.py:350-353``).

TPU-first design choices (deliberately NOT a torch translation):

* **NHWC layout** — the native layout for TPU convolutions.
* **bfloat16 compute, float32 parameters/statistics** — convolutions run on
  the MXU in bf16; parameter updates and batch-norm statistics stay in f32.
* **ResNet v1.5 bottleneck** (stride on the 3x3 convolution), matching the
  torchvision architecture the reference instantiates, so checkpoints and
  accuracy are comparable.
* Under ``pjit`` with a batch-sharded input, the batch-norm reductions are
  global-batch reductions — XLA inserts the cross-device collectives, which
  supersedes both torch's per-device BN and SyncBN.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

ModuleDef = Any

# Batch-norm hyperparameters (reference torchvision defaults); single
# source for both the unfused norm partials and the fused-block BNAffine.
BN_MOMENTUM = 0.9
BN_EPSILON = 1e-5

# Kaiming-normal fan-out (matches torch's conv init for ResNets).
conv_kernel_init = nn.initializers.variance_scaling(
    2.0, mode="fan_out", distribution="truncated_normal")
# torch Linear default: kaiming-uniform(a=sqrt(5)) == U(±sqrt(1/fan_in)).
dense_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, mode="fan_in", distribution="uniform")


def _identity_norm(*, name=None, scale_init=None):
    """Norm slot for the folded inference graph (``ResNet50.folded``).

    Batch-norm is an affine map at inference (running statistics), so the
    fold transform (:mod:`openset_imagenet_tpu.optimize`) absorbs it into
    the preceding convolution's kernel + bias and this slot becomes the
    identity.  Creates no parameters; accepts (and ignores) the keyword
    arguments the real norm constructors take.
    """
    del name, scale_init
    return lambda y: y


class SpaceToDepthStem(nn.Module):
    """7x7/2 stem conv computed in space-to-depth form (TPU MXU-friendly).

    The standard ResNet stem convolves 3 input channels — wasting most of
    the MXU's contraction lanes.  Packing 2x2 pixel blocks into channels
    ([B,224,224,3] -> [B,112,112,12]) turns the 7x7-stride-2 conv into an
    arithmetically *identical* 4x4-stride-1 conv over 12 channels (the
    MLPerf TPU ResNet trick).  The parameter is kept in the original
    ``kernel: [7, 7, 3, width]`` layout, so checkpoints are interchangeable
    with the plain ``nn.Conv`` stem; the 4x4 packed kernel is rebuilt from
    it inside the step (a few-KB gather XLA folds away).

    Derivation: output tap ``dy in [0, 7)`` maps to packed kernel position
    ``ky = (dy + 1) // 2`` with sub-pixel ``u = (dy + 1) % 2`` (i.e.
    ``dy = 2 ky - 1 + u``); position ``(ky=0, u=0)`` falls outside and is
    zero.  The packed conv uses stride 1 with asymmetric padding (2, 1).
    """

    features: int = 64
    dtype: Any = jnp.bfloat16
    # Bias term (used by the folded inference graph, where the stem BN is
    # absorbed into this convolution).
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", conv_kernel_init,
                            (7, 7, 3, self.features), jnp.float32)
        b, h, w, c = x.shape
        # Pack 2x2 spatial blocks into channels: [B,H/2,W/2,4c].
        x2 = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x2 = x2.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2,
                                                    4 * c)
        # Pack the kernel the same way: [4,4,4c,F], zero where dy/dx = -1.
        k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # dy+1, dx+1
        k = k.reshape(4, 2, 4, 2, c, self.features)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(
            4, 4, 4 * c, self.features)
        y = jax.lax.conv_general_dilated(
            x2.astype(self.dtype), k.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class Conv1x1(nn.Module):
    """1x1 convolution lowered as an explicit MXU dot.

    A 1x1 (optionally strided) convolution is exactly a per-pixel matmul;
    emitting it as ``dot_general`` (stride via spatial subsampling first)
    sidesteps XLA's convolution lowering for the 36 pointwise convs of a
    ResNet-50 bottleneck stack.  The parameter keeps ``nn.Conv``'s
    ``kernel: [1, 1, in, out]`` shape and the module is given the same
    auto-name slot, so checkpoints are interchangeable with the conv form.
    """

    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", conv_kernel_init,
                            (1, 1, x.shape[-1], self.features), jnp.float32)
        if self.strides != 1:
            x = x[:, ::self.strides, ::self.strides, :]
        return jax.lax.dot_general(
            x.astype(self.dtype), kernel[0, 0].astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=self.dtype)


class BasicBlock(nn.Module):
    """ResNet basic block (3x3 -> 3x3, expansion 1) for the 18/34 variants."""

    filters: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.bfloat16
    expansion: int = 1
    # Save the boundary ReLU gate as int8 (experimental/fused_block.masked_add_relu)
    # instead of letting autodiff re-read the bf16 pre-sum in backward.
    boundary_mask: bool = False
    # Folded inference graph: convs carry the BN's affine map as a bias
    # (the norm slots are identity; see optimize.fold_batchnorm).
    folded: bool = False
    # Int8 PTQ graph: convs are QuantConv (implies folded; see
    # optimize.quantize_inference).
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        if self.quantized:
            from .quant import QuantConv
            conv = partial(QuantConv, dtype=self.dtype)
            # QuantConv must occupy nn.Conv's auto-name slots (flax
            # auto-names are per-class), so name them explicitly.
            slot = lambda i: {"name": f"Conv_{i}"}
        else:
            conv = partial(nn.Conv, use_bias=self.folded, dtype=self.dtype,
                           kernel_init=conv_kernel_init)
            slot = lambda i: {}
        residual = x
        # Explicit (1,1) padding: torch's Conv2d(3, stride, padding=1).
        # Flax's default "SAME" pads (0,1) at stride 2 — a subtle
        # misalignment vs the reference torchvision blocks.
        y = checkpoint_name(
            conv(self.filters, (3, 3),
                 strides=(self.strides, self.strides),
                 padding=[(1, 1), (1, 1)], **slot(0))(x), "conv_out")
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = checkpoint_name(
            conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)],
                 **slot(1))(y),
            "conv_out")
        y = self.norm(scale_init=nn.initializers.zeros, name="bn2")(y)

        if residual.shape != y.shape:
            residual = checkpoint_name(
                conv(self.filters, (1, 1),
                     strides=(self.strides, self.strides),
                     name="downsample_conv")(residual), "conv_out")
            residual = self.norm(name="downsample_bn")(residual)

        if self.boundary_mask:
            from ..experimental.fused_block import masked_add_relu
            return masked_add_relu(y, residual)
        return nn.relu(y + residual)


class _ConvKernel(nn.Module):
    """Kernel-parameter holder occupying a ``nn.Conv``-compatible name slot.

    Declares the same ``kernel`` parameter (same shape/init/dtype) that
    ``nn.Conv`` would, but returns the array itself so the fused-backward
    block can route it through its custom-VJP op.  Checkpoint trees stay
    interchangeable with the unfused block.
    """

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.shape,
                          jnp.float32)


class Bottleneck(nn.Module):
    """ResNet v1.5 bottleneck block: 1x1 -> 3x3(stride) -> 1x1, expansion 4.

    ``groups``/``base_width`` follow torchvision's Bottleneck semantics —
    the inner width is ``int(filters * base_width / 64) * groups`` and the
    3x3 convolution is grouped — enabling the ResNeXt (groups=32,
    base_width=4|8) and Wide-ResNet (base_width=128) families.  The
    reference instantiates only the standard resnet50 (reference
    ``model.py:11``); these are capability extensions sharing the same
    two-head contract and checkpoint key layout.
    """

    filters: int
    strides: int = 1
    norm: ModuleDef = nn.BatchNorm
    dtype: Any = jnp.bfloat16
    groups: int = 1
    base_width: int = 64
    dot_1x1: bool = False
    # Fused-backward mode (experimental/fused_block.py): one custom-VJP per block,
    # Pallas kernels for the pointwise-conv backward regions.  Requires
    # ghost BN statistics (stats_rows > 0) when training.
    fused: bool = False
    train: bool = True
    stats_rows: int = 0
    bn_momentum: float = BN_MOMENTUM
    bn_epsilon: float = BN_EPSILON
    # Save the boundary ReLU gate as int8 (see BasicBlock.boundary_mask).
    boundary_mask: bool = False
    # Folded inference graph (see BasicBlock.folded).
    folded: bool = False
    # Int8 PTQ graph (see BasicBlock.quantized).
    quantized: bool = False

    def _fused_call(self, x):
        from ..experimental.fused_block import (_affine, _conv3x3, _pw,
                                       bottleneck_fused, ghost_stats)
        from .norm import BNAffine

        dt = self.dtype
        cin = x.shape[-1]
        f = self.filters
        s = self.strides
        need_ds = (s != 1 or cin != 4 * f)
        x = x.astype(dt)

        w1 = _ConvKernel((1, 1, cin, f), name="Conv_0")()[0, 0]
        w2 = _ConvKernel((3, 3, f, f), name="Conv_1")()
        w3 = _ConvKernel((1, 1, f, 4 * f), name="Conv_2")()[0, 0]
        bn = partial(BNAffine, use_running_average=not self.train,
                     momentum=self.bn_momentum, epsilon=self.bn_epsilon)
        bn1 = bn(f, name="bn1")
        bn2 = bn(f, name="bn2")
        bn3 = bn(4 * f, scale_init=nn.initializers.zeros, name="bn3")
        wd = muld = addd = None
        if need_ds:
            wd = _ConvKernel((1, 1, cin, 4 * f), name="downsample_conv")(
            )[0, 0]
            bnd = bn(4 * f, name="downsample_bn")

        if self.train:
            if self.stats_rows <= 0:
                raise ValueError(
                    "fused bottleneck training requires ghost BN "
                    "(model.bn_stats_rows > 0); full-batch statistics "
                    "would double the forward pass")
            # Ghost pre-pass: the block forward on the leading statistics
            # rows only, folding each BN as soon as its stats exist.  Rows
            # are batch-independent, so these equal the full forward's
            # leading-row slices (SubsetBatchNorm semantics).
            g = self.stats_rows
            xs = x[:g]
            z1s = _pw(xs, w1.astype(dt))
            mul1, add1 = bn1(*ghost_stats(z1s))
            xa1s = jnp.maximum(_affine(z1s, mul1, add1), 0)
            z2s = _conv3x3(xa1s, w2.astype(dt), s)
            mul2, add2 = bn2(*ghost_stats(z2s))
            xa2s = jnp.maximum(_affine(z2s, mul2, add2), 0)
            z3s = _pw(xa2s, w3.astype(dt))
            mul3, add3 = bn3(*ghost_stats(z3s))
            if need_ds:
                zds = _pw(xs[:, ::s, ::s, :], wd.astype(dt))
                muld, addd = bnd(*ghost_stats(zds))
        else:
            mul1, add1 = bn1()
            mul2, add2 = bn2()
            mul3, add3 = bn3()
            if need_ds:
                muld, addd = bnd()

        return bottleneck_fused(x, w1, w2, w3, mul1, add1, mul2, add2,
                                mul3, add3, wd, muld, addd, stride=s)

    @nn.compact
    def __call__(self, x):
        if self.fused:
            if self.groups != 1 or self.base_width != 64:
                raise ValueError(
                    "fused_blocks supports only the standard bottleneck "
                    "(groups=1, base_width=64)")
            return self._fused_call(x)
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        if self.quantized:
            from .quant import QuantConv
            conv = partial(QuantConv, dtype=self.dtype)
        else:
            conv = partial(nn.Conv, use_bias=self.folded, dtype=self.dtype,
                           kernel_init=conv_kernel_init)
        if self.folded and self.dot_1x1:
            raise ValueError("folded inference is not supported with "
                             "dot_1x1 (Conv1x1 carries no bias slot)")
        if self.dot_1x1:
            # Same auto-name slots (Conv_0/Conv_2) as the nn.Conv form so
            # the parameter tree is unchanged.
            pw = partial(Conv1x1, dtype=self.dtype)
            pw0 = partial(pw, name="Conv_0")
            pw2 = partial(pw, name="Conv_2")
        elif self.quantized:
            # QuantConv must occupy nn.Conv's auto-name slots (flax
            # auto-names are per-class), so name them explicitly.
            pw0 = partial(conv, name="Conv_0")
            pw2 = partial(conv, name="Conv_2")
        else:
            pw = pw0 = pw2 = conv

        def pointwise(make, features, strides=1):
            if make is conv or self.quantized:
                return make(features, (1, 1), strides=(strides, strides))
            return make(features, strides=strides)

        # checkpoint_name marks conv outputs as the block's only saved
        # residuals under the "elementwise" remat policy (ResNet50.remat):
        # backward recomputes BN/relu chains from them instead of re-reading
        # their outputs from HBM.  A no-op outside jax.checkpoint.
        residual = x
        y = checkpoint_name(pointwise(pw0, width)(x), "conv_out")
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = checkpoint_name(
            conv(width, (3, 3),
                 strides=(self.strides, self.strides),
                 # torch's padding=1; flax "SAME" would pad (0,1) at
                 # stride 2 (reference parity, torchvision Bottleneck)
                 padding=[(1, 1), (1, 1)],
                 feature_group_count=self.groups,
                 # keep the auto-name slot stable across all conv forms
                 name="Conv_1" if (self.dot_1x1 or self.quantized)
                 else None)(y), "conv_out")
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = checkpoint_name(pointwise(pw2, self.filters * 4)(y), "conv_out")
        y = self.norm(scale_init=nn.initializers.zeros, name="bn3")(y)

        if residual.shape != y.shape:
            if self.dot_1x1:
                ds = Conv1x1(self.filters * 4, strides=self.strides,
                             dtype=self.dtype, name="downsample_conv")
            else:
                ds = conv(self.filters * 4, (1, 1),
                          strides=(self.strides, self.strides),
                          name="downsample_conv")
            residual = checkpoint_name(ds(residual), "conv_out")
            residual = self.norm(name="downsample_bn")(residual)

        if self.boundary_mask:
            from ..experimental.fused_block import masked_add_relu
            return masked_add_relu(y, residual)
        return nn.relu(y + residual)


class ResNet50(nn.Module):
    """Two-head ResNet-50.  ``__call__(images, train)`` -> ``(logits, features)``.

    Args mirror the reference constructor (``model.py:8-27``):
        fc_layer_dim: dimensionality of the deep-features head.
        out_features: dimensionality of the logits head.
        logit_bias: whether the logits layer has a bias term.
    """

    fc_layer_dim: int = 1000
    out_features: int = 1000
    logit_bias: bool = True
    dtype: Any = jnp.bfloat16
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: ModuleDef = None  # None -> Bottleneck
    width: int = 64  # filters of the first stage
    # torchvision Bottleneck extension knobs: ResNeXt grouped convolutions
    # (groups=32, base_width=4|8) and Wide-ResNet (base_width=128).
    groups: int = 1
    base_width: int = 64
    # > 0: batch-norm statistics from the first N batch rows only (ghost
    # BN; see models/norm.py) — a TPU HBM-bandwidth optimization.
    bn_stats_rows: int = 0
    # Space-to-depth stem: identical arithmetic, MXU-friendlier layout.
    space_to_depth: bool = False
    # Rematerialization of residual blocks.  The train step is HBM-
    # bandwidth-bound on TPU (measured ~833 GB/s sustained, the v5e speed
    # of light), so what backward re-reads from HBM is the cost model:
    #   False / "none":  store every intermediate (XLA default).
    #   "elementwise":   save ONLY conv outputs; backward recomputes the
    #                    BN/relu chains from them (the cuDNN-style training
    #                    layout) — cheap VPU FLOPs for less traffic.
    #   True / "blocks": save only block boundaries; backward re-runs the
    #                    whole block forward (big memory saving, but the
    #                    re-run convs re-write their outputs through HBM —
    #                    measured slower on v5e; use for memory, not speed).
    # All modes are arithmetically identical (tests lock this).
    remat: Any = False
    # Lower 1x1 convolutions as explicit MXU dots (see Conv1x1).
    dot_1x1: bool = False
    # Fused-backward bottleneck blocks (experimental/fused_block.py): block-level
    # custom VJP with Pallas kernels for the pointwise backward regions.
    # Requires bn_stats_rows > 0 for training; Bottleneck variants only.
    fused_blocks: bool = False
    # Residual-boundary ReLU gates saved as int8 (backward reads the 1-byte
    # mask instead of the bf16 pre-sum; experimental/fused_block.masked_add_relu).
    boundary_mask: bool = False
    # Folded inference graph: every batch-norm's running-statistics affine
    # map is absorbed into the preceding convolution's kernel + a bias
    # term (optimize.fold_batchnorm), so the norm slots are identity and
    # batch_stats is empty.  Inference only — there are no statistics to
    # update.  Parameters come from optimize.fold_batchnorm, NOT from a
    # training checkpoint.
    folded: bool = False
    # Int8 PTQ graph (requires folded): block convs are QuantConv
    # (models/quant.py) — int8 MXU matmuls, dequant+bias epilogues.  The
    # stem conv and the two Dense heads stay bf16 (standard first/last-
    # layer exemption; they are a few % of the FLOPs).  Parameters come
    # from optimize.quantize_params, NOT from a training checkpoint.
    quantized: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.quantized and not self.folded:
            raise ValueError("quantized inference requires the folded "
                             "graph (optimize.quantize_model sets both)")
        if self.folded:
            if train:
                raise ValueError("a folded model is inference-only "
                                 "(batch-norm was absorbed into the convs; "
                                 "there are no statistics to train)")
            if self.fused_blocks or self.boundary_mask:
                raise ValueError("folded inference is not supported with "
                                 "fused_blocks/boundary_mask (training "
                                 "experiments)")
            norm = _identity_norm
        elif self.bn_stats_rows > 0:
            from .norm import SubsetBatchNorm
            norm = partial(SubsetBatchNorm, use_running_average=not train,
                           momentum=BN_MOMENTUM, epsilon=BN_EPSILON,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           stats_rows=self.bn_stats_rows)
        else:
            norm = partial(nn.BatchNorm, use_running_average=not train,
                           momentum=BN_MOMENTUM, epsilon=BN_EPSILON,
                           dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        if self.space_to_depth:
            x = SpaceToDepthStem(features=self.width, dtype=self.dtype,
                                 use_bias=self.folded, name="conv_init")(x)
        else:
            x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)],
                        use_bias=self.folded, dtype=self.dtype,
                        kernel_init=conv_kernel_init, name="conv_init")(x)
        x = norm(name="bn_init")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        base_block = self.block if self.block is not None else Bottleneck
        block_cls = base_block
        block_kwargs = {}
        if self.groups != 1 or self.base_width != 64:
            if base_block is not Bottleneck:
                # torchvision raises the same constraint for BasicBlock.
                raise ValueError("groups/base_width require Bottleneck "
                                 "variants (resnext*/wide_resnet*)")
            block_kwargs.update(groups=self.groups,
                                base_width=self.base_width)
        if self.dot_1x1 and base_block is Bottleneck:
            block_kwargs["dot_1x1"] = True
        if self.fused_blocks:
            if base_block is not Bottleneck:
                raise ValueError("fused_blocks requires Bottleneck variants"
                                 " (resnet50/101/152)")
            block_kwargs.update(fused=True, train=train,
                                stats_rows=self.bn_stats_rows,
                                bn_momentum=BN_MOMENTUM,
                                bn_epsilon=BN_EPSILON)
        if self.boundary_mask:
            block_kwargs["boundary_mask"] = True
        if self.folded:
            block_kwargs["folded"] = True
        if self.quantized:
            block_kwargs["quantized"] = True
        mode = {False: "none", None: "none", True: "blocks"}.get(
            self.remat, self.remat)
        if mode == "blocks":
            block_cls = nn.remat(block_cls)
        elif mode == "elementwise":
            block_cls = nn.remat(
                block_cls,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "conv_out"))
        elif mode != "none":
            raise ValueError(f"unknown remat mode {self.remat!r}")
        for i, block_count in enumerate(self.stage_sizes):
            for j in range(block_count):
                strides = 2 if i > 0 and j == 0 else 1
                x = block_cls(filters=self.width * 2 ** i, strides=strides,
                              norm=norm, dtype=self.dtype, **block_kwargs,
                              name=f"stage{i + 1}_block{j + 1}")(x)

        # Global average pool -> deep features head -> logits head.
        x = jnp.mean(x, axis=(1, 2))
        features = nn.Dense(self.fc_layer_dim, dtype=self.dtype,
                            param_dtype=jnp.float32,
                            kernel_init=dense_kernel_init, name="fc")(x)
        logits = nn.Dense(self.out_features, use_bias=self.logit_bias,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          kernel_init=dense_kernel_init, name="logits")(features)
        return logits.astype(jnp.float32), features.astype(jnp.float32)


# Variant registry: stage layout + block per torchvision naming.  The
# reference only instantiates ResNet-50 (reference ``model.py:11``); the other
# depths are capability extensions sharing the same two-head contract.
_VARIANTS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block=BasicBlock),
    "resnet34": dict(stage_sizes=(3, 4, 6, 3), block=BasicBlock),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), block=Bottleneck),
    "resnet101": dict(stage_sizes=(3, 4, 23, 3), block=Bottleneck),
    "resnet152": dict(stage_sizes=(3, 8, 36, 3), block=Bottleneck),
    # ResNeXt / Wide-ResNet families (torchvision constructor parameters).
    "resnext50_32x4d": dict(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                            groups=32, base_width=4),
    "resnext101_32x8d": dict(stage_sizes=(3, 4, 23, 3), block=Bottleneck,
                             groups=32, base_width=8),
    "wide_resnet50_2": dict(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                            base_width=128),
    "wide_resnet101_2": dict(stage_sizes=(3, 4, 23, 3), block=Bottleneck,
                             base_width=128),
    # Tiny variants for tests/CI: one block per stage, narrow.
    "tiny": dict(stage_sizes=(1, 1, 1, 1), block=BasicBlock, width=8),
    "tiny50": dict(stage_sizes=(1, 1, 1, 1), block=Bottleneck, width=8),
    "tinyx": dict(stage_sizes=(1, 1, 1, 1), block=Bottleneck, width=8,
                  groups=4, base_width=32),
}


def build_resnet(variant: str = "resnet50", *, fc_layer_dim: int,
                 out_features: int, logit_bias: bool = False,
                 dtype: Any = jnp.bfloat16, bn_stats_rows: int = 0,
                 space_to_depth: bool = False,
                 remat: Any = False, dot_1x1: bool = False,
                 fused_blocks: bool = False,
                 boundary_mask: bool = False) -> ResNet50:
    """Construct a two-head ResNet by variant name."""
    if variant not in _VARIANTS:
        raise ValueError(
            f"unknown variant {variant!r}; choose from {sorted(_VARIANTS)}")
    spec = _VARIANTS[variant]
    return ResNet50(fc_layer_dim=fc_layer_dim, out_features=out_features,
                    logit_bias=logit_bias, dtype=dtype,
                    stage_sizes=spec["stage_sizes"], block=spec["block"],
                    width=spec.get("width", 64),
                    groups=spec.get("groups", 1),
                    base_width=spec.get("base_width", 64),
                    bn_stats_rows=bn_stats_rows,
                    space_to_depth=space_to_depth, remat=remat,
                    dot_1x1=dot_1x1, fused_blocks=fused_blocks,
                    boundary_mask=boundary_mask)
