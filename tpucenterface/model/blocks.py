"""Building blocks: Conv+BN+ReLU6 and the MobileNetV2 inverted residual.

TPU-first notes:
- NHWC everywhere; XLA maps 1x1 convs and the pointwise halves of separable
  convs straight onto the MXU; 3x3 depthwise runs on the VPU.
- Convolutions compute in `compute_dtype` (bf16 by default) with f32 params;
  BatchNorm statistics and affine run in f32 for numerical safety.

Mirrors the capability of the reference's `conv_bn`/`conv_dw`/`InvertedResidual`
(SURVEY.md §2 C1 [K]; reference tree unavailable, see config.py header).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


def _act(relu6: bool) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return (lambda x: jnp.minimum(jnp.maximum(x, 0.0), 6.0)) if relu6 else nn.relu


class ConvBN(nn.Module):
    """Conv -> BatchNorm -> (optional) ReLU6, NHWC.

    `folded=True` is the inference hot path: BN is pre-folded into the conv
    kernel/bias (see weights.fold), so the layer is a single bf16 conv with a
    fused activation epilogue. The unfolded path materializes f32 BN between
    convs — at stride-4 bs32 that is ~0.5GB of HBM traffic per layer, the
    measured dominant cost of the forward pass; keep it for training only.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    relu6: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: jnp.dtype = jnp.bfloat16
    folded: bool = False
    # Optional explicit ((top,bottom),(left,right)) padding override; None
    # keeps the symmetric torch-parity default below.
    padding: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # torch-parity: explicit symmetric padding (k-1)//2, matching
        # torch.nn.Conv2d(padding=(k-1)//2). flax 'SAME' pads (0,1) for
        # stride-2 even inputs, which would misalign ported torch weights.
        p = (self.kernel - 1) // 2
        x = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.padding if self.padding is not None else ((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=self.folded,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.folded:
            if self.act:
                x = _act(self.relu6)(x)
            return x.astype(self.dtype)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_eps,
            dtype=jnp.float32,
            name="bn",
        )(x.astype(jnp.float32))
        if self.act:
            x = _act(self.relu6)(x)
        return x.astype(self.dtype)


class InvertedResidual(nn.Module):
    """MobileNetV2 block: 1x1 expand -> 3x3 depthwise -> 1x1 project (+skip)."""

    features: int
    stride: int
    expand: int
    relu6: bool = True
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9
    dtype: jnp.dtype = jnp.bfloat16
    folded: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        use_skip = self.stride == 1 and in_ch == self.features
        y = x
        kw = dict(
            relu6=self.relu6,
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            dtype=self.dtype,
            folded=self.folded,
        )
        if self.expand != 1:
            y = ConvBN(hidden, kernel=1, name="expand", **kw)(y, train)
        y = ConvBN(
            hidden, kernel=3, stride=self.stride, groups=hidden, name="depthwise", **kw
        )(y, train)
        y = ConvBN(self.features, kernel=1, act=False, name="project", **kw)(y, train)
        if use_skip:
            y = y + x
        return y
