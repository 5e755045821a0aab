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

import jax
import jax.numpy as jnp
from flax import linen as nn


def _act(relu6: bool) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return (lambda x: jnp.minimum(jnp.maximum(x, 0.0), 6.0)) if relu6 else nn.relu


class MatmulConv1x1(nn.Module):
    """1x1 convolution lowered as reshape -> dot_general -> reshape.

    Param-compatible with nn.Conv (kernel (1,1,Cin,Cout), optional bias).
    Hypothesis: avoid XLA:TPU's conv emitters, which at small batch pick
    batch-in-lanes layouts ("EmitOutputBatchInLanes") filling only B/128 of
    the vector lanes (profiled at bs32 @640: block_0's 32->16 projection
    costs 2.37ms as a conv, 10x its HBM floor).

    MEASURED REFUTED end-to-end (13.0 -> 32.2ms forward): XLA's layout
    assignment keeps conv-friendly batch-minor layouts between ops, so each
    reshape inserts a full relayout copy that costs more than the emitter
    waste it avoids. Default-off ledger entry (ConvBN.as_matmul); see
    PERFORMANCE.md round-2 findings.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    bias_init: Callable = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, cin, self.features),
            self.param_dtype,
        )
        b, h, w, _ = x.shape
        y = jax.lax.dot_general(
            x.reshape(b * h * w, cin).astype(self.dtype),
            kernel[0, 0].astype(self.dtype),
            (((1,), (0,)), ((), ())),
        )
        if self.use_bias:
            bias = self.param(
                "bias",
                self.bias_init or nn.initializers.zeros_init(),
                (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(self.dtype)
        return y.reshape(b, h, w, self.features)


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
    # BatchNorm materialization dtype (training path); stats stay f32 inside
    # flax regardless. See ModelConfig.bn_compute_dtype.
    bn_dtype: jnp.dtype = jnp.float32
    # Optional explicit ((top,bottom),(left,right)) padding override; None
    # keeps the symmetric torch-parity default below.
    padding: object = None
    # Lower 1x1 convs as reshape+matmul instead of convolution. Measured
    # SLOWER end-to-end (relayout copies dominate); default off.
    as_matmul: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # torch-parity: explicit symmetric padding (k-1)//2, matching
        # torch.nn.Conv2d(padding=(k-1)//2). flax 'SAME' pads (0,1) for
        # stride-2 even inputs, which would misalign ported torch weights.
        p = (self.kernel - 1) // 2
        if self.as_matmul and self.kernel == 1 and self.stride == 1 and self.groups == 1:
            # 1x1 convs lowered as matmuls. MEASURED SLOWER end-to-end
            # (13.0 -> 32.2ms forward at bs32@640): each reshape forces a
            # relayout copy between XLA's batch-in-lanes conv layouts and the
            # matmul's row-major layout, costing more than the conv saved.
            # Kept as a measured-off option (see MatmulConv1x1 docstring).
            x = MatmulConv1x1(
                features=self.features,
                use_bias=self.folded,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=(self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding=self.padding
                if self.padding is not None
                else ((p, p), (p, p)),
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
            dtype=self.bn_dtype,
            name="bn",
        )(x.astype(self.bn_dtype))
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
    bn_dtype: jnp.dtype = jnp.float32

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
            bn_dtype=self.bn_dtype,
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
