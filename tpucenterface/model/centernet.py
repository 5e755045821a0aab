"""Full detector network: backbone -> neck -> heads (SURVEY.md §1 L2).

`init_model` builds params + batch_stats; `CenterFaceNet.__call__` maps a
normalized NHWC image batch to {'hm','wh','off'[,'lm']} stride-4 maps (f32).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpucenterface.config import ModelConfig
from tpucenterface.model.backbone import MobileNetV2Backbone
from tpucenterface.model.heads import CenterNetHeads
from tpucenterface.model.neck import FPNLiteNeck


class CenterFaceNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Dict[str, jnp.ndarray]:
        feats = MobileNetV2Backbone(self.cfg, name="backbone")(x, train)
        y = FPNLiteNeck(self.cfg, name="neck")(feats, train)
        return CenterNetHeads(self.cfg, name="heads")(y)


def init_model(
    cfg: ModelConfig,
    rng: jax.Array | None = None,
    input_size: int = 320,
) -> Tuple[CenterFaceNet, Dict[str, Any]]:
    """Initialize the network; returns (module, variables{params,batch_stats})."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    model = CenterFaceNet(cfg)
    dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    # jit the init: unjitted flax init dispatches every layer's op
    # individually, which costs ~hundreds of device round-trips (measured
    # ~10 min through the axon relay); one compiled program is seconds.
    variables = jax.jit(lambda r: model.init(r, dummy, train=False))(rng)
    return model, variables
