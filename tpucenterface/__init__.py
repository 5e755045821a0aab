"""tpucenterface — TPU-native lightweight CenterNet face detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
``nvlong21/Lightweight-face-detection-CenterNet`` (see SURVEY.md):

- NHWC depthwise-separable (MobileNetV2-class) backbone compiled for the MXU
- FPN-lite neck recovering a stride-4 feature map
- CenterNet heads: heatmap (1ch) / wh (2ch) / offset (2ch) [+ optional landmarks]
- Fused device-side decode: sigmoid -> 3x3 maxpool pseudo-NMS -> top-k -> gather
- Device-side letterbox preprocess (no host round trips on the hot path)
- Data-parallel sharding over a `jax.sharding.Mesh`, double-buffered prefetch
- WIDER FACE evaluation (Easy/Medium/Hard AP) with flip + multi-scale TTA

NOTE: /root/reference was an empty mount in every session so far (SURVEY.md §0),
so architecture constants that normally would be cited file:line from the
reference are tagged UNVERIFIED-vs-reference in `config.py` and centralized
there for one-stop correction once the reference tree materializes.
"""

def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt out: TPUCF_NO_COMPILE_CACHE=1).

    Measured through the axon relay: second-process Detector() init drops
    90s -> 34s and per-program compiles ~30%. Respects an existing user
    setting (JAX_COMPILATION_CACHE_DIR / prior jax.config.update)."""
    import os

    if os.environ.get("TPUCF_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            cache = os.path.join(
                os.path.expanduser("~"), ".cache", "tpucenterface", "jax_cache"
            )
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never block import on cache plumbing
        pass


_enable_compilation_cache()

from tpucenterface.config import (
    DecodeConfig,
    DetectorConfig,
    ModelConfig,
    PreprocessConfig,
)
from tpucenterface.detector import Detector

__version__ = "0.1.0"

__all__ = [
    "Detector",
    "ModelConfig",
    "DecodeConfig",
    "PreprocessConfig",
    "DetectorConfig",
]
