"""sprintz_tpu: a TPU-native lossless time-series compression framework.

A from-scratch JAX/XLA/Pallas re-design of the Sprintz codec family
(predict -> zigzag -> bitpack -> run-length -> entropy-code) for
multivariate u8/u16 integer streams, with a byte-compatible stream format,
data-parallel multi-chip encode/decode, query pushdown, and an entropy
stage.

Layers:
- ``sprintz_tpu.golden``   bit-exact scalar reference codec (executable spec)
- ``sprintz_tpu.ops``      vectorized JAX/XLA + Pallas kernels
- ``sprintz_tpu.models``   forecaster state machines (delta family, FIRE, ...)
- ``sprintz_tpu.parallel`` mesh/shard_map distributed encode/decode
- ``sprintz_tpu.entropy``  Huffman entropy stage
- ``sprintz_tpu.query``    fused decode+reduce query pushdown
- ``sprintz_tpu.data``     corpus loaders and quantizers
"""

from . import config as config  # noqa: F401  (validates SPRINTZ_* env at import)
from .api import CorruptStreamError, SprintzCodec, compress, decompress  # noqa: F401
from .constants import CodecConfig, DEFAULT_CONFIG  # noqa: F401

__version__ = "0.1.0"
