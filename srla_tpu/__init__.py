"""srla_tpu — TPU-native lossless audio codec, bit-compatible with SRLA .srl.

Layers:
  - constants/format/bitio/huffman/rice/fletcher: stream format
  - dsp/: analysis & filter math (host-exact f64 reference + batched int paths)
  - encoder/decoder: block pipelines (batched over blocks)
  - kernels/: JAX/Pallas TPU fast paths
  - cli: `srla`-compatible command line tool
"""

from .decoder import decode
from .encoder import encode

__all__ = ["encode", "decode"]
__version__ = "0.1.0"
