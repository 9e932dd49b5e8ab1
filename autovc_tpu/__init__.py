"""autovc_tpu — a TPU-native (JAX/XLA/Pallas) voice-conversion framework.

Re-implements the full capability surface of the reference AutoVC package
(mel front-ends, GE2E speaker encoder, AutoVC autoencoder, WaveRNN vocoder,
training, conversion, CLI) with a TPU-first architecture: functional models
as pytrees, ``lax.scan`` recurrences, pjit-sharded steps over an explicit
device mesh, and Pallas kernels on the hot paths.
"""
from autovc_tpu.audio import Audio
from autovc_tpu.config import ConverterConfig

__version__ = "0.1.0"
__all__ = ["Audio", "ConverterConfig", "__version__"]


def __getattr__(name):
    # Lazy import: VoiceConverter pulls in jax/models; keep `import autovc_tpu`
    # light for host-side-only uses (mirrors reference autovc/__init__.py:1-4).
    if name == "VoiceConverter":
        from autovc_tpu.voice_converter import VoiceConverter
        return VoiceConverter
    raise AttributeError(name)
