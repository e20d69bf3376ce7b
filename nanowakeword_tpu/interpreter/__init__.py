"""Inference runtime package.

Re-exports the security API like the reference
(`/root/reference/nanowakeword/interpreter/__init__.py:1-17`).
"""

from nanowakeword_tpu.interpreter.nanointerpreter import (  # noqa: F401
    DetectionResult, NanoInterpreter)
from nanowakeword_tpu.interpreter.server_security import (  # noqa: F401
    SecurityConfig, SecurityManager, build_security)
from nanowakeword_tpu.interpreter.vad import VAD  # noqa: F401

__all__ = ["NanoInterpreter", "DetectionResult", "VAD", "SecurityConfig",
           "SecurityManager", "build_security"]
