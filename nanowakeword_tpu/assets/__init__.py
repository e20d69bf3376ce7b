"""Bundled framework assets.

The reference downloads its pretrained frontend graphs at first use
(`/root/reference/nanowakeword/interpreter/models/_registry.py:34-47`); this
framework ships its pretrained speech-encoder weights with the package (they
are ~700 KB) and trains them with its own recipe
(train/pretrain_encoder.py), so a fresh install needs no network at all.
"""

import os

_DIR = os.path.dirname(os.path.abspath(__file__))

# Pretrained SpeechEmbeddingEncoder variables (flax msgpack) + JSON sidecar
# with the training recipe/eval metadata. Produced by
# `python -m nanowakeword_tpu.train.pretrain_encoder`.
SPEECH_ENCODER_V1 = os.path.join(_DIR, "speech_encoder_v1.msgpack")


def speech_encoder_asset_path():
    """Path to the bundled pretrained encoder, or None if not present."""
    return SPEECH_ENCODER_V1 if os.path.exists(SPEECH_ENCODER_V1) else None
