"""Create the tiny sample dataset used by the quickstart walkthrough.

The reference ships a 4-class `examples/training_data/` with one WAV per
class; this script generates an equivalent miniature dataset with the
built-in synthesizer (no downloads), so the quickstart works offline:

    python examples/make_sample_dataset.py [OUT_DIR]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from nanowakeword_tpu.data.generator.tts import formant_synthesize  # noqa: E402
from nanowakeword_tpu.utils.audio_io import write_wav  # noqa: E402


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "training_data")
    rng = np.random.default_rng(10)
    layout = {
        "positive": [("hey nano", i) for i in range(8)],
        "positive_val": [("hey nano", 100 + i) for i in range(4)],
        "negative": [("ok tomato", 200 + i) for i in range(6)]
        + [("hay mono over there", 300 + i) for i in range(6)],
        "noise": None,
    }
    for sub, spec in layout.items():
        d = os.path.join(out, sub)
        os.makedirs(d, exist_ok=True)
        if spec is None:
            for i in range(4):
                write_wav(os.path.join(d, f"noise_{i}.wav"),
                          rng.normal(0, 1200, 48000))
            continue
        for j, (phrase, seed) in enumerate(spec):
            audio = formant_synthesize(phrase, seed=seed,
                                       f0=float(rng.uniform(90, 210)))
            write_wav(os.path.join(d, f"{sub}_{j:03d}.wav"), audio * 32767)
    print(f"Sample dataset written to {out}")


if __name__ == "__main__":
    main()
