"""Minimal live microphone smoke test.

Parity target: `/root/reference/test_model/nww_model_test_from_mic.py` —
open the default mic, stream 1280-sample chunks through the interpreter, and
print scores. Requires pyaudio.

Usage: python test_model/nww_model_test_from_mic.py --model my_model.nww
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from nanowakeword_tpu import NanoInterpreter  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model", required=True)
    parser.add_argument("--threshold", type=float, default=0.5)
    args = parser.parse_args()

    interpreter = NanoInterpreter.load_model(args.model)
    print(f"Listening for '{interpreter.model_name}' "
          f"(threshold {args.threshold}). Ctrl+C to stop.")
    interpreter.listen(
        threshold=args.threshold,
        on_score=lambda v, g: print(f"score={v:.4f}", end="\r"),
    )


if __name__ == "__main__":
    main()
