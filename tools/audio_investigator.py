"""Quarantine mover: relocate problem audio files out of a dataset.

Parity target: `/root/reference/tools/audio_investigator.py` — scans a
directory, moves unreadable / wrong-format / too-quiet files into a
`_quarantine/` subfolder so training sees only clean data.

Usage: python tools/audio_investigator.py DIR [--quiet-db -50] [--dry-run]
"""

import argparse
import os
import shutil
import sys
import wave

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from nanowakeword_tpu.utils.audio_io import read_wav  # noqa: E402


def diagnose(path, quiet_db):
    try:
        with wave.open(path, "rb") as f:
            if f.getnframes() == 0:
                return "empty"
            if f.getframerate() != 16000 or f.getnchannels() != 1 \
                    or f.getsampwidth() != 2:
                return "wrong-format"
        data, _ = read_wav(path)
        x = data / 32768.0
        rms_db = 20 * np.log10(max(float(np.sqrt(np.mean(x * x) + 1e-12)),
                                   1e-6))
        if rms_db < quiet_db:
            return f"too-quiet ({rms_db:.1f} dB)"
        return None
    except Exception as e:  # noqa: BLE001
        return f"unreadable ({e})"


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("directory")
    parser.add_argument("--quiet-db", type=float, default=-50.0)
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args()

    quarantine = os.path.join(args.directory, "_quarantine")
    moved = 0
    for name in sorted(os.listdir(args.directory)):
        if not name.lower().endswith(".wav"):
            continue
        path = os.path.join(args.directory, name)
        reason = diagnose(path, args.quiet_db)
        if reason:
            print(f"{'DRY ' if args.dry_run else ''}QUARANTINE {name}: "
                  f"{reason}")
            if not args.dry_run:
                os.makedirs(quarantine, exist_ok=True)
                shutil.move(path, os.path.join(quarantine, name))
            moved += 1
    print(f"\n{moved} file(s) {'would be ' if args.dry_run else ''}moved to "
          f"{quarantine}")


if __name__ == "__main__":
    main()
