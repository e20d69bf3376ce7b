"""Format checker: verify every WAV in a tree is 16 kHz mono 16-bit PCM.

Parity target: `/root/reference/tools/check_all_audio.py` — walks directories
and reports files that deviate from the training format.

Usage: python tools/check_all_audio.py DIR [DIR ...]
"""

import os
import sys
import wave


def check_file(path):
    try:
        with wave.open(path, "rb") as f:
            problems = []
            if f.getframerate() != 16000:
                problems.append(f"sample_rate={f.getframerate()}")
            if f.getnchannels() != 1:
                problems.append(f"channels={f.getnchannels()}")
            if f.getsampwidth() != 2:
                problems.append(f"bit_depth={f.getsampwidth() * 8}")
            if f.getnframes() == 0:
                problems.append("empty")
            return problems
    except Exception as e:  # noqa: BLE001
        return [f"unreadable: {e}"]


def main():
    dirs = sys.argv[1:] or ["."]
    total, bad = 0, 0
    for d in dirs:
        for root, _, files in os.walk(d):
            for name in sorted(files):
                if not name.lower().endswith(".wav"):
                    continue
                total += 1
                path = os.path.join(root, name)
                problems = check_file(path)
                if problems:
                    bad += 1
                    print(f"BAD  {path}  [{', '.join(problems)}]")
    print(f"\nChecked {total} files; {bad} need attention, "
          f"{total - bad} OK.")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
