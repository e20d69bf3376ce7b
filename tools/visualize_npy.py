"""Visualize feature .npy files as heatmaps.

Parity target: `/root/reference/tools/visualize_npy.py` — renders rows of a
feature memmap ([N, T, 96]) to PNG for eyeballing embedding quality.

Usage: python tools/visualize_npy.py FEATURES.npy [--rows 8] [--out viz.png]
"""

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path")
    parser.add_argument("--rows", type=int, default=8)
    parser.add_argument("--out", default=None)
    args = parser.parse_args()

    data = np.load(args.path, mmap_mode="r")
    print(f"shape={data.shape} dtype={data.dtype}")
    n = min(args.rows, data.shape[0])
    fig, axes = plt.subplots(n, 1, figsize=(10, 1.6 * n), squeeze=False)
    for i in range(n):
        axes[i][0].imshow(np.asarray(data[i]).T, aspect="auto",
                          origin="lower", cmap="magma")
        axes[i][0].set_ylabel(f"[{i}]")
    out = args.out or args.path.replace(".npy", "_viz.png")
    plt.tight_layout()
    plt.savefig(out, dpi=120)
    print(f"Saved {out}")


if __name__ == "__main__":
    main()
