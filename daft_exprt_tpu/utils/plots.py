"""Plot helpers (reference: src/daft_exprt/utils.py:61-92)."""
import matplotlib

matplotlib.use('Agg')

import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_2d_data(data, x_labels=None, filename=None, dpi=100):
    """Stack 2-D arrays (e.g. mel-spec + alignment) into one figure."""
    data = [np.asarray(d) for d in data]
    x_labels = x_labels or ['' for _ in data]
    fig, axes = plt.subplots(len(data), 1,
                             figsize=(12, 4 * len(data)), squeeze=False)
    for ax, arr, label in zip(axes[:, 0], data, x_labels):
        im = ax.imshow(arr, aspect='auto', origin='lower', interpolation='none')
        ax.set_title(label)
        fig.colorbar(im, ax=ax)
    fig.tight_layout()
    if filename is not None:
        fig.savefig(filename, dpi=dpi)
    plt.close(fig)


def plot_1d_overlay(curves, labels=None, filename=None, title='', dpi=100):
    """Overlay 1-D curves (e.g. GT vs predicted pitch)."""
    fig, ax = plt.subplots(figsize=(12, 4))
    labels = labels or ['' for _ in curves]
    for curve, label in zip(curves, labels):
        ax.plot(np.asarray(curve), label=label)
    if any(labels):
        ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    if filename is not None:
        fig.savefig(filename, dpi=dpi)
    plt.close(fig)
