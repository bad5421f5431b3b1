"""Parameter visualizers for flax param trees.

Observability parity with the reference's layer/weight visualizers
(/root/reference/utils/run_utils.py:106-176): heatmap for 2-D kernels,
histogram for 1-D biases — addressed by tree path instead of
torch named_modules, and saved to files (headless) instead of plt.show().
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _flatten(params) -> Dict[str, np.ndarray]:
    import jax
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return {"/".join(getattr(k, "key", str(k)) for k in path):
            np.asarray(leaf) for path, leaf in flat}


def list_layers(params) -> List[str]:
    """All parameter paths, e.g. 'decoder/output_mu/Dense_0/kernel'."""
    return sorted(_flatten(params))


def visualize_layer_parameters(params, layer_path: str, save_path: str,
                               cmap: str = "viridis") -> None:
    """Heatmap (>=2-D, flattened to 2-D) or histogram (1-D) of one
    parameter leaf (reference visualize_layer_parameters,
    run_utils.py:111-146). layer_path: exact or unique-suffix match."""
    flat = _flatten(params)
    if layer_path in flat:
        key = layer_path
    else:
        matches = [k for k in flat if k.endswith(layer_path)]
        if len(matches) != 1:
            raise ValueError(
                f"layer {layer_path!r} matches {len(matches)} parameters"
                + (f": {matches[:5]}" if matches else ""))
        key = matches[0]
    param = flat[key]
    fig, ax = plt.subplots(figsize=(9, 4.5), constrained_layout=True)
    if param.ndim >= 2:
        im = ax.imshow(param.reshape(param.shape[0], -1), cmap=cmap,
                       aspect="auto")
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("features")
        ax.set_ylabel("units")
    else:
        ax.hist(param.ravel(), bins=50)
        ax.set_xlabel("value")
    ax.set_title(key)
    fig.savefig(save_path, dpi=110)
    plt.close(fig)


def visualize_weight_overview(params, save_path: str,
                              top_k: Optional[int] = 40) -> None:
    """One-figure health check over the whole tree: per-leaf RMS magnitude
    (log scale) ranked, so dead/exploding layers stand out — the
    tree-level analogue of walking named_modules."""
    flat = _flatten(params)
    names = sorted(flat, key=lambda k: -float(
        np.sqrt(np.mean(flat[k].astype(np.float64) ** 2))))
    if top_k:
        names = names[:top_k]
    rms = [float(np.sqrt(np.mean(flat[k].astype(np.float64) ** 2)))
           for k in names]
    fig, ax = plt.subplots(figsize=(10, 0.28 * len(names) + 1.5),
                           constrained_layout=True)
    ax.barh(range(len(names)), rms)
    ax.set_yticks(range(len(names)))
    ax.set_yticklabels([n if len(n) < 60 else "..." + n[-57:]
                        for n in names], fontsize=6)
    ax.invert_yaxis()
    ax.set_xscale("log")
    ax.set_xlabel("parameter RMS")
    fig.savefig(save_path, dpi=110)
    plt.close(fig)
