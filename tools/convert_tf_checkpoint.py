"""Convert reference TF1 checkpoints to this framework's npz formats.

Two converters (both need tensorflow — any 1.x/2.x with
``tf.train.load_checkpoint``; this image ships TF 2.21, so they run here
directly):

1. Translation models (``tf.train.Saver`` checkpoints written by
   scripts/train_script.py:181) -> the flax param tree of the matching model
   in ``models/context.py``. Variable scopes map 1:1:
   ``contextmodel/conv/h0_conv/w`` -> ``params/conv/h0_conv/w`` etc.; conv
   kernels are HWIO in both, deconv kernels [k,k,out,in] in both, so arrays
   copy through unchanged.

2. Inception-v3 slim checkpoints (``model/inception_v3.ckpt``) -> the npz
   consumed by ``models/inception_v3.load_tf_slim_npz``.

Usage:
    python tools/convert_tf_checkpoint.py translation ckpt_prefix out.npz
    python tools/convert_tf_checkpoint.py inception inception_v3.ckpt out.npz
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load_tf_vars(prefix: str) -> dict[str, np.ndarray]:
    try:
        import tensorflow as tf
    except ImportError:
        sys.exit("tensorflow is required to read TF checkpoints; run this where TF is installed")
    reader = tf.train.load_checkpoint(prefix)
    return {
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }


def convert_inception(prefix: str, out: str) -> None:
    np.savez(out, **_load_tf_vars(prefix))
    print(f"wrote {out}; load with models.inception_v3.load_tf_slim_npz")


def rename_translation_vars(variables: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Map reference TF1 variable names to flax param paths.

    The reference graph names (arm_shaping.py:22-48 helpers under the scopes
    of ContextSkipNew.build, :1260-1340):
    ``contextmodel/conv/h0_conv/w``, ``.../h0_conv/biases`` (conv2d),
    ``.../h4_lin/Matrix``, ``.../h4_lin/bias`` (linear),
    ``deconv/d_h1/w``/``biases`` (deconv2d) — scope names match the flax
    module names 1:1, so only the leaf names change:
    Matrix -> w, biases/bias -> b. Conv kernels are HWIO in both frameworks
    and deconv kernels [k, k, out, in] in both, so arrays copy unchanged.
    Optimizer slot variables are dropped.
    """
    renamed = {}
    for name, arr in variables.items():
        if any(s in name for s in ("Adam", "beta1_power", "beta2_power")):
            continue  # optimizer slots
        key = name
        if key.startswith("contextmodel/"):
            key = key[len("contextmodel/") :]
        # order matters: '/biases' contains '/bias'
        if key.endswith("/biases"):
            key = key[: -len("biases")] + "b"
        elif key.endswith("/bias"):
            key = key[: -len("bias")] + "b"
        elif key.endswith("/Matrix"):
            key = key[: -len("Matrix")] + "w"
        renamed[key] = np.asarray(arr)
    return renamed


def load_translation_npz(params_like, path: str):
    """Fill a flax param tree (from ``model.init``) with converted weights.

    Leaves are matched by their flax path joined with '/', e.g.
    ``conv/h0_conv/w`` (the top-level 'params' collection key is skipped).
    Raises KeyError listing any missing tensors; shape mismatches raise too.
    """
    import jax

    data = np.load(path)
    missing = []

    def fill(key_path, leaf):
        keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in key_path]
        if keys and keys[0] == "params":
            keys = keys[1:]
        name = "/".join(str(k) for k in keys)
        if name not in data:
            missing.append(name)
            return leaf
        arr = np.asarray(data[name])
        if arr.shape != leaf.shape:
            raise ValueError(f"{name}: checkpoint shape {arr.shape} != model {leaf.shape}")
        return arr.astype(np.asarray(leaf).dtype)

    out = jax.tree_util.tree_map_with_path(fill, params_like)
    if missing:
        raise KeyError(f"checkpoint missing tensors: {missing}")
    return out


def convert_translation(prefix: str, out: str) -> None:
    """Emit npz keyed by flax paths (conv/h0_conv/w ...); load with
    ``load_translation_npz(model.init(...), out)``."""
    renamed = rename_translation_vars(_load_tf_vars(prefix))
    np.savez(out, **renamed)
    print(f"wrote {out} with {len(renamed)} tensors")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["translation", "inception"])
    p.add_argument("checkpoint_prefix")
    p.add_argument("out_npz")
    a = p.parse_args()
    if a.kind == "inception":
        convert_inception(a.checkpoint_prefix, a.out_npz)
    else:
        convert_translation(a.checkpoint_prefix, a.out_npz)


if __name__ == "__main__":
    main()
