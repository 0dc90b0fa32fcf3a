"""Convert reference TF1 checkpoints to this framework's npz formats.

Two converters (both need tensorflow installed — any 1.x/2.x with
``tf.train.load_checkpoint``; this image ships without TF, so run wherever
the reference checkpoints live):

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


def convert_translation(prefix: str, out: str) -> None:
    """Emit npz keyed by flax paths (conv/h0_conv/w ...). Loading:

        params_like = model.init(...)
        data = np.load(out)
        # walk params_like with jax.tree_util.tree_flatten_with_path and
        # replace each leaf by data['/'.join(path)] — see
        # models/inception_v3.load_tf_slim_npz for the same pattern.
    """
    variables = _load_tf_vars(prefix)
    renamed = {}
    for name, arr in variables.items():
        if any(s in name for s in ("Adam", "beta1_power", "beta2_power")):
            continue  # optimizer slots
        key = name
        if key.startswith("contextmodel/"):
            key = key[len("contextmodel/") :]
        # TF 'Matrix'/'bias' of linear() -> our Dense 'w'/'b'
        key = key.replace("/Matrix", "/w").replace("/bias", "/b").replace("/biases", "/b")
        renamed[key] = arr
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
