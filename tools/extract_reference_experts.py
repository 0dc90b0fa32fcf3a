"""Extract the reference's shipped expert policies into our npz format.

The reference ships trained oracle experts as rllab pickles at its repo root
(``expert_{push,reach,reacher,striker,sweep,thrower}.pkl``,
``experttheano_{push,reach,clean}.pkl``). Each is a Serializable
GaussianMLPPolicy (rllab/core/serializable.py:10-43 ctor-capture) whose
state carries ``__args`` (name, env_spec, hidden_sizes, ...) and ``params``
— the FLAT parameter vector from ``get_param_values()`` in creation order:
[W0, b0, W1, b1, W_out, b_out, output_log_std] with W stored [in, out]
row-major (rllab/policies/gaussian_mlp_policy.py:20-140 /
sandbox/rocky/tf/policies/gaussian_mlp_policy.py).

No rllab import is needed: a restricted Unpickler stubs the foreign classes
and we unflatten the vector against the dims solved from the ctor args.
The push/reach experts observe the FULL-STATE obs variant (proprio +
effector/object/goal COMs — pusher3dof.py:121-134); run them with
``EnvConfig(full_state=True)``. striker/thrower/sweep match the plain obs.

Usage:
    python tools/extract_reference_experts.py /root/reference out_dir/
"""

from __future__ import annotations

import glob
import os
import pickle
import sys

import numpy as np

FOREIGN = ("rllab", "sandbox", "gym", "lasagne", "theano", "tensorflow")

# pickle stem -> (our task name, expects full-state obs)
TASK_MAP = {
    "expert_push": ("pusher3dof", True),
    "expert_reach": ("reacher3dof", True),
    "expert_striker": ("striker", False),
    "expert_sweep": ("cleaner", False),
    "expert_thrower": ("thrower", False),
    "experttheano_push": ("pusher3dof", True),
    "experttheano_reach": ("reacher3dof", True),
    "experttheano_clean": ("cleaner", False),
    # expert_reacher.pkl (obs 11, act 2) targets the TPIL 2-link reacher,
    # not a task env of ours — skipped by default.
}

# known (obs, act) per task to disambiguate the dim solve
TASK_DIMS = {
    "pusher3dof": (15, 3),
    "reacher3dof": (12, 3),
    "striker": (23, 7),
    "cleaner": (30, 3),
    "thrower": (23, 7),
}


class _Stub:
    def __init__(self, *a, **kw):
        self._args, self._kwargs = a, kw

    def __setstate__(self, state):
        self._state = state


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.split(".")[0] in FOREIGN:
            return type(f"Stub_{name}", (_Stub,), {"_module": module, "_name": name})
        return super().find_class(module, name)


def read_expert_pickle(path: str):
    """-> (flat_params float64 [N], hidden_sizes tuple)."""
    with open(path, "rb") as f:
        obj = _RestrictedUnpickler(f).load()
    state = obj._state
    args = state.get("__args", ())
    hidden = next(
        (a for a in args if isinstance(a, tuple) and a and all(isinstance(x, int) for x in a)),
        (32, 32),
    )
    return np.asarray(state["params"], np.float64), tuple(hidden)


def unflatten_mlp(flat: np.ndarray, obs: int, act: int, hidden: tuple[int, ...]):
    """Flat rllab param vector -> (list[(W, b)], log_std)."""
    sizes = [obs, *hidden, act]
    layers = []
    i = 0
    for a, b in zip(sizes[:-1], sizes[1:]):
        w = flat[i : i + a * b].reshape(a, b)
        i += a * b
        bias = flat[i : i + b]
        i += b
        layers.append((w, bias))
    log_std = flat[i : i + act]
    i += act
    if i != flat.size:
        raise ValueError(f"layout mismatch: consumed {i} of {flat.size}")
    return layers, log_std


def build_policy(task: str, layers, log_std, hidden):
    from imitation_from_observation_tpu.rl.policy import GaussianMLPPolicy

    obs, act = layers[0][0].shape[0], layers[-1][0].shape[1]
    policy = GaussianMLPPolicy(obs, act, hidden=hidden, init_std=float(np.exp(log_std).mean()))
    net = {"params": {}}
    for i, (w, b) in enumerate(layers):
        net["params"][f"Dense_{i}"] = {
            "kernel": np.asarray(w, np.float32),
            "bias": np.asarray(b, np.float32),
        }
    policy.params = {"net": net, "log_std": np.asarray(log_std, np.float32)}
    return policy


def extract(ref_dir: str, out_dir: str) -> list[str]:
    from imitation_from_observation_tpu.core.checkpoint import save_pytree

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for path in sorted(glob.glob(os.path.join(ref_dir, "expert*.pkl"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        if stem not in TASK_MAP:
            print(f"skip {stem} (no matching task env)")
            continue
        task, full_state = TASK_MAP[stem]
        obs, act = TASK_DIMS[task]
        flat, hidden = read_expert_pickle(path)
        layers, log_std = unflatten_mlp(flat, obs, act, hidden)
        policy = build_policy(task, layers, log_std, hidden)
        out = os.path.join(out_dir, stem)
        save_pytree(
            out,
            policy.params,
            meta=dict(
                task=task,
                obs_dim=obs,
                act_dim=act,
                hidden=list(hidden),
                full_state=full_state,
                source=os.path.basename(path),
            ),
        )
        written.append(out)
        print(f"{stem}: obs={obs} act={act} hidden={hidden} -> {out}")
    return written


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")  # extraction is host-only
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    out = sys.argv[2] if len(sys.argv) > 2 else "data/reference_experts"
    extract(ref, out)
