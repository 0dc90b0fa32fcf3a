"""The 3-term context-translation loss.

Reference (arm_shaping.py:1345-1354):

- ``recon1 = tf.nn.l2_loss(tgt - out)``   — translated reconstruction
- ``recon2 = tf.nn.l2_loss(tgt - out2)``  — autoencoding reconstruction
- ``simloss = mean((trans_z - tgt_z)^2) * 1e3`` — translated-feature match
- ``loss = recon1 + recon2 + simloss``

``tf.nn.l2_loss`` is ``sum(x^2)/2`` — a *sum* over the whole batch, not a
mean — so the loss scales with global batch size. Under data-parallel jit the
global sum is computed exactly (XLA inserts the psum over the data axis).

Losses are computed in float32 regardless of the model's compute dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from imitation_from_observation_tpu.models.context import TranslationOutputs


def l2_loss(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    return 0.5 * jnp.sum(x * x)


def translation_loss(
    outputs: TranslationOutputs,
    tgt: jax.Array,
    sim_weight: float = 1e3,
    ablation: str = "none",
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """``ablation`` selects the loss-term combination of the reference's
    ablation study (ablations_code/ablations.py:175-182):
    none = recon1+recon2+sim; L2 = recon1+recon2; L2L3 = recon1;
    L1 = recon2+sim."""
    tgt = tgt.astype(jnp.float32)
    recon1 = l2_loss(tgt - outputs.out)
    recon2 = l2_loss(tgt - outputs.out2)
    diff = outputs.trans_z.astype(jnp.float32) - outputs.tgt_z.astype(jnp.float32)
    simloss = jnp.mean(diff * diff) * sim_weight
    if ablation in ("none", "None"):
        loss = recon1 + recon2 + simloss
    elif ablation == "L2":
        loss = recon1 + recon2
    elif ablation == "L2L3":
        loss = recon1
    elif ablation == "L1":
        loss = recon2 + simloss
    else:
        raise ValueError(f"unknown loss ablation {ablation!r}")
    return loss, {"loss": loss, "recon1": recon1, "recon2": recon2, "simloss": simloss}
