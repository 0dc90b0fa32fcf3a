"""Third-person imitation (TPIL) discriminators.

Capability match for the reference
``sandbox/bradly/third_person/discriminators/discriminator.py``: the
load-bearing :class:`DomainConfusionVelocityDiscriminator` (:357-470, used
by the cyberpunk trainer) plus the file's other inventory —
:class:`MLPDiscriminator` (:93-119, state-vector inputs) and
:class:`ConvDiscriminator` (:123-199, single image + time input; its second
conv layer is commented out in the reference and stays out here). All share
the reference host API: ``train(data, targets) -> cost`` and
``__call__(data, softmax=True) -> probs``.

DomainConfusionVelocityDiscriminator (:357-470) and ``flip_gradients.py``:

- a two-frame "velocity" input (frame_t, frame_{t+3}), each passed through a
  shared conv stack (2x [3x3 conv -> relu -> 2x2 maxpool]) and a shared
  128-wide dense+relu
- class head: MLP(128, 128, n_class) over the concatenated pair features
  (expert vs novice)
- domain head: MLP over frame-one features behind a **gradient-reversal**
  (identity forward, -0.2x gradient) so the trunk learns domain-blind
  features
- loss = class CE + 0.2 * domain CE, Adam(1e-3)

The GAIL variant (cyberpunk_trainer_gail.py) is this discriminator with the
domain weight set to 0.
"""

from __future__ import annotations

import functools
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, l: float = 1.0):
    """Identity forward; gradient scaled by -l (flip_gradients.py:1-21)."""
    return x


def _gr_fwd(x, l):
    return x, None


def _gr_bwd(l, _, g):
    return (-l * g,)


gradient_reversal.defvjp(_gr_fwd, _gr_bwd)


class _ConvTrunk(nn.Module):
    num_filters: tuple[int, int] = (5, 5)

    @nn.compact
    def __call__(self, x):
        for f in self.num_filters:
            x = nn.relu(nn.Conv(f, (3, 3), padding="SAME")(x))
            x = nn.max_pool(x, (2, 2), (2, 2), "SAME")
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(128, kernel_init=nn.initializers.normal(0.01))(x))


class _MLPHead(nn.Module):
    out_dim: int
    hidden: tuple[int, ...] = (128, 128)

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, kernel_init=nn.initializers.normal(0.01))(x))
        return nn.Dense(self.out_dim, kernel_init=nn.initializers.normal(0.01))(x)


class _DiscNet(nn.Module):
    n_class: int = 2
    n_dom: int = 2
    dom_flip: float = 0.2

    def setup(self):
        self.trunk = _ConvTrunk()
        self.class_head = _MLPHead(self.n_class)
        self.dom_head = _MLPHead(self.n_dom)

    def __call__(self, frame_one, frame_two):
        f1 = self.trunk(frame_one)
        f2 = self.trunk(frame_two)
        pair = jnp.concatenate([f1, f2], axis=1)
        class_logits = self.class_head(pair)
        dom_logits = self.dom_head(gradient_reversal(f1, self.dom_flip))
        return class_logits, dom_logits


class DomainConfusionVelocityDiscriminator:
    def __init__(
        self,
        input_dim: tuple[int, int, int],
        output_dim_class: int = 2,
        output_dim_dom: int = 2,
        learning_rate: float = 1e-3,
        dom_loss_weight: float = 0.2,
        seed: int = 0,
    ):
        self.input_dim = input_dim
        self.dom_loss_weight = dom_loss_weight
        self.net = _DiscNet(output_dim_class, output_dim_dom)
        h, w, c = input_dim
        x = jnp.zeros((1, h, w, c), jnp.float32)
        self.params = self.net.init(jax.random.key(seed), x, x)
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)
        self._train_step = jax.jit(self._build_train_step())
        self._forward = jax.jit(lambda p, a, b: self.net.apply(p, a, b))

    def _build_train_step(self):
        def loss_fn(params, f1, f2, classes, domains):
            class_logits, dom_logits = self.net.apply(params, f1, f2)
            class_loss = optax.softmax_cross_entropy(class_logits, classes).mean()
            dom_loss = optax.softmax_cross_entropy(dom_logits, domains).mean()
            loss = class_loss + self.dom_loss_weight * dom_loss
            acc = jnp.mean(
                (jnp.argmax(class_logits, 1) == jnp.argmax(classes, 1)).astype(jnp.float32)
            )
            dom_acc = jnp.mean(
                (jnp.argmax(dom_logits, 1) == jnp.argmax(domains, 1)).astype(jnp.float32)
            )
            return loss, (acc, dom_acc)

        def step(params, opt_state, f1, f2, classes, domains):
            (loss, (acc, dom_acc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, f1, f2, classes, domains
            )
            updates, opt_state = self.tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss, acc, dom_acc

        return step

    # -- reference-shaped host API -----------------------------------------
    def train(self, data_batch, targets_batch) -> tuple[float, float]:
        f1, f2 = (jnp.asarray(d, jnp.float32) for d in data_batch)
        self.params, self.opt_state, loss, acc, _ = self._train_step(
            self.params,
            self.opt_state,
            f1,
            f2,
            jnp.asarray(targets_batch["classes"], jnp.float32),
            jnp.asarray(targets_batch["domains"], jnp.float32),
        )
        return float(loss), float(acc)

    def get_reward(self, data, softmax: bool = True) -> np.ndarray:
        """P(expert | frame pair) — column 0, like the reference's
        ``get_reward(...)[:, 0]`` (cyberpunk_trainer.py:237)."""
        f1, f2 = (jnp.asarray(d, jnp.float32) for d in data)
        logits, _ = self._forward(self.params, f1, f2)
        if softmax:
            return np.asarray(jax.nn.softmax(logits))
        return np.asarray(logits)

    def get_lab_accuracy(self, data, class_labels) -> float:
        f1, f2 = (jnp.asarray(d, jnp.float32) for d in data)
        logits, _ = self._forward(self.params, f1, f2)
        return float(
            np.mean(np.argmax(np.asarray(logits), 1) == np.argmax(np.asarray(class_labels), 1))
        )


class _SimpleDiscriminator:
    """Shared train/infer plumbing for the single-head variants (the
    reference base class's ``train``/``__call__``/``get_loss_layer``,
    discriminator.py:29-91, minus the TF session machinery)."""

    def _finish_init(self, sample_inputs, learning_rate: float, seed: int):
        self.params = self.net.init(jax.random.key(seed), *sample_inputs)
        self.tx = optax.adam(learning_rate)
        self.opt_state = self.tx.init(self.params)

        def loss_fn(params, inputs, targets):
            logits = self.net.apply(params, *inputs)
            return optax.softmax_cross_entropy(logits, targets).mean()

        def step(params, opt_state, inputs, targets):
            loss, grads = jax.value_and_grad(loss_fn)(params, inputs, targets)
            updates, opt_state = self.tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = jax.jit(step)
        self._forward = jax.jit(lambda p, inputs: self.net.apply(p, *inputs))

    def _as_inputs(self, data) -> tuple:
        if isinstance(data, (list, tuple)):
            return tuple(jnp.asarray(d, jnp.float32) for d in data)
        return (jnp.asarray(data, jnp.float32),)

    def train(self, data_batch, targets_batch) -> float:
        self.params, self.opt_state, loss = self._train_step(
            self.params,
            self.opt_state,
            self._as_inputs(data_batch),
            jnp.asarray(targets_batch, jnp.float32),
        )
        return float(loss)

    def __call__(self, data, softmax: bool = True) -> np.ndarray:
        logits = self._forward(self.params, self._as_inputs(data))
        return np.asarray(jax.nn.softmax(logits) if softmax else logits)


class _MLPDiscNet(nn.Module):
    # 3 layers, hidden 40 (reference :100-101), no relu on the final layer
    hidden: tuple[int, ...] = (40, 40)
    out_dim: int = 2

    @nn.compact
    def __call__(self, x):
        for h in self.hidden:
            x = nn.relu(nn.Dense(h, kernel_init=nn.initializers.normal(0.01))(x))
        return nn.Dense(self.out_dim, kernel_init=nn.initializers.normal(0.01))(x)


class MLPDiscriminator(_SimpleDiscriminator):
    """State-vector expert/novice discriminator (discriminator.py:93-119):
    3-layer relu MLP (40, 40, 2), CE loss, Adam(1e-3)."""

    def __init__(self, input_dim: int, output_dim_class: int = 2,
                 learning_rate: float = 1e-3, seed: int = 0):
        self.input_dim = input_dim
        self.net = _MLPDiscNet(out_dim=output_dim_class)
        self._finish_init((jnp.zeros((1, input_dim), jnp.float32),), learning_rate, seed)


class _ConvDiscNet(nn.Module):
    # one 3x3 conv (5 filters) + 2x2 maxpool — the reference builds weights
    # for a second conv but leaves it commented out (:176-180); the flattened
    # conv map concatenates a time feature before the 2-layer head (:185-188)
    num_filters: int = 5
    hidden: int = 128
    out_dim: int = 2

    @nn.compact
    def __call__(self, img, time_feat):
        x = nn.relu(nn.Conv(self.num_filters, (3, 3), padding="SAME")(img))
        x = nn.max_pool(x, (2, 2), (2, 2), "SAME")
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, time_feat], axis=1)
        x = nn.relu(nn.Dense(self.hidden, kernel_init=nn.initializers.normal(0.01))(x))
        return nn.Dense(self.out_dim, kernel_init=nn.initializers.normal(0.01))(x)


class ConvDiscriminator(_SimpleDiscriminator):
    """Image(+time) expert/novice discriminator (discriminator.py:123-199).

    ``data`` is ``(images [B, H, W, C], time [B, time_dim])`` — the
    reference feeds both placeholders (:198 ``nn_input = [nn_input,
    time_input]``)."""

    def __init__(self, input_dim: tuple[int, int, int], output_dim_class: int = 2,
                 time_dim: int = 1, learning_rate: float = 1e-3, seed: int = 0):
        self.input_dim = input_dim
        h, w, c = input_dim
        self.net = _ConvDiscNet(out_dim=output_dim_class)
        self._finish_init(
            (jnp.zeros((1, h, w, c), jnp.float32), jnp.zeros((1, time_dim), jnp.float32)),
            learning_rate,
            seed,
        )
