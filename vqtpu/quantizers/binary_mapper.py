"""BinaryMapper (component C17).

Free-Transformer stochastic binary latents
(https://arxiv.org/abs/2510.17558). TPU-native re-design of the reference
BinaryMapper (binary_mapper.py:45-194): per-bit Bernoulli sampling with
temperature, bits -> index via powers of two, a one-hot output with a
"soft G" straight-through estimator, a hinged KL-to-uniform auxiliary loss,
and exact log-probs of indices / one-hots. Sampling takes an explicit PRNG
key from the module rng stream.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import nnx

from ..core.module import ModeModule
from ..core.utils import default

sg = jax.lax.stop_gradient

NAT = math.log(2)


def binary_entropy(logits: jax.Array) -> jax.Array:
    """Sum over bits of H(sigmoid(logit)) in nats (reference
    binary_mapper.py:28-31)."""
    prob = jax.nn.sigmoid(logits)
    return -(
        prob * jax.nn.log_sigmoid(logits)
        + (1.0 - prob) * jax.nn.log_sigmoid(-logits)
    ).sum(axis=-1)


class BinaryMapper(ModeModule):
    def __init__(
        self,
        bits: int = 1,
        kl_loss_threshold: float = NAT,
        deterministic_on_eval: bool = False,
        *,
        rngs: nnx.Rngs | None = None,
    ):
        if rngs is None:
            rngs = nnx.Rngs(0)
        self.bits = bits
        self.num_codes = 2 ** bits
        self.kl_loss_threshold = kl_loss_threshold
        self.deterministic_on_eval = deterministic_on_eval
        self.rngs = rngs

    # derived tables (non-persistent buffers in the reference, :57-61)
    def _power_two(self) -> jax.Array:
        return 2 ** jnp.arange(self.bits)

    def _codes_table(self) -> jax.Array:
        """(num_codes, bits) bool table: code c has bit i set iff c & 2^i."""
        return (jnp.arange(self.num_codes)[:, None] & self._power_two()) != 0

    def binary_entropy(self, logits: jax.Array) -> jax.Array:
        return binary_entropy(logits)

    def calc_aux_loss(self, logits: jax.Array, reduce_aux_kl_loss: bool = True):
        """Hinged KL to the uniform code distribution (reference :75-87)."""
        kl_div = self.bits * NAT - self.binary_entropy(logits)
        aux_kl_loss = jax.nn.relu(kl_div - self.kl_loss_threshold)
        if reduce_aux_kl_loss:
            return aux_kl_loss.mean()
        return aux_kl_loss

    def log_prob(
        self,
        logits: jax.Array,
        *,
        indices: jax.Array | None = None,
        one_hot: jax.Array | None = None,
        sum_bits: bool = True,
    ) -> jax.Array:
        """Joint log-probability of sampled codes under the per-bit
        Bernoulli distribution (reference :89-122)."""
        assert (indices is None) ^ (one_hot is None), (
            'either indices or one_hot must be provided'
        )
        if one_hot is not None:
            indices = one_hot.argmax(axis=-1)

        sampled_bits = jnp.take(self._codes_table(), indices, axis=0)

        log_probs_1 = jax.nn.log_sigmoid(logits)
        log_probs_0 = jax.nn.log_sigmoid(-logits)
        log_probs = jnp.where(sampled_bits, log_probs_1, log_probs_0)

        if not sum_bits:
            return log_probs
        return log_probs.sum(axis=-1)

    def __call__(
        self,
        logits: jax.Array,
        temperature: float = 1.0,
        straight_through: bool | None = None,
        calc_aux_loss: bool | None = None,
        deterministic: bool | None = None,
        return_indices: bool = False,
        reduce_aux_kl_loss: bool = True,
    ):
        deterministic = default(
            deterministic, self.deterministic_on_eval and not self.training
        )
        straight_through = default(straight_through, self.training)
        calc_aux_loss = default(calc_aux_loss, self.training)

        assert logits.shape[-1] == self.bits, (
            f'logits must have a last dimension of {self.bits}'
        )

        prob_for_sample = jax.nn.sigmoid(logits / temperature)

        if not deterministic:
            key = self.rngs.sample()
            sampled_bits = jax.random.bernoulli(
                key, prob_for_sample
            ).astype(jnp.int32)
        else:
            sampled_bits = (prob_for_sample > 0.5).astype(jnp.int32)

        indices = (self._power_two() * sampled_bits).sum(axis=-1)
        one_hot = jax.nn.one_hot(indices, self.num_codes, dtype=jnp.float32)

        aux_kl_loss = jnp.asarray(0.0)
        if calc_aux_loss:
            aux_kl_loss = self.calc_aux_loss(
                logits, reduce_aux_kl_loss=reduce_aux_kl_loss
            )

        if straight_through:
            # soft G: the exact categorical distribution implied by the
            # per-bit Bernoullis, used as the gradient surrogate
            # (reference :170-180)
            codes = self._codes_table().astype(jnp.float32)      # (K, bits)
            soft_G = jnp.exp(
                jax.nn.log_sigmoid(logits) @ codes.T
                + jax.nn.log_sigmoid(-logits) @ (1.0 - codes).T
            )
            one_hot = one_hot + soft_G - sg(soft_G)

        if not return_indices:
            return one_hot, aux_kl_loss
        return one_hot, indices, aux_kl_loss
