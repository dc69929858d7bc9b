"""GLO (Generative Latent Optimization) embedding encoder.

Parity: /root/reference/nerfies/glo.py:22-53. Embedding lookups lower to XLA
gathers, which are fine on TPU; the interesting part is that the model layer
looks codes up once per *ray* and broadcasts, never per sample.
"""

import flax.linen as nn
import jax.numpy as jnp


class GloEncoder(nn.Module):
  """A learned per-index latent code table.

  Attributes:
    num_embeddings: number of rows in the table.
    features: code dimensionality.
    embedding_init: initializer (reference uses uniform(0.05)).
  """
  num_embeddings: int
  features: int
  embedding_init: nn.initializers.Initializer = nn.initializers.uniform(
      scale=0.05)

  def setup(self):
    self.embed = nn.Embed(
        num_embeddings=self.num_embeddings,
        features=self.features,
        embedding_init=self.embedding_init)

  def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
    """Looks up codes; squeezes a trailing singleton index dim if present."""
    if inputs.shape[-1] == 1:
      inputs = jnp.squeeze(inputs, axis=-1)
    return self.embed(inputs)
