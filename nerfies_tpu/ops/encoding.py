"""Positional encodings as batched functions.

The reference wraps sinusoidal encodings in flax modules and vmaps them over
batch dims (/root/reference/nerfies/modules.py:172-294). On TPU that hides
the batch from XLA; here encodings are plain functions over ``(..., C)``
arrays so the sin/window math fuses into the adjacent matmuls.

Feature ordering matches the reference exactly: for each input of C channels
and F frequency bands the output is ``[x?, sin(f0*x), cos(f0*x), sin(f1*x),
...]`` flattened in (F, 2, C) order, i.e. per frequency: C sin lanes then C
cos lanes (cos written as sin(x + pi/2), modules.py:221-223).
"""

from typing import Optional

import jax.numpy as jnp


def freq_bands(num_freqs: int,
               min_freq_log2: float = 0.0,
               max_freq_log2: Optional[float] = None,
               dtype=jnp.float32) -> jnp.ndarray:
  """2^linspace(min, max, F) frequency bands (modules.py:188-198)."""
  if max_freq_log2 is None:
    max_freq_log2 = num_freqs - 1.0
  return 2.0 ** jnp.linspace(min_freq_log2, max_freq_log2, int(num_freqs),
                             dtype=dtype)


def posenc(x: jnp.ndarray,
           num_freqs: int,
           min_freq_log2: float = 0.0,
           max_freq_log2: Optional[float] = None,
           scale: float = 1.0,
           use_identity: bool = True,
           alpha: Optional[jnp.ndarray] = None) -> jnp.ndarray:
  """Sinusoidal positional encoding with optional cosine-easing annealing.

  Combines the reference's SinusoidalEncoder and AnnealedSinusoidalEncoder
  (modules.py:172-294) into one batched function: passing ``alpha=None``
  gives the plain encoding; passing an alpha applies the Nerfies coarse-to-
  fine window to the frequency bands.

  Args:
    x: (..., C) inputs.
    num_freqs: number of frequency octaves F.
    min_freq_log2: log2 of the lowest band.
    max_freq_log2: log2 of the highest band (defaults to F - 1).
    scale: multiplier on the angles.
    use_identity: prepend the raw input channels.
    alpha: optional annealing parameter in [0, F]; freq band i is eased in
      as alpha sweeps past i (cosine easing window, modules.py:274-294).

  Returns:
    (..., C + 2*F*C) if use_identity else (..., 2*F*C).
  """
  if num_freqs == 0:
    return x

  num_channels = x.shape[-1]
  freqs = freq_bands(num_freqs, min_freq_log2, max_freq_log2, dtype=x.dtype)

  # (..., F, 1, C): angles per frequency band.
  angles = scale * x[..., None, None, :] * freqs[:, None, None]
  # (..., F, 2, C): [sin branch, cos branch] via cos(x) = sin(x + pi/2).
  four = jnp.concatenate([angles, angles + 0.5 * jnp.pi], axis=-2)
  features = jnp.sin(four)

  if alpha is not None:
    window = cosine_easing_window(
        num_freqs, alpha, min_freq_log2, max_freq_log2).astype(x.dtype)
    features = features * window[:, None, None]

  features = features.reshape(*x.shape[:-1], 2 * num_freqs * num_channels)
  if use_identity:
    return jnp.concatenate([x, features], axis=-1)
  return features


def cosine_easing_window(num_freqs: int,
                         alpha: jnp.ndarray,
                         min_freq_log2: float = 0.0,
                         max_freq_log2: Optional[float] = None) -> jnp.ndarray:
  """Per-band annealing weights: Tukey window slid along the spectrum.

  window_i = 0.5 * (1 + cos(pi * clip(alpha - band_i, 0, 1) + pi))
  (reference modules.py:274-294).

  Args:
    num_freqs: number of bands F.
    alpha: scalar annealing progress in [0, F].
    min_freq_log2 / max_freq_log2: band range (defaults 0 .. F-1).

  Returns:
    (F,) weights in [0, 1].
  """
  if max_freq_log2 is None:
    max_freq_log2 = num_freqs - 1.0
  bands = jnp.linspace(min_freq_log2, max_freq_log2, num_freqs)
  x = jnp.clip(alpha - bands, 0.0, 1.0)
  return 0.5 * (1.0 + jnp.cos(jnp.pi * x + jnp.pi))


def posenc_output_dim(num_channels: int, num_freqs: int,
                      use_identity: bool = True) -> int:
  """Static output width of `posenc` for shape planning."""
  if num_freqs == 0:
    return num_channels
  return num_channels * (2 * num_freqs + (1 if use_identity else 0))
