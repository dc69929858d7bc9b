"""Stage-by-stage bisect of the fused kernel on TPU. Internal tool."""

import sys
import pathlib
import time

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_tpu_cache')
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

TB, TS = 64, 128
F = 4           # freqs -> PE dim 27
W = 128
PE_DIM = 3 * (1 + 2 * F)
BATCH, S = 512, 256

rng = np.random.RandomState(0)
px = jnp.asarray(rng.randn(BATCH, S), jnp.float32)
py = jnp.asarray(rng.randn(BATCH, S), jnp.float32)
pz = jnp.asarray(rng.randn(BATCH, S), jnp.float32)
zv = jnp.asarray(np.sort(rng.uniform(1, 4, (BATCH, S)), -1), jnp.float32)
dv = jnp.asarray(np.abs(rng.uniform(0.01, 0.1, (BATCH, S))), jnp.float32)
w0 = jnp.asarray(rng.randn(PE_DIM, W) * 0.1, jnp.float32)
w1 = jnp.asarray(rng.randn(W, W) * 0.1, jnp.float32)
wskip = jnp.asarray(rng.randn(W + PE_DIM, W) * 0.1, jnp.float32)
wa = jnp.asarray(rng.randn(W, 1) * 0.1, jnp.float32)
wr = jnp.asarray(rng.randn(W, 3) * 0.1, jnp.float32)
b = jnp.zeros((W,), jnp.float32)


def posenc(chans, dtype):
  feats = list(chans)
  for i in range(F):
    a = [(2.0 ** i) * c for c in chans]
    feats += [jnp.sin(v) for v in a]
    feats += [jnp.sin(v + 0.5 * jnp.pi) for v in a]
  return jnp.stack(feats, axis=-1).astype(dtype)


def dot(a, bb):
  return jax.lax.dot_general(a, bb, (((a.ndim - 1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)


def make_kernel(stage):
  def kernel(pxr, pyr, pzr, zr, dr, w0r, w1r, wsr, war, wrr, br,
             out_ref, acc_ref):
    j = pl.program_id(1)
    nb = pl.num_programs(1)
    dt = jnp.bfloat16

    @pl.when(j == 0)
    def _():
      acc_ref[:] = jnp.concatenate(
          [jnp.ones((TB, 1), jnp.float32), jnp.zeros((TB, 7), jnp.float32)],
          axis=-1)

    x_pe = posenc([pxr[:], pyr[:], pzr[:]], dt)
    result = jnp.sum(x_pe.astype(jnp.float32), axis=2)  # (TB, TS)

    if stage >= 2:
      h = jax.nn.relu(dot(x_pe, w0r[:].astype(dt)) + br[:]).astype(dt)
      h = jax.nn.relu(dot(h, w1r[:].astype(dt)) + br[:]).astype(dt)
      ws = wsr[:].astype(dt)
      h = jax.nn.relu(dot(h, ws[:W]) + dot(x_pe, ws[W:]) + br[:]).astype(dt)
      result = jnp.sum(h.astype(jnp.float32), axis=2)

    if stage >= 3:
      raw = dot(h, war[:].astype(dt))           # (TB, TS, 1)
      sigma = jax.nn.softplus(jnp.sum(raw, axis=2))
      result = sigma

    if stage >= 4:
      alpha = 1.0 - jnp.exp(-sigma * dr[:])
      log_t = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-10))
      rowi = lax.broadcasted_iota(jnp.int32, (TS, TS), 0)
      coli = lax.broadcasted_iota(jnp.int32, (TS, TS), 1)
      su = (rowi < coli).astype(jnp.float32)
      trans = acc_ref[:, 0:1]
      weights = alpha * jnp.exp(dot(log_t, su)) * trans
      acc_c = jnp.sum(weights, axis=1, keepdims=True)
      new_trans = trans * jnp.exp(jnp.sum(log_t, axis=1, keepdims=True))
      acc = acc_ref[:]
      acc_ref[:] = jnp.concatenate(
          [new_trans, acc[:, 1:7], acc[:, 7:8] + acc_c], axis=-1)
      result = weights

    if stage >= 5:
      rgb = jax.nn.sigmoid(dot(h, wrr[:].astype(dt)))   # (TB, TS, 3)
      rgb_c = jnp.sum(weights[..., None] * rgb, axis=1)  # (TB, 3)
      acc = acc_ref[:]
      acc_ref[:] = jnp.concatenate(
          [acc[:, 0:2], acc[:, 2:5] + rgb_c, acc[:, 5:8]], axis=-1)

    @pl.when(j == nb - 1)
    def _():
      if stage >= 4:
        out_ref[:] = acc_ref[:]
      else:
        out_ref[:] = jnp.concatenate(
            [jnp.sum(result, axis=1, keepdims=True)] * 8, axis=-1)

  return kernel


def run(stage):
  bs = lambda: pl.BlockSpec((TB, TS), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
  ws = lambda a: pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM)
  try:
    t0 = time.perf_counter()
    out = pl.pallas_call(
        make_kernel(stage),
        grid=(BATCH // TB, S // TS),
        in_specs=[bs(), bs(), bs(), bs(), bs(),
                  ws(w0), ws(w1), ws(wskip), ws(wa), ws(wr), ws(b)],
        out_specs=pl.BlockSpec((TB, 8), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BATCH, 8), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TB, 8), jnp.float32)],
    )(px, py, pz, zv, dv, w0, w1, wskip, wa, wr, b)
    v = np.asarray(jax.device_get(out))
    print(f'stage {stage}: OK {time.perf_counter()-t0:.1f}s '
          f'finite={np.isfinite(v).all()}', flush=True)
  except Exception as e:
    print(f'stage {stage}: FAILED {type(e).__name__} {str(e)[:90]}',
          flush=True)


if __name__ == '__main__':
  for stage in (1, 2, 3, 4, 5):
    run(stage)
