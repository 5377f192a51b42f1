import time
import numpy as np
import jax
import jax.numpy as jnp
from droplet_visual_odometry_tpu.frontend import orb
from droplet_visual_odometry_tpu.ops.pallas_patches import PATCH, extract_patches_pallas

rng = np.random.default_rng(0)
n, h, w, k = 24, 1080, 1440, 512
imgs = jnp.asarray(rng.uniform(0, 255, size=(n, h, w)).astype(np.float32))
xy = jnp.asarray(rng.uniform(20, [w - 20, h - 20], size=(n, k, 2)).astype(np.float32))

NK = n * k
flat_p = jnp.asarray(rng.uniform(0, 255, (NK, PATCH * PATCH)).astype(np.float32))
W = orb._STEER_W


def timeit(name, f):
    r = f()
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    t0 = time.perf_counter()
    for _ in range(10):
        r = f()
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    print(f"{name}: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms")


@jax.jit
def mm_hi(p):
    hi = p.astype(jnp.bfloat16)
    return jnp.dot(hi, W, preferred_element_type=jnp.float32)


@jax.jit
def mm_hilo(p):
    hi = p.astype(jnp.bfloat16)
    lo = (p - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.dot(hi, W, preferred_element_type=jnp.float32) + jnp.dot(
        lo, W, preferred_element_type=jnp.float32
    )


@jax.jit
def select_pack(feats):
    m01 = feats[:, 0]
    m10 = feats[:, 1]
    ang = jnp.arctan2(m01, m10)
    two_pi = 2.0 * jnp.pi
    bin_idx = jnp.mod(jnp.round(ang / two_pi * orb.ANGLE_BINS), orb.ANGLE_BINS).astype(jnp.int32)
    allbits = feats[:, 2:].reshape(NK, orb.ANGLE_BINS, orb.N_BITS)
    onehot = (bin_idx[:, None] == jnp.arange(orb.ANGLE_BINS, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    bits = jnp.einsum("kbs,kb->ks", allbits, onehot) > 0
    v = bits.astype(jnp.uint32)
    width = 1
    while v.shape[-1] > orb.N_WORDS:
        v = v[..., 0::2] | (v[..., 1::2] << width)
        width *= 2
    return v, ang


@jax.jit
def full(im, p):
    return orb.describe_batch(im, p)


timeit("mm_hi (1 pass)", lambda: mm_hi(flat_p))
timeit("mm_hilo (2 pass)", lambda: mm_hilo(flat_p))
feats = mm_hilo(flat_p)
timeit("select+pack", lambda: select_pack(feats))
timeit("patches", lambda: extract_patches_pallas(imgs, jnp.zeros((NK, 3), jnp.int32).at[:, 0].set(jnp.repeat(jnp.arange(n), k))))
timeit("describe_batch full", lambda: full(imgs, xy))
print("W shape", W.shape, W.dtype)
