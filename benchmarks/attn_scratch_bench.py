import time, math, numpy as np, jax, jax.numpy as jnp
from transparent_object_detection_tpu.ops.attention import attention

def timed(f, *a, iters=10):
    o = f(*a); jax.block_until_ready(o); float(jnp.asarray(o).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    float(jnp.asarray(o).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
for (b, n, c, heads, tag) in [(32, 6400, 1536, 6, "h2"), (32, 1600, 2048, 8, "h1"),
                               (32, 1600, 1536, 6, "h4")]:
    q = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
    f = jax.jit(lambda q,k,v: attention(q,k,v,scale=1/math.sqrt(c//heads),impl="pallas",num_heads=heads))
    t = timed(f, q, k, v)
    fl = 4.0 * b * n * n * c
    print(f"{tag}: {t*1e3:.1f} ms  {fl/t/1e12:.1f} TFLOP/s")
# selfattention dark3: b=32, n=6400, cq=64, cv=512
q = jnp.asarray(rng.normal(size=(32, 6400, 64)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(32, 6400, 64)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(32, 6400, 512)), jnp.bfloat16)
f = jax.jit(lambda q,k,v: attention(q,k,v,scale=1.0,impl="pallas"))
t = timed(f, q, k, v)
fl = 2.0*32*6400*6400*(64+512)
print(f"sa: {t*1e3:.1f} ms  {fl/t/1e12:.1f} TFLOP/s")
