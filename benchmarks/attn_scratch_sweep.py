import time, math, numpy as np, jax, jax.numpy as jnp
from transparent_object_detection_tpu.ops.attention import flash_attention_mha

def timed(f, *a, iters=10):
    o = f(*a); jax.block_until_ready(o); float(jnp.asarray(o).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(iters): o = f(*a)
    float(jnp.asarray(o).reshape(-1)[0])
    return (time.perf_counter() - t0) / iters

rng = np.random.default_rng(0)
b, n, c, heads = 32, 6400, 1536, 6
q = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
scale = 1/math.sqrt(c//heads)
fl = 4.0 * b * n * n * c
for bq in (400, 800, 1600):
    for bk in (800, 1600, 3200):
        try:
            f = jax.jit(lambda q,k,v,bq=bq,bk=bk: flash_attention_mha(q,k,v,heads,scale,bq,bk))
            t = timed(f, q, k, v)
            print(f"bq={bq} bk={bk}: {t*1e3:.1f} ms  {fl/t/1e12:.1f} TFLOP/s")
        except Exception as e:
            print(f"bq={bq} bk={bk}: FAIL {str(e)[:80]}")
