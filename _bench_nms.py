import time, numpy as np
import jax, jax.numpy as jnp
from sln_amodal_tpu.ops.nms import nms_sorted
from sln_amodal_tpu.ops.nms_pallas import nms_sorted_pallas

rng = np.random.RandomState(0)
n = 6000
centers = rng.rand(n,2)*1024
sizes = rng.rand(n,2)*300+10
b = np.concatenate([centers-sizes/2, centers+sizes/2],1).astype(np.float32)
bj = jnp.asarray(b); valid = jnp.ones((n,),bool)

def timeit(name, f, n_iter=50):
    def chained(boxes):
        k, v = f(boxes, valid)
        # tiny dependency: shift boxes by 0 * keep[0]
        return boxes + (k[0] * 0).astype(boxes.dtype), k, v
    x, k, v = chained(bj); jax.block_until_ready((x,k,v))
    kept = int(np.asarray(v).sum())
    t0=time.perf_counter()
    x = bj
    for _ in range(n_iter):
        x, k, v = chained(x)
    int(np.asarray(k)[0])
    dt=(time.perf_counter()-t0)/n_iter
    print(f"{name}: {dt*1000:.2f} ms/iter (kept={kept})")
    return k, v

k1,v1 = timeit("xla fori nms", lambda b_,v_: nms_sorted(b_, v_, 1000, 0.7))
k2,v2 = timeit("pallas nms", lambda b_,v_: nms_sorted_pallas(b_, v_, 1000, 0.7))
print("match:", bool(np.array_equal(np.asarray(k1), np.asarray(k2))))
