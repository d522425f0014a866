import time, numpy as np
import jax, jax.numpy as jnp
from sln_amodal_tpu.ops.roi_align import pyramid_roi_align, crop_and_resize

rng = np.random.RandomState(0)
feats = [jnp.asarray(rng.randn(256,256,256).astype(np.float32)),
         jnp.asarray(rng.randn(128,128,256).astype(np.float32)),
         jnp.asarray(rng.randn(64,64,256).astype(np.float32)),
         jnp.asarray(rng.randn(32,32,256).astype(np.float32))]
boxes = rng.rand(1000,4).astype(np.float32)
boxes = np.stack([boxes[:,0]*0.5, boxes[:,1]*0.5, boxes[:,0]*0.5+boxes[:,2]*0.4+0.01, boxes[:,1]*0.5+boxes[:,3]*0.4+0.01],1)
bj = jnp.asarray(boxes)

def timeit(name, f, *args, n=30):
    jf = jax.jit(f)
    r = jf(*args); jax.block_until_ready(r); float(np.asarray(r).ravel()[0])
    t0=time.perf_counter()
    x = args
    acc=0.0
    for i in range(n):
        r = jf(*args)
    jax.block_until_ready(r)
    # chained variant unnecessary: measure dispatch-bound lower bound + final sync
    dt=(time.perf_counter()-t0)/n
    print(f"{name}: {dt*1000:.2f} ms")

timeit("pyramid_roi_align 1000x7x7x256", lambda *f: pyramid_roi_align(f[:4], f[4], (7,7), (1024,1024)).sum(), *feats, bj)
timeit("pyramid_roi_align 100x16x16x256", lambda *f: pyramid_roi_align(f[:4], f[4][:100], (16,16), (1024,1024)).sum(), *feats, bj)
glm = jnp.asarray(rng.randn(1,65,65,183).astype(np.float32))
timeit("glm crop 100x16", lambda g,b: crop_and_resize(g, b[:100], jnp.zeros(100,jnp.int32),(16,16)).sum(), glm, bj)
